"""F3 multiline stitch: property tests + variant parity (SURVEY.md §7.3)."""

from __future__ import annotations

from pyspark.sql import functions as F

from logpipe.operators.parse import FIRSTLINE_RE
from logpipe.operators.stitch import stitch_multiline, stitch_multiline_pandas


def test_stitch_split_identity(spark, transcripts):
    """Splitting stitched text on \\n reproduces the input lines in
    (conv_id, turn_idx) order — no line lost, reordered, or mutated."""
    src = transcripts.filter(F.length("text") < 1000)  # keep runtime sane
    out = stitch_multiline(src)

    back = out.select(
        "conv_id", "turn_idx", F.explode(F.split("text", "\n", -1)).alias("line")
    )
    n_src = src.count()
    assert back.count() == n_src
    # every (conv_id, line) multiset matches
    a = src.groupBy("conv_id", "text").count()
    b = back.groupBy("conv_id", F.col("line").alias("text")).count()
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_group_count_equals_firstlines(spark, transcripts):
    src = transcripts.filter(F.length("text") < 1000)
    n_first = src.filter(F.col("text").rlike(FIRSTLINE_RE)).count()
    out = stitch_multiline(src)
    # groups = firstline groups + at most one orphan group (grp=0) per conv
    n_groups_started = out.filter(F.col("grp") > 0).count()
    assert n_groups_started == n_first
    # every group's text starts with a firstline unless it's the orphan
    bad = out.filter(
        (F.col("grp") > 0) & ~F.col("text").rlike(FIRSTLINE_RE)
    ).count()
    assert bad == 0
    assert out.agg(F.sum("n_lines")).first()[0] == src.count()


def test_pandas_variant_parity(spark, transcripts):
    src = transcripts.filter(F.length("text") < 1000)
    a = stitch_multiline(src)
    b = stitch_multiline_pandas(src)
    cols = ["conv_id", "grp", "turn_idx", "role", "text", "n_lines"]
    assert a.select(cols).exceptAll(b.select(cols)).count() == 0
    assert b.select(cols).exceptAll(a.select(cols)).count() == 0
