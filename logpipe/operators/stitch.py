"""F3 multiline stitch — stack-trace sessionization (SURVEY.md §2.3).

Reference: the `multiline` filter (conf/eci/fluent-bit.conf:41-45) joins
continuation lines into the preceding firstline record: a line matching
the firstline parser starts a group, everything else appends. fluent-bit
does this stateful-sequentially per tail-file; the Spark-first shape is
group assignment via a running sum over (conv_id, turn_idx) order, then
one aggregation:

  is_first = text rlike FIRSTLINE_RE
  grp      = sum(is_first) over (partition by conv_id order by turn_idx)
  group by (conv_id, grp) -> concat_ws('\\n', lines in turn order)

Leading continuation lines (no firstline yet, grp=0) form their own
group — same as fluent-bit flushing orphan continuations.

Scale notes:
- the window + groupBy both shuffle on conv_id; with a hot conv this
  skews. The stitch itself cannot be salted across turn boundaries
  (group assignment must see consecutive turns), but AQE skew-join /
  skewed-shuffle splitting handles the aggregation side, and group
  CONTENT is bounded (a stack trace is tens of lines), so only the
  window scan is conv-serial — O(hot conv) not O(everything).
- an `applyInPandas` variant (exact sequential semantics, Arrow
  batches) is provided for parity testing and for grammars where the
  group rule isn't expressible as a running sum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from logpipe.operators.parse import FIRSTLINE_RE

STITCHED_SCHEMA = (
    "conv_id string, grp long, turn_idx int, role string, text string, "
    "tool string, ts timestamp, n_lines int"
)


def stitch_multiline(
    df: DataFrame,
    firstline_re: str = FIRSTLINE_RE,
    text_col: str = "text",
    is_start=None,
) -> DataFrame:
    """Window-function stitcher: one row per stitched group.

    Output keeps the firstline's (turn_idx, role, tool, ts) — the
    reference record is the firstline record with `log` extended.
    ``is_start``: optional boolean Column overriding the group-start
    rule (default: text matches ``firstline_re``) — e.g. the java
    grammar's NOT-a-continuation rule (java_group_start).

    Scale note: the window and the group-by both cluster on conv_id,
    so the operator's ONE full-payload shuffle is elided entirely by
    storing the transcripts bucketed on conv_id (tableio.write_table
    bucket spec / cli --bucket-out's default column) — zero exchanges,
    no session conf needed, rows identical (pinned:
    tests/test_stitch.py::test_stitch_bucketed_transcripts_no_exchange;
    measured 1.36x on 2M rows, BENCH/r8_stitch_bucketed.json). The
    same elision holds for every conv_id-clustered stage — pinned, not
    just claimed: sessionize_by_gap / session_stats / throttle_drop /
    throttle_audit each compile zero exchanges over the bucket
    (test_conv_id_bucket_elides_every_stage_exchange). Laying the
    buckets out SORTED in this window's own order (sort_by=(conv_id,
    turn_idx), single_file_buckets=True) additionally elides the
    window SORT under tableio.SORTED_SCAN_CONFS
    (test_sorted_bucket_elides_window_sort).
    """
    if is_start is None:
        is_start = F.col(text_col).rlike(firstline_re)
    is_first = is_start.cast("int")
    w = (
        Window.partitionBy("conv_id")
        .orderBy("turn_idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    marked = df.withColumn("grp", F.sum(is_first).over(w))
    ordered = F.array_sort(
        F.collect_list(F.struct("turn_idx", text_col, "role", "tool", "ts"))
    )
    return (
        marked.groupBy("conv_id", "grp")
        .agg(ordered.alias("_lines"))
        .select(
            "conv_id",
            "grp",
            F.element_at("_lines", 1)["turn_idx"].alias("turn_idx"),
            F.element_at("_lines", 1)["role"].alias("role"),
            F.concat_ws("\n", F.transform("_lines", lambda x: x[text_col])).alias("text"),
            F.element_at("_lines", 1)["tool"].alias("tool"),
            F.element_at("_lines", 1)["ts"].alias("ts"),
            F.size("_lines").alias("n_lines"),
        )
    )


def java_group_start(text_col: str = "text") -> F.Column:
    """Group-start rule of fluent-bit's built-in `java` multiline
    parser (conf/eci/fluent-bit.conf:45, flb_ml_parser_java.c): a line
    starts a group iff it is NOT a stack-trace continuation form
    (frame / Caused by / Suppressed / '... N more' / nested exception).
    Null text is a start (it can't continue anything)."""
    from logpipe.operators.parse import JAVA_CONT_RE

    return ~F.coalesce(F.col(text_col).rlike(JAVA_CONT_RE), F.lit(False))


def stitch_multiline_java(df: DataFrame, text_col: str = "text") -> DataFrame:
    """F3 with the java grammar: `at ...` / `Caused by:` lines glue to
    the preceding record even when the trace's first line carries no
    datetime — the case the datetime-firstline grammar mis-splits.
    Same single-shuffle window shape as stitch_multiline."""
    return stitch_multiline(df, text_col=text_col, is_start=java_group_start(text_col))


def sessionize_by_gap(
    df: DataFrame,
    gap_sec: int = 1800,
    key: str = "conv_id",
    ts_col: str = "ts",
    order_col: str = "turn_idx",
) -> DataFrame:
    """Time-gap sessionization: a new session starts when the gap to
    the previous turn exceeds ``gap_sec`` (the time-based complement of
    the marker-based stitcher; the reference's flush timers —
    Docker_Mode_Flush / Multiline_Flush — are the same idea applied to
    record closure). Adds a per-key ``session_id`` (1-based) via the
    stitcher's running-sum window shape: one shuffle on `key`.
    """
    w = Window.partitionBy(key).orderBy(order_col)
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # compare in MICROS: a seconds cast truncates and moves session
    # boundaries by up to 1s (TIMESTAMP_NTZ goes via a timestamp cast —
    # identity under the UTC session TZ, same as project_log_event)
    epoch = F.unix_micros(F.col(ts_col).cast("timestamp"))
    prev = F.lag(epoch).over(w)
    is_start = F.when(
        prev.isNull() | (epoch - prev > gap_sec * 1_000_000), 1
    ).otherwise(0)
    return df.withColumn("session_id", F.sum(is_start).over(wrun))


def session_stats(
    df: DataFrame,
    gap_sec: int = 1800,
    key: str = "conv_id",
    ts_col: str = "ts",
    order_col: str = "turn_idx",
) -> DataFrame:
    """Per-session aggregate over sessionize_by_gap: turn count, span,
    first turn — the partial-agg-friendly rollup (map-side combine on
    (key, session_id))."""
    s = sessionize_by_gap(df, gap_sec, key, ts_col, order_col)
    return s.groupBy(key, "session_id").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.min(order_col).alias("first_turn"),
        F.min(ts_col).alias("start_ts"),
        F.floor(
            (
                F.max(F.unix_micros(F.col(ts_col).cast("timestamp")))
                - F.min(F.unix_micros(F.col(ts_col).cast("timestamp")))
            )
            / F.lit(1_000_000)
        )
        .cast("long")
        .alias("span_sec"),
    )


def stitch_multiline_pandas(
    df: DataFrame, firstline_re: str = FIRSTLINE_RE
) -> DataFrame:
    """Exact-sequential stitcher via applyInPandas (grouped-map, Arrow).

    Semantically identical to stitch_multiline (tested); use when the
    grouping rule needs imperative state. One pandas batch per conv —
    fine for bounded convs, not for the hot-key tail (prefer the
    window variant at scale).
    """
    import pandas as pd
    import re

    pat = re.compile(firstline_re)

    def stitch(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("turn_idx")
        is_first = pdf["text"].str.match(pat).fillna(False)
        grp = is_first.astype("int64").cumsum()
        out = []
        for g, sub in pdf.assign(grp=grp).groupby("grp", sort=True):
            first = sub.iloc[0]
            out.append(
                {
                    "conv_id": first["conv_id"],
                    "grp": int(g),
                    "turn_idx": int(first["turn_idx"]),
                    "role": first["role"],
                    "text": "\n".join(sub["text"].tolist()),
                    "tool": first["tool"],
                    "ts": first["ts"],
                    "n_lines": int(len(sub)),
                }
            )
        return pd.DataFrame(out)

    return df.groupBy("conv_id").applyInPandas(stitch, schema=STITCHED_SCHEMA)
