"""Config-driven rewrite_tag engine (operators/rewrite.py) vs the
reference's rule semantics (conf/ds/fluent-bit.conf:181-193,
plugins/filter_rewrite_tag): conf parsing, first-match-wins, keep
true/false, static re-injection unroll, cycle refusal — and full parity
with the hardcoded operators.route router on the flagship pipeline."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from logpipe.operators.rewrite import (
    REFERENCE_ROUTER_CONF,
    apply_rewrite_tags,
    glob_to_regex,
    parse_rewrite_tag_conf,
    route_with_rules,
)


def test_conf_parsing():
    stages = parse_rewrite_tag_conf(REFERENCE_ROUTER_CONF)
    assert len(stages) == 2
    assert stages[0].match == "kube.*"
    r0 = stages[0].rules[0]
    # shlex normalizes $m['k'] to $m[k]; parse_accessor accepts both
    assert (r0.key, r0.regex, r0.new_tag, r0.keep) == (
        "$labels[monitor_log_collector]", ".+", "erda.log.export", True,
    )
    r1 = stages[1].rules[0]
    assert (r1.new_tag, r1.keep) == ("erda.log.job", False)


def test_conf_rejections():
    with pytest.raises(ValueError, match="malformed"):
        parse_rewrite_tag_conf(
            "[FILTER]\n name rewrite_tag\n Rule $a .+ tag\n"
        )
    with pytest.raises(ValueError, match="capture-group"):
        parse_rewrite_tag_conf(
            "[FILTER]\n name rewrite_tag\n Rule $a (x)(y) new.$1 true\n"
        )


def test_glob_to_regex():
    import re

    assert re.match(glob_to_regex("kube.*"), "kube.ns.pod")
    assert not re.match(glob_to_regex("kube.*"), "erda.log.job")
    assert re.match(glob_to_regex("erda.log.job"), "erda.log.job")
    assert not re.match(glob_to_regex("erda.log.job"), "erda.log.job.x")


def test_first_match_wins_and_keep(spark):
    """Within a stage only the FIRST matching rule fires; keep=false
    consumes the original so later stages never see it."""
    conf = """
[FILTER]
    name rewrite_tag
    match in.*
    Rule $a ^hit first.won false
    Rule $a .+ second.never true
[FILTER]
    name rewrite_tag
    match in.*
    Rule $a .+ stage2.saw true
"""
    df = spark.createDataFrame(
        [("in.1", "hit"), ("in.2", "miss")], "tag string, a string"
    )
    got = sorted(
        (r["tag"], r["a"])
        for r in apply_rewrite_tags(df, parse_rewrite_tag_conf(conf)).collect()
    )
    # in.1: rule1 fires (not rule2), original dies, stage2 skipped
    # in.2: stage1 rule1 misses, rule2 fires keep=true; stage2 also fires
    assert got == [
        ("first.won", "hit"),
        ("in.2", "miss"),
        ("second.never", "miss"),
        ("stage2.saw", "miss"),
    ]


def test_reinjected_copies_traverse_again(spark):
    """keep=false chain a.* -> b.mid -> (matches b.*) -> c.final: the
    emitted copy re-enters the cascade under its new tag."""
    conf = """
[FILTER]
    name rewrite_tag
    match a.*
    Rule $f .+ b.mid false
[FILTER]
    name rewrite_tag
    match b.*
    Rule $f .+ c.final true
"""
    df = spark.createDataFrame([("a.1", "v"), ("z.1", "v")], "tag string, f string")
    got = sorted(
        r["tag"]
        for r in apply_rewrite_tags(df, parse_rewrite_tag_conf(conf)).collect()
    )
    assert got == ["b.mid", "c.final", "z.1"]


def test_cyclic_config_refused():
    conf = """
[FILTER]
    name rewrite_tag
    match a.*
    Rule $f .+ a.loop true
"""
    from logpipe.operators.rewrite import _reentry_rounds

    with pytest.raises(ValueError, match="cycl|terminate"):
        _reentry_rounds(parse_rewrite_tag_conf(conf))


def test_null_conv_id_still_routes(spark):
    """A NULL conv_id must not poison the tag cascade: the row routes
    exactly as route() would route it (here: define_tag set -> job)."""
    df = spark.createDataFrame(
        [(None, {}, "job-x")],
        "conv_id string, labels map<string,string>, define_tag string",
    )
    got = [r["sink"] for r in route_with_rules(df).collect()]
    assert got == ["job"]


def test_engine_parity_with_hardcoded_router(
    spark, transcripts, k8s_meta, tool_meta
):
    """route_with_rules (conf-declared) must reproduce the hardcoded
    route() row-for-row on the full flagship pipeline."""
    from logpipe.plans.pipeline import run_pipeline

    typed = run_pipeline(transcripts, k8s_meta, tool_meta)
    ruled = run_pipeline(
        transcripts, k8s_meta, tool_meta, router_fn=route_with_rules
    )
    cols = ["sink", "source", "id", "stream", "content", "timestamp"]
    assert typed.select(cols).exceptAll(ruled.select(cols)).count() == 0
    assert ruled.select(cols).exceptAll(typed.select(cols)).count() == 0


def test_engine_plan_stays_narrow(spark):
    """The cascade compiles to projections + a generator — no exchange
    (shuffle) may appear in the routed plan before aggregation."""
    df = spark.range(100).select(
        F.concat(F.lit("kube."), F.col("id").cast("string")).alias("tag"),
        F.when(F.col("id") % 3 == 0, F.lit("c")).alias("collector"),
        F.when(F.col("id") % 5 == 0, F.lit("j")).alias("define_tag"),
    )
    conf = """
[FILTER]
    name rewrite_tag
    match kube.*
    Rule $collector .+ erda.log.export true
[FILTER]
    name rewrite_tag
    match kube.*
    Rule $define_tag .+ erda.log.job false
"""
    out = apply_rewrite_tags(df, parse_rewrite_tag_conf(conf))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    # re-injection compiles into the finals expression, not a Union of
    # per-round branches (a Union would re-scan the input per round)
    assert "Union" not in plan
    assert plan.count("Range") == 1
