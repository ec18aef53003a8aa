"""Dynamic-map pipeline == typed pipeline: two independent
articulations of the reference semantics must produce identical
LogEvents on the same input."""

from __future__ import annotations

from logpipe.plans.dynamic import run_dynamic_pipeline
from logpipe.plans.pipeline import run_pipeline


def test_merge_log_json_object(spark):
    """F2 Merge_Log + Merge_Log_Key (conf/ds/fluent-bit.conf:52-53):
    JSON-object bodies merge as log_processed_*; scalars stringify;
    non-JSON and non-object JSON leave the record untouched."""
    from pyspark.sql import functions as F

    from logpipe.operators.reshape import build_map
    from logpipe.plans.dynamic import merge_log

    df = spark.createDataFrame(
        [
            ("a", '{"k": "v", "n": 3}'),
            ("b", "not json at all"),
            ("c", "[1, 2]"),
            ("d", "87"),
        ],
        "id string, log string",
    )
    rec = build_map({"log": F.col("log")})
    m = {
        r["id"]: r["rec"]
        for r in df.select("id", merge_log(rec).alias("rec")).collect()
    }
    assert m["a"]["log_processed_k"] == "v"
    assert m["a"]["log_processed_n"] == "3"
    assert m["a"]["log"] == '{"k": "v", "n": 3}'  # Preserve the raw body
    for rid in ("b", "c", "d"):
        assert set(m[rid].keys()) == {"log"}


def test_dynamic_honors_k8s_exclude_like_typed(spark, transcripts, k8s_meta, tool_meta):
    a = run_pipeline(transcripts, k8s_meta, tool_meta, honor_k8s_exclude=True)
    b = run_dynamic_pipeline(transcripts, k8s_meta, tool_meta, honor_k8s_exclude=True)
    ca = {r["sink"]: r["count"] for r in a.groupBy("sink").count().collect()}
    cb = {r["sink"]: r["count"] for r in b.groupBy("sink").count().collect()}
    assert ca == cb
    assert ca != {
        r["sink"]: r["count"]
        for r in run_pipeline(transcripts, k8s_meta, tool_meta)
        .groupBy("sink").count().collect()
    }  # the exclusion actually dropped rows


def test_dynamic_equals_typed(spark, transcripts, k8s_meta, tool_meta):
    typed = run_pipeline(transcripts, k8s_meta, tool_meta)
    dyn = run_dynamic_pipeline(transcripts, k8s_meta, tool_meta)

    key = lambda d: (d["content"], d["sink"], d["id"], d["timestamp"])
    a = sorted((r.asDict(recursive=True) for r in typed.collect()), key=key)
    b = sorted((r.asDict(recursive=True) for r in dyn.collect()), key=key)
    assert len(a) == len(b)
    for x, y in zip(a, b):
        assert x == y, f"dynamic/typed divergence:\ntyped={x}\ndynamic={y}"


def test_dynamic_rules_router_parity(spark, transcripts, k8s_meta, tool_meta):
    """The config-driven rewrite_tag engine slots into the dynamic
    (map-record) plan exactly like the typed flagship."""
    from pyspark.sql import functions as F

    from logpipe.operators.rewrite import route_with_rules

    a = run_dynamic_pipeline(transcripts, k8s_meta, tool_meta)
    b = run_dynamic_pipeline(
        transcripts, k8s_meta, tool_meta, router_fn=route_with_rules
    )

    # per-sink count + content-hash signature: full-value comparison
    # without exceptAll over two map-heavy plans in one test JVM (the
    # double dynamic plan + anti-join OOMed the small test heap)
    def sig(df):
        return sorted(
            (r["sink"], r["n"], r["h"])
            for r in df.groupBy("sink")
            .agg(
                F.count(F.lit(1)).alias("n"),
                # decimal sum: long sum of xxhash64 overflows under ANSI
                F.sum(
                    F.xxhash64("source", "id", "stream", "content", "timestamp")
                    .cast("decimal(38,0)")
                ).alias("h"),
            )
            .collect()
        )

    assert sig(a) == sig(b)
