"""Adapter: the driver's `events` parquet table -> transcripts + dims.

The grading harness cross-checks queries against DuckDB over the same
parquet files, so the pipeline's relational semantics are also
expressed over `events` (FIXTURES.md §5 mapping: user_id<->conv_id,
event_id<->turn order, props<->text, event_type<->role).

All derived enrichment fields are deterministic pure functions of
user_id / tool (md5-based where hashes are needed) so the DuckDB
oracle can reproduce them exactly — md5 is bit-identical in Spark and
DuckDB, unlike xxhash64.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def events_as_transcripts(events: DataFrame) -> DataFrame:
    """events -> (conv_id, turn_idx, role, text, tool, ts).

    tool is present on 'purchase' turns only (the ECI lookup path);
    turn ordering key = event_id (already unique and monotone).
    """
    return events.select(
        F.col("user_id").cast("string").alias("conv_id"),
        F.col("event_id").cast("int").alias("turn_idx"),
        F.col("event_type").alias("role"),
        F.col("props").alias("text"),
        F.when(
            F.col("event_type") == "purchase",
            F.concat(F.lit("tool-"), (F.col("user_id") % 16).cast("string")),
        ).alias("tool"),
        F.col("ts"),
    )


def events_k8s_meta(events: DataFrame) -> DataFrame:
    """Deterministic k8s-meta dim keyed by conv_id (from distinct users).

    Routing coverage mirrors logpipe.synth: collector on user_id%5==0 or
    %10==7; define_tag on %10 in (3,7); both on %10==7. docker_id is
    NULL on user_id%7==0 to exercise the cpuset-id fallback.

    HARNESS-ONLY shape: deriving the dim from a fact-table distinct is
    what lets the DuckDB oracle reproduce it from the same parquet. In
    production the dim is its own table (pod metadata), read directly —
    and when its cardinality is unbounded, pass
    run_pipeline(broadcast_dims=False) so AQE sizes the join instead of
    force-broadcasting (see operators.enrich.enrich_k8s).
    """
    u = events.select(F.col("user_id")).distinct()
    uid = F.col("user_id")
    s = uid.cast("string")
    return u.select(
        s.alias("conv_id"),
        F.concat(F.lit("pod-"), s).alias("pod_name"),
        F.concat(F.lit("ns-"), (uid % 8).cast("string")).alias("namespace_name"),
        F.when(uid % 7 != 0, F.md5(F.concat(F.lit("docker-"), s))).alias("docker_id"),
        F.md5(F.concat(F.lit("hash-"), s)).alias("container_hash"),
        F.concat(F.lit("registry/app:"), s).alias("container_image"),
        (uid % 5).cast("string").alias("org_id"),
        F.concat(F.lit("org-"), (uid % 5).cast("string")).alias("org_name"),
        (uid % 20).cast("string").alias("project_id"),
        F.concat(F.lit("proj-"), (uid % 20).cast("string")).alias("project_name"),
        (uid % 40).cast("string").alias("application_id"),
        F.concat(F.lit("app-"), (uid % 40).cast("string")).alias("application_name"),
        F.concat(F.lit("svc-"), (uid % 8).cast("string")).alias("service_name"),
        (uid % 50).cast("string").alias("runtime_id"),
        F.concat(F.lit("rt-"), (uid % 50).cast("string")).alias("runtime_name"),
        F.when(uid % 4 == 0, "DEV")
        .when(uid % 4 == 1, "TEST")
        .when(uid % 4 == 2, "STAGING")
        .otherwise("PROD")
        .alias("workspace"),
        F.when(
            (uid % 5 == 0) | (uid % 10 == 7),
            F.concat(F.lit("collector-"), (uid % 4).cast("string")),
        ).alias("monitor_log_collector"),
        F.when((uid % 10).isin(3, 7), F.concat(F.lit("job-"), s)).alias("define_tag"),
        # K8S-Logging.Exclude annotation (fluentbit.io/exclude,
        # conf/ds/fluent-bit.conf:55): uid%25==0 pods opt out — inert
        # unless run_pipeline(honor_k8s_exclude=True)
        (uid % 25 == 0).alias("k8s_exclude"),
        # K8S-Logging.Parser annotation (fluentbit.io/parser, :54)
        F.when(uid % 9 == 1, "erda-info")
        .when(uid % 9 == 2, "cri")
        .alias("k8s_parser"),
    )


def events_tool_meta(events: DataFrame) -> DataFrame:
    """tool -> cpuset dim; tool-N with N%4==3 is deliberately missing
    (left-join pass-through case, enrich-meta.lua:6-8).

    Pure function of the 16 tool ids — built from range(), NOT from an
    events scan (a dim derived by scanning the fact table would add a
    full pass at 100TB; extra dim rows for tools that never occur are
    invisible through the left join)."""
    spark = events.sparkSession
    t = (
        spark.range(16)
        .filter(F.col("id") % 4 != 3)
        .select(F.concat(F.lit("tool-"), F.col("id").cast("string")).alias("tool"))
    )
    return t.select(
        "tool",
        F.concat(
            F.lit("/kubepods/besteffort/pod"),
            F.md5(F.concat(F.lit("pod-"), F.col("tool"))),
            F.lit("/"),
            F.md5(F.concat(F.lit("cid-"), F.col("tool"))),
        ).alias("cpuset"),
    )
