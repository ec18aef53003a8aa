"""S4 `dummy` input (conf/eci/fluent-bit.conf.local:12-24): emit a
fixed record N times under a tag — the fixture source for pipeline
smoke tests."""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from logpipe.synth import BASE_EPOCH


def dummy_source(
    spark: SparkSession, record: dict, n: int = 10, tag: str = "dummy"
) -> DataFrame:
    """N copies of one fixed JSON record, transcripts-shaped: the
    record's `log` becomes text, `stream` the role; turn_idx counts
    emissions (like fluent-bit's repeated dummy emits)."""
    rec = json.dumps(record)
    df = spark.range(n)
    j = F.from_json(F.lit(rec), "log string, stream string")
    return df.select(
        F.lit(tag).alias("conv_id"),
        F.col("id").cast("int").alias("turn_idx"),
        F.coalesce(j["stream"], F.lit("stdout")).alias("role"),
        F.coalesce(j["log"], F.lit(rec)).alias("text"),
        F.lit(None).cast("string").alias("tool"),
        F.timestamp_seconds(F.lit(BASE_EPOCH) + F.col("id")).alias("ts"),
    )
