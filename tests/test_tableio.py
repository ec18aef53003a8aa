"""tableio: the Iceberg/parquet table-format seam.

The sandbox has no Iceberg runtime, so these tests pin the three
properties the adapter must hold WITHOUT it: path refs behave exactly
like the direct parquet writes they replaced, table refs fail fast
with actionable guidance (not an analyzer stack trace), and the
readiness probe is honest (False here — no catalog, no jars)."""

import pytest

from logpipe.tableio import is_table_ref, iceberg_ready, read_table, write_table


def test_is_table_ref_classification():
    assert is_table_ref("catalog.db.events")
    assert is_table_ref("events")
    assert not is_table_ref("/data/events.parquet")
    assert not is_table_ref("s3://bucket/events")
    assert not is_table_ref("relative/dir")
    assert not is_table_ref("events.parquet")
    assert not is_table_ref("C:\\data\\events")


def test_iceberg_not_ready_in_sandbox(spark):
    assert not iceberg_ready(spark)


def test_table_ref_without_iceberg_raises_actionable_error(spark):
    with pytest.raises(RuntimeError, match="spark.sql.catalog"):
        read_table(spark, "cat.db.events")
    with pytest.raises(RuntimeError, match="iceberg-spark-runtime"):
        write_table(spark.range(3), "cat.db.events")


def test_path_branch_matches_direct_parquet_write(spark, tmp_path):
    """The parquet branch must be byte-for-byte the write it replaced
    in sinks.py: same partition layout, same rows back, partition
    pruning intact."""
    from pyspark.sql import functions as F

    df = spark.range(100).select(
        F.col("id"),
        (F.col("id") % 3).cast("string").alias("sink"),
    )
    ours, direct = str(tmp_path / "ours"), str(tmp_path / "direct")
    write_table(df, ours, mode="overwrite", partition_by=("sink",))
    df.write.mode("overwrite").partitionBy("sink").parquet(direct)

    import os

    assert sorted(
        d for d in os.listdir(ours) if d.startswith("sink=")
    ) == sorted(d for d in os.listdir(direct) if d.startswith("sink="))
    back = read_table(spark, ours)
    assert back.count() == 100
    assert back.filter(F.col("sink") == "1").count() == df.filter(
        F.col("sink") == "1"
    ).count()


def test_path_branch_unpartitioned_roundtrip(spark, tmp_path):
    out = str(tmp_path / "flat")
    write_table(spark.range(7), out)
    assert read_table(spark, out).count() == 7
