"""Raw container-log file sources (SURVEY.md §2.1 S1-S3).

Replays fluent-bit's tail inputs as batch scans that produce the
canonical transcripts shape (conv_id, turn_idx, role, text, tool, ts):

- read_docker_logs: docker runtime — one JSON object per line
  {"log","stream","time"} (parser `docker`, conf/ds/parsers.conf:12-16;
  tail config conf/ds/docker-runtime.conf:1-21).
- read_cri_logs: containerd/CRI runtime — `time stream logtag log`
  text lines (parser `cri`, conf/ds/parsers.conf:25-30;
  conf/ds/cri-runtime.conf:1-21).

Line order: files are read wholetext and split with posexplode, so
turn_idx is the exact in-file line number — the offset/ordering key the
tail position DB provides in the reference. Log files are bounded by
rotation (reference caps chunks at 10MB, docker-runtime.conf:7-8), so
one file per row is safe; at scale the file list is partitioned across
executors by Spark's file scan.

Identity: fluent-bit encodes the source file path into the tag
(`Tag kube.*` + path, conf/ds/cri-runtime.conf:6) and the kubernetes
filter parses pod/namespace/container/docker_id back out of it
(Kube_Tag_Prefix, conf/ds/fluent-bit.conf:51). parse_kube_filename
replicates that: `<pod>_<namespace>_<container>-<64hex>.log`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from logpipe.operators.parse import CRI_RE

KUBE_FILENAME_RE = r"([a-z0-9\-.]+)_([a-z0-9\-.]+)_(.+)-([a-f0-9]{64})\.log$"


def _lines(spark: SparkSession, path: str) -> DataFrame:
    """(file, line_no, line) with exact in-file ordering."""
    raw = spark.read.text(path, wholetext=True).select(
        F.input_file_name().alias("file"), F.col("value")
    )
    return raw.select(
        "file",
        F.posexplode(F.split(F.col("value"), "\n")).alias("line_no", "line"),
    ).filter(F.length("line") > 0)  # Skip_Empty_Lines (docker-runtime.conf:10)


def parse_kube_filename(file_col) -> dict:
    """pod/namespace/container identity from the tag-encoded path."""
    name = F.element_at(F.split(file_col, "/"), -1)
    return {
        "pod_name": F.regexp_extract(name, KUBE_FILENAME_RE, 1),
        "namespace_name": F.regexp_extract(name, KUBE_FILENAME_RE, 2),
        "container_name": F.regexp_extract(name, KUBE_FILENAME_RE, 3),
        "docker_id": F.regexp_extract(name, KUBE_FILENAME_RE, 4),
    }


def read_docker_logs(spark: SparkSession, path: str) -> DataFrame:
    """Docker-runtime tail: JSON lines -> transcripts shape.

    text = the `log` payload with its trailing newline stripped (the
    stitcher re-joins lines with '\\n', reproducing the concatenated
    docker-mode record); role = `stream`; ts = the record `time`
    (RFC3339 nanos; Spark timestamps keep micros).
    """
    lines = _lines(spark, path)
    parsed = lines.withColumn(
        "j", F.from_json("line", "log string, stream string, time string")
    ).filter(F.col("j.log").isNotNull())
    ident = parse_kube_filename(F.col("file"))
    return parsed.select(
        F.concat_ws(
            "_", ident["pod_name"], ident["namespace_name"], ident["container_name"]
        ).alias("conv_id"),
        F.col("line_no").cast("int").alias("turn_idx"),
        F.col("j.stream").alias("role"),
        F.regexp_replace(F.col("j.log"), r"\n$", "").alias("text"),
        ident["container_name"].alias("tool"),
        F.to_timestamp(
            # truncate RFC3339 nanos to micros for TimestampType
            F.regexp_replace(F.col("j.time"), r"(\.\d{6})\d*", "$1"),
            "yyyy-MM-dd'T'HH:mm:ss.SSSSSSX",
        ).alias("ts"),
        F.col("file"),
        ident["docker_id"].alias("docker_id"),
    )


def read_cri_logs(spark: SparkSession, path: str, conv_from_file: bool = True) -> DataFrame:
    """CRI-runtime tail: `time stream logtag log` lines -> transcripts."""
    lines = _lines(spark, path)
    t = F.regexp_extract("line", CRI_RE, 1)
    return lines.select(
        (
            F.element_at(F.split("file", "/"), -1)
            if conv_from_file
            else F.lit("cri")
        ).alias("conv_id"),
        F.col("line_no").cast("int").alias("turn_idx"),
        F.regexp_extract("line", CRI_RE, 2).alias("role"),
        F.regexp_extract("line", CRI_RE, 4).alias("text"),
        F.lit(None).cast("string").alias("tool"),
        F.to_timestamp(
            F.regexp_replace(t, r"(\.\d{6})\d*", "$1"),
            "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX",
        ).alias("ts"),
        F.col("file"),
        F.regexp_extract("line", CRI_RE, 3).alias("logtag"),
    )


def ignore_older(df: DataFrame, cutoff, ts_col: str = "ts") -> DataFrame:
    """`ignore_older 5m` (conf/eci/fluent-bit.conf:18): drop records
    older than the cutoff. The reference skips stale files at tail
    start; the batch analog is an event-time predicate, which Catalyst
    pushes into the scan (partition pruning on ts-partitioned tables).
    """
    return df.filter(F.col(ts_col) >= F.lit(cutoff))
