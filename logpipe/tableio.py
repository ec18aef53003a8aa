"""Table-format adapter: Iceberg tables when the session carries an
Iceberg catalog, parquet directories otherwise.

The target deployment runs the pipeline over Iceberg tables (SURVEY.md
§2.1/§2.4 maps every source and sink onto them); this sandbox has no
Iceberg runtime jars and no network to fetch them, so every committed
test and benchmark exercises the parquet-directory branch. The Iceberg
branch is the SAME call sites handed a table identifier instead of a
path, gated on the catalog actually being loadable — not a stub: when
``iceberg_ready`` holds, reads go through the catalog and writes
commit a snapshot. What Iceberg buys at cluster scale, and what the
parquet branch substitutes in its absence:

- snapshot-commit atomicity -> the _SUCCESS-guarded directory commit
  (sinks.py) and the manifest's atomic-rename unit commits
  (manifest.py:61);
- partition pruning / predicate pushdown -> identical over hive-style
  parquet layouts (``sink=/collector=`` dirs);
- incremental snapshot reads -> file-source streaming
  (streaming/stream_pipeline.py).

Ref classification is documented on ``is_table_ref``: separators/
schemes/``.parquet`` are always paths, bare single-segment names are
always relative paths (round-6 ADVICE: ``--transcripts mydata`` must
keep reading a directory), and dotted names resolve by session
capability — tables in an Iceberg-capable session (local filesystem
state cannot shadow a catalog table), existing-path-wins otherwise,
``./`` always forcing the path reading.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def is_table_ref(ref: str, spark: SparkSession | None = None) -> bool:
    """True for catalog table identifiers (``cat.db.tbl`` / ``db.tbl``),
    False for filesystem paths. Paths carry a separator, a URI scheme,
    or a ``.parquet`` suffix; a bare single-segment name is a relative
    path (matching what ``spark.read.parquet`` always accepted).

    Dotted names are ambiguous and resolve by session capability: in an
    Iceberg-capable session (``spark`` passed and ``iceberg_ready``)
    they are ALWAYS table identifiers — driver-local filesystem state
    must never shadow a catalog table (a stray ``db.events`` directory
    in the driver's CWD silently rerouting a snapshot commit into a
    relative parquet dir would be a wrong-system write; round-7
    review). Without an Iceberg session, an existing local path wins
    over the identifier reading, so ``--transcripts data.v2`` keeps
    working (round-6 ADVICE). In both regimes ``./data.v2`` forces the
    path reading."""
    if "/" in ref or "\\" in ref or "://" in ref or ref.endswith(".parquet"):
        return False
    if "." not in ref:
        return False  # bare relative names are paths, not identifiers
    if spark is not None and iceberg_ready(spark):
        return True
    return not os.path.exists(ref)


def _sql_conf_keys(spark: SparkSession) -> set[str]:
    """Keys of every SQL conf the session will actually resolve —
    launch-time SparkConf entries AND runtime ``spark.conf.set`` ones
    (``spark.sql.catalog.*`` is a runtime SQL conf, invisible in the
    static SparkContext conf — round-6 ADVICE)."""
    keys = {k for k, _ in spark.sparkContext.getConf().getAll()}
    keys.update(r["key"] for r in spark.sql("SET").collect())
    return keys


def iceberg_ready(spark: SparkSession) -> bool:
    """True iff this session can serve Iceberg table refs: at least
    one ``spark.sql.catalog.*`` is configured (checked against the
    SESSION conf, so catalogs set at runtime count) AND the Iceberg
    Spark catalog class actually loads (jars on the classpath) — both
    required, so a configured-but-jarless session fails fast here
    instead of deep inside an analyzer error."""
    if not any(k.startswith("spark.sql.catalog.") for k in _sql_conf_keys(spark)):
        return False
    try:
        spark.sparkContext._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def _require_iceberg(spark: SparkSession, ref: str) -> None:
    if not iceberg_ready(spark):
        raise RuntimeError(
            f"table ref {ref!r} needs an Iceberg-capable session: configure "
            "spark.sql.catalog.<name>=org.apache.iceberg.spark.SparkCatalog "
            "with the iceberg-spark-runtime jars on the classpath, or pass "
            "a filesystem path for the parquet-directory branch"
        )


def read_table(spark: SparkSession, ref: str) -> DataFrame:
    """Read ``ref`` — Iceberg catalog table or parquet directory/file,
    chosen by ``is_table_ref``. Both branches are plain scans Catalyst
    prunes and pushes into."""
    if is_table_ref(ref, spark):
        _require_iceberg(spark, ref)
        return spark.read.table(ref)
    return spark.read.parquet(ref)


def write_table(
    df: DataFrame,
    ref: str,
    mode: str = "overwrite",
    partition_by: tuple[str, ...] = (),
) -> None:
    """Write ``df`` to ``ref``. Parquet branch: the directory write
    every committed test exercises. Iceberg branch: ``writeTo`` v2 —
    ``overwrite`` maps to createOrReplace (a single snapshot commit,
    the atomicity the reference's per-chunk retry protocol needed
    bookkeeping for) and ``append`` to append."""
    if is_table_ref(ref, df.sparkSession):
        _require_iceberg(df.sparkSession, ref)
        from pyspark.sql import functions as F

        w = df.writeTo(ref).using("iceberg")
        if partition_by:
            cols = [F.col(c) for c in partition_by]
            w = w.partitionedBy(cols[0], *cols[1:])
        if mode == "overwrite":
            w.createOrReplace()
        elif mode == "append":
            w.append()
        else:
            raise ValueError(f"write_table: unsupported mode {mode!r} for tables")
        return
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(ref)
