"""Driver-facing query/oracle registry (the correctness gate).

Each entry: name -> (spark_callable(spark, sf_dir) -> DataFrame,
oracle ANSI-SQL for DuckDB over the same parquet views, or None for
non-SQL-expressible ops). Column names and types are aligned between
both sides (the driver sorts columns by name and value-hashes).

Numeric-parity rules used throughout (Spark double math vs DuckDB):
- counts -> CAST(... AS BIGINT) both sides;
- sums of doubles -> exact DECIMAL(18,2) accumulation, single final
  cast to DOUBLE (decimal addition is associative => engine-order
  independent);
- per-row float math (cosines, ratios) -> identical IEEE expression
  trees on identical inputs, plus round(..., 4) belt-and-braces;
- hashes -> md5 only (bit-identical in Spark and DuckDB).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from logpipe.operators import parse
from logpipe.plans.pipeline import run_pipeline
from logpipe.sources.events import (
    events_as_transcripts,
    events_k8s_meta,
    events_tool_meta,
    load_events,
)

QueryFn = Callable[[SparkSession, str], DataFrame]

_REGISTRY: dict[str, tuple[QueryFn, str | None]] = {}


def register(name: str, sql: str | None):
    def deco(fn: QueryFn):
        _REGISTRY[name] = (fn, sql)
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    return {k: v[0] for k, v in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {k: v[1] for k, v in _REGISTRY.items() if v[1] is not None}


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# ---------------------------------------------------------------------------
# 1. Flagship: full pipeline route + per-sink counts (SURVEY §3.1, F12/F13)
# ---------------------------------------------------------------------------

_FLAGSHIP_SQL = """
WITH t AS (
  SELECT user_id, substring(props, 1, 51200) AS content
  FROM events
  WHERE props IS NOT NULL AND length(props) > 0
), s AS (
  SELECT 'export' AS sink, content FROM t
  WHERE (user_id % 5 = 0 OR user_id % 10 = 7)
  UNION ALL
  SELECT CASE WHEN user_id % 10 IN (3, 7) THEN 'job' ELSE 'container' END AS sink,
         content
  FROM t
)
SELECT sink,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(length(content)) AS BIGINT) AS content_bytes
FROM s GROUP BY sink
"""


@register("flagship_route_counts", _FLAGSHIP_SQL)
def flagship_route_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    out = run_pipeline(
        events_as_transcripts(ev), events_k8s_meta(ev), events_tool_meta(ev)
    )
    return out.groupBy("sink").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.length("content")).alias("content_bytes"),
    )


# ---------------------------------------------------------------------------
# 2. LogEvent projection (O4, out_erda/outerda.go:73-118) — scalar fields
# ---------------------------------------------------------------------------

_LOG_EVENT_SQL = """
WITH t AS (
  SELECT user_id, event_id, event_type,
         substring(props, 1, 51200) AS content,
         epoch_ns(ts) AS ts_nanos,
         CASE WHEN user_id % 7 <> 0 THEN md5('docker-' || CAST(user_id AS VARCHAR)) END AS docker_id,
         CASE WHEN event_type = 'purchase' AND (user_id % 16) % 4 <> 3
              THEN md5('cid-tool-' || CAST(user_id % 16 AS VARCHAR)) END AS tool_cid,
         (user_id % 5 = 0 OR user_id % 10 = 7) AS has_export,
         (user_id % 10 IN (3, 7)) AS has_job,
         'job-' || CAST(user_id AS VARCHAR) AS define_tag
  FROM events
  WHERE props IS NOT NULL AND length(props) > 0
), r AS (
  SELECT *, coalesce(docker_id, tool_cid, '') AS rid FROM t
), s AS (
  SELECT 'export' AS sink, * FROM r WHERE has_export
  UNION ALL
  SELECT CASE WHEN has_job THEN 'job' ELSE 'container' END AS sink, * FROM r
)
SELECT CASE WHEN sink = 'job' THEN 'job' ELSE 'container' END AS source,
       CASE WHEN sink = 'job' THEN define_tag ELSE rid END AS id,
       'stdout' AS stream,
       content,
       CAST(0 AS BIGINT) AS "offset",
       ts_nanos AS "timestamp",
       sink
FROM s
"""


@register("log_event_projection", _LOG_EVENT_SQL)
def log_event_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    out = run_pipeline(
        events_as_transcripts(ev), events_k8s_meta(ev), events_tool_meta(ev)
    )
    return out.select("source", "id", "stream", "content", "offset", "timestamp", "sink")


# ---------------------------------------------------------------------------
# 3. P2 truncate-log (conf/ds/parsers.conf:6-10)
# ---------------------------------------------------------------------------

_TRUNCATE_SQL = """
SELECT doc_id,
       substring(text, 1, 120) AS content,
       CAST(length(substring(text, 1, 120)) AS BIGINT) AS content_len
FROM documents
"""


@register("truncate_log", _TRUNCATE_SQL)
def truncate_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    c = parse.truncate_log(F.col("text"), 120)
    return d.select(
        "doc_id", c.alias("content"), F.length(c).cast("long").alias("content_len")
    )


# ---------------------------------------------------------------------------
# 4. P1 erda-info grok (conf/ds/parsers.conf:1-4) over constructed lines
# ---------------------------------------------------------------------------

_ERDA_RE_SQL = (
    "([Aa]lert|ALERT|[Tt]race|TRACE|[Dd]ebug|DEBUG|DEBU|[Ii]nfo|INFO"
    "|[Ww]arn(?:ing)?|WARN(?:ING)?|[Ee]rr(?:or)?|ERR(?:OR))"
    "(.*?)\\[([\\w|\\-|_]*?)\\,"
    "(\\{?\\w{8}-?\\w{4}-?\\w{4}-?\\w{4}-?\\w{12}\\}?)?([\\,|\\w|\\-|_|=]*?)\\]"
)

_ERDA_LINE_SQL = """
  SELECT event_id,
         upper(event_type) || ' [svc-' || CAST(user_id % 8 AS VARCHAR) || ',' ||
         CASE WHEN event_id % 3 = 0 THEN
           substring(md5(props),1,8) || '-' || substring(md5(props),9,4) || '-' ||
           substring(md5(props),13,4) || '-' || substring(md5(props),17,4) || '-' ||
           substring(md5(props),21,12)
         ELSE '' END || ',k=v] ' || props AS line
  FROM events
"""

_ERDA_EXTRACT_SQL = f"""
WITH lines AS ({_ERDA_LINE_SQL})
SELECT event_id,
       regexp_extract(line, '{_ERDA_RE_SQL}', 1) AS level,
       regexp_extract(line, '{_ERDA_RE_SQL}', 4) AS request_id
FROM lines
"""


def _erda_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    m = F.md5(F.col("props"))
    uuid = F.concat_ws(
        "-",
        F.substring(m, 1, 8), F.substring(m, 9, 4), F.substring(m, 13, 4),
        F.substring(m, 17, 4), F.substring(m, 21, 12),
    )
    line = F.concat(
        F.upper("event_type"), F.lit(" [svc-"), (F.col("user_id") % 8).cast("string"),
        F.lit(","), F.when(F.col("event_id") % 3 == 0, uuid).otherwise(F.lit("")),
        F.lit(",k=v] "), F.col("props"),
    )
    return ev.select("event_id", line.alias("line"))


@register("erda_info_extract", _ERDA_EXTRACT_SQL)
def erda_info_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    lines = _erda_lines(spark, sf_dir)
    return lines.select(
        "event_id",
        parse.erda_level(F.col("line")).alias("level"),
        parse.erda_request_id(F.col("line")).alias("request_id"),
    )


@register("erda_info_vectorized", _ERDA_EXTRACT_SQL)
def erda_info_vectorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same extraction via the Arrow-vectorized pandas UDF (zero
    per-row Python) — identical output, same oracle."""
    lines = _erda_lines(spark, sf_dir)
    g = parse.erda_info_pandas()(F.col("line"))
    return lines.select(
        "event_id", g["level"].alias("level"), g["request_id"].alias("request_id")
    )


# ---------------------------------------------------------------------------
# 5. P5 CRI parse (conf/ds/parsers.conf:25-30) over constructed lines
# ---------------------------------------------------------------------------

_CRI_SQL = r"""
WITH lines AS (
  SELECT event_id,
         strftime(ts, '%Y-%m-%dT%H:%M:%S') || 'Z ' ||
         CASE WHEN event_id % 2 = 0 THEN 'stdout' ELSE 'stderr' END ||
         ' F ' || props AS line
  FROM events
)
SELECT event_id,
       regexp_extract(line, '^([^ ]+) (stdout|stderr) ([^ ]*) (.*)$', 1) AS cri_time,
       regexp_extract(line, '^([^ ]+) (stdout|stderr) ([^ ]*) (.*)$', 2) AS stream,
       regexp_extract(line, '^([^ ]+) (stdout|stderr) ([^ ]*) (.*)$', 3) AS logtag,
       regexp_extract(line, '^([^ ]+) (stdout|stderr) ([^ ]*) (.*)$', 4) AS log
FROM lines
"""


@register("cri_parse", _CRI_SQL)
def cri_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    line = F.concat(
        F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss"), F.lit("Z "),
        F.when(F.col("event_id") % 2 == 0, "stdout").otherwise("stderr"),
        F.lit(" F "), F.col("props"),
    )
    lines = ev.select("event_id", line.alias("line"))
    s = parse.parse_cri(F.col("line"))
    return lines.select(
        "event_id",
        s["time"].alias("cri_time"), s["stream"].alias("stream"),
        s["logtag"].alias("logtag"), s["log"].alias("log"),
    )


# ---------------------------------------------------------------------------
# 6. F3 multiline stitch (sessionization; conf/eci/fluent-bit.conf:41-45)
# ---------------------------------------------------------------------------

_STITCH_SQL = """
WITH marked AS (
  SELECT user_id, event_id, props, ts,
         CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
              OVER (PARTITION BY user_id ORDER BY event_id
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS grp
  FROM events
)
SELECT user_id, grp,
       string_agg(props, chr(10) ORDER BY event_id) AS stitched,
       min(ts) AS start_ts,
       CAST(count(*) AS BIGINT) AS n_lines
FROM marked GROUP BY user_id, grp
"""


@register("multiline_stitch", _STITCH_SQL)
def multiline_stitch(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    is_first = F.when(F.col("event_type") == "signup", 1).otherwise(0)
    marked = ev.withColumn("grp", F.sum(is_first).over(w).cast("long"))
    return marked.groupBy("user_id", "grp").agg(
        F.concat_ws(
            "\n",
            F.transform(
                F.array_sort(F.collect_list(F.struct("event_id", "props"))),
                lambda x: x["props"],
            ),
        ).alias("stitched"),
        F.min("ts").alias("start_ts"),
        F.count(F.lit(1)).alias("n_lines"),
    )


# ---------------------------------------------------------------------------
# 7. F1 throttle: drop variant + audit aggregate (throttle.c:98-107)
# ---------------------------------------------------------------------------

_THROTTLE_DROP_SQL = """
WITH numbered AS (
  SELECT user_id, event_id,
         row_number() OVER (PARTITION BY user_id, date_trunc('day', ts)
                            ORDER BY event_id) AS rn
  FROM events
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS kept,
       CAST(min(event_id) AS BIGINT) AS first_event
FROM numbered WHERE rn <= 3 GROUP BY user_id
"""


@register("throttle_drop", _THROTTLE_DROP_SQL)
def throttle_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drop-mode throttle: keep first `rate` records per (key, window).

    The reference's retain=false path (throttle.c:98-107) as a
    row_number frame; rate=3/hour here so the small SFs actually drop.
    """
    ev = load_events(spark, sf_dir)
    w = Window.partitionBy("user_id", F.date_trunc("day", F.col("ts"))).orderBy(
        "event_id"
    )
    kept = ev.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 3)
    return kept.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("kept"),
        F.min("event_id").cast("long").alias("first_event"),
    )


_THROTTLE_AUDIT_SQL = """
SELECT user_id,
       date_trunc('day', ts) AS window_start,
       CAST(count(*) AS BIGINT) AS n
FROM events
GROUP BY user_id, date_trunc('day', ts)
HAVING count(*) > 3
"""


@register("throttle_audit", _THROTTLE_AUDIT_SQL)
def throttle_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audit aggregate: windows exceeding the rate (retain=true mode
    keeps rows, so correctness-wise throttling is an audit metric)."""
    ev = load_events(spark, sf_dir)
    return (
        ev.groupBy("user_id", F.date_trunc("day", F.col("ts")).alias("window_start"))
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 3)
    )


# ---------------------------------------------------------------------------
# 8. F2/F4 broadcast enrichment join (relational parity on TPC-H dims)
# ---------------------------------------------------------------------------

_ENRICH_JOIN_SQL = """
SELECT r.r_name,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(sum(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name
"""


@register("broadcast_enrich_join", _ENRICH_JOIN_SQL)
def broadcast_enrich_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    r = spark.read.parquet(f"{sf_dir}/region.parquet")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_acctbal"),
        )
    )


# ---------------------------------------------------------------------------
# 9. TPC-H Q1-style aggregate (map-side partial agg showcase)
# ---------------------------------------------------------------------------

_Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
       CAST(count(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@register("tpch_q1", _Q1_SQL)
def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    dec = lambda c: F.col(c).cast("decimal(18,2)")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")))
            .cast("double")
            .alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# 10. Top-k per group (window sort/limit)
# ---------------------------------------------------------------------------

_TOPK_SQL = """
SELECT o_orderpriority, o_orderkey, o_totalprice, CAST(rn AS BIGINT) AS rn
FROM (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
)
WHERE rn <= 3
"""


@register("topk_orders", _TOPK_SQL)
def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 3)
        .select("o_orderpriority", "o_orderkey", "o_totalprice", "rn")
    )
