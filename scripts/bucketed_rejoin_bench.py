"""Measure what bucketing the corpus on doc_id buys the dedup-family
verdict rejoin (the round-6 verdict's one remaining prose claim).

Every dedup operator's verdict table rejoins the corpus on doc_id; at
100TB that equi-join is the family's dominant data movement unless the
corpus layout already satisfies the join's distribution. This script
puts numbers on the pair at bench scale, with broadcast DISABLED on
both sides so the join compiles to the at-scale sort-merge shape (at
sf0.1 the verdict side would otherwise broadcast and neither side
shuffles — the bench-scale default plan, which demonstrates nothing
about layout):

- plain   — documents read from the parquet directory; the corpus
            token arrays shuffle into the join (ONE payload exchange).
- bucketed — documents written once with bucketBy(shuffle_partitions,
            doc_id) and read back via the session catalog; the scan's
            storage partitioning satisfies the join (ZERO payload
            exchanges — only ids/scalars move). The one-time write
            cost is reported separately: it is the storage layout the
            whole dedup family then shares, not a per-query cost.

Protocol matches bench.py: one session, pass-major interleaving across
layouts (host-steal drift hits both alike), min-of-N, per-run
checkpoint blocks released. Plan evidence (payload-exchange counts for
both layouts) is recorded in the JSON alongside the walls; the same
properties are pinned in
tests/test_traindata.py::test_span_trim_bucketed_rejoin.

Writes one JSON line; commit as BENCH/r7_bucketed_rejoin.json.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from logpipe.materialize import persistent_rdd_ids, release_rdd_ids  # noqa: E402

PASSES = 3


def _payload_exchanges(df, spark) -> int:
    from logpipe.planinspect import exchange_input_lines

    return sum(
        1
        for ln in exchange_input_lines(df)
        if "text#" in ln or "_toks#" in ln
    )


def _run(spark, docs) -> float:
    from logpipe.traindata.dedup import duplicate_span_trim

    pre = persistent_rdd_ids(spark)
    t0 = time.perf_counter()
    duplicate_span_trim(docs, k=3, min_docs=2).write.format("noop").mode(
        "overwrite"
    ).save()
    wall = time.perf_counter() - t0
    release_rdd_ids(spark, persistent_rdd_ids(spark) - pre)
    return wall


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from logpipe.session import get_spark
    from logpipe.traindata.dedup import duplicate_span_trim

    tmp = tempfile.mkdtemp(prefix="logpipe_bucketed_")
    spark = get_spark(app_name="logpipe-bucketed-rejoin")
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs.count()  # warm the scan

    t0 = time.perf_counter()
    (
        docs.write.bucketBy(n_part, "doc_id")
        .sortBy("doc_id")
        .option("path", os.path.join(tmp, "corpus_bucketed"))
        .mode("overwrite")
        .saveAsTable("corpus_bucketed_bench")
    )
    write_wall = time.perf_counter() - t0
    bdocs = spark.table("corpus_bucketed_bench")

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        evidence = {
            "plain_payload_exchanges": _payload_exchanges(
                duplicate_span_trim(docs, k=3, min_docs=2), spark
            ),
            "bucketed_payload_exchanges": _payload_exchanges(
                duplicate_span_trim(bdocs, k=3, min_docs=2), spark
            ),
        }
        walls: dict[str, list[float]] = {"plain": [], "bucketed": []}
        for _ in range(PASSES):
            walls["plain"].append(_run(spark, docs))
            walls["bucketed"].append(_run(spark, bdocs))
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS corpus_bucketed_bench")

    plain = min(walls["plain"])
    bucketed = min(walls["bucketed"])
    out = {
        "sf_dir": sf_dir,
        "passes": PASSES,
        "protocol": (
            "pass-major interleaved, min-of-N, one session, broadcast "
            "disabled (at-scale SMJ shape on both layouts)"
        ),
        "buckets": n_part,
        "bucketed_write_sec": round(write_wall, 3),
        "dup_span_trim": {
            "plain_min_sec": round(plain, 3),
            "bucketed_min_sec": round(bucketed, 3),
            "speedup_ratio": round(plain / bucketed, 3),
        },
        **evidence,
    }
    print(json.dumps(out))
    spark.stop()
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
