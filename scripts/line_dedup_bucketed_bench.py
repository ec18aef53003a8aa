"""Measure the bucketed-corpus rejoin elision on line_dedup — the
COMPOUND-KEY member of the dedup family (round-7 verdict task 3: show
whether doc_id bucketing generalizes past the single-key trim rejoin).

line_dedup's verdict join keys on (doc_id, lh) vs (win_doc, lh): the
doc_id bucket satisfies only a SUBSET of the join keys, which Spark's
default co-partition rule rejects — the exploded-lines payload still
shuffles over a bucketed corpus. Relaxing
``spark.sql.requireAllClusterKeysForCoPartition=false`` (one of the
same conf family the Iceberg storage-partitioned join needs —
logpipe.tableio.SPJ_CONFS) lets hash(doc_id) carry the compound join:
only the scalar winners side shuffles (by win_doc, to co-partition)
and the corpus payload moves ZERO times; the downstream (doc_id, lh)
/ (doc_id) groupBys ride the same storage partitioning, so the
bucketed plan drops from 4 exchanges to 2. Row-identical results in
all regimes (pinned with the plans in tests/test_traindata.py::
test_line_dedup_bucketed_rejoin_compound_key).

The layout is produced through the PRODUCTION write path
(tableio.write_table bucket spec — what cli.py --bucket-out calls).

THREE regimes are measured so the two effects separate:

- plain                — parquet dir scan, payload exchange present;
- bucketed, conf=true  — bucketed scan, payload exchange still
                         present (the default co-partition rule
                         rejects the subset bucket);
- bucketed, conf=false — bucketed scan, payload exchange ELIDED.

The conf=true vs conf=false pair is the like-for-like elision
measurement (same scan, only the exchange differs). plain vs bucketed
additionally includes the bucketed SCAN's local handicap — 32 fixed
small splits vs the AQE-coalesced single-file scan — which is a
bench-scale artifact: at 100TB any scan is thousands of splits either
way, while the elided exchange is corpus-sized network movement.

Protocol matches scripts/bucketed_rejoin_bench.py: one session,
pass-major interleaving across regimes (host-steal drift hits all
alike), min-of-N, broadcast disabled so every regime compiles the
at-scale sort-merge shape, per-run checkpoint blocks released.

Writes one JSON line; commit as BENCH/r8_line_dedup_bucketed.json.
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
SUBSET_KEY = "spark.sql.requireAllClusterKeysForCoPartition"


def _payload_exchanges(df, spark) -> int:
    from logpipe.planinspect import exchange_input_lines

    return sum(
        1
        for ln in exchange_input_lines(df)
        if "text#" in ln or "line#" in ln
    )


def _run(spark, docs) -> float:
    from logpipe.traindata.dedup import line_dedup

    pre = persistent_rdd_ids(spark)
    t0 = time.perf_counter()
    line_dedup(docs).write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0
    release_rdd_ids(spark, persistent_rdd_ids(spark) - pre)
    return wall


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from logpipe.session import get_spark
    from logpipe.tableio import write_table
    from logpipe.traindata.dedup import line_dedup

    tmp = tempfile.mkdtemp(prefix="logpipe_ld_bucketed_")
    spark = get_spark(app_name="logpipe-line-dedup-bucketed")
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs.count()  # warm the scan

    t0 = time.perf_counter()
    write_table(
        docs,
        os.path.join(tmp, "corpus_bucketed"),
        bucket_by=(n_part, "doc_id"),
        table_name="corpus_bucketed_ld_bench",
    )
    write_wall = time.perf_counter() - t0
    bdocs = spark.table("corpus_bucketed_ld_bench")

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    regimes = {
        "plain": (docs, "true"),
        "bucketed_conf_true": (bdocs, "true"),
        "bucketed_conf_false": (bdocs, "false"),
    }
    try:
        spark.conf.set(SUBSET_KEY, "false")
        evidence = {
            "plain_payload_exchanges": _payload_exchanges(line_dedup(docs), spark),
            "bucketed_payload_exchanges": _payload_exchanges(line_dedup(bdocs), spark),
        }
        walls: dict[str, list[float]] = {k: [] for k in regimes}
        for _ in range(PASSES):
            for name, (d, conf) in regimes.items():
                spark.conf.set(SUBSET_KEY, conf)
                walls[name].append(_run(spark, d))
    finally:
        spark.conf.unset(SUBSET_KEY)
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS corpus_bucketed_ld_bench")

    mins = {k: min(v) for k, v in walls.items()}
    out = {
        "sf_dir": sf_dir,
        "passes": PASSES,
        "protocol": (
            "pass-major interleaved, min-of-N, one session, broadcast "
            "disabled (at-scale SMJ shape in every regime); "
            "conf = " + SUBSET_KEY
        ),
        "buckets": n_part,
        "bucketed_write_sec": round(write_wall, 3),
        "line_dedup": {k: round(v, 3) for k, v in mins.items()},
        # same scan, exchange kept vs elided — the layout's join win
        "elision_ratio_same_scan": round(
            mins["bucketed_conf_true"] / mins["bucketed_conf_false"], 3
        ),
        # plain vs bucketed end-to-end at LOCAL bench scale (includes
        # the bucketed scan's fixed-split handicap — see module doc)
        "end_to_end_ratio_vs_plain": round(
            mins["plain"] / mins["bucketed_conf_false"], 3
        ),
        **evidence,
    }
    print(json.dumps(out))
    spark.stop()
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
