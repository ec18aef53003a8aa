"""Measure materialize-mode overhead: reliable checkpoints vs local.

The round-6 materialize() knob makes reliable (HDFS/S3-style, executor-
loss-survivable) checkpoints a config away; this script puts a number
on what that durability costs at bench scale, for three representative
checkpoint-bearing queries:

- minhash_lsh_dups     — one scalar checkpoint (signature table)
- near_dup_clusters    — iterative: one checkpoint per propagation
                         round, dead rounds released (files deleted)
- curated_corpus_v5    — the composed DAG: corpus-sized text
                         checkpoints at the span gate

Protocol matches bench.py: one session, pass-major interleaving across
modes (so host-steal drift hits both modes alike), min-of-N per
(entry, mode), per-run checkpoint blocks released. The checkpoint dir
is the sandbox driver-temp default — on a real cluster the write cost
would additionally include the DFS round-trip, so the local-disk
number is a LOWER bound on reliable-mode overhead.

Writes one JSON line; commit as BENCH/r6_mode_overhead.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from logpipe.materialize import (  # noqa: E402
    MODE_CONF,
    persistent_rdd_ids,
    release_rdd_ids,
)

ENTRIES = [
    ("minhash_lsh_dups", "noop"),
    ("near_dup_clusters", "noop"),
    ("curated_corpus_v5", "collect"),
]
PASSES = 3


def _run(spark, fn, mode, sf_dir) -> float:
    pre = persistent_rdd_ids(spark)
    t0 = time.perf_counter()
    df = fn(spark, sf_dir)
    if mode == "collect":
        df.collect()
    else:
        df.write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0
    release_rdd_ids(spark, persistent_rdd_ids(spark) - pre)
    return wall


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from logpipe.plans import driver_queries
    from logpipe.session import get_spark

    spark = get_spark(app_name="logpipe-mode-overhead")
    qs = dict(driver_queries.queries())
    spark.read.parquet(f"{sf_dir}/documents.parquet").count()  # warm

    walls: dict[str, dict[str, list[float]]] = {
        name: {"local": [], "reliable": []} for name, _ in ENTRIES
    }
    for _ in range(PASSES):
        for mat_mode in ("local", "reliable"):
            spark.conf.set(MODE_CONF, mat_mode)
            try:
                for name, run_mode in ENTRIES:
                    walls[name][mat_mode].append(
                        _run(spark, qs[name], run_mode, sf_dir)
                    )
            finally:
                spark.conf.unset(MODE_CONF)

    out = {"sf_dir": sf_dir, "passes": PASSES, "protocol": "pass-major interleaved, min-of-N, one session", "queries": {}}
    for name, _ in ENTRIES:
        loc = min(walls[name]["local"])
        rel = min(walls[name]["reliable"])
        out["queries"][name] = {
            "local_min_sec": round(loc, 3),
            "reliable_min_sec": round(rel, 3),
            "overhead_ratio": round(rel / loc, 3),
        }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
