"""Measure materialize-mode overhead: reliable checkpoints vs local.

The round-6 materialize() knob makes reliable (HDFS/S3-style, executor-
loss-survivable) checkpoints a config away; this script puts a number
on what that durability costs at bench scale, for three representative
checkpoint-bearing queries:

- minhash_lsh_dups     — one scalar checkpoint (signature table)
- near_dup_clusters    — iterative: one checkpoint per propagation
                         round, dead rounds released (files deleted)
- near_dup_clusters_star — the operator with the most checkpoints per
                         unit work (branch points + round edge sets,
                         plus derived min tables on hub graphs;
                         round-7 verdict task 7 asked for its
                         reliable-mode datum)
- curated_corpus_v5    — the composed DAG: corpus-sized text
                         checkpoints at the span gate
- dup_span_trim        — the round-6 materialize site: the
                         per-(window, doc) position-list table at the
                         winner/loser branch point
- streaming_route_counts — streaming-adjacent control: the micro-batch
                         pipeline's own (structured-streaming)
                         checkpoint is independent of the materialize
                         knob, so its ratio pins ≈1.0 — a regression
                         here means the knob leaked into a path it
                         must not touch

Protocol matches bench.py: one session, pass-major interleaving across
modes (so host-steal drift hits both modes alike), min-of-N per
(entry, mode), per-run checkpoint blocks released AND the per-run
checkpoint-dir file delta deleted (reliable-mode passes otherwise
accumulate corpus-sized checkpoint copies across the sweep — round-6
ADVICE). The checkpoint dir is the sandbox driver-temp default — on a
real cluster the write cost would additionally include the DFS
round-trip, so the local-disk number is a LOWER bound on
reliable-mode overhead.

Writes one JSON line; commit as BENCH/r{N}_mode_overhead.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from logpipe.materialize import (  # noqa: E402
    MODE_CONF,
    _checkpoint_dir_entries,
    _delete_checkpoint,
    persistent_rdd_ids,
    release_rdd_ids,
)

ENTRIES = [
    ("minhash_lsh_dups", "noop"),
    ("near_dup_clusters", "noop"),
    ("near_dup_clusters_star", "noop"),
    ("curated_corpus_v5", "collect"),
    ("dup_span_trim", "noop"),
    ("streaming_route_counts", "collect"),
]
PASSES = 3


def _run(spark, fn, mode, sf_dir) -> float:
    pre = persistent_rdd_ids(spark)
    dir_pre = _checkpoint_dir_entries(spark)
    t0 = time.perf_counter()
    df = fn(spark, sf_dir)
    if mode == "collect":
        df.collect()
    else:
        df.write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0
    release_rdd_ids(spark, persistent_rdd_ids(spark) - pre)
    # reliable-mode passes leave rdd-N checkpoint dirs behind (the
    # measured query's consumers are done — delete the per-run delta
    # so 3 passes x 5 queries don't accumulate corpus-sized copies)
    dir_post = _checkpoint_dir_entries(spark)
    if dir_pre is not None and dir_post is not None:
        for path in sorted(dir_post - dir_pre):
            _delete_checkpoint(spark, path)
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
