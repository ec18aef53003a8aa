"""Wall-clock value of the round-7 star-components skew fix on the
algorithm's natural skew case: a HUB graph (one source document with
HUB_SPOKES near-copies — every edge touches node 0), run end-to-end
through star_components with AQE's skew split enabled vs disabled.

As in scripts/skew_split_bench.py, disabling the split reproduces the
pre-fix join execution (the aggregate-fed join structurally never
fired it): the large-star neighbor join runs the hub's partition as
one task. Enabled, the split spreads it (pinned as `skew=true` in
tests/test_traindata.py::test_large_star_hub_join_skew_splittable).
Both modes run the SAME fixed operator on the same input; labels are
asserted identical. Spoke ids are hash-derived — skew detection reads
COMPRESSED map-output sizes, and a contiguous id range compresses
below the threshold.

Protocol: min-of-3 pass-major interleaved, thresholds sized so the
~HUB_SPOKES-row hot partition splits into a handful of chunks on
local[4]. Writes one JSON line; committed as
BENCH/r7_star_hub_bench.json.
"""
from __future__ import annotations

import json
import time

from pyspark.sql import functions as F

from logpipe.session import get_spark
from logpipe.traindata.dedup import star_components

HUB_SPOKES = 1_500_000
PASSES = 3

TUNED = {
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1MB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "4MB",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
}


def main() -> None:
    spark = get_spark(
        app_name="star-hub-bench", master="local[4]", shuffle_partitions=8
    )
    spark.sparkContext.setLogLevel("ERROR")
    for k, v in TUNED.items():
        spark.conf.set(k, v)

    edges = spark.range(1, HUB_SPOKES + 1).select(
        F.lit(0).cast("long").alias("src"),
        F.shiftrightunsigned(F.xxhash64("id"), 1).alias("dst"),
    )

    def run() -> tuple[float, int, int]:
        t0 = time.time()
        labels = star_components(edges, max_rounds=8)
        n = labels.count()
        n_root = labels.filter(F.col("cluster_id") == 0).count()
        return time.time() - t0, n, n_root

    best = {"on": float("inf"), "off": float("inf")}
    counts = {}
    for _ in range(PASSES):
        for mode in ("on", "off"):
            spark.conf.set(
                "spark.sql.adaptive.skewJoin.enabled",
                "true" if mode == "on" else "false",
            )
            wall, n, n_root = run()
            best[mode] = min(best[mode], wall)
            prev = counts.setdefault(mode, (n, n_root))
            assert prev == (n, n_root), (mode, prev, n, n_root)

    # identical labels in both modes: every node (hub + distinct
    # spokes) is in cluster 0
    assert counts["on"] == counts["off"], counts
    n, n_root = counts["on"]
    assert n == n_root, counts

    print(
        json.dumps(
            {
                "metric": "star_components end-to-end on a hub graph, "
                "skew split on vs off",
                "unit": "sec",
                "fixture": {"hub_spokes": HUB_SPOKES, "shape": "single hub node 0"},
                "passes": PASSES,
                "interleaved": True,
                "skew_split_on_sec": round(best["on"], 3),
                "skew_split_off_sec": round(best["off"], 3),
                "speedup": round(best["off"] / best["on"], 3),
                "labeled_nodes": n,
                "confs": TUNED,
                "cores": 4,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
