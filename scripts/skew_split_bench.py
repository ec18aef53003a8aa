"""Wall-clock evidence that the round-7 skew-split fix PAYS, not just
plans: the duplicate-span multiplicity join-back on a boilerplate-heavy
corpus (HOT_DOCS documents sharing one 4-token text — i.e. TWO
corpus-wide hot 3-gram windows), with AQE's skew split enabled vs
disabled.

Why disable-vs-enable rather than old-shape-vs-new-shape: with the
aggregate feeding the join directly (the pre-fix shape), the split
structurally cannot fire — so `skewJoin.enabled=false` over the FIXED
shape reproduces the pre-fix JOIN execution (one task owns each hot
hash's partition) while keeping everything else identical. One honest
caveat: the timed region starts AFTER the per-hash aggregate is
materialized, whereas the pre-fix query computed that aggregate inline
— so the measured ratio UNDERSTATES the full pre-fix gap.

Protocol (the sweep's rules): the per-(window, doc) count table is
materialized ONCE (identical bytes for both modes — only join planning
differs), then min-of-3 pass-major interleaved timings of the
multiplicity join + per-doc aggregate. Thresholds are lowered the same
way the skewed-fixture test lowers them, scaled so the hot partition
splits into ~4-8 chunks (matching local[4] parallelism, the shape a
real cluster sees when one k-gram infects a corpus shard).

Writes one JSON line; committed as BENCH/r7_skew_split_bench.json.
"""
from __future__ import annotations

import json
import time

from pyspark.sql import functions as F

from logpipe.materialize import materialize, release
from logpipe.session import get_spark
from logpipe.traindata.dedup import _span_count_table

HOT_DOCS = 1_200_000
TAIL_DOCS = 100_000
PASSES = 3

TUNED = {
    # sized so each ~1.2M-row hot partition (one per hot 3-gram window;
    # compressed map output) clears the threshold and splits into a
    # handful of chunks; detection reads COMPRESSED sizes and a
    # repeated hash LZ4-compresses ~100x, hence row volume this large
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "256KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "1MB",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
}


def main() -> None:
    spark = get_spark(
        app_name="skew-split-bench", master="local[4]", shuffle_partitions=8
    )
    spark.sparkContext.setLogLevel("ERROR")
    for k, v in TUNED.items():
        spark.conf.set(k, v)

    c = F.col("id").cast("string")
    hot = spark.range(HOT_DOCS).select(
        F.col("id").alias("doc_id"),
        F.lit("share one boiler plate").alias("text"),
    )
    tail = spark.range(HOT_DOCS, HOT_DOCS + TAIL_DOCS).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("u"), c, F.lit(" v"), c, F.lit(" w"), c).alias("text"),
    )
    # one shared materialization: both modes read the same blocks
    per = materialize(_span_count_table(hot.unionByName(tail), 3))

    def phase_wall() -> tuple[float, str]:
        shs = materialize(per.groupBy("sh").agg(F.count(F.lit(1)).alias("nd")))
        t0 = time.time()
        out = (
            per.join(shs, "sh")
            .groupBy("doc_id")
            .agg(
                F.sum("cnt").alias("n_spans"),
                F.sum(F.when(F.col("nd") >= 2, F.col("cnt")).otherwise(0)).alias(
                    "n_dup"
                ),
            )
        )
        # drive THIS DataFrame's own QueryExecution (df.count() builds a
        # NEW one, leaving this plan unexecuted and its executedPlan()
        # introspection showing isFinalPlan=false): toRdd().count() runs
        # the plan JVM-side with zero driver row transfer
        qe = out._jdf.queryExecution()
        n = qe.toRdd().count()
        wall = time.time() - t0
        assert n == HOT_DOCS + TAIL_DOCS, n
        plan = qe.executedPlan().toString()
        release(shs)
        return wall, plan

    best = {"on": float("inf"), "off": float("inf")}
    fired = {"on": False, "off": False}
    for _ in range(PASSES):
        for mode in ("on", "off"):
            spark.conf.set(
                "spark.sql.adaptive.skewJoin.enabled",
                "true" if mode == "on" else "false",
            )
            wall, plan = phase_wall()
            best[mode] = min(best[mode], wall)
            fired[mode] = fired[mode] or ("skew=true" in plan)

    release(per)
    assert fired["on"] and not fired["off"], fired
    print(
        json.dumps(
            {
                "metric": "span multiplicity join-back phase, skew split on vs off",
                "unit": "sec",
                "fixture": {"hot_docs": HOT_DOCS, "tail_docs": TAIL_DOCS, "k": 3},
                "passes": PASSES,
                "interleaved": True,
                "skew_split_on_sec": round(best["on"], 3),
                "skew_split_off_sec": round(best["off"], 3),
                "speedup": round(best["off"] / best["on"], 3),
                "skew_fired": fired,
                "confs": TUNED,
                "cores": 4,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
