"""Round-11 optimization harness (bench.py is FROZEN for measurement;
extra instrumentation lives here — guide §1.4/§1.5).

Modes:
  python bench_extra.py --time NAME [NAME ...] [--passes N]
      min-of-N per entry in ONE session (same _run_entry protocol as
      bench.py: noop/collect force mode from bench.HEADLINE, checkpoint
      blocks released per pass). Prints one JSON line.
  python bench_extra.py --plan NAME [NAME ...] [--out DIR --suffix S]
      dump normalized .explain("formatted") per entry to
      DIR/<name>_<S>.txt (the round's before/after plan evidence).

Entries resolve through bench._bench_queries, so bench-local entries
(10x slopes, layout pair) work here too.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import bench  # noqa: E402  (the frozen harness supplies entries/modes)


def _session():
    from logpipe.plans import driver_queries
    from logpipe.session import get_spark

    spark = get_spark(app_name="logpipe-bench-extra")
    qs = bench._bench_queries(spark, driver_queries)
    return spark, qs


def _warm(spark, sf_dir: str) -> None:
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    spark.read.parquet(f"{sf_dir}/events.parquet").count()

    @pandas_udf("long")
    def _w(x):
        return x

    spark.range(256).repartition(
        int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    ).select(_w(F.col("id"))).write.format("noop").mode("overwrite").save()


def time_entries(names: list[str], passes: int) -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark, qs = _session()
    modes = dict(bench.HEADLINE)
    _warm(spark, sf_dir)
    if any(n.startswith("stitch_layout") for n in names):
        bench._ensure_stitch_layout(spark)
    out: dict[str, dict] = {}
    samples: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(passes):
        for name in names:
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            samples[name].append(
                bench._run_entry(spark, qs, name, modes.get(name, "collect"), sf_dir)
            )
    for name, ts in samples.items():
        out[name] = {
            "min_sec": round(min(ts), 3),
            "samples": [round(t, 3) for t in ts],
        }
    print(json.dumps({"passes": passes, "sf_dir": sf_dir, "entries": out}))
    bench._layout_cleanup(spark)
    spark.stop()


def dump_plans(names: list[str], out_dir: str, suffix: str) -> None:
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "scripts"))
    from dump_plans import _normalize  # scripts/dump_plans.py

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark, qs = _session()
    from logpipe.materialize import persistent_rdd_ids, release_rdd_ids

    os.makedirs(out_dir, exist_ok=True)
    if any(n.startswith("stitch_layout") for n in names):
        bench._ensure_stitch_layout(spark)
    for name in names:
        pre = persistent_rdd_ids(spark)
        t0 = time.perf_counter()
        df = qs[name](spark, sf_dir)
        plan = _normalize(
            df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        )
        release_rdd_ids(spark, persistent_rdd_ids(spark) - pre)
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan.rstrip() + "\n")
        print(f"wrote {path} (build+compile {time.perf_counter() - t0:.2f}s)")
    bench._layout_cleanup(spark)
    spark.stop()


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--time", nargs="+", default=None)
    p.add_argument("--plan", nargs="+", default=None)
    p.add_argument("--passes", type=int, default=3)
    p.add_argument("--out", default="plans/r11")
    p.add_argument("--suffix", default="before")
    a = p.parse_args()
    if a.time:
        time_entries(a.time, a.passes)
    if a.plan:
        dump_plans(a.plan, a.out, a.suffix)
