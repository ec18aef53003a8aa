"""Measure the conv_id-bucketed-layout elision on the multiline
stitcher — the bucketed-rejoin story applied to the reference's OWN
domain (north rule: transcripts partitioning/shuffle handled
explicitly).

stitch_multiline's window and group-by both cluster on conv_id, so
over a transcripts table bucketed by conv_id (what cli --bucket-out
writes by default) the whole operator compiles with ZERO exchanges —
the one full-payload transcript shuffle on plain parquet disappears,
no session conf needed (single-key clustering; contrast line_dedup's
compound-key case in scripts/line_dedup_bucketed_bench.py). Pinned in
tests/test_stitch.py::test_stitch_bucketed_transcripts_no_exchange.

Input: deterministic synth transcripts (logpipe.synth — the same
generator the CLI smoke path uses), sized by SPARK_GRAFT_STITCH_ROWS
(default 2,000,000 rows over 4,096 convs). Protocol matches the other
layout benches: one session, pass-major interleaving, min-of-N, noop
sink, per-run checkpoint blocks released. The one-time bucketed write
is reported separately — it is the storage layout every
conv_id-clustered stage (stitch, sessionization, throttle) then
shares.

Writes one JSON line; commit as BENCH/r8_stitch_bucketed.json.
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


def _run(spark, t) -> float:
    from logpipe.operators.stitch import stitch_multiline

    pre = persistent_rdd_ids(spark)
    t0 = time.perf_counter()
    stitch_multiline(t).write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0
    release_rdd_ids(spark, persistent_rdd_ids(spark) - pre)
    return wall


def main() -> None:
    n_rows = int(os.environ.get("SPARK_GRAFT_STITCH_ROWS", "2000000"))
    from logpipe.operators.stitch import stitch_multiline
    from logpipe.session import get_spark
    from logpipe.synth import synth_transcripts
    from logpipe.tableio import write_table

    tmp = tempfile.mkdtemp(prefix="logpipe_stitch_bucketed_")
    spark = get_spark(app_name="logpipe-stitch-bucketed")
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))

    synth_transcripts(spark, n_rows=n_rows, n_convs=4096).write.mode(
        "overwrite"
    ).parquet(os.path.join(tmp, "plain"))
    plain = spark.read.parquet(os.path.join(tmp, "plain"))
    plain.count()  # warm the scan

    t0 = time.perf_counter()
    write_table(
        plain,
        os.path.join(tmp, "bucketed"),
        bucket_by=(n_part, "conv_id"),
        sort_by=("conv_id", "turn_idx"),
        table_name="stitch_bucketed_bench",
    )
    write_wall = time.perf_counter() - t0
    bdocs = spark.table("stitch_bucketed_bench")

    try:
        ex = {
            "plain_exchanges": stitch_multiline(plain)
            ._jdf.queryExecution().executedPlan().toString().count("Exchange"),
            "bucketed_exchanges": stitch_multiline(bdocs)
            ._jdf.queryExecution().executedPlan().toString().count("Exchange"),
        }
        walls: dict[str, list[float]] = {"plain": [], "bucketed": []}
        for _ in range(PASSES):
            walls["plain"].append(_run(spark, plain))
            walls["bucketed"].append(_run(spark, bdocs))
    finally:
        spark.sql("DROP TABLE IF EXISTS stitch_bucketed_bench")

    mins = {k: min(v) for k, v in walls.items()}
    out = {
        "n_rows": n_rows,
        "passes": PASSES,
        "protocol": (
            "pass-major interleaved, min-of-N, one session, noop sink; "
            "no conf changes (single-key clustering satisfies the window "
            "and group-by distributions directly)"
        ),
        "buckets": n_part,
        "bucketed_write_sec": round(write_wall, 3),
        "stitch": {k: round(v, 3) for k, v in mins.items()},
        "speedup_ratio": round(mins["plain"] / mins["bucketed"], 3),
        **ex,
    }
    print(json.dumps(out))
    spark.stop()
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
