"""spark-submit entry point (north rule: ships as --py-files package).

Usage (cluster; see scripts/package.sh for the zip):
  spark-submit --py-files dist/logpipe.zip logpipe/cli.py \\
      --transcripts <path> --k8s-meta <path> --tool-meta <path> \\
      --out <path> --manifest <path> [--buckets 4096] [--synth N]
Local: PYTHONPATH=. python -m logpipe.cli --synth 100000 ...

With --synth N the input is generated deterministically (smoke/bench
runs); otherwise the three parquet paths are read. The job is
bucket-resumable: re-running with the same --manifest skips completed
buckets and prints the aggregated lineage.
"""

from __future__ import annotations

import argparse
import json


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(prog="logpipe")
    p.add_argument("--transcripts")
    p.add_argument("--k8s-meta")
    p.add_argument("--tool-meta")
    p.add_argument("--out", required=True)
    p.add_argument("--manifest", required=True)
    p.add_argument("--buckets", type=int, default=8)
    p.add_argument("--synth", type=int, default=0, help="synthesize N input rows")
    p.add_argument("--master", default=None)
    p.add_argument(
        "--plan", choices=["ds", "dynamic"], default="ds",
        help="ds = typed flagship; dynamic = map-record pipeline",
    )
    args = p.parse_args(argv)

    from logpipe.manifest import run_resumable
    from logpipe.session import get_spark

    pipeline_fn = None
    if args.plan == "dynamic":
        from logpipe.plans.dynamic import run_dynamic_pipeline

        pipeline_fn = run_dynamic_pipeline

    spark = get_spark(app_name="logpipe-cli", master=args.master)
    if args.synth:
        from logpipe.synth import synth_k8s_meta, synth_tool_meta, synth_transcripts

        transcripts = synth_transcripts(spark, n_rows=args.synth)
        k8s = synth_k8s_meta(spark)
        tools = synth_tool_meta(spark)
    else:
        if not (args.transcripts and args.k8s_meta and args.tool_meta):
            p.error("--transcripts/--k8s-meta/--tool-meta required without --synth")
        transcripts = spark.read.parquet(args.transcripts)
        k8s = spark.read.parquet(args.k8s_meta)
        tools = spark.read.parquet(args.tool_meta)

    manifest = run_resumable(
        spark, transcripts, k8s, tools, args.out, args.manifest,
        n_buckets=args.buckets, pipeline_fn=pipeline_fn,
    )
    print(json.dumps(manifest.totals()))
    spark.stop()


if __name__ == "__main__":
    main()
