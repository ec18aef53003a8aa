"""The round-8 verdict's watch item on ``_derive_hub_skew``
(logpipe/traindata/dedup.py): the derived hub decision upper-bounds ONE
partition's shuffle bytes by the WHOLE edge set's, so a LARGE but
UNIFORM graph — big enough that n_edges x 64B clears the skew
threshold, yet with bounded degree everywhere — derives hub=True and
pays the per-node min-table materialization every half-round for a
skew split that can never fire. This script measures what that
conservatism costs on exactly that fixture, so the decision to tighten
the bound (a per-key top-count needs an extra aggregation job per
round) is made on a datum, not a guess.

Fixture: 4-node chain components over ``spark.range`` ids — 3 edges
per component, max degree 2 (interior nodes), scaled by
SPARK_GRAFT_STAR_EDGES (default 4,500,000 edges > the 4M edges at
which 64B/row crosses the default 256MB threshold, so the derivation
returns True). Deterministic, no data files.

Protocol: one session, pass-major interleaved min-of-N
(SPARK_GRAFT_BENCH_PASSES, default 3), entry order rotated per pass
(round-8: slot 1 pays pass-start effects), checkpoint blocks released
per pass. Shapes compared:
  derived  — hub_skew=None (the production default)
  hub_off  — hub_skew=False (the right call on this graph)
Committed twice: BENCH/r9_star_uniform.json is the BEFORE datum
(global bound only: derived=True, paid 1.27x), which triggered the
stage-2 max-degree refinement in ``_derive_hub_skew``;
BENCH/r9_star_uniform_after.json re-runs the identical protocol with
the refinement in place — ``derived`` then picks hub=False internally
and its residual gap over ``hub_off`` is exactly the per-round
max-degree aggregate the refinement costs. The ``global_bound_hub``
field records what stage 1 alone would decide (True on this fixture
either way)."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from logpipe.materialize import persistent_rdd_ids, release_rdd_ids  # noqa: E402


def _chain_edges(spark, n_edges: int):
    """Edges of disjoint 4-node chains: component c holds nodes
    4c..4c+3 and edges (4c,4c+1),(4c+1,4c+2),(4c+2,4c+3). Max degree 2
    — uniform by construction. Materialized to parquet-free in-memory
    via localCheckpoint inside star_components' own materialize; here
    the frame is just the lazy generator."""
    from pyspark.sql import functions as F

    n_components = n_edges // 3
    base = spark.range(n_components).select(
        (F.col("id") * 4).alias("a")
    )
    edges = None
    for off in (0, 1, 2):
        part = base.select(
            (F.col("a") + off).alias("u"), (F.col("a") + off + 1).alias("v")
        )
        edges = part if edges is None else edges.union(part)
    return edges


def main() -> None:
    from logpipe.session import get_spark
    from logpipe.traindata.dedup import _derive_hub_skew, star_components
    from logpipe.materialize import release

    n_edges = int(os.environ.get("SPARK_GRAFT_STAR_EDGES", "4500000"))
    passes = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "3")))
    spark = get_spark(app_name="logpipe-star-uniform")

    derived = _derive_hub_skew(spark, n_edges)

    def run(hub):
        pre = persistent_rdd_ids(spark)
        t0 = time.perf_counter()
        out = star_components(_chain_edges(spark, n_edges), hub_skew=hub)
        n = out.count()
        wall = time.perf_counter() - t0
        release(out)
        release_rdd_ids(spark, persistent_rdd_ids(spark) - pre)
        return wall, n

    entries = [("derived", None), ("hub_off", False)]
    best = {name: float("inf") for name, _ in entries}
    n_nodes = {}
    for p in range(passes):
        order = entries[p % len(entries):] + entries[: p % len(entries)]
        for name, hub in order:
            wall, n = run(hub)
            best[name] = min(best[name], wall)
            n_nodes[name] = n

    assert len(set(n_nodes.values())) == 1, n_nodes  # same labeling size
    print(
        json.dumps(
            {
                "n_edges": n_edges,
                "max_degree": 2,
                "global_bound_hub": derived,
                "passes": passes,
                "protocol": "one session, pass-major interleaved, "
                            "rotated entry order, min-of-N",
                "walls_sec": {k: round(v, 3) for k, v in best.items()},
                "derived_over_hub_off": (
                    round(best["derived"] / best["hub_off"], 3)
                    if best["hub_off"]
                    else None
                ),
                "labeled_nodes": n_nodes["derived"],
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
