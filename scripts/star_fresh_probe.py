"""Fresh-JVM probe for near_dup_clusters_star (round-7 verdict task 2:
the star wall rose x1.15-1.36 in round 7 — the one perf watch item —
and, unlike dup_span_stats, got no fresh-JVM probe, so drift-vs-real
was unresolved).

Protocol = BENCH/r7_fresh_probes.json: ONE fresh JVM, one warmup pass
(discarded) + min-of-3 warm passes per entry, noop sink, alongside an
UNTOUCHED control (line_dedup_words — the r7 control) so host-level
drift shows up as a common ratio. Three star variants separate the
round-8 derivation's effect in the same JVM:

- star (derived)   — hub_skew=None: at sf0.1 the pair graph is far
                     under the skew threshold, so the derivation
                     skips the per-round min-table checkpoints;
- star hub=True    — the unconditional round-7 shape (forced);
- star hub=False   — the lazy min aggregate (forced; what the
                     derivation picks here, sanity: ≈ derived).

Writes one JSON line; commit as BENCH/r8_star_fresh_probe.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from logpipe.materialize import persistent_rdd_ids, release_rdd_ids  # noqa: E402

PASSES = 3


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import bench  # the control is bench.py's builder (the r7 control)
    from logpipe.session import get_spark
    from logpipe.traindata.dedup import near_dup_clusters_star

    spark = get_spark(app_name="logpipe-star-fresh-probe")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs.count()  # warm the scan

    def star_derived(s, d):
        return near_dup_clusters_star(docs, n=2, k=32, bands=8, threshold=0.1)

    def star_hub_true(s, d):
        return near_dup_clusters_star(
            docs, n=2, k=32, bands=8, threshold=0.1, hub_skew=True
        )

    def star_hub_false(s, d):
        return near_dup_clusters_star(
            docs, n=2, k=32, bands=8, threshold=0.1, hub_skew=False
        )

    entries = [
        ("near_dup_clusters_star_derived", star_derived),
        ("near_dup_clusters_star_hub_forced", star_hub_true),
        ("near_dup_clusters_star_hub_off", star_hub_false),
        ("line_dedup_words_control", bench._line_dedup_words_1x),
    ]

    def run(fn) -> float:
        pre = persistent_rdd_ids(spark)
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        release_rdd_ids(spark, persistent_rdd_ids(spark) - pre)
        return wall

    # record what the derivation actually decides at this sf (must be
    # all-False: the sf0.1 pair graph is orders of magnitude under the
    # 256MB skew threshold), without changing behavior
    from logpipe.traindata import dedup as _dedup

    decisions: list[bool] = []
    _orig_derive = _dedup._derive_hub_skew

    def _recording_derive(spark_, n_edges):
        d = _orig_derive(spark_, n_edges)
        decisions.append(d)
        return d

    out = {
        "sf_dir": sf_dir,
        "protocol": (
            "fresh JVM, 1 warmup pass (discarded) + min-of-3 warm passes, "
            "PASS-MAJOR interleaved across entries (JIT warms all alike), "
            "noop sink, untouched control in the same JVM "
            "(BENCH/r7_fresh_probes.json protocol)"
        ),
        "queries": {},
    }
    walls: dict[str, list[float]] = {name: [] for name, _ in entries}
    for p in range(PASSES + 1):  # pass 0 = warmup, discarded
        # rotate the order each pass: the first slot of a pass absorbs
        # pass-start effects (GC from the previous release), and the
        # derived/hub_off variants are code-identical here — an
        # unrotated sweep measured a stable first-slot penalty
        order = entries[p % len(entries):] + entries[: p % len(entries)]
        for name, fn in order:
            if name == "near_dup_clusters_star_derived":
                _dedup._derive_hub_skew = _recording_derive
            try:
                walls[name].append(run(fn))
            finally:
                _dedup._derive_hub_skew = _orig_derive
    for name, _ in entries:
        warm, *passes = walls[name]
        out["queries"][name] = {
            "warmup_sec": round(warm, 3),
            "min_of_3_sec": round(min(passes), 3),
            "passes_sec": [round(w, 3) for w in passes],
        }
    out["derived_hub_decisions"] = sorted(set(decisions))
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
