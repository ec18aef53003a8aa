"""Injectable materialization strategy for lineage cuts.

Several operators cut lineage at an expensive SCALAR intermediate
(minhash signatures, LSH bucket tables, candidate pairs, iterative
cluster labels, the curation span gate) so that self-joins / symmetric
unions / iterative consumers don't re-run the upstream subtree per
branch — the round-5 duplicated-subtree audit found four such sites
and halved total compute at those stages by materializing.

Round 5 hardcoded ``localCheckpoint()`` everywhere. Local checkpoints
have exactly the right semantics for a single-JVM run (eager, no disk
round-trip through a checkpoint dir), but the truncated lineage lives
only in executor block storage: on a real cluster an executor loss
makes it unrecoverable mid-query and FAILS the job instead of
recomputing. This module makes the strategy a deployment knob:

    spark.conf.set("spark.logpipe.materialize.mode", "reliable")

- ``local``   (default): ``df.localCheckpoint()`` — eager, blocks in
  executor storage (MEMORY_AND_DISK), lineage truncated. Right for
  single-node / sandbox runs; fastest.
- ``reliable``: ``df.checkpoint(eager=True)`` against a real
  checkpoint dir (``spark.logpipe.materialize.checkpointDir``, or a
  driver-temp default that a cluster deployment MUST override with a
  shared path, e.g. HDFS/S3). Survives executor loss; costs a write +
  re-read of the materialized scalars. Note Spark's reliable
  checkpoint computes the frame once for the eager count and once for
  the checkpoint save — acceptable for the id/scalar tables this repo
  checkpoints, all of which are tiny next to the corpus they derive
  from.
- ``persist``: ``persist(MEMORY_AND_DISK)`` + eager count. Keeps
  lineage (recomputable after executor loss, no checkpoint write) but
  does NOT truncate the logical plan — composed DAGs that need the
  plan-size cut must not run in this mode: measured on
  curated_corpus_v5's gate, merely BUILDING the cache OOMs the driver
  heap (CachedRDDBuilder.cachedName stringifies the full tree) even
  at sf0.001, so the curation gates reject persist with a ValueError.
  It exists for callers that want recoverability without a checkpoint
  dir and whose plans stay small.

``release()`` frees a materialized frame's storage once every consumer
is done with it — the round-5 ADVICE finding: eager checkpoints pinned
MEMORY_AND_DISK blocks for the rest of the session, and repeated
builds (bench's interleaved passes, per-round cluster labels)
accumulated dead copies. Releasing a LOCAL checkpoint discards data
whose lineage is gone — only call it when the frame is truly dead.
"""

from __future__ import annotations

import os
import tempfile
from collections.abc import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.storagelevel import StorageLevel

MODE_CONF = "spark.logpipe.materialize.mode"
CKPT_DIR_CONF = "spark.logpipe.materialize.checkpointDir"
_MODES = ("local", "reliable", "persist")
_RELEASE_ATTR = "_logpipe_release"


def materialize_mode(spark: SparkSession) -> str:
    """The session's materialization mode (``local`` unless set)."""
    mode = str(spark.conf.get(MODE_CONF, "local")).lower()
    if mode not in _MODES:
        raise ValueError(
            f"{MODE_CONF}={mode!r}: expected one of {', '.join(_MODES)}"
        )
    return mode


def persistent_rdd_ids(spark: SparkSession) -> set[int]:
    """Ids of RDDs currently holding persisted/checkpointed blocks."""
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    return {int(k) for k in jmap.keySet().toArray()}


def release_rdd_ids(spark: SparkSession, ids: Iterable[int]) -> None:
    """Unpersist the given persistent-RDD ids (non-blocking, idempotent:
    ids already gone are skipped)."""
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    for i in ids:
        jrdd = jmap.get(i)
        if jrdd is not None:
            jrdd.unpersist(False)


def _ensure_checkpoint_dir(spark: SparkSession) -> None:
    sc = spark.sparkContext
    if sc._jsc.sc().getCheckpointDir().isDefined():
        return
    configured = spark.conf.get(CKPT_DIR_CONF, None)
    if configured is None:
        # sandbox default; a cluster run MUST point this at shared
        # storage (HDFS/S3) or executor-written checkpoint files are
        # unreadable across nodes
        configured = os.path.join(
            tempfile.gettempdir(), f"logpipe_ckpt_{os.getpid()}"
        )
    sc.setCheckpointDir(configured)


def materialize(df: DataFrame, mode: str | None = None) -> DataFrame:
    """Eagerly materialize ``df`` and truncate (or pin) its lineage,
    per the session's configured strategy. Returns the materialized
    frame; ``release()`` frees its storage when all consumers are done.
    """
    spark = df.sparkSession
    mode = (mode or materialize_mode(spark)).lower()
    if mode == "persist":
        out = df.persist(StorageLevel.MEMORY_AND_DISK)
        out.count()  # eager, matching checkpoint semantics
        setattr(out, _RELEASE_ATTR, out.unpersist)
        return out
    if mode == "reliable":
        _ensure_checkpoint_dir(spark)
        out = df.checkpoint(eager=True)
        # checkpoint FILES are owned by the ContextCleaner / checkpoint
        # dir lifecycle; there are no executor blocks to free
        setattr(out, _RELEASE_ATTR, lambda: None)
        return out
    if mode == "local":
        before = persistent_rdd_ids(spark)
        out = df.localCheckpoint()
        new_ids = persistent_rdd_ids(spark) - before
        setattr(out, _RELEASE_ATTR, lambda: release_rdd_ids(spark, new_ids))
        return out
    raise ValueError(f"materialize: mode must be one of {_MODES}, got {mode!r}")


def release(*dfs: DataFrame) -> None:
    """Free the storage behind frames returned by ``materialize()``.

    A LOCAL-mode frame's data is unrecoverable after release (its
    lineage was truncated) — only release frames no remaining consumer
    will touch. Frames not produced by ``materialize()`` are ignored.
    Idempotent per frame."""
    for df in dfs:
        fn = getattr(df, _RELEASE_ATTR, None)
        if fn is not None:
            setattr(df, _RELEASE_ATTR, None)
            fn()
