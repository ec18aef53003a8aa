"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video are carried as `binary` columns with a `kind` tag
and a metadata struct; decode / feature-extract / resize / frame-sample
run as Arrow-batched pandas functions over mapInPandas. The actual
codec step is STUBBED (no image/audio libs in this container): when
PIL/soundfile are absent, `decode_features` falls back to a
deterministic fake decoder (md5-derived features) so the Spark-side
plumbing — schema, partitioning, UDF signature, Arrow batch shape —
is fully real and tested, while `resize_image` raises
NotImplementedError to mark the genuinely-stubbed path.

Scale notes: payload bytes never leave the executor (mapInPandas
streams Arrow batches); feature vectors are small; repartition before
decode so batches are balanced by payload size, not row count.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_SCHEMA = "media_id long, kind string, payload binary, width int, height int, duration_ms int"
FEATURE_SCHEMA = "media_id long, kind string, n_bytes long, features array<double>"
FRAME_SCHEMA = "media_id long, frame_idx int, frame_bytes long"


def synth_media(spark: SparkSession, n_rows: int = 256, seed: int = 42) -> DataFrame:
    """Deterministic fake media table: payload = repeated md5 bytes."""
    df = spark.range(n_rows)
    h = F.md5(F.concat(F.lit(f"media-{seed}-"), F.col("id").cast("string")))
    kind = (
        F.when(F.col("id") % 3 == 0, "image")
        .when(F.col("id") % 3 == 1, "audio")
        .otherwise("video")
    )
    return df.select(
        F.col("id").alias("media_id"),
        kind.alias("kind"),
        F.unhex(F.repeat(h, ((F.col("id") % 8) + 1).cast("int"))).alias("payload"),
        ((F.col("id") % 64 + 1) * 16).cast("int").alias("width"),
        ((F.col("id") % 48 + 1) * 16).cast("int").alias("height"),
        ((F.col("id") % 1000) * 40).cast("int").alias("duration_ms"),
    )


def _have_codecs() -> bool:
    try:  # pragma: no cover - env-dependent
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


def decode_features(media: DataFrame, n_features: int = 8) -> DataFrame:
    """mapInPandas feature extraction: binary payload -> small vector.

    Real-codec path (PIL etc.) is unavailable here; the deterministic
    fallback derives features from payload bytes (first n bytes / 255)
    so tests can assert exact values. The Arrow plumbing (batch
    iterator, schema, null payloads) is identical either way.
    """
    use_codecs = _have_codecs()

    def extract(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                if payload is None:
                    feats.append(None)
                    continue
                if use_codecs:  # pragma: no cover - not in this container
                    raise NotImplementedError(
                        "real codec decode not wired in this environment"
                    )
                raw = bytes(payload)[:n_features]
                v = [b / 255.0 for b in raw]
                v += [0.0] * (n_features - len(v))
                feats.append(v)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(
                        lambda p: len(p) if p is not None else 0
                    ),
                    "features": feats,
                }
            )

    return media.mapInPandas(extract, schema=FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_bytes: int = 16) -> DataFrame:
    """Video frame sampling stand-in: one 'frame' per every_bytes chunk
    of the payload (the real decoder would emit decoded frames) —
    exercises the 1->N mapInPandas fan-out shape."""

    def sample(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            vid = pdf[(pdf["kind"] == "video") & pdf["payload"].notna()]
            if len(vid) == 0:
                yield pd.DataFrame(
                    {"media_id": pd.Series(dtype="int64"),
                     "frame_idx": pd.Series(dtype="int32"),
                     "frame_bytes": pd.Series(dtype="int64")}
                )
                continue
            # vectorized 1->N fan-out: per-payload frame counts, then one
            # repeat + one global arange (no per-row Python loop)
            sizes = vid["payload"].map(len).to_numpy(dtype="int64")
            n_frames = (sizes + every_bytes - 1) // every_bytes
            media_id = np.repeat(vid["media_id"].to_numpy(), n_frames)
            # frame_idx: global arange minus each payload's start offset
            starts = np.repeat(np.cumsum(n_frames) - n_frames, n_frames)
            frame_idx = np.arange(int(n_frames.sum())) - starts
            tail = np.repeat(sizes, n_frames) - frame_idx * every_bytes
            yield pd.DataFrame(
                {
                    "media_id": media_id,
                    "frame_idx": frame_idx.astype("int32"),
                    "frame_bytes": np.minimum(tail, every_bytes),
                }
            )

    return media.mapInPandas(sample, schema=FRAME_SCHEMA)


def resize_image(media: DataFrame, w: int, h: int) -> DataFrame:
    """STUB: requires a real image codec (PIL absent in this env)."""
    raise NotImplementedError(
        "resize_image needs an image codec; container ships none "
        "(decode plumbing is tested via decode_features' fallback)"
    )
