"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video are carried as `binary` columns with a `kind` tag
and a metadata struct; decode / feature-extract / resize / frame-sample
run as Arrow-batched pandas functions over mapInPandas. The CODEC step
is substituted (no image/audio libs in this container): when
PIL/soundfile are absent, `decode_features` falls back to a
deterministic fake decoder (payload-byte features) and `resize_image`
treats the payload as a raw byte grid — the Spark-side plumbing
(schema, partitioning, UDF signature, Arrow batch shape) and the
numpy resample kernel are fully real and tested; a deployment with
codecs swaps only the bytes->grid step.

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


def decode_features(media: DataFrame, n_features: int = 8, extractor=None) -> DataFrame:
    """mapInPandas feature extraction: binary payload -> small vector.

    ``extractor``: optional ``bytes -> list[float]`` plugged in by a
    deployment that ships real codecs (PIL decode + pooling, etc.).
    Default is the deterministic byte-derived kernel (first n bytes /
    255) so tests assert exact values with no codec dependency. The
    Arrow plumbing (batch iterator, schema, null payloads) is identical
    either way.
    """

    def default_extractor(payload: bytes) -> list:
        raw = payload[:n_features]
        v = [b / 255.0 for b in raw]
        return v + [0.0] * (n_features - len(v))

    fn = extractor or default_extractor

    def extract(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            feats = [
                None if payload is None else fn(bytes(payload))
                for payload in pdf["payload"]
            ]
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


RESIZED_SCHEMA = "media_id long, kind string, width int, height int, payload binary"


def resize_image(media: DataFrame, w: int, h: int) -> DataFrame:
    """Nearest-neighbor resize over mapInPandas — pure numpy, no codec.

    The payload is interpreted as a row-major single-channel byte grid
    of the row's (height, width) metadata (the same deterministic
    treatment as decode_features' fallback: a real deployment swaps the
    grid for a codec decode, the resample kernel is unchanged). Payloads
    shorter than width*height are tiled; the kernel is the standard NN
    resample: out[i, j] = in[floor(i*H/h), floor(j*W/w)]. Non-image rows
    and null payloads pass through as None payloads with the target
    dims, preserving row identity for downstream joins.
    """
    if w <= 0 or h <= 0:
        raise ValueError(f"resize_image: target dims must be positive, got {w}x{h}")

    def resize(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            out = []
            for _, r in pdf.iterrows():
                # width/height are nullable in MEDIA_SCHEMA: a row with
                # missing/degenerate source dims is un-resizable and
                # passes through as None, same as non-image rows —
                # not an opaque executor crash
                if (
                    r["kind"] != "image"
                    or r["payload"] is None
                    or pd.isna(r["width"])
                    or pd.isna(r["height"])
                    or int(r["width"]) <= 0
                    or int(r["height"]) <= 0
                ):
                    out.append(None)
                    continue
                W, H = int(r["width"]), int(r["height"])
                raw = np.frombuffer(bytes(r["payload"]), dtype=np.uint8)
                reps = -(-(W * H) // max(len(raw), 1)) if len(raw) else 1
                grid = (
                    np.tile(raw, reps)[: W * H].reshape(H, W)
                    if len(raw)
                    else np.zeros((H, W), dtype=np.uint8)
                )
                yi = (np.arange(h) * H) // h
                xj = (np.arange(w) * W) // w
                out.append(grid[np.ix_(yi, xj)].tobytes())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "width": np.int32(w),
                    "height": np.int32(h),
                    "payload": out,
                }
            )

    return media.mapInPandas(resize, schema=RESIZED_SCHEMA)
