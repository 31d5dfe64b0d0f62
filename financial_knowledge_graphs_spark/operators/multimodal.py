"""Multimodal-column plumbing: opaque binary media + typed metadata.

Media spans in the interleaved documents table carry only ``media_ref``
pointers; this module materializes a ``media`` table
(doc_id, media_ref, kind, payload binary, meta struct) and runs
decode / feature-extract / frame-sample stages as Arrow-batched
``mapInPandas`` transforms.

The actual codecs (PIL/ffmpeg/etc.) are NOT available in this environment,
so the byte-level decode is STUBBED: ``decode_media(..., fake=True)``
produces a deterministic fake decode (shape + checksum features derived
from the payload bytes); ``fake=False`` raises NotImplementedError at the
decode call site. Everything Spark-side — schema, partitioning, UDF
signature, Arrow batch shape — is real and tested; swapping in a real codec
touches only ``_decode_bytes``.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, DoubleType, IntegerType, LongType,
    StringType, StructField, StructType,
)

MEDIA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("media_ref", StringType()),
        StructField("kind", StringType()),            # image | table | audio | video
        StructField("payload", BinaryType()),          # opaque bytes
        StructField("mime", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", LongType()),
    ]
)

FEATURES = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("media_ref", StringType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("checksum", StringType()),
        StructField("features", ArrayType(DoubleType())),  # fixed-dim vector
    ]
)


def media_table(documents: DataFrame) -> DataFrame:
    """Explode media spans into the media table; payload synthesized
    deterministically from the media_ref (stand-in for an object-store
    fetch, which at scale is a ``binaryFile`` read or an Iceberg blob
    column)."""
    spans = documents.select("doc_id", F.explode("spans").alias("s")).filter(
        F.col("s.kind") != "text"
    )
    ref = F.col("s.media_ref")
    payload = F.encode(F.repeat(F.sha2(ref, 256), 4), "utf-8")
    return spans.select(
        "doc_id",
        ref.alias("media_ref"),
        F.col("s.kind").alias("kind"),
        payload.alias("payload"),
        F.when(F.col("s.kind") == "image", F.lit("image/png"))
        .otherwise(F.lit("application/octet-stream")).alias("mime"),
        F.when(F.col("s.kind") == "image", F.lit(64)).cast("int").alias("width"),
        F.when(F.col("s.kind") == "image", F.lit(64)).cast("int").alias("height"),
        # deterministic synthetic duration for videos (1-31 s from the ref
        # hash) — the stand-in for container metadata; NULL elsewhere
        F.when(
            F.col("s.kind") == "video",
            (F.pmod(F.xxhash64(ref), F.lit(30_000)) + F.lit(1_000)),
        ).cast("long").alias("duration_ms"),
    )


def _decode_bytes(payload: bytes, kind: str, fake: bool) -> list[float]:
    """Decode media bytes → FEATURE_DIM-float feature vector.

    Real codec path intentionally unimplemented in this environment."""
    if not fake:
        raise NotImplementedError(
            "real media decode requires image/audio codecs not present in "
            "this container; run with fake=True or install codecs"
        )
    # deterministic fake: 8 doubles from the payload digest
    h = hashlib.sha256(payload or b"").digest()
    return [int.from_bytes(h[i:i + 4], "big") / float(0xFFFFFFFF) for i in range(0, 32, 4)]


def extract_features(media: DataFrame, fake: bool = True,
                     batch_hint: int = 256) -> DataFrame:
    """Arrow-batched feature extraction over the media table.

    mapInPandas keeps the payload column zero-copy through Arrow;
    ``batch_hint`` bounds how many payloads are decoded and buffered per
    yielded frame (Arrow hands us up to
    spark.sql.execution.arrow.maxRecordsPerBatch rows at once — with
    multi-MB real payloads that is the memory knob that matters)."""

    step = max(1, batch_hint)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for full in batches:
            for lo in range(0, len(full), step):
                pdf = full.iloc[lo:lo + step]
                feats = [
                    _decode_bytes(p, k, fake)
                    for p, k in zip(pdf["payload"], pdf["kind"])
                ]
                yield pd.DataFrame(
                    {
                        "doc_id": pdf["doc_id"],
                        "media_ref": pdf["media_ref"],
                        "kind": pdf["kind"],
                        "n_bytes": [len(p or b"") for p in pdf["payload"]],
                        "checksum": [hashlib.md5(p or b"").hexdigest() for p in pdf["payload"]],
                        "features": feats,
                    }
                )

    return media.mapInPandas(run, FEATURES)


def resize(media: DataFrame, width: int = 32, height: int = 32,
           fake: bool = True, batch_hint: int = 256) -> DataFrame:
    """Resize plumbing for image payloads: mapInPandas over Arrow batches,
    emitting a new payload + updated width/height metadata. The pixel-level
    resample is stubbed like every codec here (``fake=True`` derives a
    deterministic payload of the target size from the source digest;
    fake=False raises at the decode site) — schema, batching, and metadata
    propagation are the real, tested parts; a real codec replaces only the
    body of ``_resize_bytes``."""

    def _resize_bytes(payload: bytes, w: int, h: int, fake_: bool) -> bytes:
        if not fake_:
            raise NotImplementedError(
                "real image resize requires codecs not present in this "
                "container; run with fake=True or install codecs"
            )
        h0 = hashlib.sha256((payload or b"") + f":{w}x{h}".encode()).digest()
        reps = (w * h * 3) // len(h0) + 1
        return (h0 * reps)[: w * h * 3]

    step = max(1, batch_hint)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for full in batches:
            for lo in range(0, len(full), step):  # batch_hint bounds memory
                pdf = full.iloc[lo:lo + step]
                is_img = pdf["kind"] == "image"
                out = pdf.copy()
                out["payload"] = [
                    _resize_bytes(p, width, height, fake) if img else p
                    for p, img in zip(pdf["payload"], is_img)
                ]
                out["width"] = [width if img else w for w, img in zip(pdf["width"], is_img)]
                out["height"] = [height if img else h for h, img in zip(pdf["height"], is_img)]
                yield out

    return media.mapInPandas(run, MEDIA)


def frame_sample(media: DataFrame, every_ms: int = 1000, fake: bool = True) -> DataFrame:
    """Frame-sampling plumbing for video payloads: emits one row per sampled
    frame instant (t = 0, every_ms, 2·every_ms, … < duration_ms). Decode
    stubbed like extract_features. A NULL/zero duration emits NO frames
    (previously it emitted a phantom frame 0, and an exact-multiple
    duration lost its last in-range frame)."""
    dur = F.coalesce(F.col("duration_ms"), F.lit(0))
    last = F.floor((dur - F.lit(1)) / F.lit(every_ms)).cast("long")
    frames = media.filter((F.col("kind") == "video") & (dur > 0)).select(
        "doc_id", "media_ref",
        F.explode(F.sequence(F.lit(0).cast("long"), last)).alias("frame_idx"),
    )
    return frames
