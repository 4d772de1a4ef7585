"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns with a typed metadata struct, processed
by Arrow-batched ``mapInPandas`` stages — the same execution shape the
reference uses for row-wise model application
(reference: mindsdb/api/executor/sql_query/steps/apply_predictor_step.py:103-233,
re-expressed without the synthetic __mindsdb_row_id re-join).

The decode step is STUBBED: image/audio libraries are not in this
environment. ``decode_media`` raises NotImplementedError unless
``fake=True``, in which case it produces a deterministic feature vector
derived from the bytes (md5-seeded) so the Spark-side plumbing — schema,
Arrow batching, partitioning, UDF signature — is fully exercised and
oracle-checkable.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

col = F.col

# Canonical multimodal row schema: opaque payload + typed metadata.
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("content", BinaryType()),
        StructField("mime", StringType()),
        StructField("meta_width", LongType()),
        StructField("meta_height", LongType()),
    ]
)


def to_media_table(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Wrap a text table as a media table (payload = utf-8 bytes).

    Stands in for reading real image/audio payloads; the downstream
    plumbing is identical for any binary content.
    """
    return df.select(
        col(id_col).alias("media_id"),
        col(text_col).cast("binary").alias("content"),
        F.lit("text/plain").alias("mime"),
        F.lit(None).cast("long").alias("meta_width"),
        F.lit(None).cast("long").alias("meta_height"),
    )


def decode_media(content: bytes, mime: str, fake: bool = False) -> list[float]:
    """Decode payload → dense features. STUB: real decoders (PIL/ffmpeg/…)
    are not available in this container."""
    if not fake:
        raise NotImplementedError(
            "media decoding requires image/audio libraries not present in this "
            "environment; pass fake=True for the deterministic test double"
        )
    # Deterministic fake: 4 floats from the md5 digest of the payload.
    d = hashlib.md5(content).digest()
    return [round(b / 255.0, 6) for b in d[:4]]


FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("sig8", StringType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def extract_features(media: DataFrame, fake: bool = True, batch_hint: int | None = None) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    mapInPandas streams column batches through Python without ever
    materializing the table on the driver; partition count (and therefore
    parallelism) is inherited from the upstream plan.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pdf["content"].map(len).astype("int64"),
                    "sig8": pdf["content"].map(lambda b: hashlib.md5(b).hexdigest()[:8]),
                    "features": pdf.apply(
                        lambda r: decode_media(r["content"], r["mime"], fake=fake), axis=1
                    ),
                }
            )
            yield out

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def resize_images(media: DataFrame, width: int, height: int, fake: bool = True) -> DataFrame:
    """Resize stage: payload → payload with updated dimension metadata.

    The transform is a mapInPandas stage preserving the MEDIA_SCHEMA shape,
    so resizes chain with decode/extract stages in one plan. STUB: without
    an image library the fake path tags the payload with the target box
    (content passthrough) — the schema, batching, and metadata contract are
    the real plumbing a PIL-backed body drops into.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "image resizing requires PIL/opencv, not present in this "
                    "environment; pass fake=True for the passthrough double"
                )
            out = pdf.copy()
            out["meta_width"] = width
            out["meta_height"] = height
            yield out

    return media.mapInPandas(run, schema=MEDIA_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("frame", BinaryType()),
    ]
)


def sample_frames(media: DataFrame, every_n_bytes: int = 64, max_frames: int = 8) -> DataFrame:
    """Frame sampling: one media row fans out to ≤ max_frames frame rows.

    The row-to-many-rows shape of video frame extraction, expressed as
    mapInPandas so the fan-out happens executor-side (never through the
    driver) and downstream per-frame stages parallelize on the exploded
    rows. STUB: without ffmpeg, a "frame" is a deterministic byte slice of
    the payload — the fan-out contract (schema, ordering, bounded frames
    per row) is the real plumbing.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for _, r in pdf.iterrows():
                content = r["content"] or b""
                n = min(max_frames, max(len(content) // every_n_bytes, 1))
                for i in range(n):
                    ids.append(r["media_id"])
                    idxs.append(i)
                    frames.append(bytes(content[i * every_n_bytes : (i + 1) * every_n_bytes]))
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame": frames})

    return media.mapInPandas(run, schema=FRAME_SCHEMA)
