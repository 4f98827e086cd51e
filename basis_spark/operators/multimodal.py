"""Multimodal (binary) column plumbing (SURVEY.md §1.3 north star).

Convention: a modality column is BinaryType payload + a typed metadata
struct {uri, mime, n_bytes}. The fixtures carry no real media, so the
*decode* step is stubbed (deterministic fake features / NotImplementedError
for real codecs — image/audio libs are not in this container), but the
Spark-side plumbing is real and tested: schema, Arrow batch shape,
mapInPandas signature, partitioning.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from basis_spark.io import load
from basis_spark.registry import register

FEATURE_SCHEMA = "doc_id long, mime string, n_bytes long, feat array<double>"


def decode_image(payload: bytes) -> object:
    """Real image decode — requires a codec library not present here."""
    raise NotImplementedError(
        "image decoding requires PIL/opencv, not available in this container; "
        "use fake_features for the tested plumbing path"
    )


def fake_features(payload: bytes, dim: int = 4) -> list[float]:
    """Deterministic stand-in for decode→feature-extract: byte-histogram
    moments. Same signature/batching a real extractor would have."""
    n = len(payload)
    if n == 0:
        return [0.0] * dim
    s = sum(payload)
    mx = max(payload)
    mn = min(payload)
    return [float(n), round(s / n, 6), float(mx), float(mn)]


def _extract_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    # One Arrow batch in, one out — constant memory per partition.
    for pdf in batches:
        feats = [fake_features(p) for p in pdf["payload"]]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "mime": pdf["mime"],
                "n_bytes": [len(p) for p in pdf["payload"]],
                "feat": feats,
            }
        )


def attach_binary(docs: DataFrame) -> DataFrame:
    """Wrap text as a binary modality column with typed metadata."""
    return docs.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.concat(F.lit("mem://doc/"), F.col("doc_id")).alias("uri"),
            F.lit("text/plain").alias("mime"),
            F.length(F.encode("text", "UTF-8")).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def resize_image(payload: bytes, w: int, h: int) -> bytes:
    """Real image resize — requires a codec library not present here."""
    raise NotImplementedError(
        "image resize requires PIL/opencv, not available in this container; "
        "use the fake_resize plumbing path"
    )


def fake_resize(payload: bytes, w: int, h: int) -> bytes:
    """Deterministic resize stand-in: stride-sample the byte stream to w*h
    bytes (same contract as a real thumbnailer: bytes in, smaller bytes
    out, output size a pure function of (w, h))."""
    target = w * h
    n = len(payload)
    if n == 0:
        return b"\x00" * target
    step = max(n // target, 1)
    out = payload[::step][:target]
    return out + b"\x00" * (target - len(out))


def _resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        thumbs = [fake_resize(p, 8, 8) for p in pdf["payload"]]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "thumb": thumbs,
                "thumb_bytes": [len(t) for t in thumbs],
            }
        )


@register(
    "multimodal_resize",
    oracle="""
    SELECT doc_id, CAST(64 AS BIGINT) AS thumb_bytes
    FROM documents
    """,
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Binary payload -> mapInPandas 8x8 "thumbnail" (stubbed codec). The
    # oracle pins the contract a real resizer must satisfy: one output
    # row per input, output size == w*h regardless of input size.
    docs = load(spark, sf_dir, "documents")
    bin_df = attach_binary(docs).select("doc_id", "payload")
    out = bin_df.mapInPandas(
        _resize_batches, schema="doc_id long, thumb binary, thumb_bytes long"
    )
    return out.select("doc_id", "thumb_bytes")


def sample_frames(payload: bytes, every_n: int) -> list[bytes]:
    """Real video frame sampling — requires a demuxer not present here."""
    raise NotImplementedError(
        "frame sampling requires ffmpeg/pyav, not available in this container; "
        "use the fake_frames plumbing path"
    )


_FRAME_SIZE = 16


def fake_frames(payload: bytes, every_n: int = 2) -> list[bytes]:
    """Deterministic frame-sample stand-in: treat the payload as fixed-size
    'frames' of _FRAME_SIZE bytes and keep every n-th, exactly the shape
    (one row in, list of binary frames out) of a real keyframe sampler."""
    frames = [
        payload[i : i + _FRAME_SIZE] for i in range(0, len(payload), _FRAME_SIZE)
    ]
    return frames[::every_n]


def _frames_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = {"doc_id": [], "frame_no": [], "frame": []}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            for k, fr in enumerate(fake_frames(payload)):
                rows["doc_id"].append(doc_id)
                rows["frame_no"].append(k)
                rows["frame"].append(fr)
        yield pd.DataFrame(rows)


@register(
    "multimodal_frame_sample",
    oracle="""
    SELECT doc_id,
           CAST(unnest(range(0, (CAST(ceil(strlen(text) / 16.0) AS BIGINT) + 1) // 2))
                AS INTEGER) AS frame_no
    FROM documents
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Binary payload -> mapInPandas one-to-many frame explode (stubbed
    # demux): keeps every 2nd 16-byte "frame". Oracle pins the fan-out
    # arithmetic (ceil(n/16) frames, every 2nd kept).
    docs = load(spark, sf_dir, "documents")
    bin_df = attach_binary(docs).select("doc_id", "payload")
    out = bin_df.mapInPandas(
        _frames_batches, schema="doc_id long, frame_no int, frame binary"
    )
    return out.select("doc_id", "frame_no")


@register(
    "multimodal_features",
    oracle="""
    SELECT doc_id, 'text/plain' AS mime, CAST(strlen(text) AS BIGINT) AS n_bytes
    FROM documents
    """,
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Binary payload -> mapInPandas feature extraction (stubbed decode).
    # The oracle checks the metadata plumbing (byte lengths); the fake
    # feature vector itself is asserted in tests/test_tolerance.py.
    docs = load(spark, sf_dir, "documents")
    bin_df = attach_binary(docs).select(
        "doc_id", "payload", F.col("meta.mime").alias("mime")
    )
    feats = bin_df.mapInPandas(_extract_batches, schema=FEATURE_SCHEMA)
    return feats.select("doc_id", "mime", "n_bytes")
