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
