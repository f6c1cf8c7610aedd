"""Multimodal column plumbing (north-star: image/audio/video as opaque
binary columns with typed metadata).

The container has no image/audio codecs, so the DECODE step is a
clearly-marked stub — but everything Spark-side is real and tested:
binary columns, typed metadata structs, Arrow-batched `mapInPandas`
featurization with a declared output schema, and partition-sized batch
flow. Swapping `_decode_stub` for a real decoder (PIL/torchaudio) changes
no plumbing.

Scale notes: blobs ride the executor as Arrow binary buffers; the
featurize pass is mapInPandas (per-partition batches, no shuffle at all),
so the pipeline scales with scan bandwidth. Metadata-only queries prune
the blob column at the parquet reader (columnar projection) — the 100 TB
reason to keep bytes and metadata in separate columns of one table.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mongodb_cdc_spark.io import load_table
from mongodb_cdc_spark.registry import query

FEATURE_SCHEMA = "doc_id bigint, n_bytes int, first_byte int, modality string"


def _decode_stub(blob: bytes) -> dict:
    """STUB decoder: a real deployment decodes image/audio here (PIL,
    ffmpeg, ...). Deterministic byte-level features stand in so the
    pipeline is exactly testable. Raises on None to mirror real decoder
    behavior on missing blobs."""
    if blob is None:
        raise NotImplementedError("no blob: real decoder would fetch/skip")
    return {"n_bytes": len(blob), "first_byte": blob[0] if blob else -1}


def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched featurization over (doc_id, content, modality)."""
    for pdf in batches:
        feats = [_decode_stub(b) for b in pdf["content"]]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": [f["n_bytes"] for f in feats],
                "first_byte": [f["first_byte"] for f in feats],
                "modality": pdf["modality"],
            }
        )


def binary_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The multimodal table: documents' text re-materialized as an opaque
    binary `content` column + typed metadata — the exact schema a real
    image/audio table would have (bytes + metadata side by side)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("content"),
        F.lit("text/plain").alias("modality"),
        F.struct(
            F.col("lang").alias("lang"),
            F.col("source").alias("source"),
            F.col("n_chars").alias("n_chars"),
        ).alias("meta"),
    )


@query(
    "mm_decode_features",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS INT) AS n_bytes,
           CAST(CASE WHEN length(text) > 0 THEN ascii(substring(text, 1, 1))
                     ELSE -1 END AS INT) AS first_byte,
           'text/plain' AS modality
    FROM documents
    """,
)
def mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column decode pipeline end-to-end: build the blob table,
    run the mapInPandas featurizer (stub decoder), emit per-doc features.
    The oracle recomputes the stub's byte-level features relationally —
    so the whole Arrow plumbing (binary transfer, batch iteration, output
    schema) is hash-verified even though the decoder is fake."""
    return binary_table(spark, sf_dir).mapInPandas(featurize, FEATURE_SCHEMA)
