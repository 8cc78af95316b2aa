"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The container has no image/audio codecs, so the decode step is a
deterministic fake (clearly marked); everything Spark-side is real and
tested: binary column handling, schema, Arrow batch shape through
``mapInPandas``, and partition-parallel feature extraction.

Pattern for a real deployment: store media as ``binary`` + metadata
struct, decode/resize/frame-sample inside ``mapInPandas`` (one Arrow
batch = one work unit, so decoder state is amortized), keep features as
``array<float>`` columns for the similarity operators.
"""

from __future__ import annotations

import hashlib
import os
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

FEATURE_DIM = 8

MM_SCHEMA = (
    "doc_id long, n_bytes int, payload_sha string, feature array<float>"
)


def binary_payloads(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.text encoded as an opaque binary payload column with
    typed metadata — the multimodal storage layout."""
    d = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    return d.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.octet_length(F.col("text")).alias("n_bytes"),
        ).alias("meta"),
    )


def _fake_decode(payload: bytes) -> np.ndarray:
    """STUB for a real decoder (PIL/libav not available in this container).
    Deterministic: FEATURE_DIM means of the payload's byte values, chunked."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    if arr.size == 0:
        return np.zeros(FEATURE_DIM, dtype=np.float32)
    chunks = np.array_split(arr.astype(np.float32), FEATURE_DIM)
    return np.array([c.mean() if c.size else 0.0 for c in chunks], dtype=np.float32)


def extract_features(payloads: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over binary payloads (the real
    Spark plumbing: Arrow batches of binary columns -> vectorized work ->
    typed feature column)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            payloads_np = b["payload"].map(bytes)
            yield pd.DataFrame(
                {
                    "doc_id": b["doc_id"],
                    "n_bytes": payloads_np.map(len).astype("int32"),
                    "payload_sha": payloads_np.map(
                        lambda p: hashlib.sha256(p).hexdigest()
                    ),
                    "feature": payloads_np.map(lambda p: _fake_decode(p).tolist()),
                }
            )

    return payloads.mapInPandas(fn, schema=MM_SCHEMA)


def payload_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checkable slice of the multimodal path: byte length + sha256
    of the binary payload per doc (the feature vector is covered by unit
    tests; its decoder is the stubbed part)."""
    feats = extract_features(binary_payloads(spark, sf_dir))
    return feats.select("doc_id", F.col("n_bytes").cast("long").alias("n_bytes"), "payload_sha")


def feature_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Certified flattened feature stream ``(doc_id, dim, feature)``
    through the SAME mapInPandas/Arrow plumbing as extract_features:
    chunk mean = exact int64 byte sum / chunk length, divided in
    float64 — bit-reproducible in any engine, so a SQL oracle replays
    the decode's numeric output exactly (the float32 presentation in
    ``extract_features`` stays the similarity-operator contract).
    Docs shorter than FEATURE_DIM bytes are excluded (their trailing
    chunks are empty; the stub pads zeros — none exist in testdata)."""

    pay = binary_payloads(spark, sf_dir)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids, dims, raws = [], [], []
            for doc_id, payload in zip(b["doc_id"], b["payload"].map(bytes)):
                n = len(payload)
                if n < FEATURE_DIM:
                    continue
                arr = np.frombuffer(payload, dtype=np.uint8)
                # np.array_split directly — same chunking as the
                # float32 stub by construction (review r5: no
                # hand-mirrored boundary arithmetic to keep in sync)
                for j, c in enumerate(np.array_split(arr, FEATURE_DIM)):
                    ids.append(doc_id)
                    dims.append(j)
                    raws.append(int(c.sum(dtype=np.int64)) / c.size)
            yield pd.DataFrame({
                "doc_id": pd.Series(ids, dtype="int64"),
                "dim": pd.Series(dims, dtype="int32"),
                "raw": pd.Series(raws, dtype="float64"),
            })

    out = pay.mapInPandas(fn, schema="doc_id long, dim int, raw double")
    return out.select(
        "doc_id", F.col("dim").cast("long").alias("dim"),
        F.round("raw", 4).alias("feature"),
    )
