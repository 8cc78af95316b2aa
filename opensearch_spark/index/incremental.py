"""Incremental index maintenance: append a batch of new docs (the NRT
refresh analog) and compact generations (the TieredMergePolicy analog).

Reference behavior (SURVEY.md §2.9, §3.2): writes create new immutable
segments, visible after refresh; background merges fold small segments
into larger ones. Spark-first mapping:

- ``add_batch`` analyzes only the new docs and APPENDS posting blocks
  into the same seg partitions (a new "generation" of blocks whose doc
  ranges overlap older ones — scorers merge-sort at decode, wand.py),
  appends docstats/termstats rows, and atomically updates the globals
  manifest (doc counts, avgdl). Stored block bounds are (max_tf,
  min_dl_q), avgdl-independent, so older blocks stay valid.
- ``compact_index`` rewrites each (seg, term) posting list as one sorted
  single-generation block run — decode -> merge -> repack, no
  re-tokenization (the merge reads index bytes only, like Lucene segment
  merges). termstats generations fold into one row per term.

Contract: append-only (no doc updates/deletes in v1 — the reference's
versioned upsert path is out of scope; noted in SURVEY §2.9 mapping).
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from opensearch_spark.analysis.analyzer import termvec_udf
from opensearch_spark.analysis.smallfloat import decode_norms_np, int_to_byte4_np
from opensearch_spark.index import codec
from opensearch_spark.index.build import (
    IndexPaths, POSTINGS_SCHEMA, _pack_partition, _read_json, _write_json_atomic,
)

TERMVEC_SCHEMA = (
    "docId long, seg int, norm_byte int, term string, tf int, positions array<int>"
)


def _analyze_batch(
    batch: DataFrame,
    text_col: str,
    id_cols: Sequence[str],
    doc_id_col: str | None,
    n_segments: int,
) -> DataFrame:
    if doc_id_col is None:
        base = batch.withColumn("docId", F.xxhash64(*[F.col(c) for c in id_cols]))
    else:
        base = batch.withColumn("docId", F.col(doc_id_col).cast("long"))
    base = (
        base.withColumn("content_sha", F.sha2(F.col(text_col).cast("string"), 256))
        .withColumn("seg", F.pmod(F.col("docId"), F.lit(n_segments)).cast("int"))
        .withColumn("_tv", termvec_udf()(F.col(text_col)))
        .withColumn("dl", F.aggregate("_tv", F.lit(0), lambda acc, x: acc + x["tf"]))
    )

    @F.pandas_udf("int")
    def norm_byte_udf(dl: pd.Series) -> pd.Series:
        return pd.Series(
            int_to_byte4_np(dl.to_numpy(dtype=np.int64)).astype(np.int64), index=dl.index
        )

    @F.pandas_udf("long")
    def dl_q_udf(nb: pd.Series) -> pd.Series:
        return pd.Series(
            decode_norms_np(nb.to_numpy(dtype=np.int64).astype(np.uint8)), index=nb.index
        )

    return base.withColumn("norm_byte", norm_byte_udf("dl")).withColumn(
        "dl_q", dl_q_udf("norm_byte")
    )


def add_batch(
    spark: SparkSession,
    batch: DataFrame,
    index_dir: str,
    text_col: str = "content",
    id_cols: Sequence[str] = ("repo", "path", "commit"),
    doc_id_col: str | None = None,
) -> dict:
    """Append one batch of new documents to an existing index. Returns the
    updated globals manifest. Visibility: readers opening the index after
    this returns see the new docs (the refresh analog)."""
    paths = IndexPaths(index_dir)
    manifest = _read_json(paths.manifest)
    n_segments = int(manifest["n_segments"])
    block_size = int(manifest["block_size"])

    base = _analyze_batch(batch, text_col, id_cols, doc_id_col, n_segments).cache()
    try:
        stats = base.agg(
            F.count("*").alias("n"),
            F.sum(F.when(F.col("dl") > 0, 1).otherwise(0)).alias("nf"),
            F.sum("dl").alias("ttf"),
        ).collect()[0]

        base.select("docId", "seg", "dl", "norm_byte", "dl_q", "content_sha").write.mode(
            "append"
        ).parquet(paths.docstats)

        tv = base.select("docId", "seg", "norm_byte", F.explode("_tv").alias("e")).select(
            "docId", "seg", "norm_byte",
            F.col("e.term").alias("term"),
            F.col("e.tf").alias("tf"),
            F.col("e.positions").alias("positions"),
        )
        nshuf = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
        (
            tv.repartition(nshuf, "seg", "term")
            .mapInPandas(_pack_partition(block_size), schema=POSTINGS_SCHEMA)
            .sortWithinPartitions("term", "block_no")
            .write.mode("append")
            .parquet(paths.postings)
        )

        tv.groupBy("term").agg(
            F.count("*").alias("df"), F.sum("tf").alias("ttf")
        ).write.mode("append").parquet(paths.termstats)
    finally:
        base.unpersist()

    manifest["doc_count"] = int(manifest["doc_count"]) + int(stats["n"])
    manifest["field_doc_count"] = int(manifest["field_doc_count"]) + int(stats["nf"] or 0)
    manifest["sum_ttf"] = int(manifest["sum_ttf"]) + int(stats["ttf"] or 0)
    manifest["avgdl"] = manifest["sum_ttf"] / max(manifest["field_doc_count"], 1)
    manifest["generations"] = int(manifest.get("generations", 1)) + 1
    _write_json_atomic(paths.manifest, manifest)
    return manifest


def _unpack_partition():
    """mapInPandas fn: posting-block rows -> termvec rows (decode side of
    the merge; inverse of _pack_partition)."""

    def unpack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if not len(b):
                continue
            out = {k: [] for k in ("docId", "seg", "norm_byte", "term", "tf", "positions")}
            for row in b.itertuples(index=False):
                n = int(row.n_docs)
                docs = codec.delta_decode_sorted(bytes(row.doc_bytes), n)
                tfs = codec.varint_decode(bytes(row.tf_bytes), n).astype(np.int64)
                nb = np.frombuffer(bytes(row.norm_bytes), dtype=np.uint8)
                pos = codec.decode_positions(bytes(row.pos_bytes), tfs)
                splits = np.split(pos, np.cumsum(tfs)[:-1])
                out["docId"].extend(docs.tolist())
                out["seg"].extend([int(row.seg)] * n)
                out["norm_byte"].extend(nb.astype(np.int64).tolist())
                out["term"].extend([row.term] * n)
                out["tf"].extend(tfs.tolist())
                out["positions"].extend([s.tolist() for s in splits])
            yield pd.DataFrame(out)

    return unpack


def compact_index(spark: SparkSession, index_dir: str) -> dict:
    """Fold all generations into one: rewrite postings as single sorted
    block runs per (seg, term) and termstats as one row per term. Safe to
    re-run; readers opening after the atomic swap see the compacted index."""
    paths = IndexPaths(index_dir)
    manifest = _read_json(paths.manifest)
    block_size = int(manifest["block_size"])
    nshuf = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    tmp_postings = paths.postings + ".compact"
    shutil.rmtree(tmp_postings, ignore_errors=True)
    (
        spark.read.parquet(paths.postings)
        .mapInPandas(_unpack_partition(), schema=TERMVEC_SCHEMA)
        .repartition(nshuf, "seg", "term")
        .mapInPandas(_pack_partition(block_size), schema=POSTINGS_SCHEMA)
        .sortWithinPartitions("term", "block_no")
        .write.mode("overwrite")
        .parquet(tmp_postings)
    )

    tmp_ts = paths.termstats + ".compact"
    shutil.rmtree(tmp_ts, ignore_errors=True)
    (
        spark.read.parquet(paths.termstats)
        .groupBy("term")
        .agg(F.sum("df").alias("df"), F.sum("ttf").alias("ttf"))
        .write.mode("overwrite")
        .parquet(tmp_ts)
    )

    # atomic-ish swap (single-filesystem rename)
    for live, tmp in ((paths.postings, tmp_postings), (paths.termstats, tmp_ts)):
        old = live + ".old"
        shutil.rmtree(old, ignore_errors=True)
        os.replace(live, old)
        os.replace(tmp, live)
        shutil.rmtree(old, ignore_errors=True)

    manifest["generations"] = 1
    _write_json_atomic(paths.manifest, manifest)
    return manifest
