"""Incremental index maintenance: append a batch of new docs (the NRT
refresh analog) and compact generations (the TieredMergePolicy analog).

Reference behavior (SURVEY.md §2.9, §3.2): writes create new immutable
segments, visible after refresh; background merges fold small segments
into larger ones. Spark-first mapping:

- ``add_batch`` analyzes only the new docs and APPENDS posting blocks (a
  new "generation" of blocks whose doc ranges overlap older ones —
  scorers merge-sort at decode, wand.py), appends docstats/termstats
  rows, and atomically updates the globals manifest (doc counts, avgdl).
  Stored block bounds are (max_tf, min_dl_q), avgdl-independent, so
  older blocks stay valid.
- ``compact_index`` rewrites each (seg, term) posting list as one sorted
  single-generation block run — decode -> merge -> repack, no
  re-tokenization (the merge reads index bytes only, like Lucene segment
  merges). termstats is recomputed from the compacted postings metadata.

Contract: append-only (no doc updates/deletes in v1 — the reference's
versioned upsert path is out of scope; noted in SURVEY §2.9 mapping).
"""

from __future__ import annotations

import os
import shutil
from typing import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.storagelevel import StorageLevel

from opensearch_spark.index import codec
from opensearch_spark.index.build import (
    IndexPaths, POSTINGS_SCHEMA, _analyze, _occurrences, _pack_partition,
    _read_json, _write_json_atomic, write_termstats,
)

OCC_SCHEMA = "docId long, seg int, norm_byte int, pos int, term string"


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
    nshuf = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    base = _analyze(batch, text_col, id_cols, doc_id_col, n_segments).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    try:
        stats = base.agg(
            F.count("*").alias("n"),
            F.sum(F.when(F.col("dl") > 0, 1).otherwise(0)).alias("nf"),
            F.sum("dl").alias("ttf"),
        ).collect()[0]

        base.select("docId", "seg", "dl", "norm_byte", "dl_q", "content_sha").write.mode(
            "append"
        ).parquet(paths.docstats)

        packed = (
            _occurrences(base)
            .repartition(nshuf, "seg", "term")
            .mapInArrow(_pack_partition(block_size), schema=POSTINGS_SCHEMA)
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        try:
            packed.sortWithinPartitions("term", "block_no").write.mode("append").parquet(
                paths.postings
            )
            # per-generation term stats delta from the batch's own blocks
            packed.groupBy("term").agg(
                F.sum("n_docs").alias("df"), F.sum("sum_tf").alias("ttf")
            ).write.mode("append").parquet(paths.termstats)
        finally:
            packed.unpersist()
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
    """mapInPandas fn: posting-block rows -> per-occurrence rows (decode
    side of the merge; inverse of _pack_partition). Vectorized: per block
    row only numpy expansions, no per-doc Python objects."""

    def unpack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if not len(b):
                continue
            docs_p, seg_p, nb_p, pos_p, term_p = [], [], [], [], []
            for row in b.itertuples(index=False):
                n = int(row.n_docs)
                docs = codec.delta_decode_sorted(bytes(row.doc_bytes), n)
                tfs = codec.varint_decode(bytes(row.tf_bytes), n).astype(np.int64)
                nb = np.frombuffer(bytes(row.norm_bytes), dtype=np.uint8)
                pos = codec.decode_positions(bytes(row.pos_bytes), tfs)
                docs_p.append(np.repeat(docs, tfs))
                nb_p.append(np.repeat(nb.astype(np.int64), tfs))
                pos_p.append(pos)
                total = int(tfs.sum())
                seg_p.append(np.full(total, int(row.seg), dtype=np.int64))
                term_p.append(np.full(total, row.term, dtype=object))
            yield pd.DataFrame({
                "docId": np.concatenate(docs_p),
                "seg": np.concatenate(seg_p),
                "norm_byte": np.concatenate(nb_p),
                "pos": np.concatenate(pos_p),
                "term": np.concatenate(term_p),
            })

    return unpack


def compact_index(spark: SparkSession, index_dir: str,
                  target_segments: int | None = None) -> dict:
    """Fold all generations into one: rewrite postings as single sorted
    block runs per (seg, term); recompute termstats from the compacted
    metadata. Safe to re-run; readers opening after the atomic swap see
    the compacted index.

    ``target_segments``: also MERGE segments down to this count
    (seg -> seg % target) — the TieredMergePolicy analog
    (``index/TieredMergePolicyProvider.java:216-237``): builds want many
    small segments (task granularity), serving wants few big ones
    (per-query per-segment overhead); background merges reconcile the
    two. Queries regroup by the new seg ids transparently."""
    paths = IndexPaths(index_dir)
    manifest = _read_json(paths.manifest)
    block_size = int(manifest["block_size"])
    nshuf = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    # soft-delete purge (Lucene: merges drop deleted docs and reclaim
    # space): tombstoned docIds are filtered out of the occurrence
    # stream before re-packing, then docstats/globals are rewritten
    import glob as _glob

    deletes_dir = os.path.join(index_dir, "deletes")
    del_df = None
    if _glob.glob(os.path.join(deletes_dir, "*.parquet")):
        del_df = spark.read.parquet(deletes_dir).select("docId").distinct()

    tmp_postings = paths.postings + ".compact"
    shutil.rmtree(tmp_postings, ignore_errors=True)
    occ = spark.read.parquet(paths.postings).mapInPandas(
        _unpack_partition(), schema=OCC_SCHEMA
    )
    if del_df is not None:
        occ = occ.join(F.broadcast(del_df), "docId", "left_anti")
    if target_segments is not None:
        occ = occ.withColumn(
            "seg", F.pmod(F.col("seg"), F.lit(int(target_segments))).cast("int")
        )
    (
        occ
        .repartition(nshuf, "seg", "term")
        .mapInArrow(_pack_partition(block_size), schema=POSTINGS_SCHEMA)
        .sortWithinPartitions("term", "block_no")
        .write.mode("overwrite")
        .parquet(tmp_postings)
    )

    # atomic-ish swap (single-filesystem rename)
    old = paths.postings + ".old"
    shutil.rmtree(old, ignore_errors=True)
    os.replace(paths.postings, old)
    os.replace(tmp_postings, paths.postings)
    shutil.rmtree(old, ignore_errors=True)

    # termstats: one row per term again, from compacted metadata
    tmp_ts = paths.termstats + ".compact"
    shutil.rmtree(tmp_ts, ignore_errors=True)
    (
        spark.read.parquet(paths.postings)
        .groupBy("term")
        .agg(F.sum("n_docs").alias("df"), F.sum("sum_tf").alias("ttf"))
        .write.mode("overwrite")
        .parquet(tmp_ts)
    )
    old = paths.termstats + ".old"
    shutil.rmtree(old, ignore_errors=True)
    os.replace(paths.termstats, old)
    os.replace(tmp_ts, paths.termstats)
    shutil.rmtree(old, ignore_errors=True)

    if target_segments is not None:
        # remap docstats seg ids + manifest segment count
        tmp_ds2 = paths.docstats + ".remap"
        shutil.rmtree(tmp_ds2, ignore_errors=True)
        (
            spark.read.parquet(paths.docstats)
            .withColumn("seg", F.pmod(F.col("seg"), F.lit(int(target_segments))).cast("int"))
            .write.mode("overwrite").parquet(tmp_ds2)
        )
        old = paths.docstats + ".old"
        shutil.rmtree(old, ignore_errors=True)
        os.replace(paths.docstats, old)
        os.replace(tmp_ds2, paths.docstats)
        shutil.rmtree(old, ignore_errors=True)
        manifest["n_segments"] = int(target_segments)

    if del_df is not None:
        # docstats minus tombstones; globals/manifest recomputed
        tmp_ds = paths.docstats + ".compact"
        shutil.rmtree(tmp_ds, ignore_errors=True)
        (
            spark.read.parquet(paths.docstats)
            .join(F.broadcast(del_df), "docId", "left_anti")
            .write.mode("overwrite")
            .parquet(tmp_ds)
        )
        old = paths.docstats + ".old"
        shutil.rmtree(old, ignore_errors=True)
        os.replace(paths.docstats, old)
        os.replace(tmp_ds, paths.docstats)
        shutil.rmtree(old, ignore_errors=True)
        g = (
            spark.read.parquet(paths.docstats)
            .agg(
                F.count(F.lit(1)).alias("doc_count"),
                F.sum(F.when(F.col("dl") > 0, 1).otherwise(0)).alias("fdc"),
                F.sum("dl").alias("sum_ttf"),
            )
            .collect()[0]
        )
        fdc = int(g["fdc"] or 0) or 1
        manifest.update(
            doc_count=int(g["doc_count"]),
            field_doc_count=int(g["fdc"] or 0),
            sum_ttf=int(g["sum_ttf"] or 0),
            avgdl=float(int(g["sum_ttf"] or 0) / fdc),
        )
        shutil.rmtree(deletes_dir, ignore_errors=True)

    manifest["generations"] = 1
    _write_json_atomic(paths.manifest, manifest)
    return manifest
