"""Distributed inverted-index construction (the `_bulk` path, Spark-first).

Reference behavior (SURVEY.md §3.2): docs are routed to shards by id hash,
analyzed, and written as immutable per-segment inverted indexes — term
dictionary -> postings (docID, tf, positions), delta-encoded in 128-doc
blocks with per-block max-impact data for block-max WAND. We reproduce the
*logical* layout Spark-first:

  corpus (repo,path,commit,lang,content)          [input, any DataFrame]
    -> docId = xxhash64(id cols), content_sha = sha2(content,256)
    -> seg   = pmod(docId, n_segments)            [shard analog]
    -> termvec pandas UDF (map-side combine: one row per (doc,term))
    -> shuffle on (seg, term)                     [the ONE big shuffle]
    -> per-partition numpy packing into 128-doc blocks
       (delta+varint docIds, varint tfs, byte4 norms inline, varint
        position gaps, per-block max_impact for WAND)
    -> parquet tables: postings/ docstats/ termstats/ globals/

Scale notes (100 TB design):
- The termvec UDF aggregates within the doc BEFORE the shuffle, so the
  shuffle carries (doc,term) rows, not per-occurrence rows (~5-20x less).
- Hot-term skew is defused structurally: the shuffle key is (seg, term),
  so one term's postings are split across n_segments reducers — a term in
  every doc still produces at most |segment| rows per reducer (this is the
  salted-repartition requirement of the north rule; seg doubles as salt).
- Postings are written partitioned by seg and sorted by term within files,
  so query-time term lookups get partition pruning + parquet row-group
  min/max skipping.
- Phase 2 (block packing) is checkpointed per segment-wave with a lineage
  manifest -> kill-and-rerun resumes without re-tokenizing (tokenization
  output is staged once in phase 1).

BM25 constants k1=1.2, b=0.75 follow the reference defaults
(``index/similarity/SimilarityProviders.java:276-292``).
"""

from __future__ import annotations

import json
import os
import shutil
from dataclasses import dataclass
from typing import Iterator, List, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from opensearch_spark.analysis.analyzer import termvec_udf
from opensearch_spark.analysis.smallfloat import decode_norms_np, int_to_byte4_np
from opensearch_spark.index import codec

K1 = 1.2
B = 0.75
DEFAULT_BLOCK = 128

# Block-max metadata is stored avgdl-independent: (max_tf, min_dl_q) give
# the query-time upper bound idf*(k1+1)*max_tf/(max_tf+k1*(1-b+b*min_dl_q/avgdl))
# — valid under ANY current avgdl, so incremental batches and compaction
# never invalidate stored bounds (impact is increasing in tf, decreasing in dl).
POSTINGS_SCHEMA = (
    "seg int, term string, block_no int, n_docs int, first_doc long, last_doc long, "
    "doc_bytes binary, tf_bytes binary, norm_bytes binary, pos_bytes binary, "
    "max_tf int, min_dl_q long"
)


@dataclass
class IndexPaths:
    root: str

    @property
    def postings(self) -> str:
        return os.path.join(self.root, "postings")

    @property
    def docstats(self) -> str:
        return os.path.join(self.root, "docstats")

    @property
    def termstats(self) -> str:
        return os.path.join(self.root, "termstats")

    @property
    def globals_(self) -> str:
        return os.path.join(self.root, "globals")

    @property
    def termvecs(self) -> str:
        return os.path.join(self.root, "_stage_termvecs")

    @property
    def lineage(self) -> str:
        return os.path.join(self.root, "lineage.json")

    @property
    def manifest(self) -> str:
        return os.path.join(self.root, "manifest.json")


def _read_json(path: str) -> dict:
    with open(path) as f:
        return json.load(f)


def _write_json_atomic(path: str, obj: dict) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f, indent=1, sort_keys=True)
    os.replace(tmp, path)


def _pack_partition(block_size: int):
    """mapInPandas fn: rows (seg,term,docId,tf,positions,norm_byte) ->
    packed posting-block rows. Requires all rows of a (seg,term) group to
    be co-located (guaranteed by the preceding repartition)."""

    def pack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        frames = [b for b in batches if len(b)]
        if not frames:
            return
        df = pd.concat(frames, ignore_index=True) if len(frames) > 1 else frames[0]
        doc = df["docId"].to_numpy(dtype=np.int64)
        tf = df["tf"].to_numpy(dtype=np.int64)
        nb = df["norm_byte"].to_numpy(dtype=np.int64).astype(np.uint8)
        seg = df["seg"].to_numpy(dtype=np.int64)
        terms = df["term"].to_numpy()
        positions = df["positions"].to_numpy()  # object array of lists

        # sort by (seg, term, docId); groups become contiguous
        order = np.lexsort((doc, terms, seg))
        doc, tf, nb, seg, terms, positions = (
            doc[order], tf[order], nb[order], seg[order], terms[order], positions[order]
        )
        n = len(doc)
        new_group = np.empty(n, dtype=bool)
        new_group[0] = True
        new_group[1:] = (terms[1:] != terms[:-1]) | (seg[1:] != seg[:-1])
        group_starts = np.flatnonzero(new_group)
        group_ends = np.append(group_starts[1:], n)

        dl_q = decode_norms_np(nb)

        out: dict[str, list] = {k: [] for k in (
            "seg", "term", "block_no", "n_docs", "first_doc", "last_doc",
            "doc_bytes", "tf_bytes", "norm_bytes", "pos_bytes", "max_tf", "min_dl_q",
        )}
        for gs, ge in zip(group_starts, group_ends):
            t = terms[gs]
            s = int(seg[gs])
            for bno, bs in enumerate(range(gs, ge, block_size)):
                be = min(bs + block_size, ge)
                d = doc[bs:be]
                f_ = tf[bs:be]
                pos_concat = (
                    np.concatenate([np.asarray(p, dtype=np.int64) for p in positions[bs:be]])
                    if (be > bs)
                    else np.empty(0, dtype=np.int64)
                )
                out["seg"].append(s)
                out["term"].append(t)
                out["block_no"].append(bno)
                out["n_docs"].append(be - bs)
                out["first_doc"].append(int(d[0]))
                out["last_doc"].append(int(d[-1]))
                out["doc_bytes"].append(codec.delta_encode_sorted(d))
                out["tf_bytes"].append(codec.varint_encode(f_.astype(np.uint64)))
                out["norm_bytes"].append(nb[bs:be].tobytes())
                out["pos_bytes"].append(codec.encode_positions(pos_concat, f_))
                out["max_tf"].append(int(f_.max()))
                out["min_dl_q"].append(int(dl_q[bs:be].min()))
        yield pd.DataFrame(out)

    return pack


def build_index(
    spark: SparkSession,
    corpus: DataFrame,
    out_dir: str,
    text_col: str = "content",
    id_cols: Sequence[str] = ("repo", "path", "commit"),
    doc_id_col: str | None = None,
    n_segments: int = 16,
    block_size: int = DEFAULT_BLOCK,
    shuffle_partitions: int | None = None,
    waves: int = 1,
    keep_stage: bool = False,
    overwrite: bool = True,
    _fail_after_wave: int | None = None,
) -> IndexPaths:
    """Build the inverted index for ``corpus[text_col]`` under ``out_dir``.

    ``waves`` > 1 splits phase-2 block packing into that many checkpointed
    segment groups (lineage manifest -> idempotent resume). If a previous
    partial build exists at ``out_dir`` and ``overwrite`` is False, the
    build resumes from the manifest.
    """
    paths = IndexPaths(out_dir)
    if overwrite and os.path.exists(out_dir) and not os.path.exists(paths.lineage):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir, exist_ok=True)

    lineage = _read_json(paths.lineage) if os.path.exists(paths.lineage) else {
        "phase1_done": False, "waves_done": [], "n_segments": n_segments, "waves": waves,
    }
    if lineage.get("n_segments") != n_segments or lineage.get("waves") != waves:
        # config changed -> full rebuild
        shutil.rmtree(out_dir)
        os.makedirs(out_dir)
        lineage = {"phase1_done": False, "waves_done": [], "n_segments": n_segments, "waves": waves}

    import time as _time
    _timing = os.environ.get("OSX_BUILD_TIMING") == "1"
    _t0 = _time.perf_counter()

    def _mark(label: str) -> None:
        nonlocal _t0
        if _timing:
            now = _time.perf_counter()
            print(f"[build_index] {label}: {now - _t0:.2f}s", flush=True)
            _t0 = now

    # ---- phase 1: ONE tokenization pass -> staged analyzed table ---------
    # Everything downstream (docstats, termstats, globals, posting packing)
    # derives from the stage via column-pruned parquet scans, so the corpus
    # text is read and analyzed exactly once (the dominant cost at scale).
    if not lineage["phase1_done"]:
        nshuf0 = shuffle_partitions or int(
            spark.conf.get("spark.sql.shuffle.partitions", "32")
        )
        # the analysis stage must parallelize even when the input is a
        # single unsplittable file: widen narrow inputs before tokenizing
        try:
            n_in = corpus.rdd.getNumPartitions()
        except Exception:
            n_in = nshuf0
        if n_in < max(nshuf0 // 2, 2):
            corpus = corpus.repartition(nshuf0)
        if doc_id_col is None:
            base = corpus.withColumn("docId", F.xxhash64(*[F.col(c) for c in id_cols]))
        else:
            base = corpus.withColumn("docId", F.col(doc_id_col).cast("long"))
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

        base = base.withColumn("norm_byte", norm_byte_udf("dl")).withColumn(
            "dl_q", dl_q_udf("norm_byte")
        )
        base.select(
            "docId", "seg", "dl", "norm_byte", "dl_q", "content_sha", "_tv"
        ).write.mode("overwrite").parquet(paths.termvecs)
        _mark("phase1 analyze+stage")

        stage = spark.read.parquet(paths.termvecs)
        # docstats: column-pruned scan (never touches the _tv column)
        stage.select("docId", "seg", "dl", "norm_byte", "dl_q", "content_sha").write.mode(
            "overwrite"
        ).parquet(paths.docstats)

        stage.select(F.explode("_tv").alias("e")).groupBy(F.col("e.term").alias("term")).agg(
            F.count("*").alias("df"), F.sum("e.tf").alias("ttf")
        ).write.mode("overwrite").parquet(paths.termstats)
        _mark("phase1 termstats")

        ds = spark.read.parquet(paths.docstats)
        g = ds.agg(
            F.count("*").alias("doc_count"),
            F.sum(F.when(F.col("dl") > 0, 1).otherwise(0)).alias("field_doc_count"),
            F.sum("dl").alias("sum_ttf"),
        ).collect()[0]
        # Lucene: avgFieldLength = sumTotalTermFreq / docCount (docs with
        # the field, i.e. with >=1 token), as double
        field_docs = int(g["field_doc_count"]) or 1
        globals_row = {
            "doc_count": int(g["doc_count"]),
            "field_doc_count": int(g["field_doc_count"]),
            "sum_ttf": int(g["sum_ttf"] or 0),
            "avgdl": float(int(g["sum_ttf"] or 0) / field_docs),
            "n_segments": n_segments,
            "block_size": block_size,
            "k1": K1,
            "b": B,
        }
        spark.createDataFrame([globals_row]).coalesce(1).write.mode("overwrite").parquet(
            paths.globals_
        )
        lineage["phase1_done"] = True
        lineage["globals"] = globals_row
        _write_json_atomic(paths.lineage, lineage)
        _mark("phase1 docstats+globals")

    # ---- phase 2: pack posting blocks per segment wave -------------------
    nshuf = shuffle_partitions or int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    all_waves = list(range(waves))
    seg_of_wave = {w: [s for s in range(n_segments) if s % waves == w] for w in all_waves}
    for w in all_waves:
        if w in lineage["waves_done"]:
            continue
        segs = seg_of_wave[w]
        tv = (
            spark.read.parquet(paths.termvecs)
            .where(F.col("seg").isin(segs))  # partition pruning per wave
            .select("docId", "seg", "norm_byte", F.explode("_tv").alias("e"))
            .select(
                "docId", "seg", "norm_byte",
                F.col("e.term").alias("term"),
                F.col("e.tf").alias("tf"),
                F.col("e.positions").alias("positions"),
            )
        )
        packed = (
            tv.repartition(nshuf, "seg", "term")
            .mapInPandas(_pack_partition(block_size), schema=POSTINGS_SCHEMA)
        )
        (
            packed.sortWithinPartitions("term", "block_no")
            .write.mode("append")
            .parquet(paths.postings)
        )
        lineage["waves_done"] = sorted(set(lineage["waves_done"]) | {w})
        _write_json_atomic(paths.lineage, lineage)
        _mark(f"phase2 pack wave {w}")
        if _fail_after_wave is not None and w >= _fail_after_wave:
            raise RuntimeError(f"injected failure after wave {w} (test seam)")

    if not keep_stage and os.path.exists(paths.termvecs):
        shutil.rmtree(paths.termvecs)
        lineage["stage_cleaned"] = True
        _write_json_atomic(paths.lineage, lineage)

    _write_json_atomic(paths.manifest, {
        "version": 1,
        "analyzer": "standard-uax29-subset-v1",
        **lineage["globals"],
    })
    return paths


def load_index(spark: SparkSession, out_dir: str) -> dict:
    """Open an index: returns dict of DataFrames + globals."""
    paths = IndexPaths(out_dir)
    manifest = _read_json(paths.manifest)
    return {
        "paths": paths,
        "postings": spark.read.parquet(paths.postings),
        "docstats": spark.read.parquet(paths.docstats),
        "termstats": spark.read.parquet(paths.termstats),
        "globals": manifest,
    }
