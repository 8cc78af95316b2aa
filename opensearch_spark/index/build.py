"""Distributed inverted-index construction (the `_bulk` path, Spark-first).

Reference behavior (SURVEY.md §3.2): docs are routed to shards by id hash,
analyzed, and written as immutable per-segment inverted indexes — term
dictionary -> postings (docID, tf, positions), delta-encoded in 128-doc
blocks with per-block max-impact data for block-max WAND. We reproduce the
*logical* layout Spark-first:

DEFAULT path (waves == 1): SEGMENT-LOCAL, ZERO-SHUFFLE — the Lucene
shard/segment write model (each shard's IndexWriter builds its own
complete inverted index):

  corpus (repo,path,commit,lang,content)          [input, any DataFrame]
    -> docId = xxhash64(id cols), content_sha = sha2 (JVM-side)
    -> seg = spark partition id                   [shard analog]
    -> ONE mapInArrow per segment (_local_index_fn):
         tokenize (DuckDB regexp_extract_all on the Arrow batch; token
         strings stay in Arrow buffers — never Python objects)
         -> occurrence arrays -> vectorized numpy packing into 128-doc
         blocks (delta+varint docIds, varint tfs, byte4 norms inline,
         varint position gaps, per-block (max_tf, min_dl_q) WAND bounds)
         + per-doc stats written side-channel (segment-file analog)
    -> parquet tables: postings/ docstats/ termstats/ globals/

RESUMABLE path (waves > 1): tokenized corpus staged once, each wave
packs a segment group through a (seg, term) shuffle and checkpoints to
the lineage manifest -> kill-and-rerun resumes without re-tokenizing.

Scale notes (100 TB design):
- The default path moves NO data: doc->segment placement reuses input
  partitioning (one repartition of raw text only if the caller forces a
  different segment count). The build is embarrassingly parallel;
  measured weak scaling is flat (BASELINE.md).
- Hot-term skew is defused structurally: segments partition by DOC, so
  a term in every doc contributes at most |segment| occurrences per
  task (the salted-repartition requirement; seg = the salt).
- n_segments is the task granularity: use ~4x cores (stragglers/AQE),
  but keep segments >= a few thousand docs; serving prefers FEW large
  segments -> merge down with compact_index(target_segments=...).
- Per-process Arrow/DuckDB thread pools are pinned to 1 inside the UDF:
  N workers x N default threads oversubscribes the host quadratically.
- Posting files are sorted by term -> parquet row-group min/max
  skipping at query time; termstats derives from packed metadata
  columns (n_docs, sum_tf) — no second pass over token data.

BM25 constants k1=1.2, b=0.75 follow the reference defaults
(``index/similarity/SimilarityProviders.java:276-292``).
"""

from __future__ import annotations

import json
import os
import shutil
from dataclasses import dataclass
from typing import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from opensearch_spark.analysis.analyzer import tokens_udf
from opensearch_spark.analysis.smallfloat import (
    decode_norms_np, int_to_byte4_np, length_table,
)
from opensearch_spark.index import codec

K1 = 1.2
B = 0.75
DEFAULT_BLOCK = 128

# Block-max metadata is stored avgdl-independent: (max_tf, min_dl_q) give
# the query-time bound idf*(k1+1)*max_tf/(max_tf+k1*(1-b+b*min_dl_q/avgdl))
# — valid under ANY current avgdl, so incremental batches and compaction
# never invalidate stored bounds (impact increases in tf, decreases in dl).
POSTINGS_SCHEMA = (
    "seg int, term string, block_no int, n_docs int, first_doc long, last_doc long, "
    "doc_bytes binary, tf_bytes binary, norm_bytes binary, pos_bytes binary, "
    "max_tf int, min_dl_q long, sum_tf long"
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


_INT32_MAX = (1 << 31) - 1


def _binary_col(buf: bytes, offsets: np.ndarray):
    """ZERO-COPY Arrow BinaryArray from a (values buffer, offsets) pair —
    blocks tile their byte streams contiguously, so no slicing loop.

    Offsets are 32-bit (pa.binary()); a single partition packing > 2 GiB
    of varint stream would silently wrap, so guard and fail with an
    actionable hint instead (one task == one segment in the zero-shuffle
    path, and compaction deliberately merges to few large segments)."""
    import pyarrow as pa

    if offsets.size and int(offsets[-1]) > _INT32_MAX:
        raise ValueError(
            f"posting byte stream ({int(offsets[-1])} bytes) exceeds the "
            "2 GiB int32 Arrow offset limit for one segment — raise "
            "n_segments (smaller segments) or compact to more target "
            "segments"
        )
    off32 = offsets.astype(np.int32)
    return pa.Array.from_buffers(
        pa.binary(), off32.size - 1,
        [None, pa.py_buffer(off32.tobytes()), pa.py_buffer(buf)],
    )


def _pack_arrays(doc, nb, seg, pos, codes, uniques, block_size):
    """Vectorized numpy core: per-occurrence arrays -> one Arrow
    RecordBatch of packed posting blocks (POSTINGS_SCHEMA).

    One lexsort orders occurrences by (seg, term, doc, pos); doc-group
    and block boundaries come from flag arrays; per-block aggregates use
    ``reduceat``; each byte stream (doc deltas, tfs, position gaps) is
    varint-encoded ONCE, and the binary columns are zero-copy
    (offsets, buffer) BinaryArrays. ``uniques`` is the Arrow term
    dictionary — term strings never materialize as Python objects (the
    Arrow->pandas object-dtype conversion was the memory-bandwidth hot
    spot at high core counts)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if True:  # keep the original indentation of the packing pipeline
        order = np.lexsort((pos, doc, codes, seg))
        doc, nb, seg, pos, codes = (
            doc[order], nb[order], seg[order], pos[order], codes[order]
        )
        n = doc.size

        # doc-group boundaries: one group per (seg, term, doc)
        occ_new = np.empty(n, dtype=bool)
        occ_new[0] = True
        occ_new[1:] = (
            (doc[1:] != doc[:-1]) | (codes[1:] != codes[:-1]) | (seg[1:] != seg[:-1])
        )
        dg_start = np.flatnonzero(occ_new)
        dg_end = np.append(dg_start[1:], n)
        tf = dg_end - dg_start
        d_doc = np.ascontiguousarray(doc[dg_start])
        d_nb = nb[dg_start]
        d_code = codes[dg_start]
        d_seg = seg[dg_start]
        n_dg = dg_start.size

        # (seg,term)-group and block boundaries at doc-group level
        tg_new = np.empty(n_dg, dtype=bool)
        tg_new[0] = True
        tg_new[1:] = (d_code[1:] != d_code[:-1]) | (d_seg[1:] != d_seg[:-1])
        tg_first = np.flatnonzero(tg_new)
        tg_len = np.append(tg_first[1:], n_dg) - tg_first
        idx_in_group = np.arange(n_dg, dtype=np.int64) - np.repeat(tg_first, tg_len)
        blk_new = tg_new | (idx_in_group % block_size == 0)
        bs = np.flatnonzero(blk_new)
        be = np.append(bs[1:], n_dg)

        dl_q = length_table()[d_nb]

        # doc-id stream: zigzag(first-of-block) + unsigned deltas
        du = d_doc.view(np.uint64)
        u = np.empty(n_dg, dtype=np.uint64)
        u[1:] = du[1:] - du[:-1]
        u[bs] = codec.zigzag_encode(d_doc[bs])
        doc_buf, doc_lens = codec.varint_encode_lengths(u)
        doc_off = np.concatenate(([0], np.cumsum(doc_lens)))

        tf_buf, tf_lens = codec.varint_encode_lengths(tf.astype(np.uint64))
        tf_off = np.concatenate(([0], np.cumsum(tf_lens)))

        # position stream: per-doc first position raw, then gaps
        gaps = pos.copy()
        gaps[1:] -= pos[:-1]
        gaps[dg_start] = pos[dg_start]
        pos_buf, pos_lens = codec.varint_encode_lengths(gaps.astype(np.uint64))
        pos_off = np.concatenate(([0], np.cumsum(pos_lens)))

        occ_a = dg_start[bs]          # first occurrence of each block
        # blocks tile the doc-group range contiguously -> zero-copy
        # (offsets, buffer) BinaryArrays; the offsets are just the byte
        # prefix sums evaluated at block boundaries
        blk_edges = np.append(bs, n_dg)
        occ_edges = np.append(occ_a, dg_end[be[-1] - 1])
        norm_off = np.append(bs, n_dg)  # 1 byte per doc-group

        return pa.record_batch(
            [
                pa.array(d_seg[bs].astype(np.int32), pa.int32()),
                pc.take(uniques, pa.array(d_code[bs])),
                pa.array((idx_in_group[bs] // block_size).astype(np.int32), pa.int32()),
                pa.array((be - bs).astype(np.int32), pa.int32()),
                pa.array(d_doc[bs], pa.int64()),
                pa.array(d_doc[be - 1], pa.int64()),
                _binary_col(doc_buf, doc_off[blk_edges]),
                _binary_col(tf_buf, tf_off[blk_edges]),
                _binary_col(d_nb.tobytes(), norm_off),
                _binary_col(pos_buf, pos_off[occ_edges]),
                pa.array(np.maximum.reduceat(tf, bs).astype(np.int32), pa.int32()),
                pa.array(np.minimum.reduceat(dl_q, bs), pa.int64()),
                pa.array(np.add.reduceat(tf, bs), pa.int64()),
            ],
            names=[
                "seg", "term", "block_no", "n_docs", "first_doc", "last_doc",
                "doc_bytes", "tf_bytes", "norm_bytes", "pos_bytes",
                "max_tf", "min_dl_q", "sum_tf",
            ],
        )


def _pack_partition(block_size: int):
    """mapInArrow fn: per-OCCURRENCE rows (seg, term, docId, norm_byte,
    pos) -> packed posting-block rows (_pack_arrays core). Requires all
    rows of a (seg, term) group co-located (guaranteed by the preceding
    repartition). Used by the staged/resumable build path and by the
    compaction merge (incremental.py)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def pack(batches):
        tables = [pa.Table.from_batches([b]) for b in batches]
        if not tables:
            return
        t = pa.concat_tables(tables).combine_chunks()
        if t.num_rows == 0:
            return
        doc = t.column("docId").to_numpy(zero_copy_only=False).astype(np.int64)
        nb = t.column("norm_byte").to_numpy(zero_copy_only=False).astype(np.uint8)
        seg = t.column("seg").to_numpy(zero_copy_only=False).astype(np.int64)
        pos = t.column("pos").to_numpy(zero_copy_only=False).astype(np.int64)
        enc = pc.dictionary_encode(t.column("term")).combine_chunks()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        yield _pack_arrays(doc, nb, seg, pos, codes, enc.dictionary, block_size)

    return pack


def _local_index_fn(block_size: int, docstats_dir: str, tok_expr: str,
                    analyzer: str = "standard",
                    index_options: str = "positions"):
    """mapInArrow fn implementing SEGMENT-LOCAL indexing — the Lucene
    shard-build analog (reference: each shard's IndexWriter builds its
    own complete per-segment inverted index; SURVEY.md §3.2). One
    partition == one segment: the UDF tokenizes its documents and packs
    their COMPLETE posting lists locally, so there is NO occurrence
    shuffle at all (the doc->segment placement is the only data
    movement, and reusing input partitioning makes even that free).

    Tokenization runs inside an embedded DuckDB (single-threaded) via
    ``regexp_extract_all`` on the Arrow batch: token strings stay in
    Arrow list buffers end-to-end — flat terms = ListArray.values
    (zero copy), per-doc positions = arange over the list offsets. The
    RE2 token regex is the SAME dialect the correctness oracle uses, so
    engine==oracle parity already validates it against the Python
    analyzer.

    Per-doc stats (dl, norm, sha) are written SIDE-CHANNEL as one
    parquet file per segment (``docstats/seg-NNNNN.parquet``) — the
    Lucene segment-file analog; deterministic filenames make task
    retries idempotent (last writer wins with identical content)."""
    import duckdb
    import pyarrow as pa
    import pyarrow.compute as pc

    from opensearch_spark.analysis.analyzer import MAX_TOKEN_LENGTH

    def fn(batches):
        # each executor core runs one python worker: pin the per-process
        # Arrow/DuckDB thread pools to 1 or N workers x N threads
        # oversubscribe the host quadratically
        try:
            pa.set_cpu_count(1)
            pa.set_io_thread_count(1)
        except Exception:
            pass
        tables = [pa.Table.from_batches([b]) for b in batches]
        if not tables:
            return
        t = pa.concat_tables(tables).combine_chunks()
        if t.num_rows == 0:
            return
        con = duckdb.connect(config={"threads": 1})
        con.register("docs", t)
        toks_t = con.execute(
            "SELECT " + tok_expr + " AS toks FROM docs"
        ).arrow()
        con.close()
        toks = toks_t.column("toks").combine_chunks()
        flat = toks.values            # StringArray — no Python strings
        offs = toks.offsets.to_numpy().astype(np.int64)
        lens = np.diff(offs)

        # Lucene max_token_length chunking (rare): only engage the slow
        # path if some token exceeds the cap
        max_len = pc.max(pc.utf8_length(flat)).as_py() if len(flat) else 0
        if (analyzer == "standard" and max_len is not None
                and max_len > MAX_TOKEN_LENGTH):
            # max_token_length chunking applies to the standard analyzer
            # only (whitespace/keyword keep whole tokens, like Lucene)
            from opensearch_spark.analysis.analyzer import tokenize

            texts = t.column("content").to_pylist()
            py_toks = [tokenize(x or "") for x in texts]
            lens = np.array([len(x) for x in py_toks], dtype=np.int64)
            offs = np.concatenate(([0], np.cumsum(lens)))
            flat = pa.array(
                [tok for lst in py_toks for tok in lst], pa.string()
            )

        doc_ids = t.column("docId").to_numpy(zero_copy_only=False).astype(np.int64)
        seg_col = t.column("seg").to_numpy(zero_copy_only=False).astype(np.int64)
        dl = lens
        norm_byte = int_to_byte4_np(dl)
        dl_q = decode_norms_np(norm_byte)

        # ---- docstats side-channel (segment file) ---------------------
        # deterministic per-partition filename -> task retries are
        # idempotent (rewrite identical content)
        from pyspark import TaskContext

        ctx = TaskContext.get()
        seg_id = ctx.partitionId() if ctx is not None else int(seg_col[0])
        os.makedirs(docstats_dir, exist_ok=True)
        import pyarrow.parquet as pq

        # write-to-temp + atomic rename: pq.write_table is not atomic, and
        # concurrent speculative/zombie attempts may race on the same
        # deterministic filename — os.replace makes last-writer-wins with
        # never-partial content (content is identical across attempts)
        _ds_path = os.path.join(docstats_dir, f"seg-{seg_id:05d}.parquet")
        _ds_tmp = f"{_ds_path}.{os.getpid()}.tmp"
        pq.write_table(
            pa.table({
                "docId": pa.array(doc_ids, pa.int64()),
                "seg": pa.array(seg_col.astype(np.int32), pa.int32()),
                "dl": pa.array(dl.astype(np.int32), pa.int32()),
                # int32, matching the wave path's pandas_udf("int") and
                # incremental's OCC_SCHEMA: a mixed int32/int64 docstats
                # dir (local build + later upsert generations) fails to
                # read with PARQUET_COLUMN_DATA_TYPE_MISMATCH
                "norm_byte": pa.array(norm_byte.astype(np.int32), pa.int32()),
                "dl_q": pa.array(dl_q.astype(np.int64), pa.int64()),
                "content_sha": t.column("content_sha"),
            }),
            _ds_tmp,
        )
        os.replace(_ds_tmp, _ds_path)

        # per-segment 1-row globals partial (coordinator-mergeable shard
        # stats): the driver sums n_segments tiny files instead of
        # running a Spark agg job over every doc. The "_" prefix keeps
        # Spark parquet readers of docstats/ from picking these up.
        _sm_dir = os.path.join(docstats_dir, "_summaries")
        os.makedirs(_sm_dir, exist_ok=True)
        _sm_path = os.path.join(_sm_dir, f"seg-{seg_id:05d}.parquet")
        _sm_tmp = f"{_sm_path}.{os.getpid()}.tmp"
        pq.write_table(
            pa.table({
                "seg": pa.array([int(seg_id)], pa.int64()),
                "doc_count": pa.array([int(doc_ids.size)], pa.int64()),
                "fdc": pa.array([int((dl > 0).sum())], pa.int64()),
                "sum_ttf": pa.array([int(dl.sum())], pa.int64()),
            }),
            _sm_tmp,
        )
        os.replace(_sm_tmp, _sm_path)

        if int(dl.sum()) == 0:
            return
        # ---- occurrence arrays (all within this segment) --------------
        doc_rep = np.repeat(doc_ids, dl)
        nb_rep = np.repeat(norm_byte.astype(np.uint8), dl)
        seg_rep = np.repeat(seg_col, dl)
        pos = np.arange(doc_rep.size, dtype=np.int64) - np.repeat(offs[:-1], dl)
        enc = pc.dictionary_encode(flat)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        if index_options == "docs":
            # match_only_text storage (reference:
            # MatchOnlyTextFieldMapper.java:46 — IndexOptions.DOCS, no
            # freqs/positions, norms unused): keep ONE occurrence per
            # (doc, term) with position 0; tf collapses to 1 and
            # pos_bytes to a single varint per posting. Phrase queries
            # re-verify against the source at query time.
            order = np.lexsort((doc_rep, codes))
            cs, ds = codes[order], doc_rep[order]
            keep = np.ones(order.size, dtype=bool)
            keep[1:] = (cs[1:] != cs[:-1]) | (ds[1:] != ds[:-1])
            first = order[keep]
            doc_rep, nb_rep, seg_rep = (
                doc_rep[first], nb_rep[first], seg_rep[first])
            codes = codes[first]
            pos = np.zeros(first.size, dtype=np.int64)
        yield _pack_arrays(
            doc_rep, nb_rep, seg_rep, pos, codes, enc.dictionary, block_size
        )

    return fn


def _analyze(
    corpus: DataFrame,
    text_col: str,
    id_cols: Sequence[str],
    doc_id_col: str | None,
    n_segments: int,
    analyzer: str = "standard",
) -> DataFrame:
    """corpus -> (docId, seg, dl, norm_byte, dl_q, content_sha, toks)."""
    if doc_id_col is None:
        base = corpus.withColumn("docId", F.xxhash64(*[F.col(c) for c in id_cols]))
    else:
        base = corpus.withColumn("docId", F.col(doc_id_col).cast("long"))
    base = (
        base.withColumn("content_sha", F.sha2(F.col(text_col).cast("string"), 256))
        .withColumn("seg", F.pmod(F.col("docId"), F.lit(n_segments)).cast("int"))
        .withColumn("toks", tokens_udf(analyzer)(F.col(text_col)))
        .withColumn("dl", F.size("toks"))
    )

    @F.pandas_udf("int")
    def norm_byte_udf(dl: pd.Series) -> pd.Series:
        return pd.Series(
            int_to_byte4_np(dl.to_numpy(dtype=np.int64)).astype(np.int64), index=dl.index
        )

    @F.pandas_udf("long")
    def dl_q_udf(nbv: pd.Series) -> pd.Series:
        return pd.Series(
            decode_norms_np(nbv.to_numpy(dtype=np.int64).astype(np.uint8)), index=nbv.index
        )

    return base.withColumn("norm_byte", norm_byte_udf("dl")).withColumn(
        "dl_q", dl_q_udf("norm_byte")
    ).select("docId", "seg", "dl", "norm_byte", "dl_q", "content_sha", "toks")


def _occurrences(stage: DataFrame) -> DataFrame:
    """staged rows -> per-occurrence (docId, seg, norm_byte, pos, term)."""
    return stage.select(
        "docId", "seg", "norm_byte", F.posexplode("toks").alias("pos", "term")
    )


def write_termstats(spark: SparkSession, paths: IndexPaths) -> None:
    """Global per-term df/ttf from the packed postings' metadata columns
    (column-pruned scan of n_docs/sum_tf — no pass over token data)."""
    (
        spark.read.parquet(paths.postings)
        .groupBy("term")
        .agg(F.sum("n_docs").alias("df"), F.sum("sum_tf").alias("ttf"))
        .write.mode("overwrite")
        .parquet(paths.termstats)
    )


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
    analyzer: str = "standard",
    index_options: str = "positions",
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

    fresh = {
        "phase1_done": False, "waves_done": [], "termstats_done": False,
        "n_segments": n_segments, "waves": waves,
    }
    lineage = _read_json(paths.lineage) if os.path.exists(paths.lineage) else dict(fresh)
    if lineage.get("n_segments") != n_segments or lineage.get("waves") != waves:
        # config changed -> full rebuild
        shutil.rmtree(out_dir)
        os.makedirs(out_dir)
        lineage = dict(fresh)

    import time as _time
    _timing = os.environ.get("OSX_BUILD_TIMING") == "1"
    _t0 = _time.perf_counter()

    def _mark(label: str) -> None:
        nonlocal _t0
        if _timing:
            now = _time.perf_counter()
            print(f"[build_index] {label}: {now - _t0:.2f}s", flush=True)
            _t0 = now

    nshuf = shuffle_partitions or int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    def _write_globals(globals_row: dict) -> None:
        # 1-row table: write directly with pyarrow (a Spark job for one
        # row is pure scheduler overhead)
        import pyarrow as pa
        import pyarrow.parquet as pq

        os.makedirs(paths.globals_, exist_ok=True)
        pq.write_table(
            pa.Table.from_pylist([globals_row]),
            os.path.join(paths.globals_, "part-00000.parquet"),
        )

    def _globals_row(doc_count: int, field_doc_count: int, sum_ttf: int) -> dict:
        # Lucene: avgFieldLength = sumTotalTermFreq / docCount (docs with
        # the field, i.e. with >= 1 token), as double
        return {
            "doc_count": doc_count,
            "field_doc_count": field_doc_count,
            "sum_ttf": sum_ttf,
            "avgdl": float(sum_ttf / (field_doc_count or 1)),
            "n_segments": n_segments,
            "block_size": block_size,
            "k1": K1,
            "b": B,
            "index_options": index_options,
        }

    use_stage = waves > 1
    if index_options not in ("positions", "docs"):
        raise ValueError(f"unknown index_options: {index_options}")
    if use_stage and index_options != "positions":
        raise ValueError("index_options='docs' supports the default "
                         "segment-local build path only")
    if not use_stage:
        # ---- SEGMENT-LOCAL build (default): one pass, ZERO shuffle -------
        # One partition == one segment; each task tokenizes its docs and
        # packs their complete posting lists locally (_local_index_fn),
        # writing per-doc stats side-channel — the Lucene shard/segment
        # write model. Data movement: at most one repartition of the raw
        # corpus to set the segment count (free when the input already
        # has n_segments partitions).
        if 0 not in lineage["waves_done"]:
            from opensearch_spark.analysis.analyzer import duckdb_tokens_expr

            if doc_id_col is None:
                base = corpus.withColumn(
                    "docId", F.xxhash64(*[F.col(c) for c in id_cols])
                )
            else:
                base = corpus.withColumn("docId", F.col(doc_id_col).cast("long"))
            prepared = base.withColumn(
                "content_sha", F.sha2(F.col(text_col).cast("string"), 256)
            ).select("docId", "content_sha", F.col(text_col).alias("content"))
            try:
                n_in = prepared.rdd.getNumPartitions()
            except Exception:
                n_in = 0
            if n_in != n_segments:
                prepared = prepared.repartition(n_segments)
            prepared = prepared.withColumn("seg", F.spark_partition_id())
            shutil.rmtree(paths.docstats, ignore_errors=True)
            packed = prepared.mapInArrow(
                _local_index_fn(block_size, paths.docstats,
                                duckdb_tokens_expr(analyzer), analyzer,
                                index_options=index_options),
                schema=POSTINGS_SCHEMA,
            )
            (
                packed.sortWithinPartitions("term", "block_no")
                .write.mode("overwrite")
                .parquet(paths.postings)
            )
            _mark("local index (tokenize+pack+docstats)")

            # globals = driver-side merge of the per-segment 1-row
            # partials the indexing tasks wrote (n_segments tiny files —
            # the coordinator's shard-stats reduce); fall back to a Spark
            # agg over docstats if the partials are absent
            import glob as _glob

            _sm_files = sorted(
                _glob.glob(os.path.join(paths.docstats, "_summaries",
                                        "seg-*.parquet")))
            if _sm_files:
                import pyarrow.parquet as _pq

                _tot = [0, 0, 0]
                for _f in _sm_files:
                    _t = _pq.read_table(_f)
                    _tot[0] += int(_t.column("doc_count")[0].as_py())
                    _tot[1] += int(_t.column("fdc")[0].as_py())
                    _tot[2] += int(_t.column("sum_ttf")[0].as_py())
                globals_row = _globals_row(_tot[0], _tot[1], _tot[2])
            else:
                ds = spark.read.parquet(paths.docstats)
                g = ds.agg(
                    F.count(F.lit(1)).alias("doc_count"),
                    F.sum(F.when(F.col("dl") > 0, 1).otherwise(0)).alias("fdc"),
                    F.sum("dl").alias("sum_ttf"),
                ).collect()[0]
                globals_row = _globals_row(
                    int(g["doc_count"]), int(g["fdc"] or 0),
                    int(g["sum_ttf"] or 0)
                )
            _write_globals(globals_row)
            lineage.update(
                phase1_done=True, waves_done=[0], globals=globals_row
            )
            _write_json_atomic(paths.lineage, lineage)
            _mark("globals")
    else:
        # ---- STAGED build (waves > 1): resumable via lineage manifest ----
        # The tokenized corpus is materialized once; each wave packs a
        # segment group through the (seg, term) shuffle and checkpoints,
        # so a killed build resumes WITHOUT re-tokenizing completed waves
        # (north-rule checkpoint requirement).
        if not lineage["phase1_done"]:
            # the analysis stage must parallelize even when the input is
            # a single unsplittable file: widen narrow inputs first
            try:
                n_in = corpus.rdd.getNumPartitions()
            except Exception:
                n_in = nshuf
            if n_in < max(nshuf // 2, 2):
                corpus = corpus.repartition(nshuf)
            stage_df = _analyze(corpus, text_col, id_cols, doc_id_col,
                                n_segments, analyzer)
            stage_df.write.mode("overwrite").parquet(paths.termvecs)
            stage = spark.read.parquet(paths.termvecs)
            _mark("phase1 analyze+stage")
            # docstats: column-pruned scan (never touches toks); global
            # corpus stats piggyback on the SAME job via observe()
            from pyspark.sql import Observation

            obs = Observation("globals")
            (
                stage.select("docId", "seg", "dl", "norm_byte", "dl_q", "content_sha")
                .observe(
                    obs,
                    F.count(F.lit(1)).alias("doc_count"),
                    F.sum(F.when(F.col("dl") > 0, 1).otherwise(0)).alias("fdc"),
                    F.sum("dl").alias("sum_ttf"),
                )
                .write.mode("overwrite")
                .parquet(paths.docstats)
            )
            g = obs.get
            globals_row = _globals_row(
                int(g["doc_count"]), int(g["fdc"] or 0), int(g["sum_ttf"] or 0)
            )
            _write_globals(globals_row)
            lineage["phase1_done"] = True
            lineage["globals"] = globals_row
            _write_json_atomic(paths.lineage, lineage)
            _mark("phase1 docstats+globals")

        # ---- phase 2: pack posting blocks per segment wave ---------------
        all_waves = list(range(waves))
        seg_of_wave = {
            w: [s for s in range(n_segments) if s % waves == w] for w in all_waves
        }
        for w in all_waves:
            if w in lineage["waves_done"]:
                continue
            stage = spark.read.parquet(paths.termvecs)
            stage = stage.where(F.col("seg").isin(seg_of_wave[w]))
            packed = (
                _occurrences(stage)
                .repartition(nshuf, "seg", "term")
                .mapInArrow(_pack_partition(block_size), schema=POSTINGS_SCHEMA)
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

    # ---- phase 3: term stats from packed postings metadata ---------------
    if not lineage.get("termstats_done"):
        write_termstats(spark, paths)
        lineage["termstats_done"] = True
        _write_json_atomic(paths.lineage, lineage)
        _mark("phase3 termstats")

    if not keep_stage and os.path.exists(paths.termvecs):
        shutil.rmtree(paths.termvecs)
        lineage["stage_cleaned"] = True
        _write_json_atomic(paths.lineage, lineage)

    _write_json_atomic(paths.manifest, {
        "version": 2,
        "analyzer": analyzer,
        "analyzer_impl": "uax29-subset-v1" if analyzer == "standard" else analyzer,
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
