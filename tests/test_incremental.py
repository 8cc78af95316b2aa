"""Incremental ingest, compaction, kill-and-rerun resume, streaming.

The key contracts:
- incremental add_batch over A then B produces search results EQUAL to a
  full rebuild over A ∪ B (global df/avgdl updated; multi-generation
  decode merge-sorts correctly)
- compaction folds generations without changing any result
- a build killed mid-wave resumes from the lineage manifest and produces
  content-identical index tables without re-tokenizing completed waves
- the Structured Streaming file-source path bootstraps + appends
"""

import json
import os
import shutil

import pytest
from pyspark.sql import functions as F

from opensearch_spark.index.build import IndexPaths, build_index
from opensearch_spark.index.incremental import add_batch, compact_index
from opensearch_spark.search.engine import SearchEngine
from opensearch_spark.testing.corpus import generate_corpus

QUERIES = [
    {"match": {"content": "def return import"}},
    {"match": {"content": {"query": "data load", "operator": "and"}}},
    {"match_phrase": {"content": "public static"}},
    {
        "bool": {
            "must": [{"match": {"content": "class"}}],
            "should": [{"match": {"content": "import"}}],
        }
    },
]


def results(engine, k=15):
    out = {}
    for i, q in enumerate(QUERIES):
        out[i] = [
            (int(r["docId"]), round(float(r["score"]), 9))
            for r in engine.search(q, k=k).collect()
        ]
    return out


@pytest.fixture(scope="module")
def corpora(spark):
    pdf = generate_corpus(500, seed=42)
    a = spark.createDataFrame(pdf.iloc[:320])
    b = spark.createDataFrame(pdf.iloc[320:])
    full = spark.createDataFrame(pdf)
    return a, b, full


def test_incremental_equals_full_rebuild(spark, corpora, tmp_path):
    a, b, full = corpora
    inc_dir, full_dir = str(tmp_path / "inc"), str(tmp_path / "full")
    build_index(spark, a, inc_dir, n_segments=4)
    add_batch(spark, b, inc_dir)
    build_index(spark, full, full_dir, n_segments=4)

    e_inc = SearchEngine(spark, inc_dir)
    e_full = SearchEngine(spark, full_dir)
    assert abs(e_inc.avgdl - e_full.avgdl) < 1e-9
    assert e_inc.doc_count == e_full.doc_count
    r_inc, r_full = results(e_inc), results(e_full)
    assert r_inc == r_full

    # compaction changes nothing observable
    m = compact_index(spark, inc_dir)
    assert m["generations"] == 1
    e_c = SearchEngine(spark, inc_dir)
    assert results(e_c) == r_full

    # compacted postings have one sorted run per (seg, term)
    p = e_c.postings
    bad = (
        p.groupBy("seg", "term", "block_no").count().where(F.col("count") > 1).count()
    )
    assert bad == 0


def test_kill_and_rerun_resume(spark, corpora, tmp_path):
    _, _, full = corpora
    ref_dir = str(tmp_path / "ref")
    # reference = SAME config (waves=4), never killed: the invariant is
    # kill+resume == uninterrupted run. (A waves=1 build uses the
    # segment-local path whose seg ids are partition ids, so its table
    # layout legitimately differs; search results stay identical.)
    build_index(spark, full, ref_dir, n_segments=8, waves=4)

    # crash the build after wave 0 commits (injected failure = kill)
    kill_dir = str(tmp_path / "killed")
    with pytest.raises(RuntimeError, match="injected failure"):
        build_index(
            spark, full, kill_dir, n_segments=8, waves=4, _fail_after_wave=0
        )
    paths = IndexPaths(kill_dir)
    with open(paths.lineage) as f:
        lineage = json.load(f)
    assert lineage["waves_done"] == [0]
    assert os.path.exists(paths.termvecs)  # stage kept until completion

    # rerun resumes (overwrite=False honors the lineage) and must NOT
    # re-tokenize: corrupt the corpus argument to prove phase 1 is skipped
    poisoned = full.withColumn("content", F.lit("poison"))
    build_index(spark, poisoned, kill_dir, n_segments=8, waves=4, overwrite=False)

    e_ref = SearchEngine(spark, ref_dir)
    e_res = SearchEngine(spark, kill_dir)
    assert results(e_res) == results(e_ref)

    # content-identical index tables (order-insensitive)
    for tbl in ("postings", "docstats", "termstats"):
        a = getattr(e_ref, tbl if tbl != "postings" else "postings")
        b = getattr(e_res, tbl if tbl != "postings" else "postings")
        ka = a.select(sorted(a.columns)).exceptAll(b.select(sorted(b.columns))).count()
        kb = b.select(sorted(b.columns)).exceptAll(a.select(sorted(a.columns))).count()
        assert ka == 0 and kb == 0, tbl


def test_streaming_file_source(spark, corpora, tmp_path):
    from opensearch_spark.streaming.ingest import start_indexing_stream

    a, b, full = corpora
    src = str(tmp_path / "src")
    ix = str(tmp_path / "stream_ix")
    cp = str(tmp_path / "cp")
    a.write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(a.schema).parquet(src)
    q = start_indexing_stream(stream, ix, cp, n_segments=4)
    q.awaitTermination(120)

    e1 = SearchEngine(spark, ix)
    n1 = e1.doc_count

    # second batch arrives; availableNow restart picks up only new files
    b.write.mode("append").parquet(src)
    stream = spark.readStream.schema(a.schema).parquet(src)
    q = start_indexing_stream(stream, ix, cp, n_segments=4)
    q.awaitTermination(120)

    e2 = SearchEngine(spark, ix)
    assert e2.doc_count > n1

    full_dir = str(tmp_path / "stream_full")
    build_index(spark, full, full_dir, n_segments=4)
    e_full = SearchEngine(spark, full_dir)
    assert results(e2) == results(e_full)


def test_compact_target_segments(spark, corpora, tmp_path):
    """Segment-merge compaction (TieredMergePolicy analog): fewer, larger
    segments; search results unchanged."""
    from opensearch_spark.search.engine import SearchEngine
    from opensearch_spark.index.incremental import compact_index

    _, _, full = corpora
    d = str(tmp_path / "mergeix")
    build_index(spark, full, d, n_segments=8)
    e1 = SearchEngine(spark, d)
    q = {"match": {"content": "def return"}}
    before = [(int(r["docId"]), round(float(r["score"]), 9))
              for r in e1.search(q, k=20).collect()]

    m = compact_index(spark, d, target_segments=2)
    assert m["n_segments"] == 2
    e2 = SearchEngine(spark, d)
    segs = [r["seg"] for r in e2.postings.select("seg").distinct().collect()]
    assert sorted(segs) == [0, 1] or set(segs) <= {0, 1}
    after = [(int(r["docId"]), round(float(r["score"]), 9))
             for r in e2.search(q, k=20).collect()]
    assert after == before


def test_update_by_query(spark, tmp_path):
    """_update_by_query: matched docs rewritten in place (delete + re-add,
    the reference's own decomposition); unmatched docs untouched."""
    from opensearch_spark.index.build import build_index
    from opensearch_spark.index.reindex import update_by_query
    from opensearch_spark.search.engine import SearchEngine
    from opensearch_spark.testing.corpus import generate_corpus
    from pyspark.sql import functions as F

    corpus = spark.createDataFrame(generate_corpus(150, seed=51))
    out = str(tmp_path / "ubq")
    build_index(spark, corpus, out, n_segments=2, shuffle_partitions=4)
    eng = SearchEngine(spark, out, corpus=corpus)
    before_total = eng.docstats.count()
    n_match = eng.count({"match": {"content": "def"}})
    assert n_match > 0

    res = update_by_query(
        spark, eng, out, {"match": {"content": "def"}},
        {"content": "concat('zzzpatched ', content)"},
    )
    assert res["updated"] == n_match
    # reopen over the RETURNED corpus view so the doc store agrees with
    # the rewritten index (index and _source updated together)
    eng2 = SearchEngine(spark, out, corpus=res["corpus"],
                        doc_id_col="docId")
    assert eng2.count({"match": {"content": "zzzpatched"}}) == n_match
    # every patched doc still matches its old content too (prefix added)
    assert eng2.count({"match": {"content": "def"}}) == n_match
    # total live docs unchanged (update, not insert)
    assert eng2.docstats.count() == before_total
    # fetch returns the REWRITTEN source text, consistent with the index
    hit = eng2.request({"query": {"match": {"content": "zzzpatched"}},
                        "size": 1, "_source": ["content"]})
    assert hit["hits"].collect()[0]["content"].startswith("zzzpatched ")


def test_update_by_query_ctx_op_routing(spark, tmp_path):
    """ctx.op in a painless update script routes rows: 'delete'
    tombstones, 'noop' keeps the original and re-indexes nothing,
    'index' (default) applies the transform (reference: scripted
    update_by_query's per-row verdict)."""
    from opensearch_spark.index.build import build_index
    from opensearch_spark.index.reindex import update_by_query
    from opensearch_spark.search.engine import SearchEngine
    from opensearch_spark.testing.corpus import generate_corpus

    corpus = spark.createDataFrame(generate_corpus(150, seed=52))
    out = str(tmp_path / "ubqop")
    build_index(spark, corpus, out, n_segments=2, shuffle_partitions=4)
    eng = SearchEngine(spark, out, corpus=corpus)
    total = eng.docstats.count()
    matched = eng.search({"match": {"content": "def"}}, k=10000)
    m_ids = {int(r["docId"]) for r in matched.collect()}
    assert m_ids
    key_of = {int(r["docId"]): len(r["path"]) % 3
              for r in eng.corpus.select("docId", "path").collect()}

    res = update_by_query(
        spark, eng, out, {"match": {"content": "def"}},
        {"lang": "painless",
         "source": (
             "if (ctx._source.path.length() % 3 == 0) "
             "{ ctx.op = 'delete' } "
             "else if (ctx._source.path.length() % 3 == 1) "
             "{ ctx.op = 'noop' } else { ctx._source.content = "
             "ctx._source.content + ' zzzopmark'; }"),
         "params": {}},
    )
    want_del = {d for d in m_ids if key_of[d] == 0}
    want_noop = {d for d in m_ids if key_of[d] == 1}
    want_upd = m_ids - want_del - want_noop
    assert res["deleted"] == len(want_del)
    assert res["noops"] == len(want_noop)
    assert res["updated"] == len(want_upd)
    assert res["deleted"] > 0 and res["updated"] > 0

    eng2 = SearchEngine(spark, out, corpus=res["corpus"],
                        doc_id_col="docId")
    # deleted docs are gone from search; noop + updated remain
    assert eng2.count({"match": {"content": "def"}}) == \
        len(want_noop | want_upd)
    got_upd = {int(r["docId"]) for r in
               eng2.search({"match": {"content": "zzzopmark"}},
                           k=10000).collect()}
    assert got_upd == want_upd
    # corpus view drops exactly the deleted rows
    assert res["corpus"].count() == total - len(want_del)
    # noop docs keep their ORIGINAL content in the returned corpus
    if want_noop:
        d = next(iter(want_noop))
        old = corpus.where(F.col("repo").isNotNull()).join(
            eng.corpus.where(F.col("docId") == d).select("repo", "path"),
            ["repo", "path"]).collect()[0]["content"]
        new = res["corpus"].where(F.col("docId") == d).collect()[0]["content"]
        assert new == old and "zzzopmark" not in new


def test_update_by_query_ctx_op_rejects_null_and_bad_verdicts(spark,
                                                              tmp_path):
    """A NULL or unknown ctx.op verdict must raise, not silently drop
    the row from every route (review r5)."""
    import pytest

    from opensearch_spark.index.build import build_index
    from opensearch_spark.index.reindex import update_by_query
    from opensearch_spark.search.engine import SearchEngine
    from opensearch_spark.testing.corpus import generate_corpus

    corpus = spark.createDataFrame(generate_corpus(60, seed=53))
    out = str(tmp_path / "ubqbad")
    build_index(spark, corpus, out, n_segments=2, shuffle_partitions=4)
    eng = SearchEngine(spark, out, corpus=corpus)
    for src in ("ctx.op = params.mode;",            # None -> NULL verdict
                "ctx.op = 'purge';"):               # unknown verdict
        with pytest.raises(ValueError, match="ctx.op"):
            update_by_query(
                spark, eng, out, {"match": {"content": "def"}},
                {"lang": "painless", "source": src,
                 "params": {"mode": None}})
    # zero-match queries return the full key set
    res = update_by_query(
        spark, eng, out, {"match": {"content": "zzznomatchzzz"}},
        {"lang": "painless", "source": "ctx.op = 'noop';"})
    assert res == {"updated": 0, "noops": 0, "deleted": 0,
                   "corpus": res["corpus"]}
