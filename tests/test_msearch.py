"""msearch (batched multi-query) must be result-identical to per-query
search. Reference: `_msearch` executes each request with identical
semantics to `_search` (TransportMultiSearchAction.java)."""

import pytest
from pyspark.sql import functions as F

from opensearch_spark.index.build import build_index
from opensearch_spark.search.engine import SearchEngine
from opensearch_spark.testing.corpus import generate_corpus

K = 10

BATCH = [
    {"match": {"content": "def return import"}},
    {"match": {"content": {"query": "data load parse", "operator": "and"}}},
    {"match": {"content": {"query": "class import yield self", "minimum_should_match": 2}}},
    {"match_phrase": {"content": "public static"}},
    {"match_phrase": {"content": "return self"}},
    {
        "bool": {
            "must": [{"match": {"content": "class"}}],
            "should": [{"match": {"content": "import"}}, {"match": {"content": "yield"}}],
        }
    },
    {
        "bool": {
            "must": [{"match": {"content": "def"}}],
            "must_not": [{"match": {"content": "class"}}],
        }
    },
    {
        "bool": {
            "must": [{"match_phrase": {"content": "def main"}}],
            "filter": [{"match": {"content": "import"}}],
        }
    },
    {"match": {"content": "zzz_not_a_term"}},
    {"match": {"content": "def zzz_not_a_term"}},
    # fallback family (not match/phrase/bool-of-those):
    {"prefix": {"content": "ret"}},
    {"query_string": {"query": "def AND return", "default_field": "content"}},
]


@pytest.fixture(scope="module")
def eng(spark, tmp_path_factory):
    pdf = generate_corpus(600, seed=11)
    corpus = spark.createDataFrame(pdf)
    out = str(tmp_path_factory.mktemp("msix") / "index")
    build_index(spark, corpus, out, n_segments=4, shuffle_partitions=8)
    return SearchEngine(spark, out, corpus=corpus, cache=True)


def test_msearch_matches_per_query_search(eng):
    got = eng.msearch(BATCH, k=K).collect()
    by_qid = {}
    for r in got:
        by_qid.setdefault(int(r["qid"]), []).append(
            (int(r["docId"]), round(float(r["score"]), 9))
        )
    n_nonempty = 0
    for qid, q in enumerate(BATCH):
        want = [
            (int(r["docId"]), round(float(r["score"]), 9))
            for r in eng.search(q, k=K).collect()
        ]
        assert by_qid.get(qid, []) == want, f"qid {qid} mismatch: {q}"
        if want:
            n_nonempty += 1
    assert n_nonempty >= 9  # the batch isn't trivially empty


def test_msearch_single_job_plan(eng):
    """The hot-path queries must compile into ONE applyInPandas stage:
    no per-query postings scans."""
    hot = [q for q in BATCH[:8]]
    df = eng.msearch(hot, k=K)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # exactly one FlatMapGroupsInPandas for the whole batch
    assert plan.count("FlatMapGroupsInPandas") == 1


def test_msearch_empty_batch(eng):
    assert eng.msearch([], k=K).count() == 0


def test_msearch_plan_cache_and_many(eng):
    """Identical batches return the SAME compiled DataFrame (Catalyst
    analysis paid once); msearch_many pipelines batches and matches the
    sequential results exactly."""
    batch = BATCH[:6]
    d1 = eng.msearch(batch, k=K)
    d2 = eng.msearch(batch, k=K)
    assert d1 is d2  # plan-cache hit
    assert eng.msearch(batch, k=K + 1) is not d1  # k is part of the key

    want = [(int(r["qid"]), int(r["docId"]), round(float(r["score"]), 6))
            for r in d1.collect()]
    many = eng.msearch_many([batch, batch, batch], k=K, max_concurrent=3)
    assert len(many) == 3
    for rows in many:
        got = [(int(r["qid"]), int(r["docId"]), round(float(r["score"]), 6))
               for r in rows]
        assert got == want


def test_search_hot_query_plan_cache(eng):
    """Repeated identical search() returns the same compiled DataFrame
    (request-cache analog); a delete invalidates it and results drop the
    tombstoned doc."""
    q = {"match": {"content": "def return"}}
    d1 = eng.search(q, k=7)
    assert eng.search(q, k=7) is d1
    assert eng.search(q, k=8) is not d1
    rows = d1.collect()
    victim = int(rows[0]["docId"])
    eng.delete([victim])
    try:
        d2 = eng.search(q, k=7)
        assert d2 is not d1
        assert victim not in [int(r["docId"]) for r in d2.collect()]
    finally:
        # leave the module fixture clean for other tests
        import glob, os as _os

        for f in glob.glob(_os.path.join(eng._deletes_dir, "*.parquet")):
            _os.remove(f)
        eng._load_deletes()
        eng._search_plans.clear()
        eng._msearch_plans.clear()
