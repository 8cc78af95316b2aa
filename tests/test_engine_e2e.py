"""End-to-end rank-identity: Spark engine vs brute-force NumPy oracle.

Builds the inverted index over the deterministic synthetic corpus
(FIXTURES.md §1) and asserts top-k docIDs rank-identical + scores within
atol for the reference query families: match OR/AND, bool combinations,
and exact phrases (FIXTURES.md §2-3).
"""

import os

import pytest
from pyspark.sql import functions as F

from opensearch_spark.analysis.analyzer import tokenize
from opensearch_spark.index.build import build_index
from opensearch_spark.search.engine import SearchEngine
from opensearch_spark.testing import brute
from opensearch_spark.testing.corpus import generate_corpus

N_DOCS = 600
K = 10
ATOL = 1e-6


@pytest.fixture(scope="module")
def setup(spark, tmp_path_factory):
    pdf = generate_corpus(N_DOCS, seed=42)
    corpus = spark.createDataFrame(pdf)
    out = str(tmp_path_factory.mktemp("ix") / "index")
    build_index(spark, corpus, out, n_segments=4, shuffle_partitions=8)
    engine = SearchEngine(spark, out, corpus=corpus, cache=True)

    # brute oracle over identical docIds
    with_ids = corpus.withColumn("docId", F.xxhash64("repo", "path", "commit")).select(
        "docId", "content"
    ).collect()
    docs = {int(r["docId"]): r["content"] for r in with_ids}
    assert len(docs) == N_DOCS, "docId collision at test scale"
    bix = brute.build_from_texts(docs)
    return engine, bix


def run(engine, dsl, k=K):
    return [(int(r["docId"]), float(r["score"])) for r in engine.search(dsl, k=k).collect()]


MATCH_QUERIES = [
    {"match": {"content": "def return"}},
    {"match": {"content": "import"}},
    {"match": {"content": "data load parse"}},
    {"match": {"content": {"query": "public static void", "operator": "and"}}},
    {"match": {"content": {"query": "func package", "operator": "and"}}},
    {"match": {"content": "snake_case_name x86_64"}},
    {"match": {"content": "zzz_not_a_term"}},
    {"match": {"content": {"query": "def zzz_not_a_term", "operator": "and"}}},
    {"match": {"content": ""}},
    {"match": {"content": "!!!"}},
    {"match": {"content": {"query": "data load parse node", "minimum_should_match": 2}}},
]


@pytest.mark.parametrize("dsl", MATCH_QUERIES, ids=[str(i) for i in range(len(MATCH_QUERIES))])
def test_match_rank_identity(setup, dsl):
    engine, bix = setup
    spec = dsl["match"]["content"]
    if isinstance(spec, dict):
        scores = brute.match(
            bix, spec["query"], spec.get("operator", "or"),
            int(spec.get("minimum_should_match", 0)),
        )
    else:
        scores = brute.match(bix, spec)
    expected = brute.topk(scores, K)
    got = run(engine, dsl)
    assert brute.rank_identical(got, expected, ATOL), f"{dsl}\n got={got[:5]}\n exp={expected[:5]}"


PHRASES = [
    "for i in range",
    "public static void",
    "def return",
    "data",
    "zzz missing phrase",
    "import import",
]


@pytest.mark.parametrize("q", PHRASES)
def test_phrase_rank_identity(setup, q):
    engine, bix = setup
    expected = brute.topk(brute.phrase(bix, q), K)
    got = run(engine, {"match_phrase": {"content": q}})
    assert brute.rank_identical(got, expected, ATOL), f"{q}\n got={got[:5]}\n exp={expected[:5]}"


def test_phrase_hits_verified_against_tokens(setup):
    """Every phrase hit really contains the adjacent token sequence."""
    engine, bix = setup
    q = "def return"
    got = run(engine, {"match_phrase": {"content": q}}, k=50)
    terms = tokenize(q)
    for d, _ in got:
        toks = bix.tokens[d]
        assert any(toks[i : i + 2] == terms for i in range(len(toks) - 1)), d


def test_bool_must_should_msm(setup):
    engine, bix = setup
    dsl = {
        "bool": {
            "must": [{"match": {"content": "def"}}],
            "should": [{"match": {"content": "return"}}, {"match": {"content": "yield"}}],
            "minimum_should_match": 1,
        }
    }
    expected = brute.topk(
        brute.bool_query(
            bix,
            must=[brute.match(bix, "def")],
            should=[brute.match(bix, "return"), brute.match(bix, "yield")],
            msm=1,
        ),
        K,
    )
    got = run(engine, dsl)
    assert brute.rank_identical(got, expected, ATOL)


def test_bool_must_not(setup):
    engine, bix = setup
    dsl = {
        "bool": {
            "must": [{"match": {"content": "class"}}],
            "must_not": [{"match": {"content": "interface"}}],
        }
    }
    expected = brute.topk(
        brute.bool_query(
            bix,
            must=[brute.match(bix, "class")],
            must_not=[brute.match(bix, "interface")],
        ),
        K,
    )
    got = run(engine, dsl)
    assert brute.rank_identical(got, expected, ATOL)


def test_bool_filter_only_scores_zero(setup):
    engine, _ = setup
    dsl = {"bool": {"filter": [{"match": {"content": "def"}}]}}
    got = run(engine, dsl, k=5)
    assert got and all(s == 0.0 for _, s in got)


def test_bool_pure_negative(setup):
    engine, bix = setup
    dsl = {"bool": {"must_not": [{"match": {"content": "def"}}]}}
    got = run(engine, dsl, k=20)
    matched = set(brute.match(bix, "def"))
    assert got and all(d not in matched for d, _ in got)
    assert all(s == 1.0 for _, s in got)
    n_expected = len(bix.all_doc_ids) - len(matched)
    assert engine.count(dsl) == n_expected


def test_nested_bool(setup):
    engine, bix = setup
    dsl = {
        "bool": {
            "must": [
                {"match": {"content": "def"}},
                {"bool": {"should": [
                    {"match": {"content": "import"}},
                    {"match": {"content": "yield"}},
                ]}},
            ]
        }
    }
    inner = brute.bool_query(
        bix, should=[brute.match(bix, "import"), brute.match(bix, "yield")], msm=1
    )
    expected = brute.topk(
        brute.bool_query(bix, must=[brute.match(bix, "def"), inner]), K
    )
    got = run(engine, dsl)
    assert brute.rank_identical(got, expected, ATOL)


def test_meta_filter_and_fulltext(setup):
    engine, bix = setup
    dsl = {
        "bool": {
            "must": [{"match": {"content": "def"}}],
            "filter": [{"term": {"lang": "python"}}],
        }
    }
    got = run(engine, dsl, k=30)
    langs = {
        int(r["docId"]): r["lang"]
        for r in engine.corpus.select("docId", "lang").collect()
    }
    assert got
    assert all(langs[d] == "python" for d, _ in got)
    m = brute.match(bix, "def")
    for d, s in got:
        assert abs(s - m[d]) < ATOL


def test_match_all_and_ids(setup):
    engine, _ = setup
    assert engine.count({"match_all": {}}) == N_DOCS
    some = [r["docId"] for r in engine.docstats.limit(3).collect()]
    assert engine.count({"ids": {"values": some}}) == 3


def test_total_hits(setup):
    engine, bix = setup
    for q in ["def", "import numpy", "zzz_not_a_term"]:
        assert engine.count({"match": {"content": q}}) == len(brute.match(bix, q))


def test_content_sha_invariant(setup):
    """Per-row invariant: sha2(content,256) in docstats == recomputed from
    corpus after the fetch join (north-rule content integrity)."""
    engine, _ = setup
    hits = engine.search({"match": {"content": "def"}}, k=20)
    fetched = engine.fetch(hits).withColumn(
        "sha_now", F.sha2(F.col("content"), 256)
    )
    joined = fetched.join(
        engine.docstats.select("docId", "content_sha"), "docId"
    )
    bad = joined.where(F.col("sha_now") != F.col("content_sha")).count()
    assert bad == 0


def test_fetch_returns_rows(setup):
    engine, _ = setup
    hits = engine.search({"match": {"content": "import"}}, k=5)
    rows = engine.fetch(hits).collect()
    assert len(rows) == 5
    assert "content" in rows[0].asDict()


def test_dis_max(setup):
    engine, bix = setup
    dsl = {
        "dis_max": {
            "queries": [{"match": {"content": "def"}}, {"match": {"content": "class"}}],
            "tie_breaker": 0.5,
        }
    }
    m1, m2 = brute.match(bix, "def"), brute.match(bix, "class")
    exp = {}
    for d in set(m1) | set(m2):
        s = sorted([m1.get(d, 0.0), m2.get(d, 0.0)])
        exp[d] = s[1] + 0.5 * s[0]
    expected = brute.topk(exp, K)
    got = run(engine, dsl)
    assert brute.rank_identical(got, expected, ATOL)


def test_bool_program_path_rank_identity(setup):
    """search() routes bool trees through the per-segment program scorer
    (no docId shuffle); results must be rank-identical to the exhaustive
    per-clause compiler."""
    from pyspark.sql import functions as F

    engine, _ = setup
    dsl = {
        "bool": {
            "must": [{"match": {"content": "def"}}],
            "should": [
                {"match": {"content": "return"}},
                {"match_phrase": {"content": "import numpy"}},
            ],
            "must_not": [{"match": {"content": "lambda"}}],
        }
    }
    from opensearch_spark.search import dsl as dsl_mod

    node = dsl_mod.parse(dsl)
    prog_df = engine._search_topk_program(node, 10)
    assert prog_df is not None, "bool should compile to a program"
    got = run(engine, dsl, k=10)
    exhaustive = [
        (int(r["docId"]), round(float(r["score"]), 9))
        for r in engine.compile(node)
        .orderBy(F.desc("score"), F.asc("docId"))
        .limit(10)
        .collect()
    ]
    assert [(d, round(s, 9)) for d, s in got] == exhaustive


def test_count_fast_path_matches_exhaustive(setup):
    engine, _ = setup
    for dsl in (
        {"match": {"content": "def"}},
        {"match": {"content": "def return import"}},
        {"match": {"content": {"query": "def return", "operator": "and"}}},
        {"match": {"content": {"query": "def return import",
                               "minimum_should_match": 2}}},
    ):
        from opensearch_spark.search import dsl as dsl_mod

        node = dsl_mod.parse(dsl)
        assert engine.count(dsl) == engine.compile(node).count()
