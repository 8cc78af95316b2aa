"""Multi-index registry: aliases, wildcard resolution, cross-index
search global ordering, _mget (reference: AliasMetadata /
IndexNameExpressionResolver / TransportGetAction)."""

import pytest
from pyspark.sql import functions as F

from opensearch_spark.cluster import Cluster
from opensearch_spark.testing.corpus import generate_corpus


@pytest.fixture(scope="module")
def cluster(spark, tmp_path_factory):
    c = Cluster(spark)
    root = tmp_path_factory.mktemp("cluster")
    for i, name in enumerate(("logs-2024", "logs-2025", "metrics")):
        corpus = spark.createDataFrame(generate_corpus(120, seed=40 + i))
        c.create_index(name, corpus, str(root / name),
                       n_segments=2, shuffle_partitions=4)
    c.put_alias("logs", "logs-2024", "logs-2025")
    return c


def test_resolution(cluster):
    assert cluster.resolve("logs") == ["logs-2024", "logs-2025"]
    assert cluster.resolve("logs-*") == ["logs-2024", "logs-2025"]
    assert cluster.resolve("metrics,logs-2024") == ["metrics", "logs-2024"]
    assert cluster.resolve("*") == sorted(cluster.engines)
    with pytest.raises(ValueError):
        cluster.resolve("nope")


def test_cross_index_search_is_global_topk(cluster):
    q = {"match": {"content": "def return"}}
    got = [(r["_index"], int(r["docId"]), round(float(r["score"]), 6))
           for r in cluster.search("logs", q, k=10).collect()]
    # manual merge of the two indexes' full results
    merged = []
    for n in ("logs-2024", "logs-2025"):
        for r in cluster.engines[n].search(q, k=1000).collect():
            merged.append((n, int(r["docId"]), round(float(r["score"]), 6)))
    merged.sort(key=lambda t: (-t[2], t[1], t[0]))
    assert got == merged[:10] and got
    # count across the alias == sum of per-index counts
    assert cluster.count("logs", q) == sum(
        cluster.engines[n].count(q) for n in ("logs-2024", "logs-2025"))


def test_mget(cluster):
    eng = cluster.engines["metrics"]
    some = int(eng.corpus.select("docId").limit(1).collect()[0][0])
    res = cluster.mget("metrics", [some, 999999999])
    assert res[0]["found"] and res[0]["_index"] == "metrics"
    assert res[0]["_source"]["docId"] == some
    assert not res[1]["found"]


def test_indices_boost(cluster):
    q = {"match": {"content": "def return"}}
    plain = [(r["_index"], int(r["docId"])) for r in
             cluster.search("logs", q, k=5).collect()]
    boosted = cluster.search("logs", q, k=5,
                             indices_boost={"logs-2024": 100.0}).collect()
    # with a 100x boost every top hit comes from logs-2024
    assert all(r["_index"] == "logs-2024" for r in boosted)
    assert plain != [(r["_index"], int(r["docId"])) for r in boosted]


def test_suggest_mode(spark, tmp_path):
    """suggest_mode missing/popular/always (reference:
    TermSuggestionBuilder.SuggestMode) on a controlled vocabulary:
    'cat' appears once, 'car' in ten docs."""
    from opensearch_spark.cluster import Cluster

    rows = [("r", f"p{i}", "c", "car wheel", "x") for i in range(10)]
    rows.append(("r", "pc", "c", "cat wheel", "x"))
    corpus = spark.createDataFrame(
        rows, "repo string, path string, commit string, content string,"
        " lang string")
    c = Cluster(spark)
    eng = c.create_index("sug", corpus, str(tmp_path / "sug"),
                         n_segments=1, shuffle_partitions=2)
    # missing (the reference default): 'cat' is in the dictionary -> []
    assert eng.suggest("cat", size=3)["cat"] == []
    # always: suggests 'car' even though 'cat' exists
    always = eng.suggest("cat", size=3, suggest_mode="always")["cat"]
    assert [s["text"] for s in always] == ["car"]
    # popular: 'car' (df 10) > 'cat' (df 1) -> suggested; the reverse
    # direction yields nothing ('cat' is rarer than 'car')
    pop = eng.suggest("cat", size=3, suggest_mode="popular")["cat"]
    assert [s["text"] for s in pop] == ["car"]
    assert eng.suggest("car", size=3, suggest_mode="popular")["car"] == []
