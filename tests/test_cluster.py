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
