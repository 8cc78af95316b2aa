"""Star-tree pre-aggregated cube (reference: index/compositeindex/
datacube/startree/): cube slices must answer covered aggregations
identically to the raw scan, from one gid partition with no shuffle."""

import pytest
from pyspark.sql import functions as F

from opensearch_spark.index.startree import (
    build_star_tree, star_tree_agg, star_tree_covers, _gid_for,
)


@pytest.fixture(scope="module")
def tree(spark, tmp_path_factory):
    df = spark.createDataFrame(
        [(i, ["a", "b", "c"][i % 3], ["x", "y"][i % 2], float(i * 7 % 50))
         for i in range(300)],
        "id long, d1 string, d2 string, v double",
    )
    out = str(tmp_path_factory.mktemp("st") / "tree")
    build_star_tree(df, ["d1", "d2"], ["v"], out)
    return df, out


def test_star_tree_matches_raw_groupby(spark, tree):
    df, out = tree
    got = {
        (r["d1"],): (r["n"], round(r["s"], 6), round(r["a"], 6))
        for r in star_tree_agg(
            spark, out, ["d1", "d2"], ["d1"],
            {"n": "doc_count", "s": "sum_v", "a": "avg_v"},
        ).collect()
    }
    want = {
        (r["d1"],): (r["n"], round(r["s"], 6), round(r["a"], 6))
        for r in df.groupBy("d1").agg(
            F.count("*").alias("n"), F.sum("v").alias("s"),
            F.avg("v").alias("a"),
        ).collect()
    }
    assert got == want


def test_star_tree_filtered_slice(spark, tree):
    df, out = tree
    got = {
        r["d2"]: (r["n"], r["mx"])
        for r in star_tree_agg(
            spark, out, ["d1", "d2"], ["d2"],
            {"n": "doc_count", "mx": "max_v"}, filters={"d1": "b"},
        ).collect()
    }
    want = {
        r["d2"]: (r["n"], r["mx"])
        for r in df.where(F.col("d1") == "b").groupBy("d2").agg(
            F.count("*").alias("n"), F.max("v").alias("mx")
        ).collect()
    }
    assert got == want


def test_star_tree_grand_total(spark, tree):
    df, out = tree
    row = star_tree_agg(spark, out, ["d1", "d2"], [],
                        {"n": "doc_count", "s": "sum_v"}).collect()
    assert len(row) == 1
    assert row[0]["n"] == df.count()


def test_star_tree_serving_plan_prunes_and_never_shuffles(spark, tree):
    _df, out = tree
    q = star_tree_agg(spark, out, ["d1", "d2"], ["d1"], {"n": "doc_count"})
    p = q._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in p, p
    # gid partition pruning reaches the scan
    assert "gid" in p.split("PartitionFilters")[1][:120], p


def test_gid_and_covers():
    assert _gid_for(["d1", "d2"], ["d1", "d2"]) == 0
    assert _gid_for(["d1", "d2"], ["d1"]) == 1
    assert _gid_for(["d1", "d2"], ["d2"]) == 2
    assert _gid_for(["d1", "d2"], []) == 3
    assert star_tree_covers(["d1", "d2"], ["v"], ["d1"], ["sum_v", "doc_count"])
    assert not star_tree_covers(["d1"], ["v"], ["d2"], ["sum_v"])
    assert not star_tree_covers(["d1"], ["v"], ["d1"], ["sum_w"])


def test_compile_aggs_auto_routes_to_star_tree(spark, tmp_path):
    """A covered terms+metrics agg served FROM the cube: same result as
    the fact-table plan, and the physical plan scans only the tree
    (one gid partition), never the fact table."""
    from pyspark.sql import functions as F
    from opensearch_spark.index.startree import build_star_tree
    from opensearch_spark.search.aggs import compile_aggs

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    tree = str(tmp_path / "tree")
    build_star_tree(docs, dims=["lang", "source"],
                    metrics=["n_chars"], out_dir=tree)
    body = {"l": {"terms": {"field": "lang", "size": 10},
                  "aggs": {"avg_len": {"avg": {"field": "n_chars"}},
                           "total": {"sum": {"field": "n_chars"}}}}}
    st = {"dir": tree, "dims": ["lang", "source"], "metrics": ["n_chars"]}
    plain = compile_aggs(docs, body).withColumn(
        "avg_len", F.round("avg_len", 6)).collect()
    routed = compile_aggs(docs, body, star_tree=st).withColumn(
        "avg_len", F.round("avg_len", 6)).collect()
    assert sorted(map(tuple, routed)) == sorted(map(tuple, plain))
    plan = compile_aggs(docs, body, star_tree=st)
    p = plan._jdf.queryExecution().executedPlan().toString()
    assert "tree" in p and "documents.parquet" not in p, p
    # uncovered (metric not in the tree) falls through to the fact table
    body2 = {"l": {"terms": {"field": "lang"},
                   "aggs": {"c": {"cardinality": {"field": "source",
                                                  "exact": True}}}}}
    p2 = compile_aggs(docs, body2, star_tree=st)
    assert "documents.parquet" in p2._jdf.queryExecution().executedPlan().toString()


def test_star_tree_avg_ignores_null_metric_rows(spark, tmp_path):
    """avg served from the cube must divide by the non-null value count,
    matching F.avg on the fact table."""
    from opensearch_spark.index.startree import build_star_tree, star_tree_agg

    df = spark.createDataFrame(
        [("a", 10.0), ("a", None), ("a", 20.0), ("b", 4.0)],
        "g string, v double")
    tree = str(tmp_path / "t")
    build_star_tree(df, dims=["g"], metrics=["v"], out_dir=tree)
    got = {r["g"]: r["m"] for r in star_tree_agg(
        spark, tree, ["g"], group_by=["g"],
        metrics={"m": "avg_v"}).collect()}
    assert got["a"] == 15.0   # (10+20)/2, NOT /3
    assert got["b"] == 4.0
