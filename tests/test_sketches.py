"""HLL++ sketch properties: associative merge (partition partials ==
whole-table sketch), sparse-mode exactness at or below the threshold,
dense-mode accuracy, and the Spark integration paths."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from opensearch_spark.sketches import HllPlusPlus, hll_cardinality


def _rand_hashes(rng, n):
    return rng.integers(0, 2**63 - 1, size=n, dtype=np.int64).view(np.uint64)


def test_merge_of_partials_equals_whole_sketch():
    """Register/state equality (not just estimate equality): folding
    partition partials in ANY grouping must land on the same final
    state as one sketch over all the data."""
    rng = np.random.default_rng(1)
    parts = [_rand_hashes(rng, n) for n in (0, 50, 3000, 12000, 7)]
    whole = HllPlusPlus(threshold=1000).add_hashes(
        np.concatenate(parts))

    merged = HllPlusPlus(threshold=1000)
    for part in parts:
        merged.merge(HllPlusPlus(threshold=1000).add_hashes(part))

    # also merge in reverse order through serialization round-trips
    rev = HllPlusPlus(threshold=1000)
    for part in reversed(parts):
        blob = HllPlusPlus(threshold=1000).add_hashes(part).to_bytes()
        rev.merge(HllPlusPlus.from_bytes(blob, threshold=1000))

    assert whole.registers is not None
    np.testing.assert_array_equal(merged.registers, whole.registers)
    np.testing.assert_array_equal(rev.registers, whole.registers)
    assert merged.estimate() == whole.estimate() == rev.estimate()


def test_sparse_exact_below_threshold():
    rng = np.random.default_rng(2)
    h = _rand_hashes(rng, 500)
    sk = HllPlusPlus(threshold=3000)
    # duplicates must not inflate the count
    sk.add_hashes(np.concatenate([h, h[:100]]))
    assert sk.registers is None
    assert sk.estimate() == 500
    # sparse partials merged while staying under threshold stay exact
    a = HllPlusPlus(threshold=3000).add_hashes(h[:300])
    b = HllPlusPlus(threshold=3000).add_hashes(h[200:])
    a.merge(b)
    assert a.estimate() == 500


def test_dense_accuracy_within_rsd():
    rng = np.random.default_rng(3)
    true_n = 100_000
    sk = HllPlusPlus(threshold=3000)  # p=14 -> rsd ~0.8%
    sk.add_hashes(_rand_hashes(rng, true_n))
    est = sk.estimate()
    assert abs(est - true_n) / true_n < 0.04


def test_serialization_roundtrip_sparse_and_dense():
    rng = np.random.default_rng(4)
    for n in (10, 50_000):
        sk = HllPlusPlus(threshold=3000).add_hashes(_rand_hashes(rng, n))
        back = HllPlusPlus.from_bytes(sk.to_bytes(), threshold=3000)
        assert back.estimate() == sk.estimate()
        if sk.registers is None:
            np.testing.assert_array_equal(back.hashes, sk.hashes)
        else:
            np.testing.assert_array_equal(back.registers, sk.registers)


def test_spark_global_cardinality_exact_small(spark):
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    got = hll_cardinality(li, "l_partkey", precision_threshold=40000).collect()
    want = li.agg(F.countDistinct("l_partkey")).collect()[0][0]
    assert got[0]["cardinality"] == want


def test_spark_grouped_cardinality_exact_small(spark):
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    got = {
        r["l_returnflag"]: r["cardinality"]
        for r in hll_cardinality(
            li, "l_partkey", precision_threshold=40000,
            by=["l_returnflag"]).collect()
    }
    want = {
        r["l_returnflag"]: r["n"]
        for r in li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("n")).collect()
    }
    assert got == want


def test_spark_partition_count_invariance(spark):
    """The estimate must not depend on how the input is partitioned —
    the distributed statement of merge associativity."""
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    a = hll_cardinality(li.repartition(2), "l_orderkey",
                        precision_threshold=100).collect()[0][0]
    b = hll_cardinality(li.repartition(17), "l_orderkey",
                        precision_threshold=100).collect()[0][0]
    assert a == b


# --- t-digest ---------------------------------------------------------------

def _td():
    from opensearch_spark.sketches.tdigest import TDigest
    return TDigest


def test_tdigest_distinct_regime_exact_cdf_and_merge():
    """With distinct values under the singleton budget, the digest
    keeps one exact centroid per value regardless of how the input is
    split across partials, and cdf == the mid-distribution cdf."""
    TDigest = _td()
    rng = np.random.default_rng(5)
    vals = rng.integers(1, 51, size=20_000).astype(np.float64)  # 50 distinct
    whole = TDigest(compression=200).add_values(vals)

    merged = TDigest(compression=200)
    for part in np.array_split(vals, 7):
        merged.merge(TDigest(compression=200).add_values(part))

    assert whole.means.size == 50 and merged.means.size == 50
    np.testing.assert_array_equal(merged.means, whole.means)
    np.testing.assert_array_equal(merged.weights, whole.weights)
    n = vals.size
    for probe in (1.0, 17.0, 50.0):
        exact = ((vals < probe).sum() + 0.5 * (vals == probe).sum()) / n
        assert merged.cdf(probe) == pytest.approx(exact, abs=0.0)


def test_tdigest_rank_accuracy_and_extremes():
    TDigest = _td()
    rng = np.random.default_rng(6)
    vals = rng.normal(0, 1, size=100_000)
    td = TDigest(compression=100).add_values(vals)
    assert td.means.size < 200  # actually compressed
    s = np.sort(vals)
    assert td.quantile(0.0) == s[0] and td.quantile(1.0) == s[-1]
    for q in (0.01, 0.25, 0.5, 0.75, 0.99):
        est = td.quantile(q)
        rank = np.searchsorted(s, est) / s.size
        assert abs(rank - q) < 0.01, (q, rank)


def test_tdigest_merge_tree_preserves_accuracy():
    """Rank error survives an arbitrary merge tree (the 100 TB
    re-aggregation contract), and serialization round-trips."""
    TDigest = _td()
    rng = np.random.default_rng(7)
    vals = rng.exponential(5.0, size=60_000)
    parts = np.array_split(vals, 16)
    # pairwise tournament merge through serialized blobs
    digests = [TDigest.from_bytes(
        TDigest(compression=100).add_values(p).to_bytes()) for p in parts]
    while len(digests) > 1:
        digests = [digests[i].merge(digests[i + 1])
                   for i in range(0, len(digests) - 1, 2)] + (
            [digests[-1]] if len(digests) % 2 else [])
    td = digests[0]
    s = np.sort(vals)
    for q in (0.1, 0.5, 0.9, 0.99):
        rank = np.searchsorted(s, td.quantile(q)) / s.size
        assert abs(rank - q) < 0.015, (q, rank)


def test_spark_tdigest_percentile_ranks_grouped_exact(spark):
    from pyspark.sql import functions as F
    from opensearch_spark.sketches.tdigest import tdigest_percentile_ranks

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    got = {r["l_returnflag"]: (r["rank_0"], r["rank_1"]) for r in
           tdigest_percentile_ranks(
               li, "l_quantity", [1.0, 25.0],
               by=["l_returnflag"]).collect()}
    want = {
        r["l_returnflag"]: (
            round(((r["lt1"] + 0.5 * r["eq1"]) / r["n"]) * 100.0, 4),
            round(((r["lt25"] + 0.5 * r["eq25"]) / r["n"]) * 100.0, 4))
        for r in li.groupBy("l_returnflag").agg(
            F.sum((F.col("l_quantity") < 1).cast("long")).alias("lt1"),
            F.sum((F.col("l_quantity") == 1).cast("long")).alias("eq1"),
            F.sum((F.col("l_quantity") < 25).cast("long")).alias("lt25"),
            F.sum((F.col("l_quantity") == 25).cast("long")).alias("eq25"),
            F.count(F.lit(1)).alias("n")).collect()
    }
    assert got == want


def test_aggs_dsl_sketch_route(spark):
    """cardinality(algorithm=hllpp) and percentile_ranks(algorithm=
    tdigest) route through the mergeable sketches inside the aggs DSL,
    joined back on the terms bucket keys."""
    from pyspark.sql import functions as F
    from opensearch_spark.search.aggs import compile_aggs

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    out = compile_aggs(li, {
        "f": {"terms": {"field": "l_returnflag", "size": 10},
              "aggs": {
                  "uniq": {"cardinality": {"field": "l_partkey",
                                           "algorithm": "hllpp",
                                           "precision_threshold": 40000}},
                  "qr": {"percentile_ranks": {"field": "l_quantity",
                                              "values": [25.0],
                                              "algorithm": "tdigest",
                                              "compression": 200}},
                  "s": {"sum": {"field": "l_quantity"}},
              }},
    }).collect()
    got = {r["key_f"]: (r["uniq"], round(r["qr_25_0"], 4), r["s"], r["doc_count"])
           for r in out}
    want = {r["l_returnflag"]: (
        r["u"],
        round(((r["lt"] + 0.5 * r["eq"]) / r["n"]) * 100.0, 4),
        r["s"], r["n"])
        for r in li.groupBy("l_returnflag").agg(
            F.countDistinct("l_partkey").alias("u"),
            F.sum((F.col("l_quantity") < 25).cast("long")).alias("lt"),
            F.sum((F.col("l_quantity") == 25).cast("long")).alias("eq"),
            F.sum("l_quantity").alias("s"),
            F.count(F.lit(1)).alias("n")).collect()}
    assert got == want

    # global (no buckets) shape
    g = compile_aggs(li, {
        "uniq": {"cardinality": {"field": "l_partkey",
                                 "algorithm": "hllpp",
                                 "precision_threshold": 40000}},
    }).collect()[0]
    assert g["uniq"] == li.agg(F.countDistinct("l_partkey")).collect()[0][0]


def test_sketch_route_preserves_terms_ordering(spark):
    """Adding a sketch metric must not re-order the terms buckets
    (default: doc_count desc) — review r4 finding."""
    from opensearch_spark.search.aggs import compile_aggs

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    plain = [r["key_f"] for r in compile_aggs(li, {
        "f": {"terms": {"field": "l_returnflag", "size": 10}},
    }).collect()]
    with_sketch = [r["key_f"] for r in compile_aggs(li, {
        "f": {"terms": {"field": "l_returnflag", "size": 10},
              "aggs": {"u": {"cardinality": {"field": "l_partkey",
                                             "algorithm": "hllpp"}}}},
    }).collect()]
    assert with_sketch == plain


def test_tdigest_weights_nan_alignment():
    """NaN values must drop their own weights, not shift later ones."""
    from opensearch_spark.sketches.tdigest import TDigest

    td = TDigest(compression=200).add_values(
        np.array([1.0, np.nan, 3.0]), weights=np.array([2.0, 5.0, 7.0]))
    assert td.means.tolist() == [1.0, 3.0]
    assert td.weights.tolist() == [2.0, 7.0]


def test_sloppy_lcm_overflow_falls_back():
    """High slop with many exact occurrences must not overflow int64
    (review r4: slop=41 overflows after 42 additions) — the vectorized
    form falls back to float64 and still matches the exact walk."""
    from opensearch_spark.search import bm25

    n = 60
    p1 = np.arange(0, 4 * n, 4, dtype=np.int64)       # a at 0,4,8,...
    p2 = p1 + 1                                       # b right after each a
    decoded = {
        "a": (np.array([0]), np.array([n]), np.array([100.0]), p1),
        "b": (np.array([0]), np.array([n]), np.array([100.0]), p2),
    }
    docs, freq, _ = bm25.sloppy_phrase_freq_in_segment(decoded, ["a", "b"], 41)
    want = bm25._lucene_sloppy_walk([p1, np.sort(p2 - 1)], 41)
    assert docs.tolist() == [0]
    assert freq[0] == pytest.approx(want, rel=1e-12)
    assert freq[0] > 0


def test_sketch_metric_must_be_innermost(spark):
    """A sketch metric BESIDE a nested bucket level would silently be
    grouped by the inner key too — the route must raise instead
    (review r4 / ADVICE finding)."""
    from opensearch_spark.search.aggs import compile_aggs

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    with pytest.raises(ValueError, match="innermost"):
        compile_aggs(li, {
            "f": {"terms": {"field": "l_returnflag", "size": 10},
                  "aggs": {
                      # sketch sits BESIDE a deeper terms level
                      "uniq": {"cardinality": {"field": "l_partkey",
                                               "algorithm": "hllpp"}},
                      "g": {"terms": {"field": "l_linestatus", "size": 5}},
                  }},
        })


def test_grouped_sketch_path_is_one_lazy_plan(spark):
    """The grouped (per-bucket) sketch path must run as ONE Spark plan:
    per-partition partials (MapInPandas) -> single keyed Exchange ->
    applyInPandas merge — NO driver collect (a collect+createDataFrame
    would appear as a LocalTableScan source). This is the 100 TB
    terms+cardinality contract."""
    from opensearch_spark.sketches import hll_cardinality
    from opensearch_spark.sketches.tdigest import tdigest_percentile_ranks

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    for df in (
        hll_cardinality(li, "l_partkey", by=["l_returnflag"]),
        tdigest_percentile_ranks(li, "l_quantity", [25.0],
                                 by=["l_returnflag"]),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "MapInPandas" in plan, plan[:1500]
        assert "FlatMapGroupsInPandas" in plan, plan[:1500]
        assert "LocalTableScan" not in plan, plan[:1500]
        # exactly one shuffle: the keyed merge of KB-sized sketch blobs
        assert plan.count("Exchange") == 1, plan[:1500]
