"""Aggregation DSL facade vs DuckDB oracle on the driver testdata.

Reference semantics: SURVEY.md §2.5 (search/aggregations/**); each case
compiles an OpenSearch `aggs` JSON body and cross-checks against an
equivalent SQL aggregate run by DuckDB on the same parquet."""

import os

import duckdb
import pytest

from opensearch_spark.search.aggs import compile_aggs


@pytest.fixture(scope="module")
def ddb(sf_dir):
    con = duckdb.connect()
    for t in ("documents", "orders", "lineitem", "events"):
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))


@pytest.fixture(scope="module")
def orders(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))


def rows(df):
    return [tuple(r) for r in df.collect()]


def test_terms_with_metrics(docs, ddb):
    got = rows(compile_aggs(docs, {
        "langs": {"terms": {"field": "lang", "size": 5},
                  "aggs": {"avg_len": {"avg": {"field": "n_chars"}},
                           "max_len": {"max": {"field": "n_chars"}}}}
    }))
    want = ddb.execute("""
        SELECT lang, count(*) AS doc_count, avg(n_chars), max(n_chars)
        FROM documents WHERE lang IS NOT NULL
        GROUP BY lang ORDER BY doc_count DESC, lang LIMIT 5
    """).fetchall()
    assert [(g[0], g[1]) for g in got] == [(w[0], w[1]) for w in want]
    for g, w in zip(got, want):
        assert abs(g[2] - w[2]) < 1e-9 and g[3] == w[3]


def test_histogram(docs, ddb):
    got = rows(compile_aggs(docs, {
        "h": {"histogram": {"field": "n_chars", "interval": 100}}
    }))
    want = ddb.execute("""
        SELECT floor(n_chars / 100) * 100 AS b, count(*) FROM documents
        WHERE n_chars IS NOT NULL GROUP BY b ORDER BY b
    """).fetchall()
    assert [(float(g[0]), g[1]) for g in got] == [(float(w[0]), w[1]) for w in want]


def test_range_buckets(docs, ddb):
    got = rows(compile_aggs(docs, {
        "r": {"range": {"field": "n_chars",
                        "ranges": [{"to": 200}, {"from": 200, "to": 400},
                                   {"from": 400}]}}
    }))
    want = ddb.execute("""
        SELECT CASE WHEN n_chars < 200 THEN '*-200'
                    WHEN n_chars < 400 THEN '200-400'
                    ELSE '400-*' END AS k, count(*)
        FROM documents GROUP BY k ORDER BY k
    """).fetchall()
    assert sorted([(g[0], g[1]) for g in got]) == sorted(want)


def test_stats_and_cardinality(docs, ddb):
    got = rows(compile_aggs(docs, {
        "s": {"stats": {"field": "n_chars"}},
        "c": {"cardinality": {"field": "lang", "exact": True}},
    }))[0]
    want = ddb.execute("""
        SELECT count(*), count(n_chars), min(n_chars), max(n_chars),
               avg(n_chars), sum(n_chars), count(DISTINCT lang)
        FROM documents
    """).fetchone()
    # columns: doc_count, s_count, s_min, s_max, s_avg, s_sum, c
    assert got[0] == want[0] and got[1] == want[1]
    assert got[2] == want[2] and got[3] == want[3]
    assert abs(got[4] - want[4]) < 1e-9 and got[5] == want[5]
    assert got[6] == want[6]


def test_filters_buckets(docs, ddb):
    got = rows(compile_aggs(docs, {
        "f": {"filters": {"filters": {
            "short": {"range": {"n_chars": {"lt": 300}}},
            "long": {"range": {"n_chars": {"gte": 300}}},
        }}}
    }))
    want = ddb.execute("""
        SELECT CASE WHEN n_chars < 300 THEN 'short' ELSE 'long' END AS k,
               count(*) FROM documents GROUP BY k ORDER BY k
    """).fetchall()
    assert sorted([(g[0], g[1]) for g in got]) == sorted(want)


def test_date_histogram_orders(orders, ddb):
    got = rows(compile_aggs(orders, {
        "m": {"date_histogram": {"field": "o_orderdate",
                                 "calendar_interval": "month"},
              "aggs": {"rev": {"sum": {"field": "o_totalprice"}}}}
    }))
    want = ddb.execute("""
        SELECT date_trunc('month', o_orderdate) AS m, count(*),
               sum(o_totalprice)
        FROM orders GROUP BY m ORDER BY m
    """).fetchall()
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g[1] == w[1] and abs(float(g[2]) - float(w[2])) < 1e-4


def test_pipeline_cumsum_derivative(orders, ddb):
    got = rows(compile_aggs(orders, {
        "m": {"date_histogram": {"field": "o_orderdate",
                                 "calendar_interval": "month"}},
        "cum": {"cumulative_sum": {"buckets_path": "doc_count"}},
        "diff": {"derivative": {"buckets_path": "doc_count"}},
    }))
    want = ddb.execute("""
        WITH b AS (SELECT date_trunc('month', o_orderdate) AS m, count(*) AS c
                   FROM orders GROUP BY m)
        SELECT m, c, sum(c) OVER (ORDER BY m),
               c - lag(c) OVER (ORDER BY m)
        FROM b ORDER BY m
    """).fetchall()
    for g, w in zip(got, want):
        assert g[1] == w[1] and g[2] == w[2] and g[3] == w[3]


def test_bucket_selector_and_script(docs, ddb):
    got = rows(compile_aggs(docs, {
        "langs": {"terms": {"field": "lang", "size": 100}},
        "ratio": {"bucket_script": {
            "buckets_path": {"n": "doc_count"},
            "script": "params.n * 2",
        }},
        "sel": {"bucket_selector": {
            "buckets_path": {"n": "doc_count"},
            "script": "params.n >= 10",
        }},
    }))
    want = ddb.execute("""
        SELECT lang, count(*) AS c, count(*) * 2 FROM documents
        WHERE lang IS NOT NULL GROUP BY lang HAVING c >= 10
        ORDER BY c DESC, lang
    """).fetchall()
    assert sorted([(g[0], g[1], g[2]) for g in got]) == sorted(want)


def test_composite_after(docs, ddb):
    got = rows(compile_aggs(docs, {
        "c": {"composite": {"size": 3, "sources": [{"l": {"terms": {"field": "lang"}}}],
                            "after": "de"}}
    }))
    want = ddb.execute("""
        SELECT lang, count(*) FROM documents WHERE lang > 'de'
        GROUP BY lang ORDER BY lang LIMIT 3
    """).fetchall()
    assert [(g[0], g[1]) for g in got] == want


def test_top_hits(docs):
    got = rows(compile_aggs(docs, {
        "langs": {"terms": {"field": "lang", "size": 3},
                  "aggs": {"top": {"top_hits": {
                      "size": 2, "sort": [{"n_chars": {"order": "desc"}}],
                      "_source": ["doc_id"]}}}}
    }))
    for g in got:
        hits = g[-1]
        assert 1 <= len(hits) <= 2
        if len(hits) == 2:
            assert hits[0]["n_chars"] >= hits[1]["n_chars"]


def test_missing_and_global(docs, ddb):
    got = rows(compile_aggs(docs, {
        "g": {"global": {}, "aggs": {}},
    }))
    want = ddb.execute("SELECT count(*) FROM documents").fetchone()
    assert got[0][1] == want[0]


def test_matrix_stats(docs, ddb):
    got = rows(compile_aggs(docs, {
        "m": {"matrix_stats": {"fields": ["n_chars", "doc_id"]}}
    }))[0]
    want = ddb.execute("""
        SELECT count(*), covar_pop(n_chars, doc_id), corr(n_chars, doc_id)
        FROM documents
    """).fetchone()
    assert got[0] == want[0]
    assert abs(got[1] - want[1]) < 1e-6 and abs(got[2] - want[2]) < 1e-9


def test_filters_overlapping_buckets(docs, ddb):
    """Independent-buckets semantics (reference: FiltersAggregator): a doc
    matching several filters counts in EVERY matching bucket."""
    got = rows(compile_aggs(docs, {
        "f": {"filters": {"filters": {
            "short": "n_chars < 400",
            "en": "lang = 'en'",
        }}}
    }).select("key_f", "doc_count").orderBy("key_f"))
    exp = ddb.execute("""
        SELECT key_f, doc_count FROM (
          SELECT 'short' AS key_f, count(*) AS doc_count
          FROM documents WHERE n_chars < 400
          UNION ALL
          SELECT 'en', count(*) FROM documents WHERE lang = 'en'
        ) ORDER BY key_f
    """).fetchall()
    assert got == [tuple(r) for r in exp]
    # overlap really exists: bucket sums exceed the doc count
    n = ddb.execute("SELECT count(*) FROM documents").fetchone()[0]
    short_and_en = ddb.execute(
        "SELECT count(*) FROM documents WHERE n_chars < 400 AND lang = 'en'"
    ).fetchone()[0]
    assert short_and_en > 0 and sum(c for _k, c in got) > 0
    assert sum(c for _k, c in got) == (
        ddb.execute("SELECT count(*) FROM documents WHERE n_chars < 400").fetchone()[0]
        + ddb.execute("SELECT count(*) FROM documents WHERE lang = 'en'").fetchone()[0]
    )


def test_moving_avg_holt_model(orders, ddb):
    """Holt linear model (reference: HoltWintersModel.java family) vs a
    plain-python reference recursion."""
    out = compile_aggs(orders, {
        "m": {"date_histogram": {"field": "o_orderdate",
                                 "calendar_interval": "month"}},
        "h": {"moving_avg": {"buckets_path": "doc_count", "window": 4,
                             "model": "holt",
                             "settings": {"alpha": 0.5, "beta": 0.2}}},
    }).orderBy("key_m").collect()
    vals = [r["doc_count"] for r in out]

    def holt(w, alpha=0.5, beta=0.2):
        s = b = None
        for j, v in enumerate(w):
            if j == 0:
                s, b = v, 0.0
            else:
                last = s
                s = alpha * v + (1 - alpha) * (s + b)
                b = beta * (s - last) + (1 - beta) * b
        return s

    for i, r in enumerate(out):
        w = vals[max(0, i - 3): i + 1]
        assert abs(r["h"] - holt(w)) < 1e-9


def test_geo_distance_overlapping_rings(spark, ddb):
    """Overlapping geo_distance rings count a doc in EVERY matching ring
    (RangeAggregator independence), and the haversine matches DuckDB."""
    from pyspark.sql import functions as F

    ev = spark.createDataFrame(
        [(i, i * 37 % 140 - 70.0, i * 53 % 340 - 170.0) for i in range(200)],
        "id long, lat double, lon double",
    ).withColumn("location", F.struct("lat", "lon"))
    got = {r["key_r"]: r["doc_count"] for r in compile_aggs(ev, {
        "r": {"geo_distance": {"field": "location",
                               "origin": {"lat": 10.0, "lon": 20.0},
                               "unit": "km",
                               "ranges": [{"to": 8000},
                                          {"from": 4000, "to": 12000},
                                          {"from": 10000}]}},
    }).collect()}
    import math

    R = 6371008.7714150598
    def hav(lat, lon):
        a = (math.sin(math.radians(lat - 10.0) / 2) ** 2
             + math.cos(math.radians(10.0)) * math.cos(math.radians(lat))
             * math.sin(math.radians(lon - 20.0) / 2) ** 2)
        return 2 * R * math.asin(math.sqrt(a)) / 1000.0
    pts = [(i * 37 % 140 - 70.0, i * 53 % 340 - 170.0) for i in range(200)]
    want = {
        "*-8000": sum(1 for la, lo in pts if hav(la, lo) < 8000),
        "4000-12000": sum(1 for la, lo in pts if 4000 <= hav(la, lo) < 12000),
        "10000-*": sum(1 for la, lo in pts if hav(la, lo) >= 10000),
    }
    assert got == want
    # independence: total bucket membership exceeds the doc count
    assert sum(got.values()) > 200


def test_children_and_parent_aggs(spark):
    """children: bucket doc_count counts CHILD docs; parent: each parent
    counted once per bucket even with many children."""
    parents = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b")], "pid long, grp string")
    children = spark.createDataFrame(
        [(1, 10.0), (1, 20.0), (2, 30.0), (3, 40.0), (3, 50.0), (3, 60.0)],
        "cpid long, val double")
    got = {r["key_g"]: (r["doc_count"], r["s"]) for r in compile_aggs(parents, {
        "g": {"terms": {"field": "grp", "size": 10, "order": {"_key": "asc"}},
              "aggs": {"ch": {"children": {"child": children,
                                           "on": ("pid", "cpid")},
                              "aggs": {"s": {"sum": {"field": "val"}}}}}},
    }).collect()}
    assert got == {"a": (3, 60.0), "b": (3, 150.0)}

    # parent: children bucketed by a child field, jump to parents
    kids = spark.createDataFrame(
        [(1, "x"), (1, "x"), (2, "x"), (3, "y"), (3, "y")],
        "kpid long, tag string")
    pvals = spark.createDataFrame(
        [(1, 5.0), (2, 7.0), (3, 9.0)], "pid long, pv double")
    got2 = {r["key_t"]: (r["doc_count"], r["s"]) for r in compile_aggs(kids, {
        "t": {"terms": {"field": "tag", "size": 10, "order": {"_key": "asc"}},
              "aggs": {"p": {"parent": {"parent": pvals,
                                        "on": ("kpid", "pid")},
                             "aggs": {"s": {"sum": {"field": "pv"}}}}}},
    }).collect()}
    # tag x has parents {1,2} (1 deduped), tag y parent {3}
    assert got2 == {"x": (2, 12.0), "y": (1, 9.0)}


def test_moving_avg_holt_winters(spark):
    """holt_winters vs a hand-rolled additive HW on a seasonal series."""
    import pandas as pd

    vals = [10, 2, 12, 4, 14, 6, 16, 8, 18, 10]
    df = spark.createDataFrame(pd.DataFrame({
        "k": list(range(len(vals))), "v": [float(v) for v in vals]}))
    out = compile_aggs(df, {
        "b": {"histogram": {"field": "k", "interval": 1}},
        "hw": {"moving_avg": {"buckets_path": "s", "window": 4,
                              "model": "holt_winters",
                              "settings": {"alpha": 0.5, "beta": 0.2,
                                           "gamma": 0.4, "period": 2}}},
        "s": {"sum": {"field": "v"}},
    })
    got = {int(r["key_b"]): r["hw"] for r in out.collect()}

    def hw_ref(w, alpha, beta, gamma, p):
        if len(w) < 2 * p:
            return None
        s = sum(w[:p]) / p
        b = sum((w[j + p] - w[j]) / p for j in range(p)) / p
        sea = [w[j] - s for j in range(p)] + [0.0] * (len(w) - p)
        ls, lb = s, b
        for j in range(p, len(w)):
            s_ = alpha * (w[j] - sea[j - p]) + (1 - alpha) * (ls + lb)
            b_ = beta * (s_ - ls) + (1 - beta) * lb
            sea[j] = gamma * (w[j] - (ls + lb)) + (1 - gamma) * sea[j - p]
            ls, lb = s_, b_
        return ls + lb + sea[len(w) - p]

    for i in range(len(vals)):
        w = [float(v) for v in vals[max(0, i - 3): i + 1]]
        want = hw_ref(w, 0.5, 0.2, 0.4, 2)
        if want is None:
            assert got[i] is None
        else:
            assert abs(got[i] - want) < 1e-9, (i, got[i], want)


def test_moving_avg_holt_winters_multiplicative(spark):
    """holt_winters type=mult vs a hand-rolled multiplicative HW."""
    import pandas as pd

    vals = [20, 4, 24, 6, 28, 8, 32, 10]
    df = spark.createDataFrame(pd.DataFrame({
        "k": list(range(len(vals))), "v": [float(v) for v in vals]}))
    out = compile_aggs(df, {
        "b": {"histogram": {"field": "k", "interval": 1}},
        "hw": {"moving_avg": {"buckets_path": "s", "window": 4,
                              "model": "holt_winters",
                              "settings": {"alpha": 0.4, "beta": 0.2,
                                           "gamma": 0.3, "period": 2,
                                           "type": "mult"}}},
        "s": {"sum": {"field": "v"}},
    })
    got = {int(r["key_b"]): r["hw"] for r in out.collect()}

    def hw_mult(w, alpha, beta, gamma, p):
        if len(w) < 2 * p:
            return None
        w = [v + 1e-10 for v in w]
        s = sum(w[:p]) / p
        b = sum((w[j + p] - w[j]) / p for j in range(p)) / p
        sea = [w[j] / s for j in range(p)] + [0.0] * (len(w) - p)
        ls, lb = s, b
        for j in range(p, len(w)):
            s_ = alpha * (w[j] / sea[j - p]) + (1 - alpha) * (ls + lb)
            sea[j] = gamma * (w[j] / (ls + lb)) + (1 - gamma) * sea[j - p]
            b_ = beta * (s_ - ls) + (1 - beta) * lb
            ls, lb = s_, b_
        return (ls + lb) * sea[len(w) - p]

    for i in range(len(vals)):
        w = [float(v) for v in vals[max(0, i - 3): i + 1]]
        want = hw_mult(w, 0.4, 0.2, 0.3, 2)
        if want is None:
            assert got[i] is None
        else:
            assert abs(got[i] - want) < 1e-9, (i, got[i], want)


def test_composite_date_histogram_source(orders, ddb):
    """composite with a date_histogram source + after-key paging."""
    got = rows(compile_aggs(orders, {
        "c": {"composite": {
            "size": 4,
            "sources": [{"m": {"date_histogram": {
                "field": "o_orderdate", "calendar_interval": "month"}}}],
        }}
    }))
    want = ddb.execute("""
        SELECT strftime(date_trunc('month', o_orderdate),
                        '%Y-%m-%d %H:%M:%S') AS m, count(*)
        FROM orders GROUP BY m ORDER BY m LIMIT 4
    """).fetchall()
    assert [(g[0], g[1]) for g in got] == want
    # page 2 via after
    after = got[-1][0]
    got2 = rows(compile_aggs(orders, {
        "c": {"composite": {
            "size": 4, "after": after,
            "sources": [{"m": {"date_histogram": {
                "field": "o_orderdate", "calendar_interval": "month"}}}],
        }}
    }))
    want2 = ddb.execute(f"""
        SELECT strftime(date_trunc('month', o_orderdate),
                        '%Y-%m-%d %H:%M:%S') AS m, count(*)
        FROM orders GROUP BY m HAVING m > '{after}' ORDER BY m LIMIT 4
    """).fetchall()
    assert [(g[0], g[1]) for g in got2] == want2


def test_pipeline_extended_stats_bucket(orders, ddb):
    """extended_stats_bucket: population variance/std over the sibling
    buckets plus sigma bounds (reference:
    ExtendedStatsBucketPipelineAggregator)."""
    got = rows(compile_aggs(orders, {
        "m": {"date_histogram": {"field": "o_orderdate",
                                 "calendar_interval": "month"}},
        "es": {"extended_stats_bucket": {"buckets_path": "doc_count",
                                         "sigma": 2.0}},
    }))
    want = ddb.execute("""
        WITH b AS (SELECT date_trunc('month', o_orderdate) AS m,
                          count(*) AS c
                   FROM orders GROUP BY m)
        SELECT m, c,
               avg(c) OVER (), sum(c) OVER (), min(c) OVER (),
               max(c) OVER (), count(c) OVER (),
               var_pop(c) OVER (), stddev_pop(c) OVER (),
               avg(c) OVER () + 2.0 * stddev_pop(c) OVER (),
               avg(c) OVER () - 2.0 * stddev_pop(c) OVER ()
        FROM b ORDER BY m
    """).fetchall()
    assert len(got) == len(want) and len(got) > 2
    for g, w in zip(got, want):
        for i in range(1, 11):
            assert abs(float(g[i]) - float(w[i])) < 1e-6, (i, g, w)


def test_pipeline_percentiles_bucket(orders, ddb):
    """percentiles_bucket: nearest-rank selection over the sorted
    sibling-bucket values — data[round(p/100*(n-1))], NOT interpolated
    (reference: PercentilesBucketPipelineAggregator.java:94)."""
    got = compile_aggs(orders, {
        "m": {"date_histogram": {"field": "o_orderdate",
                                 "calendar_interval": "month"}},
        "pct": {"percentiles_bucket": {"buckets_path": "doc_count",
                                       "percents": [25.0, 50.0, 99.0]}},
    })
    assert {"pct_p25", "pct_p50", "pct_p99"} <= set(got.columns)
    got = rows(got)
    counts = sorted(r[1] for r in ddb.execute("""
        SELECT date_trunc('month', o_orderdate) AS m, count(*) AS c
        FROM orders GROUP BY m
    """).fetchall())
    n = len(counts)

    def rank(p):
        return float(counts[int((p / 100.0) * (n - 1) + 0.5)])

    assert n > 2 and len(got) == n
    for g in got:
        # every value must be an ACTUAL bucket count (nearest-rank)
        for i, p in zip(range(2, 5), (25.0, 50.0, 99.0)):
            assert float(g[i]) == rank(p), (i, g)
            assert float(g[i]) in {float(c) for c in counts}


def test_geohash_grid_clamps_unnormalized_coords(spark):
    """Out-of-range coordinates (lon < -180 / lat < -90) clamp to the
    edge cell instead of sign-extending into a garbage all-'z' cell
    (same two-sided clamp as geotile_grid)."""
    from pyspark.sql import functions as F

    ev = spark.createDataFrame(
        [(0, -90.0, -180.0), (1, -90.5, -180.5), (2, 91.0, 181.0)],
        "id long, lat double, lon double",
    ).withColumn("location", F.struct("lat", "lon"))
    got = {r["key_g"]: r["doc_count"] for r in compile_aggs(ev, {
        "g": {"geohash_grid": {"field": "location", "precision": 1}}
    }).collect()}
    # rows 0 and 1 must land in the SAME (SW-corner) cell: geohash '0'
    assert got.get("0") == 2
    # the NE out-of-range point clamps to the NE corner cell 'z'
    assert got.get("z") == 1


def test_moving_fn_shift_semantics(spark):
    """moving_fn window = [i-window+shift, i+shift) — the reference
    default shift=0 EXCLUDES the current bucket
    (MovFnPipelineAggregator.java:136); the first bucket's window is
    empty -> null (the reference's NaN)."""
    df = spark.createDataFrame(
        [(1, 10), (2, 30), (3, 20), (4, 50)], "k int, v int")
    # one row per k, doc_count = 1 each; track v via a sum metric
    body = {"m": {"histogram": {"field": "k", "interval": 1},
                  "aggs": {"s": {"sum": {"field": "v"}}}},
            "mx": {"moving_fn": {"buckets_path": "s", "window": 2,
                                 "script": "MovingFunctions.max(values)"}}}
    got = {float(r["key_m"]): r["mx"] for r in compile_aggs(df, body).collect()}
    assert got[1.0] is None                  # empty window before bucket 1
    assert got[2.0] == 10.0                  # [10]
    assert got[3.0] == 30.0                  # [10, 30]
    assert got[4.0] == 30.0                  # [30, 20]
    # shift=1 includes the current bucket
    body["mx"]["moving_fn"]["shift"] = 1
    got = {float(r["key_m"]): r["mx"] for r in compile_aggs(df, body).collect()}
    assert got[1.0] == 10.0 and got[4.0] == 50.0


def test_median_absolute_deviation_exact(spark):
    """MAD = median(|x - median(x)|), midpoint-average median on even
    counts (documented exact variant of the reference's TDigest
    approximation, MedianAbsoluteDeviationAggregator.java:48)."""
    import numpy as np

    vals = [1.0, 2.0, 3.0, 4.0, 5.0, 100.0]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = compile_aggs(df, {
        "mad": {"median_absolute_deviation": {"field": "x"}}}).collect()[0]
    m = np.median(vals)
    assert got["mad"] == float(np.median(np.abs(np.array(vals) - m)))


def test_mad_all_null_bucket_yields_null(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("b", None)], "g string, x double")
    got = {r["key_l"]: r["mad"] for r in compile_aggs(df, {
        "l": {"terms": {"field": "g", "size": 10}},
        "mad": {"median_absolute_deviation": {"field": "x"}}}).collect()}
    assert got["a"] == 1.0
    assert got["b"] is None


def test_terms_missing_param(spark):
    """terms `missing`: nulls bucket under the substitute value instead
    of being dropped."""
    df = spark.createDataFrame(
        [("en",), ("en",), (None,), ("de",)], "lang string")
    got = {r["key_l"]: r["doc_count"] for r in compile_aggs(df, {
        "l": {"terms": {"field": "lang", "size": 10,
                        "missing": "unknown"}}}).collect()}
    assert got == {"en": 2, "unknown": 1, "de": 1}


def test_histogram_min_doc_count_zero_fills_gaps(spark):
    df = spark.createDataFrame([(0.0,), (3.0,), (3.5,)], "v double")
    got = [(float(r["key_h"]), r["doc_count"]) for r in compile_aggs(df, {
        "h": {"histogram": {"field": "v", "interval": 1,
                            "min_doc_count": 0}}}).collect()]
    assert got == [(0.0, 1), (1.0, 0), (2.0, 0), (3.0, 2)]
    # default min_doc_count=1: no empty buckets
    dflt = compile_aggs(df, {
        "h": {"histogram": {"field": "v", "interval": 1}}}).count()
    assert dflt == 2


def test_date_histogram_min_doc_count_zero_fills_months(spark):
    import datetime as dt

    df = spark.createDataFrame(
        [(dt.datetime(2020, 1, 5),), (dt.datetime(2020, 4, 9),)],
        "ts timestamp")
    got = [(r["key_m"].month, r["doc_count"]) for r in compile_aggs(df, {
        "m": {"date_histogram": {"field": "ts",
                                 "calendar_interval": "month",
                                 "min_doc_count": 0}}}).collect()]
    assert got == [(1, 1), (2, 0), (3, 0), (4, 1)]


def test_histogram_offset_and_extended_bounds(spark):
    """offset shifts bucket boundaries (key = floor((v-o)/i)*i + o);
    extended_bounds widens the min_doc_count=0 fill range beyond the
    observed keys."""
    df = spark.createDataFrame([(5.5,), (7.2,)], "v double")
    got = [(float(r["key_h"]), r["doc_count"]) for r in compile_aggs(df, {
        "h": {"histogram": {"field": "v", "interval": 2, "offset": 0.5}}
    }).collect()]
    assert got == [(4.5, 1), (6.5, 1)]
    ext = [(float(r["key_h"]), r["doc_count"]) for r in compile_aggs(df, {
        "h": {"histogram": {"field": "v", "interval": 2, "offset": 0.5,
                            "min_doc_count": 0,
                            "extended_bounds": {"min": 1.0, "max": 11.0}}}
    }).collect()]
    assert ext == [(0.5, 0), (2.5, 0), (4.5, 1), (6.5, 1), (8.5, 0), (10.5, 0)]


def test_date_histogram_extended_bounds(spark):
    import datetime as dt

    df = spark.createDataFrame([(dt.datetime(2020, 3, 5),)], "ts timestamp")
    got = [(r["key_m"].year, r["key_m"].month, r["doc_count"])
           for r in compile_aggs(df, {
               "m": {"date_histogram": {
                   "field": "ts", "calendar_interval": "month",
                   "min_doc_count": 0,
                   "extended_bounds": {"min": "2020-01-15",
                                       "max": "2020-05-01"}}}}).collect()]
    assert got == [(2020, 1, 0), (2020, 2, 0), (2020, 3, 1),
                   (2020, 4, 0), (2020, 5, 0)]


def test_histogram_min_doc_count_threshold(spark):
    df = spark.createDataFrame([(0.1,), (0.2,), (1.5,)], "v double")
    got = [(float(r["key_h"]), r["doc_count"]) for r in compile_aggs(df, {
        "h": {"histogram": {"field": "v", "interval": 1,
                            "min_doc_count": 2}}}).collect()]
    assert got == [(0.0, 2)]


def test_nested_histogram_fill_per_parent(spark):
    """min_doc_count=0 on the INNERMOST bucket fills per parent bucket;
    a histogram mid-chain raises instead of silently skipping."""
    import pytest as _pytest

    df = spark.createDataFrame(
        [("a", 0.0), ("a", 2.0), ("b", 5.0)], "g string, v double")
    got = [(r["key_l"], float(r["key_h"]), r["doc_count"])
           for r in compile_aggs(df, {
               "l": {"terms": {"field": "g", "size": 10},
                     "aggs": {"h": {"histogram": {
                         "field": "v", "interval": 1,
                         "min_doc_count": 0}}}},
           }).orderBy("key_l", "key_h").collect()]
    assert got == [("a", 0.0, 1), ("a", 1.0, 0), ("a", 2.0, 1),
                   ("b", 5.0, 1)]
    with _pytest.raises(ValueError):
        compile_aggs(df, {
            "h": {"histogram": {"field": "v", "interval": 1,
                                "min_doc_count": 0},
                  "aggs": {"l": {"terms": {"field": "g"}}}}})


def test_date_histogram_extended_bounds_epoch_millis(spark):
    import datetime as dt

    df = spark.createDataFrame([(dt.datetime(2020, 3, 5),)], "ts timestamp")
    ms = int(dt.datetime(2020, 5, 1, tzinfo=dt.timezone.utc).timestamp() * 1000)
    got = compile_aggs(df, {
        "m": {"date_histogram": {"field": "ts",
                                 "calendar_interval": "month",
                                 "min_doc_count": 0,
                                 "extended_bounds": {"max": ms}}}}).count()
    assert got == 3  # Mar, Apr, May


def test_ip_range_cidr_mask(spark):
    df = spark.createDataFrame(
        [("10.0.0.5",), ("10.0.0.130",), ("10.0.1.7",)], "ip string")
    got = {r["key_r"]: r["doc_count"] for r in compile_aggs(df, {
        "r": {"ip_range": {"field": "ip", "ranges": [
            {"mask": "10.0.0.0/25"},     # .0 - .127
            {"mask": "10.0.0.128/25"},   # .128 - .255
            {"from": "10.0.1.0"},
        ]}}}).collect()}
    assert got["10.0.0.0/25"] == 1
    assert got["10.0.0.128/25"] == 1
    assert got["10.0.1.0-*"] == 1


def test_significant_terms_gnd_heuristic(docs, ddb):
    """GND (heuristic/GND.java:95): exp-inverted normalized distance;
    mirror the formula in SQL over the same fg/bg token counts."""
    got = {r["key_sig"]: round(float(r["score"]), 6)
           for r in compile_aggs(docs, {
               "sig": {"significant_text": {
                   "field": "text", "foreground": "lang = 'en'",
                   "size": 10, "min_doc_count": 3,
                   "heuristic": "gnd"}}}).collect()}
    want = {r[0]: round(r[1], 6) for r in ddb.execute("""
        WITH tok AS (
          SELECT doc_id, lang = 'en' AS fg,
                 unnest(list_distinct(regexp_extract_all(lower(text),
                        '[a-z0-9_]+'))) AS term
          FROM documents
        ),
        c AS (
          SELECT term, count(*) AS bg,
                 sum(CASE WHEN fg THEN 1 ELSE 0 END) AS fgc
          FROM tok GROUP BY term
        ),
        t AS (SELECT count(*) AS n_bg,
                     sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS n_fg
              FROM documents)
        SELECT term,
               CASE WHEN fgc = 0 THEN 0.0
                    WHEN bg = n_fg AND bg = fgc THEN 1.0
                    ELSE exp(-(greatest(ln(bg*1.0), ln(n_fg*1.0)) - ln(fgc*1.0))
                             / (ln(n_bg*1.0) - least(ln(bg*1.0), ln(n_fg*1.0))))
               END AS score
        FROM c CROSS JOIN t
        WHERE fgc >= 3 AND fgc * 1.0 / n_fg > bg * 1.0 / n_bg
        ORDER BY score DESC, term LIMIT 10
    """).fetchall()}
    assert got == want


def test_cardinality_precision_threshold(docs):
    got = compile_aggs(docs, {
        "c": {"cardinality": {"field": "lang",
                              "precision_threshold": 3000}}}).collect()[0]
    assert got["c"] == 5  # high precision -> exact on tiny cardinality
