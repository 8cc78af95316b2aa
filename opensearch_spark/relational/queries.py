"""Relational facade: the reference's filter + aggregation surface as pure
Catalyst plans (SURVEY.md §2.3 term-level queries, §2.5 aggregations,
§2.6-2.7 window/top-k analogs).

Each function takes (spark, sf_dir) and returns a DataFrame; the paired
DuckDB oracle SQL lives in relational/oracles.py. Everything here is
built-in pyspark.sql.functions — no Python UDFs — so the whole surface
rides whole-stage codegen, partial+final aggregation, and predicate
pushdown for free (the reference implements all of this by hand in its
per-shard collect -> coordinator reduce machinery,
``search/aggregations/InternalAggregations.java``).

Reference operator -> implementation map (selection):
- terms agg            -> groupBy().count() + orderBy().limit(N)
- multi_terms          -> groupBy(k1, k2)
- date_histogram       -> date_trunc + groupBy
- histogram            -> floor(col / interval) * interval
- range agg            -> CASE-bucket expression
- stats/extended_stats -> one agg() with count/sum/avg/min/max/var/stddev
- value_count/cardinality -> count / countDistinct (exact; the reference's
  HLL++ approx_count_distinct exists but the oracle uses exact)
- percentiles          -> percentile() (exact; reference t-digest is approx)
- weighted_avg         -> sum(v*w)/sum(w)
- top_hits / collapse  -> row_number() over (partitionBy...orderBy)
- composite agg        -> groupBy keys + orderBy keys + after-key filter + limit
- filters agg          -> sum(when(pred,1))
- missing agg          -> count(when(isNull,1))
- significant_terms    -> fg/bg frequency join + JLH-style score
- pipeline aggs        -> window functions over the bucketed result
  (derivative = lag diff, cumulative_sum = running sum, moving_avg =
  avg over rowsBetween, serial_diff = lag(n))
- search_after         -> keyset predicate + orderBy + limit
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window, functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


# ---- term-level filters (SURVEY §2.3) --------------------------------------

def q_term_filter(spark, sf_dir):
    """term + range + exists over lineitem (Catalyst pushdown path)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_returnflag") == "R")
            & F.col("l_quantity").between(10.0, 20.0)
            & F.col("l_shipdate").isNotNull()
        )
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
    )


def q_terms_in(spark, sf_dir):
    """terms query (value list) + ids-style key lookup."""
    c = _t(spark, sf_dir, "customer")
    return c.where(F.col("c_mktsegment").isin("BUILDING", "MACHINERY")).select(
        "c_custkey", "c_name", "c_mktsegment"
    )


def q_prefix_like(spark, sf_dir):
    """prefix/wildcard query on a keyword-ish column."""
    p = _t(spark, sf_dir, "part")
    return p.where(F.col("p_name").startswith("s")).select("p_partkey", "p_name")


# ---- metric aggregations (SURVEY §2.5) --------------------------------------

def q_stats_agg(spark, sf_dir):
    """stats + extended_stats in one pass (count/sum/avg/min/max/var/std)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.agg(
        F.count("l_extendedprice").alias("cnt"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
        F.round(F.min("l_extendedprice"), 2).alias("min_price"),
        F.round(F.max("l_extendedprice"), 2).alias("max_price"),
        F.round(F.var_pop("l_extendedprice"), 2).alias("var_price"),
        F.round(F.stddev_pop("l_extendedprice"), 4).alias("std_price"),
    )


def q_value_count_cardinality(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.agg(
        F.count("l_partkey").alias("value_count"),
        F.countDistinct("l_partkey").alias("cardinality"),
    )


def q_percentiles(spark, sf_dir):
    """percentiles agg (exact; both engines use the same linear-interp
    definition)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.agg(
        F.round(F.expr("percentile(l_quantity, 0.25)"), 4).alias("p25"),
        F.round(F.expr("percentile(l_quantity, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(l_quantity, 0.95)"), 4).alias("p95"),
    )


def q_weighted_avg(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.agg(
        F.round(
            F.sum(F.col("l_extendedprice") * F.col("l_quantity")) / F.sum("l_quantity"), 4
        ).alias("wavg_price")
    )


# ---- bucket aggregations ----------------------------------------------------

def q_terms_agg(spark, sf_dir):
    """terms agg: top groups by doc count with a sub-metric (exact — Spark
    has no shard doc_count_error)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("doc_count"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
        )
        .orderBy(F.desc("doc_count"), F.asc("l_returnflag"), F.asc("l_linestatus"))
        .limit(10)
    )


def q_multi_terms_nested_metric(spark, sf_dir):
    """multi_terms with order by metric."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("doc_count"), F.round(F.sum("o_totalprice"), 2).alias("rev"))
        .orderBy(F.desc("rev"))
        .limit(8)
    )


def q_date_histogram(spark, sf_dir):
    """date_histogram (calendar month) + metric sub-agg."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(F.date_trunc("month", "ts").alias("month"))
        .agg(F.count("*").alias("doc_count"), F.round(F.sum("value"), 3).alias("sum_value"))
        .orderBy("month")
    )


def q_histogram(spark, sf_dir):
    """numeric histogram, interval=5."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy((F.floor(F.col("l_quantity") / 5) * 5).cast("double").alias("bucket"))
        .agg(F.count("*").alias("doc_count"))
        .orderBy("bucket")
    )


def q_range_agg(spark, sf_dir):
    """range agg with explicit buckets."""
    li = _t(spark, sf_dir, "lineitem")
    bucket = (
        F.when(F.col("l_extendedprice") < 20000, "cheap")
        .when(F.col("l_extendedprice") < 50000, "mid")
        .otherwise("expensive")
    )
    return (
        li.groupBy(bucket.alias("bucket"))
        .agg(F.count("*").alias("doc_count"), F.round(F.avg("l_discount"), 5).alias("avg_disc"))
        .orderBy("bucket")
    )


def q_filters_agg(spark, sf_dir):
    """filters agg: named predicate buckets in one pass."""
    e = _t(spark, sf_dir, "events")
    return e.agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("clicks"),
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias("views"),
        F.sum(F.when(F.col("value") > 50, 1).otherwise(0)).alias("high_value"),
    )


def q_missing_agg(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    return e.agg(
        F.sum(F.when(F.col("props").isNull(), 1).otherwise(0)).alias("missing_props"),
        F.count("*").alias("total"),
    )


def q_significant_terms(spark, sf_dir):
    """significant_terms: foreground (clicks) vs background term frequency,
    JLH-style score = (fg% - bg%) * (fg% / bg%)."""
    e = _t(spark, sf_dir, "events")
    fg = e.where(F.col("event_type") == "click")
    fg_total = fg.count()
    bg_total = e.count()
    fg_counts = fg.groupBy("user_id").agg(F.count("*").alias("fg"))
    bg_counts = e.groupBy("user_id").agg(F.count("*").alias("bg"))
    j = fg_counts.join(bg_counts, "user_id")
    fgp = F.col("fg") / F.lit(float(fg_total))
    bgp = F.col("bg") / F.lit(float(bg_total))
    return (
        j.select(
            "user_id", "fg", "bg",
            F.round((fgp - bgp) * (fgp / bgp), 6).alias("jlh"),
        )
        .orderBy(F.desc("jlh"), F.asc("user_id"))
        .limit(15)
    )


def q_composite_after(spark, sf_dir):
    """composite agg: paginated multi-source group-by with after-key."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("doc_count"))
        .where(
            (F.col("l_returnflag") > "A")
            | ((F.col("l_returnflag") == "A") & (F.col("l_linestatus") > "F"))
        )
        .orderBy("l_returnflag", "l_linestatus")
        .limit(3)
    )


# ---- top-k / window analogs (SURVEY §2.6-2.7) -------------------------------

def q_top_hits(spark, sf_dir):
    """top_hits: top-2 orders by totalprice per orderpriority bucket."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 2)
        .select("o_orderpriority", "rank", "o_orderkey", "o_totalprice")
    )


def q_collapse(spark, sf_dir):
    """field collapsing: top-1 per custkey by totalprice."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
    )


def q_search_after(spark, sf_dir):
    """search_after keyset pagination: next 10 after (totalprice, orderkey)."""
    o = _t(spark, sf_dir, "orders")
    first = (
        o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey")).limit(10).collect()
    )
    last = first[-1]
    ap, ak = float(last["o_totalprice"]), int(last["o_orderkey"])
    return (
        o.where(
            (F.col("o_totalprice") < ap)
            | ((F.col("o_totalprice") == ap) & (F.col("o_orderkey") > ak))
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_totalprice")
    )


# ---- pipeline aggregations (SURVEY §2.5 pipeline -> window fns) -------------

def q_pipeline_aggs(spark, sf_dir):
    """derivative + cumulative_sum + moving_avg(3) + serial_diff(2) over a
    date_histogram series — the reference's pipeline aggs as one window pass."""
    e = _t(spark, sf_dir, "events")
    buckets = (
        e.groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(F.round(F.sum("value"), 3).alias("sum_value"))
    )
    w = Window.orderBy("day")
    return (
        buckets.select(
            "day",
            "sum_value",
            F.round(F.col("sum_value") - F.lag("sum_value", 1).over(w), 3).alias("derivative"),
            F.round(F.sum("sum_value").over(w.rowsBetween(Window.unboundedPreceding, 0)), 3).alias(
                "cumulative"
            ),
            F.round(F.avg("sum_value").over(w.rowsBetween(-2, 0)), 4).alias("moving_avg_3"),
            F.round(F.col("sum_value") - F.lag("sum_value", 2).over(w), 3).alias("serial_diff_2"),
        )
        .orderBy("day")
    )


def q_join_fetch(spark, sf_dir):
    """join path (has_parent analog): orders joined to customer dim with a
    broadcast (small side), per-segment aggregation after."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("doc_count"), F.round(F.sum("o_totalprice"), 2).alias("rev"))
        .orderBy("c_mktsegment")
    )


def q_adjacency_matrix(spark, sf_dir):
    """adjacency_matrix agg: pairwise intersection counts of named filters."""
    e = _t(spark, sf_dir, "events")
    a = F.col("event_type").isin("click", "view")
    b = F.col("value") > 50
    c = F.col("user_id") % 2 == 0
    return e.agg(
        F.sum(F.when(a & b, 1).otherwise(0)).alias("ab"),
        F.sum(F.when(a & c, 1).otherwise(0)).alias("ac"),
        F.sum(F.when(b & c, 1).otherwise(0)).alias("bc"),
        F.sum(F.when(a & b & c, 1).otherwise(0)).alias("abc"),
    )


def q_has_child(spark, sf_dir):
    """has_child (reference: modules/parent-join HasChildQueryBuilder.java:79):
    parents with >= 1 child matching the child query; score_mode sum ->
    sum of child scores (here: count of matching children as the child
    score is constant 1). Spark shape: inner join child-matches grouped
    by the join key — broadcast when the matching-child set is small."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    matched = o.where(F.col("o_totalprice") > 150000.0).select(
        F.col("o_custkey").alias("c_custkey"), F.lit(1.0).alias("_s")
    )
    agg = matched.groupBy("c_custkey").agg(
        F.count("*").alias("n_children"), F.sum("_s").alias("score")
    )
    return (
        c.join(agg, "c_custkey")
        .select("c_custkey", "c_name", "n_children", F.round("score", 4).alias("score"))
    )


def q_has_parent(spark, sf_dir):
    """has_parent (HasParentQueryBuilder.java:69): children whose parent
    matches the parent query (constant score)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    parents = c.where(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("o_custkey")
    )
    return o.join(F.broadcast(parents), "o_custkey").select(
        "o_orderkey", "o_custkey", F.lit(1.0).alias("score")
    )




# ---- range FIELD type (SURVEY §2.3 / reference RangeFieldMapper.java:87) ----
#
# A range field stores an interval per doc; range QUERIES against it
# take a `relation`: INTERSECTS (default), WITHIN, CONTAINS
# (reference: index/query/RangeQueryBuilder.java relation param,
# lucene BinaryDocValuesRangeQuery.QueryType). The doc interval is a
# date_range [l_shipdate, l_shipdate + (1 + l_linenumber % 20) days]
# (a deterministic delivery window derived from the row) — pure
# Catalyst comparisons, fully pushdown-able, no UDFs.

# intersects/within probe a quarter; CONTAINS probes a 2-day span a
# doc's (<= 20-day) delivery window CAN contain
_RQ_LO, _RQ_HI = "1996-01-01 00:00:00", "1996-03-31 00:00:00"
_RQ_C_LO, _RQ_C_HI = "1996-02-14 00:00:00", "1996-02-16 00:00:00"


def _with_range_field(li):
    return li.withColumn(
        "r_hi",
        F.expr("l_shipdate + make_dt_interval(1 + l_linenumber % 20)"),
    ).withColumnRenamed("l_shipdate", "r_lo")


def _lineitem_range_matches(li, relation: str):
    d = _with_range_field(li)
    q_lo, q_hi = (_RQ_C_LO, _RQ_C_HI) if relation == "contains" else (_RQ_LO, _RQ_HI)
    lo = F.lit(q_lo).cast("timestamp_ntz")
    hi = F.lit(q_hi).cast("timestamp_ntz")
    dlo, dhi = F.col("r_lo"), F.col("r_hi")
    if relation == "intersects":
        pred = (dlo <= hi) & (dhi >= lo)
    elif relation == "within":
        pred = (dlo >= lo) & (dhi <= hi)
    elif relation == "contains":
        pred = (dlo <= lo) & (dhi >= hi)
    else:
        raise ValueError(f"unknown range relation: {relation}")
    return d.where(pred)


def _range_field_q(relation: str):
    def fn(spark, sf_dir):
        li = _t(spark, sf_dir, "lineitem")
        return (
            _lineitem_range_matches(li, relation)
            .groupBy("l_returnflag")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.min("r_lo").alias("first_lo"),
                 F.max("r_hi").alias("last_hi"))
        )
    fn.__doc__ = (
        f"range query with relation={relation} against a date_range "
        "field (RangeFieldMapper semantics)")
    return fn


def q_range_field_term(spark, sf_dir):
    """term query against a range field = point INTERSECTS (reference:
    RangeType.termQuery delegates to an intersects range of width 0)."""
    li = _t(spark, sf_dir, "lineitem")
    d = _with_range_field(li)
    p = F.lit("1996-02-14 00:00:00").cast("timestamp_ntz")
    return (
        d.where((F.col("r_lo") <= p) & (F.col("r_hi") >= p))
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"))
    )



REGISTRY = {
    "r_has_child": q_has_child,
    "r_has_parent": q_has_parent,
    "r_term_filter": q_term_filter,
    "r_terms_in": q_terms_in,
    "r_prefix_like": q_prefix_like,
    "r_stats_agg": q_stats_agg,
    "r_value_count_cardinality": q_value_count_cardinality,
    "r_percentiles": q_percentiles,
    "r_weighted_avg": q_weighted_avg,
    "r_terms_agg": q_terms_agg,
    "r_multi_terms": q_multi_terms_nested_metric,
    "r_date_histogram": q_date_histogram,
    "r_histogram": q_histogram,
    "r_range_agg": q_range_agg,
    "r_filters_agg": q_filters_agg,
    "r_missing_agg": q_missing_agg,
    "r_significant_terms": q_significant_terms,
    "r_composite_after": q_composite_after,
    "r_top_hits": q_top_hits,
    "r_collapse": q_collapse,
    "r_search_after": q_search_after,
    "r_pipeline_aggs": q_pipeline_aggs,
    "r_join_fetch": q_join_fetch,
    "r_adjacency_matrix": q_adjacency_matrix,
    "r_range_field_intersects": _range_field_q("intersects"),
    "r_range_field_within": _range_field_q("within"),
    "r_range_field_contains": _range_field_q("contains"),
    "r_range_field_term": q_range_field_term,
}


