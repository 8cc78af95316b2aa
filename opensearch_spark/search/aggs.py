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

import pandas as pd
from pyspark.sql import Column, DataFrame, Window, functions as F

_METRIC_KINDS = {
    "avg", "sum", "min", "max", "value_count", "cardinality", "stats",
    "extended_stats", "percentiles", "percentile_ranks", "weighted_avg",
    "median_absolute_deviation", "top_hits", "matrix_stats",
    "geo_bounds", "geo_centroid",
}
_BUCKET_KINDS = {
    "terms", "multi_terms", "rare_terms", "histogram", "date_histogram",
    "auto_date_histogram", "variable_width_histogram", "range",
    "date_range", "ip_range", "geo_distance", "geotile_grid",
    "geohash_grid", "filters", "missing",
    "global", "composite", "nested", "reverse_nested", "sampler",
    "diversified_sampler", "children", "parent",
}

# reference: org.opensearch.common.geo.GeoUtils.EARTH_MEAN_RADIUS — the
# haversine radius the reference's arc distance calculator uses
EARTH_MEAN_RADIUS_M = 6371008.7714150598


def _haversine_m(lat_c: Column, lon_c: Column, olat: float, olon: float) -> Column:
    """Great-circle distance in meters (reference: common/geo/GeoUtils
    arcDistance / SloppyMath.haversinMeters) as a pure codegen
    expression — sin/cos/asin stay JVM-side, no UDF."""
    phi1 = F.radians(F.lit(float(olat)))
    phi2 = F.radians(lat_c)
    dphi = F.radians(lat_c - F.lit(float(olat)))
    dlmb = F.radians(lon_c - F.lit(float(olon)))
    a = (
        F.pow(F.sin(dphi / 2), 2)
        + F.cos(phi1) * F.cos(phi2) * F.pow(F.sin(dlmb / 2), 2)
    )
    return F.lit(2.0 * EARTH_MEAN_RADIUS_M) * F.asin(F.sqrt(a))
_PIPELINE_KINDS = {
    "cumulative_sum", "derivative", "serial_diff", "moving_fn", "moving_avg",
    "avg_bucket", "sum_bucket", "min_bucket", "max_bucket", "stats_bucket",
    "extended_stats_bucket", "percentiles_bucket",
    "bucket_script", "bucket_selector", "bucket_sort",
}


def compile_aggs(df: DataFrame, aggs: Dict[str, dict],
                 star_tree: Optional[Dict[str, object]] = None) -> DataFrame:
    """Compile an `aggs` tree over ``df``. One bucket chain (nested
    bucket aggs) is supported, with any number of metric/pipeline
    siblings at each level.

    ``star_tree`` = {"dir", "dims", "metrics"} (a cube built by
    index/startree.build_star_tree): when given and the request is a
    covered single-terms groupBy with sum/min/max/avg metrics, the agg
    is answered FROM the pre-aggregated cube — one gid-partition scan,
    no touch of the fact table (the reference's automatic star-tree
    query resolution, compositeindex/datacube/startree/).
    PRECONDITION: ``df`` must be the SAME unfiltered fact table the
    tree was built from — a filtered frame would be silently answered
    with whole-corpus numbers; don't pass star_tree for filtered
    scopes (the reference's resolution likewise only fires for
    unfiltered match_all scopes)."""
    if len(aggs) == 1:
        ((only_name, only_spec),) = aggs.items()
        kinds = [k for k in only_spec if k not in ("aggs", "aggregations")]
        if kinds == ["significant_text"]:
            return _significant_text(df, only_name, only_spec["significant_text"])
        if kinds == ["scripted_metric"]:
            return _scripted_metric(df, only_name, only_spec["scripted_metric"])
    chain, metrics, pipelines = _split_levels(aggs)
    sketch_route = _try_sketch_route(df, aggs, chain, metrics, star_tree)
    if sketch_route is not None:
        return sketch_route
    routed = _try_star_tree_route(df, star_tree, chain, metrics)
    if routed is not None:
        out, key_cols, limit_spec = routed
        if limit_spec is not None:
            col, direction, n = limit_spec
            oc = F.desc(col) if direction == "desc" else F.asc(col)
            out = out.orderBy(oc, *[F.asc(c) for c in key_cols]).limit(n)
        else:
            out = out.orderBy(*[F.asc(c) for c in key_cols])
        for name, kind, body in pipelines:
            out = _apply_pipeline(out, name, kind, body, key_cols)
        return out
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
    fill_spec: Optional[Tuple[str, dict]] = None       # (key_col, spec)
    for name, kind, body in chain:
        frame, kcol, post = _bucket_key(frame, name, kind, body, key_cols)
        if kcol is not None:
            key_cols.append(kcol)
        if post is not None:
            post_filters.append(post["filter"]) if "filter" in post else None
            if "limit" in post:
                limit_spec = post["limit"]
            if "min_doc_count" in post:
                order_specs.append((kcol, post))
            if "fill" in post:
                fill_spec = (kcol, post["fill"])

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
    if fill_spec is not None:
        # min_doc_count=0 (reference: histogram/date_histogram empty
        # buckets between the min and max observed keys): generate the
        # full key range — a bounds agg exploded into keys — and
        # left-join the real buckets in; metric columns stay null,
        # doc_count becomes 0 (same as the reference's empty buckets).
        # With parent buckets (the filled agg must be INNERMOST) the
        # bounds and fill run PER PARENT, like the reference.
        kc, spec = fill_spec
        if kc != key_cols[-1]:
            raise ValueError(
                "min_doc_count=0 fill is only supported on the innermost "
                "bucket agg (an empty parent bucket has no children)")
        parents = key_cols[:-1]
        gb = out.groupBy(*parents) if parents else out.groupBy()
        bounds = gb.agg(F.min(kc).alias("_lo"), F.max(kc).alias("_hi"))
        eb = spec.get("bounds") or {}

        def _ts_lit(v):
            # reference accepts ISO strings AND epoch millis
            if isinstance(v, (int, float)) and not isinstance(v, bool):
                return F.timestamp_millis(F.lit(int(v)))
            return F.lit(str(v)).cast("timestamp")

        if spec["type"] == "numeric":
            iv = float(spec["interval"])
            off = float(spec.get("offset", 0.0))
            lo, hi = F.col("_lo"), F.col("_hi")
            if "min" in eb:
                bmin = (float(eb["min"]) - off) // iv * iv + off  # bucketed
                lo = F.least(lo, F.lit(bmin))
            if "max" in eb:
                bmax = (float(eb["max"]) - off) // iv * iv + off
                hi = F.greatest(hi, F.lit(bmax))
            keys = bounds.select(*parents, F.explode(F.sequence(
                F.round((lo - F.lit(off)) / iv).cast("long"),
                F.round((hi - F.lit(off)) / iv).cast("long"),
            )).alias("_i")).select(
                *parents, (F.col("_i") * F.lit(iv) + F.lit(off)).alias(kc))
        else:
            step = F.expr(f"INTERVAL 1 {spec['unit']}")
            lo, hi = F.col("_lo"), F.col("_hi")
            if "min" in eb:
                lo = F.least(lo, F.date_trunc(spec["unit"], _ts_lit(eb["min"])))
            if "max" in eb:
                hi = F.greatest(hi, F.date_trunc(spec["unit"], _ts_lit(eb["max"])))
            keys = bounds.select(
                *parents, F.explode(F.sequence(lo, hi, step)).alias(kc))
        out = (
            keys.join(out, [*parents, kc], "left")
            .withColumn("doc_count",
                        F.coalesce(F.col("doc_count"), F.lit(0)))
        )
    if limit_spec is not None:
        col, direction, n = limit_spec
        oc = F.desc(col) if direction == "desc" else F.asc(col)
        out = out.orderBy(oc, *[F.asc(c) for c in key_cols]).limit(n)
    elif key_cols:
        out = out.orderBy(*[F.asc(c) for c in key_cols])

    # ---- pipeline aggs over the bucket frame -------------------------
    for name, kind, body in pipelines:
        out = _apply_pipeline(out, name, kind, body, key_cols)
    return out


# ---------------------------------------------------------------------------

_ST_METRIC_KINDS = {"sum", "min", "max", "avg"}


def _sketch_kind(kind: str, body) -> str | None:
    if not isinstance(body, dict):
        return None
    algo = body.get("algorithm")
    if kind == "cardinality" and algo == "hllpp":
        return "hll"
    if kind == "percentile_ranks" and algo == "tdigest":
        return "td"
    return None


def _check_sketch_innermost(aggs: Dict[str, dict]) -> None:
    """Enforce the sketch-route contract: a sketch metric groups by the
    FULL bucket-key chain, which is only its own level's grouping when
    it sits strictly INSIDE every bucket agg. A sketch metric beside or
    above a bucket level would silently be computed per innermost
    bucket combination — raise instead (_split_levels flattens levels,
    so the depth check happens on the original tree)."""
    deepest_bucket = -1
    offenders: List[Tuple[str, int]] = []

    def walk(tree: Dict[str, dict], depth: int) -> None:
        nonlocal deepest_bucket
        for nm, spec in tree.items():
            sub = spec.get("aggs") or spec.get("aggregations")
            for k in spec:
                if k in ("aggs", "aggregations"):
                    continue
                if k in _BUCKET_KINDS:
                    deepest_bucket = max(deepest_bucket, depth)
                elif _sketch_kind(k, spec[k]):
                    offenders.append((nm, depth))
            if sub:
                walk(sub, depth + 1)

    walk(aggs, 0)
    bad = [nm for nm, d in offenders if deepest_bucket >= 0 and d <= deepest_bucket]
    if bad:
        raise ValueError(
            f"sketch-algorithm metrics {bad!r} must be nested at the "
            "innermost level (inside every bucket agg) — a sketch beside "
            "or above a bucket level is not per-level-correct")


def _try_sketch_route(df: DataFrame, aggs: Dict[str, dict], chain, metrics,
                      star_tree) -> Optional[DataFrame]:
    """Route metrics requesting a mergeable sketch (``cardinality`` with
    ``algorithm: "hllpp"``, ``percentile_ranks`` with ``algorithm:
    "tdigest"`` — the reference's actual per-shard/coordinator
    algorithms, opensearch_spark.sketches) around the Catalyst
    aggregate path: the rest of the request compiles normally, then the
    sketch columns join back on the bucket keys. Supported scope: plain
    ``terms``-field bucket chains (or no buckets); sketch metrics must
    sit at the innermost level."""
    sketch_ms = [(n, k, b) for (n, k, b) in metrics if _sketch_kind(k, b)]
    if not sketch_ms:
        return None
    _check_sketch_innermost(aggs)
    import copy

    from opensearch_spark.sketches import (
        hll_cardinality, tdigest_percentile_ranks,
    )

    for name, kind, body in chain:
        if kind != "terms" or not isinstance(body.get("field"), str) or \
                "missing" in body or "script" in body:
            raise ValueError(
                "sketch-algorithm metrics support plain terms-field "
                "bucket chains only")
    key_cols = [f"key_{name}" for name, _k, _b in chain]
    fields = [body["field"] for _n, _k, body in chain]

    stripped = copy.deepcopy(aggs)

    def _strip(tree: Dict[str, dict]) -> None:
        for nm in list(tree):
            spec = tree[nm]
            sub = spec.get("aggs") or spec.get("aggregations")
            if sub:
                _strip(sub)
            for k in [k for k in spec if k not in ("aggs", "aggregations")]:
                if _sketch_kind(k, spec[k]):
                    del tree[nm]

    _strip(stripped)
    base = compile_aggs(df, stripped, star_tree=star_tree) if stripped else None
    if base is not None and key_cols:
        # capture the base ordering (terms default: doc_count desc, or
        # the request's explicit order — whatever compile_aggs emitted)
        # so the sketch joins don't re-sort the buckets
        base = base.withColumn("_sk_ord", F.monotonically_increasing_id())

    keyed = df
    for kc, f in zip(key_cols, fields):
        keyed = keyed.withColumn(kc, F.col(f))
    out = base
    for name, kind, body in sketch_ms:
        if _sketch_kind(kind, body) == "hll":
            sk = hll_cardinality(
                keyed, body["field"],
                precision_threshold=int(body.get("precision_threshold", 3000)),
                by=key_cols or None, alias=name)
        else:
            vals = body["values"]
            sk = tdigest_percentile_ranks(
                keyed, body["field"], vals,
                compression=float(body.get("compression", 100.0)),
                by=key_cols or None)
            for i, v in enumerate(vals):
                label = f"{name}_{str(v).replace('.', '_').replace('-', 'm')}"
                sk = sk.withColumnRenamed(f"rank_{i}", label)
        if out is None:
            out = sk
        elif key_cols:
            out = out.join(sk, on=key_cols, how="left")
        else:
            out = out.crossJoin(sk)
    if "_sk_ord" in out.columns:
        return out.orderBy("_sk_ord").drop("_sk_ord")
    return out.orderBy(*key_cols) if key_cols else out


def _try_star_tree_route(df, star_tree, chain, metrics):
    """When the request is a covered single-terms groupBy with
    sum/min/max/avg metrics, answer from the star-tree cube. Returns
    (bucket_frame, key_cols, limit_spec) or None (fall through to the
    fact-table plan)."""
    if not star_tree or len(chain) != 1:
        return None
    name, kind, body = chain[0]
    if kind != "terms" or "missing" in body:
        return None
    fld = body["field"]
    wanted = []
    mspecs = []
    for mname, mkind, mbody in metrics:
        if mkind not in _ST_METRIC_KINDS:
            return None
        wanted.append(f"{mkind}_{mbody['field']}")
        mspecs.append((mname, mkind, mbody["field"]))
    from opensearch_spark.index.startree import star_tree_agg, star_tree_covers

    dims = list(star_tree["dims"])
    st_metrics = list(star_tree["metrics"])
    if not star_tree_covers(dims, st_metrics, [fld], wanted):
        return None
    out_metrics = {"doc_count": "doc_count"}
    for mname, mkind, mcol in mspecs:
        out_metrics[mname] = f"{mkind}_{mcol}"
    spark = df.sparkSession
    out = star_tree_agg(spark, str(star_tree["dir"]), dims,
                        group_by=[fld], metrics=out_metrics)
    kcol = f"key_{name}"
    out = out.where(F.col(fld).isNotNull()).withColumnRenamed(fld, kcol)
    # column order must match the fact-table plan: keys, doc_count, metrics
    out = out.select(kcol, "doc_count",
                     *[mname for mname, _k, _c in mspecs])
    order = body.get("order", {"_count": "desc"})
    ((okey, odir),) = order.items() if isinstance(order, dict) else (("_count", "desc"),)
    ocol = "doc_count" if okey == "_count" else (kcol if okey == "_key" else okey)
    limit_spec = (ocol, odir, int(body.get("size", 10)))
    mdc = int(body.get("min_doc_count", 1))
    if mdc > 1:
        out = out.where(F.col("doc_count") >= mdc)
    return out, [kcol], limit_spec


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


def _bucket_key(df: DataFrame, name: str, kind: str, body: dict,
                keys_so_far: Optional[List[str]] = None):
    """Returns (frame, key_col_name | None, post_spec). The key column
    is added to the frame; rows not in any bucket are filtered. Kinds
    with key None (nested / reverse_nested / sampler / diversified_
    sampler) transform the frame without adding a grouping key."""
    kcol = f"key_{name}"
    post: Dict[str, Any] = {}
    if kind == "terms":
        fld = body["field"]
        if "missing" in body:
            # reference: terms agg `missing` — null values bucket under
            # the given substitute instead of being dropped
            df = df.withColumn(
                kcol, F.coalesce(F.col(fld), F.lit(body["missing"])))
        else:
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
        offset = float(body.get("offset", 0.0))
        # reference: HistogramAggregationBuilder offset — bucket
        # boundaries shift by offset: key = floor((v-o)/i)*i + o
        df = df.where(F.col(fld).isNotNull()).withColumn(
            kcol,
            F.floor((F.col(fld) - F.lit(offset)) / F.lit(interval))
            * F.lit(interval) + F.lit(offset),
        )
        mdc = int(body.get("min_doc_count", 1))
        if mdc == 0:
            # reference: min_doc_count=0 MATERIALIZES empty buckets
            # between the min and max observed keys; extended_bounds
            # widens that range unconditionally
            post["fill"] = {"type": "numeric", "interval": interval,
                            "offset": offset,
                            "bounds": body.get("extended_bounds")}
        elif mdc > 1:
            post["min_doc_count"] = mdc
    elif kind == "date_histogram":
        fld = body["field"]
        iv = body.get("calendar_interval") or body.get("fixed_interval") or "1d"
        unit = {"1d": "day", "day": "day", "1h": "hour", "hour": "hour",
                "1M": "month", "month": "month", "1w": "week", "week": "week",
                "1y": "year", "year": "year", "minute": "minute", "1m": "minute"}.get(iv, "day")
        df = df.where(F.col(fld).isNotNull()).withColumn(
            kcol, F.date_trunc(unit, F.col(fld))
        )
        mdc = int(body.get("min_doc_count", 1))
        if mdc == 0:
            post["fill"] = {"type": "date", "unit": unit,
                            "bounds": body.get("extended_bounds")}
        elif mdc > 1:
            post["min_doc_count"] = mdc
    elif kind in ("range", "date_range"):
        # reference: RangeAggregator — buckets are INDEPENDENT; a doc in
        # overlapping ranges counts in each. Non-overlapping specs keep
        # the single-scan when-chain; overlapping specs take one
        # filtered frame per bucket (union).
        fld = body["field"]
        ranges = body["ranges"]
        conds: List[Tuple[str, Column]] = []
        for r in ranges:
            frm, to = r.get("from"), r.get("to")
            label = r.get("key") or f"{frm if frm is not None else '*'}-{to if to is not None else '*'}"
            cond = F.lit(True)
            if frm is not None:
                cond = cond & (F.col(fld) >= F.lit(frm))
            if to is not None:
                cond = cond & (F.col(fld) < F.lit(to))
            conds.append((label, cond))
        from pyspark.sql.types import NumericType

        try:
            numeric = isinstance(df.schema[fld].dataType, NumericType)
        except Exception:
            numeric = all(
                isinstance(b, (int, float))
                for r in ranges for b in (r.get("from"), r.get("to"))
                if b is not None
            )
        if _ranges_overlap(ranges, numeric):
            df = _union_buckets(df, kcol, conds)
        else:
            expr = None
            for label, cond in conds:
                expr = F.when(cond, F.lit(label)) if expr is None else expr.when(cond, F.lit(label))
            df = df.withColumn(kcol, expr).where(F.col(kcol).isNotNull())
    elif kind == "filters":
        # reference: FiltersAggregator — independent predicates; a doc
        # matching several filters lands in every matching bucket, so
        # each bucket is its own filtered frame (union), never a
        # first-match when-chain.
        named = body["filters"]
        conds = [
            (label,
             F.expr(cond_sql) if isinstance(cond_sql, str) else _filter_to_col(cond_sql))
            for label, cond_sql in named.items()
        ]
        df = _union_buckets(df, kcol, conds)
    elif kind == "variable_width_histogram":
        # reference: bucket/histogram/VariableWidthHistogramAggregator —
        # adaptive-width buckets via per-shard clustering. Documented
        # deterministic variant: equal-frequency buckets from EXACT
        # quantile boundaries (one agg pre-pass collects N-1 scalars to
        # the driver; assignment is a codegen when-chain — no global
        # sort, unlike ntile).
        fld = body["field"]
        nb = int(body.get("buckets", 10))
        df = df.where(F.col(fld).isNotNull())
        ps = [i / nb for i in range(1, nb)]
        row = df.agg(
            F.expr(f"percentile({fld}, array({', '.join(map(str, ps))}))")
            .alias("bs")
        ).collect()[0]
        bounds = [round(float(b), 6) for b in (row["bs"] or [])]
        expr = None
        c = F.col(fld)
        for i in range(nb):
            cond = F.lit(True)
            if i > 0:
                cond = cond & (c >= F.lit(bounds[i - 1]))
            if i < len(bounds):
                cond = cond & (c < F.lit(bounds[i]))
            expr = F.when(cond, F.lit(i)) if expr is None else expr.when(cond, F.lit(i))
        df = df.withColumn(kcol, expr).where(F.col(kcol).isNotNull())
    elif kind == "ip_range":
        # reference: bucket/range/IpRangeAggregationBuilder — IPv4
        # dotted-quad ranges; addresses map to uint32 and reuse the
        # range machinery (pure codegen arithmetic, no UDF)
        import ipaddress

        fld = body["field"]
        ipnum = (
            F.split(F.col(fld), r"\.")[0].cast("bigint") * 16777216
            + F.split(F.col(fld), r"\.")[1].cast("bigint") * 65536
            + F.split(F.col(fld), r"\.")[2].cast("bigint") * 256
            + F.split(F.col(fld), r"\.")[3].cast("bigint")
        )
        conds = []
        for r in body["ranges"]:
            if "mask" in r:
                # reference: CIDR mask form — [network, broadcast]
                net = ipaddress.IPv4Network(r["mask"], strict=False)
                label = r.get("key") or r["mask"]
                cond = ((ipnum >= int(net.network_address))
                        & (ipnum <= int(net.broadcast_address)))
                conds.append((label, cond))
                continue
            frm, to = r.get("from"), r.get("to")
            label = r.get("key") or f"{frm or '*'}-{to or '*'}"
            cond = F.lit(True)
            if frm is not None:
                cond = cond & (ipnum >= int(ipaddress.IPv4Address(frm)))
            if to is not None:
                cond = cond & (ipnum < int(ipaddress.IPv4Address(to)))
            conds.append((label, cond))
        df = _union_buckets(df, kcol, conds)
    elif kind == "geo_distance":
        # reference: bucket/range/GeoDistanceAggregationBuilder /
        # GeoDistanceRangeAggregatorFactory — distance-from-origin
        # buckets; like `range` the buckets are INDEPENDENT (a doc in
        # overlapping rings counts in each). The distance is one
        # haversine codegen expression; `field` names a struct column
        # with `lat`/`lon` members (the geo_point analog).
        fld = body["field"]
        origin = body["origin"]
        olat = float(origin["lat"] if isinstance(origin, dict) else origin[1])
        olon = float(origin["lon"] if isinstance(origin, dict) else origin[0])
        from opensearch_spark.search.dsl import parse_distance_m

        unit_m = parse_distance_m("1" + str(body.get("unit", "m")))
        dist = _haversine_m(
            F.col(f"{fld}.lat").cast("double"),
            F.col(f"{fld}.lon").cast("double"), olat, olon,
        ) / F.lit(unit_m)
        conds = []
        for r in body["ranges"]:
            frm, to = r.get("from"), r.get("to")
            label = r.get("key") or f"{frm if frm is not None else '*'}-{to if to is not None else '*'}"
            cond = F.lit(True)
            if frm is not None:
                cond = cond & (dist >= F.lit(float(frm)))
            if to is not None:
                cond = cond & (dist < F.lit(float(to)))
            conds.append((label, cond))
        if _ranges_overlap(body["ranges"], numeric=True):
            df = _union_buckets(df, kcol, conds)
        else:
            expr = None
            for label, cond in conds:
                expr = F.when(cond, F.lit(label)) if expr is None else expr.when(cond, F.lit(label))
            df = df.withColumn(kcol, expr).where(F.col(kcol).isNotNull())
    elif kind == "geotile_grid":
        # reference: bucket/geogrid/GeoTileGridAggregationBuilder — web
        # mercator z/x/y tile buckets; the tile key is pure codegen
        # arithmetic (floor + log/tan), no UDF. Key format "z/x/y" as in
        # the reference's GeoTileUtils.stringEncode.
        fld = body["field"]
        z = int(body.get("precision", 7))
        n = float(1 << z)
        lat = F.col(f"{fld}.lat").cast("double")
        lon = F.col(f"{fld}.lon").cast("double")
        xt = F.floor((lon + F.lit(180.0)) / F.lit(360.0) * F.lit(n))
        lat_rad = F.radians(lat)
        import math as _math

        yt = F.floor(
            (F.lit(1.0) - F.log(F.tan(lat_rad) + F.lit(1.0) / F.cos(lat_rad))
             / F.lit(_math.pi)) / F.lit(2.0) * F.lit(n)
        )
        # clamp to the valid tile range (poles beyond mercator bounds)
        xt = F.greatest(F.lit(0), F.least(xt, F.lit(int(n) - 1)))
        yt = F.greatest(F.lit(0), F.least(yt, F.lit(int(n) - 1)))
        df = df.where(lat.isNotNull() & lon.isNotNull()).withColumn(
            kcol,
            F.concat_ws("/", F.lit(str(z)), xt.cast("long").cast("string"),
                        yt.cast("long").cast("string")),
        )
        post["limit"] = ("doc_count", "desc", int(body.get("size", 10000)))
    elif kind == "geohash_grid":
        # reference: bucket/geogrid/GeoHashGridAggregationBuilder —
        # geohash-cell buckets. A geohash of `precision` chars encodes
        # 5*precision bits interleaving lon (even bit positions from the
        # MSB) and lat: quantize lon/lat to ceil/floor(bits/2) cells,
        # interleave the bits, then base32 the 5-bit groups — all plain
        # integer arithmetic, no UDF, mirrored in the DuckDB oracle.
        fld = body["field"]
        prec = int(body.get("precision", 5))
        bits = 5 * prec
        lon_bits = (bits + 1) // 2
        lat_bits = bits // 2
        lat = F.col(f"{fld}.lat").cast("double")
        lon = F.col(f"{fld}.lon").cast("double")
        # clamp both sides (same defense as geotile above): negative
        # cell indices from un-normalized coords would sign-extend
        # through shiftright and land in a garbage all-ones cell
        xi = F.greatest(F.lit(0).cast("long"), F.least(
            F.floor((lon + F.lit(180.0)) / F.lit(360.0)
                    * F.lit(float(1 << lon_bits))).cast("long"),
            F.lit((1 << lon_bits) - 1),
        ))
        yi = F.greatest(F.lit(0).cast("long"), F.least(
            F.floor((lat + F.lit(90.0)) / F.lit(180.0)
                    * F.lit(float(1 << lat_bits))).cast("long"),
            F.lit((1 << lat_bits) - 1),
        ))
        # interleaved value: MSB (bit index bits-1) is lon's top bit
        inter = None
        for i in range(bits):
            # bit position i from the LSB; even-from-MSB == lon when
            # (bits-1-i) is even
            from_msb = bits - 1 - i
            if from_msb % 2 == 0:
                src = F.shiftright(xi, lon_bits - 1 - (from_msb // 2))
            else:
                src = F.shiftright(yi, lat_bits - 1 - (from_msb // 2))
            term = F.shiftleft(src.bitwiseAND(F.lit(1)), i)
            inter = term if inter is None else inter + term
        b32 = "0123456789bcdefghjkmnpqrstuvwxyz"
        chars = [
            F.substring(
                F.lit(b32),
                (F.shiftright(inter, 5 * (prec - 1 - ci))
                 .bitwiseAND(F.lit(31)) + 1).cast("int"),
                1,
            )
            for ci in range(prec)
        ]
        df = df.where(lat.isNotNull() & lon.isNotNull()).withColumn(
            kcol, F.concat(*chars)
        )
        post["limit"] = ("doc_count", "desc", int(body.get("size", 10000)))
    elif kind == "children":
        # reference: modules/parent-join/.../ChildrenAggregationBuilder.
        # java:59 — sub-aggs switch from parent scope to the children of
        # each bucketed parent. Relational facade: the child frame and
        # join keys come in the body; the bucketed parent keys join to
        # the child rows (bucket doc_count = number of children, as in
        # the reference). At scale this is a plain shuffle join on the
        # parent key — broadcast-able when the bucketed parent set is
        # small.
        child: DataFrame = body["child"]
        pcol, ccol = body["on"]
        keep = list(dict.fromkeys((keys_so_far or []) + [pcol]))
        df = df.select(*keep).join(
            child.withColumnRenamed(ccol, pcol), pcol
        )
        return df, None, None
    elif kind == "parent":
        # reference: modules/parent-join/.../ParentAggregationBuilder.
        # java:57 — sub-aggs jump from child scope to each child's
        # parent, counting each parent once per bucket.
        parent: DataFrame = body["parent"]
        ccol, pcol = body["on"]
        keep = list(dict.fromkeys((keys_so_far or []) + [ccol]))
        df = (
            df.select(*keep).dropDuplicates(keep)
            .join(parent.withColumnRenamed(pcol, ccol), ccol)
        )
        return df, None, None
    elif kind == "nested":
        # reference: bucket/nested/NestedAggregator.java:72 — sub-aggs
        # run per child document. Children live inline in the parent row
        # (array<struct> column), so nested = one explode; the struct
        # column keeps the path name so sub-agg fields resolve as
        # `path.field` via Catalyst struct access.
        path = body["path"]
        df = df.where(F.col(path).isNotNull()).withColumn(
            path, F.explode(F.col(path))
        )
        return df, None, None
    elif kind == "reverse_nested":
        # reference: NestedAggregator's reverse_nested — sub-aggs jump
        # back to the parent doc scope: dedupe exploded child rows per
        # (bucket keys, parent id)
        id_field = body.get("id_field", "doc_id")
        df = df.dropDuplicates((keys_so_far or []) + [id_field])
        return df, None, None
    elif kind in ("sampler", "diversified_sampler"):
        # reference: bucket/sampler/SamplerAggregator.java:68 /
        # DiversifiedAggregatorFactory — sub-aggs see only the top
        # shard_size docs by score. Table facade: an explicit sort field
        # stands in for _score (deterministic, documented); diversified
        # additionally caps docs per value of `field` (best-first).
        n = int(body.get("shard_size", 100))
        sort_field = body.get("sort", "doc_id")
        direction = body.get("order", "desc")
        oc = F.desc(sort_field) if direction == "desc" else F.asc(sort_field)
        tie = [F.asc("doc_id")] if "doc_id" in df.columns else []
        if kind == "diversified_sampler":
            fld = body["field"]
            m = int(body.get("max_docs_per_value", 1))
            w = Window.partitionBy(fld).orderBy(oc, *tie)
            df = (
                df.withColumn("_dsr", F.row_number().over(w))
                .where(F.col("_dsr") <= m)
                .drop("_dsr")
            )
        df = df.orderBy(oc, *tie).limit(n)
        return df, None, None
    elif kind == "auto_date_histogram":
        # reference: bucket/histogram/AutoDateHistogramAggregator.java:86
        # — picks the finest interval keeping <= `buckets` buckets.
        # Spark shape: one tiny min/max pre-pass (driver scalar), then a
        # plain date_trunc/floor bucketing — two passes instead of the
        # reference's per-shard adaptive merging, same result.
        fld = body["field"]
        target = int(body.get("buckets", 10))
        row = df.where(F.col(fld).isNotNull()).agg(
            F.min(F.col(fld).cast("timestamp").cast("double")).alias("lo"),
            F.max(F.col(fld).cast("timestamp").cast("double")).alias("hi"),
        ).collect()[0]
        df = df.where(F.col(fld).isNotNull())
        if row["lo"] is None:
            df = df.withColumn(kcol, F.col(fld).cast("timestamp"))
            return df, kcol, None
        span = float(row["hi"]) - float(row["lo"])
        unit, seconds = _pick_auto_interval(span, target)
        if unit in ("month", "quarter", "year"):
            df = df.withColumn(kcol, F.date_trunc(unit, F.col(fld)))
        else:
            epoch = F.col(fld).cast("timestamp").cast("double")
            df = df.withColumn(
                kcol,
                (F.floor(epoch / F.lit(float(seconds))) * F.lit(float(seconds)))
                .cast("timestamp"),
            )
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
            elif skind == "date_histogram":
                iv = (sbody.get("calendar_interval")
                      or sbody.get("fixed_interval") or "1d")
                unit = {"1d": "day", "day": "day", "1h": "hour",
                        "hour": "hour", "1M": "month", "month": "month",
                        "1w": "week", "week": "week", "1y": "year",
                        "year": "year", "minute": "minute",
                        "1m": "minute"}.get(iv, "day")
                cols.append(
                    F.date_format(
                        F.date_trunc(unit, F.col(sbody["field"])),
                        "yyyy-MM-dd HH:mm:ss",
                    )
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


_STR_MAX = "￿" * 8


def _ranges_overlap(ranges: List[dict], numeric: bool) -> bool:
    """True when any two [from, to) ranges intersect, under the SAME
    order Spark will use for the column: numeric columns compare
    numerically, string/date columns lexicographically (chronological
    for ISO-8601). When disjointness can't be proven, returns True —
    the union path is always correct; the when-chain is only an
    optimization for provably disjoint specs."""
    import math

    los: List[Any] = []
    his: List[Any] = []
    for r in ranges:
        frm, to = r.get("from"), r.get("to")
        try:
            if numeric:
                los.append(float(frm) if frm is not None else -math.inf)
                his.append(float(to) if to is not None else math.inf)
            else:
                los.append(str(frm) if frm is not None else "")
                his.append(str(to) if to is not None else _STR_MAX)
        except (TypeError, ValueError):
            return True
    try:
        iv = sorted(zip(los, his))
        return any(iv[i][1] > iv[i + 1][0] for i in range(len(iv) - 1))
    except TypeError:
        return True


def _union_buckets(df: DataFrame, kcol: str,
                   conds: List[Tuple[str, Column]]) -> DataFrame:
    """One filtered frame per bucket, unioned — docs matching several
    buckets appear once per bucket (independent-buckets semantics)."""
    parts = [
        df.where(cond).withColumn(kcol, F.lit(label)) for label, cond in conds
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# auto_date_histogram interval ladder: (calendar unit | None, seconds)
_AUTO_LADDER = [
    ("second", 1), ("second", 5), ("second", 10), ("second", 30),
    ("minute", 60), ("minute", 300), ("minute", 600), ("minute", 1800),
    ("hour", 3600), ("hour", 10800), ("hour", 43200),
    ("day", 86400), ("day", 604800),
    ("month", 2592000), ("quarter", 7776000), ("year", 31536000),
]


def _pick_auto_interval(span_seconds: float, target: int):
    """Finest ladder interval whose bucket count fits the target
    (reference: AutoDateHistogramAggregationBuilder's rounding ladder)."""
    for unit, secs in _AUTO_LADDER:
        if span_seconds / secs + 1 <= target:
            return unit, secs
    return _AUTO_LADDER[-1]


def _significant_text(df: DataFrame, name: str, body: dict) -> DataFrame:
    """significant_text (reference: bucket/terms/
    SignificantTextAggregationBuilder): terms over-represented in a
    FOREGROUND doc set vs the whole frame, scored with the JLH heuristic
    score = (fg% - bg%) * (fg% / bg%). The text column is analyzed with
    the engine's standard-analyzer regex in pure Catalyst
    (regexp_extract_all), doc-deduplicated before counting.

    Body: {"field": text_col, "foreground": SQL predicate, "size": n,
    "min_doc_count": m, "id_field": doc id column (default doc_id)}."""
    from opensearch_spark.analysis.analyzer import JAVA_TOKEN_REGEX

    fld = body["field"]
    pred = body["foreground"]
    size = int(body.get("size", 10))
    mdc = int(body.get("min_doc_count", 3))
    id_field = body.get("id_field", "doc_id")
    kcol = f"key_{name}"

    toks = df.select(
        F.col(id_field).alias("_id"),
        F.expr(pred).alias("_fg"),
        F.explode(
            F.array_distinct(
                F.regexp_extract_all(
                    F.lower(F.col(fld)), F.lit(JAVA_TOKEN_REGEX), F.lit(0)
                )
            )
        ).alias(kcol),
    )
    counts = toks.groupBy(kcol).agg(
        F.count(F.lit(1)).alias("_bg_count"),
        F.sum(F.when(F.col("_fg"), 1).otherwise(0)).alias("doc_count"),
    )
    totals = df.agg(
        F.count(F.lit(1)).alias("_n_bg"),
        F.sum(F.when(F.expr(pred), 1).otherwise(0)).alias("_n_fg"),
    )
    j = counts.crossJoin(F.broadcast(totals))
    fg_pct = F.col("doc_count") / F.col("_n_fg")
    bg_pct = F.col("_bg_count") / F.col("_n_bg")
    heuristic = str(body.get("heuristic", "jlh")).lower()
    if heuristic == "chi_square":
        # reference: heuristic/ChiSquare.java (simplified: no
        # background-superset correction)
        score = (fg_pct - bg_pct) * (fg_pct - bg_pct) / bg_pct
    elif heuristic == "percentage":
        # heuristic/PercentageScore.java
        score = F.col("doc_count") / F.col("_bg_count")
    elif heuristic == "gnd":
        # heuristic/GND.java:95 (backgroundIsSuperset): fx=bg term docs,
        # fy=fg size, fxy=fg term docs, N=bg size;
        # exp(-(max(ln fx, ln fy) - ln fxy) / (ln N - min(ln fx, ln fy)))
        fx = F.col("_bg_count").cast("double")
        fy = F.col("_n_fg").cast("double")
        fxy = F.col("doc_count").cast("double")
        n_all = F.col("_n_bg").cast("double")
        raw = (F.greatest(F.log(fx), F.log(fy)) - F.log(fxy)) / (
            F.log(n_all) - F.least(F.log(fx), F.log(fy)))
        score = (F.when(fxy == 0, F.lit(0.0))
                 .when((fx == fy) & (fx == fxy), F.lit(1.0))
                 .otherwise(F.exp(-raw)))
    else:  # jlh
        score = (fg_pct - bg_pct) * (fg_pct / bg_pct)
    return (
        j.where((F.col("doc_count") >= mdc) & (fg_pct > bg_pct))
        .select(kcol, "doc_count", F.col("_bg_count").alias("bg_count"),
                score.alias("score"))
        .orderBy(F.desc("score"), F.asc(kcol))
        .limit(size)
    )


def _scripted_metric(df: DataFrame, name: str, body: dict) -> DataFrame:
    """scripted_metric (reference: metrics/ScriptedMetricAggregator.java:64):
    init/map/combine/reduce. Painless scripts become Python callables —
    the Spark-first scripting surface; map runs VECTORIZED per Arrow
    batch (mapInPandas), combine produces one partial state per batch,
    reduce folds the partials on the driver (the coordinator-reduce
    analog).

    Body: {"init": () -> state,
           "map_pandas": (state, pdf) -> state,
           "combine": state -> partial   (optional, default identity),
           "reduce": [partial] -> scalar}."""
    import json

    init = body["init"]
    map_pd = body["map_pandas"]
    combine = body.get("combine", lambda s: s)
    reduce_fn = body["reduce"]

    def partials(it):
        state = init()
        for pdf in it:
            state = map_pd(state, pdf)
        yield pd.DataFrame({"j": [json.dumps(combine(state))]})

    parts = [
        json.loads(r["j"])
        for r in df.mapInPandas(partials, "j string").collect()
    ]
    value = reduce_fn(parts)
    spark = df.sparkSession
    return spark.createDataFrame([(float(value),)], f"{name} double")


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
        # Spark's approx_count_distinct is HLL++ too.
        # precision_threshold maps to the register count the reference
        # would pick (m = next pow2 >= 4*threshold, clamped 2^4..2^18)
        # expressed as Spark's rsd = 1.04/sqrt(m).
        if body.get("exact"):
            return [F.countDistinct(c).alias(name)]
        # algorithm="hllpp": the repo's mergeable sketch
        # (opensearch_spark.sketches.hll) — per-partition partials
        # merged register-wise like the reference coordinator; exact at
        # or below precision_threshold (sparse mode). Handled by the
        # caller via hll_cardinality because it is not a Catalyst
        # aggregate expression; reaching here means the caller didn't
        # intercept it, so fall through to approx_count_distinct with
        # the matched precision.
        thr = body.get("precision_threshold")
        if thr:
            import math

            p = min(18, max(4, math.ceil(math.log2(max(int(thr), 1) * 4))))
            rsd = 1.04 / math.sqrt(2 ** p)
            return [F.approx_count_distinct(c, rsd).alias(name)]
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
    if kind == "percentile_ranks":
        # reference: metrics/PercentileRanksAggregationBuilder — the
        # cumulative distribution at each value, as a percentage.
        # Exact here (TDigest is an approximation of exactly this).
        out: List[Column] = []
        for v in body["values"]:
            label = f"{name}_{str(v).replace('.', '_').replace('-', 'm')}"
            out.append(
                (F.avg(F.when(c <= F.lit(v), 1.0)
                       .when(c.isNotNull(), 0.0)) * 100.0).alias(label)
            )
        return out
    if kind == "weighted_avg":
        vf = F.col(body["value"]["field"])
        wf = F.col(body["weight"]["field"])
        return [(F.sum(vf * wf) / F.sum(wf)).alias(name)]
    if kind == "median_absolute_deviation":
        # reference: metrics/MedianAbsoluteDeviationAggregator.java:48
        # — median(|x - median(x)|). The reference approximates both
        # medians with a per-bucket TDigest; here EXACT, with the
        # even-count median as the midpoint average (the documented
        # deterministic variant, mirrored in the DuckDB oracle).
        # State = the bucket's sorted value array — the same
        # per-bucket-state cost model as the reference's digest;
        # identical collect_list subtrees dedupe into ONE aggregate
        # buffer under Catalyst.
        fld = body["field"]
        arr = f"array_sort(collect_list(CAST({fld} AS DOUBLE)))"

        def med(a: str) -> str:
            n = f"size({a})"
            lo = f"try_element_at({a}, CAST(floor(({n}+1)/2) AS INT))"
            hi = f"try_element_at({a}, CAST(floor({n}/2) AS INT)+1)"
            return f"(({lo} + {hi}) / 2.0)"

        dev = f"array_sort(transform({arr}, v -> abs(v - {med(arr)})))"
        # all-null bucket -> empty array; med() would index position 0
        # (INVALID_INDEX_OF_ZERO) — emit null like every other metric
        return [F.expr(
            f"IF(size({arr}) = 0, CAST(NULL AS DOUBLE), {med(dev)})"
        ).alias(name)]
    if kind == "geo_bounds":
        # reference: metrics/GeoBoundsAggregator.java — bounding box of
        # the points (wrap_longitude=false semantics: plain min/max)
        fld = body["field"]
        lat = F.col(f"{fld}.lat").cast("double")
        lon = F.col(f"{fld}.lon").cast("double")
        return [
            F.max(lat).alias(f"{name}_top_left_lat"),
            F.min(lon).alias(f"{name}_top_left_lon"),
            F.min(lat).alias(f"{name}_bottom_right_lat"),
            F.max(lon).alias(f"{name}_bottom_right_lon"),
        ]
    if kind == "geo_centroid":
        # reference: metrics/GeoCentroidAggregator.java:58 — running
        # arithmetic mean of lat/lon plus the point count
        fld = body["field"]
        lat = F.col(f"{fld}.lat").cast("double")
        lon = F.col(f"{fld}.lon").cast("double")
        return [
            F.avg(lat).alias(f"{name}_lat"),
            F.avg(lon).alias(f"{name}_lon"),
            F.count(lat).alias(f"{name}_count"),
        ]
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
        # reference: MovFnPipelineAggregator.java:136 — the window is
        # [i - window + shift, i + shift) over the bucket series, so the
        # DEFAULT (shift=0) EXCLUDES the current bucket; shift=window
        # would be a fully trailing lookahead. An empty window yields
        # null (the reference's NaN).
        window = int(body.get("window", 5))
        shift = int(body.get("shift", 0))
        script = body.get("script", "MovingFunctions.unweightedAvg(values)")
        w = order.rowsBetween(shift - window, shift - 1)
        if "max" in script:
            e = F.max(F.col(path)).over(w)
        elif "min" in script:
            e = F.min(F.col(path)).over(w)
        elif "sum" in script:
            e = F.sum(F.col(path)).over(w)
        else:
            e = F.avg(F.col(path)).over(w)
        return out.withColumn(name, e)
    if kind == "moving_avg":
        # reference: pipeline/MovAvgPipelineAggregator.java with models
        # EwmaModel / HoltLinearModel / SimpleModel / LinearModel
        # (HoltWintersModel.java family). The bucket frame is
        # coordinator-sized; the recursive models run in ONE
        # applyInPandas group over it (the reference also computes these
        # on the coordinator's reduced bucket array).
        window = int(body.get("window", 5))
        model = str(body.get("model", "simple")).lower()
        settings = body.get("settings", {}) or {}
        alpha = float(settings.get("alpha", 0.3))
        beta = float(settings.get("beta", 0.1))
        gamma = float(settings.get("gamma", 0.3))
        period = int(settings.get("period", 1))
        hw_type = str(settings.get("type", "add")).lower()
        hw_pad = bool(settings.get("pad", True))
        src = path

        out_schema = ", ".join(
            f"`{f.name}` {f.dataType.simpleString()}" for f in out.schema.fields
        ) + f", `{name}` double"
        sort_cols = list(key_cols)

        def fn(pdf: "pd.DataFrame") -> "pd.DataFrame":
            pdf = pdf.sort_values(sort_cols).reset_index(drop=True)
            vals = pdf[src].astype(float).tolist()
            res = []
            for i in range(len(vals)):
                w = vals[max(0, i - window + 1): i + 1]
                if model == "ewma":
                    avg = None
                    for v in w:
                        avg = v if avg is None else alpha * v + (1 - alpha) * avg
                    res.append(avg)
                elif model == "holt":
                    s = b = None
                    for j, v in enumerate(w):
                        if j == 0:
                            s, b = v, 0.0
                        else:
                            last_s = s
                            s = alpha * v + (1 - alpha) * (s + b)
                            b = beta * (s - last_s) + (1 - beta) * b
                    res.append(s)
                elif model == "holt_winters":
                    # reference: pipeline/HoltWintersModel.java — triple
                    # exponential smoothing, additive (default) or
                    # multiplicative seasonality (settings.type); needs
                    # >= 2 full periods in the window (the reference
                    # also emits no value until enough buckets
                    # accumulate). One-step-ahead forecast. The
                    # multiplicative branch applies the reference's
                    # `pad` offset to dodge zero-division on
                    # zero-valued buckets.
                    p = period
                    if len(w) < 2 * p:
                        res.append(None)
                        continue
                    mult = hw_type.startswith("mult")
                    vals_w = [v + 1e-10 for v in w] if (mult and hw_pad) else w
                    s = sum(vals_w[:p]) / p
                    b = sum((vals_w[j + p] - vals_w[j]) / p
                            for j in range(p)) / p
                    if mult:
                        seasonal = [vals_w[j] / s for j in range(p)]
                    else:
                        seasonal = [vals_w[j] - s for j in range(p)]
                    seasonal += [0.0] * (len(vals_w) - p)
                    last_s, last_b = s, b
                    for j in range(p, len(vals_w)):
                        if mult:
                            s_ = (alpha * (vals_w[j] / seasonal[j - p])
                                  + (1 - alpha) * (last_s + last_b))
                            seasonal[j] = (gamma * (vals_w[j] / (last_s + last_b))
                                           + (1 - gamma) * seasonal[j - p])
                        else:
                            s_ = (alpha * (vals_w[j] - seasonal[j - p])
                                  + (1 - alpha) * (last_s + last_b))
                            seasonal[j] = (gamma * (vals_w[j] - (last_s + last_b))
                                           + (1 - gamma) * seasonal[j - p])
                        b_ = beta * (s_ - last_s) + (1 - beta) * last_b
                        last_s, last_b = s_, b_
                    sea = seasonal[len(vals_w) - p]
                    if mult:
                        res.append((last_s + last_b) * sea)
                    else:
                        res.append(last_s + last_b + sea)
                elif model == "linear":
                    num = sum((j + 1) * v for j, v in enumerate(w))
                    den = sum(range(1, len(w) + 1))
                    res.append(num / den)
                else:  # simple
                    res.append(sum(w) / len(w))
            pdf[name] = res
            return pdf

        return out.groupBy(F.lit(1).alias("_g")).applyInPandas(
            lambda _k, pdf: fn(pdf.drop(columns=["_g"], errors="ignore")), out_schema
        ).orderBy(*[F.asc(c) for c in key_cols])
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
    if kind == "extended_stats_bucket":
        # reference: pipeline/ExtendedStatsBucketPipelineAggregator —
        # stats_bucket plus POPULATION variance/std_dev and the
        # sigma-scaled bounds
        sigma = float(body.get("sigma", 2.0))
        whole = Window.orderBy(F.lit(1)).rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
        avg = F.avg(F.col(path)).over(whole)
        sd = F.coalesce(F.stddev_pop(F.col(path)).over(whole), F.lit(0.0))
        return (
            out.withColumn(f"{name}_avg", avg)
            .withColumn(f"{name}_sum", F.sum(F.col(path)).over(whole))
            .withColumn(f"{name}_min", F.min(F.col(path)).over(whole))
            .withColumn(f"{name}_max", F.max(F.col(path)).over(whole))
            .withColumn(f"{name}_count", F.count(F.col(path)).over(whole))
            .withColumn(f"{name}_variance",
                        F.coalesce(F.var_pop(F.col(path)).over(whole),
                                   F.lit(0.0)))
            .withColumn(f"{name}_std_deviation", sd)
            .withColumn(f"{name}_upper", avg + F.lit(sigma) * sd)
            .withColumn(f"{name}_lower", avg - F.lit(sigma) * sd)
        )
    if kind == "percentiles_bucket":
        # reference: pipeline/PercentilesBucketPipelineAggregator.java:94
        # — nearest-rank, NOT interpolated: sort the sibling buckets'
        # values and select data[round(p/100 * (n-1))] (Java Math.round
        # = floor(x + 0.5)). collect_list skips nulls == gap_policy skip.
        percents = body.get("percents", [1.0, 5.0, 25.0, 50.0, 75.0,
                                         95.0, 99.0])
        whole = Window.orderBy(F.lit(1)).rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
        srt = F.array_sort(F.collect_list(F.col(path)).over(whole))
        n = F.size(srt)
        for p in percents:
            col = f"{name}_p{format(float(p), 'g').replace('.', '_')}"
            idx = F.floor(F.lit(float(p) / 100.0) * (n - F.lit(1)).cast("double")
                          + F.lit(0.5)).cast("int")
            out = out.withColumn(
                col, F.element_at(srt, idx + F.lit(1)).cast("double")
            )
        return out
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
