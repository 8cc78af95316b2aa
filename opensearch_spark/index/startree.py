"""Star-tree composite index: pre-aggregated datacube for fast aggs.

Reference: ``server/src/main/java/org/opensearch/index/compositeindex/
datacube/startree/`` — OpenSearch's star-tree index pre-computes metric
aggregations along configured dimension combinations at index time; a
query whose dims/metrics are covered reads the tiny pre-aggregated
structure instead of scanning documents. The "star" node means "this
dimension aggregated away".

Spark re-expression: ``df.cube(dims)`` IS the star-tree lattice — every
grouping-set row is one star-tree node, ``grouping_id()`` encodes which
dimensions are starred. The cube is materialized once to parquet,
partitioned by grouping_id, so a query slice:

  - prunes to exactly ONE partition (the grouping set it needs),
  - reads pre-aggregated rows (cardinality = product of the grouped
    dims' cardinalities, not the corpus size),
  - re-aggregates nothing for sum/count/min/max (they are decomposable;
    avg = sum/count at read time).

At 100 TB the cube build is one shuffle over the fact table (Catalyst
expands grouping sets with partial aggregation map-side), and serving
reads kilobytes. This is the same trade the reference makes: index-time
cost for query-time O(nodes) instead of O(docs).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F

# metric aggregations the star-tree pre-computes (reference:
# startree/aggregators/MetricAggregatorInfo — sum/min/max/count/avg,
# avg derived as sum/count)
_SUPPORTED = ("sum", "min", "max")


def build_star_tree(df: DataFrame, dims: Sequence[str],
                    metrics: Sequence[str], out_dir: str) -> str:
    """Materialize the star-tree cube of ``df``: every grouping set of
    ``dims`` with sum/min/max per metric column plus doc_count.
    Partitioned by grouping_id so query slices prune to one directory."""
    aggs = [F.count(F.lit(1)).alias("doc_count")]
    for m in metrics:
        aggs.append(F.sum(m).alias(f"sum_{m}"))
        aggs.append(F.min(m).alias(f"min_{m}"))
        aggs.append(F.max(m).alias(f"max_{m}"))
        # non-null value count per metric: avg must divide by THIS, not
        # doc_count, or null metric rows deflate the served average
        aggs.append(F.count(F.col(m)).alias(f"cnt_{m}"))
    cube = df.cube(*[F.col(d) for d in dims]).agg(
        F.grouping_id().alias("gid"), *aggs
    )
    cube.write.mode("overwrite").partitionBy("gid").parquet(out_dir)
    return out_dir


def _gid_for(dims: Sequence[str], concrete: Sequence[str]) -> int:
    """grouping_id of the grouping set where exactly ``concrete`` dims
    are kept: bit i (MSB-first over ``dims``) is 1 when the dim is
    aggregated away (the star)."""
    gid = 0
    for i, d in enumerate(dims):
        if d not in concrete:
            gid |= 1 << (len(dims) - 1 - i)
    return gid


def star_tree_agg(spark: SparkSession, tree_dir: str, dims: Sequence[str],
                  group_by: Sequence[str], metrics: Dict[str, str],
                  filters: Optional[Dict[str, object]] = None) -> DataFrame:
    """Answer ``groupBy(group_by).agg(metrics)`` (with optional equality
    ``filters`` on other dims) FROM the pre-aggregated cube.

    ``metrics``: output column -> "sum_<col>" / "min_<col>" /
    "max_<col>" / "doc_count" / "avg_<col>" (avg derives as
    sum/count — only valid when no re-aggregation is needed, i.e. the
    slice's grouping set matches group_by+filters exactly, which this
    function guarantees by construction).

    The plan is a scan of ONE gid partition + a projection — no shuffle,
    no touch of the fact table."""
    filters = filters or {}
    concrete = list(group_by) + list(filters)
    gid = _gid_for(dims, concrete)
    df = spark.read.parquet(tree_dir).where(F.col("gid") == gid)
    for d, v in filters.items():
        df = df.where(F.col(d) == F.lit(v))
    cols: List = [F.col(d) for d in group_by]
    for out_name, src in metrics.items():
        if src == "doc_count":
            cols.append(F.col("doc_count").alias(out_name))
        elif src.startswith("avg_"):
            m = src[4:]
            cols.append((F.col(f"sum_{m}") / F.col(f"cnt_{m}")).alias(out_name))
        else:
            cols.append(F.col(src).alias(out_name))
    return df.select(*cols)


def star_tree_covers(dims: Sequence[str], metrics: Sequence[str],
                     group_by: Sequence[str],
                     wanted_metrics: Sequence[str]) -> bool:
    """Would this star-tree answer the query? (the reference's
    query-resolution check: dims superset + metrics available)."""
    if not set(group_by) <= set(dims):
        return False
    for w in wanted_metrics:
        if w == "doc_count":
            continue
        kind, _, col = w.partition("_")
        if kind == "avg":
            if col not in metrics:
                return False
        elif kind in _SUPPORTED:
            if col not in metrics:
                return False
        else:
            return False
    return True
