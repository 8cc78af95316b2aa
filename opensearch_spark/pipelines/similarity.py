"""Similarity search over embedding columns.

- ``cosine_scores``: brute-force cosine of every vector vs a query vector
  (the exact baseline). Per-row work is a JVM-side higher-order-function
  fold (zip_with + aggregate) — no Python in the loop.
- ``lsh_buckets`` / ``lsh_ann``: random-hyperplane LSH — the scale path.
  Hyperplane signs are derived from md5 hex digits so the DuckDB oracle
  reproduces them bit-identically. At 100 TB the bucket join replaces the
  O(n) scan per query with a lookup of ~n/2^bits candidates.

Scale notes: brute force is one scan, embarrassingly parallel, no
shuffle; the LSH variant shuffles (vec_id, bucket) pairs once. For a
1000-executor deployment you'd pre-materialize the bucket table
(bucketBy on bucket id) so queries prune to matching buckets only.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

N_PLANES = 8


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))


def _as_double(col: str = "embedding"):
    return F.transform(F.col(col), lambda x: x.cast("double"))


def cosine_scores(spark: SparkSession, sf_dir: str, query_vec_id: int = 0) -> DataFrame:
    """All vectors' cosine similarity vs the query vector (brute force)."""
    e = _emb(spark, sf_dir).select("vec_id", _as_double().alias("v"))
    q = e.where(F.col("vec_id") == query_vec_id).select(F.col("v").alias("qv"))
    dot = F.aggregate(
        F.zip_with("v", "qv", lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(F.transform(c, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x)
    )
    return (
        e.crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.round(dot / (norm(F.col("v")) * norm(F.col("qv"))), 5).alias("cosine"),
        )
    )


def _plane_signs(spark: SparkSession, dims: int) -> DataFrame:
    """(plane, dim, sign ±1) derived from md5('plane|<p>|<d>') hex digit."""
    planes = spark.range(N_PLANES).select(F.col("id").alias("plane"))
    dcol = spark.range(dims).select(F.col("id").alias("dim"))
    return planes.crossJoin(dcol).select(
        "plane",
        "dim",
        F.when(
            F.substring(
                F.md5(F.concat(F.lit("plane|"), F.col("plane").cast("string"),
                               F.lit("|"), F.col("dim").cast("string"))),
                1, 1,
            ).rlike("[89a-f]"),
            1.0,
        ).otherwise(-1.0).alias("sign"),
    )


def lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane signature bucket per vector: (vec_id, bucket)."""
    e = _emb(spark, sf_dir).select("vec_id", _as_double().alias("v"))
    dims = len(e.select("v").first()["v"])
    comp = e.select("vec_id", F.posexplode("v").alias("dim", "x"))
    planes = _plane_signs(spark, dims)
    proj = (
        comp.join(F.broadcast(planes), "dim")
        .groupBy("vec_id", "plane")
        .agg(F.sum(F.col("x") * F.col("sign")).alias("proj"))
    )
    return (
        proj.groupBy("vec_id")
        .agg(
            F.sum(
                F.expr("shiftleft(CAST(proj > 0 AS LONG), CAST(plane AS INT))")
            ).alias("bucket")
        )
    )


N_IVF_CENTROIDS = 8
IVF_NPROBE = 2


def _pair_cosine(vc, cc) -> "F.Column":
    dot = F.aggregate(
        F.zip_with(vc, cc, lambda a, b: a * b), F.lit(0.0),
        lambda acc, x: acc + x,
    )
    n = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(F.transform(c, lambda x: x * x), F.lit(0.0),
                    lambda acc, x: acc + x)
    )
    return dot / (n(vc) * n(cc))


def ivf_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF coarse quantizer: (vec_id, centroid) = nearest of K fixed seed
    centroids (the embeddings of vec_id 0..K-1) by cosine. Deterministic
    seed-init variant of k-means — zero Lloyd iterations so the DuckDB
    oracle reproduces assignments exactly; at scale you'd run a few
    iterations with the SAME plan shape (broadcast centroids -> argmax
    join -> mean recompute). Ties broken by (cosine desc, centroid asc)
    on 8-dp-rounded similarity."""
    e = _emb(spark, sf_dir).select("vec_id", _as_double().alias("v"))
    cents = (
        e.where(F.col("vec_id") < N_IVF_CENTROIDS)
        .select(F.col("vec_id").alias("centroid"), F.col("v").alias("cv"))
    )
    from pyspark.sql import Window

    scored = e.crossJoin(F.broadcast(cents)).select(
        "vec_id", "centroid",
        F.round(_pair_cosine(F.col("v"), F.col("cv")), 8).alias("_cs"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("_cs"), F.asc("centroid"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("vec_id", "centroid")
    )


def ivf_ann(spark: SparkSession, sf_dir: str, query_vec_id: int = 0,
            nprobe: int = IVF_NPROBE) -> DataFrame:
    """IVF-style ANN: probe the ``nprobe`` centroids nearest to the query,
    re-rank their posting lists by exact cosine. The scale path
    pre-materializes ``ivf_assign`` partitioned by centroid so a query
    scans ~nprobe/K of the corpus instead of all of it."""
    assign = ivf_assign(spark, sf_dir)
    e = _emb(spark, sf_dir).select("vec_id", _as_double().alias("v"))
    q = e.where(F.col("vec_id") == query_vec_id).select(F.col("v").alias("qv"))
    cents = (
        e.where(F.col("vec_id") < N_IVF_CENTROIDS)
        .select(F.col("vec_id").alias("centroid"), F.col("v").alias("cv"))
    )
    from pyspark.sql import Window

    probes = (
        cents.crossJoin(F.broadcast(q))
        .select(
            "centroid",
            F.round(_pair_cosine(F.col("cv"), F.col("qv")), 8).alias("_cs"),
        )
        .withColumn(
            "_rn",
            F.row_number().over(Window.orderBy(F.desc("_cs"), F.asc("centroid"))),
        )
        .where(F.col("_rn") <= nprobe)
        .select("centroid")
    )
    cos = cosine_scores(spark, sf_dir, query_vec_id)
    return (
        assign.join(F.broadcast(probes), "centroid")
        .join(cos, "vec_id")
        .select("vec_id", "centroid", "cosine")
    )


def lsh_ann(spark: SparkSession, sf_dir: str, query_vec_id: int = 0) -> DataFrame:
    """ANN candidates: vectors sharing the query's LSH bucket, with their
    exact cosine (re-ranking step)."""
    b = lsh_buckets(spark, sf_dir)
    qb = b.where(F.col("vec_id") == query_vec_id).select(F.col("bucket").alias("qbucket"))
    cand = b.join(F.broadcast(qb), F.col("bucket") == F.col("qbucket")).select(
        "vec_id", "bucket"
    )
    cos = cosine_scores(spark, sf_dir, query_vec_id)
    return cand.join(cos, "vec_id").select("vec_id", "bucket", "cosine")
