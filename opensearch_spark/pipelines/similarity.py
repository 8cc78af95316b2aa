"""Similarity search over embedding columns.

- ``cosine_scores``: brute-force cosine of every vector vs a query vector
  (the exact baseline). Per-row work is a JVM-side higher-order-function
  fold (zip_with + aggregate) — no Python in the loop.
- ``lsh_buckets`` / ``lsh_ann``: random-hyperplane LSH — the scale path.
  Hyperplane signs are derived from md5 hex digits so the DuckDB oracle
  reproduces them bit-identically. Signatures are computed as a single
  map-only projection (literal sign arrays folded against the vector —
  no explode, no join, ZERO shuffles), and the ANN path computes exact
  cosine only on the bucket-colliding candidates, never the full table.
- ``ivf_assign`` / ``ivf_ann``: IVF coarse quantizer + nprobe search.
  Assignment is a map-only argmax over literal centroid vectors (no
  window shuffle); ``materialize_ivf`` writes the assignment partitioned
  by centroid so a 100 TB deployment prunes the scan to ~nprobe/K of
  the corpus; the re-rank joins candidates FIRST and computes cosine on
  the joined (small) frame only.

Scale notes: brute force is one scan, embarrassingly parallel, no
shuffle. LSH bucketing and IVF assignment are now map-only (one scan,
no shuffle at all). The ANN query paths are: candidate selection
(broadcast join on bucket/probed centroid — partition-prunable when the
assignment table is materialized with partitionBy) -> exact cosine on
candidates only. That is the textbook inverted-file plan; nothing
touches the full corpus except the one pruned scan.
"""

from __future__ import annotations

import hashlib
import os
from typing import List

from pyspark.sql import DataFrame, SparkSession, functions as F

N_PLANES = 8


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))


def _as_double(col: str = "embedding"):
    return F.transform(F.col(col), lambda x: x.cast("double"))


def _dot(vc, qc) -> "F.Column":
    """Sequential left-to-right fold — the one float association order
    every caller (and the DuckDB oracle rounding) agrees on."""
    return F.aggregate(
        F.zip_with(vc, qc, lambda a, b: a * b), F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(c) -> "F.Column":
    return F.sqrt(
        F.aggregate(F.transform(c, lambda x: x * x), F.lit(0.0),
                    lambda acc, x: acc + x)
    )


def _pair_cosine(vc, cc) -> "F.Column":
    return _dot(vc, cc) / (_norm(vc) * _norm(cc))


def cosine_scores(spark: SparkSession, sf_dir: str, query_vec_id: int = 0) -> DataFrame:
    """All vectors' cosine similarity vs the query vector (brute force)."""
    e = _emb(spark, sf_dir).select("vec_id", _as_double().alias("v"))
    q = e.where(F.col("vec_id") == query_vec_id).select(F.col("v").alias("qv"))
    return (
        e.crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.round(_pair_cosine(F.col("v"), F.col("qv")), 5).alias("cosine"),
        )
    )


def _plane_signs_py(dims: int) -> List[List[float]]:
    """Per-plane sign vectors ±1 from md5('plane|<p>|<d>') hex digit —
    computed driver-side (hashlib == Spark md5 == DuckDB md5 on the
    same string) so the signatures need no join at all."""
    out = []
    for p in range(N_PLANES):
        row = []
        for d in range(dims):
            h = hashlib.md5(f"plane|{p}|{d}".encode()).hexdigest()[0]
            row.append(1.0 if h in "89abcdef" else -1.0)
        out.append(row)
    return out


def _with_buckets(e: DataFrame, dims: int) -> DataFrame:
    """(vec_id, v, bucket) in ONE map-only projection: each plane's
    projection is a fold of v against a literal sign array; the bucket
    is the sign bitmap. No explode, no join, no shuffle."""
    signs = _plane_signs_py(dims)
    bucket = None
    for p in range(N_PLANES):
        proj = _dot(F.col("v"), F.array(*[F.lit(s) for s in signs[p]]))
        bit = (
            F.when(proj > 0, F.lit(1 << p).cast("long"))
            .otherwise(F.lit(0).cast("long"))
        )
        bucket = bit if bucket is None else bucket + bit
    return e.select("vec_id", "v", bucket.alias("bucket"))


def _dims(e: DataFrame) -> int:
    return len(e.select("v").first()["v"])


def lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane signature bucket per vector: (vec_id, bucket)."""
    e = _emb(spark, sf_dir).select("vec_id", _as_double().alias("v"))
    return _with_buckets(e, _dims(e)).select("vec_id", "bucket")


def lsh_ann(spark: SparkSession, sf_dir: str, query_vec_id: int = 0) -> DataFrame:
    """ANN candidates: vectors sharing the query's LSH bucket, with their
    exact cosine. The cosine is computed ONLY on the candidates — the
    bucket join runs below the cosine projection, so the plan scans the
    corpus once for signatures and re-ranks ~n/2^planes rows, never the
    full table."""
    e = _emb(spark, sf_dir).select("vec_id", _as_double().alias("v"))
    bw = _with_buckets(e, _dims(e))
    q = bw.where(F.col("vec_id") == query_vec_id).select(
        F.col("v").alias("qv"), F.col("bucket").alias("qbucket")
    )
    cand = bw.join(F.broadcast(q), F.col("bucket") == F.col("qbucket"))
    return cand.select(
        "vec_id",
        "bucket",
        F.round(_pair_cosine(F.col("v"), F.col("qv")), 5).alias("cosine"),
    )


EMBED_DUP_SHIFT = 1_000_000
EMBED_DUP_THRESHOLD = 0.9


def embedding_dup_corpus(e: DataFrame) -> DataFrame:
    """embeddings ∪ deterministic near-copies (v + 0.15·reverse(v),
    vec_id + EMBED_DUP_SHIFT) — planted near-duplicates so the
    embedding-dedup operator has real positives in the synthetic
    tables (the text pipeline's near_dup_corpus pattern)."""
    pert = e.select(
        (F.col("vec_id") + EMBED_DUP_SHIFT).alias("vec_id"),
        F.zip_with("v", F.reverse("v"),
                   lambda a, b: a + F.lit(0.15) * b).alias("v"),
    )
    return e.unionByName(pert)


def embedding_dup_pairs(spark: SparkSession, sf_dir: str,
                        threshold: float = EMBED_DUP_THRESHOLD) -> DataFrame:
    """Embedding-cosine near-duplicate pairs over the planted near-dup
    corpus: candidates = vectors sharing an LSH bucket (signature is the
    map-only fold — one shuffle on (bucket)), verified by exact cosine
    >= threshold computed ONLY on bucket-colliding pairs. The embedding
    analog of MinHash-LSH text dedup: no all-pairs join ever
    materializes; recall is bounded by the band-collision probability
    (more planes/bands at scale), precision is exact."""
    e = _emb(spark, sf_dir).select("vec_id", _as_double().alias("v"))
    nd = embedding_dup_corpus(e)
    bw = _with_buckets(nd, _dims(e))
    a = bw.select(F.col("vec_id").alias("a"), F.col("v").alias("va"),
                  "bucket")
    b = bw.select(F.col("vec_id").alias("b"), F.col("v").alias("vb"),
                  "bucket")
    pairs = a.join(b, "bucket").where(F.col("a") < F.col("b"))
    return (
        pairs.select(
            "a", "b",
            F.round(_pair_cosine(F.col("va"), F.col("vb")), 5).alias("cosine"),
        )
        .where(F.col("cosine") >= F.lit(float(threshold)))
    )


def _semdedup_frame(nd: DataFrame, cents: List[tuple], threshold: float,
                    max_cluster_docs: int | None) -> DataFrame:
    """Core SemDeDup accounting over an already-assigned-able frame
    ``nd`` = (vec_id, v) and literal centroids ``cents``. Returns
    (centroid, n_vectors, n_dropped, cut) ordered by centroid.

    Hot-cluster guard (cut-and-account, same contract as the simhash /
    n-gram dedup guards): the within-cluster cosine self-join is
    quadratic in cluster size, so clusters above ``max_cluster_docs``
    are CUT from the pairwise join and re-covered by exact-identity
    grouping only (identical vectors are cosine-1 duplicates — a linear
    groupBy), with the cut reported in the output so coverage loss is
    explicit, never silent. Pass ``max_cluster_docs=None`` to disable.
    """
    assigned = _assign_with_v(nd, cents)
    sizes = assigned.groupBy("centroid").agg(
        F.count(F.lit(1)).alias("n_vectors"))
    cap = max_cluster_docs if max_cluster_docs is not None else (1 << 62)
    flags = sizes.select(
        "centroid", "n_vectors",
        (F.col("n_vectors") > F.lit(int(cap))).alias("cut"))
    cold = assigned.join(
        F.broadcast(flags.where(~F.col("cut")).select("centroid")),
        "centroid")
    a = cold.select(F.col("vec_id").alias("a"), F.col("v").alias("va"),
                    "centroid")
    b = cold.select(F.col("vec_id").alias("b"), F.col("v").alias("vb"),
                    "centroid")
    pairs = (
        a.join(b, "centroid").where(F.col("a") < F.col("b"))
        .select(
            "centroid", "b",
            F.round(_pair_cosine(F.col("va"), F.col("vb")), 5).alias("cosine"),
        )
        .where(F.col("cosine") >= F.lit(float(threshold)))
    )
    pair_drops = (
        pairs.select("centroid", "b").distinct()
        .groupBy("centroid").agg(F.count(F.lit(1)).alias("_pd"))
    )
    hot = assigned.join(
        F.broadcast(flags.where(F.col("cut")).select("centroid")), "centroid")
    ident_drops = (
        hot.groupBy("centroid", "v").agg(F.count(F.lit(1)).alias("_n"))
        .groupBy("centroid")
        .agg(F.sum(F.col("_n") - F.lit(1)).alias("_id"))
    )
    return (
        flags
        .join(pair_drops, "centroid", "left")
        .join(ident_drops, "centroid", "left")
        .select(
            "centroid", "n_vectors",
            F.when(F.col("cut"), F.coalesce(F.col("_id"), F.lit(0)))
            .otherwise(F.coalesce(F.col("_pd"), F.lit(0)))
            .cast("long").alias("n_dropped"),
            "cut",
        )
        .orderBy("centroid")
    )


_DEFAULT_CAP = object()  # sentinel: None must mean DISABLE, not default


def semdedup(spark: SparkSession, sf_dir: str,
             threshold: float = EMBED_DUP_THRESHOLD,
             n_centroids: int | None = None,
             max_cluster_docs=_DEFAULT_CAP,
             lloyd_iters: int = 0) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    "SemDeDup: Data-efficient learning at web-scale through semantic
    deduplication", arXiv:2303.09540): cluster the embeddings with the
    deterministic IVF coarse quantizer, compute cosine pairs ONLY
    within each cluster, and drop every vector that has a
    more-canonical (lower-id) semantic duplicate in its cluster.
    Returns per-cluster accounting (centroid, n_vectors, n_dropped,
    cut).

    Scale knobs (the paper scales K with the corpus — 50k clusters at
    100M docs, §3): ``n_centroids`` sets K (default
    ``N_IVF_CENTROIDS``); ``max_cluster_docs`` (default
    ``SEMDEDUP_MAX_CLUSTER_DOCS``; pass ``None`` explicitly to DISABLE
    the guard — review r5 fixed None being swallowed into the default)
    is the hot-cluster cut-and-account
    guard — see ``_semdedup_frame``; ``lloyd_iters`` optionally refines
    the seed centroids with k-means iterations that keep the SAME plan
    shape (literal/broadcast centroids -> map-side argmax -> k-row mean
    collect, the coordinator-reduce pattern). The oracle-certified row
    uses lloyd_iters=0 so DuckDB reproduces assignments exactly. Runs
    over the planted near-dup corpus so true positives exist at test
    scale."""
    e = _emb(spark, sf_dir).select("vec_id", _as_double().alias("v"))
    nd = embedding_dup_corpus(e)
    k = n_centroids if n_centroids is not None else N_IVF_CENTROIDS
    cap = (SEMDEDUP_MAX_CLUSTER_DOCS if max_cluster_docs is _DEFAULT_CAP
           else max_cluster_docs)
    cents = _centroid_vecs(e, k)
    if lloyd_iters:
        cents = _lloyd_centroids(nd, cents, lloyd_iters)
    return _semdedup_frame(nd, cents, threshold, cap)


def _lloyd_centroids(nd: DataFrame, cents: List[tuple],
                     iters: int) -> List[tuple]:
    """Refine literal centroids with Lloyd iterations, preserving the
    map-only assignment plan: each iteration is one argmax scan plus a
    k-row per-centroid mean agg collected to the driver (KB-sized —
    the coordinator-reduce pattern, same as the sketch aggs). Empty
    clusters keep their previous centroid."""
    dims = len(cents[0][1])
    for _ in range(int(iters)):
        a = _assign_with_v(nd, cents)
        rows = (
            a.groupBy("centroid")
            .agg(*[F.avg(F.col("v")[i]).alias(f"c{i}") for i in range(dims)])
            .collect()
        )
        means = {int(r["centroid"]): [float(r[f"c{i}"]) for i in range(dims)]
                 for r in rows}
        cents = [(cid, means.get(cid, cv)) for cid, cv in cents]
    return cents


N_IVF_CENTROIDS = 8
IVF_NPROBE = 2
# Within-cluster pairwise work is quadratic in cluster size; 5k docs is
# ~1.25e7 pairs — the most one straggler task should carry (same sizing
# logic as SIMHASH_MAX_BAND_DOCS / NGRAM_MAX_BUCKET_DOCS).
SEMDEDUP_MAX_CLUSTER_DOCS = 5_000


def _assign_with_v(e: DataFrame, cents: List[tuple]) -> DataFrame:
    """(vec_id, v, centroid): nearest centroid by cosine, ties (cosine
    desc, centroid id asc) on 8-dp rounding — map-only argmax via struct
    array_min, no window, no shuffle. ``cents`` = [(centroid_id, vec)];
    labels are the centroids' TRUE ids (they must agree with the probe
    selection's id space even when seed vec_ids are non-contiguous)."""
    pairs = F.array(*[
        F.struct(
            (F.lit(0.0) - F.round(
                _pair_cosine(F.col("v"), F.array(*[F.lit(x) for x in cv])), 8
            )).alias("ncs"),
            F.lit(int(cid)).cast("long").alias("centroid"),
        )
        for cid, cv in cents
    ])
    return e.select(
        "vec_id", "v", F.array_min(pairs)["centroid"].alias("centroid")
    )


def _centroid_vecs(e: DataFrame, k: int | None = None) -> List[tuple]:
    rows = (
        e.where(F.col("vec_id") < (k if k is not None else N_IVF_CENTROIDS))
        .select("vec_id", "v").orderBy("vec_id").collect()
    )
    return [(int(r["vec_id"]), list(r["v"])) for r in rows]


def ivf_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF coarse quantizer: (vec_id, centroid) = nearest of K fixed seed
    centroids (the embeddings of vec_id 0..K-1) by cosine. Deterministic
    seed-init variant of k-means — zero Lloyd iterations so the DuckDB
    oracle reproduces assignments exactly; at scale you'd run a few
    iterations with the SAME plan shape (literal/broadcast centroids ->
    map-side argmax -> mean recompute). Ties broken by (cosine desc,
    centroid asc) on 8-dp-rounded similarity."""
    e = _emb(spark, sf_dir).select("vec_id", _as_double().alias("v"))
    return _assign_with_v(e, _centroid_vecs(e)).select("vec_id", "centroid")


def materialize_ivf(spark: SparkSession, sf_dir: str, out_dir: str) -> str:
    """Write the IVF assignment (vec_id, centroid, v) partitioned by
    centroid — the pre-built inverted file. Queries that pass this as
    ``assign_dir`` get parquet partition pruning: only the probed
    centroids' directories are read (~nprobe/K of the corpus)."""
    e = _emb(spark, sf_dir).select("vec_id", _as_double().alias("v"))
    (
        _assign_with_v(e, _centroid_vecs(e))
        .write.mode("overwrite").partitionBy("centroid").parquet(out_dir)
    )
    return out_dir


def ivf_ann(spark: SparkSession, sf_dir: str, query_vec_id: int = 0,
            nprobe: int = IVF_NPROBE, assign_dir: str | None = None) -> DataFrame:
    """IVF ANN: probe the ``nprobe`` centroids nearest to the query,
    re-rank their posting lists by exact cosine. Candidates are selected
    FIRST (probe filter on the assignment, partition-pruned when
    ``assign_dir`` points at a ``materialize_ivf`` output) and cosine is
    computed only on the candidate rows — never the full corpus."""
    from pyspark.sql import Window

    e = _emb(spark, sf_dir).select("vec_id", _as_double().alias("v"))
    q = e.where(F.col("vec_id") == query_vec_id).select(F.col("v").alias("qv"))
    cents = (
        e.where(F.col("vec_id") < N_IVF_CENTROIDS)
        .select(F.col("vec_id").alias("centroid"), F.col("v").alias("cv"))
    )
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
    if assign_dir is not None:
        assign = spark.read.parquet(assign_dir).select(
            "vec_id", "v", F.col("centroid").cast("long").alias("centroid")
        )
    else:
        assign = _assign_with_v(e, _centroid_vecs(e))
    cand = assign.join(F.broadcast(probes), "centroid")
    return cand.crossJoin(F.broadcast(q)).select(
        "vec_id",
        "centroid",
        F.round(_pair_cosine(F.col("v"), F.col("qv")), 5).alias("cosine"),
    )
