"""Deterministic stratified sampling for training-data mixture control.

Large-scale pretraining pipelines re-weight domains (upsample books,
downsample boilerplate web) before tokenization. The operator here is a
DETERMINISTIC per-row Bernoulli keyed on a stable hash of the row id, so
- the sample is reproducible across runs / cluster sizes / partitionings
  (no RNG state, no ``sample()`` seed-per-partition nondeterminism),
- membership is decidable row-locally: one scan, zero shuffles, and the
  filter pushes all the way into the parquet scan of any downstream job.

Mechanics: the first 8 hex chars of ``md5(id ':' seed)`` are compared
lexicographically against ``printf('%08x', frac * 2^32)``. Lowercase hex
sorts like the number it encodes, so the string comparison IS the
uniform-[0,1) threshold test — and md5 gives the identical stream in
Spark, DuckDB, and Python (the cross-engine invariant the oracles rely
on throughout this repo).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

# certification mixture over the 20 uniform testdata sources: keep all
# of src0-4, half of src5-9, a quarter of src10-14, a tenth of src15-19
DOMAIN_MIX = {
    **{f"src{i}": 1.0 for i in range(5)},
    **{f"src{i}": 0.5 for i in range(5, 10)},
    **{f"src{i}": 0.25 for i in range(10, 15)},
    **{f"src{i}": 0.1 for i in range(15, 20)},
}
DOMAIN_MIX_SEED = 42


def frac_hex_threshold(frac: float) -> str:
    """8-hex-digit threshold t with P[substr(md5,1,8) < t] == frac."""
    return format(min(int(frac * (1 << 32)), (1 << 32) - 1), "08x")


def u8_expr(id_col: str, seed: int):
    """The uniform-[0,1) key: first 8 hex chars of md5(id ':' seed).
    The ONE definition of the membership hash — stratified_sample tests
    it and domain_mix reports it, so they cannot desynchronize."""
    return F.substring(
        F.md5(F.concat(F.col(id_col).cast("string"),
                       F.lit(":"), F.lit(str(seed)))), 1, 8)


def stratified_sample(df: DataFrame, fractions: dict[str, float],
                      id_col: str = "doc_id", strata_col: str = "source",
                      seed: int = DOMAIN_MIX_SEED) -> DataFrame:
    """Keep each row of stratum ``s`` with probability ``fractions[s]``
    (strata absent from the dict are dropped), deterministically in the
    row id. Thresholds are query-time literals folded into one codegen
    comparison per stratum — no join, no shuffle, no Python."""
    u = u8_expr(id_col, seed)
    cond = F.lit(False)
    for s, frac in sorted(fractions.items()):
        keep = F.col(strata_col) == s
        if frac < 1.0:
            # frac >= 1.0 keeps the whole stratum unconditionally — a
            # hex threshold of 'ffffffff' would silently drop rows whose
            # hash prefix is exactly 'ffffffff' (1 in 2^32: invisible in
            # tests, ~25 rows per 100 B docs)
            keep = keep & (u < F.lit(frac_hex_threshold(frac)))
        cond = cond | keep
    return df.where(cond)


def domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Certification entry: the DOMAIN_MIX mixture over documents;
    returns the selected (doc_id, source) pairs plus per-row u8 hash so
    the oracle check pins the exact membership rule, not just counts."""
    d = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    return stratified_sample(d, DOMAIN_MIX).select(
        "doc_id", "source",
        u8_expr("doc_id", DOMAIN_MIX_SEED).alias("u8"),
    )


CURATION_SAMPLE_FRAC = 0.5


def curation_funnel(spark: SparkSession, sf_dir: str,
                    sample_frac: float = CURATION_SAMPLE_FRAC,
                    seed: int = DOMAIN_MIX_SEED) -> DataFrame:
    """The composed pretraining-data curation funnel in ONE Spark plan —
    quality filter -> exact-dedup keep-one -> deterministic hash sample
    (the C4/RefinedWeb funnel shape). Each stage is a certified
    primitive (t_quality, d_exact_dedup, p_domain_mix); this entry
    certifies that they COMPOSE without materialization barriers.

    Plan shape (100 TB): ONE scan, ONE shuffle. The quality predicate
    is inlined as map-side column exprs (the same exprs t_quality
    certifies — no self-join against a second documents scan), the
    keep-one is a row_number window partitioned by sha2 (equivalent to
    the min-doc_id representative, without groupBy + join-back), and
    the sample threshold is a codegen comparison. The sample runs
    AFTER keep-one by design: filtering earlier would change which
    representative survives (the rep must be chosen over the full
    population)."""
    from pyspark.sql import Window

    d = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    words = F.split(F.col("text"), " ")
    n_tok = F.size(F.filter(words, lambda w: w != F.lit("")))
    quality_ok = (n_tok >= 20) & (
        F.length("text") / F.greatest(n_tok, F.lit(1)) <= 12)
    good = (
        d.select("doc_id", "source", "text", n_tok.alias("n_tokens"))
        .where(quality_ok)
    )
    w = Window.partitionBy(F.sha2(F.col("text"), 256)).orderBy("doc_id")
    kept = (
        good.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
    )
    u = u8_expr("doc_id", seed)
    return (
        kept.where(u < F.lit(frac_hex_threshold(sample_frac)))
        .select("doc_id", "source",
                F.col("n_tokens").cast("long").alias("n_tokens"))
    )
