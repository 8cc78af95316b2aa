"""Text-analysis operators for training-data pipelines: quality scoring,
language-ID heuristic, token counting, document fingerprinting.

All pure Catalyst expressions (whole-stage codegen; no UDFs), each with a
DuckDB oracle in pipelines/oracles.py.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

# tiny marker lexicons for the language-ID heuristic (token-overlap score;
# a real deployment would use char-ngram profiles — same plan shape)
LANG_MARKERS = {
    "en": ["the", "a", "and", "of", "fast", "slow", "big", "small"],
    "de": ["der", "die", "das", "und", "schnell"],
    "fr": ["le", "la", "et", "vite"],
    "es": ["el", "la", "y", "rapido"],
    "zh": ["de5", "he2"],
}

STOPWORDS = ["the", "a", "and", "of", "in", "to"]


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))


def quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc quality features: token count, mean word length, stopword
    ratio, alpha ratio, and a composite quality flag (heuristics in the
    style of C4/Gopher filtering rules)."""
    d = _docs(spark, sf_dir)
    words = F.split(F.col("text"), " ")
    n_tok = F.size(F.filter(words, lambda w: w != F.lit("")))
    sw_lit = ",".join(STOPWORDS)
    return d.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        F.length("text").alias("n_chars_computed"),
        F.round(
            (F.length("text") - n_tok + 1) / F.greatest(n_tok, F.lit(1)), 4
        ).alias("mean_word_len"),
        F.round(
            F.size(F.filter(words, lambda w: w.isin(*STOPWORDS)))
            / F.greatest(n_tok, F.lit(1)).cast("double"),
            4,
        ).alias("stopword_ratio"),
        (
            (n_tok >= 20)
            & (F.length("text") / F.greatest(n_tok, F.lit(1)) <= 12)
        ).cast("int").alias("quality_ok"),
    )


def language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-token language scores + argmax prediction ('und' when no
    marker hits). Deterministic tie-break: higher score, then language
    code ascending."""
    d = _docs(spark, sf_dir)
    words = F.split(F.col("text"), " ")
    scores = []
    for lang, markers in sorted(LANG_MARKERS.items()):
        scores.append(
            F.size(F.filter(words, lambda w: w.isin(*markers))).alias(f"score_{lang}")
        )
    scored = d.select("doc_id", *scores)
    # argmax via greatest + chained when (ascending lang order = tiebreak)
    langs = sorted(LANG_MARKERS)
    best = F.greatest(*[F.col(f"score_{l}") for l in langs])
    pred = F.lit("und")
    for l in reversed(langs):
        pred = F.when((best > 0) & (F.col(f"score_{l}") == best), l).otherwise(pred)
    return scored.select("doc_id", *[f"score_{l}" for l in langs], pred.alias("pred_lang"))


def token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting three ways: whitespace split, analyzer-style regex
    token count, and a BPE-ish length estimate (ceil(chars/4))."""
    d = _docs(spark, sf_dir)
    words = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.size(F.filter(words, lambda w: w != F.lit(""))).alias("ws_tokens"),
        F.size(F.expr(r"regexp_extract_all(lower(text), '[\\p{L}\\p{N}_]+', 0)")).alias(
            "regex_tokens"
        ),
        F.ceil(F.length("text") / 4).cast("long").alias("bpe_estimate"),
    )


def fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OpenSearch fingerprint-analyzer semantics: lowercase, split, dedup,
    sort, join with single space, hash (reference: the `fingerprint`
    ingest processor / analyzer)."""
    d = _docs(spark, sf_dir)
    canon = F.array_join(
        F.array_sort(F.array_distinct(F.split(F.lower(F.col("text")), " "))), " "
    )
    return d.select(
        "doc_id",
        F.md5(canon).alias("fingerprint"),
        F.sha2(F.col("text"), 256).alias("content_sha"),
    )


PROBE_NGRAM_N = 5
PROBE_DOC_MOD = 100


def contamination(spark: SparkSession, sf_dir: str,
                  n: int = PROBE_NGRAM_N,
                  probe_mod: int = PROBE_DOC_MOD) -> DataFrame:
    """Benchmark-contamination check over the near-dup corpus: which
    documents contain any probe n-gram (training-data hygiene — detect
    eval-set text inside a training corpus before fine-tuning).

    Probe set = the first ``n``-gram of every doc with
    ``doc_id % probe_mod == 0`` (the stand-in benchmark). A document is
    contaminated when any probe appears among its word ``n``-grams.
    Plan: one shingle explode + a BROADCAST join against the tiny probe
    set + one groupBy(doc) — at 100 TB the probe set (a benchmark's
    worth of n-grams) always fits in a broadcast, so the check costs one
    corpus scan, no all-pairs anything. Returns (doc_id,
    n_probe_hits) for contaminated docs."""
    from opensearch_spark.pipelines.dedup import _shingles, near_dup_corpus

    d = near_dup_corpus(_docs(spark, sf_dir).select("doc_id", "text"))
    probes = (
        d.where(
            (F.pmod(F.col("doc_id"), F.lit(probe_mod)) == 0)
            & (F.size(F.split("text", " ")) >= n)
            & (F.col("doc_id") < 1_000_000)
        )
        .select(
            F.expr(
                f"array_join(slice(split(text, ' '), 1, {n}), ' ')"
            ).alias("shingle")
        )
        .distinct()
    )
    sh = _shingles(d, n=n)
    return (
        sh.join(F.broadcast(probes), "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_probe_hits"))
    )
