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


def repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition features (Rae et al. 2021 §A1.1: filter
    docs dominated by repeated words / n-grams). Per document:

    - ``distinct_word_frac``: unique words / words
    - ``top_word_frac``: multiplicity of the most frequent word / words
      (computed as the longest run in the SORTED word array — a pure
      Catalyst ``aggregate`` fold, no explode, no shuffle)
    - ``dup_2gram_frac`` / ``dup_3gram_frac``: fraction of word n-grams
      that are repeats of an earlier n-gram (1 - distinct/total)

    Everything is per-row whole-stage-codegen arithmetic: at 100 TB this
    is a single scan with zero shuffles and zero Python."""
    d = _docs(spark, sf_dir)
    words = F.filter(F.split(F.col("text"), " "), lambda w: w != F.lit(""))
    d = d.select("doc_id", words.alias("w"), F.size(words).alias("n"))
    n = F.col("n")

    def grams(k: int):
        # n-gram array; guarded: sequence(1, 0) is DESCENDING in Spark,
        # so short docs must short-circuit to an empty array
        joined = " , ' ', ".join(
            f"element_at(w, i + {j})" for j in range(k)
        )
        e = F.expr(
            f"transform(sequence(1, size(w) - {k - 1}), "
            f"i -> concat({joined}))"
        )
        return F.when(n >= F.lit(k), e).otherwise(
            F.array().cast("array<string>")
        )
    top_run = F.expr(
        "aggregate(array_sort(w), "
        "named_struct('prev', '', 'run', 0L, 'best', 0L), "
        "(s, x) -> named_struct("
        "  'prev', x, "
        "  'run', IF(x = s.prev, s.run + 1, 1L), "
        "  'best', greatest(s.best, IF(x = s.prev, s.run + 1, 1L))), "
        "s -> s.best)"
    )
    g2, g3 = grams(2), grams(3)
    nz = F.greatest(F.col("n"), F.lit(1)).cast("double")
    return d.select(
        "doc_id",
        F.col("n").alias("n_tokens"),
        F.round(F.size(F.array_distinct("w")) / nz, 4).alias(
            "distinct_word_frac"),
        F.round(top_run / nz, 4).alias("top_word_frac"),
        F.round(
            F.when(F.size(g2) > 0,
                   F.lit(1.0) - F.size(F.array_distinct(g2))
                   / F.size(g2).cast("double")).otherwise(0.0), 4
        ).alias("dup_2gram_frac"),
        F.round(
            F.when(F.size(g3) > 0,
                   F.lit(1.0) - F.size(F.array_distinct(g3))
                   / F.size(g3).cast("double")).otherwise(0.0), 4
        ).alias("dup_3gram_frac"),
    )


# PII patterns: identical semantics under Java regex (Spark) and RE2
# (DuckDB oracle) — no backrefs, no lookaround.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE_RE = r"\b555-0[0-9]{1,3}\b"
PII_IP_RE = r"\b10\.0\.[0-9]{1,3}\.[0-9]{1,3}\b"


def pii_redact(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Scrub PII-shaped spans (emails / NANP-555 phone numbers / RFC1918
    IPs) from ``text_col``: adds match counts and a ``redacted`` column
    with each span replaced by a typed placeholder. Pure Catalyst
    ``regexp_count`` / ``regexp_replace`` — one scan, no shuffle, no
    Python; the patterns are the operator's contract, swap in stricter
    ones for production."""
    c = F.col(text_col)
    red = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(c, PII_EMAIL_RE, "[EMAIL]"),
            PII_PHONE_RE, "[PHONE]"),
        PII_IP_RE, "[IP]")
    return df.withColumns({
        "n_emails": F.regexp_count(c, F.lit(PII_EMAIL_RE)),
        "n_phones": F.regexp_count(c, F.lit(PII_PHONE_RE)),
        "n_ips": F.regexp_count(c, F.lit(PII_IP_RE)),
        "redacted": red,
    })


def pii_scrub_demo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Certification wrapper for :func:`pii_redact`: the corpus text is
    synthetic word soup with no real PII, so a deterministic PII-laden
    prefix (email + phone + IP derived from doc_id/source) is prepended
    first; the redactor must find exactly those three spans per doc and
    leave the rest of the text byte-identical."""
    d = _docs(spark, sf_dir)
    synth = F.concat(
        F.lit("contact user"), F.col("doc_id").cast("string"),
        F.lit("@"), F.col("source"), F.lit(".net tel 555-0"),
        F.pmod(F.col("doc_id"), F.lit(100)).cast("string"),
        F.lit(" ip 10.0."),
        F.pmod(F.col("doc_id"), F.lit(256)).cast("string"),
        F.lit(".7 "), F.col("text"),
    )
    out = pii_redact(d.select("doc_id", synth.alias("text")))
    return out.select(
        "doc_id", "n_emails", "n_phones", "n_ips",
        F.md5("redacted").alias("redacted_md5"),
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
