"""Deduplication operators for training-data pipelines.

All four families are implemented as pure Catalyst plans (no Python UDFs)
so they scale: the LSH plans are the standard shingle -> signature ->
band -> bucket-join shuffles, with the verify step an equi-join on bucket
keys rather than a cross join.

Portability contract with the DuckDB oracles: every hash is derived from
``md5`` hex strings (min over hex strings is a valid MinHash because md5
is uniform), so Spark and the oracle compute bit-identical results.

Scale notes (100 TB):
- exact dedup: one groupBy on sha2(text) — map-side partial agg, AQE
  handles skew (identical boilerplate docs -> hot hash).
- MinHash-LSH: shingling explodes ~L rows/doc, the signature groupBy is
  the big shuffle (key = doc), the band bucket-join shuffles only
  (doc, band_key) pairs; candidate verification joins shingle sets only
  for bucket-colliding pairs. This is the textbook plan that avoids the
  O(n^2) cross join.
- SimHash: one groupBy(doc) with 32 conditional sums; near-dup lookup
  (simhash_pairs) is a band self-join over the signature (4 x 8-bit
  bands), verified by exact bit_count(xor) Hamming distance.

``near_dup_corpus`` unions the input with truncated copies of itself
(deterministic) so dedup queries have real near-duplicates to find in the
synthetic test tables.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

N_MINHASH = 8          # minhash permutations
BAND_SIZE = 2          # -> 4 bands
JACCARD_THRESHOLD = 0.35
SHIFT_ID = 1_000_000   # synthetic near-dup doc_id offset


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))


def near_dup_corpus(docs: DataFrame) -> DataFrame:
    """documents ∪ truncated copies (first 3/4 of the words, doc_id+1e6).

    Base docs with doc_id >= SHIFT_ID are excluded: they would collide
    with a shifted copy's id, and doc_id uniqueness is load-bearing for
    every consumer since _shingles dedups map-side per row (same guard
    as textstats.contamination)."""
    docs = docs.where(F.col("doc_id") < SHIFT_ID)
    trunc = docs.select(
        (F.col("doc_id") + SHIFT_ID).alias("doc_id"),
        F.expr(
            "array_join(slice(split(text, ' '), 1,"
            " greatest(1, (size(split(text, ' ')) * 3) div 4)), ' ')"
        ).alias("text"),
    )
    return docs.select("doc_id", "text").unionByName(trunc)


def exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: canonical representative (min doc_id) per content hash."""
    d = _docs(spark, sf_dir)
    return (
        d.groupBy(F.sha2(F.col("text"), 256).alias("text_sha"))
        .agg(F.min("doc_id").alias("rep_doc_id"), F.count("*").alias("n_copies"))
    )


def _shingles(df: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, shingle) distinct word n-grams. Docs shorter than ``n``
    words contribute no shingles — guarded explicitly because
    ``sequence(1, 0)`` is DESCENDING in Spark ([1, 0]), which would feed
    ``slice(words, 0, n)`` and abort the whole job with
    INVALID_PARAMETER_VALUE.START."""
    # per-doc dedup happens MAP-SIDE (array_distinct before the explode):
    # doc_id is unique per input row, so this equals a global
    # (doc_id, shingle) distinct without the Exchange a .distinct()
    # would add — one shuffle saved for every downstream consumer.
    return df.select(
        "doc_id",
        F.explode(
            F.expr(
                f"CASE WHEN size(split(text,' ')) < {n} THEN array()"
                f" ELSE array_distinct("
                f"  transform(sequence(1, size(split(text,' ')) - {n - 1}),"
                f"  i -> array_join(slice(split(text,' '), i, {n}), ' '))) END"
            )
        ).alias("shingle"),
    )


def _signatures(sh: DataFrame) -> DataFrame:
    """(doc_id, h0..h7) minhash signature: min md5 hex per seeded hash."""
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}|"), F.col("shingle")))).alias(f"h{i}")
        for i in range(N_MINHASH)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def _minhash_pairs_of(d: DataFrame, key_cols: tuple = ()) -> DataFrame:
    """MinHash+LSH near-dup pairs of a (doc_id, text[, *key_cols]) frame,
    verified with exact shingle Jaccard >= threshold. When ``key_cols``
    are given the band join additionally requires key equality (pairs
    stay within the same bucket — used to route hot n-gram-Jaccard
    buckets through the linear LSH plan). Returns (a, b, jaccard)."""
    sh = _shingles(d).cache()
    sig = _signatures(sh)
    if key_cols:
        sig = sig.join(d.select("doc_id", *key_cols), "doc_id")

    bands = None
    n_bands = N_MINHASH // BAND_SIZE
    for bi in range(n_bands):
        cols = [F.col(f"h{bi * BAND_SIZE + j}") for j in range(BAND_SIZE)]
        b = sig.select(
            "doc_id",
            *key_cols,
            F.lit(bi).alias("band"),
            F.md5(F.concat(*cols)).alias("band_key"),
        )
        bands = b if bands is None else bands.unionByName(b)

    a = bands.alias("a")
    b = bands.alias("b")
    cond = (
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.band_key") == F.col("b.band_key"))
        & (F.col("a.doc_id") < F.col("b.doc_id"))
    )
    for kc in key_cols:
        cond = cond & (F.col(f"a.{kc}") == F.col(f"b.{kc}"))
    cand = (
        a.join(b, cond)
        .select(F.col("a.doc_id").alias("a"), F.col("b.doc_id").alias("b"))
        .distinct()
    )

    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    sa = sh.select(F.col("doc_id").alias("a"), "shingle")
    sb = sh.select(F.col("doc_id").alias("b"), "shingle")
    shared = (
        cand.join(sa, "a").join(sb, ["b", "shingle"])
        .groupBy("a", "b").agg(F.count("*").alias("inter"))
    )
    out = (
        shared.join(sizes.withColumnRenamed("doc_id", "a").withColumnRenamed("sz", "sza"), "a")
        .join(sizes.withColumnRenamed("doc_id", "b").withColumnRenamed("sz", "szb"), "b")
        .select(
            "a", "b",
            F.round(
                F.col("inter") / (F.col("sza") + F.col("szb") - F.col("inter")), 4
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= JACCARD_THRESHOLD)
    )
    return out


def minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup pairs over the near-dup corpus, verified with
    exact shingle Jaccard >= threshold. Returns (a, b, jaccard)."""
    return _minhash_pairs_of(near_dup_corpus(_docs(spark, sf_dir)))


def simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash per doc from whitespace tokens.

    Bit j comes from the top bit of the j-th hex digit of each token's md5
    (portable between Spark and DuckDB); bit set when the +-1 sum > 0.
    Returns (doc_id, simhash:long)."""
    return _simhash_of(_docs(spark, sf_dir))


def _simhash_of(d: DataFrame) -> DataFrame:
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("term")).where(
        F.col("term") != ""
    )
    tok = tok.withColumn("h", F.md5("term"))
    aggs = [
        F.sum(
            F.when(F.substring("h", j + 1, 1).rlike("[89a-f]"), 1).otherwise(-1)
        ).alias(f"s{j}")
        for j in range(32)
    ]
    sums = tok.groupBy("doc_id").agg(*aggs)
    expr = " + ".join(f"shiftleft(CAST(s{j} > 0 AS LONG), {j})" for j in range(32))
    return sums.select("doc_id", F.expr(expr).alias("simhash"))


SIMHASH_BAND_BITS = 8      # 4 bands of 8 bits over the 32-bit signature
SIMHASH_MAX_HAMMING = 6
# hot-band skew guard: a band bucket of 5k docs is ~2.5*10^7 join pairs,
# the most a single straggler task should carry (same sizing logic as
# NGRAM_MAX_BUCKET_DOCS below)
SIMHASH_MAX_BAND_DOCS = 5_000


def _simhash_bands_of(sig: DataFrame) -> DataFrame:
    n_bands = 32 // SIMHASH_BAND_BITS
    bands = None
    for bi in range(n_bands):
        b = sig.select(
            "doc_id", "simhash",
            F.lit(bi).alias("band"),
            F.shiftright(F.col("simhash"), bi * SIMHASH_BAND_BITS)
            .bitwiseAND(F.lit((1 << SIMHASH_BAND_BITS) - 1))
            .alias("band_key"),
        )
        bands = b if bands is None else bands.unionByName(b)
    return bands


def simhash_band_accounting(spark: SparkSession, sf_dir: str,
                            max_band_docs: int = SIMHASH_MAX_BAND_DOCS,
                            ) -> DataFrame:
    """(band, band_key, n_docs, cut) — explicit coverage accounting for
    the simhash hot-band guard: which band buckets the band self-join
    handles and which are cut (re-covered by identical-signature
    grouping only). The honest version of a silent cap, mirroring
    ``ngram_bucket_accounting``."""
    bands = _simhash_bands_of(_simhash_of(near_dup_corpus(_docs(spark, sf_dir))))
    return (
        bands.groupBy("band", "band_key")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .select("band", "band_key", "n_docs",
                (F.col("n_docs") > max_band_docs).alias("cut"))
    )


def simhash_pairs(spark: SparkSession, sf_dir: str,
                  max_hamming: int = SIMHASH_MAX_HAMMING,
                  max_band_docs: int | None = SIMHASH_MAX_BAND_DOCS,
                  ) -> DataFrame:
    """SimHash near-dup lookup over the near-dup corpus: band self-join
    (4 bands x 8 bits — any pair within Hamming distance 3 shares a band
    by pigeonhole; wider distances are best-effort, standard SimHash
    practice), verified by exact Hamming distance <= ``max_hamming``.
    Bucket-join only — no all-pairs cross join. Returns (a, b, hamming).

    Hot-band skew guard (ON by default): the band self-join is
    quadratic in bucket size, so a pathological corpus where one band
    value dominates (e.g. boilerplate driving a signature byte to a
    constant) goes quadratic on one task. Band buckets above
    ``max_band_docs`` are cut from the self-join; their docs are
    re-covered by identical-full-signature grouping (Hamming 0 — a
    linear groupBy), and the cut is reported by
    ``simhash_band_accounting``. Pairs inside a cut band that differ in
    the other bands remain reachable through those bands, so only pairs
    whose EVERY shared band is hot lose recall — the same accounted
    trade the n-gram guard makes. Pass ``max_band_docs=None`` to
    disable."""
    return _simhash_pairs_of(
        _simhash_of(near_dup_corpus(_docs(spark, sf_dir))),
        max_hamming, max_band_docs)


def _simhash_pairs_of(sig: DataFrame, max_hamming: int,
                      max_band_docs: int | None) -> DataFrame:
    bands = _simhash_bands_of(sig)
    recovered = None
    if max_band_docs is not None:
        counts = bands.groupBy("band", "band_key").agg(
            F.count(F.lit(1)).alias("n_docs_"))
        hot = counts.where(F.col("n_docs_") > max_band_docs).select(
            "band", "band_key")
        # hot buckets are FEW by construction (each is > max_band_docs
        # docs), so the anti/semi joins broadcast
        hot_docs = (
            bands.join(F.broadcast(hot), ["band", "band_key"], "left_semi")
            .select("doc_id", "simhash").distinct()
        )
        bands = bands.join(F.broadcast(hot), ["band", "band_key"],
                           "left_anti")
        ha = hot_docs.alias("a")
        hb = hot_docs.alias("b")
        recovered = (
            ha.join(hb, (F.col("a.simhash") == F.col("b.simhash"))
                    & (F.col("a.doc_id") < F.col("b.doc_id")))
            .select(F.col("a.doc_id").alias("a"),
                    F.col("b.doc_id").alias("b"),
                    F.col("a.simhash").alias("sha_"),
                    F.col("b.simhash").alias("shb_"))
        )
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("a"), F.col("b.doc_id").alias("b"),
            F.col("a.simhash").alias("sha_"), F.col("b.simhash").alias("shb_"),
        )
    )
    if recovered is not None:
        cand = cand.unionByName(recovered)
    return (
        cand.distinct()
        .select(
            "a", "b",
            F.expr("bit_count(sha_ ^ shb_)").cast("long").alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
    )


# quadratic-bucket skew guard default: a 10k-doc bucket is ~10^8 shingle
# join pairs — the largest a single straggler task should ever carry.
NGRAM_MAX_BUCKET_DOCS = 10_000


def ngram_bucket_accounting(spark: SparkSession, sf_dir: str,
                            max_bucket_docs: int = NGRAM_MAX_BUCKET_DOCS) -> DataFrame:
    """(source, n_docs, routed_to_lsh) — explicit coverage accounting for
    the skew guard: which buckets the exact quadratic path handles and
    which get routed through MinHash-LSH."""
    d = _ngram_corpus(spark, sf_dir)
    return (
        d.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
        .select(
            "source", "n_docs",
            (F.col("n_docs") > max_bucket_docs).alias("routed_to_lsh"),
        )
    )


def _ngram_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    raw = _docs(spark, sf_dir)
    return near_dup_corpus(raw).join(
        raw.select(
            F.col("doc_id").alias("orig_id"), F.col("source")
        ),
        F.pmod(F.col("doc_id"), F.lit(SHIFT_ID)) == F.col("orig_id"),
    ).select("doc_id", "text", "source")


def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str,
                        max_bucket_docs: int | None = NGRAM_MAX_BUCKET_DOCS,
                        route_dropped: bool = True) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs within same-source buckets of
    the near-dup corpus (bucketed to avoid the full cross join).
    Returns (a, b, jaccard) above threshold.

    Skew guard (ON by default): the shingle equi-join is quadratic in
    bucket size, so a hot source (boilerplate mirrored 10x) dominates
    the job. Buckets above ``max_bucket_docs`` are cut from the exact
    path and — with ``route_dropped`` — re-covered by same-source
    MinHash-LSH (linear in bucket size; recall bounded by the band
    collision probability instead of exact). ``ngram_bucket_accounting``
    reports which buckets took which path, so coverage is explicit
    rather than silently truncated."""
    d = _ngram_corpus(spark, sf_dir)
    d_hot = None
    if max_bucket_docs is not None:
        counts = d.groupBy("source").agg(F.count(F.lit(1)).alias("_bn"))
        ok = counts.where(F.col("_bn") <= max_bucket_docs).select("source")
        d_all = d
        d = d.join(F.broadcast(ok), "source")
        if route_dropped:
            hot = counts.where(F.col("_bn") > max_bucket_docs).select("source")
            d_hot = d_all.join(F.broadcast(hot), "source")
    sh = _shingles(d, n=3)
    src = d.select("doc_id", "source")
    sh = sh.join(src, "doc_id")
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a = sh.select(F.col("doc_id").alias("a"), "shingle", F.col("source").alias("src"))
    b = sh.select(F.col("doc_id").alias("b"), "shingle", F.col("source").alias("src"))
    shared = (
        a.join(b, ["shingle", "src"])
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("inter"))
    )
    out = (
        shared.join(sizes.withColumnRenamed("doc_id", "a").withColumnRenamed("sz", "sza"), "a")
        .join(sizes.withColumnRenamed("doc_id", "b").withColumnRenamed("sz", "szb"), "b")
        .select(
            "a", "b",
            F.round(F.col("inter") / (F.col("sza") + F.col("szb") - F.col("inter")), 4).alias(
                "jaccard"
            ),
        )
        .where(F.col("jaccard") >= JACCARD_THRESHOLD)
    )
    if d_hot is not None:
        out = out.unionByName(
            _minhash_pairs_of(d_hot, key_cols=("source",)).select("a", "b", "jaccard")
        )
    return out


DUP_NGRAM_N = 5
DUP_NGRAM_MIN_DOCS = 2
DUP_NGRAM_TOP = 100


def dup_ngram_inventory(spark: SparkSession, sf_dir: str,
                        n: int = DUP_NGRAM_N,
                        min_docs: int = DUP_NGRAM_MIN_DOCS,
                        top: int = DUP_NGRAM_TOP) -> DataFrame:
    """Corpus-level boilerplate inventory (the discovery step behind
    substring-level dedup, Lee et al. 2021 "Deduplicating Training
    Data"): the word ``n``-grams that appear in at least ``min_docs``
    DISTINCT documents of the near-dup corpus, ranked by document
    frequency.

    Plan: one shingle explode (already distinct per doc) + one
    map-side-combining groupBy + TakeOrderedAndProject — a single
    shuffle keyed on the shingle. At 100 TB hot boilerplate shingles
    are exactly the skewed keys AQE's partial aggregation absorbs
    (each mapper emits one row per (shingle) regardless of its local
    count). Deterministic tie-break: doc_count desc, shingle asc."""
    d = near_dup_corpus(_docs(spark, sf_dir).select("doc_id", "text"))
    return (
        _shingles(d, n=n)
        .groupBy("shingle")
        .agg(F.count("*").alias("doc_count"))
        .where(F.col("doc_count") >= min_docs)
        .orderBy(F.desc("doc_count"), F.asc("shingle"))
        .limit(top)
    )


LINE_DEDUP_MIN_DOCS = 2
LINE_WORDS = 10


def line_dedup(df: DataFrame, min_dup_docs: int = LINE_DEDUP_MIN_DOCS,
               line_col: str = "lines") -> DataFrame:
    """CCNet-style line-level boilerplate removal (Wenzek et al. 2020
    §4.1: drop lines duplicated across documents — headers, nav bars,
    cookie banners — before doc-level dedup). Input: (doc_id,
    ``line_col``: array<string>). A line is boilerplate when it occurs
    in >= ``min_dup_docs`` DISTINCT docs.

    Returns (doc_id, n_lines, n_removed, cleaned_md5) where cleaned_md5
    hashes the surviving lines joined by newline, original order kept.

    Plan shape for 100 TB: posexplode -> groupBy(line) with map-side
    partial countDistinct -> shuffle join back on line -> one
    groupBy(doc_id) reassembly. Hot boilerplate lines are high-df keys
    on the AGG side (absorbed by partial aggregation) but NOT skewed on
    the join side (the join key count per line equals its occurrence
    count — exactly the rows that must meet anyway)."""
    lines = df.select(
        "doc_id", F.posexplode(F.col(line_col)).alias("pos", "line")
    )
    stats = lines.groupBy("line").agg(
        F.countDistinct("doc_id").alias("ndocs"))
    j = lines.join(stats, "line").withColumn(
        "dup", F.col("ndocs") >= F.lit(int(min_dup_docs)))
    kept_sorted = F.expr(
        "transform(array_sort(collect_list(IF(NOT dup, "
        "struct(pos, line), NULL))), s -> s.line)"
    )
    return (
        j.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_lines"),
            F.sum(F.when(F.col("dup"), 1).otherwise(0)).alias("n_removed"),
            F.md5(F.concat_ws("\n", kept_sorted)).alias("cleaned_md5"),
        )
    )


def _chunk_lines(n_words: int = LINE_WORDS):
    """Deterministic 'lines' for the newline-free synthetic corpus:
    consecutive ``n_words``-word chunks (same arithmetic in the DuckDB
    oracle). Guarded: sequence(a, b) is DESCENDING when b < a."""
    return F.expr(
        f"CASE WHEN size(split(text, ' ')) = 0 THEN array()"
        f" ELSE transform("
        f"  sequence(0, CAST(ceil(size(split(text, ' ')) / {n_words}.0) AS INT) - 1),"
        f"  i -> array_join(slice(split(text, ' '), i * {n_words} + 1, {n_words}), ' ')) END"
    )


def line_dedup_demo(spark: SparkSession, sf_dir: str,
                    min_dup_docs: int = LINE_DEDUP_MIN_DOCS) -> DataFrame:
    """Certification entry: line_dedup over the near-dup corpus with
    10-word chunks as lines (the corpus has no real newlines; truncated
    copies share aligned chunks, so the duplicated 'lines' are exactly
    the copied prefixes)."""
    d = near_dup_corpus(_docs(spark, sf_dir).select("doc_id", "text"))
    return line_dedup(
        d.select("doc_id", _chunk_lines().alias("lines")),
        min_dup_docs=min_dup_docs,
    )


# ---------------------------------------------------------------------------
# Near-duplicate CLUSTER resolution: candidate pairs -> connected
# components -> one canonical representative per cluster. This is the
# step a training-data pipeline runs AFTER pair generation (MinHash-LSH
# gives edges; transitivity means "keep one per connected component",
# the RefinedWeb / SlimPajama recipe). The reference exposes the same
# capability through dedup-by-fingerprint ingest + collapse-by-field
# serving (server/src/main/java/org/opensearch/search/collapse/
# CollapseContext.java); here it is a first-class batch operator.
# ---------------------------------------------------------------------------

CC_MAX_ITER = 25


def connected_components(edges: DataFrame, a: str = "a", b: str = "b",
                         max_iter: int = CC_MAX_ITER) -> DataFrame:
    """Resolve undirected ``edges`` into connected components.

    Returns ``(id, rep)`` for every node appearing in an edge, where
    ``rep`` is the smallest node id reachable from ``id`` — the
    canonical cluster representative.

    Algorithm: iterative min-label propagation with pointer jumping.
    Each round every node takes ``min(label, min(labels of neighbors))``
    and then compresses one pointer hop (``label := label(label)``).
    The hop makes convergence logarithmic in the longest chain
    (plain propagation is linear in graph diameter — the difference
    between 3 and 300 rounds on a pathological chain), the same
    doubling idea as the alternating-star MapReduce algorithm
    (Kiveris et al., "Connected Components in MapReduce and Beyond").

    Scale notes (100 TB):
    - the edge set (the big frame) is hash-partitioned ONCE on ``d`` —
      the per-round neighbor-join key — and localCheckpoint preserves
      that layout, so each round only shuffles the node-sized label
      frame (to ``d`` for the join, to ``s`` for the min, to ``rep``
      for the pointer jump); the edges never move again. Nothing is
      collected to the driver except the 1-row convergence count.
    - lineage is truncated every round with ``localCheckpoint`` —
      REQUIRED for iterative DataFrame loops (an unchecked loop builds
      a plan tree that grows exponentially with rounds and stalls the
      optimizer long before the cluster does any work). On a real
      cluster prefer ``spark.sparkContext.setCheckpointDir`` +
      ``.checkpoint()`` so recovery does not depend on executor
      storage.
    - dedup graphs are overwhelmingly tiny stars (a doc and its
      near-copies), so the loop exits after 2-3 rounds; ``max_iter``
      is a hard failure bound, not the expected cost.
    """
    sym = edges.select(F.col(a).alias("s"), F.col(b).alias("d")).unionByName(
        edges.select(F.col(b).alias("s"), F.col(a).alias("d"))
    )
    sym = sym.repartition("d").localCheckpoint(eager=True)
    lab = (
        sym.select(F.col("s").alias("id")).distinct()
        .select("id", F.col("id").alias("rep"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        nbr = (
            sym.join(lab.withColumnRenamed("id", "d"), "d")
            .groupBy(F.col("s").alias("id"))
            .agg(F.min("rep").alias("nrep"))
        )
        new = lab.join(nbr, "id", "left").select(
            "id", F.least("rep", F.coalesce("nrep", "rep")).alias("rep")
        )
        # pointer jump: rep := rep(rep). Every label is itself a node id
        # (labels are mins over node ids), so the lookup always hits.
        ptr = new.select(F.col("id").alias("rep"), F.col("rep").alias("rep2"))
        new = (
            new.join(ptr, "rep")
            .select("id", F.col("rep2").alias("rep"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new.join(lab.withColumnRenamed("rep", "old"), "id")
            .where(F.col("rep") != F.col("old"))
            .limit(1).count()
        )
        lab = new
        if changed == 0:
            return lab
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds"
    )


def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup cluster resolution over the near-dup corpus: MinHash-LSH
    verified pairs -> connected components -> ``(doc_id, rep_id,
    is_rep)``. Docs with no near-duplicate produce no row (they are
    trivially their own representative); ``is_rep = false`` rows are
    exactly the documents a keep-one-per-cluster pass drops."""
    pairs = minhash_lsh_pairs(spark, sf_dir)
    cc = connected_components(pairs.select("a", "b"))
    return cc.select(
        F.col("id").alias("doc_id"),
        F.col("rep").alias("rep_id"),
        (F.col("rep") == F.col("id")).alias("is_rep"),
    )
