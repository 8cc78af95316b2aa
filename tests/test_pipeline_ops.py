"""Behavioral tests for the training-data pipeline operators added in
round 3: repetition signals, PII redaction, stratified domain mixing,
and the duplicated-n-gram inventory. The oracle-parity replica covers
the registered queries; these tests pin the operator semantics on
crafted inputs."""

import pytest
from pyspark.sql import functions as F

from opensearch_spark.pipelines.sampling import (
    DOMAIN_MIX_SEED, frac_hex_threshold, stratified_sample,
)
from opensearch_spark.pipelines.textstats import pii_redact


def test_pii_redact_counts_and_replaces(spark):
    df = spark.createDataFrame(
        [
            (1, "mail a.b+c@ex-1.org and d@e.io end"),
            (2, "call 555-012 or 555-0999 now"),
            (3, "host 10.0.3.77 peer 10.0.255.1"),
            (4, "clean text with no pii at all"),
            (5, "x 555-01234 y"),  # 4 digits after 555-0: no \b match
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in pii_redact(df).collect()}
    assert (got[1]["n_emails"], got[1]["n_phones"], got[1]["n_ips"]) == (2, 0, 0)
    assert got[1]["redacted"] == "mail [EMAIL] and [EMAIL] end"
    assert got[2]["n_phones"] == 2
    assert got[2]["redacted"] == "call [PHONE] or [PHONE] now"
    assert got[3]["n_ips"] == 2
    assert got[3]["redacted"] == "host [IP] peer [IP]"
    assert got[4]["redacted"] == "clean text with no pii at all"
    assert got[4]["n_emails"] == got[4]["n_phones"] == got[4]["n_ips"] == 0
    assert got[5]["n_phones"] == 0  # word boundary: 555-01234 is not NANP


def test_repetition_signals_on_crafted_docs(spark, tmp_path, monkeypatch):
    import opensearch_spark.pipelines.textstats as ts

    df = spark.createDataFrame(
        [
            (1, "a a a a"),          # one word repeated 4x
            (2, "a b c d"),          # all distinct
            (3, "a b a b a b"),      # period-2: every 2-gram a repeat
            (4, "solo"),             # 1 token: no n-grams
            (5, ""),                 # empty
        ],
        "doc_id long, text string",
    )
    monkeypatch.setattr(ts, "_docs", lambda spark, sf_dir: df)
    got = {r["doc_id"]: r for r in
           ts.repetition_signals(spark, "ignored").collect()}
    r1 = got[1]
    assert r1["n_tokens"] == 4 and r1["distinct_word_frac"] == 0.25
    assert r1["top_word_frac"] == 1.0
    # 2-grams of doc1: ['a a','a a','a a'] -> 1 distinct of 3
    assert r1["dup_2gram_frac"] == round(1 - 1 / 3, 4)
    r2 = got[2]
    assert r2["distinct_word_frac"] == 1.0 and r2["top_word_frac"] == 0.25
    assert r2["dup_2gram_frac"] == 0.0 and r2["dup_3gram_frac"] == 0.0
    r3 = got[3]
    # 2-grams: ab ba ab ba ab -> 2 distinct of 5
    assert r3["dup_2gram_frac"] == round(1 - 2 / 5, 4)
    # 3-grams: aba bab aba bab -> 2 distinct of 4
    assert r3["dup_3gram_frac"] == round(1 - 2 / 4, 4)
    r4, r5 = got[4], got[5]
    assert r4["dup_2gram_frac"] == 0.0 and r4["top_word_frac"] == 1.0
    assert r5["n_tokens"] == 0 and r5["top_word_frac"] == 0.0


def test_stratified_sample_deterministic_and_unbiased(spark):
    rows = [(i, f"s{i % 2}") for i in range(4000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    frac = {"s0": 1.0, "s1": 0.25}
    a = {r["doc_id"] for r in stratified_sample(df, frac).collect()}
    b = {r["doc_id"] for r in stratified_sample(df, frac).collect()}
    assert a == b  # deterministic, not RNG-based
    n0 = sum(1 for d in a if d % 2 == 0)
    n1 = len(a) - n0
    assert n0 == 2000  # frac 1.0 keeps everything
    assert abs(n1 - 500) < 120  # ~Binomial(2000, .25), generous bound
    # dropping a stratum from the dict removes it entirely
    only0 = stratified_sample(df, {"s0": 1.0})
    assert only0.where(F.col("source") == "s1").count() == 0
    # different seed -> different (but still deterministic) sample
    c = {r["doc_id"] for r in
         stratified_sample(df, frac, seed=DOMAIN_MIX_SEED + 1).collect()}
    assert c != a


def test_frac_hex_threshold_bounds():
    assert frac_hex_threshold(0.0) == "00000000"
    assert frac_hex_threshold(1.0) == "ffffffff"
    assert frac_hex_threshold(0.5) == "80000000"
    assert len(frac_hex_threshold(0.1)) == 8


def test_dup_ngram_inventory_finds_planted_boilerplate(spark, monkeypatch):
    import opensearch_spark.pipelines.dedup as dd

    boiler = "this is common boilerplate footer"
    rows = [(i, f"unique{i} words number{i} " + boiler) for i in range(10)]
    rows += [(100 + i, f"tail{i} only text here none") for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    monkeypatch.setattr(dd, "_docs", lambda spark, sf_dir: df)
    got = dd.dup_ngram_inventory(spark, "ignored", n=5, min_docs=5).collect()
    top = got[0]
    assert top["shingle"] == boiler
    # 10 planted + truncated copies that still carry the full 5-gram: the
    # truncation keeps 3/4 of 9 words = 6 words, dropping the footer, so
    # exactly the 10 originals count
    assert top["doc_count"] == 10
    # ordering contract: doc_count desc, shingle asc
    counts = [r["doc_count"] for r in got]
    assert counts == sorted(counts, reverse=True)


def test_line_dedup_removes_cross_doc_lines(spark):
    """CCNet-style line dedup: lines in >= 2 distinct docs are dropped,
    survivors keep original order; repeats WITHIN one doc are kept."""
    import hashlib

    from pyspark.sql import functions as F
    from opensearch_spark.pipelines.dedup import line_dedup

    df = spark.createDataFrame(
        [
            (1, ["cookie banner", "real content one", "cookie banner"]),
            (2, ["cookie banner", "real content two"]),
            (3, ["only unique here"]),
        ],
        "doc_id long, lines array<string>",
    )
    got = {r["doc_id"]: r.asDict()
           for r in line_dedup(df, min_dup_docs=2).collect()}
    assert got[1]["n_lines"] == 3 and got[1]["n_removed"] == 2
    assert got[1]["cleaned_md5"] == hashlib.md5(
        b"real content one").hexdigest()
    assert got[2]["n_removed"] == 1
    assert got[3]["n_removed"] == 0
    assert got[3]["cleaned_md5"] == hashlib.md5(
        b"only unique here").hexdigest()
    # all-removed doc hashes the empty string
    both = spark.createDataFrame(
        [(1, ["x"]), (2, ["x"])], "doc_id long, lines array<string>")
    g2 = {r["doc_id"]: r["cleaned_md5"]
          for r in line_dedup(both, min_dup_docs=2).collect()}
    assert g2[1] == hashlib.md5(b"").hexdigest()


# --- simhash hot-band skew guard -------------------------------------------

def _sig_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, simhash long")


def test_simhash_hot_band_guard_cuts_and_recovers(spark):
    """A planted hot band-0 bucket: the guard drops pairs reachable ONLY
    through the hot band, keeps pairs reachable through cold bands, and
    re-covers identical-signature pairs; candidate volume stays bounded
    by the cap instead of going quadratic in the hot bucket."""
    from opensearch_spark.pipelines.dedup import _simhash_pairs_of

    B42 = 0x42  # shared band-0 byte -> one hot bucket
    rows = [
        (1, B42),                                            # bands 1-3 = 0
        (2, B42 | (1 << 8) | (1 << 16) | (1 << 24)),         # h=3 vs doc 1,
                                                             # shares ONLY band 0
        (3, B42 | (0xFF << 8) | (0xFF << 16) | (0x7F << 24)),
        (4, B42 | (0xFF << 8) | (0xFF << 16) | (0x7F << 24)),
        (5, B42 | (0xFF << 8) | (0xFF << 16) | (0x7F << 24)),
    ]
    # filler: band 0 stays 0x42, bands 1-3 unique high-weight values so
    # filler cross-pairs exceed max_hamming and collide in no cold band
    for i in range(6, 36):
        v = (i * 37 % 251) + 2            # avoid 0,1,0xFF,0x7F collisions
        w = (i * 73 % 249) + 3
        u = (i * 29 % 119) + 4
        rows.append((i, B42 | (v << 8) | (w << 16) | (u << 24)))
    sig = _sig_df(spark, rows)

    unguarded = {(r["a"], r["b"]) for r in
                 _simhash_pairs_of(sig, 6, None).collect()}
    assert (1, 2) in unguarded and (3, 4) in unguarded

    guarded = {(r["a"], r["b"]): r["hamming"] for r in
               _simhash_pairs_of(sig, 6, 10).collect()}
    # hot-band-only pair is cut (the accounted recall trade)...
    assert (1, 2) not in guarded
    # ...identical-signature trio survives (cold bands + recovery path)
    assert {(3, 4), (3, 5), (4, 5)} <= set(guarded)
    assert all(guarded[p] == 0 for p in [(3, 4), (3, 5), (4, 5)])


def test_simhash_guard_recovery_when_every_band_is_hot(spark):
    """All docs share every band (identical signatures + cap 2): every
    bucket is cut, and ONLY the identical-signature recovery path
    produces the pairs — proving re-coverage, not silent loss."""
    from opensearch_spark.pipelines.dedup import _simhash_pairs_of

    sig = _sig_df(spark, [(i, 0x0BADF00D) for i in range(1, 6)])
    got = {(r["a"], r["b"]) for r in _simhash_pairs_of(sig, 6, 2).collect()}
    assert got == {(a, b) for a in range(1, 6) for b in range(a + 1, 6)}


def test_simhash_band_accounting_marks_cut_buckets(spark, tmp_path):
    """simhash_band_accounting flags exactly the buckets over the cap."""
    import os
    from opensearch_spark.pipelines import dedup

    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta", "s") for i in range(40)]
        + [(100 + i, f"unique text {i} zz{i}", "s") for i in range(5)],
        "doc_id long, text string, source string",
    )
    docs.write.mode("overwrite").parquet(
        os.path.join(str(tmp_path), "documents.parquet"))
    acc = dedup.simhash_band_accounting(spark, str(tmp_path),
                                        max_band_docs=10).collect()
    cut = [r for r in acc if r["cut"]]
    # the 40 identical docs (plus their near-dup variants) dominate four
    # band buckets -> those are flagged; every flagged bucket is > cap
    assert len(cut) >= 4
    assert all(r["n_docs"] > 10 for r in cut)
    assert all(r["n_docs"] <= 10 for r in acc if not r["cut"])


def test_semdedup_hot_cluster_guard_cuts_and_accounts(spark):
    """A planted hot cluster above max_cluster_docs is CUT from the
    pairwise cosine join (bounded work) and re-covered by exact-identity
    grouping, with cut=True in the accounting; the cold cluster keeps
    full pairwise semantics. Mirrors the simhash/ngram guard contract."""
    from opensearch_spark.pipelines.similarity import _semdedup_frame

    # centroid 0 direction = x-axis, centroid 1 = y-axis
    cents = [(0, [1.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0])]
    rows = []
    # hot cluster (x-axis): 12 docs, 3 of them identical copies of one
    # vector -> identity re-cover finds 2 drops; near-identical (but not
    # equal) vectors are NOT dropped once the cluster is cut
    for i in range(10, 19):
        rows.append((i, [1.0, 0.0, 1e-6 * (i - 10)]))
    for i in (19, 20, 21):
        rows.append((i, [1.0, 0.0, 0.5]))
    # cold cluster (y-axis): 3 docs, one exact near-dup pair
    rows.append((30, [0.0, 1.0, 0.0]))
    rows.append((31, [0.0, 1.0, 0.001]))
    rows.append((32, [0.0, 1.0, 5.0]))  # cosine vs 30 ~= 0.196 -> kept
    nd = spark.createDataFrame(rows, "vec_id long, v array<double>")

    out = {r["centroid"]: r for r in
           _semdedup_frame(nd, cents, 0.9, max_cluster_docs=10).collect()}
    hot, cold = out[0], out[1]
    assert hot["cut"] and hot["n_vectors"] == 12
    # identity-only re-cover: the 3 identical copies -> 2 drops; the 9
    # near-identical-but-distinct vectors are the accounted recall loss
    assert hot["n_dropped"] == 2
    assert not cold["cut"] and cold["n_vectors"] == 3
    assert cold["n_dropped"] == 1  # vec 31 dups 30; vec 32 kept

    # unguarded (cap None) the hot cluster goes full pairwise: the 9
    # near-identical vectors collapse to 1 (8 drops, cosine ~1) and the
    # identical trio to 1 (2 drops); cosine([1,0,0],[1,0,.5])=.894<.9
    # keeps the groups separate
    full = {r["centroid"]: r for r in
            _semdedup_frame(nd, cents, 0.9, max_cluster_docs=None).collect()}
    assert not full[0]["cut"] and full[0]["n_dropped"] == 10


def test_semdedup_lloyd_refinement_same_plan_shape(spark):
    """Lloyd iterations refine literal centroids toward cluster means
    (deterministic, k-row driver collect) and the refined centroids are
    plain literals — the assignment stays the map-only argmax."""
    from opensearch_spark.pipelines.similarity import (
        _assign_with_v, _lloyd_centroids)

    rows = [(i, [10.0 + 0.1 * i, 1.0, 0.0]) for i in range(5)]
    rows += [(i, [0.0, 1.0, 7.0 + 0.1 * i]) for i in range(5, 10)]
    nd = spark.createDataFrame(rows, "vec_id long, v array<double>")
    seeds = [(0, [10.0, 1.0, 0.0]), (1, [0.0, 1.0, 7.0])]
    c1 = _lloyd_centroids(nd, seeds, 1)
    c2 = _lloyd_centroids(nd, seeds, 1)
    assert c1 == c2  # deterministic
    assert c1[0][1][0] == pytest.approx(10.2)  # mean of 10.0..10.4
    assert c1[1][1][2] == pytest.approx(7.7)
    a = {r["vec_id"]: r["centroid"]
         for r in _assign_with_v(nd, c1).collect()}
    assert all(a[i] == 0 for i in range(5))
    assert all(a[i] == 1 for i in range(5, 10))


# ---- connected-components cluster resolution --------------------------------


def _brute_components(edges):
    """Union-find ground truth."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def test_connected_components_chain_star_and_isolated_pairs(spark):
    from opensearch_spark.pipelines.dedup import connected_components

    # a 6-node chain (worst diameter), a star, a triangle, a lone pair
    edges = [
        (10, 11), (11, 12), (12, 13), (13, 14), (14, 15),   # chain
        (20, 21), (20, 22), (20, 23),                        # star
        (30, 31), (31, 32), (30, 32),                        # triangle
        (40, 41),                                            # pair
    ]
    df = spark.createDataFrame(edges, "a long, b long")
    got = {
        r["id"]: r["rep"]
        for r in connected_components(df).collect()
    }
    assert got == _brute_components(edges)


def test_connected_components_pointer_jump_beats_diameter(spark):
    """A 40-node chain resolves within max_iter=8: plain min-label
    propagation would need ~40 rounds; the pointer jump makes it
    logarithmic. This is the property that keeps the loop bounded on a
    pathological near-dup chain at scale."""
    from opensearch_spark.pipelines.dedup import connected_components

    edges = [(i, i + 1) for i in range(100, 140)]
    df = spark.createDataFrame(edges, "a long, b long")
    got = {r["id"]: r["rep"] for r in connected_components(df, max_iter=8).collect()}
    assert set(got.values()) == {100}
    assert len(got) == 41


def test_connected_components_raises_without_convergence(spark):
    from opensearch_spark.pipelines.dedup import connected_components
    import pytest as _pytest

    edges = [(i, i + 1) for i in range(200, 230)]
    df = spark.createDataFrame(edges, "a long, b long")
    with _pytest.raises(RuntimeError, match="converge"):
        connected_components(df, max_iter=1)


def test_dedup_clusters_reps_are_cluster_minima(spark):
    """Every near-dup cluster elects its min doc_id; non-reps are exactly
    the drop set; reps referenced by non-reps are present as rep rows."""
    import os as _os
    from opensearch_spark.pipelines.dedup import dedup_clusters

    sf = _os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")
    rows = dedup_clusters(spark, sf).collect()
    assert rows, "expected near-dup clusters in the synthetic corpus"
    by_rep = {}
    for r in rows:
        by_rep.setdefault(r["rep_id"], []).append(r)
    for rep, members in by_rep.items():
        ids = [m["doc_id"] for m in members]
        assert min(ids) == rep
        assert sum(m["is_rep"] for m in members) == 1
