"""DuckDB oracle SQL for the training-data pipeline operators.

Each oracle reproduces the exact hash/score derivations of the Spark
implementations (md5-hex-based MinHash/SimHash/LSH signs, identical float
association order, same rounding).
"""

from opensearch_spark.pipelines.dedup import (
    BAND_SIZE, JACCARD_THRESHOLD, N_MINHASH, SHIFT_ID,
)
from opensearch_spark.pipelines.textstats import LANG_MARKERS, STOPWORDS
from opensearch_spark.pipelines.similarity import N_PLANES

# near-dup corpus: documents ∪ truncated copies (matches dedup.near_dup_corpus)
_ND = f"""
nd AS (
  SELECT doc_id, text FROM documents WHERE doc_id < {SHIFT_ID}
  UNION ALL
  SELECT doc_id + {SHIFT_ID},
         array_to_string(
           list_slice(string_split(text, ' '), 1,
                      greatest(1, (len(string_split(text, ' ')) * 3) // 4)), ' ')
  FROM documents WHERE doc_id < {SHIFT_ID}
)
""".strip()

# distinct word 3-gram shingles of the near-dup corpus (positional
# self-joins: DuckDB's generate_series cannot lateral-reference columns)
_SHINGLES = """
w AS (SELECT doc_id, string_split(text, ' ') AS words FROM nd),
tokp AS (
  SELECT doc_id, unnest(words) AS term, generate_subscripts(words, 1) AS pos
  FROM w
),
sh AS (
  SELECT DISTINCT a.doc_id,
         a.term || ' ' || b.term || ' ' || c.term AS shingle
  FROM tokp a
  JOIN tokp b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
  JOIN tokp c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2
)
""".strip()

_SIG_COLS = ", ".join(
    f"min(md5('{i}|' || shingle)) AS h{i}" for i in range(N_MINHASH)
)

_BANDS = " UNION ALL ".join(
    f"SELECT doc_id, {bi} AS band, md5(h{bi * BAND_SIZE} || h{bi * BAND_SIZE + 1}) AS band_key FROM sig"
    for bi in range(N_MINHASH // BAND_SIZE)
)

# shared CTE chain ending in pairs(a, b, jaccard): the verified
# MinHash-LSH near-dup pairs over the near-dup corpus (matches
# dedup.minhash_lsh_pairs). Used by d_minhash_lsh and d_dedup_clusters.
_MINHASH_PAIRS_CTES = f"""{_ND},
        {_SHINGLES},
        sig AS (SELECT doc_id, {_SIG_COLS} FROM sh GROUP BY doc_id),
        bands AS ({_BANDS}),
        cand AS (
          SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
          FROM bands a JOIN bands b
            ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
        ),
        sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
        shared AS (
          SELECT c.a, c.b, count(*) AS inter
          FROM cand c
          JOIN sh sa ON sa.doc_id = c.a
          JOIN sh sb ON sb.doc_id = c.b AND sb.shingle = sa.shingle
          GROUP BY c.a, c.b
        ),
        pairs AS (
          SELECT s.a, s.b,
                 round(s.inter / (za.sz + zb.sz - s.inter), 4) AS jaccard
          FROM shared s
          JOIN sizes za ON za.doc_id = s.a
          JOIN sizes zb ON zb.doc_id = s.b
          WHERE round(s.inter / (za.sz + zb.sz - s.inter), 4) >= {JACCARD_THRESHOLD}
        )"""


def _simhash_sql() -> str:
    sums = ",\n           ".join(
        f"sum(CASE WHEN substr(h, {j + 1}, 1) SIMILAR TO '[89a-f]' THEN 1 ELSE -1 END) AS s{j}"
        for j in range(32)
    )
    combine = " + ".join(f"(CASE WHEN s{j} > 0 THEN 1::BIGINT << {j} ELSE 0 END)" for j in range(32))
    return f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
th AS (SELECT doc_id, md5(term) AS h FROM tok WHERE term <> ''),
sums AS (
  SELECT doc_id, {sums}
  FROM th GROUP BY doc_id
)
SELECT doc_id, CAST({combine} AS BIGINT) AS simhash FROM sums
"""


def _simhash_pairs_sql(max_hamming: int = 6,
                       max_band_docs: int = 5_000) -> str:
    """SimHash band-join near-dup pairs over the near-dup corpus
    (matches dedup.simhash_pairs: 4 x 8-bit bands, exact Hamming
    verify, INCLUDING the hot-band skew guard — band buckets over
    ``max_band_docs`` are cut from the self-join and their docs
    re-covered by identical-signature pairs, so the driver row
    certifies the guard semantics, not just the unguarded join)."""
    sums = ",\n           ".join(
        f"sum(CASE WHEN substr(h, {j + 1}, 1) SIMILAR TO '[89a-f]' THEN 1 ELSE -1 END) AS s{j}"
        for j in range(32)
    )
    combine = " + ".join(
        f"(CASE WHEN s{j} > 0 THEN 1::BIGINT << {j} ELSE 0 END)" for j in range(32)
    )
    return f"""
WITH {_ND},
tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM nd),
th AS (SELECT doc_id, md5(term) AS h FROM tok WHERE term <> ''),
sums AS (SELECT doc_id, {sums} FROM th GROUP BY doc_id),
sig AS (SELECT doc_id, CAST({combine} AS BIGINT) AS simhash FROM sums),
bands AS (
  SELECT doc_id, simhash, band.band AS band,
         (simhash >> (band.band * 8)) & 255 AS band_key
  FROM sig, (VALUES (0), (1), (2), (3)) band(band)
),
bc AS (
  SELECT band, band_key, count(*) AS n FROM bands GROUP BY band, band_key
),
cold AS (
  SELECT bands.* FROM bands JOIN bc USING (band, band_key)
  WHERE bc.n <= {max_band_docs}
),
hotdocs AS (
  SELECT DISTINCT bands.doc_id, bands.simhash
  FROM bands JOIN bc USING (band, band_key)
  WHERE bc.n > {max_band_docs}
),
cand AS (
  SELECT DISTINCT a, b, sha_, shb_ FROM (
    SELECT a.doc_id AS a, b.doc_id AS b,
           a.simhash AS sha_, b.simhash AS shb_
    FROM cold a
    JOIN cold b ON a.band = b.band AND a.band_key = b.band_key
               AND a.doc_id < b.doc_id
    UNION ALL
    SELECT a.doc_id, b.doc_id, a.simhash, b.simhash
    FROM hotdocs a
    JOIN hotdocs b ON a.simhash = b.simhash AND a.doc_id < b.doc_id
  )
)
SELECT a, b, CAST(bit_count(xor(sha_, shb_)) AS BIGINT) AS hamming
FROM cand WHERE bit_count(xor(sha_, shb_)) <= {max_hamming}
"""


def _langid_sql() -> str:
    langs = sorted(LANG_MARKERS)
    score_cols = []
    for lang in langs:
        vals = ", ".join("'" + m + "'" for m in LANG_MARKERS[lang])
        score_cols.append(
            f"len(list_filter(words, x -> x IN ({vals}))) AS score_{lang}"
        )
    best = "greatest(" + ", ".join(f"score_{l}" for l in langs) + ")"
    pred = "CASE "
    for l in langs:
        pred += f"WHEN {best} > 0 AND score_{l} = {best} THEN '{l}' "
    pred += "ELSE 'und' END"
    cols = ", ".join(f"score_{l}" for l in langs)
    return f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
scored AS (SELECT doc_id, {', '.join(score_cols)} FROM w)
SELECT doc_id, {cols}, {pred} AS pred_lang FROM scored
"""


def _lsh_sql(query_vec_id: int = 0) -> str:
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
comp AS (
  SELECT vec_id, generate_subscripts(v, 1) - 1 AS dim, unnest(v) AS x
  FROM e
),
planes AS (
  SELECT p.p AS plane, d.d AS dim,
         CASE WHEN substr(md5('plane|' || p.p || '|' || d.d), 1, 1)
                   SIMILAR TO '[89a-f]' THEN 1.0 ELSE -1.0 END AS sign
  FROM generate_series(0, {N_PLANES - 1}) AS p(p),
       (SELECT DISTINCT dim AS d FROM comp) d
),
proj AS (
  SELECT c.vec_id, pl.plane, sum(c.x * pl.sign) AS proj
  FROM comp c JOIN planes pl USING (dim)
  GROUP BY c.vec_id, pl.plane
),
buckets AS (
  SELECT vec_id,
         CAST(sum(CASE WHEN proj > 0 THEN 1::BIGINT << CAST(plane AS INT) ELSE 0 END) AS BIGINT) AS bucket
  FROM proj GROUP BY vec_id
)
""".strip()


_COSINE = """
cos AS (
  SELECT e.vec_id,
         round(list_cosine_similarity(e.embedding::DOUBLE[], q.embedding::DOUBLE[]), 5) AS cosine
  FROM embeddings e, (SELECT embedding FROM embeddings WHERE vec_id = 0) q
)
""".strip()


def _planted_nd_ctes(shift: int) -> str:
    """Shared CTE block building the planted embedding near-dup corpus
    (base ∪ v + 0.15*reverse(v)) — mirrors
    similarity.embedding_dup_corpus; used by BOTH _embed_dup_sql and
    _semdedup_sql so the perturbation stays defined once."""
    return """base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
comp0 AS (SELECT vec_id, generate_subscripts(v, 1) AS i, unnest(v) AS x FROM base),
cnt AS (SELECT vec_id, max(i) AS n FROM comp0 GROUP BY vec_id),
pert AS (
  SELECT c.vec_id + {shift} AS vec_id,
         list(c.x + 0.15 * r.x ORDER BY c.i) AS v
  FROM comp0 c
  JOIN cnt ct ON ct.vec_id = c.vec_id
  JOIN comp0 r ON r.vec_id = c.vec_id AND r.i = ct.n + 1 - c.i
  GROUP BY c.vec_id
),
nd AS (SELECT vec_id, v FROM base UNION ALL SELECT vec_id, v FROM pert)""".format(shift=shift)


def _embed_dup_sql(shift: int = 1_000_000, threshold: float = 0.9) -> str:
    """Embedding near-dup pairs: planted corpus (v + 0.15*reverse(v)),
    md5-derived hyperplane buckets, exact-cosine verify — mirrors
    similarity.embedding_dup_pairs."""
    return f"""
WITH {_planted_nd_ctes(shift)},
comp AS (SELECT vec_id, generate_subscripts(v, 1) - 1 AS dim, unnest(v) AS x FROM nd),
planes AS (
  SELECT p.p AS plane, d.d AS dim,
         CASE WHEN substr(md5('plane|' || p.p || '|' || d.d), 1, 1)
              SIMILAR TO '[89a-f]' THEN 1.0 ELSE -1.0 END AS sign
  FROM generate_series(0, {N_PLANES - 1}) AS p(p),
       (SELECT DISTINCT dim AS d FROM comp) d
),
proj AS (
  SELECT c.vec_id, pl.plane, sum(c.x * pl.sign) AS proj
  FROM comp c JOIN planes pl USING (dim) GROUP BY c.vec_id, pl.plane
),
buckets AS (
  SELECT vec_id,
         CAST(sum(CASE WHEN proj > 0 THEN 1::BIGINT << CAST(plane AS INT) ELSE 0 END) AS BIGINT) AS bucket
  FROM proj GROUP BY vec_id
),
bv AS (SELECT b.vec_id, b.bucket, n.v FROM buckets b JOIN nd n USING (vec_id))
SELECT a.vec_id AS a, b.vec_id AS b,
       round(list_cosine_similarity(a.v, b.v), 5) AS cosine
FROM bv a JOIN bv b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE round(list_cosine_similarity(a.v, b.v), 5) >= {threshold}
""".strip()




def _semdedup_sql(shift: int = 1_000_000, threshold: float = 0.9,
                  n_centroids: int = 8,
                  max_cluster_docs: int = 5_000) -> str:
    """SemDeDup oracle: the planted near-dup corpus assigned to the K
    deterministic IVF seed centroids (same tie rule as s_ivf_ann:
    cosine rounded 8dp desc, centroid asc), within-cluster cosine
    pairs at 5dp >= threshold, drop = appears as the higher id of any
    pair; per-cluster counts. Mirrors similarity.semdedup INCLUDING the
    hot-cluster cut-and-account guard: clusters above
    ``max_cluster_docs`` are cut from the pairwise join and re-covered
    by exact-identity grouping only, with the cut flagged per row."""
    return f"""
WITH {_planted_nd_ctes(shift)},
c AS (SELECT vec_id AS cid, v AS cv FROM base WHERE vec_id < {n_centroids}),
a0 AS (
  SELECT n.vec_id, c.cid, round(list_cosine_similarity(n.v, c.cv), 8) AS cs
  FROM nd n, c
),
assign AS (
  SELECT vec_id, cid AS centroid FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, cid) AS rn
    FROM a0
  ) WHERE rn = 1
),
av AS (SELECT a.vec_id, a.centroid, n.v FROM assign a JOIN nd n USING (vec_id)),
flags AS (
  SELECT centroid, count(*) AS n_vectors,
         count(*) > {max_cluster_docs} AS cut
  FROM av GROUP BY centroid
),
cold AS (SELECT av.* FROM av JOIN flags f USING (centroid) WHERE NOT f.cut),
pair_drops AS (
  SELECT centroid, CAST(count(*) AS BIGINT) AS nd FROM (
    SELECT DISTINCT b.centroid, b.vec_id
    FROM cold a JOIN cold b ON a.centroid = b.centroid AND a.vec_id < b.vec_id
    WHERE round(list_cosine_similarity(a.v, b.v), 5) >= {threshold}
  ) GROUP BY centroid
),
ident_drops AS (
  SELECT centroid, CAST(sum(cnt - 1) AS BIGINT) AS nd FROM (
    SELECT av.centroid, count(*) AS cnt
    FROM av JOIN flags f USING (centroid)
    WHERE f.cut GROUP BY av.centroid, av.v
  ) GROUP BY centroid
)
SELECT f.centroid, f.n_vectors,
       CAST(CASE WHEN f.cut THEN coalesce(i.nd, 0)
                 ELSE coalesce(p.nd, 0) END AS BIGINT) AS n_dropped,
       f.cut
FROM flags f
LEFT JOIN pair_drops p ON p.centroid = f.centroid
LEFT JOIN ident_drops i ON i.centroid = f.centroid
ORDER BY f.centroid
""".strip()


ORACLES: dict[str, str] = {
    "d_exact_dedup": """
        SELECT sha256(text) AS text_sha, min(doc_id) AS rep_doc_id,
               count(*) AS n_copies
        FROM documents GROUP BY sha256(text)
    """,
    "d_minhash_lsh": f"""
        WITH {_MINHASH_PAIRS_CTES}
        SELECT a, b, jaccard FROM pairs
    """,
    # pairs -> connected components -> canonical representative per
    # cluster (dedup.dedup_clusters). The recursive CTE enumerates every
    # reachable node per node (clusters are tiny stars, so the closure
    # is small); rep = min reachable id, matching the Spark min-label
    # propagation fixpoint exactly.
    "d_dedup_clusters": f"""
        WITH RECURSIVE {_MINHASH_PAIRS_CTES},
        edges AS (
          SELECT a AS s, b AS d FROM pairs
          UNION
          SELECT b, a FROM pairs
        ),
        reach(id, r) AS (
          SELECT s, d FROM edges
          UNION
          SELECT rc.id, e.d FROM reach rc JOIN edges e ON e.s = rc.r
        )
        SELECT id AS doc_id,
               least(id, min(r)) AS rep_id,
               least(id, min(r)) = id AS is_rep
        FROM reach GROUP BY id
    """,
    "d_simhash": _simhash_sql(),
    "d_simhash_pairs": _simhash_pairs_sql(),
    "d_ngram_jaccard": f"""
        WITH {_ND},
        src AS (
          SELECT n.doc_id, n.text, d.source
          FROM nd n JOIN documents d ON (n.doc_id % {SHIFT_ID}) = d.doc_id
        ),
        w AS (SELECT doc_id, string_split(text, ' ') AS words, source FROM src),
        tokp AS (
          SELECT doc_id, unnest(words) AS term,
                 generate_subscripts(words, 1) AS pos, source
          FROM w
        ),
        sh AS (
          SELECT DISTINCT a.doc_id,
                 a.term || ' ' || b.term || ' ' || c.term AS shingle,
                 a.source
          FROM tokp a
          JOIN tokp b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
          JOIN tokp c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2
        ),
        sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
        shared AS (
          SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS inter
          FROM sh a JOIN sh b
            ON a.shingle = b.shingle AND a.source = b.source AND a.doc_id < b.doc_id
          GROUP BY a.doc_id, b.doc_id
        )
        SELECT s.a, s.b, round(s.inter / (za.sz + zb.sz - s.inter), 4) AS jaccard
        FROM shared s
        JOIN sizes za ON za.doc_id = s.a
        JOIN sizes zb ON zb.doc_id = s.b
        WHERE round(s.inter / (za.sz + zb.sz - s.inter), 4) >= {JACCARD_THRESHOLD}
    """,
    "t_quality": f"""
        WITH w AS (
          SELECT doc_id, text,
                 list_filter(string_split(text, ' '), x -> x <> '') AS words
          FROM documents
        )
        SELECT doc_id, len(words) AS n_tokens,
               length(text) AS n_chars_computed,
               round((length(text) - len(words) + 1) / greatest(len(words), 1), 4)
                 AS mean_word_len,
               round(len(list_filter(words, x -> x IN ({", ".join("'" + s + "'" for s in STOPWORDS)})))
                     / greatest(len(words), 1)::DOUBLE, 4) AS stopword_ratio,
               CAST(len(words) >= 20
                    AND length(text) / greatest(len(words), 1) <= 12 AS INT) AS quality_ok
        FROM w
    """,
    "t_langid": _langid_sql(),
    "t_tokencount": r"""
        SELECT doc_id,
               len(list_filter(string_split(text, ' '), x -> x <> '')) AS ws_tokens,
               len(regexp_extract_all(lower(text), '[\p{L}\p{N}_]+')) AS regex_tokens,
               CAST(ceil(length(text) / 4) AS BIGINT) AS bpe_estimate
        FROM documents
    """,
    "t_fingerprint": """
        SELECT doc_id,
               md5(array_to_string(list_sort(list_distinct(string_split(lower(text), ' '))), ' '))
                 AS fingerprint,
               sha256(text) AS content_sha
        FROM documents
    """,
    "s_cosine_topk": f"""
        WITH {_COSINE}
        SELECT vec_id, cosine FROM cos
    """,
    "s_lsh_buckets": _lsh_sql() + "\nSELECT vec_id, bucket FROM buckets",
    "s_ivf_ann": f"""
        WITH c AS (
          SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id < 8
        ),
        a0 AS (
          SELECT e.vec_id, c.cid,
                 round(list_cosine_similarity(e.embedding::DOUBLE[],
                                              c.cv::DOUBLE[]), 8) AS cs
          FROM embeddings e, c
        ),
        assign AS (
          SELECT vec_id, cid FROM (
            SELECT vec_id, cid,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY cs DESC, cid) AS rn
            FROM a0
          ) WHERE rn = 1
        ),
        probes AS (
          SELECT cid FROM (
            SELECT cid, row_number() OVER (ORDER BY cs DESC, cid) AS rn
            FROM a0 WHERE vec_id = 0
          ) WHERE rn <= 2
        ),
        {_COSINE}
        SELECT a.vec_id, a.cid AS centroid, cos.cosine
        FROM assign a
        JOIN probes USING (cid)
        JOIN cos ON cos.vec_id = a.vec_id
    """,
    "s_lsh_ann": (
        _lsh_sql()
        + f""",
        {_COSINE},
        qb AS (SELECT bucket AS qbucket FROM buckets WHERE vec_id = 0)
        SELECT b.vec_id, b.bucket, c.cosine
        FROM buckets b JOIN qb ON b.bucket = qb.qbucket
        JOIN cos c ON c.vec_id = b.vec_id
        """
    ),
    "d_embed_dup": _embed_dup_sql(),
    "d_semdedup": _semdedup_sql(),
    "t_contamination": f"""
        WITH {_ND},
        w AS (SELECT doc_id, string_split(text, ' ') AS words FROM nd),
        tokp AS (
          SELECT doc_id, unnest(words) AS term,
                 generate_subscripts(words, 1) AS pos
          FROM w
        ),
        sh AS (
          SELECT DISTINCT a.doc_id,
                 a.term || ' ' || b.term || ' ' || c.term || ' ' ||
                 d.term || ' ' || e.term AS shingle
          FROM tokp a
          JOIN tokp b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
          JOIN tokp c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2
          JOIN tokp d ON d.doc_id = a.doc_id AND d.pos = a.pos + 3
          JOIN tokp e ON e.doc_id = a.doc_id AND e.pos = a.pos + 4
        ),
        probes AS (
          SELECT DISTINCT
                 array_to_string(list_slice(words, 1, 5), ' ') AS shingle
          FROM w
          WHERE doc_id % 100 = 0 AND len(words) >= 5 AND doc_id < 1000000
        )
        SELECT sh.doc_id, count(*) AS n_probe_hits
        FROM sh JOIN probes USING (shingle)
        GROUP BY sh.doc_id
    """,
    "m_payload_integrity": """
        SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
               sha256(text) AS payload_sha
        FROM documents
    """,
    # Gopher-style repetition signals (textstats.repetition_signals):
    # n-gram totals/distincts via positional self-joins, top-word
    # multiplicity via unnest+group, all per-doc.
    "t_repetition": """
        WITH w AS (
          SELECT doc_id,
                 list_filter(string_split(text, ' '), x -> x <> '') AS words
          FROM documents
        ),
        tokp AS (
          SELECT doc_id, unnest(words) AS term,
                 generate_subscripts(words, 1) AS pos
          FROM w
        ),
        topw AS (
          SELECT doc_id, max(c) AS top FROM (
            SELECT doc_id, term, count(*) AS c FROM tokp GROUP BY doc_id, term
          ) GROUP BY doc_id
        ),
        g2 AS (
          SELECT a.doc_id, count(*) AS total,
                 count(DISTINCT a.term || ' ' || b.term) AS dist
          FROM tokp a JOIN tokp b
            ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
          GROUP BY a.doc_id
        ),
        g3 AS (
          SELECT a.doc_id, count(*) AS total,
                 count(DISTINCT a.term || ' ' || b.term || ' ' || c.term) AS dist
          FROM tokp a
          JOIN tokp b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
          JOIN tokp c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2
          GROUP BY a.doc_id
        )
        SELECT w.doc_id, len(words) AS n_tokens,
               round(len(list_distinct(words))
                     / greatest(len(words), 1), 4) AS distinct_word_frac,
               round(coalesce(topw.top, 0)
                     / greatest(len(words), 1), 4) AS top_word_frac,
               round(coalesce(1.0 - g2.dist * 1.0 / g2.total, 0.0), 4)
                 AS dup_2gram_frac,
               round(coalesce(1.0 - g3.dist * 1.0 / g3.total, 0.0), 4)
                 AS dup_3gram_frac
        FROM w
        LEFT JOIN topw USING (doc_id)
        LEFT JOIN g2 USING (doc_id)
        LEFT JOIN g3 USING (doc_id)
    """,
    # PII scrub (textstats.pii_scrub_demo): same synthetic prefix, same
    # patterns (Java regex == RE2 for these), 'g' flag = Spark's
    # replace-all default.
    "t_pii_redact": r"""
        WITH s AS (
          SELECT doc_id,
                 'contact user' || CAST(doc_id AS VARCHAR) || '@' || source
                 || '.net tel 555-0' || CAST(doc_id % 100 AS VARCHAR)
                 || ' ip 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7 '
                 || text AS synth
          FROM documents
        )
        SELECT doc_id,
               len(regexp_extract_all(synth,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
               len(regexp_extract_all(synth,
                 '\b555-0[0-9]{1,3}\b')) AS n_phones,
               len(regexp_extract_all(synth,
                 '\b10\.0\.[0-9]{1,3}\.[0-9]{1,3}\b')) AS n_ips,
               md5(regexp_replace(regexp_replace(regexp_replace(synth,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                 '[EMAIL]', 'g'),
                 '\b555-0[0-9]{1,3}\b', '[PHONE]', 'g'),
                 '\b10\.0\.[0-9]{1,3}\.[0-9]{1,3}\b', '[IP]', 'g'))
                 AS redacted_md5
        FROM s
    """,
    # boilerplate inventory (dedup.dup_ngram_inventory): 5-gram doc
    # frequencies over the near-dup corpus, deterministic ordering.
    "d_dup_ngrams": f"""
        WITH {_ND},
        w AS (SELECT doc_id, string_split(text, ' ') AS words FROM nd),
        tokp AS (
          SELECT doc_id, unnest(words) AS term,
                 generate_subscripts(words, 1) AS pos
          FROM w
        ),
        sh AS (
          SELECT DISTINCT a.doc_id,
                 a.term || ' ' || b.term || ' ' || c.term || ' ' ||
                 d.term || ' ' || e.term AS shingle
          FROM tokp a
          JOIN tokp b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
          JOIN tokp c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2
          JOIN tokp d ON d.doc_id = a.doc_id AND d.pos = a.pos + 3
          JOIN tokp e ON e.doc_id = a.doc_id AND e.pos = a.pos + 4
        )
        SELECT shingle, count(*) AS doc_count
        FROM sh GROUP BY shingle HAVING count(*) >= 2
        ORDER BY doc_count DESC, shingle ASC LIMIT 100
    """,
    # CCNet-style line dedup (dedup.line_dedup_demo): 10-word chunks as
    # lines; a line is boilerplate when it appears in >= 2 distinct docs
    # of the near-dup corpus. cleaned_md5 hashes the survivors joined by
    # newline in original order ('' when everything was removed —
    # mirrors Spark concat_ws over an empty array).
    "d_line_dedup": f"""
        WITH {_ND},
        w AS (SELECT doc_id, string_split(text, ' ') AS words FROM nd),
        ll AS (
          SELECT doc_id,
                 CASE WHEN len(words) = 0 THEN []
                 ELSE list_transform(
                   generate_series(0, CAST(ceil(len(words) / 10.0) AS INT) - 1),
                   i -> array_to_string(
                          list_slice(words, i * 10 + 1, i * 10 + 10), ' '))
                 END AS lines
          FROM w
        ),
        l AS (
          SELECT doc_id, unnest(lines) AS line,
                 generate_subscripts(lines, 1) AS pos
          FROM ll
        ),
        st AS (
          SELECT line, count(DISTINCT doc_id) AS ndocs FROM l GROUP BY line
        ),
        j AS (
          SELECT l.doc_id, l.pos, l.line, st.ndocs >= 2 AS dup
          FROM l JOIN st USING (line)
        )
        SELECT doc_id, count(*) AS n_lines,
               CAST(sum(CASE WHEN dup THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_removed,
               md5(coalesce(
                 string_agg(CASE WHEN NOT dup THEN line END, chr(10)
                            ORDER BY pos), '')) AS cleaned_md5
        FROM j GROUP BY doc_id
    """,
}


def _domain_mix_sql() -> str:
    """Mirror of sampling.domain_mix: md5-hex uniform thresholds, the
    same DOMAIN_MIX literals."""
    from opensearch_spark.pipelines.sampling import (
        DOMAIN_MIX, DOMAIN_MIX_SEED, frac_hex_threshold,
    )

    cases = " OR ".join(
        f"(source = '{s}')" if f >= 1.0 else
        f"(source = '{s}' AND u8 < '{frac_hex_threshold(f)}')"
        for s, f in sorted(DOMAIN_MIX.items())
    )
    return f"""
        WITH s AS (
          SELECT doc_id, source,
                 substr(md5(CAST(doc_id AS VARCHAR) || ':{DOMAIN_MIX_SEED}'),
                        1, 8) AS u8
          FROM documents
        )
        SELECT doc_id, source, u8 FROM s WHERE {cases}
    """


ORACLES["p_domain_mix"] = _domain_mix_sql()


def _curation_funnel_sql() -> str:
    """Mirror of sampling.curation_funnel: the t_quality flag, the
    d_exact_dedup keep-one, and the p_domain_mix hash threshold
    composed in the same order."""
    from opensearch_spark.pipelines.sampling import (
        CURATION_SAMPLE_FRAC, DOMAIN_MIX_SEED, frac_hex_threshold,
    )

    thr = frac_hex_threshold(CURATION_SAMPLE_FRAC)
    return f"""
        WITH w AS (
          SELECT doc_id, source, text,
                 len(list_filter(string_split(text, ' '), x -> x <> ''))
                   AS n_tokens
          FROM documents
        ),
        q AS (
          SELECT * FROM w
          WHERE n_tokens >= 20
            AND length(text) / greatest(n_tokens, 1) <= 12
        ),
        reps AS (SELECT min(doc_id) AS doc_id FROM q GROUP BY sha256(text))
        SELECT q.doc_id, q.source, CAST(q.n_tokens AS BIGINT) AS n_tokens
        FROM q JOIN reps USING (doc_id)
        WHERE substr(md5(CAST(q.doc_id AS VARCHAR) || ':{DOMAIN_MIX_SEED}'),
                     1, 8) < '{thr}'
    """


ORACLES["p_curation_funnel"] = _curation_funnel_sql()


def _feature_stream_sql() -> str:
    """Mirror of multimodal.feature_rows: UTF-8 byte values recovered
    from hex(encode(text)), np.array_split chunking (first n % DIM
    chunks take one extra byte), chunk mean = exact integer sum /
    length in float64."""
    from opensearch_spark.pipelines.multimodal import FEATURE_DIM as D

    return f"""
        WITH b AS (
          SELECT doc_id, hex(encode(text)) AS h,
                 octet_length(encode(text)) AS n
          FROM documents
          WHERE octet_length(encode(text)) >= {D}
        ),
        idx AS (
          SELECT doc_id, h, n, unnest(range(0, n)) AS i FROM b
        ),
        bytes AS (
          SELECT doc_id, i, n,
                 (strpos('0123456789ABCDEF', substr(h, 2 * i + 1, 1)) - 1)
                   * 16
                 + (strpos('0123456789ABCDEF', substr(h, 2 * i + 2, 1)) - 1)
                   AS v
          FROM idx
        ),
        chunked AS (
          SELECT doc_id,
                 CASE WHEN i < (n % {D}) * ((n // {D}) + 1)
                      THEN i // ((n // {D}) + 1)
                      ELSE (n % {D})
                           + (i - (n % {D}) * ((n // {D}) + 1)) // (n // {D})
                 END AS dim,
                 v
          FROM bytes
        )
        SELECT doc_id, CAST(dim AS BIGINT) AS dim,
               round(sum(v)::DOUBLE / count(*), 4) AS feature
        FROM chunked GROUP BY doc_id, dim
    """


ORACLES["m_feature_stream"] = _feature_stream_sql()
