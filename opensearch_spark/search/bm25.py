"""BM25 scoring math (Lucene-compatible) + per-segment numpy scorers.

Scoring model (SURVEY.md §1.5; public Lucene semantics):

    idf(t)     = ln(1 + (N - df + 0.5) / (df + 0.5))      N = field docCount
    tfNorm     = tf / (tf + k1 * (1 - b + b * dl / avgdl))
    score(t,d) = boost * (k1 + 1) * idf(t) * tfNorm

The extra ``(k1 + 1)`` numerator matches the reference's
``LegacyBM25Similarity`` (rank-order identical to modern BM25; scores
scale by 2.2). ``dl`` is the byte4-QUANTIZED token count (decoded from the
inline per-posting norm byte); ``avgdl = sumTotalTermFreq / docCount``
exact. Phrase queries score as a pseudo-term with tf = phrase frequency
and idf = sum of the constituent terms' idfs (repeats counted).

The segment scorers below run inside ``applyInPandas`` groups — one group
per segment holds all the query terms' posting blocks for that segment's
docs (the Spark analog of a per-shard query phase). All math is
vectorized numpy; no per-row Python.
"""

from __future__ import annotations

import math
from typing import Dict, List, Sequence, Tuple

import numpy as np
import pandas as pd

from opensearch_spark.analysis.smallfloat import decode_norms_np
from opensearch_spark.index import codec

K1 = 1.2
B = 0.75


def idf(df: int, doc_count: int) -> float:
    return math.log(1.0 + (doc_count - df + 0.5) / (df + 0.5))


def tf_norm(tf: np.ndarray, dl_q: np.ndarray, avgdl: float) -> np.ndarray:
    return tf / (tf + K1 * (1.0 - B + B * dl_q / avgdl))


def decode_term_group(
    g: pd.DataFrame, want_positions: bool = False
) -> Dict[str, Tuple[np.ndarray, np.ndarray, np.ndarray, list]]:
    """Decode one segment's posting blocks.

    ``g`` has columns (term, block_no, n_docs, doc_bytes, tf_bytes,
    norm_bytes, pos_bytes) — possibly many blocks per term. Returns
    term -> (docs int64 sorted, tfs int64, dl_q float64, pos_offsets)
    where pos_offsets is [positions ndarray] aligned if requested.
    """
    out: Dict[str, Tuple[np.ndarray, np.ndarray, np.ndarray, list]] = {}
    g = g.sort_values(["term", "block_no"], kind="stable")
    for term, tg in g.groupby("term", sort=False):
        docs_parts: List[np.ndarray] = []
        tf_parts: List[np.ndarray] = []
        norm_parts: List[np.ndarray] = []
        pos_parts: List[np.ndarray] = []
        for row in tg.itertuples(index=False):
            n = int(row.n_docs)
            docs_parts.append(codec.delta_decode_sorted(bytes(row.doc_bytes), n))
            tfs = codec.varint_decode(bytes(row.tf_bytes), n).astype(np.int64)
            tf_parts.append(tfs)
            norm_parts.append(np.frombuffer(bytes(row.norm_bytes), dtype=np.uint8))
            if want_positions:
                pos_parts.append(codec.decode_positions(bytes(row.pos_bytes), tfs))
        docs = np.concatenate(docs_parts)
        tfs = np.concatenate(tf_parts)
        dl_q = decode_norms_np(np.concatenate(norm_parts)).astype(np.float64)
        positions = np.concatenate(pos_parts) if (want_positions and pos_parts) else None
        if docs.size > 1 and (docs[1:] < docs[:-1]).any():
            # multi-generation blocks overlap in doc range: merge-sort
            order = np.argsort(docs, kind="stable")
            if positions is not None:
                starts = np.concatenate(([0], np.cumsum(tfs)[:-1]))
                idx = np.repeat(starts[order], tfs[order]) + _ragged_arange(tfs[order])
                positions = positions[idx]
            docs, tfs, dl_q = docs[order], tfs[order], dl_q[order]
        out[str(term)] = (docs, tfs, dl_q, positions)
    return out


def score_terms_in_segment(
    decoded: Dict[str, tuple],
    idf_by_term: Dict[str, float],
    avgdl: float,
    operator: str = "or",
    msm: int = 0,
    n_required: int | None = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Sum per-term BM25 over a segment. Returns (docIds, scores) of
    matching docs (operator='and' keeps only docs with ALL terms;
    msm > 1 keeps docs matching at least msm distinct terms).

    ``n_required``: the GLOBAL distinct-term count of the query for
    operator='and'. A term present in the index but absent from THIS
    segment means no doc here can contain it — requiring only the
    segment-present subset would false-positive such docs, so the
    required count must come from the query, not the segment."""
    # canonical (sorted) term order so float accumulation order is
    # deterministic and identical across scorer implementations
    terms = sorted(t for t in idf_by_term if t in decoded)
    if not terms:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
    if operator == "and" and n_required is not None and len(terms) < n_required:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
    all_docs = np.concatenate([decoded[t][0] for t in terms])
    contribs = np.concatenate(
        [
            idf_by_term[t]
            * (K1 + 1.0)
            * tf_norm(decoded[t][1].astype(np.float64), decoded[t][2], avgdl)
            for t in terms
        ]
    )
    uniq, inv = np.unique(all_docs, return_inverse=True)
    scores = np.zeros(uniq.size, dtype=np.float64)
    np.add.at(scores, inv, contribs)
    nmatch = np.zeros(uniq.size, dtype=np.int64)
    np.add.at(nmatch, inv, 1)
    if operator == "and":
        need = n_required if n_required is not None else len(set(terms))
        keep = nmatch == need
    elif msm > 1:
        keep = nmatch >= msm
    else:
        keep = slice(None)
    return uniq[keep], scores[keep]


def phrase_freq_in_segment(
    decoded: Dict[str, tuple], phrase_terms: Sequence[str]
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Exact (slop=0) phrase matching within one segment.

    Returns (docIds, phrase_freq, dl_q) for docs containing the phrase.
    decoded must carry positions. Vectorization: (doc, position) pairs are
    packed into int64 keys (doc ordinal << 32 | position); the phrase
    survives where key sets intersect after shifting by the term offset.
    """
    for t in phrase_terms:
        if t not in decoded:
            return (np.empty(0, np.int64), np.empty(0, np.int64), np.empty(0, np.float64))
    # candidate docs: present in all phrase terms
    cand = None
    for t in dict.fromkeys(phrase_terms):
        d = decoded[t][0]
        cand = d if cand is None else cand[np.isin(cand, d, assume_unique=True)]
        if cand.size == 0:
            return (np.empty(0, np.int64), np.empty(0, np.int64), np.empty(0, np.float64))

    # map each term's (doc, positions) -> keys restricted to candidates
    keysets: List[np.ndarray] = []
    dl_for_cand = None
    for t in phrase_terms:
        docs, tfs, dl_q, pos = decoded[t]
        sel = np.searchsorted(docs, cand)
        # expand candidate docs' position slices
        starts = np.concatenate(([0], np.cumsum(tfs)[:-1]))
        lens = tfs[sel]
        offs = starts[sel]
        doc_ord = np.repeat(np.arange(cand.size, dtype=np.int64), lens)
        idx = np.repeat(offs, lens) + _ragged_arange(lens)
        keys = (doc_ord << np.int64(32)) | pos[idx].astype(np.int64)
        keysets.append(np.sort(keys))
        if dl_for_cand is None:
            dl_for_cand = dl_q[sel]

    surv = keysets[0]
    for i in range(1, len(keysets)):
        shifted = keysets[i] - np.int64(i)
        surv = surv[np.isin(surv, shifted, assume_unique=False)]
        if surv.size == 0:
            break
    if surv.size == 0:
        return (np.empty(0, np.int64), np.empty(0, np.int64), np.empty(0, np.float64))
    doc_ord = (surv >> np.int64(32)).astype(np.int64)
    freq = np.bincount(doc_ord, minlength=cand.size)
    hit = freq > 0
    return cand[hit], freq[hit], dl_for_cand[hit]


def sloppy_phrase_freq_in_segment(
    decoded: Dict[str, tuple], phrase_terms: Sequence[str], slop: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Sloppy (slop > 0) phrase matching within one segment.

    Semantics (documented, deterministic variant of Lucene's sloppy
    phrase — ``MatchPhraseQueryBuilder`` slop):
    - 2 terms: a doc matches iff occurrences (p1, p2) exist with
      adjusted width w = |p2 - p1 - 1| <= slop (this IS Lucene's match
      condition including the transposition cost: "b a" matches
      "a b"~2, not "a b"~1). sloppy_freq = sum over p2 of
      1 / (1 + min_w(p2)) — each second-term occurrence contributes its
      best window's sloppy weight (Lucene instead accumulates a greedy
      enumeration; weights differ on repeated overlaps, ranks agree on
      non-pathological text).
    - k > 2 terms: IN-ORDER chains only (p1 < ... < pk, total gap
      <= slop, via the vectorized chain-dp in spans.py);
      sloppy_freq = sum over chain endpoints of 1 / (1 + gap).

    Returns (docIds, sloppy_freq float64, dl_q) for matching docs.
    """
    from opensearch_spark.search import spans as S

    for t in phrase_terms:
        if t not in decoded:
            return (np.empty(0, np.int64), np.empty(0, np.float64),
                    np.empty(0, np.float64))
    uniq, span_map = S.ordinalize(decoded, list(phrase_terms))
    if uniq.size == 0:
        return (np.empty(0, np.int64), np.empty(0, np.float64),
                np.empty(0, np.float64))

    if len(phrase_terms) == 2:
        t1, t2 = phrase_terms
        d1, s1, _ = S.term_spans(span_map, t1)
        d2, s2, _ = S.term_spans(span_map, t2)
        if d1.size == 0 or d2.size == 0:
            return (np.empty(0, np.int64), np.empty(0, np.float64),
                    np.empty(0, np.float64))
        # for each t2 occurrence: nearest same-doc t1 position around
        # p2-1 (|p2-p1-1| is V-shaped in p1, so the two neighbors of the
        # insertion point WITHIN the doc's range suffice)
        BIGP = np.int64(1) << 32
        k1 = d1 * BIGP + s1                      # sorted
        lo = np.searchsorted(k1, d2 * BIGP)      # doc range in t1 posting
        hi = np.searchsorted(k1, (d2 + 1) * BIGP)
        j = np.searchsorted(k1, d2 * BIGP + (s2 - 1))
        best = np.full(d2.size, np.iinfo(np.int64).max, dtype=np.int64)
        for jj in (j - 1, j):
            ok = (jj >= lo) & (jj < hi)
            idx = np.clip(jj, 0, d1.size - 1)
            w = np.abs(s2 - s1[idx] - 1)
            best = np.where(ok, np.minimum(best, w), best)
        hit = best <= slop
        if not hit.any():
            return (np.empty(0, np.int64), np.empty(0, np.float64),
                    np.empty(0, np.float64))
        contrib = 1.0 / (1.0 + best[hit].astype(np.float64))
        doc_ord = d2[hit]
        freq = np.zeros(uniq.size, dtype=np.float64)
        np.add.at(freq, doc_ord, contrib)
    else:
        spansets = [S.term_spans(span_map, t) for t in phrase_terms]
        sd, sst, sen = S.near_ordered(spansets, slop)
        if sd.size == 0:
            return (np.empty(0, np.int64), np.empty(0, np.float64),
                    np.empty(0, np.float64))
        gap = (sen - sst) - len(phrase_terms)
        contrib = 1.0 / (1.0 + gap.astype(np.float64))
        freq = np.zeros(uniq.size, dtype=np.float64)
        np.add.at(freq, sd, contrib)

    hit_ord = np.flatnonzero(freq > 0)
    docs = uniq[hit_ord]
    # dl_q per doc from any term's postings
    t0 = phrase_terms[0]
    d0, _tf0, dlq0, _p0 = decoded[t0]
    pos_in = np.searchsorted(d0, docs)
    in_t0 = (pos_in < d0.size) & (d0[np.clip(pos_in, 0, d0.size - 1)] == docs)
    dl_out = np.zeros(docs.size, dtype=np.float64)
    dl_out[in_t0] = dlq0[pos_in[in_t0]]
    if not in_t0.all():
        t1 = phrase_terms[1]
        d1_, _tf1, dlq1, _p1 = decoded[t1]
        rest = ~in_t0
        p2 = np.searchsorted(d1_, docs[rest])
        dl_out[rest] = dlq1[np.clip(p2, 0, d1_.size - 1)]
    return docs, freq[hit_ord], dl_out


def _ragged_arange(lens: np.ndarray) -> np.ndarray:
    """[3,1,2] -> [0,1,2, 0, 0,1] (vectorized)."""
    lens = np.asarray(lens, dtype=np.int64)
    total = int(lens.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    return np.arange(total, dtype=np.int64) - np.repeat(starts, lens)


def topk_by_score(docs: np.ndarray, scores: np.ndarray, k: int) -> Tuple[np.ndarray, np.ndarray]:
    """Top-k by (score desc, docId asc) — the reference's merge comparator
    modulo internal-Lucene-docID ties (SURVEY.md §2.7)."""
    if docs.size <= k:
        order = np.lexsort((docs, -scores))
        return docs[order], scores[order]
    # partial select then exact sort of the selected slice
    idx = np.argpartition(-scores, k - 1)[: k + 64]  # small over-select for ties
    # ensure all score-ties at the boundary are considered: fall back to
    # full sort when the over-selection may have cut a tie group
    order = np.lexsort((docs[idx], -scores[idx]))
    sel = idx[order][:k]
    kth = scores[sel[-1]]
    n_tied_total = int((scores >= kth).sum())
    if n_tied_total > sel.size and (scores[sel] == kth).any():
        order = np.lexsort((docs, -scores))
        sel = order[:k]
    return docs[sel], scores[sel]
