"""_msearch: batched multi-query execution in ONE Spark job.

Reference: the `_msearch` endpoint executes a list of search requests in
a single round trip (``action/search/TransportMultiSearchAction.java``,
``rest/action/search/RestMultiSearchAction.java``); per-shard, each
request still runs its own query phase. The Spark re-expression goes
further: ALL queries in the batch share one postings scan and one
per-segment decode —

    postings.filter(term IN union-of-all-query-terms)
      .groupBy(seg)
      .applyInPandas(multi_query_scorer)      # ONE python stage
      -> (qid, docId, score) per-segment top-k per query
      .Window(partitionBy qid).row_number <= k   # global reduce

so a batch of Q queries costs one shuffle + one Python stage instead of
Q jobs. Per-segment posting blocks are decoded ONCE and reused by every
query that references the term (the dominant cost for hot terms).

This is the engine's high-throughput serving path: cluster query
throughput is measured by pushing batches through msearch, which keeps
every executor busy regardless of per-query selectivity.

Supported query family (the hot path): match / match_phrase /
bool(must|should|filter|must_not of match/phrase) — with operator,
minimum_should_match, and boosts. Anything else falls back to the
regular per-query compiler and is unioned into the same result shape.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import pandas as pd

from opensearch_spark.analysis.analyzer import tokenize
from opensearch_spark.search import ast as A, bm25

MSEARCH_SCHEMA = "qid int, docId long, score double"


@dataclass
class _Clause:
    occur: str          # must | should | filter | must_not
    kind: str           # match | phrase
    terms: List[str] = field(default_factory=list)
    operator: str = "or"
    msm: int = 0
    weight: float = 1.0  # clause-level boost


@dataclass
class Program:
    qid: int
    clauses: List[_Clause] = field(default_factory=list)
    bool_msm: int = 0     # minimum_should_match across should clauses
    n_must: int = 0       # number of must+filter clauses (all required)
    boost: float = 1.0
    match_none: bool = False


def build_program(qid: int, node: A.AnyNode, known_terms: set,
                  tok=tokenize) -> Optional[Program]:
    """AST -> flat scoring program, or None if the node family is
    unsupported (caller falls back to the general compiler).

    ``known_terms``: terms present in the index — used to reproduce the
    single-query compiler's missing-term semantics at build time
    (OR drops missing terms; AND/phrase with a missing term match
    nothing)."""
    prog = Program(qid=qid, boost=float(getattr(node, "boost", 1.0)))

    def leaf(n: A.AnyNode, occur: str) -> bool:
        if isinstance(n, A.Match):
            terms = tok(n.query)
            present = [t for t in terms if t in known_terms]
            if not terms:
                if n.zero_terms_query == "all":
                    return False  # match_all semantics -> fallback path
                # zero_terms "none": a required empty match kills the bool
                if occur in ("must", "filter"):
                    prog.match_none = True
                return True
            if n.operator == "and" and len(set(present)) < len(set(terms)):
                prog.match_none = prog.match_none or occur in ("must", "filter")
                return occur in ("must", "filter", "should")
            if not present:
                if occur in ("must", "filter"):
                    prog.match_none = True
                return True
            prog.clauses.append(_Clause(
                occur=occur, kind="match", terms=present,
                operator=n.operator, msm=n.minimum_should_match,
                weight=float(n.boost),
            ))
            return True
        if isinstance(n, A.MatchPhrase):
            if n.slop != 0:
                return False
            terms = tok(n.query)
            if not terms:
                return True
            if any(t not in known_terms for t in terms):
                if occur in ("must", "filter"):
                    prog.match_none = True
                return True
            if len(terms) == 1:
                prog.clauses.append(_Clause(
                    occur=occur, kind="match", terms=terms, weight=float(n.boost)
                ))
                return True
            prog.clauses.append(_Clause(
                occur=occur, kind="phrase", terms=terms, weight=float(n.boost)
            ))
            return True
        return False

    if isinstance(node, (A.Match, A.MatchPhrase)):
        if not leaf(node, "must"):
            return None
        prog.n_must = 1 if prog.clauses or prog.match_none else 0
        # boost belongs to the leaf itself, not doubled at program level
        prog.boost = 1.0
        return prog
    if isinstance(node, A.Bool):
        for c in node.must:
            if not leaf(c, "must"):
                return None
        for c in node.filter:
            if not leaf(c, "filter"):
                return None
        for c in node.should:
            if not leaf(c, "should"):
                return None
        for c in node.must_not:
            if not leaf(c, "must_not"):
                return None
        if not node.must and not node.filter and node.must_not and not node.should:
            return None  # pure-negative bool: needs match_all base — fall back
        prog.n_must = sum(1 for c in prog.clauses if c.occur in ("must", "filter"))
        # account for required clauses that vanished due to missing terms
        n_req_ast = len(node.must) + len(node.filter)
        if n_req_ast and not prog.match_none:
            n_req_built = prog.n_must
            if n_req_built < n_req_ast:
                # a required clause matched nothing (e.g. empty-token match)
                pass
        prog.bool_msm = node.effective_msm()
        return prog
    return None


def candidate_terms(node: A.AnyNode, tok=tokenize) -> set:
    """All analyzed terms a node could reference (for one batched IDF
    lookup). Unknown node families contribute nothing — they take the
    fallback path anyway."""
    if isinstance(node, (A.Match, A.MatchPhrase)):
        return set(tok(node.query))
    if isinstance(node, A.Bool):
        out: set = set()
        for c in node.must + node.filter + node.should + node.must_not:
            out |= candidate_terms(c, tok)
        return out
    return set()


def required_terms(programs: Sequence[Program]) -> List[str]:
    out: set = set()
    for p in programs:
        for c in p.clauses:
            out.update(c.terms)
    return sorted(out)


def make_msearch_scorer(programs: List[Program], idfs: Dict[str, float],
                        avgdl: float, k: int):
    """applyInPandas fn scoring every program against one segment's
    decoded postings; emits per-(query, segment) top-k."""
    want_pos = any(c.kind == "phrase" for p in programs for c in p.clauses)

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        decoded = bm25.decode_term_group(pdf, want_positions=want_pos)
        out_qid: List[np.ndarray] = []
        out_doc: List[np.ndarray] = []
        out_score: List[np.ndarray] = []
        for prog in programs:
            if prog.match_none:
                continue
            docs, scores = _run_program(prog, decoded, idfs, avgdl)
            if docs.size == 0:
                continue
            docs, scores = bm25.topk_by_score(docs, scores, k)
            if prog.boost != 1.0:
                scores = scores * prog.boost
            out_qid.append(np.full(docs.size, prog.qid, dtype=np.int32))
            out_doc.append(docs)
            out_score.append(scores)
        if not out_doc:
            return pd.DataFrame({"qid": [], "docId": [], "score": []}).astype(
                {"qid": np.int32, "docId": np.int64, "score": np.float64}
            )
        return pd.DataFrame({
            "qid": np.concatenate(out_qid),
            "docId": np.concatenate(out_doc),
            "score": np.concatenate(out_score),
        })

    return fn


def make_single_program_scorer(prog: Program, idfs: Dict[str, float],
                               avgdl: float, k: int):
    """Single-query program scorer with conjunction-led block pruning
    (wand.score_program_topk): when the program has required clauses,
    should/must_not clauses decode only candidate-overlapping posting
    blocks. Falls back to the shared-decode exhaustive program when the
    program is pure-should (the msearch batch regime)."""
    from opensearch_spark.search import wand as W

    clause_dicts = [
        {"occur": c.occur, "kind": c.kind, "terms": c.terms,
         "operator": c.operator, "msm": c.msm, "weight": c.weight}
        for c in prog.clauses
    ]
    has_required = any(c.occur in ("must", "filter") for c in prog.clauses)

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        if prog.match_none:
            return pd.DataFrame({"docId": pd.Series([], dtype=np.int64),
                                 "score": pd.Series([], dtype=np.float64)})
        if has_required:
            out = W.score_program_topk(
                pdf, clause_dicts, prog.bool_msm, idfs, avgdl, k,
                boost=prog.boost,
            )
            if out is not None:
                docs, scores, _stats = out
                return pd.DataFrame({"docId": docs.astype(np.int64),
                                     "score": scores})
        want_pos = any(c.kind == "phrase" for c in prog.clauses)
        decoded = bm25.decode_term_group(pdf, want_positions=want_pos)
        docs, scores = _run_program(prog, decoded, idfs, avgdl)
        docs, scores = bm25.topk_by_score(docs, scores, k)
        if prog.boost != 1.0:
            scores = scores * prog.boost
        return pd.DataFrame({"docId": docs.astype(np.int64), "score": scores})

    return fn


def _clause_hits(c: _Clause, decoded, idfs, avgdl) -> Tuple[np.ndarray, np.ndarray]:
    if c.kind == "match":
        docs, scores = bm25.score_terms_in_segment(
            {t: decoded[t] for t in c.terms if t in decoded},
            {t: idfs[t] for t in c.terms},
            avgdl, c.operator, c.msm, n_required=len(set(c.terms)),
        )
    else:
        docs, pf, dl_q = bm25.phrase_freq_in_segment(decoded, c.terms)
        idf_sum = sum(idfs[t] for t in c.terms)
        scores = idf_sum * (bm25.K1 + 1.0) * bm25.tf_norm(
            pf.astype(np.float64), dl_q, avgdl
        )
    if c.occur == "filter":
        scores = np.zeros_like(scores)
    elif c.weight != 1.0:
        scores = scores * c.weight
    return docs, scores


def _run_program(prog: Program, decoded, idfs, avgdl
                 ) -> Tuple[np.ndarray, np.ndarray]:
    """Bool combine in numpy: docs sorted unique per clause; required
    clauses intersect, should clauses add + count toward msm, must_not
    subtracts. Mirrors SearchEngine._bool's aggregate semantics."""
    req = [(c, *_clause_hits(c, decoded, idfs, avgdl))
           for c in prog.clauses if c.occur in ("must", "filter")]
    sho = [(c, *_clause_hits(c, decoded, idfs, avgdl))
           for c in prog.clauses if c.occur == "should"]
    neg = [_clause_hits(c, decoded, idfs, avgdl)[0]
           for c in prog.clauses if c.occur == "must_not"]

    if prog.n_must and len(req) < prog.n_must:
        # a required clause produced no hits structure (missing terms
        # already handled at build time) — defensive
        return np.empty(0, np.int64), np.empty(0, np.float64)

    if req:
        base = req[0][1]
        for _, d, _s in req[1:]:
            base = base[np.isin(base, d, assume_unique=True)]
            if base.size == 0:
                return base, np.empty(0, np.float64)
        score = np.zeros(base.size, dtype=np.float64)
        for _, d, s in req:
            pos = np.searchsorted(d, base)
            score += s[pos]
        s_cnt = np.zeros(base.size, dtype=np.int64)
        for _, d, s in sho:
            hit = np.isin(base, d, assume_unique=True)
            if hit.any():
                pos = np.searchsorted(d, base[hit])
                score[hit] += s[pos]
                s_cnt[hit] += 1
        if prog.bool_msm > 0 and sho:
            keep = s_cnt >= prog.bool_msm
            base, score = base[keep], score[keep]
    else:
        if not sho:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        all_docs = np.concatenate([d for _, d, _ in sho])
        all_scores = np.concatenate([s for _, _, s in sho])
        base, inv = np.unique(all_docs, return_inverse=True)
        score = np.zeros(base.size, dtype=np.float64)
        np.add.at(score, inv, all_scores)
        cnt = np.zeros(base.size, dtype=np.int64)
        np.add.at(cnt, inv, 1)
        msm = max(prog.bool_msm, 1)
        keep = cnt >= msm
        base, score = base[keep], score[keep]

    for nd in neg:
        if nd.size and base.size:
            keep = ~np.isin(base, nd, assume_unique=True)
            base, score = base[keep], score[keep]
    return base, score
