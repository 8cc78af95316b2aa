"""Percolate: reverse search — which stored queries match each document.

Reference: ``modules/percolator/.../PercolateQueryBuilder.java:112`` —
queries are indexed, and a candidate document is run through them.
Spark-first shape: the stored query set is compiled ONCE on the driver
into plain matcher closures (no Spark objects), broadcast with the
``mapInPandas`` function, and every partition of the document stream
evaluates all queries against its docs — a single pass, no shuffle, so
percolation throughput scales with document partitions (the continuous-
query-on-a-stream use: call inside ``foreachBatch``).

Supported stored-query family: match (operator/msm), match_phrase
(slop >= 0 with the engine's adjusted-width semantics), and bool of
those (must/filter/should/must_not/minimum_should_match). Matching
only — percolation answers WHICH queries hit, not scores (reference
percolator scores are constant unless asked).
"""

from __future__ import annotations

from typing import Callable, Dict, Iterator, List, Sequence, Tuple

import pandas as pd

from opensearch_spark.analysis.analyzer import tokenize
from opensearch_spark.search import ast as A, dsl as dsl_mod

Matcher = Callable[[List[str], Dict[str, List[int]]], bool]


def _match_matcher(terms: List[str], operator: str, msm: int) -> Matcher:
    need = list(dict.fromkeys(terms))

    def m(_toks, index) -> bool:
        present = sum(1 for t in need if t in index)
        if operator == "and":
            return present == len(need)
        if msm > 1:
            return present >= msm
        return present >= 1

    return m


def _phrase_matcher(terms: List[str], slop: int) -> Matcher:
    def m(_toks, index) -> bool:
        if any(t not in index for t in terms):
            return False
        if slop == 0:
            # consecutive-position chain
            cand = set(index[terms[0]])
            for i, t in enumerate(terms[1:], start=1):
                cand = {p for p in cand if (p + i) in set(index[t])}
                if not cand:
                    return False
            return True
        if len(terms) == 2:
            p1s, p2s = index[terms[0]], index[terms[1]]
            return any(
                abs(p2 - p1 - 1) <= slop for p1 in p1s for p2 in p2s
            )
        # k > 2 sloppy: in-order chain, total gap <= slop. dp value
        # v = start_1 + #terms-matched; at the end, slop_used = end - v
        # (end exclusive) == p_k - start_1 - (k - 1). Mirrors the
        # vectorized chain-dp in spans.near_ordered.
        best = {p + 1: p + 1 for p in index[terms[0]]}
        for t in terms[1:]:
            ends = sorted(best.items())
            nxt: Dict[int, int] = {}
            for p in index[t]:
                cands = [v for e, v in ends if e <= p]
                if cands:
                    nxt[p + 1] = max(cands) + 1
            best = nxt
            if not best:
                return False
        return any((e - v) <= slop for e, v in best.items())

    return m


def _compile(node: A.AnyNode) -> Matcher:
    if isinstance(node, A.Match):
        terms = tokenize(node.query)
        if not terms:
            return lambda _t, _i: node.zero_terms_query == "all"
        return _match_matcher(terms, node.operator, node.minimum_should_match)
    if isinstance(node, A.MatchPhrase):
        terms = tokenize(node.query)
        if not terms:
            return lambda _t, _i: False
        if len(terms) == 1:
            return _match_matcher(terms, "or", 0)
        return _phrase_matcher(terms, node.slop)
    if isinstance(node, A.MatchAll):
        return lambda _t, _i: True
    if isinstance(node, A.MatchNone):
        return lambda _t, _i: False
    if isinstance(node, A.Bool):
        must = [_compile(c) for c in node.must + node.filter]
        should = [_compile(c) for c in node.should]
        must_not = [_compile(c) for c in node.must_not]
        msm = node.effective_msm()

        def m(toks, index) -> bool:
            if any(not c(toks, index) for c in must):
                return False
            if any(c(toks, index) for c in must_not):
                return False
            if should:
                n = sum(1 for c in should if c(toks, index))
                if msm > 0 and n < msm:
                    return False
                if not must and msm == 0 and n < 1:
                    return False
            return True

        return m
    raise ValueError(f"percolator does not support: {type(node).__name__}")


def compile_queries(queries: Dict[str, dict]) -> List[Tuple[str, Matcher]]:
    """{query_id: DSL} -> [(query_id, matcher)] (driver-side, once)."""
    out = []
    for qid, dsl in queries.items():
        node = dsl_mod.parse(dsl)
        out.append((qid, _compile(node)))
    return out


def percolate(docs, queries: Dict[str, dict], text_col: str = "content",
              id_col: str = "docId"):
    """DataFrame of documents -> DataFrame(doc_id, query_id) of every
    (document, stored query) match. One pass, no shuffle."""
    compiled = compile_queries(queries)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from opensearch_spark.analysis.analyzer import tokenize_pandas

        for b in batches:
            if not len(b):
                continue
            toks_series = tokenize_pandas(b[text_col])
            out_doc, out_q = [], []
            for doc_id, toks in zip(b[id_col].tolist(), toks_series.tolist()):
                index: Dict[str, List[int]] = {}
                for pos, t in enumerate(toks):
                    index.setdefault(t, []).append(pos)
                for qid, matcher in compiled:
                    if matcher(toks, index):
                        out_doc.append(doc_id)
                        out_q.append(qid)
            yield pd.DataFrame({"doc_id": out_doc, "query_id": out_q})

    return docs.select(id_col, text_col).mapInPandas(
        fn, schema="doc_id long, query_id string"
    )
