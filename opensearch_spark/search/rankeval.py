"""Ranking evaluation API (`_rank_eval`).

Reference: ``modules/rank-eval/src/main/java/org/opensearch/index/
rankeval/`` — RankEvalRequest carries rated search requests; the
response reports a combined metric score plus per-query quality and
unrated-document details. Metrics: PrecisionAtK.java:64,
RecallAtK.java, MeanReciprocalRank.java, DiscountedCumulativeGain.java,
ExpectedReciprocalRank.java.

Spark re-expression: all rated queries run through ONE ``msearch``
batch (one Spark job — the reference fans out one msearch too,
TransportRankEvalAction.java), then the metric math is driver-side
arithmetic over the tiny top-k result set. Metric definitions follow
the reference classes:

- precision@k: relevant-retrieved / retrieved (ignoring unlabeled when
  ``ignore_unlabeled``; relevant = rating >= relevant_rating_threshold)
- recall@k: relevant-retrieved / total-relevant-in-ratings
- mean reciprocal rank: 1 / rank of the first relevant hit
- dcg@k: sum (2^rating - 1) / log2(rank + 1); ndcg normalizes by the
  ideal ordering of the RATED set
- err@k: expected reciprocal rank with graded relevance
  (ExpectedReciprocalRank.java: R = (2^g - 1) / 2^max_g)
"""

from __future__ import annotations

import math
from typing import Dict, List, Sequence


def _rating_map(ratings: Sequence[dict]) -> Dict[int, int]:
    return {int(r["_id"]): int(r["rating"]) for r in ratings}


def _metric_value(metric: str, params: dict, ranked_ids: List[int],
                  rmap: Dict[int, int]) -> float:
    k = int(params.get("k", 10))
    thr = int(params.get("relevant_rating_threshold", 1))
    top = ranked_ids[:k]
    if metric == "precision":
        if params.get("ignore_unlabeled", False):
            top = [d for d in top if d in rmap]
        if not top:
            return 0.0
        rel = sum(1 for d in top if rmap.get(d, 0) >= thr)
        return rel / len(top)
    if metric == "recall":
        total_rel = sum(1 for g in rmap.values() if g >= thr)
        if total_rel == 0:
            return 0.0
        rel = sum(1 for d in top if rmap.get(d, 0) >= thr)
        return rel / total_rel
    if metric == "mean_reciprocal_rank":
        for i, d in enumerate(top):
            if rmap.get(d, 0) >= thr:
                return 1.0 / (i + 1)
        return 0.0
    if metric == "dcg":
        def dcg(gains: Sequence[int]) -> float:
            return sum(
                (2 ** g - 1) / math.log2(i + 2) for i, g in enumerate(gains)
            )
        val = dcg([rmap.get(d, 0) for d in top])
        if not params.get("normalize", False):
            return val
        ideal = dcg(sorted(rmap.values(), reverse=True)[:k])
        return val / ideal if ideal > 0 else 0.0
    if metric == "expected_reciprocal_rank":
        max_g = int(params.get("maximum_relevance", max(rmap.values(), default=1)))
        p_look = 1.0
        err = 0.0
        for i, d in enumerate(top):
            g = rmap.get(d, 0)
            r = (2 ** g - 1) / (2 ** max_g)
            err += p_look * r / (i + 1)
            p_look *= 1.0 - r
        return err
    raise ValueError(f"unknown rank_eval metric {metric!r}")


def rank_eval(engine, body: dict) -> dict:
    """Evaluate rated search requests (reference: RankEvalSpec /
    TransportRankEvalAction). ``body``::

        {"requests": [{"id": ..., "request": {"query": ...},
                       "ratings": [{"_id": docId, "rating": int}, ...]}],
         "metric": {"precision": {"k": 10, ...}}}

    Returns {"metric_score", "details": {id: {"metric_score",
    "unrated_docs", "hits": [(docId, rating|None), ...]}}}. One msearch
    job executes every rated request."""
    requests = body["requests"]
    ((metric, params),) = body["metric"].items()
    k = int(params.get("k", 10))
    queries = [r["request"]["query"] for r in requests]
    rows = engine.msearch(queries, k=k).collect()
    by_qid: Dict[int, List[int]] = {}
    for r in rows:
        by_qid.setdefault(int(r["qid"]), []).append(int(r["docId"]))
    details = {}
    total = 0.0
    for qid, req in enumerate(requests):
        rmap = _rating_map(req.get("ratings", []))
        ranked = by_qid.get(qid, [])
        score = _metric_value(metric, params, ranked, rmap)
        total += score
        details[req.get("id", str(qid))] = {
            "metric_score": score,
            "unrated_docs": sum(1 for d in ranked[:k] if d not in rmap),
            "hits": [(d, rmap.get(d)) for d in ranked[:k]],
        }
    return {
        "metric_score": total / len(requests) if requests else 0.0,
        "details": details,
    }
