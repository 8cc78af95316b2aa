"""Highlighting — the fetch-phase subphase producing snippet fragments
with matched terms wrapped in tags (reference: ``search/fetch/subphase``
highlighters; SURVEY §3.1 step 5).

Spark-first: a pandas UDF over the (small) fetched top-k rows. Token
offsets come from the SAME analyzer as indexing, so highlighted spans are
exactly the tokens that matched.
"""

from __future__ import annotations

from typing import List

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from opensearch_spark.analysis.analyzer import tokenize, tokenize_offsets

PRE, POST = "<em>", "</em>"


def make_fragments(
    text: str, terms: set, frag_size: int = 100, n_frags: int = 2
) -> List[str]:
    """Build up to ``n_frags`` fragments of ~frag_size chars centered on
    matched-term spans, earliest-first; matched tokens wrapped in tags."""
    if not text:
        return []
    spans = [(s, e) for t, s, e in tokenize_offsets(text) if t in terms]
    if not spans:
        return []
    frags: List[str] = []
    used_until = -1
    for s, e in spans:
        if s <= used_until:
            continue
        lo = max(0, s - frag_size // 2)
        hi = min(len(text), lo + frag_size)
        inside = [(a, b) for a, b in spans if a >= lo and b <= hi]
        out, cur = [], lo
        for a, b in inside:
            out.append(text[cur:a]); out.append(PRE); out.append(text[a:b]); out.append(POST)
            cur = b
        out.append(text[cur:hi])
        frags.append("".join(out))
        used_until = hi
        if len(frags) >= n_frags:
            break
    return frags


def highlight(
    fetched: DataFrame,
    query_text: str,
    text_col: str = "content",
    frag_size: int = 100,
    n_frags: int = 2,
    out_col: str = "highlights",
) -> DataFrame:
    """Add an ``array<string>`` fragment column (default name
    ``highlights``) to fetched hit rows; multi-field highlight calls
    this once per field with distinct ``out_col`` names."""
    terms = set(tokenize(query_text))

    @F.pandas_udf("array<string>")
    def hl(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: make_fragments(t or "", terms, frag_size, n_frags))

    return fetched.withColumn(out_col, hl(F.col(text_col)))
