"""flat_object field type (reference: ``server/src/main/java/org/
opensearch/index/mapper/FlatObjectFieldMapper.java:80``).

The reference flattens an arbitrary JSON object into two keyword
streams — leaf VALUES under the root field name, and ``path=value``
pairs under ``<field>._valueAndPath`` — so term-level queries work on
any leaf without per-key mappings:

- a term query on the ROOT field matches docs where ANY leaf value
  equals the term;
- a term query on ``field.path.to.key`` matches docs whose leaf at
  that dotted path equals the term;
- arrays are multi-valued (elements flatten under the SAME path, no
  index in the path), objects recurse with dot-joined keys.

Spark shape: ``flatten_json`` explodes each document's JSON column
into (id, path, value) rows once — an Arrow-batched ``mapInPandas``
(JSON is schema-less, so Catalyst's ``from_json`` cannot express the
recursion) — and every query is a pushdown-able filter + semi-join on
that flattened table. At scale the flattened table is written once and
reused (same pattern as the postings side-tables); values stringify
the way the reference's keyword stream does (strings verbatim,
numbers/booleans/null in JSON notation).
"""

from __future__ import annotations

import json
from typing import Iterator, Optional

from pyspark.sql import DataFrame, functions as F


def _leaf_str(v) -> str:
    if isinstance(v, str):
        return v
    return json.dumps(v)


def _flatten(obj, prefix: str, out: list) -> None:
    if isinstance(obj, dict):
        for k, v in obj.items():
            _flatten(v, f"{prefix}.{k}" if prefix else str(k), out)
    elif isinstance(obj, list):
        for v in obj:
            _flatten(v, prefix, out)
    else:
        out.append((prefix, _leaf_str(obj)))


def flatten_json(df: DataFrame, col: str, id_col: str = "docId") -> DataFrame:
    """(id, path, value) rows for every JSON leaf of ``df[col]``."""
    import pandas as pd

    id_type = df.schema[id_col].dataType.simpleString()
    src = df.select(F.col(id_col).alias("_id"), F.col(col).alias("_j"))

    def fn(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            ids, paths, vals = [], [], []
            for i, j in zip(pdf["_id"], pdf["_j"]):
                if j is None:
                    continue
                leaves: list = []
                try:
                    _flatten(json.loads(j), "", leaves)
                except (ValueError, TypeError):
                    continue  # malformed JSON indexes nothing
                for p, v in leaves:
                    ids.append(i)
                    paths.append(p)
                    vals.append(v)
            yield pd.DataFrame({id_col: ids, "path": paths, "value": vals})

    return src.mapInPandas(fn, f"{id_col} {id_type}, path string, value string")


def flat_term(flat: DataFrame, value: str, path: Optional[str] = None,
              id_col: str = "docId") -> DataFrame:
    """ids whose flat_object has a leaf equal to ``value`` — at the
    dotted ``path`` when given, at ANY path otherwise (root-field term
    query)."""
    cond = F.col("value") == value
    if path is not None:
        cond = cond & (F.col("path") == path)
    return flat.where(cond).select(id_col).distinct()


def flat_prefix(flat: DataFrame, prefix: str, path: Optional[str] = None,
                id_col: str = "docId") -> DataFrame:
    cond = F.col("value").startswith(prefix)
    if path is not None:
        cond = cond & (F.col("path") == path)
    return flat.where(cond).select(id_col).distinct()


def flat_exists(flat: DataFrame, path: str, id_col: str = "docId") -> DataFrame:
    """ids having ANY leaf at ``path`` (or under it — a sub-object
    counts as existing, like the reference's path stream)."""
    cond = (F.col("path") == path) | F.col("path").startswith(path + ".")
    return flat.where(cond).select(id_col).distinct()
