"""Ad-hoc strict (bitwise) engine-vs-oracle check for named queries.

Usage: python tests/strict_check.py <sf_dir> <query> [<query> ...]
Mimics the driver's hash-based compare: sorts columns by name, sorts
rows, and requires EXACT value equality (no float tolerance).
"""

import os
import sys

import duckdb
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def main() -> int:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    from opensearch_spark.session import get_spark

    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"create view {t} as select * from '{p}'")
    qs = E.queries()
    sqls = E.oracle_sql()
    rc = 0
    for name in names:
        got = qs[name](spark, sf_dir).toPandas()
        exp = con.execute(sqls[name]).fetchdf()
        cols = sorted(got.columns)
        if sorted(exp.columns) != cols:
            print(f"{name}: SCHEMA MISMATCH {cols} vs {sorted(exp.columns)}")
            rc = 1
            continue
        g = got[cols].sort_values(cols).reset_index(drop=True)
        e = exp[cols].sort_values(cols).reset_index(drop=True)
        if len(g) != len(e):
            print(f"{name}: ROWS {len(g)} vs {len(e)}")
            rc = 1
            continue
        bad = []
        for c in cols:
            if str(g[c].dtype).startswith("datetime64"):
                g[c] = g[c].astype("datetime64[ns]")
            if str(e[c].dtype).startswith("datetime64"):
                e[c] = e[c].astype("datetime64[ns]")
            gv, ev = g[c].to_numpy(), e[c].to_numpy()
            if np.issubdtype(gv.dtype, np.floating) or np.issubdtype(
                ev.dtype, np.floating
            ):
                gn = np.asarray(gv, dtype=np.float64)
                en = np.asarray(ev, dtype=np.float64)
                eq = (gn == en) | (np.isnan(gn) & np.isnan(en))
            else:
                eq = np.asarray(gv).astype(str) == np.asarray(ev).astype(str)
            if not eq.all():
                i = int(np.flatnonzero(~eq)[0])
                bad.append((c, i, g[c].iloc[i], e[c].iloc[i]))
        if bad:
            print(f"{name}: VALUE MISMATCH {bad[:5]} ({len(bad)} cols)")
            rc = 1
        else:
            print(f"{name}: OK ({len(g)} rows, exact)")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
