"""Ad-hoc strict (bitwise) engine-vs-oracle check for named queries.

Usage: python tests/strict_check.py <sf_dir> <query> [<query> ...]
       python tests/strict_check.py --lint [<query> ...]
Mimics the driver's hash-based compare: sorts columns by name, sorts
rows, and requires EXACT value equality (no float tolerance), PLUS a
dtype-kind check (int vs float) because the driver's hash is
dtype-sensitive: DuckDB types bare integer sum() as HUGEINT, which
pandas fetchdf materializes as float64 while the engine returns int64
— values equal, hash different (round-4 ft_flat_object/d_semdedup).

--lint runs `DESCRIBE <oracle_sql>` in DuckDB (no Spark needed) over
every registered oracle and flags any HUGEINT/INT128 column in the
FINAL output schema: those must be CAST(... AS BIGINT) in the SQL.
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


def lint(names=None) -> int:
    """Flag oracle SQL whose final output schema contains HUGEINT.

    DuckDB's DESCRIBE gives the output column types without running
    the query against real data; tiny empty views stand in for the
    parquet tables so every oracle parses.
    """
    con = duckdb.connect()
    import pandas as pd  # noqa: F401

    # EXACT copies of the /root/testdata parquet schemas (verified with
    # DESCRIBE; review r5 found the previous guesses diverged and broke
    # the no-testdata lint path). Keep INTEGER where the data really is
    # INTEGER — sum(INTEGER) -> HUGEINT is precisely what the lint must
    # catch.
    ddl = {
        "region": "r_regionkey INTEGER, r_name VARCHAR",
        "nation": "n_nationkey INTEGER, n_name VARCHAR, n_regionkey INTEGER",
        "customer": ("c_custkey BIGINT, c_name VARCHAR, c_nationkey INTEGER,"
                     " c_acctbal DOUBLE, c_mktsegment VARCHAR"),
        "supplier": ("s_suppkey BIGINT, s_name VARCHAR, s_nationkey INTEGER,"
                     " s_acctbal DOUBLE"),
        "part": ("p_partkey BIGINT, p_name VARCHAR, p_brand VARCHAR,"
                 " p_type VARCHAR, p_size INTEGER, p_retailprice DOUBLE"),
        "orders": ("o_orderkey BIGINT, o_custkey BIGINT,"
                   " o_orderstatus VARCHAR, o_totalprice DOUBLE,"
                   " o_orderdate TIMESTAMP, o_orderpriority VARCHAR"),
        "lineitem": ("l_orderkey BIGINT, l_partkey BIGINT, l_suppkey BIGINT,"
                     " l_linenumber INTEGER, l_quantity DOUBLE,"
                     " l_extendedprice DOUBLE, l_discount DOUBLE,"
                     " l_tax DOUBLE, l_returnflag VARCHAR,"
                     " l_linestatus VARCHAR, l_shipdate TIMESTAMP"),
        "events": ("event_id BIGINT, ts TIMESTAMP, user_id BIGINT,"
                   " event_type VARCHAR, value DOUBLE, props VARCHAR"),
        "documents": ("doc_id BIGINT, text VARCHAR, lang VARCHAR,"
                      " source VARCHAR, n_chars BIGINT"),
        "embeddings": "vec_id BIGINT, embedding FLOAT[], label INTEGER",
    }
    # Real-table fallback: DESCRIBE needs correct column NAMES/TYPES,
    # use the actual sf0.001 parquet when present (exact schemas).
    sf = os.environ.get("SPARK_GRAFT_LINT_SF", "/root/testdata/sf0.001")
    for t in TABLES:
        p = f"{sf}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"create view {t} as select * from '{p}'")
        else:
            con.execute(f"create table {t} ({ddl[t]})")
    sqls = E.oracle_sql()
    rc = 0
    items = [(n, sqls[n]) for n in (names or sorted(sqls))]
    for name, sql in items:
        try:
            desc = con.execute(f"DESCRIBE {sql}").fetchall()
        except Exception as exc:  # pragma: no cover - parse failure
            print(f"{name}: DESCRIBE FAILED: {str(exc)[:120]}")
            rc = 1
            continue
        bad = [(c, ty) for (c, ty, *_rest) in desc
               if "HUGEINT" in ty.upper() or "INT128" in ty.upper()]
        if bad:
            print(f"{name}: HUGEINT OUTPUT {bad} — CAST(... AS BIGINT)")
            rc = 1
    print(f"lint: {len(items)} oracles checked, rc={rc}")
    return rc


def main() -> int:
    if sys.argv[1] == "--lint":
        return lint(sys.argv[2:] or None)
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
        kind_bad = []
        for c in cols:
            gk = np.asarray(g[c].to_numpy()).dtype.kind
            ek = np.asarray(e[c].to_numpy()).dtype.kind
            num = {"i", "u", "f"}
            if gk in num and ek in num and (gk == "f") != (ek == "f"):
                kind_bad.append((c, str(g[c].dtype), str(e[c].dtype)))
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
        elif kind_bad:
            print(f"{name}: DTYPE KIND MISMATCH {kind_bad} "
                  "(driver hash is dtype-sensitive)")
            rc = 1
        else:
            print(f"{name}: OK ({len(g)} rows, exact)")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
