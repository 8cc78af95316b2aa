"""Differential property test for the Painless transpiler: randomly
generated statement scripts are executed two ways — (a) transpiled to
one Spark SQL expression by search/painless.py and evaluated by
Catalyst over a small typed frame, (b) executed directly by a tiny
Python reference interpreter built alongside each generated script —
and the per-row results must agree (exact for int/str/bool, 1e-9
relative for floats).

Generation stays inside the DOCUMENTED subset and its documented
numeric semantics (Spark `/` is double division; `%` keeps the
dividend's sign; int-family declarations truncate toward zero; `+`
concatenates when a side is statically String; `if`/ternary conditions
are never null here — the corpus columns are non-null). Denominators
are non-zero literals so neither side divides by zero.
"""

import math
import random

import pytest

from opensearch_spark.search.painless import painless_to_sql

COLS = {"n": "long", "m": "long", "x": "double", "s": "string"}
STR_POOL = ["aa", "bb", "cc", "dd"]


def _trunc(v):
    return int(math.trunc(v))


def _rem(a, b):
    # Java/Spark %: sign of the dividend
    r = a - b * _trunc(a / b) if isinstance(a, float) or isinstance(b, float) \
        else a - b * int(a / b) if b != 0 else 0
    return r


class Gen:
    """Generates (painless fragment, python eval fn, static type)."""

    def __init__(self, rng, params):
        self.rng = rng
        self.params = params

    # -- typed expression generators -----------------------------------

    def num(self, depth=0, env_types=None):
        r = self.rng
        env_types = env_types or {}
        choices = ["lit_i", "lit_f", "doc_n", "doc_m", "doc_x", "score",
                   "param"]
        num_vars = [v for v, t in env_types.items() if t == "num"]
        if num_vars:
            choices += ["var"] * 2
        choices += ["mconst"]
        if depth < 3:
            choices += ["add", "sub", "mul", "div", "rem", "tern",
                        "mmin", "mabs", "mfloor"]
        c = r.choice(choices)
        if c == "lit_i":
            v = r.randint(-9, 20)
            return (str(v) if v >= 0 else f"(0 - {-v})",
                    lambda row, env, v=v: v)
        if c == "lit_f":
            v = round(r.uniform(-4, 9), 3)
            return (repr(abs(v)) if v >= 0 else f"(0 - {abs(v)!r})",
                    lambda row, env, v=v: v)
        if c == "doc_n":
            return "doc['n'].value", lambda row, env: row["n"]
        if c == "doc_m":
            return "doc.m.value", lambda row, env: row["m"]
        if c == "doc_x":
            return "doc['x'].value", lambda row, env: row["x"]
        if c == "score":
            return "_score", lambda row, env: row["score"]
        if c == "mconst":
            if r.random() < 0.5:
                return "Math.PI", lambda row, env: math.pi
            return "Math.E", lambda row, env: math.e
        if c == "param":
            k = r.choice([k for k, v in self.params.items()
                          if isinstance(v, (int, float))
                          and not isinstance(v, bool)])
            return f"params.{k}", lambda row, env, v=self.params[k]: v
        if c == "var":
            name = r.choice(num_vars)
            return name, lambda row, env, n=name: env[n]
        if c in ("add", "sub", "mul"):
            a_s, a_f = self.num(depth + 1, env_types)
            b_s, b_f = self.num(depth + 1, env_types)
            op = {"add": "+", "sub": "-", "mul": "*"}[c]
            py = {"add": lambda p, q: p + q, "sub": lambda p, q: p - q,
                  "mul": lambda p, q: p * q}[c]
            return (f"({a_s} {op} {b_s})",
                    lambda row, env, af=a_f, bf=b_f, py=py:
                    py(af(row, env), bf(row, env)))
        if c == "div":
            a_s, a_f = self.num(depth + 1, env_types)
            d = r.choice([2, 3, 4, 5, 7, 2.5])
            return (f"({a_s} / {d})",
                    lambda row, env, af=a_f, d=d: af(row, env) / d)
        if c == "rem":
            a_s, a_f = self.num(depth + 1, env_types)
            d = r.choice([2, 3, 5, 7])
            return (f"({a_s} % {d})",
                    lambda row, env, af=a_f, d=d: _rem(af(row, env), d))
        if c == "tern":
            c_s, c_f = self.boolean(depth + 1, env_types)
            a_s, a_f = self.num(depth + 1, env_types)
            b_s, b_f = self.num(depth + 1, env_types)
            return (f"({c_s} ? {a_s} : {b_s})",
                    lambda row, env, cf=c_f, af=a_f, bf=b_f:
                    af(row, env) if cf(row, env) else bf(row, env))
        if c == "mmin":
            a_s, a_f = self.num(depth + 1, env_types)
            b_s, b_f = self.num(depth + 1, env_types)
            return (f"Math.min({a_s}, {b_s})",
                    lambda row, env, af=a_f, bf=b_f:
                    min(af(row, env), bf(row, env)))
        if c == "mabs":
            a_s, a_f = self.num(depth + 1, env_types)
            return (f"Math.abs({a_s})",
                    lambda row, env, af=a_f: abs(af(row, env)))
        if c == "mfloor":
            a_s, a_f = self.num(depth + 1, env_types)
            return (f"Math.floor({a_s})",
                    lambda row, env, af=a_f: math.floor(af(row, env)))
        raise AssertionError(c)

    def string(self, depth=0, env_types=None):
        """String-typed expr with at least one STATICALLY-string side
        in every concat (the documented tag rule)."""
        r = self.rng
        env_types = env_types or {}
        str_vars = [v for v, t in env_types.items() if t == "str"]
        choices = ["lit", "param"]
        if str_vars:
            choices += ["var"] * 2
        if depth < 2:
            choices += ["cat_doc", "cat2"]
        c = r.choice(choices)
        if c == "lit":
            v = r.choice(STR_POOL)
            return f"'{v}'", (lambda row, env, v=v: v)
        if c == "param":
            k = [k for k, v in self.params.items() if isinstance(v, str)][0]
            return f"params.{k}", (lambda row, env, v=self.params[k]: v)
        if c == "var":
            name = r.choice(str_vars)
            return name, lambda row, env, n=name: env[n]
        if c == "cat_doc":
            a_s, a_f = self.string(depth + 1, env_types)
            return (f"({a_s} + doc['s'].value)",
                    lambda row, env, af=a_f: af(row, env) + row["s"])
        a_s, a_f = self.string(depth + 1, env_types)
        b_s, b_f = self.string(depth + 1, env_types)
        return (f"({a_s} + {b_s})",
                lambda row, env, af=a_f, bf=b_f:
                af(row, env) + bf(row, env))

    def boolean(self, depth=0, env_types=None):
        r = self.rng
        choices = ["cmp", "scmp"]
        if depth < 2:
            choices += ["and", "or", "not"]
        c = r.choice(choices)
        if c == "cmp":
            a_s, a_f = self.num(depth + 1, env_types)
            b_s, b_f = self.num(depth + 1, env_types)
            op = r.choice(["<", "<=", ">", ">=", "==", "!="])
            py = {"<": lambda p, q: p < q, "<=": lambda p, q: p <= q,
                  ">": lambda p, q: p > q, ">=": lambda p, q: p >= q,
                  "==": lambda p, q: p == q, "!=": lambda p, q: p != q}[op]
            return (f"({a_s} {op} {b_s})",
                    lambda row, env, af=a_f, bf=b_f, py=py:
                    py(af(row, env), bf(row, env)))
        if c == "scmp":
            v = self.rng.choice(STR_POOL)
            return (f"(doc['s'].value == '{v}')",
                    lambda row, env, v=v: row["s"] == v)
        if c == "not":
            a_s, a_f = self.boolean(depth + 1, env_types)
            return f"(!{a_s})", lambda row, env, af=a_f: not af(row, env)
        a_s, a_f = self.boolean(depth + 1, env_types)
        b_s, b_f = self.boolean(depth + 1, env_types)
        if c == "and":
            return (f"({a_s} && {b_s})",
                    lambda row, env, af=a_f, bf=b_f:
                    af(row, env) and bf(row, env))
        return (f"({a_s} || {b_s})",
                lambda row, env, af=a_f, bf=b_f:
                af(row, env) or bf(row, env))

    # -- statements ------------------------------------------------------

    def script(self):
        """A statement script returning a NUMBER: declarations,
        assignments, if/else (possibly returning), final return.
        Returns (source, python_fn)."""
        r = self.rng
        src_parts = []
        stmts = []          # python closures: fn(row, env) -> ret | None
        env_types = {}

        n_decl = r.randint(1, 3)
        convs = {}   # declared conversion re-applied on EVERY assignment
        for i in range(n_decl):
            name = f"v{i}"
            kind = r.choice(["def", "int", "double", "String"])
            if kind == "String":
                e_s, e_f = self.string(0, env_types)
                env_types[name] = "str"
                conv = lambda v: v
            else:
                e_s, e_f = self.num(0, env_types)
                env_types[name] = "num"
                conv = (_trunc if kind == "int"
                        else float if kind == "double" else (lambda v: v))
            convs[name] = conv
            src_parts.append(f"{kind} {name} = {e_s};")
            stmts.append(("decl", name, e_f, conv))

        # optionally an if/else mutating a declared num var or returning
        num_vars = [v for v, t in env_types.items() if t == "num"]
        if num_vars and r.random() < 0.8:
            c_s, c_f = self.boolean(0, env_types)
            tgt = r.choice(num_vars)
            a_s, a_f = self.num(0, env_types)
            b_s, b_f = self.num(0, env_types)
            if r.random() < 0.5:
                src_parts.append(
                    f"if ({c_s}) {{ {tgt} = {a_s}; }} "
                    f"else {{ {tgt} += {b_s}; }}")
                stmts.append(("ifassign", tgt, c_f, a_f, b_f, convs[tgt]))
            else:
                src_parts.append(f"if ({c_s}) {{ return {a_s}; }}")
                stmts.append(("ifreturn", c_f, a_f))

        e_s, e_f = self.num(0, env_types)
        src_parts.append(f"return {e_s};")
        stmts.append(("return", e_f))
        source = " ".join(src_parts)

        def run(row):
            env = {}
            for st in stmts:
                if st[0] == "decl":
                    _tag, name, f, conv = st
                    env[name] = conv(f(row, env))
                elif st[0] == "ifassign":
                    _tag, tgt, cf, af, bf, conv = st
                    if cf(row, env):
                        env[tgt] = conv(af(row, env))
                    else:
                        env[tgt] = conv(env[tgt] + bf(row, env))
                elif st[0] == "ifreturn":
                    _tag, cf, af = st
                    if cf(row, env):
                        return af(row, env)
                else:
                    return st[1](row, env)
            raise AssertionError("no return")

        return source, run


def test_painless_statements_differential(spark):
    rng = random.Random(1234)
    params = {"p": 3, "q": 2.5, "t": "zz"}
    rows = []
    for i in range(12):
        rows.append((i - 4, (i * 7) % 11 - 3, round(rng.uniform(-3, 6), 3),
                     rng.choice(STR_POOL), round(rng.uniform(0.1, 5), 4)))
    df = spark.createDataFrame(
        rows, "n long, m long, x double, s string, score double")
    pdf_rows = [dict(zip(["n", "m", "x", "s", "score"], t)) for t in rows]

    gen = Gen(rng, params)
    scripts = []
    for _ in range(60):
        scripts.append(gen.script())
    from pyspark.sql import functions as F

    sqls = [painless_to_sql(src, params) for src, _run in scripts]
    out = df.select(
        *[F.expr(sql).alias(f"e{i}") for i, sql in enumerate(sqls)]
    ).collect()
    n_checked = 0
    for ri, row in enumerate(out):
        for i, (src, run) in enumerate(scripts):
            want = run(pdf_rows[ri])
            got = row[f"e{i}"]
            if isinstance(want, float) or isinstance(got, float):
                assert got == pytest.approx(want, rel=1e-9, abs=1e-9), (
                    src, pdf_rows[ri], got, want)
            else:
                assert got == want, (src, sqls[i], pdf_rows[ri], got, want)
            n_checked += 1
    assert n_checked == 60 * len(rows)


def test_painless_update_differential(spark):
    """Update-script differential: the transpiled {column: expr} map
    applied as one projection equals sequential Python execution of
    the same ctx._source statements."""
    rng = random.Random(99)
    params = {"p": 5, "q": 1.5, "t": "uu"}
    gen = Gen(rng, params)
    from pyspark.sql import functions as F
    from opensearch_spark.search.painless import painless_update_to_sql

    rows = [(i, (i * 3) % 7 - 2, float(i) / 2, rng.choice(STR_POOL))
            for i in range(10)]
    df = spark.createDataFrame(rows, "n long, m long, x double, s string")
    pdf_rows = [dict(zip(["n", "m", "x", "s"], t)) for t in rows]

    for _ in range(25):
        # ctx._source.n mutated, then read by a second assignment
        # (no _score in the update frame)
        a_s, a_f = gen.num(0, {})
        while "_score" in a_s:
            a_s, a_f = gen.num(0, {})
        b_s, b_f = gen.num(0, {})
        while "_score" in b_s:
            b_s, b_f = gen.num(0, {})
        src = (f"ctx._source.n = ctx._source.n + {a_s}; "
               f"ctx._source.m = ctx._source.n * 2 + {b_s};")
        colmap = painless_update_to_sql(src, params)
        out = df.select(*[
            (F.expr(colmap[c]).alias(c) if c in colmap else F.col(c))
            for c in df.columns
        ]).collect()
        for ri, row in enumerate(out):
            base = dict(pdf_rows[ri])
            ctx = dict(base)
            ctx["n"] = ctx["n"] + a_f(base, {})
            ctx["m"] = ctx["n"] * 2 + b_f(base, {})
            assert row["n"] == pytest.approx(ctx["n"], rel=1e-9), src
            assert row["m"] == pytest.approx(ctx["m"], rel=1e-9), src


def test_painless_loops_differential(spark):
    """Counted-loop differential: randomly generated accumulation loops
    (const bounds, doc-dependent bodies, optional const-guarded if)
    transpile-unroll to one expression that matches a direct Python
    execution of the loop."""
    rng = random.Random(777)
    params = {"p": 3, "q": 2.5, "t": "zz"}
    rows = []
    for i in range(10):
        rows.append((i - 3, (i * 5) % 9 - 2, round(rng.uniform(-2, 5), 3),
                     rng.choice(STR_POOL), round(rng.uniform(0.1, 4), 4)))
    df = spark.createDataFrame(
        rows, "n long, m long, x double, s string, score double")
    pdf_rows = [dict(zip(["n", "m", "x", "s", "score"], t)) for t in rows]

    gen = Gen(rng, params)
    scripts = []
    for _ in range(25):
        a = rng.randint(0, 2)
        b = a + rng.randint(0, 4)
        env_types = {"acc": "num", "i": "num"}
        init_s, init_f = gen.num(0, {})
        body_s, body_f = gen.num(0, env_types)
        use_if = rng.random() < 0.5
        use_while = rng.random() < 0.3
        if use_while:
            header = (f"int i = {a}; double acc = {init_s}; "
                      f"while (i < {b})")
            update = " i++; "
        else:
            header = (f"double acc = {init_s}; "
                      f"for (int i = {a}; i < {b}; i++)")
            update = ""
        if use_if:
            body = (f"{{ if (i % 2 == 0) {{ acc += {body_s}; }} "
                    f"else {{ acc -= {body_s}; }}{update} }}")
        else:
            body = f"{{ acc += {body_s};{update} }}"
        src = f"{header} {body} return acc;"

        def run(row, a=a, b=b, init_f=init_f, body_f=body_f,
                use_if=use_if):
            env = {"acc": float(init_f(row, {}))}
            for i in range(a, b):
                env["i"] = i
                v = body_f(row, env)
                if use_if and i % 2 == 1:
                    env["acc"] = float(env["acc"] - v)
                else:
                    env["acc"] = float(env["acc"] + v)
            return env["acc"]

        scripts.append((src, run))

    from pyspark.sql import functions as F

    sqls = [painless_to_sql(src, params) for src, _run in scripts]
    out = df.select(
        *[F.expr(sql).alias(f"e{i}") for i, sql in enumerate(sqls)]
    ).collect()
    for ri, row in enumerate(out):
        for i, (src, run) in enumerate(scripts):
            want = run(pdf_rows[ri])
            got = row[f"e{i}"]
            assert got == pytest.approx(want, rel=1e-9, abs=1e-9), (
                src, sqls[i], pdf_rows[ri], got, want)


def test_painless_methods_differential(spark):
    """String/number method calls: Catalyst evaluation equals the Java
    semantics (0-based indexOf, end-exclusive substring, literal
    replace, truncating casts)."""
    import math as _math

    cases = [
        ("doc['s'].value.contains('a') ? 1 : 0",
         lambda r: 1 if "a" in r["s"] else 0),
        ("doc['s'].value.startsWith('b') ? 1 : 0",
         lambda r: 1 if r["s"].startswith("b") else 0),
        ("doc['s'].value.endsWith('c') ? 1 : 0",
         lambda r: 1 if r["s"].endswith("c") else 0),
        ("doc['s'].value.length() + 1", lambda r: len(r["s"]) + 1),
        ("doc['s'].value.indexOf('b')", lambda r: r["s"].find("b")),
        ("doc['s'].value.toUpperCase()", lambda r: r["s"].upper()),
        ("doc['s'].value.substring(1)", lambda r: r["s"][1:]),
        ("doc['s'].value.substring(0, 1)", lambda r: r["s"][0:1]),
        ("doc['s'].value.replace('a', 'xy')",
         lambda r: r["s"].replace("a", "xy")),
        ("doc['s'].value.isEmpty() ? 1 : 0",
         lambda r: 1 if len(r["s"]) == 0 else 0),
        ("doc['s'].value.equals('aa') ? 3 : 4",
         lambda r: 3 if r["s"] == "aa" else 4),
        ("('  ' + doc['s'].value).trim()", lambda r: r["s"].strip()),
        ("(int)(doc['x'].value)", lambda r: int(_math.trunc(r["x"]))),
        ("doc['x'].value.intValue()", lambda r: int(_math.trunc(r["x"]))),
        ("doc['n'].value.doubleValue() / 2", lambda r: r["n"] / 2),
    ]
    rows = [(i - 3, round((i * 1.7) - 4.3, 3), s)
            for i, s in enumerate(STR_POOL + ["", "abc", "aXa", "cba"])]
    df = spark.createDataFrame(rows, "n long, x double, s string")
    pdf_rows = [dict(zip(["n", "x", "s"], t)) for t in rows]

    from pyspark.sql import functions as F

    sqls = [painless_to_sql(src) for src, _f in cases]
    out = df.select(
        *[F.expr(sql).alias(f"e{i}") for i, sql in enumerate(sqls)]
    ).collect()
    for ri, row in enumerate(out):
        for i, (src, f) in enumerate(cases):
            want = f(pdf_rows[ri])
            got = row[f"e{i}"]
            if isinstance(want, float):
                assert got == pytest.approx(want, rel=1e-12), (src, got)
            else:
                assert got == want, (src, sqls[i], pdf_rows[ri], got, want)
