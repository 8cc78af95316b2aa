"""Painless expression subset -> Spark SQL transpiler."""

import pytest

from opensearch_spark.search.painless import PainlessError, painless_to_sql


def test_doc_params_math_ternary():
    sql = painless_to_sql(
        "doc['n_chars'].value * params.f + Math.log(_score + 1)",
        {"f": 2.5})
    assert sql == "((`n_chars` * CAST(2.5 AS DOUBLE)) + ln((`score` + 1)))"
    sql = painless_to_sql(
        "doc['lang'].value == 'en' ? 2.0 : 0.5")
    assert sql == ("(CASE WHEN (`lang` = 'en') THEN CAST(2.0 AS DOUBLE) "
                   "ELSE CAST(0.5 AS DOUBLE) END)")


def test_doc_size_and_bool_ops():
    sql = painless_to_sql(
        "doc['subtitle'].size() > 0 && !(doc['n_chars'].value < 10)")
    assert "CASE WHEN `subtitle` IS NULL THEN 0 ELSE 1 END" in sql
    assert "AND (NOT" in sql


def test_return_and_semicolon_stripped():
    assert painless_to_sql("return 1 + 2;") == "(1 + 2)"


def test_math_variants_and_constants():
    sql = painless_to_sql("Math.pow(Math.E, Math.min(1, 2))")
    assert sql.startswith(
        "power(CAST(2.718281828459045 AS DOUBLE), least(1, 2)")
    # Math constants are DOUBLE, not DECIMAL (review r5)
    assert painless_to_sql("Math.PI / 2") == \
        "(CAST(3.141592653589793 AS DOUBLE) / 2)"
    # non-finite params bind as doubles, not column refs (review r5)
    assert painless_to_sql("params.f * 2", {"f": float("inf")}) == \
        "(CAST('Infinity' AS DOUBLE) * 2)"
    assert "NaN" in painless_to_sql("params.f", {"f": float("nan")})


def test_rejects_out_of_scope():
    for bad in ("for (i in list) {}", "while (true) { }",
                "doc['f'].values", "ctx._source.f = 1",
                "params.missing + 1",
                "if (_score > 1) { return 1; }",      # missing-return path
                "x = 1; return x",                     # undeclared variable
                "return 1; return 2;"):                # unreachable code
        with pytest.raises(PainlessError):
            painless_to_sql(bad, {})


def test_statement_subset_declarations_and_if():
    sql = painless_to_sql(
        "def w = params.w * 2; "
        "if (doc['lang'].value == 'en') { return _score * w; } "
        "else if (doc['lang'].value == 'de') { return _score + w; } "
        "return 0.0;", {"w": 3})
    # const locals store as their folded literal (keeps unrolled loops
    # compact): w = params.w * 2 = 6
    assert sql == (
        "(CASE WHEN (`lang` = 'en') THEN (`score` * 6) "
        "WHEN ((NOT coalesce((`lang` = 'en'), false)) AND (`lang` = 'de'))"
        " THEN (`score` + 6) ELSE CAST(0.0 AS DOUBLE) END)")
    # assignment merging across branches, branch-local decls dropped
    sql = painless_to_sql(
        "def b = 0; "
        "if (doc['lang'].value == 'en') { b = 1; def local = 9; } "
        "else { b += 2; } "
        "return b;")
    assert "local" not in sql
    assert sql == "(CASE WHEN (`lang` = 'en') THEN 1 ELSE 2 END)"
    # int declaration truncates like Painless's narrowing cast
    # (folded at transpile time: trunc(5 / 2) = 2)
    assert painless_to_sql("int h = 5 / 2; return h;") == "2"
    assert painless_to_sql(
        "int h = doc['n_chars'].value / 2; return h;") == \
        "CAST((`n_chars` / 2) AS BIGINT)"


def test_statement_unbraced_and_implicit_tail():
    assert painless_to_sql("if (_score > 1) return 2; return 1;") == \
        "(CASE WHEN (`score` > 1) THEN 2 ELSE 1 END)"


def test_string_concat_tagging():
    # Painless + is concat when either side is a String
    assert painless_to_sql("return 'v=' + doc['lang'].value;") == \
        "concat('v=', `lang`)"
    assert painless_to_sql(
        "String s = 'v='; return s + doc['lang'].value;") == \
        "concat('v=', `lang`)"
    assert painless_to_sql("return params.p + 1;", {"p": "x"}) == \
        "concat('x', 1)"
    # numeric + stays arithmetic
    assert painless_to_sql("return 1 + 2;") == "(1 + 2)"


def test_update_script_transpile():
    from opensearch_spark.search.painless import painless_update_to_sql

    m = painless_update_to_sql(
        "def sfx = params.sfx; "
        "if (ctx._source.n_chars % 2 == 0) "
        "{ ctx._source.text = ctx._source.text + sfx; } "
        "ctx._source.n_chars = ctx._source.n_chars + 12;",
        {"sfx": " pmark"})
    assert m["text"] == ("(CASE WHEN ((`n_chars` % 2) = 0) THEN "
                         "(concat(`text`, ' pmark')) ELSE `text` END)")
    assert m["n_chars"] == "((`n_chars` + 12))"
    for bad in ("return 1;", "def x = 1;",
                "ctx._source.f = doc['g'].value; return 1;"):
        with pytest.raises(PainlessError):
            painless_update_to_sql(bad)


def test_engine_painless_script_score(spark, tmp_path):
    """{"lang": "painless"} script_score runs verbatim and equals the
    equivalent SQL-expression script."""
    from opensearch_spark.index.build import build_index
    from opensearch_spark.search.engine import SearchEngine
    from opensearch_spark.testing.corpus import generate_corpus

    corpus = spark.createDataFrame(generate_corpus(120, seed=3))
    out = str(tmp_path / "ix")
    build_index(spark, corpus, out, n_segments=2)
    eng = SearchEngine(spark, out, corpus=corpus)
    q_painless = {"script_score": {
        "query": {"match": {"content": "def"}},
        "script": {"lang": "painless",
                   "source": "_score * params.w + Math.min(doc['lang'].value == 'python' ? 1 : 0, 1)",
                   "params": {"w": 3}},
    }}
    q_sql = {"script_score": {
        "query": {"match": {"content": "def"}},
        "script": {"source": "score * 3 + least(CASE WHEN lang = 'python' THEN 1 ELSE 0 END, 1)"},
    }}
    a = [(r["docId"], round(r["score"], 8))
         for r in eng.search(q_painless, k=10).collect()]
    b = [(r["docId"], round(r["score"], 8))
         for r in eng.search(q_sql, k=10).collect()]
    assert a == b and a


def test_null_comparisons_and_backslashes():
    assert painless_to_sql("doc['s'].value == null") == "(`s` IS NULL)"
    assert painless_to_sql("doc['s'].value != null") == "(`s` IS NOT NULL)"
    assert painless_to_sql(
        "null == doc['s'].value ? 1 : 2"
    ) == "(CASE WHEN (`s` IS NULL) THEN 1 ELSE 2 END)"
    # backslashes in literals survive Spark's escape processing
    assert painless_to_sql(r"doc['s'].value == 'a\\b'") == r"(`s` = 'a\\b')"
    assert painless_to_sql("params.p == 'x'", {"p": "a\\b"}).startswith(
        r"('a\\b'")


def test_script_source_validation():
    from opensearch_spark.search.dsl import script_source

    with pytest.raises(KeyError):
        script_source({})
    with pytest.raises(ValueError):
        script_source(None)


def test_declared_type_persists_across_reassignment():
    # review r5: String declaration keeps + as concat after reassignment
    assert painless_to_sql(
        "String s = doc['lang'].value; s = doc['lang'].value; "
        "return s + doc['lang'].value;") == "concat((`lang`), `lang`)"
    # ... including through branch merges
    sql = painless_to_sql(
        "String s = 'a'; if (_score > 1) { s = 'b'; } else { s = 'c'; } "
        "return s + doc['lang'].value;")
    assert sql.startswith("concat((CASE WHEN")
    # int-family re-applies the truncating cast on re-assignment
    # (const-folded here: trunc(7 / 2) = 3)
    assert painless_to_sql("int h = 5; h = 7 / 2; return h;") == "3"
    assert painless_to_sql(
        "int h = doc['n_chars'].value; h = h / 2; return h;") == \
        "CAST(((CAST(`n_chars` AS BIGINT) / 2)) AS BIGINT)"
    assert painless_to_sql("int h = 5; h += 1; return h;") == "6"
    # redeclaration raises (Painless forbids shadowing)
    with pytest.raises(PainlessError, match="already declared"):
        painless_to_sql("def x = 1; def x = 2; return x;")
    # ternary of two strings is a string
    assert painless_to_sql(
        "return (_score > 1 ? 'a' : 'b') + doc['lang'].value;"
    ).startswith("concat(")


def test_update_script_sequential_reads_see_pending_writes(spark, tmp_path):
    """Painless ctx._source reads after a write must see the PENDING
    value exactly once — single-projection application (review r5:
    sequential withColumn double-applied the earlier update)."""
    from opensearch_spark.index.build import build_index
    from opensearch_spark.index.reindex import update_by_query
    from opensearch_spark.search.engine import SearchEngine

    df = spark.createDataFrame(
        [(i, f"doc {i}", i * 10) for i in range(20)],
        "doc_id long, text string, n_chars long")
    out = str(tmp_path / "ix")
    build_index(spark, df, out, text_col="text", doc_id_col="doc_id",
                n_segments=2)
    eng = SearchEngine(spark, out, corpus=df, text_field="text",
                       doc_id_col="doc_id")
    res = update_by_query(
        spark, eng, out, {"match_all": {}},
        {"lang": "painless",
         "source": ("ctx._source.n_chars = ctx._source.n_chars + 1; "
                    "ctx._source.text = ctx._source.text + ' n=' + "
                    "ctx._source.n_chars;")},
        text_col="text")
    rows = {r["docId"]: (r["n_chars"], r["text"])
            for r in res["corpus"].collect()}
    # Painless truth: n_chars = 10i + 1, text suffixed with that value
    for i in range(20):
        n, t = rows[i]
        assert n == i * 10 + 1
        assert t == f"doc {i} n={i * 10 + 1}", t


def test_update_script_can_add_new_source_field(spark, tmp_path):
    """A ctx._source assignment to a NEW field must not break the
    returned corpus view — untouched docs carry NULL (review r5:
    unionByName raised after the index was already mutated)."""
    from opensearch_spark.index.build import build_index
    from opensearch_spark.index.reindex import update_by_query
    from opensearch_spark.search.engine import SearchEngine

    df = spark.createDataFrame(
        [(i, f"doc {i}", "en" if i % 2 else "de") for i in range(10)],
        "doc_id long, text string, lang string")
    out = str(tmp_path / "ix")
    build_index(spark, df, out, text_col="text", doc_id_col="doc_id",
                n_segments=2)
    eng = SearchEngine(spark, out, corpus=df, text_field="text",
                       doc_id_col="doc_id")
    res = update_by_query(
        spark, eng, out, {"term": {"lang": "de"}},
        {"lang": "painless", "source": "ctx._source.flag = 1;"},
        text_col="text")
    rows = {r["docId"]: r["flag"] for r in res["corpus"].collect()}
    assert res["updated"] == 5
    for i in range(10):
        assert rows[i] == (None if i % 2 else 1)


def test_counted_loop_unrolls_to_one_expression():
    # for with const bound: unrolled, loop var emitted as literals
    sql = painless_to_sql(
        "double total = 0; "
        "for (int i = 1; i <= 3; i++) { total += _score / i; } "
        "return total;")
    assert "`score` / 1" in sql and "`score` / 3" in sql
    assert "CASE" not in sql
    # param-bound while with body increment
    sql = painless_to_sql(
        "int i = 0; double t = 0; "
        "while (i < params.n) { t += doc['x'].value * i; i++; } return t;",
        {"n": 3})
    assert "(`x` * 0)" in sql and "(`x` * 2)" in sql
    # zero-iteration loop: body skipped entirely
    assert painless_to_sql(
        "double t = 5.0; for (int i = 0; i < 0; i++) { t += _score; } "
        "return t;") == "CAST(5.0 AS DOUBLE)"
    # const-if inside the body prunes dead arms per iteration
    sql = painless_to_sql(
        "double t = 0; for (int i = 0; i < 4; i++) "
        "{ if (i % 2 == 0) { t += doc['x'].value; } } return t;")
    assert sql.count("`x`") == 2 and "CASE" not in sql
    # the loop variable is loop-scoped (Java/Painless)
    with pytest.raises(PainlessError, match="unknown identifier"):
        painless_to_sql(
            "for (int i = 0; i < 2; i++) { } return i;")


def test_loop_error_paths():
    cases = [
        "for (int i = 0; i < doc['n_chars'].value; i++) { } return 1;",
        "for (int i = 0; i < 2000; i++) { } return 1;",
        "for (def v : doc['s']) { } return 1;",
        "for (int i = 0; i < 3; i++) { break; } return 1;",
        "for (int i = 0; i < 3; i++) { return i; } return 1;",
        "do { } while (false); return 1;",
    ]
    for bad in cases:
        with pytest.raises(PainlessError):
            painless_to_sql(bad)


def test_string_methods_transpile():
    assert painless_to_sql(
        "return doc['lang'].value.toLowerCase().contains('n') ? 1 : 0;"
    ) == "(CASE WHEN contains(lower(`lang`), 'n') THEN 1 ELSE 0 END)"
    assert painless_to_sql("return doc['text'].value.length();") == \
        "length(`text`)"
    assert painless_to_sql("return doc['text'].value.substring(1, 3);") == \
        "substring(`text`, (1) + 1, (3) - (1))"
    assert painless_to_sql("return doc['text'].value.indexOf('x');") == \
        "(instr(`text`, 'x') - 1)"
    assert painless_to_sql(
        "return doc['lang'].value.startsWith(params.p);", {"p": "e"}) == \
        "startswith(`lang`, 'e')"
    # const receivers fold (usable in loop bounds)
    sql = painless_to_sql(
        "int n = params.t.length(); double s = 0; "
        "for (int i = 0; i < n; i++) { s += _score; } return s;",
        {"t": "abc"})
    assert sql.count("`score`") == 3
    with pytest.raises(PainlessError, match="unsupported method"):
        painless_to_sql("return doc['text'].value.hashCode();")


def test_explicit_primitive_cast():
    # (int) truncates like a declaration; (def)/(String) are no-ops
    assert painless_to_sql("return (int)(_score * 2);") == \
        "CAST((`score` * 2) AS BIGINT)"
    assert painless_to_sql("return (int)(7.9);") == \
        "CAST(CAST(7.9 AS DOUBLE) AS BIGINT)"
    assert painless_to_sql("return (def)(_score);") == "`score`"


def test_loop_and_method_values(spark):
    """Value-level check through Catalyst: harmonic sum loop + method
    predicate computed by Spark equals the Python reference."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, 4.0, "Node"), (2, 10.0, "leaf")],
        "id long, score double, s string")
    sql = painless_to_sql(
        "double total = 0; "
        "for (int i = 1; i <= 4; i++) { total += _score / i; } "
        "if (doc['s'].value.toLowerCase().startsWith('n')) "
        "{ total = total * 2; } "
        "return total;")
    got = {r["id"]: r["v"] for r in
           df.select("id", F.expr(sql).alias("v")).collect()}
    h = 1 + 1 / 2 + 1 / 3 + 1 / 4
    assert got[1] == pytest.approx(4.0 * h * 2, rel=1e-12)
    assert got[2] == pytest.approx(10.0 * h, rel=1e-12)


def test_const_taken_return_allows_trailing_code():
    """Review r5 round 2: const-folding an if whose taken branch
    returns must not reject structurally-reachable trailing code."""
    sql = painless_to_sql(
        "if (params.debug) { return 0.0; } return _score;",
        {"debug": True})
    assert "CASE WHEN true THEN" in sql and "`score`" in sql
    # const-false with an else that returns: same shape
    sql = painless_to_sql(
        "if (params.debug) { return 0.0; } else { return 1.0; } ",
        {"debug": False})
    assert sql == "CAST(1.0 AS DOUBLE)"
    # structural both-branches-return + trailing code is STILL an error
    with pytest.raises(PainlessError, match="unreachable"):
        painless_to_sql(
            "if (params.debug) { return 0.0; } else { return 1.0; } "
            "return 2.0;", {"debug": True})
    # a script that can fall off the end still fails
    with pytest.raises(PainlessError, match="not every path"):
        painless_to_sql("if (params.debug) { return 0.0; }",
                        {"debug": True})


def test_mixed_type_comparison_never_folds():
    """Review r5 round 2: Python 1 == '1' is False but Spark coerces
    the string and says true — mixed-kind comparisons must reach
    Catalyst unfolded so const and non-const paths agree."""
    sql = painless_to_sql("return params.a == '1' ? 10 : 20;", {"a": 1})
    assert "(1 = '1')" in sql
    sql = painless_to_sql("return params.a < '10' ? 1 : 2;", {"a": 9})
    assert "(9 < '10')" in sql
    # string ordering never folds either (both-string equality does)
    sql = painless_to_sql("return params.a < params.b ? 1 : 2;",
                          {"a": "x", "b": "y"})
    assert "'x' < 'y'" in sql
    assert painless_to_sql("return params.a == params.b ? 1 : 2;",
                           {"a": "x", "b": "x"}) == "1"


def test_nested_loop_total_unroll_budget():
    """Review r5 round 2: the unroll limit counts TOTAL iterations
    across nesting — 100x100 must raise, not transpile 10^4 bodies."""
    with pytest.raises(PainlessError, match="total unroll budget"):
        painless_to_sql(
            "double t = 0; for (int a = 0; a < 100; a++) "
            "{ for (int b = 0; b < 100; b++) { t += _score; } } "
            "return t;")
    # a single loop at the limit still works
    sql = painless_to_sql(
        "double t = 0; for (int i = 0; i < 50; i++) { t += _score; } "
        "return t;")
    assert sql.count("`score`") == 50


def test_foreach_over_params_list():
    """for-each unrolls over compile-time-constant params lists."""
    sql = painless_to_sql(
        "double t = 0; for (double w : params.ws) { t += w * _score; } "
        "return t;", {"ws": [1.5, 0.25]})
    assert "1.5" in sql and "0.25" in sql and "CASE" not in sql
    # String elements are string-tagged (== compiles to string compare)
    sql = painless_to_sql(
        "double t = 1; for (def s : params.names) "
        "{ if (doc['lang'].value == s) { t = t * 2; } } return t;",
        {"names": ["en", "de"]})
    assert "(`lang` = 'en')" in sql and "(`lang` = 'de')" in sql
    # empty list: body never executes
    assert painless_to_sql(
        "double t = 7; for (int x : params.e) { t += _score; } return t;",
        {"e": []}) == "CAST(7.0 AS DOUBLE)"
    # the loop variable is loop-scoped
    with pytest.raises(PainlessError, match="unknown identifier"):
        painless_to_sql(
            "for (def x : params.l) { } return x;", {"l": [1]})
    # error paths: data-dependent iterable, non-list param, in-loop
    # return, unroll budget
    for src, params, pat in [
        ("for (def x : doc['f']) { } return 1;", {}, "params lists"),
        ("for (def x : params.n) { } return 1;", {"n": 5}, "list value"),
        ("double t=0; for (def x : params.l) { return x; } return t;",
         {"l": [1]}, "inside a loop"),
        ("double t=0; for (def x : params.big) { t += 1; } return t;",
         {"big": list(range(2000))}, "unroll budget"),
        ("for (def x : params.l) { } return 1;", {"l": [[1]]}, "scalars"),
    ]:
        with pytest.raises(PainlessError, match=pat):
            painless_to_sql(src, params)


def test_foreach_values_through_catalyst(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, 2.0, "en"), (2, 3.0, "zh")], "id long, score double, lang string")
    sql = painless_to_sql(
        "double b = 1.0; for (def m : params.langs) "
        "{ if (doc['lang'].value == m) { b = b + params.step; } } "
        "return _score * b;",
        {"langs": ["en", "de"], "step": 0.5})
    got = {r["id"]: r["v"] for r in
           df.select("id", F.expr(sql).alias("v")).collect()}
    assert got[1] == pytest.approx(2.0 * 1.5)
    assert got[2] == pytest.approx(3.0 * 1.0)
