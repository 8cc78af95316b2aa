import pandas as pd
import pytest

from opensearch_spark.analysis import analyzer


GOLDEN = [
    # (input, expected tokens) — documents the engine's analyzer contract
    # (UAX#29 subset; see analysis/analyzer.py docstring for divergences)
    ("Hello World", ["hello", "world"]),
    ("foo_bar", ["foo_bar"]),            # '_' = ExtendNumLet, joins (UAX#29 WB13)
    ("x86_64", ["x86_64"]),
    ("camelCase", ["camelcase"]),        # standard analyzer does NOT split camelCase
    ("foo-bar", ["foo", "bar"]),         # hyphen splits
    ("a.b.c", ["a.b.c"]),                # '.' = MidNumLet, joins between word chars
    ("example.com", ["example.com"]),
    ("3.14", ["3.14"]),
    ("dog's", ["dog's"]),                # apostrophe joins
    ("std::vector", ["std", "vector"]),  # double colon: mid char needs word on both sides
    ("foo:bar", ["foo:bar"]),            # single colon = MidLetter, joins
    ("end.", ["end"]),                   # trailing mid char dropped
    ("'quoted'", ["quoted"]),
    ("1,000", ["1", "000"]),             # ',' not implemented as MidNum (documented)
    ("i=0; i<n; i++", ["i", "0", "i", "n", "i"]),
    ("def f(x): return x*2", ["def", "f", "x", "return", "x", "2"]),
    ("", []),
    ("   \t\n  ", []),
    ("!!!", []),
    ("π = 3.14159", ["π", "3.14159"]),
    ("naïve café", ["naïve", "café"]),
    ("import numpy as np", ["import", "numpy", "as", "np"]),
    ("UPPER lower MiXeD", ["upper", "lower", "mixed"]),
    ("v2.0.1-rc1", ["v2.0.1", "rc1"]),
    ("a", ["a"]),
    ("1e-5", ["1e", "5"]),
    ("__init__", ["__init__"]),
    ("self.value", ["self.value"]),
]


@pytest.mark.parametrize("text,expected", GOLDEN)
def test_golden_tokens(text, expected):
    assert analyzer.tokenize(text) == expected


def test_pandas_matches_scalar():
    texts = [t for t, _ in GOLDEN]
    out = analyzer.tokenize_pandas(pd.Series(texts))
    for t, got in zip(texts, out):
        assert list(got) == analyzer.tokenize(t), t


def test_max_token_length_split():
    long = "a" * 600
    toks = analyzer.tokenize(long)
    assert toks == ["a" * 255, "a" * 255, "a" * 90]
    # pandas path agrees
    out = analyzer.tokenize_pandas(pd.Series([long + " xyz"]))
    assert list(out[0]) == ["a" * 255, "a" * 255, "a" * 90, "xyz"]


def test_termvec():
    tv = analyzer.termvec(analyzer.tokenize("the cat the dog the"))
    d = {t: (tf, ps) for t, tf, ps in tv}
    assert d["the"] == (3, [0, 2, 4])
    assert d["cat"] == (1, [1])
    assert d["dog"] == (1, [3])


def test_duckdb_regex_agrees():
    """The RE2 oracle regex must tokenize identically to the Python one
    (on text within the shared dialect subset)."""
    duckdb = pytest.importorskip("duckdb")
    pattern = analyzer.duckdb_token_regex()
    texts = [t for t, _ in GOLDEN if t.strip()]
    con = duckdb.connect()
    for t in texts:
        rows = con.execute(
            f"select regexp_extract_all(lower(?), '{pattern}')", [t]
        ).fetchone()[0]
        assert rows == [x for x in analyzer.tokenize(t)], t
