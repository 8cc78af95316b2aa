"""flat_object field type: flattening semantics (nested paths, arrays
multi-valued, value stringification, malformed JSON) and the term /
prefix / exists queries over the flattened table."""

from opensearch_spark.fields import (
    flat_exists, flat_prefix, flat_term, flatten_json,
)


def _flat(spark):
    df = spark.createDataFrame(
        [
            (1, '{"a": {"b": "x", "c": 7}, "tags": ["p", "q"]}'),
            (2, '{"a": {"b": "y"}, "ok": true, "r": null}'),
            (3, '{"tags": [{"t": "p"}, {"t": "z"}], "n": 2.5}'),
            (4, 'not json'),
            (5, None),
        ],
        "docId long, j string",
    )
    return flatten_json(df, "j")


def test_flatten_paths_values(spark):
    rows = {(r["docId"], r["path"], r["value"])
            for r in _flat(spark).collect()}
    assert (1, "a.b", "x") in rows
    assert (1, "a.c", "7") in rows               # number -> JSON notation
    assert (1, "tags", "p") in rows and (1, "tags", "q") in rows  # multi-valued
    assert (2, "ok", "true") in rows and (2, "r", "null") in rows
    assert (3, "tags.t", "p") in rows and (3, "tags.t", "z") in rows
    assert (3, "n", "2.5") in rows
    assert not any(d == 4 for d, _p, _v in rows)  # malformed indexes nothing
    assert not any(d == 5 for d, _p, _v in rows)


def test_flat_queries(spark):
    flat = _flat(spark)
    # root term: any leaf
    assert {r["docId"] for r in flat_term(flat, "p").collect()} == {1, 3}
    # dotted path term
    assert {r["docId"] for r in
            flat_term(flat, "p", path="tags.t").collect()} == {3}
    # prefix on values
    assert {r["docId"] for r in
            flat_prefix(flat, "x").collect()} == {1}
    # exists: a sub-object counts
    assert {r["docId"] for r in flat_exists(flat, "a").collect()} == {1, 2}
    assert {r["docId"] for r in flat_exists(flat, "a.c").collect()} == {1}
