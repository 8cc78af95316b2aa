"""Ingest-processor facade vs DuckDB oracle (reference:
modules/ingest-common, 31 processors -> Catalyst expressions)."""

import duckdb
import pytest

from opensearch_spark.pipelines.ingest import apply_pipeline


@pytest.fixture(scope="module")
def df(spark):
    rows = [
        (1, "  Hello <b>World</b>  ", "a,b,c", "k1=v1 k2=v2", "2024-03-05", "2kb", "10"),
        (2, "FOO bar-baz", "x,y", "k=z", "2023-12-31", "1mb", "7"),
    ]
    return spark.createDataFrame(
        rows, "id int, text string, csvv string, kvv string, d string, sz string, n string"
    )


def test_string_processors(df):
    out = apply_pipeline(df, [
        {"trim": {"field": "text"}},
        {"html_strip": {"field": "text"}},
        {"lowercase": {"field": "text"}},
        {"gsub": {"field": "text", "pattern": "-", "replacement": " "}},
    ]).orderBy("id").collect()
    assert out[0]["text"] == "hello world"
    assert out[1]["text"] == "foo bar baz"


def test_split_join_csv_kv(df):
    out = apply_pipeline(df, [
        {"split": {"field": "csvv", "separator": ",", "target_field": "arr"}},
        {"join": {"field": "arr", "separator": "|", "target_field": "joined"}},
        {"csv": {"field": "csvv", "target_fields": ["c1", "c2"]}},
        {"kv": {"field": "kvv", "field_split": " ", "value_split": "=",
                "target_field": "m"}},
    ]).orderBy("id").collect()
    r = out[0]
    assert r["arr"] == ["a", "b", "c"] and r["joined"] == "a|b|c"
    assert r["c1"] == "a" and r["c2"] == "b"
    assert r["m"]["k1"] == "v1" and r["m"]["k2"] == "v2"


def test_convert_date_bytes_fingerprint(df):
    out = apply_pipeline(df, [
        {"convert": {"field": "n", "type": "integer"}},
        {"date": {"field": "d", "formats": ["yyyy-MM-dd"], "target_field": "ts"}},
        {"bytes": {"field": "sz", "target_field": "nbytes"}},
        {"fingerprint": {"fields": ["text"], "method": "SHA-256",
                         "target_field": "fp"}},
    ]).orderBy("id").collect()
    assert out[0]["n"] == 10 and out[1]["n"] == 7
    assert str(out[0]["ts"]).startswith("2024-03-05")
    assert out[0]["nbytes"] == 2048 and out[1]["nbytes"] == 1024 ** 2
    want = duckdb.sql(
        "SELECT sha256('  Hello <b>World</b>  ')"
    ).fetchone()[0]
    assert out[0]["fp"] == want


def test_drop_fail_script_foreach(df):
    out = apply_pipeline(df, [
        {"drop": {"if": "id = 2"}},
        {"script": {"source": "length(text)", "target_field": "len"}},
        {"split": {"field": "csvv", "separator": ",", "target_field": "arr"}},
        {"foreach": {"field": "arr", "lambda": "upper(x)", "target_field": "arr"}},
    ]).collect()
    assert len(out) == 1 and out[0]["arr"] == ["A", "B", "C"]
    assert out[0]["len"] == len("  Hello <b>World</b>  ")

    with pytest.raises(ValueError, match="fail condition"):
        apply_pipeline(df, [{"fail": {"if": "id = 1",
                                      "message": "ingest fail condition met"}}])


def test_grok_like_extract(df):
    out = apply_pipeline(df, [
        {"grok": {"field": "kvv", "pattern": r"k1=(\w+) k2=(\w+)",
                  "target_fields": ["v1", "v2"]}},
    ]).orderBy("id").collect()
    assert out[0]["v1"] == "v1" and out[0]["v2"] == "v2"


def test_unknown_processor(df):
    with pytest.raises(ValueError, match="unknown ingest processor"):
        apply_pipeline(df, [{"wat": {}}])


def test_round2_processors(spark):
    from opensearch_spark.pipelines.ingest import apply_pipeline

    df = spark.createDataFrame(
        [(1, "2024-03-07", "https://example.com/a/b?x=1", [3, 1, 2], "v")],
        "id int, d string, url string, arr array<int>, `a.b` string",
    )
    out = apply_pipeline(df, [
        {"sort": {"field": "arr"}},
        {"uri_parts": {"field": "url"}},
        {"date_index_name": {"field": "d", "index_name_prefix": "logs-",
                             "date_rounding": "M",
                             "index_name_format": "yyyy-MM"}},
        {"pipeline": {"processors": [{"set": {"field": "flag",
                                              "value": "on"}}]}},
        {"dot_expander": {"field": "a.b"}},
    ]).collect()[0]
    assert out["arr"] == [1, 2, 3]
    assert out["url_domain"] == "example.com"
    assert out["url_path"] == "/a/b"
    assert out["_index"] == "logs-2024-03"
    assert out["flag"] == "on"
    assert out["a"]["b"] == "v"


def test_remove_by_pattern(spark):
    from opensearch_spark.pipelines.ingest import apply_pipeline

    df = spark.createDataFrame(
        [(1, "a", "b", "c")], "id long, tmp_x string, tmp_y string, keep string")
    out = apply_pipeline(df, [
        {"remove_by_pattern": {"field_pattern": "tmp_*"}}])
    assert out.columns == ["id", "keep"]


def test_community_id_reference_vectors(spark):
    """Community ID v1 against the reference CommunityIdProcessorTests
    vectors (modules/ingest-common/.../CommunityIdProcessorTests.java:834)."""
    from opensearch_spark.pipelines.ingest import apply_pipeline

    df = spark.createDataFrame(
        [
            ("66.35.250.204", 80, "128.232.110.120", 34855, "tcp"),
            ("8.8.8.8", 53, "192.168.1.52", 54585, "udp"),
            ("192.168.170.8", 7, "192.168.170.56", 7, "sctp"),
            # reversed direction must give the SAME flow id (canonical order)
            ("128.232.110.120", 34855, "66.35.250.204", 80, "tcp"),
        ],
        "source_ip string, source_port int, dest_ip string, dest_port int, "
        "transport string",
    )
    got = [r["community_id"]
           for r in apply_pipeline(df, [{"community_id": {}}]).collect()]
    assert got[0] == "1:LQU9qZlK+B5F3KDmev6m5PMibrg="
    assert got[1] == "1:d/FP5EW3wiY1vCndhwleRRKHowQ="
    assert got[2] == "1:MP2EtRCAUIZvTw6MxJHLV7N7JDs="
    assert got[3] == got[0]


def test_remove_by_pattern_star_only_wildcard(spark):
    """Regex.simpleMatch semantics: ONLY '*' is special — '?' and '['
    are literal characters, unlike fnmatch."""
    from opensearch_spark.pipelines.ingest import apply_pipeline

    df = spark.createDataFrame(
        [(1, "a", "b", "c")], "id long, foo string, `f?o` string, `t[1]` string")
    out = apply_pipeline(df, [{"remove_by_pattern": {"field_pattern": "f?o"}}])
    assert out.columns == ["id", "foo", "t[1]"]   # literal 'f?o' dropped only
    out2 = apply_pipeline(df, [{"remove_by_pattern": {"field_pattern": "t[1]"}}])
    assert out2.columns == ["id", "foo", "f?o"]
