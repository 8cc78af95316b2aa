"""user_agent / geoip ingest processors (reference:
modules/ingest-user-agent UserAgentProcessor.java:60,
modules/ingest-geoip GeoIpProcessor.java:72) and the split response
processor (search-pipeline-common SplitResponseProcessor.java)."""

import pytest

from opensearch_spark.pipelines.ingest import apply_pipeline

UAS = {
    "chrome_win": ("Mozilla/5.0 (Windows NT 10.0; Win64; x64) "
                   "AppleWebKit/537.36 (KHTML, like Gecko) "
                   "Chrome/120.0.6099.110 Safari/537.36"),
    "firefox_linux": ("Mozilla/5.0 (X11; Linux x86_64; rv:121.0) "
                      "Gecko/20100101 Firefox/121.0"),
    "safari_mac": ("Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) "
                   "AppleWebKit/605.1.15 (KHTML, like Gecko) "
                   "Version/17.2 Safari/605.1.15"),
    "edge_win": ("Mozilla/5.0 (Windows NT 10.0; Win64; x64) "
                 "AppleWebKit/537.36 (KHTML, like Gecko) "
                 "Chrome/120.0.0.0 Safari/537.36 Edg/120.0.2210.91"),
    "chrome_android": ("Mozilla/5.0 (Linux; Android 14; Pixel 8) "
                       "AppleWebKit/537.36 (KHTML, like Gecko) "
                       "Chrome/120.0.6099.43 Mobile Safari/537.36"),
    "safari_ipad": ("Mozilla/5.0 (iPad; CPU OS 16_6 like Mac OS X) "
                    "AppleWebKit/605.1.15 (KHTML, like Gecko) "
                    "Version/16.6 Mobile/15E148 Safari/604.1"),
}


def test_user_agent_processor(spark):
    df = spark.createDataFrame(
        [(k, v) for k, v in UAS.items()], "key string, agent string")
    out = apply_pipeline(df, [{"user_agent": {"field": "agent"}}])
    got = {r["key"]: r.asDict() for r in out.collect()}
    assert got["chrome_win"]["user_agent_name"] == "Chrome"
    assert got["chrome_win"]["user_agent_major"] == "120"
    assert got["chrome_win"]["user_agent_os"] == "Windows 10"
    assert got["chrome_win"]["user_agent_device"] == "Other"
    assert got["firefox_linux"]["user_agent_name"] == "Firefox"
    assert got["firefox_linux"]["user_agent_os_name"] == "Linux"
    assert got["safari_mac"]["user_agent_name"] == "Safari"
    assert got["safari_mac"]["user_agent_os_name"] == "Mac OS X"
    assert got["safari_mac"]["user_agent_os_major"] == "10"
    assert got["edge_win"]["user_agent_name"] == "Edge"
    assert got["edge_win"]["user_agent_major"] == "120"
    assert got["chrome_android"]["user_agent_name"] == "Chrome Mobile"
    assert got["chrome_android"]["user_agent_os"] == "Android 14"
    assert got["chrome_android"]["user_agent_device"] == "Mobile"
    assert got["safari_ipad"]["user_agent_name"] == "Mobile Safari"
    assert got["safari_ipad"]["user_agent_os"] == "iOS 16"
    assert got["safari_ipad"]["user_agent_device"] == "Tablet"
    # property subset + unknown property error
    sub = apply_pipeline(df, [{"user_agent": {
        "field": "agent", "properties": ["name"]}}])
    assert "user_agent_name" in sub.columns
    assert "user_agent_os" not in sub.columns
    with pytest.raises(ValueError):
        apply_pipeline(df, [{"user_agent": {"field": "agent",
                                            "properties": ["bogus"]}}])


def test_geoip_range_join(spark):
    from opensearch_spark.pipelines.enrich import prepare_geoip_table

    db = spark.createDataFrame(
        [
            ("10.0.0.0", "10.0.255.255", "US", "Dallas"),
            # range spanning multiple /16 blocks
            ("10.1.0.0", "10.3.128.255", "DE", "Berlin"),
            ("192.168.1.0", "192.168.1.255", "FR", "Paris"),
        ],
        "ip_from string, ip_to string, country string, city string",
    )
    docs = spark.createDataFrame(
        [
            (1, "10.0.4.7"),       # inside first range
            (2, "10.2.200.9"),     # middle /16 of the spanning range
            (3, "10.3.200.1"),     # past ip_to but same /16 -> NO match
            (4, "192.168.1.77"),
            (5, "8.8.8.8"),        # no range
            (6, None),             # null ip
        ],
        "id long, ip string",
    )
    out = apply_pipeline(docs, [{"geoip": {"field": "ip", "database": db}}])
    got = {r["id"]: (r["geoip_country"], r["geoip_city"])
           for r in out.collect()}
    assert got[1] == ("US", "Dallas")
    assert got[2] == ("DE", "Berlin")
    assert got[3] == (None, None)
    assert got[4] == ("FR", "Paris")
    assert got[5] == (None, None)
    assert got[6] == (None, None)
    # prepared table round-trips and the explode covers the span
    prep = prepare_geoip_table(db)
    spans = prep.where(prep.country == "DE").count()
    assert spans == 3  # 10.1, 10.2, 10.3 blocks


def test_split_response_processor(spark):
    from opensearch_spark.search.pipeline import SearchPipeline

    hits = spark.createDataFrame(
        [(1, 1.0, "a,b,,c,,"), (2, 0.5, ",,"), (3, 0.2, "x")],
        "docId long, score double, tags string")
    p = SearchPipeline(response_processors=[
        {"split": {"field": "tags", "separator": ",",
                   "target_field": "tag_list"}}])
    got = {r["docId"]: r["tag_list"] for r in p.process_response(hits).collect()}
    # Java String.split(sep, 0): trailing empties dropped, inner kept
    assert got[1] == ["a", "b", "", "c"]
    assert got[2] == []
    assert got[3] == ["x"]
    keep = SearchPipeline(response_processors=[
        {"split": {"field": "tags", "separator": ",",
                   "preserve_trailing": True, "target_field": "tag_list"}}])
    got2 = {r["docId"]: r["tag_list"]
            for r in keep.process_response(hits).collect()}
    assert got2[1] == ["a", "b", "", "c", "", ""]


def test_user_agent_windows_marketing_names(spark):
    df = spark.createDataFrame(
        [("w7", "Mozilla/5.0 (Windows NT 6.1; WOW64) AppleWebKit/537.36 "
                "(KHTML, like Gecko) Chrome/49.0.2623.112 Safari/537.36"),
         ("w81", "Mozilla/5.0 (Windows NT 6.3; Win64; x64) Gecko/20100101 "
                 "Firefox/60.0")],
        "key string, agent string")
    got = {r["key"]: r.asDict()
           for r in apply_pipeline(df, [{"user_agent": {"field": "agent"}}]).collect()}
    assert got["w7"]["user_agent_os"] == "Windows 7"
    assert got["w81"]["user_agent_os"] == "Windows 8.1"


def test_split_empty_string_field(spark):
    from opensearch_spark.search.pipeline import SearchPipeline

    hits = spark.createDataFrame(
        [(1, 1.0, "")], "docId long, score double, tags string")
    p = SearchPipeline(response_processors=[
        {"split": {"field": "tags", "separator": ",",
                   "target_field": "tag_list"}}])
    got = p.process_response(hits).collect()[0]["tag_list"]
    assert got == [""]   # Java "".split(",", 0) == [""]
