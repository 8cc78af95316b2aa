from opensearch_spark.search.highlight import PRE, POST, make_fragments


def test_fragments_wrap_matches():
    text = "the quick brown fox jumps over the lazy dog while foxes watch"
    frags = make_fragments(text, {"fox", "lazy"}, frag_size=200, n_frags=3)
    assert frags
    joined = " ".join(frags)
    assert f"{PRE}fox{POST}" in joined
    assert f"{PRE}lazy{POST}" in joined
    # 'foxes' is a different token — must not be wrapped
    assert f"{PRE}foxes{POST}" not in joined


def test_fragments_respect_analyzer():
    # analyzer keeps foo_bar together; query for 'foo' must not highlight it
    text = "foo_bar and foo together"
    frags = make_fragments(text, {"foo"}, frag_size=100)
    assert frags
    assert f"{PRE}foo_bar{POST}" not in frags[0]
    assert f"{PRE}foo{POST}" in frags[0]


def test_no_match_no_fragments():
    assert make_fragments("hello world", {"zzz"}) == []
    assert make_fragments("", {"x"}) == []


def test_fragment_count_cap():
    text = "cat " * 100
    frags = make_fragments(text, {"cat"}, frag_size=30, n_frags=2)
    assert len(frags) == 2


def test_highlight_df(spark, sf_dir):
    from opensearch_spark.search.highlight import highlight

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(20)
    out = highlight(docs, "hash join", text_col="text").collect()
    assert any(r["highlights"] for r in out)
    for r in out:
        for frag in r["highlights"]:
            assert PRE in frag
