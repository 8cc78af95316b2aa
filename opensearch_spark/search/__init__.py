from opensearch_spark.search.engine import SearchEngine  # noqa: F401
