from opensearch_spark.index.build import IndexPaths, build_index, load_index  # noqa: F401
