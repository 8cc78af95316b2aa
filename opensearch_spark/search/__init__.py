from opensearch_spark.search.engine import (  # noqa: F401
    MultiFieldEngine, SearchEngine,
)
from opensearch_spark.search.pipeline import SearchPipeline  # noqa: F401
from opensearch_spark.search.percolate import percolate  # noqa: F401
from opensearch_spark.search.aggs import compile_aggs  # noqa: F401
