"""Mergeable probabilistic sketches (coordinator-reducible partials).

The reference engine aggregates approximate metrics by building one
sketch per shard and merging them on the coordinator
(``HyperLogLogPlusPlus.java:66``: register-wise max). The modules here
reproduce that contract on Spark: per-partition sketches built inside
Arrow UDFs, merged associatively either on the driver (global aggs,
n_partitions tiny payloads — the coordinator reduce) or through a keyed
``applyInPandas`` (grouped aggs — the shard->coordinator shuffle).
"""

from opensearch_spark.sketches.hll import (  # noqa: F401
    HllPlusPlus,
    hll_cardinality,
    precision_from_threshold,
)
from opensearch_spark.sketches.tdigest import (  # noqa: F401
    TDigest,
    tdigest_percentile_ranks,
)
