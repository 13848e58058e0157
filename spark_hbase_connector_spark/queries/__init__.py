"""The engine's declared query surface.

Importing this package populates ``REGISTRY`` with every implemented query:
scan/pushdown parity shapes (SURVEY.md §2.1), the relational operator suite
the reference delegates to Spark (§2.2), and the north-star extensions
(§2.3: dedup, similarity search, text analysis, multimodal).
"""

from spark_hbase_connector_spark.queries.registry import (  # noqa: F401
    REGISTRY,
    QuerySpec,
    query,
)

# populate the registry
from spark_hbase_connector_spark.queries import (  # noqa: F401,E402
    scans,
    relational,
    relational_extra,
    modern_sql,
    corpus_pipeline,
    curation_ml,
    tpch_extra,
    indexing,
    kv_patterns,
    windows,
    northstar,
    quality,
    streaming_queries,
    fixtures,
)
