from spark_hbase_connector_spark.functions.text import (  # noqa: F401
    tokens,
    shingles,
    canonical_fingerprint,
)
from spark_hbase_connector_spark.functions.vectors import (  # noqa: F401
    dot,
    norm,
    cosine,
)
from spark_hbase_connector_spark.functions.urls import (  # noqa: F401
    normalize_url,
    url_domain,
)
