from spark_hbase_connector_spark.operators.asof import asof_join  # noqa: F401
from spark_hbase_connector_spark.operators.dedup import (  # noqa: F401
    dedup_exact,
    minhash_lsh_pairs,
    shingle_jaccard_pairs,
    simhash_pairs,
)
from spark_hbase_connector_spark.operators.similarity import (  # noqa: F401
    brute_force_topk,
    cosine_pairs_lsh,
)
