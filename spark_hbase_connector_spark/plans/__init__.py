from spark_hbase_connector_spark.plans.audit import (  # noqa: F401
    explain_string,
    pushed_filters,
    read_schema_columns,
    assert_filter_pushed,
    assert_columns_pruned,
)
