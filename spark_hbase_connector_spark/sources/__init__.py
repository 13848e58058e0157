from spark_hbase_connector_spark.sources.catalog import (  # noqa: F401
    TableCatalog,
    TableColumn,
    TableName,
    parse_catalog,
    type_for,
)
from spark_hbase_connector_spark.sources.table import (  # noqa: F401
    load_table,
    write_table,
)
