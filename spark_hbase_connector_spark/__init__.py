"""spark_hbase_connector_spark — a PySpark-native analytics engine.

A ground-up rebuild of the capability surface of the reference
``ldwqh0/spark-hbase-connector`` (a Spark 3.0 DataSource V2 *read* connector
for HBase, see ``/root/reference``), re-founded on idiomatic PySpark:

- catalog-described tables (JSON catalog -> typed ``StructType`` with
  ``(cf, col)`` physical-address metadata; rowkey semantics) — parity with
  ``DefaultSource.scala`` / ``HbaseTableCatalog.scala``;
- HBase ``Bytes``-compatible codec (big-endian numerics, UTF-8 strings,
  epoch-millis date/timestamp) for byte-level fidelity where wanted —
  parity with ``HbasePartitionReader.scala:62-101``;
- pushdown *verification* rather than pushdown *implementation*: Catalyst +
  Parquet already do predicate pushdown / column pruning / partition
  pruning; ``plans.audit`` asserts they actually happened;
- the full relational operator surface (joins, aggregations, windows, set
  ops, grouping sets...) via stock Spark SQL — the reference delegates all
  of these to Spark too (SURVEY.md §2.2);
- north-star extensions the reference lacks: deduplication (exact,
  MinHash-LSH, SimHash, n-gram Jaccard, embedding-cosine), similarity
  search (brute-force + LSH-bucketed ANN), multimodal binary columns, and
  text analysis — all as pure-DataFrame transforms designed for 100 TB
  scale (no collect(), no driver-side loops, partition-aware).
"""

__version__ = "0.1.0"

from spark_hbase_connector_spark.session import get_spark  # noqa: F401
