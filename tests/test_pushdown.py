"""Explain-auditor pushdown parity: every filter shape the reference pushes
(F1-F11, HbaseScanBuilder.scala:29-52 / HbasePartitionReader.scala:145-175)
must reach our Parquet scan as a PushedFilter, and projections must prune
the ReadSchema (S6). This is the §7 'pushdown.py' role: we don't implement
pushdown (Catalyst does), we PROVE it happened.
"""

import pytest
from pyspark.sql import functions as F

from spark_hbase_connector_spark.catalogs import load
from spark_hbase_connector_spark.plans.audit import (
    assert_columns_pruned,
    pushed_filters,
    whole_stage_codegen_count,
)


@pytest.fixture(scope="module")
def customer(spark, sf_dir):
    return load(spark, sf_dir, "customer")


@pytest.fixture(scope="module")
def part(spark, sf_dir):
    return load(spark, sf_dir, "part")


def _pushed(df):
    return " ; ".join(pushed_filters(df))


def test_f1_equal_to(customer):
    q = customer.where(F.col("c_custkey") == 7).select("c_name")
    assert "EqualTo(c_custkey,7)" in _pushed(q)


def test_f2_starts_with(part):
    q = part.where(F.col("p_name").startswith("red")).select("p_partkey")
    assert "StringStartsWith(p_name,red)" in _pushed(q)


def test_f3_contains(part):
    q = part.where(F.col("p_name").contains("widget")).select("p_partkey")
    assert "StringContains(p_name,widget)" in _pushed(q)


def test_f4_in(customer):
    q = customer.where(F.col("c_custkey").isin(1, 2, 3)).select("c_name")
    assert "In(c_custkey, [1,2,3])" in _pushed(q)


def test_f5_f6_null(customer):
    q = customer.where(F.col("c_mktsegment").isNull()).select("c_custkey")
    assert "IsNull(c_mktsegment)" in _pushed(q)
    q2 = customer.where(F.col("c_mktsegment").isNotNull()).select("c_custkey")
    assert "IsNotNull(c_mktsegment)" in _pushed(q2)


def test_f7_to_f10_ranges(customer):
    q = customer.where(
        (F.col("c_acctbal") > 0.0)
        & (F.col("c_acctbal") <= 1000.0)
        & (F.col("c_custkey") >= 10)
        & (F.col("c_custkey") < 100)
    ).select("c_name")
    s = _pushed(q)
    for frag in (
        "GreaterThan(c_acctbal,0.0)",
        "LessThanOrEqual(c_acctbal,1000.0)",
        "GreaterThanOrEqual(c_custkey,10)",
        "LessThan(c_custkey,100)",
    ):
        assert frag in s, f"{frag} not in {s}"


def test_f11_or(customer):
    q = customer.where(
        (F.col("c_custkey") == 1) | (F.col("c_mktsegment") == "BUILDING")
    ).select("c_name")
    assert "Or(EqualTo(c_custkey,1),EqualTo(c_mktsegment,BUILDING))" in _pushed(q)


def test_projection_prunes_readschema(customer):
    q = customer.select("c_name", "c_acctbal")
    assert_columns_pruned(q, {"c_name", "c_acctbal"})


def test_filter_plus_projection_readschema(customer):
    q = customer.where(F.col("c_custkey") < 50).select("c_name")
    assert_columns_pruned(q, {"c_custkey", "c_name"})


def test_aggregation_stays_in_codegen(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    q = li.groupBy("l_returnflag").agg(F.sum("l_quantity").alias("s"))
    assert whole_stage_codegen_count(q) >= 1


def test_q6_all_predicates_reach_scan(spark, sf_dir):
    """Q6 is the pushdown-or-die query: every one of its predicates must be
    a PushedFilter, and the scan must read only the 4 referenced columns."""
    from spark_hbase_connector_spark.queries.relational import q6_forecast_revenue

    q = q6_forecast_revenue(spark, sf_dir)
    s = _pushed(q)
    for frag in (
        "GreaterThanOrEqual(l_shipdate",
        "LessThan(l_shipdate",
        "GreaterThanOrEqual(l_discount,0.05)",
        "LessThanOrEqual(l_discount,0.07)",
        "LessThan(l_quantity,24",
    ):
        assert frag in s, f"{frag} not in {s}"
    assert_columns_pruned(
        q, {"l_shipdate", "l_discount", "l_quantity", "l_extendedprice"}
    )


def test_q10_broadcasts_dims_and_takes_ordered(spark, sf_dir):
    """Q10's plan shape: customer and nation joined via broadcast (no
    shuffle of the fact side for dims), top-20 via TakeOrderedAndProject
    (never a global sort)."""
    from spark_hbase_connector_spark.plans.audit import explain_string
    from spark_hbase_connector_spark.queries.relational import q10_returned_items

    text = explain_string(q10_returned_items(spark, sf_dir))
    assert text.count("BroadcastHashJoin") >= 2, text
    assert "TakeOrderedAndProject" in text, text
