"""Extended TPC-H coverage (SURVEY.md §2.2 — the delegated relational
surface, exercised at depth).

Adaptations to the harness's synthetic schema (TESTDATA.md): there is no
``partsupp`` table and no ``l_commitdate``/``l_receiptdate``/``l_shipmode``
columns, so Q4's lateness test uses ``l_shipdate > o_orderdate + 60 days``,
Q9's supply cost is ``0.1 * p_retailprice * l_quantity``, and Q12 groups by
``l_returnflag`` instead of ship mode. Each query keeps the *shape* that
makes the original a planner test: Q4 = correlated EXISTS with a non-equi
conjunct, Q7/Q8/Q9 = multi-way star joins with broadcast dims, Q13 =
outer-join double aggregation, Q15 = scalar subquery over a derived view,
Q17 = per-key average threshold join, Q18 = IN over a grouped HAVING,
Q22 = scalar subquery + anti join.

Scale notes: every dimension join (nation/region/part/supplier/customer at
dimension cardinality) broadcasts; the only corpus-sized shuffles are the
orders<->lineitem fact joins and the final groupings, which AQE re-plans
at runtime. Plans are gated by tests/test_plan_hygiene.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_hbase_connector_spark.catalogs import load
from spark_hbase_connector_spark.queries.registry import query


def _ts(s: str) -> F.Column:
    return F.lit(s + " 00:00:00").cast("timestamp")


@query(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o_orderpriority
    """,
    tags=("join", "subquery", "agg"),
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: correlated EXISTS with a non-equi conjunct (late
    shipment: shipped >60 days after ordering), counted per priority. The
    EXISTS is a left-semi join on the order key with the lateness predicate
    attached — one fact-fact shuffle, dedup handled by semi-join
    semantics (no distinct pass needed)."""
    o = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= _ts("1996-07-01"))
        & (F.col("o_orderdate") < _ts("1996-10-01"))
    )
    li = load(spark, sf_dir, "lineitem")
    late = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.expr("timestampadd(DAY, 60, o_orderdate)")
    )
    return (
        o.join(li, late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@query(
    "q7_volume_shipping",
    oracle="""
    SELECT supp_nation, cust_nation, l_year,
           CAST((sum(volume4) + 50) // 100 AS DOUBLE) / 100 AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l.l_shipdate) AS INTEGER) AS l_year,
             CAST(round(l.l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(round(l.l_discount * 100) AS BIGINT)) AS volume4
      FROM supplier s
      JOIN lineitem l ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
      JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    )
    GROUP BY supp_nation, cust_nation, l_year
    """,
    tags=("join", "agg"),
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bidirectional nation-pair revenue by ship year.
    supplier/customer/nation all broadcast; lineitem->orders is the one
    fact shuffle; the nation-pair disjunction is evaluated after the
    broadcast joins (cheap, codegen'd)."""
    s = load(spark, sf_dir, "supplier")
    li = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1998-01-01"))
    )
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n1 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .where(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(
            # Money rule (CLAUDE.md): FIXED-POINT LONGS (q1 recipe) —
            # exact scale-4 products in int64, half-up scale-2 integer
            # round, one exact long->double cast. Bit-identical to the
            # r8 decimal-domain rounding without its per-row BigDecimal
            # tax (q1's identical situation cost 10x at sf100).
            F.sum(
                F.round(F.col("l_extendedprice") * 100).cast("long")
                * (
                    F.lit(100) - F.round(F.col("l_discount") * 100).cast("long")
                )
            ).alias("__rev4")
        )
        .select(
            "supp_nation",
            "cust_nation",
            "l_year",
            (F.expr("CAST((__rev4 + 50) div 100 AS DOUBLE)") / 100).alias(
                "revenue"
            ),
        )
    )


@query(
    "q8_market_share",
    oracle="""
    SELECT o_year,
           round(CAST((sum(CASE WHEN nation = 'NATION_3' THEN volume4 ELSE 0 END)
                       + 50) // 100 AS DOUBLE)
                 / CAST((sum(volume4) + 50) // 100 AS DOUBLE) * 10000)
             / 10000 AS mkt_share
    FROM (
      SELECT CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
             CAST(round(l.l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(round(l.l_discount * 100) AS BIGINT)) AS volume4,
             n2.n_name AS nation
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
      JOIN region r   ON n1.n_regionkey = r.r_regionkey
      JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
      WHERE r.r_name = 'EUROPE' AND p.p_type = 'ECONOMY'
        AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    )
    GROUP BY o_year
    """,
    tags=("join", "agg"),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: 7-way star join -> national market share per year.
    Every dimension broadcasts (part/supplier/customer/nation x2/region);
    the single shuffle is lineitem->orders. The share is a conditional
    aggregate over the same grouped rows — one pass.

    Money rule (CLAUDE.md): mkt_share is a RATIO of two unbounded money
    sums — the old round(sum(double)/sum(double), 4) accumulates order
    noise in BOTH operands. Now exact scale-4 fixed-point longs (q1
    recipe), integer-rounded to scale 2 so the long->double casts stay
    exact past sf100, with the 4dp ratio formed by the rank-ratio recipe
    round(x * 10000)/10000 — identical IEEE op sequence on identical
    integers in both engines."""
    p = load(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY")
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= _ts("1996-01-01"))
        & (F.col("o_orderdate") < _ts("1998-01-01"))
    )
    c = load(spark, sf_dir, "customer")
    n1 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    r = load(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    vol4 = F.round(F.col("l_extendedprice") * 100).cast("long") * (
        F.lit(100) - F.round(F.col("l_discount") * 100).cast("long")
    )
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_region") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.sum(
                F.when(F.col("nation") == "NATION_3", vol4).otherwise(
                    F.lit(0).cast("long")
                )
            ).alias("__nm4"),
            F.sum(vol4).alias("__dn4"),
        )
        .select(
            "o_year",
            (
                F.round(
                    F.expr("CAST((__nm4 + 50) div 100 AS DOUBLE)")
                    / F.expr("CAST((__dn4 + 50) div 100 AS DOUBLE)")
                    * 10000
                )
                / 10000
            ).alias("mkt_share"),
        )
    )


@query(
    "q9_product_profit",
    oracle="""
    SELECT nation, o_year,
           CAST(CASE WHEN sum(amount4) >= 0 THEN (sum(amount4) + 50) // 100
                     ELSE -((-sum(amount4) + 50) // 100) END AS DOUBLE) / 100
             AS sum_profit
    FROM (
      SELECT n.n_name AS nation,
             CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
             CAST(round(l.l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(round(l.l_discount * 100) AS BIGINT))
               - CAST(round(p.p_retailprice * 100) AS BIGINT)
                 * CAST(l.l_quantity AS BIGINT) * 10 AS amount4
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN nation n   ON s.s_nationkey = n.n_nationkey
      WHERE p.p_name LIKE '%red%'
    )
    GROUP BY nation, o_year
    """,
    tags=("join", "agg"),
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit by supplier nation and order year for a part
    subset. Supply cost is adapted to 0.1 * p_retailprice * l_quantity (no
    partsupp table in the harness schema). part filter (`LIKE '%red%'`)
    prunes the broadcast side before the join.

    Money rule (CLAUDE.md): FIXED-POINT LONGS (q1 recipe). amount4 is the
    exact scale-4 profit (0.1 * retail * qty at scale 4 == retail_cents *
    qty * 10, exact integers); profit can be NEGATIVE, so the scale-2
    round is half-AWAY-FROM-ZERO in integer space (sign-split: integer
    division truncates toward zero in Spark but floors in DuckDB — they
    only agree on non-negative operands), matching the HALF_UP decimal
    round both engines used before. Bit-identical to the r7e decimal
    formulation without the per-row BigDecimal tax."""
    p = load(spark, sf_dir, "part").where(F.col("p_name").like("%red%"))
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders")
    n = load(spark, sf_dir, "nation")
    amount4 = F.round(F.col("l_extendedprice") * 100).cast("long") * (
        F.lit(100) - F.round(F.col("l_discount") * 100).cast("long")
    ) - F.round(F.col("p_retailprice") * 100).cast("long") * F.col(
        "l_quantity"
    ).cast("long") * 10
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
        )
        .agg(F.sum(amount4).alias("__amt4"))
        .select(
            "nation",
            "o_year",
            (
                F.expr(
                    "CAST(CASE WHEN __amt4 >= 0 THEN (__amt4 + 50) div 100"
                    " ELSE -((-__amt4 + 50) div 100) END AS DOUBLE)"
                )
                / 100
            ).alias("sum_profit"),
        )
    )


@query(
    "q12_priority_shipping",
    oracle="""
    SELECT l_returnflag,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l_returnflag
    """,
    tags=("join", "agg"),
)
def q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: conditional counts split by order priority over a
    year of shipments (grouping adapted to l_returnflag — no l_shipmode in
    the harness schema). One fact-fact shuffle; both counts come from the
    same grouped pass."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1997-01-01"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


@query(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM (
      SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
      FROM customer c
      LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                        AND o.o_orderpriority <> '5-LOW'
      GROUP BY c.c_custkey
    )
    GROUP BY c_count
    """,
    tags=("join", "agg"),
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: order-count-per-customer histogram via a left outer
    join with an ON-clause filter (customers with zero qualifying orders
    must appear with c_count = 0), then a second aggregation over the
    first's output — the double-aggregation planner test."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").where(F.col("o_orderpriority") != "5-LOW")
    per_cust = (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "q15_top_supplier",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey AS supplier_no,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                      * (100 - CAST(round(l_discount * 100) AS BIGINT)))
                  AS DOUBLE) / 10000 AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN rev r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM rev)
    """,
    tags=("join", "agg", "subquery"),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: scalar subquery over a derived revenue view (the
    supplier(s) achieving the quarter's max revenue). Expressed through
    SQL so Catalyst plans the uncorrelated scalar subquery (computed once,
    injected as a literal — no join against the corpus).

    Money rule (CLAUDE.md): per-supplier revenue is an EXACT scale-4
    fixed-point sum (q1 recipe) — the `= max` equality gate is the worst
    place for the old round(sum(double), 4)'s order noise (a 1-ulp flip
    changes WHICH suppliers tie for the max)."""
    load(spark, sf_dir, "supplier").createOrReplaceTempView("supplier")
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        WITH rev AS (
          SELECT l_suppkey AS supplier_no,
                 CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                          * (100 - CAST(round(l_discount * 100) AS BIGINT)))
                      AS DOUBLE) / 10000 AS total_revenue
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
            AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
          GROUP BY l_suppkey
        )
        SELECT s.s_suppkey, s.s_name, r.total_revenue
        FROM supplier s JOIN rev r ON s.s_suppkey = r.supplier_no
        WHERE r.total_revenue = (SELECT max(total_revenue) FROM rev)
        """
    )


@query(
    "q17_small_quantity_revenue",
    oracle="""
    WITH lim AS (
      SELECT l_partkey, 0.2 * avg(l_quantity) AS qty_lim
      FROM lineitem GROUP BY l_partkey
    )
    SELECT round(CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT))
                      AS DOUBLE) / 100
                 / 7.0, 4) AS avg_yearly,
           CAST(count(*) AS BIGINT) AS n_items
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN lim   ON lim.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#2' AND p.p_type = 'ECONOMY'
      AND l.l_quantity < lim.qty_lim
    """,
    tags=("join", "agg", "subquery"),
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: per-part average-quantity threshold (the classic
    correlated scalar subquery), planned scale-first as an aggregate-then-
    rejoin: the per-part limits are a grouped aggregate on the fact table
    re-joined on the part key — two shuffles on the same key (AQE can
    co-locate), never a per-row subquery execution."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").where(
        (F.col("p_brand") == "Brand#2") & (F.col("p_type") == "ECONOMY")
    )
    lim = li.groupBy(F.col("l_partkey").alias("lim_partkey")).agg(
        (0.2 * F.avg("l_quantity")).alias("qty_lim")
    )
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(lim, F.col("l_partkey") == F.col("lim_partkey"))
        .where(F.col("l_quantity") < F.col("qty_lim"))
        .agg(
            # Money rule: exact cents sum (q1 recipe; cents < 2^53, the
            # exact long->double cast and /100 /7.0 divisions are the
            # same correctly-rounded IEEE ops in both engines). The
            # qty_lim threshold compares identical doubles in both
            # engines (integer-exact sum / count).
            F.round(
                F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).cast(
                    "double"
                )
                / 100
                / 7.0,
                4,
            ).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "q18_large_volume_customer",
    oracle="""
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
           CAST(sum(CAST(l.l_quantity AS BIGINT)) AS DOUBLE) AS sum_qty
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING sum(l_quantity) > 300
    )
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 100
    """,
    tags=("join", "agg", "subquery", "topn"),
)
def q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: IN over a grouped-HAVING subquery (orders whose
    total quantity exceeds 300), joined back to customer and re-aggregated,
    top-100 by order value. The HAVING subquery is a grouped aggregate
    semi-joined to orders — the heavy relation is aggregated *before* the
    join, so the semi-join side is orders-sized, not lineitem-sized."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("_tot"))
        .where(F.col("_tot") > 300)
        .select("l_orderkey")
    )
    return (
        o.join(big.withColumnRenamed("l_orderkey", "big_key"),
               F.col("o_orderkey") == F.col("big_key"), "left_semi")
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        # l_quantity is integer-valued: the BIGINT sum is exact in both
        # engines (no round needed; the HAVING > 300 gate upstream sums
        # doubles but over <= 7 integer-valued addends — exact too)
        .agg(F.sum(F.col("l_quantity").cast("long")).cast("double").alias("sum_qty"))
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


@query(
    "q22_global_sales_opportunity",
    oracle="""
    SELECT cntrycode, CAST(count(*) AS BIGINT) AS numcust,
           CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS DOUBLE)
             / 100 AS totacctbal
    FROM (
      SELECT c.c_nationkey AS cntrycode, c.c_acctbal
      FROM customer c
      WHERE c.c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
        AND c.c_acctbal > (
          SELECT (CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT))
                       AS DOUBLE) / count(*)) / 100
          FROM customer
          WHERE c_acctbal > 0.0 AND c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
        )
        AND NOT EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
        )
    )
    GROUP BY cntrycode
    """,
    tags=("join", "agg", "subquery"),
)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: uncorrelated scalar subquery (average positive
    balance over a nation subset — country codes adapted to nation keys)
    + NOT EXISTS anti join against orders, aggregated per nation. SQL form
    so Catalyst plans the scalar subquery once and rewrites NOT EXISTS to
    a left-anti join. The anti-join side is restricted to urgent orders
    (every synthetic customer has *some* order, so the original "never
    ordered" predicate would be vacuously empty).

    Money rule (CLAUDE.md): both the average-balance THRESHOLD and
    totacctbal are exact fixed-point cents (q1 recipe; c_acctbal can be
    negative — no rounding division is involved, so sign-safety is free).
    The threshold matters most: `c_acctbal > avg(double sum)` put an
    order-noise-dependent boundary on which CUSTOMERS qualify — the
    integer sum / count / 100 sequence yields the identical double in
    both engines."""
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT cntrycode, count(*) AS numcust,
               CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS DOUBLE)
                 / 100 AS totacctbal
        FROM (
          SELECT c.c_nationkey AS cntrycode, c.c_acctbal
          FROM customer c
          WHERE c.c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
            AND c.c_acctbal > (
              SELECT (CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT))
                           AS DOUBLE) / count(*)) / 100
              FROM customer
              WHERE c_acctbal > 0.0 AND c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
            )
            AND NOT EXISTS (
              SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
            )
        )
        GROUP BY cntrycode
        """
    )


# ---------------------------------------------------------------------------
# Q2 / Q11 / Q16 / Q20 / Q21 — the remaining planner shapes, completing all
# 22 TPC-H queries. The harness schema has no ``partsupp`` table, so the
# part-supplier relation is derived from lineitem: distinct
# ``(l_partkey, l_suppkey)`` pairs with ``min(l_extendedprice / l_quantity)``
# as the supply cost. Both the Spark plan and the DuckDB oracle derive it
# identically, so the comparison stays exact (same IEEE divisions, same min).
# ---------------------------------------------------------------------------


@query(
    "q2_min_cost_supplier",
    oracle="""
    WITH ps AS (
      SELECT l_partkey, l_suppkey,
             min(l_extendedprice / l_quantity) AS ps_supplycost
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    eu AS (
      SELECT ps.l_partkey, ps.l_suppkey, ps.ps_supplycost
      FROM ps
      JOIN supplier s ON s.s_suppkey = ps.l_suppkey
      JOIN nation n   ON n.n_nationkey = s.s_nationkey
      JOIN region r   ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'EUROPE'
    )
    SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, p.p_name,
           round(eu.ps_supplycost, 4) AS supplycost
    FROM eu
    JOIN part p     ON p.p_partkey = eu.l_partkey
    JOIN supplier s ON s.s_suppkey = eu.l_suppkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    WHERE p.p_size <= 5
      AND eu.ps_supplycost = (
        SELECT min(eu2.ps_supplycost) FROM eu eu2
        WHERE eu2.l_partkey = p.p_partkey
      )
    ORDER BY s.s_acctbal DESC, n.n_name, s.s_name, p.p_partkey
    LIMIT 100
    """,
    tags=("join", "subquery", "topn"),
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: the region-scoped minimum-cost supplier per part —
    the classic correlated scalar-MIN subquery. Planned scale-first: the
    correlated min is a window MIN partitioned by part key over the
    region-restricted part-supplier relation (one shuffle, no per-row
    re-execution); supplier/nation/region are broadcast dimensions; the
    part filter is broadcast into the derived relation so the window only
    sees surviving parts. Reference delegates this whole surface to Spark
    (`HbaseTable.scala:31-34` capabilities)."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").where(F.col("p_size") <= 5)
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")

    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("ps_supplycost")
    )
    eu_sup = (
        s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("l_partkey")
    eu = (
        ps.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(eu_sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .withColumn("_min_cost", F.min("ps_supplycost").over(w))
        .where(F.col("ps_supplycost") == F.col("_min_cost"))
    )
    return (
        eu.select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            F.round("ps_supplycost", 4).alias("supplycost"),
        )
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@query(
    "q11_important_stock",
    oracle="""
    WITH scoped AS (
      SELECT l.l_partkey, l.l_extendedprice
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n   ON n.n_nationkey = s.s_nationkey
      WHERE n.n_name = 'NATION_7'
    )
    SELECT l_partkey AS ps_partkey,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE)
             / 100 AS part_value
    FROM scoped
    GROUP BY l_partkey
    HAVING CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE)
             / 100 >
           (SELECT 2.0 * (CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                               AS DOUBLE) / 100)
                   / count(DISTINCT l_partkey)
            FROM scoped)
    ORDER BY part_value DESC, ps_partkey
    """,
    tags=("agg", "subquery"),
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-part value within one nation, kept only when it
    exceeds a threshold from an uncorrelated scalar subquery (adapted to
    2x the nation's average per-part value so the selectivity is
    scale-invariant — a fixed fraction-of-total empties as the part count
    grows). The scalar is a single-row aggregate cross-joined (broadcast)
    into the grouped output, so the corpus is scanned twice but shuffled
    once; both the per-part values and the threshold are EXACT fixed-
    point cents sums (money rule, CLAUDE.md — q1 recipe, bit-identical
    to the r7d decimal sums without the per-row BigDecimal cost) so
    engine-order float summation can't flip a borderline group at any
    scale."""
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_7")
    scoped = (
        li.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("l_partkey", "l_extendedprice")
    )
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    total = scoped.agg(
        (
            2.0
            * (F.sum(cents).cast("double") / 100)
            / F.count_distinct("l_partkey")
        ).alias("_threshold")
    )
    return (
        scoped.groupBy(F.col("l_partkey").alias("ps_partkey"))
        .agg((F.sum(cents).cast("double") / 100).alias("part_value"))
        .join(F.broadcast(total))
        .where(F.col("part_value") > F.col("_threshold"))
        .select("ps_partkey", "part_value")
        .orderBy(F.col("part_value").desc(), "ps_partkey")
    )


@query(
    "q16_supplier_part_counts",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(count(DISTINCT ps.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
    JOIN part p ON p.p_partkey = ps.l_partkey
    WHERE p.p_brand <> 'Brand#2'
      AND p.p_type NOT LIKE 'PROMO%'
      AND p.p_size IN (1, 4, 9, 14, 23, 25, 36, 49)
      AND ps.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
    """,
    tags=("agg", "subquery", "anti-join"),
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier counts per part attribute bucket
    with a NOT IN supplier exclusion ("complaint" suppliers adapted to
    negative balances). The NOT IN is a broadcast left-anti join (key side
    is supplier-sized); the distinct pairs come from one hash aggregate;
    count(DISTINCT) expands to a two-phase aggregate Catalyst plans
    map-side-partial first."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#2")
        & (~F.col("p_type").startswith("PROMO"))
        & (F.col("p_size").isin(1, 4, 9, 14, 23, 25, 36, 49))
    )
    bad = load(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    ps = li.select("l_partkey", "l_suppkey").distinct()
    return (
        ps.join(F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


@query(
    "q20_part_promotion_suppliers",
    oracle="""
    SELECT s.s_name, s.s_acctbal
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE n.n_regionkey = 2
      AND s.s_suppkey IN (
        SELECT l_suppkey FROM lineitem
        WHERE l_partkey IN (
            SELECT p_partkey FROM part WHERE p_name LIKE 'small%'
          )
          AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY l_partkey, l_suppkey
        HAVING sum(l_quantity) > 50
      )
    ORDER BY s.s_name
    """,
    tags=("join", "subquery", "agg"),
)
def q20_part_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: nested IN subqueries — suppliers who shipped more
    than a threshold quantity of pattern-matched parts in a year, within
    one region. Planned as a chain of semi-joins: part pattern -> broadcast
    semi into lineitem; grouped HAVING on (part, supplier); the surviving
    supplier keys (tiny) semi-join the supplier dim. The quantity sum is
    integral-valued so the HAVING threshold is exact on both engines."""
    li = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1997-01-01"))
    )
    pk = load(spark, sf_dir, "part").where(F.col("p_name").startswith("small")).select(
        "p_partkey"
    )
    n = load(spark, sf_dir, "nation").where(F.col("n_regionkey") == 2)
    s = load(spark, sf_dir, "supplier")
    qualified = (
        li.join(F.broadcast(pk), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("_qty"))
        .where(F.col("_qty") > 50)
        .select("l_suppkey")
        .distinct()
    )
    return (
        s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(qualified, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


@query(
    "q21_waiting_suppliers",
    oracle="""
    SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o    ON o.o_orderkey = l1.l_orderkey
    JOIN nation n    ON n.n_nationkey = s.s_nationkey
    WHERE o.o_orderstatus = 'F'
      AND n.n_regionkey = 1
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 100
    """,
    tags=("join", "subquery", "agg", "topn"),
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: EXISTS + NOT EXISTS self-joins on the fact table
    (the lone late supplier in a multi-supplier order). Planned scale-first
    as ONE aggregation instead of two correlated self-joins: per-order
    distinct-supplier and distinct-LATE-supplier counts; a lineitem
    qualifies iff its order has >=2 suppliers (the EXISTS) and exactly one
    late supplier (the NOT EXISTS — all late rows then belong to l1's own
    supplier). One orderkey shuffle reused by the join-back; the correlated
    lateness predicate rides the orders join, never a per-row subquery."""
    o = load(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderdate"
    )
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    n = load(spark, sf_dir, "nation").where(F.col("n_regionkey") == 1)
    s = load(spark, sf_dir, "supplier")

    joined = li.join(o, F.col("l_orderkey") == F.col("o_orderkey")).withColumn(
        "_late",
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"),
    )
    stats = joined.groupBy(F.col("l_orderkey").alias("st_orderkey")).agg(
        F.count_distinct("l_suppkey").alias("_nsupp"),
        F.count_distinct(F.when(F.col("_late"), F.col("l_suppkey"))).alias("_nlate"),
    )
    lone_late = (
        joined.where(F.col("_late"))
        .join(
            stats.where((F.col("_nsupp") >= 2) & (F.col("_nlate") == 1)),
            F.col("l_orderkey") == F.col("st_orderkey"),
        )
    )
    nat_sup = s.join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "s_name")
    return (
        lone_late.join(F.broadcast(nat_sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )
