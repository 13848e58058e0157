"""Relational operator suite (SURVEY.md §2.2).

The reference implements none of these — it delegates joins, aggregations,
set ops, grouping and scalar functions to stock Spark (its tests exercise
them through SQL over the connector, ``ScalaDatasourceTest.scala:84-94``).
Our engine does the same, Spark-first; each entry exists so the capability
is *declared and differentially tested* against the DuckDB oracle.

Scale notes baked into the plans:
- dimension joins (region/nation/supplier) are broadcast — verified in
  tests; fact-fact joins shuffle on their keys and AQE handles skew;
- aggregations are expressed so partial (map-side) aggregation applies;
- float aggregates are rounded to 4dp on both sides (summation order).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_hbase_connector_spark.catalogs import load
from spark_hbase_connector_spark.queries.registry import query


@query(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(sum(qty_i) AS DOUBLE)                              AS sum_qty,
           CAST(sum(price_i) AS DOUBLE) / 100                      AS sum_base_price,
           CAST((sum(dp_i) + 50) // 100 AS DOUBLE) / 100           AS sum_disc_price,
           CAST((sum(ch_i) + 5000) // 10000 AS DOUBLE) / 100       AS sum_charge,
           round(CAST(sum(qty_i) AS DOUBLE) / count(*), 4)         AS avg_qty,
           round(CAST(sum(price_i) AS DOUBLE) / 100 / count(*), 4) AS avg_price,
           round(CAST(sum(disc_i) AS DOUBLE) / 100 / count(*), 4)  AS avg_disc,
           count(*)                                                AS count_order
    FROM (
      SELECT l_returnflag, l_linestatus,
             CAST(l_quantity AS BIGINT)                   AS qty_i,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS price_i,
             CAST(round(l_discount * 100) AS BIGINT)      AS disc_i,
             CAST(round(l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(round(l_discount * 100) AS BIGINT))  AS dp_i,
             CAST(round(l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(round(l_discount * 100) AS BIGINT))
               * (100 + CAST(round(l_tax * 100) AS BIGINT))       AS ch_i
      FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    )
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("agg",),
    bench=True,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-heavy multi-aggregate; exercises partial agg +
    whole-stage codegen (all expressions JVM-side).

    All money/quantity sums are EXACT (money rule, CLAUDE.md) but in
    FIXED-POINT LONG arithmetic, not decimal: each of the 4 groups sums
    ~1.5e7 addends at sf100, where round(sum(double), 4) flips its last
    digit between engines — but the r7e decimal formulation cost 10x at
    sf100 (34.5 s vs 3.6 s; a sum over decimal(26,4) leaves Spark's
    compact-long fast path AND pays per-row BigDecimal multiplies).
    Exactness of the integer path: a 2-decimal money value's stored
    double d satisfies |d*100 - cents| <= cents * 2^-52 << 0.5, so
    round(d*100)::long recovers the integer cents EXACTLY in both
    engines (identical IEEE multiply + half-away rounding, never at a
    .5 tie); products stay in long (disc_price scale-4 <= 1e9/row,
    charge scale-6 <= 1.1e11/row, group sums <= 1.2e18 < 2^63 through
    ~sf300 — ANSI mode would throw loudly, not corrupt, beyond); the
    scale-4/6 sums are rounded to scale 2 in INTEGER space
    ((S + 50) div 100 — half-up, sums are positive) so the final cast's
    unscaled value < 2^53, where long->double is exact and /100.0 is
    one correctly-rounded IEEE op in both engines — bit-identical
    outputs, same values as the r7e decimal formulation (verified
    strict at four SFs)."""
    li = load(spark, sf_dir, "lineitem")
    qty_i = F.col("l_quantity").cast("long")
    price_i = F.round(F.col("l_extendedprice") * 100).cast("long")
    disc_i = F.round(F.col("l_discount") * 100).cast("long")
    tax_i = F.round(F.col("l_tax") * 100).cast("long")
    dp_i = price_i * (F.lit(100) - disc_i)
    ch_i = dp_i * (F.lit(100) + tax_i)
    n = F.count(F.lit(1))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty_i).cast("double").alias("sum_qty"),
            (F.sum(price_i).cast("double") / 100).alias("sum_base_price"),
            F.sum(dp_i).alias("__dp"),
            F.sum(ch_i).alias("__ch"),
            F.round(F.sum(qty_i).cast("double") / n, 4).alias("avg_qty"),
            F.round(F.sum(price_i).cast("double") / 100 / n, 4).alias("avg_price"),
            F.round(F.sum(disc_i).cast("double") / 100 / n, 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .select(
            "l_returnflag",
            "l_linestatus",
            "sum_qty",
            "sum_base_price",
            (F.expr("CAST((__dp + 50) div 100 AS DOUBLE)") / 100).alias(
                "sum_disc_price"
            ),
            (F.expr("CAST((__ch + 5000) div 10000 AS DOUBLE)") / 100).alias(
                "sum_charge"
            ),
            "avg_qty",
            "avg_price",
            "avg_disc",
            "count_order",
        )
    )


@query(
    "q6_forecast_revenue",
    oracle="""
    SELECT CAST((sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                     * CAST(round(l_discount * 100) AS BIGINT)) + 50) // 100
                AS DOUBLE) / 100 AS revenue,
           count(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    tags=("agg", "scan"),
    bench=True,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure filter + global aggregate — the query where
    pushdown matters most (all four predicates reach the Parquet scan; the
    agg is a single partial+final pair, no grouping shuffle of note).

    Money rule (CLAUDE.md): FIXED-POINT LONG arithmetic, the q1 recipe
    (`q1_pricing_summary` carries the exactness proof). The r8 decimal
    formulation was equally exact but paid per-row BigDecimal multiplies
    on the scan-heavy path — q1's identical situation cost 10x at sf100.
    Scale-4 product <= 7e5/row (price_cents <= 1e7 x disc in {5,6,7});
    the global sum stays < 2^53 through ~sf10000; half-up scale-2 round
    in integer space ((S+50) div 100, positive), one long->double cast."""
    li = load(spark, sf_dir, "lineitem")
    price_i = F.round(F.col("l_extendedprice") * 100).cast("long")
    disc_i = F.round(F.col("l_discount") * 100).cast("long")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(price_i * disc_i).alias("__rev4"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .select(
            (F.expr("CAST((__rev4 + 50) div 100 AS DOUBLE)") / 100).alias(
                "revenue"
            ),
            "n_items",
        )
    )


@query(
    "q10_returned_items",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(round(l.l_discount * 100) AS BIGINT)))
                AS DOUBLE) / 10000 AS revenue,
           n.n_name
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    tags=("join", "agg", "topn"),
    bench=True,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: 3-way fact join + broadcast dim + top-N by revenue.
    customer/nation broadcast (small sides); the only real shuffle is the
    orders-lineitem fact join and the final grouping; top-20 runs as
    TakeOrderedAndProject, never a global sort.

    Money rule (CLAUDE.md): revenue is an EXACT scale-4 fixed-point sum
    (q1 recipe) — the old round(sum(double), 4) is the class that arms
    as per-customer group size grows. Per-customer scale-4 sums stay
    << 2^53 (a customer's 3-month returned revenue is ~1e9 scale-4
    units), so the single long->double cast is exact and /10000 is one
    correctly-rounded IEEE op on both engines; it also makes the
    revenue-DESC top-20 boundary deterministic."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-10-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    n = load(spark, sf_dir, "nation")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            (
                F.sum(
                    F.round(F.col("l_extendedprice") * 100).cast("long")
                    * (
                        F.lit(100)
                        - F.round(F.col("l_discount") * 100).cast("long")
                    )
                ).cast("double")
                / 10000
            ).alias("revenue")
        )
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@query(
    "q14_promo_revenue",
    oracle="""
    SELECT round(CAST((sum(CASE WHEN p_type = 'ECONOMY' THEN dp_i ELSE 0 END)
                       + 50) // 100 AS DOUBLE)
                 / CAST((sum(dp_i) + 50) // 100 AS DOUBLE) * 1000000)
             / 10000 AS promo_pct,
           count(*) AS n_items
    FROM (
      SELECT p.p_type,
             CAST(round(l.l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(round(l.l_discount * 100) AS BIGINT)) AS dp_i
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l.l_shipdate <  TIMESTAMP '1996-02-01 00:00:00'
    )
    """,
    tags=("join", "agg"),
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional-revenue share over a fact-dim join.
    part is broadcast; one month of lineitem reaches the join pre-filtered
    (predicate pushed to the scan).

    Money rule (CLAUDE.md): the share is a RATIO of two unbounded money
    sums — both accumulate in exact scale-4 fixed-point longs (q1
    recipe), are integer-rounded to scale 2 ((S+50) div 100) so the
    long->double casts stay exact past sf100 (one month of sf100
    lineitem sums to ~7e15 scale-4 units, within 2x of 2^53 — the
    scale-2 form has 100x headroom), and the 4dp percentage is formed
    with the rank-ratio recipe round(x * 1e6)/1e4 — identical IEEE op
    sequence on identical integers in both engines, never round(x, 4)
    on a double."""
    li = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-02-01 00:00:00").cast("timestamp"))
    )
    p = load(spark, sf_dir, "part")
    dp_i = F.round(F.col("l_extendedprice") * 100).cast("long") * (
        F.lit(100) - F.round(F.col("l_discount") * 100).cast("long")
    )
    promo_i = F.when(F.col("p_type") == "ECONOMY", dp_i).otherwise(
        F.lit(0).cast("long")
    )
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.sum(promo_i).alias("__nm4"),
            F.sum(dp_i).alias("__dn4"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .select(
            (
                F.round(
                    F.expr("CAST((__nm4 + 50) div 100 AS DOUBLE)")
                    / F.expr("CAST((__dn4 + 50) div 100 AS DOUBLE)")
                    * 1000000
                )
                / 10000
            ).alias("promo_pct"),
            "n_items",
        )
    )


@query(
    "q19_disjunctive_revenue",
    oracle="""
    SELECT CAST((sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                     * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) + 50)
                // 100 AS DOUBLE) / 100 AS revenue,
           count(*) AS n_items
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity >= 1 AND l.l_quantity <= 20)
       OR (p.p_brand = 'Brand#17' AND p.p_size BETWEEN 10 AND 30
           AND l.l_quantity >= 10 AND l.l_quantity <= 40)
    """,
    tags=("join", "agg", "pushdown"),
    bench=True,
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs spanning both join sides. Catalyst
    derives the per-side implied disjunctions (brand/size on part,
    quantity on lineitem) and pushes them below the join — the classic
    disjunctive-predicate-inference test.

    revenue is EXACT (money rule, CLAUDE.md): at sf10 the matched sum
    reaches ~4.8e10 over ~1M addends, where double summation-order noise
    between engines (~50 ulps) flips the 4th decimal — caught by the
    round-7d expanded sf10 strict sweep. Now FIXED-POINT LONGS (q1
    recipe) instead of r7d's decimals: the decimal sum paid per-row
    BigDecimal multiplies (q1's 10x sf100 tax) AND its scale-4 unscaled
    value (~5e15 at sf100) sat within 2x of the 2^53 cast cliff; the
    integer-rounded scale-2 form has 100x headroom and one exact
    long->double cast. Output is the sum at scale 2 (was scale 4)."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
    c1 = (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 20)
    )
    c2 = (
        (F.col("p_brand") == "Brand#17")
        & F.col("p_size").between(10, 30)
        & F.col("l_quantity").between(10, 40)
    )
    dp_i = F.round(F.col("l_extendedprice") * 100).cast("long") * (
        F.lit(100) - F.round(F.col("l_discount") * 100).cast("long")
    )
    return (
        j.where(c1 | c2)
        .agg(
            F.sum(dp_i).alias("__rev4"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .select(
            (F.expr("CAST((__rev4 + 50) div 100 AS DOUBLE)") / 100).alias(
                "revenue"
            ),
            "n_items",
        )
    )


@query(
    "agg_quantiles",
    oracle="""
    SELECT event_type,
           round(quantile_cont(value, 0.5), 4)  AS p50,
           round(quantile_cont(value, 0.95), 4) AS p95,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events GROUP BY event_type
    """,
    tags=("agg", "quantile"),
)
def agg_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (Spark `percentile` ==
    DuckDB `quantile_cont`, verified bit-identical) + exact distinct
    count. At 100 TB swap percentile -> approx_percentile and
    count(DISTINCT) -> approx_count_distinct (HLL): sketches merge
    map-side, one pass, bounded memory — the exact forms here are the
    oracle-checkable reference output."""
    e = load(spark, sf_dir, "events")
    # percentile and count_distinct in SEPARATE aggregates: mixed, the
    # distinct rewrite pushes the percentile buffers through a 2-way
    # Expand (every row duplicated into the percentile's group AND the
    # distinct group) — r6 sf1 profiling measured the split ~2x faster.
    # The group relation is key-sized, so the rejoin broadcasts.
    q = e.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(value, 0.95)"), 4).alias("p95"),
    )
    d = e.groupBy("event_type").agg(F.countDistinct("user_id").alias("n_users"))
    return q.join(d, "event_type")


@query(
    "correlated_scalar_subquery",
    oracle="""
    SELECT o_orderkey, round(o_totalprice, 4) AS totalprice
    FROM orders o
    WHERE o.o_totalprice > 1.5 * (
      SELECT avg(o2.o_totalprice) FROM orders o2
      WHERE o2.o_custkey = o.o_custkey
    )
    """,
    tags=("subquery",),
)
def correlated_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated SCALAR subquery (complements the EXISTS coverage): orders
    priced >1.5x their customer's average. Catalyst de-correlates this into
    an aggregate + join — no per-row re-execution."""
    o = load(spark, sf_dir, "orders")
    o.createOrReplaceTempView("orders_csq")
    return spark.sql(
        """
        SELECT o_orderkey, round(o_totalprice, 4) AS totalprice
        FROM orders_csq o
        WHERE o.o_totalprice > 1.5 * (
          SELECT avg(o2.o_totalprice) FROM orders_csq o2
          WHERE o2.o_custkey = o.o_custkey
        )
        """
    )


@query(
    "join_salted_skew",
    oracle="""
    SELECT o.o_orderstatus,
           count(*) AS n,
           CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT))
                AS DOUBLE) / 100 AS total_price
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderstatus
    """,
    tags=("join", "skew"),
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted fact-dim equi-join (operators.skew.salted_join): each fact key
    is spread over 8 salt sub-keys and the orders side replicated 8x, so a
    hot orderkey lands on 8 reducers instead of one. Semantics are provably
    identical to the plain join — the oracle IS the plain join.

    total_price is EXACT (money rule, CLAUDE.md): at sf1 the group sums
    reach ~1e11 over 6M addends, where float summation-order noise
    (~sqrt(n)*eps*magnitude ~ 0.03) dwarfs a 4dp round — the old
    round(sum(double),4) flipped its last digit whenever task boundaries
    moved. Now FIXED-POINT cents longs (q1 recipe; the r7d decimal sum
    paid per-row BigDecimal cost on every lineitem row): cents sums stay
    < 2^53 through ~sf10000, one exact long->double cast, /100 is one
    correctly-rounded IEEE op on both engines."""
    from spark_hbase_connector_spark.operators.skew import salted_join

    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
    o = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderstatus"
    )
    joined = salted_join(li, o, on="l_orderkey", salt=8)
    return joined.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        (
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).cast(
                "double"
            )
            / 100
        ).alias("total_price"),
    )


@query(
    "q3_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
           o_orderdate
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1996-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    tags=("join", "agg", "topn"),
    bench=True,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter -> join -> agg -> top-N.
    customer is small relative to lineitem: broadcast it explicitly.

    Money note (CLAUDE.md sweep, r9): revenue keeps round(sum(double), 4)
    because its per-group addend count is BOUNDED BY SCHEMA — the group
    key is l_orderkey and an order has <= 7 lineitems at every SF (group
    size, not table size, arms the flip class). Each addend's exact value
    has scale 4 (2dp x 2dp product), so the exact per-order sum IS a
    scale-4 value: round(x, 4) sits ON the value, never at a .5 tie, and
    the <= 7-addend double sum's error (~1e-10) is 5e5x smaller than the
    5e-5 half-ulp needed to flip it. Deterministic in both engines at any
    SF."""
    c = load(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    li = load(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1996-03-15 00:00:00").cast("timestamp")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "revenue"
            )
        )
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@query(
    "q5_local_supplier_volume",
    oracle="""
    SELECT n_name,
           CAST((sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                     * (100 - CAST(round(l_discount * 100) AS BIGINT))) + 50)
                // 100 AS DOUBLE) / 100 AS revenue
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    """,
    tags=("join", "agg"),
    bench=True,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way star join.

    Scale shape: the region filter is pushed through nation onto BOTH
    fact-adjacent sides before any big join — nation⋈region(ASIA) is a
    5-row relation, broadcast onto supplier AND customer, cutting each
    to ~1/5 ahead of the shuffles (Catalyst cannot derive this: the
    constraint reaches customer only transitively via the
    c_nationkey = s_nationkey join condition). customer and supplier are
    NOT hint-broadcast — they scale with SF (15M / 1M rows at sf100; a
    forced customer broadcast built a ~GB hash relation per task and went
    super-linear, 139 s solo at sf100), so sizing is left to
    AQE/autoBroadcastJoinThreshold: small SFs still broadcast both,
    sf100 shuffles customer and broadcasts the reduced supplier."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    asia_n = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
        "n_nationkey", "n_name"
    )
    s2 = s.join(F.broadcast(asia_n), s.s_nationkey == F.col("n_nationkey"))
    c2 = c.join(
        F.broadcast(asia_n.select(F.col("n_nationkey").alias("__cnk"))),
        c.c_nationkey == F.col("__cnk"),
    )
    # orders⋈customer first: the ASIA-reduced customer side cuts orders
    # ~5x before the 600M-row lineitem join, so the big SMJ's output (and
    # everything downstream) shrinks by the same factor
    oc = o.join(c2, o.o_custkey == c2.c_custkey)
    return (
        li.join(oc, li.l_orderkey == oc.o_orderkey)
        .join(
            s2,
            (li.l_suppkey == s2.s_suppkey) & (oc.c_nationkey == s2.s_nationkey),
        )
        .groupBy("n_name")
        .agg(
            # Money rule (CLAUDE.md): FIXED-POINT LONGS, the q1 recipe —
            # exact scale-4 products in int64, half-up scale-2 round in
            # integer space, one exact long->double cast. Replaces the r8
            # decimal-domain rounding (bit-identical values) because the
            # decimal sum pays per-row BigDecimal multiplies — q1's
            # identical formulation cost 10x at sf100.
            F.sum(
                F.round(F.col("l_extendedprice") * 100).cast("long")
                * (
                    F.lit(100) - F.round(F.col("l_discount") * 100).cast("long")
                )
            ).alias("__rev4")
        )
        .select(
            "n_name",
            (F.expr("CAST((__rev4 + 50) div 100 AS DOUBLE)") / 100).alias(
                "revenue"
            ),
        )
    )


@query(
    "join_outer_agg",
    oracle="""
    SELECT c_custkey, count(o_orderkey) AS n_orders,
           CAST(coalesce(sum(CAST(round(o_totalprice * 100) AS BIGINT)), 0)
                AS DOUBLE) / 100 AS total_spent
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
    """,
    tags=("join",),
)
def join_outer_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving customers with no orders (NULL-safe agg).
    total_spent is an EXACT fixed-point cents sum (money rule, CLAUDE.md
    q1 recipe) — per-customer order counts are small under TPC-H but
    unbounded under replication, which is what arms the old
    round(sum(double), 4)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            (
                F.coalesce(F.sum(cents), F.lit(0).cast("long")).cast("double")
                / 100
            ).alias("total_spent"),
        )
    )


@query(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_totalprice > 50000.0)
    """,
    tags=("join",),
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").where(F.col("o_totalprice") > 50000.0)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@query(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    tags=("join",),
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS): customers who never ordered."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@query(
    "agg_distinct",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_partkey) AS n_parts,
           count(DISTINCT l_suppkey) AS n_supps,
           count(*) AS n_rows
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg",),
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-distinct aggregation (expand + two-phase agg in Spark)."""
    return (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_suppkey").alias("n_supps"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@query(
    "agg_having",
    oracle="""
    SELECT o_custkey, count(*) AS n,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
             / 100 AS spent
    FROM orders GROUP BY o_custkey
    HAVING count(*) >= 15
    """,
    tags=("agg",),
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY + HAVING (post-aggregation filter). spent is an EXACT
    fixed-point cents sum (money rule, CLAUDE.md q1 recipe): the group is
    per-customer and the HAVING gate selects exactly the LARGE groups, so
    the old round(sum(double), 4) was the first place a bigger corpus
    would flip."""
    return (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (
                F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).cast(
                    "double"
                )
                / 100
            ).alias("spent"),
        )
        .where(F.col("n") >= 15)
    )


@query(
    "agg_case_when",
    oracle="""
    SELECT o_orderpriority,
           count(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
           count(*) FILTER (WHERE o_orderstatus = 'O') AS n_open,
           CAST(sum(CASE WHEN o_totalprice > 100000.0
                         THEN CAST(round(o_totalprice * 100) AS BIGINT)
                         ELSE 0 END) AS DOUBLE) / 100
             AS big_total
    FROM orders GROUP BY o_orderpriority
    """,
    tags=("agg",),
)
def agg_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation (CASE WHEN / FILTER clauses). big_total
    is EXACT (money rule, CLAUDE.md — sf10 group sums reach ~7e11 where
    double order noise flips the 4th decimal; caught by the round-7d
    expanded sf10 sweep), now in fixed-point cents longs (q1 recipe;
    bit-identical to the r7d decimal sum without the per-row BigDecimal
    cost); the >100000.0 gate stays on the raw double, identical bits on
    both engines."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("n_finished"),
        F.count(F.when(F.col("o_orderstatus") == "O", 1)).alias("n_open"),
        (
            F.sum(
                F.when(
                    F.col("o_totalprice") > 100000.0,
                    F.round(F.col("o_totalprice") * 100).cast("long"),
                ).otherwise(F.lit(0).cast("long"))
            ).cast("double")
            / 100
        ).alias("big_total"),
    )


@query(
    "rollup_orders",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, count(*) AS n,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
             / 100 AS total
    FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
    tags=("agg", "grouping"),
)
def rollup_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals. total is EXACT (money rule, CLAUDE.md —
    the grand-total row reaches ~2.5e12 at sf10 where double order noise
    flips the 4th decimal; caught by the round-7d expanded sf10 sweep),
    now fixed-point cents longs (q1 recipe; the grand total's cents stay
    < 2^53 through ~sf3000)."""
    return (
        load(spark, sf_dir, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (
                F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).cast(
                    "double"
                )
                / 100
            ).alias("total"),
        )
    )


@query(
    "cube_lineitem",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS sum_qty
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    tags=("agg", "grouping"),
)
def cube_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two dimensions. l_quantity is integer-valued: summing it
    as BIGINT is exact (and stays exact in the double cast through 2^53,
    ~sf1e7) without the per-row decimal cast the r7d formulation paid."""
    return (
        load(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("long")).cast("double").alias("sum_qty")
        )
    )


@query(
    "grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, count(*) AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
    """,
    tags=("agg", "grouping"),
)
def grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, count(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        """
    )


@query(
    "pivot_lineitem",
    oracle="""
    SELECT l_returnflag,
           CAST(coalesce(sum(CAST(l_quantity AS BIGINT))
                         FILTER (WHERE l_linestatus = 'O'), 0) AS DOUBLE) AS qty_O,
           CAST(coalesce(sum(CAST(l_quantity AS BIGINT))
                         FILTER (WHERE l_linestatus = 'F'), 0) AS DOUBLE) AS qty_F
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg", "pivot"),
)
def pivot_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT on linestatus (conditional-agg equivalent in the oracle).
    l_quantity is integer-valued: BIGINT sums are exact without the
    per-row decimal cast (money-rule sweep, r9)."""
    df = (
        load(spark, sf_dir, "lineitem")
        .withColumn("l_quantity", F.col("l_quantity").cast("long"))
        .groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .sum("l_quantity")
    )
    zero = F.lit(0).cast("long")
    return df.select(
        "l_returnflag",
        F.coalesce(F.col("O"), zero).cast("double").alias("qty_O"),
        F.coalesce(F.col("F"), zero).cast("double").alias("qty_F"),
    )


@query(
    "setop_intersect",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    INTERSECT
    SELECT c_custkey FROM customer WHERE c_acctbal > 5000.0
    """,
    tags=("setop",),
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    a = c.where(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = c.where(F.col("c_acctbal") > 5000.0).select("c_custkey")
    return a.intersect(b)


@query(
    "setop_except",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    EXCEPT
    SELECT c_custkey FROM customer WHERE c_acctbal > 5000.0
    """,
    tags=("setop",),
)
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    a = c.where(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = c.where(F.col("c_acctbal") > 5000.0).select("c_custkey")
    return a.exceptAll(b).distinct()


@query(
    "setop_union",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_acctbal < 0.0
    UNION
    SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 300000.0
    """,
    tags=("setop",),
)
def setop_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").where(F.col("c_acctbal") < 0.0).select("c_custkey")
    o = (
        load(spark, sf_dir, "orders")
        .where(F.col("o_totalprice") > 300000.0)
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return c.union(o).distinct()


@query(
    "scalar_datetime",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INTEGER)    AS yr,
           CAST(month(o_orderdate) AS INTEGER)   AS mo,
           CAST(day(o_orderdate) AS INTEGER)     AS dy,
           CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start
    FROM orders WHERE o_orderkey <= 500
    """,
    tags=("scalar",),
)
def scalar_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar date/time functions (the reference's tests exercise to_date /
    to_timestamp via Spark, ScalaDatasourceTest.scala:74,86-87)."""
    o = load(spark, sf_dir, "orders").where(F.col("o_orderkey") <= 500)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("int").alias("yr"),
        F.month("o_orderdate").cast("int").alias("mo"),
        F.dayofmonth("o_orderdate").cast("int").alias("dy"),
        F.quarter("o_orderdate").cast("int").alias("qtr"),
        # Spark date_trunc returns TIMESTAMP while DuckDB (on a DATE input)
        # returns DATE — the ORACLE casts to TIMESTAMP so the arrow types
        # agree (schema-parity gate). Repo convention: computed date buckets
        # stay timestamps; pandas renders DuckDB DATE as Timestamp but Spark
        # DATE as datetime.date, so timestamp/timestamp is the aligned pair.
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
    )


@query(
    "scalar_string",
    oracle="""
    SELECT p_partkey,
           upper(p_name)                              AS upname,
           CAST(length(p_name) AS INTEGER)            AS name_len,
           substring(p_name, 1, 3)                    AS pre3,
           concat(p_brand, ':', p_type)               AS brand_type,
           regexp_extract(p_name, '([a-z]+)$', 1)     AS last_word
    FROM part WHERE p_partkey <= 200
    """,
    tags=("scalar",),
)
def scalar_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar string functions incl. regex extraction."""
    p = load(spark, sf_dir, "part").where(F.col("p_partkey") <= 200)
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("upname"),
        F.length("p_name").cast("int").alias("name_len"),
        F.substring("p_name", 1, 3).alias("pre3"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.regexp_extract("p_name", r"([a-z]+)$", 1).alias("last_word"),
    )


@query(
    "scalar_json",
    oracle="""
    SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
    FROM events WHERE event_id <= 1000
    """,
    tags=("scalar", "json"),
)
def scalar_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction from a string column."""
    e = load(spark, sf_dir, "events").where(F.col("event_id") <= 1000)
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k"),
    )


@query(
    "scalar_udf_isostring",
    oracle="""
    SELECT o_orderkey,
           strptime(strftime(o_orderdate, '%Y-%m-%dT%H:%M:%SZ'),
                    '%Y-%m-%dT%H:%M:%SZ') AS parsed
    FROM orders WHERE o_orderkey <= 300
    """,
    tags=("scalar", "udf"),
)
def scalar_udf_isostring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UDF registration parity (ScalaDatasourceTest.scala:72): a registered
    ``from_iso_string`` UDF (Arrow-vectorized) parses ISO-8601 strings; here
    driven through SQL over a rendered ISO column, roundtripping
    o_orderdate."""
    from spark_hbase_connector_spark.functions.udfs import register_builtin_udfs

    register_builtin_udfs(spark)
    o = load(spark, sf_dir, "orders").where(F.col("o_orderkey") <= 300)
    o.select(
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("iso"),
    ).createOrReplaceTempView("iso_orders")
    return spark.sql(
        "SELECT o_orderkey, from_iso_string(iso) AS parsed FROM iso_orders"
    )


@query(
    "topn_limit",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 25
    """,
    tags=("sort", "topn"),
)
def topn_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global ORDER BY + LIMIT (Spark plans TakeOrderedAndProject — no full
    sort materialization; deterministic via o_orderkey tiebreak)."""
    return (
        load(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(25)
    )


@query(
    "exists_subquery",
    oracle="""
    SELECT s_suppkey, s_name FROM supplier
    WHERE EXISTS (
      SELECT 1 FROM lineitem
      WHERE l_suppkey = s_suppkey AND l_quantity > 49.0
    )
    """,
    tags=("join", "subquery"),
)
def exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS subquery via SQL (Catalyst rewrites to semi-join)."""
    load(spark, sf_dir, "supplier").createOrReplaceTempView("supplier")
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT s_suppkey, s_name FROM supplier
        WHERE EXISTS (
          SELECT 1 FROM lineitem
          WHERE l_suppkey = s_suppkey AND l_quantity > 49.0
        )
        """
    )


@query(
    "not_in_null_aware",
    oracle="""
    SELECT c_custkey, c_name, c_nationkey
    FROM customer
    WHERE c_nationkey NOT IN (
      SELECT n_nationkey FROM nation WHERE n_name IN ('NATION_1', 'NATION_3')
    )
    """,
    tags=("join", "subquery"),
)
def not_in_null_aware(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN over a subquery — the null-aware anti join planner shape.
    Unlike NOT EXISTS, NOT IN must return zero rows if the subquery ever
    yields NULL, so Catalyst plans a null-aware anti join (single-column
    NAAJ runs as a broadcast hash join with the null check folded in;
    the build side is the subquery result, dimension-sized here). The
    probe side streams — no shuffle of customer at any scale."""
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer_naaj_v")
    load(spark, sf_dir, "nation").createOrReplaceTempView("nation_naaj_v")
    return spark.sql(
        """
        SELECT c_custkey, c_name, c_nationkey
        FROM customer_naaj_v
        WHERE c_nationkey NOT IN (
          SELECT n_nationkey FROM nation_naaj_v
          WHERE n_name IN ('NATION_1', 'NATION_3')
        )
        """
    )


@query(
    "setop_intersect_all",
    oracle="""
    SELECT l_orderkey FROM lineitem WHERE l_quantity >= 30
    INTERSECT ALL
    SELECT l_orderkey FROM lineitem WHERE l_discount > 0.05
    """,
    tags=("setop",),
)
def setop_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL — multiset intersection (min of per-side
    multiplicities), a distinct planner shape from INTERSECT: Spark
    rewrites it to a count-compare aggregation, not a left-semi. Orderkeys
    repeat across lineitems, so multiplicities genuinely differ from the
    distinct variant here."""
    li = load(spark, sf_dir, "lineitem")
    a = li.where(F.col("l_quantity") >= 30).select("l_orderkey")
    b = li.where(F.col("l_discount") > 0.05).select("l_orderkey")
    return a.intersectAll(b)


@query(
    "setop_except_all",
    oracle="""
    SELECT l_orderkey FROM lineitem WHERE l_quantity >= 30
    EXCEPT ALL
    SELECT l_orderkey FROM lineitem WHERE l_discount > 0.05
    """,
    tags=("setop",),
)
def setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL — multiset difference (per-row multiplicity
    subtraction), the bag-semantics cousin of EXCEPT's anti-join."""
    li = load(spark, sf_dir, "lineitem")
    a = li.where(F.col("l_quantity") >= 30).select("l_orderkey")
    b = li.where(F.col("l_discount") > 0.05).select("l_orderkey")
    return a.exceptAll(b)


@query(
    "sort_null_ordering",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.plan') AS VARCHAR) AS plan_name
    FROM events
    ORDER BY plan_name DESC NULLS FIRST, event_id
    LIMIT 50
    """,
    tags=("sort",),
)
def sort_null_ordering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit NULLS FIRST with a DESC sort (Spark's DESC default is
    NULLS LAST, so the ordering must be spelled out on both engines) over
    a JSON-extracted nullable key, plus a deterministic tiebreak and
    LIMIT — exercising the TakeOrderedAndProject path with non-default
    null ordering."""
    e = load(spark, sf_dir, "events")
    plan_name = F.get_json_object("props", "$.plan").alias("plan_name")
    return (
        e.select("event_id", plan_name)
        .orderBy(F.col("plan_name").desc_nulls_first(), "event_id")
        .limit(50)
    )
