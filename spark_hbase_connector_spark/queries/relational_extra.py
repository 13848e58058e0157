"""Additional relational surface: statistical aggregates, unpivot/melt,
lateral explode with position, ordered string aggregation, distribution
window functions, and fixed-width histograms.

Like `queries/relational.py`, these are capabilities the reference
delegates wholesale to Spark (SURVEY.md §2.2; its tests run SQL over the
connector, `ScalaDatasourceTest.scala:84-94`); each entry declares the
shape and differentially tests it against the DuckDB oracle.

Scale notes:
- every aggregate here is partial-aggregatable (map-side combine) and
  groups on low-cardinality keys — one shuffle, no skew risk;
- the two global-window entries order by a unique total key over the
  *supplier* dimension (small by TPC-H construction); at fact-table scale
  partition the window by a key, as `window_topk_per_group` does;
- `lateral_explode_tokens` bounds the explode to the first 5 positions
  per document, so output is O(docs), never O(tokens).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_hbase_connector_spark.catalogs import load
from spark_hbase_connector_spark.queries.registry import query


@query(
    "agg_stats_moments",
    oracle="""
    SELECT l_returnflag,
           round(corr(l_quantity, l_extendedprice), 4)        AS corr_qty_price,
           round(covar_samp(l_quantity, l_extendedprice), 4)  AS covar_qty_price,
           round(covar_pop(l_quantity, l_extendedprice), 4)   AS covar_pop_qty_price,
           round(stddev_samp(l_extendedprice), 4)             AS std_price,
           round(var_pop(l_discount), 4)                      AS var_disc,
           round(regr_slope(l_extendedprice, l_quantity), 4)  AS slope_price_qty,
           round(regr_intercept(l_extendedprice, l_quantity), 4) AS icept_price_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("agg", "stats"),
)
def agg_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-moment statistical aggregates — corr / covar (sample and
    population) / stddev / variance / linear regression slope+intercept —
    per group, all JVM built-ins with map-side partials (one shuffle on a
    3-value key). Skewness/kurtosis are deliberately absent: Spark and
    DuckDB disagree on the bias-correction convention, so they cannot
    share an exact oracle."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias("covar_qty_price"),
        F.round(F.covar_pop("l_quantity", "l_extendedprice"), 4).alias("covar_pop_qty_price"),
        F.round(F.stddev_samp("l_extendedprice"), 4).alias("std_price"),
        F.round(F.var_pop("l_discount"), 4).alias("var_disc"),
        F.round(F.expr("regr_slope(l_extendedprice, l_quantity)"), 4).alias("slope_price_qty"),
        F.round(F.expr("regr_intercept(l_extendedprice, l_quantity)"), 4).alias("icept_price_qty"),
    )


@query(
    "unpivot_measures",
    oracle="""
    WITH long AS (
      SELECT l_returnflag, 'l_quantity' AS measure,
             CAST(round(l_quantity * 100) AS BIGINT) AS val FROM lineitem
      UNION ALL
      SELECT l_returnflag, 'l_extendedprice',
             CAST(round(l_extendedprice * 100) AS BIGINT) FROM lineitem
      UNION ALL
      SELECT l_returnflag, 'l_discount',
             CAST(round(l_discount * 100) AS BIGINT) FROM lineitem
      UNION ALL
      SELECT l_returnflag, 'l_tax',
             CAST(round(l_tax * 100) AS BIGINT) FROM lineitem
    )
    SELECT l_returnflag, measure,
           CAST(sum(val) AS DOUBLE) / 100 AS total, count(*) AS n
    FROM long GROUP BY l_returnflag, measure
    """,
    tags=("unpivot",),
)
def unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide-to-long unpivot (the inverse of `pivot_lineitem`): melt four
    measure columns into (measure, val) rows, then aggregate. Spark's
    native `DataFrame.unpivot` expands rows inside the scan stage — no
    shuffle until the aggregation; the oracle replays it as UNION ALL.
    All four measures are at most 2dp, so they melt as EXACT fixed-point
    cents (money rule, CLAUDE.md q1 recipe — the l_extendedprice group
    reaches ~1e12 at sf10 where double order noise flips the 4th
    decimal, caught by the round-7d expanded sf10 sweep; cents longs are
    bit-identical to the r7d decimal melt without the per-row BigDecimal
    cost)."""
    li = load(spark, sf_dir, "lineitem")
    measures = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    li = li.select(
        "l_returnflag",
        *(F.round(F.col(c) * 100).cast("long").alias(c) for c in measures),
    )
    long = li.unpivot(["l_returnflag"], measures, "measure", "val")
    return long.groupBy("l_returnflag", "measure").agg(
        (F.sum("val").cast("double") / 100).alias("total"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "lateral_explode_tokens",
    oracle="""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents)
    SELECT doc_id, CAST(i AS INT) AS pos, l[CAST(i AS INT) + 1] AS token
    FROM toks CROSS JOIN range(5) t(i)
    WHERE len(l) > i
    """,
    tags=("explode", "lateral"),
)
def lateral_explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL VIEW posexplode: each document's first five tokens with
    their positions. The slice is applied BEFORE the generator, so the
    explode materializes at most five elements per document — output and
    work are both O(docs), never O(tokens)."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.posexplode(F.slice(F.split(F.col("text"), " "), 1, 5)).alias("pos", "token"),
    )


@query(
    "listagg_ordered",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           string_agg(CAST(l_linenumber AS VARCHAR), ',' ORDER BY l_linenumber)
             AS linenumbers,
           count(*) AS n_distinct
    FROM (SELECT DISTINCT l_returnflag, l_linestatus, l_linenumber FROM lineitem)
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("agg", "listagg"),
)
def listagg_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG / string_agg): the distinct
    line numbers per (returnflag, linestatus) as a sorted CSV, via the
    state-GUARDED operator (`operators/guards.listagg_sorted_capped`):
    `collect_list` is order-nondeterministic under parallel merge, so the
    deterministic form is collect -> array_sort -> join — and any group
    exceeding the element cap fails the job loudly naming the group
    instead of emitting a giant CSV cell. Here the aggregation state is
    the distinct set (bounded, 7 values), so the guard never fires."""
    from spark_hbase_connector_spark.operators.guards import listagg_sorted_capped

    li = load(spark, sf_dir, "lineitem")
    return listagg_sorted_capped(
        li.select("l_returnflag", "l_linestatus", "l_linenumber").distinct(),
        ["l_returnflag", "l_linestatus"],
        "l_linenumber",
        "linenumbers",
    ).withColumnRenamed("n_items", "n_distinct")


@query(
    "window_percent_cume",
    oracle="""
    SELECT s_suppkey, s_name,
           round((percent_rank() OVER w) * 10000) / 10000 AS pct_rank,
           round((cume_dist() OVER w) * 10000) / 10000    AS cume
    FROM supplier
    WINDOW w AS (ORDER BY s_acctbal DESC, s_suppkey)
    """,
    tags=("window",),
)
def window_percent_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank / cume_dist — the distribution window kinds missing
    from `window_rank_kinds`. The tiebreak key makes every peer group a
    singleton, so both functions are total-order deterministic. Global
    window over the supplier dim (small by construction); partition the
    window by a key for fact-scale inputs.

    Rounding is round(x * 10000) / 10000 on BOTH engines, not
    round(x, 4): rank ratios like cume = 5/100000 at sf10 hit an exact
    .5 at the 4th decimal, where DuckDB's scale-4 round (multiply, then
    round the PRODUCT double) and Spark's (round the decimal expansion
    of the ORIGINAL double) disagree — the 7d expanded sf10 sweep caught
    exactly that. Pre-multiplying makes both engines round the SAME
    product double at scale 0, where their half-away semantics are
    identical."""
    s = load(spark, sf_dir, "supplier")
    w = Window.orderBy(F.desc("s_acctbal"), F.asc("s_suppkey"))
    return s.select(
        "s_suppkey",
        "s_name",
        (F.round(F.percent_rank().over(w) * 10000) / 10000).alias("pct_rank"),
        (F.round(F.cume_dist().over(w) * 10000) / 10000).alias("cume"),
    )


@query(
    "events_histogram",
    oracle="""
    SELECT CAST(floor(value / 50.0) AS INT) AS bucket,
           CAST(CAST(floor(value / 50.0) AS INT) * 50.0 AS DOUBLE) AS bucket_lo,
           count(*) AS n,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100
             AS total
    FROM events
    GROUP BY 1, 2
    """,
    tags=("agg", "histogram"),
)
def events_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width value histogram (width_bucket by arithmetic — portable
    across engines): floor-bucket the measure, count and sum per bucket.
    One map-side-combinable shuffle on ~10 bucket keys; the shape behind
    every distribution dashboard at scale.

    total is EXACT (money rule, CLAUDE.md): buckets hold up to ~6e7
    addends at sf100, where double summation-order noise flips
    round(sum(double), 4)'s last digit between engines — caught by the
    round-7e sf100 sweep. Fixed-point cents longs (q1 recipe) —
    bit-identical to the r7e decimal sum, no per-row BigDecimal cost on
    the scan-heavy path."""
    e = load(spark, sf_dir, "events")
    bucket = F.floor(F.col("value") / 50.0).cast("int")
    return (
        e.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            (
                F.sum(F.round(F.col("value") * 100).cast("long")).cast(
                    "double"
                )
                / 100
            ).alias("total"),
        )
        .select("bucket", (F.col("bucket") * 50.0).alias("bucket_lo"), "n", "total")
    )


@query(
    "window_first_last_nth",
    oracle="""
    SELECT s_suppkey, s_nationkey,
           first_value(s_name) OVER w AS richest,
           last_value(s_name) OVER w  AS poorest,
           nth_value(s_name, 2) OVER w AS runner_up
    FROM supplier
    WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    tags=("window",),
)
def window_first_last_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / last_value / nth_value over an unbounded frame per
    nation — navigation window kinds. The frame must be explicitly
    UNBOUNDED FOLLOWING on both engines (the default frame ends at
    CURRENT ROW, which makes last_value degenerate); the tiebreak key
    makes each a total order."""
    s = load(spark, sf_dir, "supplier")
    w = (
        Window.partitionBy("s_nationkey")
        .orderBy(F.desc("s_acctbal"), F.asc("s_suppkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return s.select(
        "s_suppkey",
        "s_nationkey",
        F.first("s_name").over(w).alias("richest"),
        F.last("s_name").over(w).alias("poorest"),
        F.nth_value("s_name", 2).over(w).alias("runner_up"),
    )


@query(
    "agg_bitwise_bool",
    oracle="""
    SELECT event_type,
           bit_and(user_id) AS band, bit_or(user_id) AS bor,
           bit_xor(user_id) AS bxor,
           bool_and(value > 0.005) AS all_pos,
           bool_or(value > 400)    AS any_large
    FROM events GROUP BY event_type
    """,
    tags=("agg", "bitwise"),
)
def agg_bitwise_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise (bit_and/bit_or/bit_xor) and boolean (bool_and/bool_or)
    aggregates — exact, order-insensitive, map-side combinable; the
    bitmask-accumulation shape behind feature-flag and permission-mask
    rollups."""
    e = load(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.bit_and("user_id").alias("band"),
        F.bit_or("user_id").alias("bor"),
        F.bit_xor("user_id").alias("bxor"),
        F.bool_and(F.col("value") > 0.005).alias("all_pos"),
        F.bool_or(F.col("value") > 400).alias("any_large"),
    )


@query(
    "agg_max_by",
    oracle="""
    SELECT s_nationkey,
           arg_max(s_name, s_acctbal * 1000000 + s_suppkey) AS richest_name,
           arg_min(s_name, s_acctbal * 1000000 + s_suppkey) AS poorest_name,
           round(max(s_acctbal), 4) AS max_bal
    FROM supplier GROUP BY s_nationkey
    """,
    tags=("agg", "argmax"),
)
def agg_max_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by / min_by (arg_max / arg_min): the value of one column at
    another's extremum, per group. Both engines leave ties unspecified, so
    the ordering key is the composite s_acctbal*1e6 + s_suppkey — unique
    by construction (acctbal has 2 decimals, suppkey < 1e6), making the
    answer total-order deterministic without a window."""
    s = load(spark, sf_dir, "supplier")
    key = F.col("s_acctbal") * 1000000 + F.col("s_suppkey")
    return s.groupBy("s_nationkey").agg(
        F.max_by("s_name", key).alias("richest_name"),
        F.min_by("s_name", key).alias("poorest_name"),
        F.round(F.max("s_acctbal"), 4).alias("max_bal"),
    )


@query(
    "scalar_regexp_extract_all",
    oracle="""
    SELECT event_id,
           coalesce(array_to_string(
               regexp_extract_all(props, '[0-9]+(?:\\.[0-9]+)?'), ','), '')
             AS numbers,
           CAST(len(regexp_extract_all(props, '[0-9]+(?:\\.[0-9]+)?'))
                AS INTEGER) AS n_numbers
    FROM events
    WHERE event_id % 97 = 0
    """,
    tags=("scalar", "regex"),
)
def scalar_regexp_extract_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp_extract_all — all numeric literals in the JSON props blob,
    the multi-match sibling of the single-match regex scalars. The match
    list is emitted comma-joined (``array_join`` / ``array_to_string``)
    rather than as an ArrayType column: the driver's canonicalizer sorts
    output columns with pandas and list cells are unhashable (the single
    r7 driver red). Multi-match semantics stay fully testable — the
    joined string preserves every match and its order. The modulo
    predicate keeps the differential row set bounded and is pushed to
    the scan."""
    e = load(spark, sf_dir, "events")
    pat = r"[0-9]+(?:\.[0-9]+)?"
    matches = F.regexp_extract_all("props", F.lit(pat), 0)
    return e.where(F.col("event_id") % 97 == 0).select(
        "event_id",
        F.array_join(matches, ",").alias("numbers"),
        F.size(matches).alias("n_numbers"),
    )


@query(
    "scalar_try_cast",
    oracle="""
    SELECT event_id,
           TRY_CAST(substr(props, 7, 3) AS DOUBLE) AS maybe_num,
           TRY_CAST(event_type AS BIGINT)          AS never_num,
           CAST(regexp_extract(props, '[0-9]+') AS BIGINT) AS k_val
    FROM events WHERE event_id % 101 = 0
    """,
    tags=("scalar", "cast"),
)
def scalar_try_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-safe casting: `try_cast` yields NULL on malformed input where
    a plain CAST would raise under ANSI mode (Spark 4's default) — the
    ingest-time armor for dirty string columns. The substring slice is
    sometimes a clean number and sometimes includes the closing brace, so
    both outcomes are exercised on real rows."""
    e = load(spark, sf_dir, "events")
    return e.where(F.col("event_id") % 101 == 0).select(
        "event_id",
        F.expr("try_cast(substring(props, 7, 3) AS DOUBLE)").alias("maybe_num"),
        F.expr("try_cast(event_type AS BIGINT)").alias("never_num"),
        F.regexp_extract("props", "[0-9]+", 0).cast("bigint").alias("k_val"),
    )


@query(
    "scalar_array_setops",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
    ab AS (SELECT doc_id, l[1:15] AS a, l[10:24] AS b FROM t)
    SELECT doc_id,
           coalesce(array_to_string(list_sort(list_intersect(a, b)), ','),
                    '') AS inter,
           coalesce(array_to_string(list_sort(list_distinct(a || b)), ','),
                    '') AS uni,
           coalesce(array_to_string(list_sort(list_distinct(
               list_filter(a, x -> NOT list_contains(b, x)))), ','), '')
             AS diff
    FROM ab WHERE doc_id % 11 = 0
    """,
    tags=("scalar", "array"),
)
def scalar_array_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array set algebra (array_intersect / array_union / array_except)
    over two overlapping token windows of each document. Both engines
    return distinct elements with unspecified order, so every result is
    sorted, then comma-joined — the driver canonicalizer sorts output
    columns with pandas and list cells are unhashable, so the joined
    string is the deterministic AND hashable form (set semantics remain
    fully testable: every element and its sorted position survive). The
    oracle coalesces to '' because DuckDB's array_to_string returns NULL
    for an EMPTY list where Spark's array_join returns '' — a divergence
    only reachable when a-minus-b is empty, which first occurred at sf1
    (text/props are non-null in every testdata decade, so the coalesce
    is exact). All JVM expressions, zero shuffles, output bounded by the
    slice widths."""
    d = load(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    a, b = F.slice(toks, 1, 15), F.slice(toks, 10, 15)
    return d.where(F.col("doc_id") % 11 == 0).select(
        "doc_id",
        F.array_join(F.array_sort(F.array_intersect(a, b)), ",").alias("inter"),
        F.array_join(F.array_sort(F.array_union(a, b)), ",").alias("uni"),
        F.array_join(F.array_sort(F.array_except(a, b)), ",").alias("diff"),
    )


@query(
    "dedup_latest_by_key",
    oracle="""
    SELECT user_id, event_type, ts, value FROM (
      SELECT user_id, event_type, ts, value,
             row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
    tags=("dedup", "window"),
)
def dedup_latest_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep the latest row per key (the QUALIFY row_number()=1 shape) —
    the most common production dedup: one row per (user, event_type) at
    its max event time, tie-broken by event_id for a total order. One
    shuffle on the key; Spark plans the rn=1 filter as a per-partition
    top-1 (WindowGroupLimit), never materializing full per-key sorts of
    history at scale."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        e.select("user_id", "event_type", "ts", "value", "event_id")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "event_type", "ts", "value")
    )


@query(
    "rollup_time_hierarchy",
    oracle="""
    SELECT CAST(year(ts) AS INT) AS yr,
           CAST(month(ts) AS INT) AS mo,
           CAST(day(ts) AS INT) AS dy,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100
             AS total
    FROM events
    GROUP BY ROLLUP (yr, mo, dy)
    """,
    tags=("agg", "rollup", "timeseries"),
)
def rollup_time_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-hierarchy rollup (day ⊂ month ⊂ year ⊂ grand total) in
    one pass — the time-dimension cube every dashboard wants. ROLLUP
    expands to 4 grouping sets; Spark computes them from one shuffle of
    partial aggregates, not four scans.

    total is EXACT (money rule, CLAUDE.md): the grand-total row sums ALL
    1e8 values at sf100, where round(sum(double), 4) flips its last
    digit between engines — caught by the round-7e sf100 sweep. Fixed-
    point cents longs (q1 recipe; grand-total cents < 2^53 through
    ~sf4000) — bit-identical to the r7e decimal sum, 1e8 BigDecimal
    per-row casts avoided."""
    e = load(spark, sf_dir, "events")
    return (
        e.select(
            F.year("ts").alias("yr"),
            F.month("ts").alias("mo"),
            F.dayofmonth("ts").alias("dy"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
        .rollup("yr", "mo", "dy")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum("cents").cast("double") / 100).alias("total"),
        )
    )


@query(
    "union_by_name_evolution",
    oracle="""
    SELECT o_orderkey AS k, o_totalprice AS price, o_orderstatus AS status,
           NULL AS priority
    FROM orders WHERE o_orderkey % 1003 = 0
    UNION ALL
    SELECT o_orderkey, NULL, o_orderstatus, o_orderpriority
    FROM orders WHERE o_orderkey % 1007 = 0
    """,
    tags=("setop", "schema"),
)
def union_by_name_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution union: two relations with overlapping-but-
    different columns combined by NAME (missing columns null-filled) —
    `unionByName(allowMissingColumns=True)`, the append path when old and
    new extracts disagree on columns. Positional UNION would silently
    misalign; the oracle replays the null-filling explicitly."""
    o = load(spark, sf_dir, "orders")
    old = o.where(F.col("o_orderkey") % 1003 == 0).select(
        F.col("o_orderkey").alias("k"),
        F.col("o_totalprice").alias("price"),
        F.col("o_orderstatus").alias("status"),
    )
    new = o.where(F.col("o_orderkey") % 1007 == 0).select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_orderpriority").alias("priority"),
    )
    return old.unionByName(new, allowMissingColumns=True)


@query(
    "basket_pair_affinity",
    oracle="""
    WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    p AS (
      SELECT a.l_partkey AS p1, b.l_partkey AS p2
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    )
    SELECT p1, p2, count(*) AS support
    FROM p GROUP BY p1, p2 HAVING count(*) >= 2
    ORDER BY support DESC, p1, p2
    """,
    tags=("join", "affinity", "basket"),
)
def basket_pair_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket pair mining: parts co-ordered in the same order, kept
    at support >= 2 — the co-occurrence join behind recommendation and
    affinity analysis.

    The self-join is keyed on the BASKET id, so candidate volume is
    sum(basket_size^2) — bounded by TPC-H's ~7-line orders, one shuffle +
    one partial-aggregated count. The guardrails are ENFORCED via
    `operators/guards.basket_pairs_guarded`: a mega-basket over the item
    cap fails the job worker-side naming the basket (quadratic pair
    volume never materializes silently), and items below min support 2
    are pre-pruned before pairing — LOSSLESS under the HAVING
    support >= 2 by a-priori monotonicity, while cutting the quadratic
    term where it is generated."""
    from spark_hbase_connector_spark.operators.guards import basket_pairs_guarded

    li = load(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    pairs = basket_pairs_guarded(
        items, "l_orderkey", "l_partkey", min_item_support=2
    )
    return (
        pairs.groupBy("p1", "p2")
        .agg(F.count("*").alias("support"))
        .where(F.col("support") >= 2)
        .orderBy(F.col("support").desc(), "p1", "p2")
    )


@query(
    "orders_abc_classification",
    oracle="""
    WITH rev AS (
      SELECT l_partkey,
             sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                 * (100 - CAST(round(l_discount * 100) AS BIGINT)))
               AS units
      FROM lineitem GROUP BY l_partkey
    ),
    ranked AS (
      SELECT l_partkey, units,
             sum(units) OVER (ORDER BY units DESC, l_partkey
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum_units,
             sum(units) OVER () AS total_units
      FROM rev
    ),
    classed AS (
      SELECT units,
             CASE WHEN cum_units * 100 <= total_units * 80 THEN 'A'
                  WHEN cum_units * 100 <= total_units * 95 THEN 'B'
                  ELSE 'C' END AS klass
      FROM ranked
    )
    SELECT klass, count(*) AS n_parts,
           CAST((sum(units) + 50) // 100 AS BIGINT) / 100.0 AS class_revenue
    FROM classed GROUP BY klass ORDER BY klass
    """,
    tags=("window", "analytics", "pareto"),
)
def orders_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC/Pareto classification: parts ranked by revenue, classed by
    CUMULATIVE revenue share (A: first 80%, B: to 95%, C: tail) — the
    inventory-analytics staple built on a running-total-over-total
    window. The cumulative window is GLOBAL (unpartitioned ordering) but
    runs over the per-part AGGREGATE (parts, not lineitems) — acceptable
    because the part relation is key-sized; at 100 TB class the
    aggregate, never the fact table, and if even the key relation is too
    large swap the global window for `assign_prefix_sums`' bucketed
    distributed prefix sums (same output, no single-partition sort).

    Determinism (r5 driver-hash fix): revenue is carried as EXACT integer
    units (cents x whole-percent; ``round(x*100)::long`` recovers both
    exactly — q1 recipe, cheaper than the r8 decimal-cast derivation) and
    the 80/95% boundaries are
    the exact rational comparisons ``100*cum <= 80*total`` — a part at
    the boundary can never flip class from float drift. Sums accumulate
    in decimal(38,0) (DuckDB: HUGEINT), overflow-proof at any sf; only
    the displayed class_revenue converts to dollars, via an exact integer
    half-up to cents then one bigint/100.0 division identical on both
    engines."""
    li = load(spark, sf_dir, "lineitem")
    price_cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    disc_pct = F.round(F.col("l_discount") * 100).cast("long")
    rev = (
        li.select("l_partkey", (price_cents * (100 - disc_pct)).alias("row_units"))
        .groupBy("l_partkey")
        .agg(F.sum(F.col("row_units").cast("decimal(38,0)")).alias("units"))
    )
    w_cum = Window.orderBy(F.col("units").desc(), "l_partkey").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.partitionBy()
    ranked = rev.select(
        "units",
        F.sum("units").over(w_cum).alias("cum_units"),
        F.sum("units").over(w_all).alias("total_units"),
    )
    classed = ranked.select(
        "units",
        F.when(F.col("cum_units") * 100 <= F.col("total_units") * 80, "A")
        .when(F.col("cum_units") * 100 <= F.col("total_units") * 95, "B")
        .otherwise("C")
        .alias("klass"),
    )
    return (
        classed.groupBy("klass")
        .agg(
            F.count("*").alias("n_parts"),
            (
                F.floor((F.sum("units") + F.lit(50)) / F.lit(100)).cast("bigint")
                / F.lit(100.0)
            ).alias("class_revenue"),
        )
        .orderBy("klass")
    )


@query(
    "table_checksum_orders",
    oracle="""
    SELECT count(*) AS n_rows,
           CAST(sum(('0x' || substring(md5(
                 CAST(o_orderkey AS VARCHAR) || '|' ||
                 CAST(o_custkey AS VARCHAR) || '|' ||
                 o_orderstatus || '|' || o_orderpriority
               ), 1, 8))::UBIGINT) AS BIGINT) AS checksum
    FROM orders
    """,
    tags=("ops", "checksum", "reconciliation"),
)
def table_checksum_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-independent table checksum — the cross-system reconciliation
    tool a migration needs (did every row survive the HBase -> engine
    move?): hash a canonical row rendering, SUM the hashes (commutative,
    so partitioning/ordering never matters), compare one number per
    side. One aggregation pass, partial-aggregated; the canonical
    rendering sticks to exactly-representable columns (keys, strings) —
    floats would need an epsilon-free decimal rendering contract first.
    md5-derived 32-bit words keep the hash cross-engine (xxhash64 is
    Spark-only)."""
    o = load(spark, sf_dir, "orders")
    rendering = F.concat_ws(
        "|",
        F.col("o_orderkey").cast("string"),
        F.col("o_custkey").cast("string"),
        "o_orderstatus",
        "o_orderpriority",
    )
    word = F.conv(F.substring(F.md5(rendering), 1, 8), 16, 10).cast("bigint")
    return o.agg(
        F.count("*").alias("n_rows"),
        F.sum(word).cast("bigint").alias("checksum"),
    )


@query(
    "agg_distinct_salted",
    oracle="""
    SELECT event_type, count(DISTINCT user_id) AS n_users
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    tags=("agg", "distinct", "skew"),
)
def agg_distinct_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase EXACT distinct for hot keys: salt by hash(user) % 16 so
    each (event_type, salt) bucket deduplicates a DISJOINT slice of
    users (same user -> same salt, so per-bucket distincts sum exactly),
    then merge bucket counts. This is the manual skew treatment when one
    group's value set outgrows a single aggregation task — 16 tasks each
    hold 1/16th of the hot key's users instead of one task holding all.
    Output-identical to plain count(DISTINCT) (the oracle), like
    `join_salted_skew` for joins and `agg_bitmap_distinct` for the
    mergeable-sketch road."""
    e = load(spark, sf_dir, "events")
    salted = e.select(
        "event_type", "user_id", (F.xxhash64("user_id") % 16).alias("salt")
    )
    per_bucket = salted.groupBy("event_type", "salt").agg(
        F.countDistinct("user_id").alias("d")
    )
    return (
        per_bucket.groupBy("event_type")
        .agg(F.sum("d").cast("bigint").alias("n_users"))
        .orderBy("event_type")
    )


@query(
    "count_min_qa",
    oracle="""
    SELECT event_type, count(*) AS exact_count,
           TRUE AS never_underestimates, TRUE AS within_1pct
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    tags=("sketch", "qa", "count-min"),
)
def count_min_qa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch acceptance gate: a fixed-size frequency sketch
    (built distributed via Spark's ``count_min_sketch`` aggregate,
    merged map-side like any partial agg) must (a) NEVER underestimate —
    the CMS structural guarantee — and (b) stay within 1% here (width
    8192 >> the 5-value type cardinality, so collisions are ~0). The
    sketch answers point frequency queries without rescanning — the
    streaming/telemetry companion to `approx_heavy_hitters_qa` (which
    finds WHICH keys are heavy; CMS answers HOW OFTEN for any key).
    Estimates are seed-deterministic but engine-specific, so the oracle
    pins the CONTRACT, not the numbers."""
    e = load(spark, sf_dir, "events")
    sk_row = e.agg(
        F.expr(
            "hex(count_min_sketch(event_type, cast(0.0001 as double), "
            "cast(0.99 as double), 42))"
        ).alias("sk")
    ).collect()[0]
    jvm = e.sparkSession._jvm
    sketch = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
        bytes.fromhex(sk_row.sk)
    )
    exact = {
        r.event_type: r.n
        for r in e.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    rows = []
    for t in sorted(exact):
        est = sketch.estimateCount(t)
        rows.append(
            (
                t,
                exact[t],
                bool(est >= exact[t]),
                bool(est <= exact[t] * 1.01),
            )
        )
    return e.sparkSession.createDataFrame(
        rows, "event_type string, exact_count long, never_underestimates boolean, within_1pct boolean"
    )


@query(
    "events_mad_outliers",
    oracle="""
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med
      FROM events GROUP BY event_type
    ),
    dev AS (
      SELECT e.event_type, abs(e.value - m.med) AS adev, m.med
      FROM events e JOIN med m ON e.event_type = m.event_type
    ),
    mad AS (
      SELECT event_type, any_value(med) AS med,
             quantile_cont(adev, 0.5) AS mad
      FROM dev GROUP BY event_type
    )
    SELECT d.event_type, round(any_value(d.med), 4) AS median_value,
           round(any_value(m.mad), 4) AS mad,
           CAST(sum(CASE WHEN d.adev > 3 * m.mad THEN 1 ELSE 0 END) AS BIGINT)
             AS n_outliers
    FROM dev d JOIN mad m ON d.event_type = m.event_type
    GROUP BY d.event_type ORDER BY d.event_type
    """,
    tags=("agg", "robust-stats", "outliers"),
)
def events_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection via Median Absolute Deviation: per-type
    median, then the median of absolute deviations, then count values
    beyond 3 MAD — the z-score's resistant cousin
    (`events_anomaly_zscore` breaks when the outliers ARE the tail;
    medians don't). Two exact-percentile aggregations + one broadcast of
    the type-level medians (key-sized both times); Spark ``percentile``
    and DuckDB ``quantile_cont`` share the interpolation formula
    (pinned by `window_rolling_median`)."""
    e = load(spark, sf_dir, "events")
    med = e.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    dev = e.join(F.broadcast(med), "event_type").select(
        "event_type", "med", F.abs(F.col("value") - F.col("med")).alias("adev")
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(adev, 0.5)").alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.round(F.first("med"), 4).alias("median_value"),
            F.round(F.first("mad"), 4).alias("mad"),
            F.sum(F.when(F.col("adev") > 3 * F.col("mad"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_outliers"),
        )
        .orderBy("event_type")
    )


@query(
    "orders_rfm_segmentation",
    oracle="""
    WITH per_cust AS (
      SELECT o_custkey,
             date_diff('day', max(o_orderdate), TIMESTAMP '1998-08-02') AS recency_days,
             count(*) AS frequency,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
               / 100 AS monetary
      FROM orders GROUP BY o_custkey
    ),
    scored AS (
      SELECT o_custkey,
             CAST(ntile(5) OVER (ORDER BY recency_days ASC,  o_custkey) AS INTEGER) AS r,
             CAST(ntile(5) OVER (ORDER BY frequency DESC, o_custkey) AS INTEGER) AS f,
             CAST(ntile(5) OVER (ORDER BY monetary  DESC, o_custkey) AS INTEGER) AS m
      FROM per_cust
    )
    SELECT r, f, m, count(*) AS n_customers
    FROM scored GROUP BY r, f, m ORDER BY r, f, m
    """,
    tags=("window", "analytics", "segmentation"),
)
def orders_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation: per-customer Recency (days since last
    order vs the dataset's end date — an explicit anchor, never
    wall-clock), Frequency, Monetary, each quintile-scored with ntile(5),
    reported as segment-cell counts. The ntile windows are global but run
    over the per-customer AGGREGATE (key-sized — the `orders_abc` rule);
    ties broken by customer key so the quintile boundaries are
    deterministic on both engines."""
    o = load(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.datediff(
            F.lit("1998-08-02").cast("date"), F.max("o_orderdate")
        ).alias("recency_days"),
        F.count("*").alias("frequency"),
        # Money rule (CLAUDE.md): exact cents sum (q1 recipe) — monetary
        # is an ntile ORDER BY key, so a single order-noise flip would
        # re-rank a customer across a quintile boundary
        (
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).cast(
                "double"
            )
            / 100
        ).alias("monetary"),
    )
    wr = Window.orderBy(F.col("recency_days").asc(), "o_custkey")
    wf = Window.orderBy(F.col("frequency").desc(), "o_custkey")
    wm = Window.orderBy(F.col("monetary").desc(), "o_custkey")
    scored = per_cust.select(
        F.ntile(5).over(wr).cast("int").alias("r"),
        F.ntile(5).over(wf).cast("int").alias("f"),
        F.ntile(5).over(wm).cast("int").alias("m"),
    )
    return (
        scored.groupBy("r", "f", "m")
        .agg(F.count("*").alias("n_customers"))
        .orderBy("r", "f", "m")
    )


@query(
    "orders_yoy_growth",
    oracle="""
    WITH monthly AS (
      SELECT date_trunc('month', o_orderdate) AS m,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
               / 100 AS revenue
      FROM orders GROUP BY 1
    ),
    shifted AS (
      SELECT strftime(m, '%Y-%m') AS month, revenue,
             lag(revenue, 12) OVER (ORDER BY m) AS prior_year
      FROM monthly
    )
    SELECT month, revenue,
           round(revenue / prior_year - 1, 4) AS yoy_growth
    FROM shifted WHERE prior_year IS NOT NULL
    ORDER BY month
    """,
    tags=("window", "timeseries", "yoy"),
)
def orders_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year growth per month: monthly revenue joined to itself
    12 rows back (lag(12) over the month-ordered aggregate). The window
    is global but month-grid-sized (the `orders_abc` rule: window the
    AGGREGATE, never the fact table); months without a prior-year
    comparison are excluded rather than reported as NULL growth."""
    o = load(spark, sf_dir, "orders")
    monthly = o.groupBy(F.date_trunc("month", "o_orderdate").alias("m")).agg(
        # exact cents sum (money rule; cents longs beat the decimal cast
        # by avoiding per-row BigDecimal work — q1 recipe)
        (
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).cast(
                "double"
            )
            / 100
        ).alias("revenue")
    )
    w = Window.orderBy("m")
    shifted = monthly.select(
        F.date_format("m", "yyyy-MM").alias("month"),
        "revenue",
        F.lag("revenue", 12).over(w).alias("prior_year"),
    )
    return (
        shifted.where(F.col("prior_year").isNotNull())
        .select(
            "month",
            "revenue",
            F.round(F.col("revenue") / F.col("prior_year") - 1, 4).alias(
                "yoy_growth"
            ),
        )
        .orderBy("month")
    )


@query(
    "events_user_entropy",
    oracle="""
    WITH c AS (
      SELECT user_id, event_type, count(*) AS n
      FROM events WHERE user_id <= 300
      GROUP BY user_id, event_type
    ),
    tot AS (SELECT user_id, sum(n) AS t FROM c GROUP BY user_id)
    SELECT c.user_id,
           round(sum(-(n * 1.0 / t) * ln(n * 1.0 / t)), 4) AS behavior_entropy,
           CAST(count(*) AS INTEGER) AS n_types
    FROM c JOIN tot USING (user_id)
    GROUP BY c.user_id ORDER BY c.user_id
    """,
    tags=("agg", "entropy", "features"),
)
def events_user_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral entropy per user — Shannon entropy of the event-type
    distribution (0 = does one thing, ln(5) = uniform over all types),
    the diversity feature a segmentation or anomaly model consumes
    (`text_char_entropy`'s user-behavior sibling). Two partial-aggregated
    groupBys on (user, type) then user; the per-user total re-joins on
    the already-shuffled user key."""
    e = load(spark, sf_dir, "events").where(F.col("user_id") <= 300)
    c = e.groupBy("user_id", "event_type").agg(F.count("*").alias("n"))
    tot = c.groupBy("user_id").agg(F.sum("n").alias("t"))
    p = F.col("n") / F.col("t")
    return (
        c.join(tot, "user_id")
        .groupBy("user_id")
        .agg(
            F.round(F.sum(-p * F.log(p)), 4).alias("behavior_entropy"),
            F.count("*").cast("int").alias("n_types"),
        )
        .orderBy("user_id")
    )


@query(
    "agg_geomean_margin",
    oracle="""
    SELECT l_returnflag,
           round(exp(avg(ln(l_extendedprice))), 2) AS geomean_price,
           round(exp(avg(ln(1 - l_discount))) - 1, 6) AS geo_avg_discount_factor,
           count(*) AS n
    FROM lineitem WHERE l_extendedprice > 0
    GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    tags=("agg", "geometric"),
)
def agg_geomean_margin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geometric means via the log-space identity exp(avg(ln x)) — the
    correct average for multiplicative quantities (price levels, compound
    discount factors) that neither engine ships as a built-in aggregate.
    Log-space summation is also the numerically safe path at 100 TB: the
    direct product over 10^12 rows under/overflows doubles immediately,
    while sum-of-logs is a plain partial-aggregated avg."""
    li = load(spark, sf_dir, "lineitem").where(F.col("l_extendedprice") > 0)
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.exp(F.avg(F.log("l_extendedprice"))), 2).alias(
                "geomean_price"
            ),
            F.round(
                F.exp(F.avg(F.log(F.lit(1) - F.col("l_discount")))) - 1, 6
            ).alias("geo_avg_discount_factor"),
            F.count("*").alias("n"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "agg_decimal_exact",
    oracle="""
    SELECT l_returnflag,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(14,2))) AS VARCHAR)
             AS total_price_exact,
           CAST(sum(CAST(l_quantity AS DECIMAL(10,1))) AS VARCHAR)
             AS total_qty_exact,
           count(*) AS n
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    tags=("agg", "decimal", "exact"),
)
def agg_decimal_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT money arithmetic through DECIMAL: prices summed as
    DECIMAL(14,2) produce the same digits on every engine, every
    partitioning, every run — no float summation-order noise, no 4dp
    rounding convention needed (this entry's oracle is the only
    aggregate one compared digit-for-digit WITHOUT rounding). The
    catalog's decimal type support (SURVEY §2.1 S4 superset) feeds this
    path; rendered as strings so the comparison is representation-exact."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(14,2)"))
            .cast("string")
            .alias("total_price_exact"),
            F.sum(F.col("l_quantity").cast("decimal(10,1)"))
            .cast("string")
            .alias("total_qty_exact"),
            F.count("*").alias("n"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "scalar_mask_pii",
    oracle="""
    SELECT c_custkey,
           regexp_replace(regexp_replace(regexp_replace(
             c_name, '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g')
             AS name_masked
    FROM customer WHERE c_custkey <= 500 ORDER BY c_custkey
    """,
    tags=("scalar", "pii", "masking"),
)
def scalar_mask_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Format-preserving PII masking via the built-in ``mask()`` (upper ->
    X, lower -> x, digit -> n, punctuation kept) — the irreversible
    display-safe redaction that keeps string SHAPE for downstream parsers
    and tests, complementing `pii_scrub_customers`' pattern-targeted
    scrub. JVM expression, map-only; the oracle replays the mask as three
    regex classes."""
    c = load(spark, sf_dir, "customer").where(F.col("c_custkey") <= 500)
    return c.select(
        "c_custkey", F.expr("mask(c_name)").alias("name_masked")
    ).orderBy("c_custkey")


@query(
    "agg_modern_aliases",
    oracle="""
    SELECT o_orderpriority,
           CAST(count_if(o_totalprice > 200000) AS BIGINT) AS n_big,
           bool_and(o_totalprice > 0) AS all_positive,
           bool_or(o_orderstatus = 'F') AS any_finished,
           CAST(median(o_totalprice) AS DOUBLE) AS median_price
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    tags=("agg", "modern"),
)
def agg_modern_aliases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The modern aggregate alias family — ``count_if`` / ``bool_and`` /
    ``bool_or`` / ``median`` — SQL-standard names both engines now share,
    replacing the older sum(case when) / min(bool) circumlocutions
    one-for-one (all partial-aggregated; median is the exact interpolated
    percentile both engines compute identically)."""
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.expr("count_if(o_totalprice > 200000)").cast("bigint").alias("n_big"),
            F.expr("bool_and(o_totalprice > 0)").alias("all_positive"),
            F.expr("bool_or(o_orderstatus = 'F')").alias("any_finished"),
            F.expr("median(o_totalprice)").cast("double").alias("median_price"),
        )
        .orderBy("o_orderpriority")
    )
