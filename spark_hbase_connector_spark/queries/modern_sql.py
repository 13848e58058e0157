"""Modern SQL surface: recursive CTEs, VARIANT JSON, array higher-order
functions, and distinct-over-window — the Spark 4 additions a user of the
reference connector gets for free once their tables load through this
engine (the reference delegates ALL SQL to Spark: SURVEY.md §2.2,
``ScalaDatasourceTest.scala:84-94``), exercised here as differential
entries so the oracle gate covers them like any operator.

Scale notes:
- recursive CTEs compile to ``UnionLoop``: one narrow projection per
  iteration, iteration count = recursion depth (log10(keys) for the tree
  entry, #months for the spine) — never data-squared, and each step is a
  map-only pass until the final aggregation's single shuffle;
- VARIANT parse/extract is a JVM expression inside whole-stage codegen
  (no Python, no shuffle);
- array higher-order functions run per-row JVM-side; they are the right
  tool for *short* arrays (tokens of one document). For corpus-wide
  per-token statistics the Arrow-pass pattern wins (see
  ``quality.py:text_repetition_signals`` — the measured counterexample);
- distinct-over-window keeps a per-partition running set bounded by the
  frame length (5 rows here); the only shuffle is the window's
  ``partitionBy`` hash exchange, same as every other per-user window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_hbase_connector_spark.catalogs import load
from spark_hbase_connector_spark.queries.registry import query


@query(
    "recursive_tree_rollup",
    oracle="""
    WITH RECURSIVE anc(c_custkey, node, depth) AS (
      SELECT c_custkey, c_custkey, 0 FROM customer
      UNION ALL
      SELECT c_custkey, node // 10, depth + 1 FROM anc WHERE node >= 10
    )
    SELECT depth, count(*) AS n_at_depth, count(DISTINCT node) AS n_ancestors
    FROM anc GROUP BY depth ORDER BY depth
    """,
    tags=("sql", "recursive"),
)
def recursive_tree_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE ancestor closure over a decimal-trim hierarchy
    (parent(k) = k div 10 — a deterministic tree of depth log10(maxkey)),
    rolled up to a per-depth histogram.

    Spark 4 compiles this to ``UnionLoop``: each iteration is a narrow
    3-column projection over the previous frontier (rows only shrink as
    nodes reach the root), so cost is O(depth · |customer|) with ONE final
    aggregation shuffle. This is the same fixpoint shape as
    ``operators/graph.py`` connected components, expressed declaratively —
    use this form when depth is bounded and known-small; use the
    checkpointed operator loop when the frontier must be persisted.

    Spark guards runaway recursion with a TOTAL-rows cap
    (``spark.sql.cteRecursionRowLimit``, default 1M) — the closure here is
    depth x |customer| rows by construction (~12M at sf1, where the
    default cap aborted the r6 sf1 sweep), so the entry sizes the guard
    to the workload instead of letting a correctness-irrelevant default
    fail it; keep a finite value so a genuinely unbounded recursion still
    dies loudly."""
    spark.conf.set("spark.sql.cteRecursionRowLimit", 1_000_000_000)
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        WITH RECURSIVE anc(c_custkey, node, depth) AS (
          SELECT c_custkey, c_custkey, 0 FROM customer
          UNION ALL
          SELECT c_custkey, node DIV 10, depth + 1 FROM anc WHERE node >= 10
        )
        SELECT depth, count(*) AS n_at_depth, count(DISTINCT node) AS n_ancestors
        FROM anc GROUP BY depth ORDER BY depth
        """
    )


@query(
    "recursive_date_spine",
    oracle="""
    WITH RECURSIVE m(month_start) AS (
      SELECT DATE '1996-01-01'
      UNION ALL
      SELECT CAST(month_start + INTERVAL 1 MONTH AS DATE)
      FROM m WHERE month_start < DATE '1996-12-01'
    )
    SELECT strftime(m.month_start, '%Y-%m') AS month,
           count(o.o_orderkey) AS n_orders,
           CAST(coalesce(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)),
                         0) AS DOUBLE) / 100 AS revenue
    FROM m LEFT JOIN orders o
      ON date_trunc('month', o.o_orderdate) = m.month_start
    GROUP BY 1 ORDER BY 1
    """,
    tags=("sql", "recursive", "timeseries"),
)
def recursive_date_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive date-spine generation (the gapfill idiom expressed as a
    CTE instead of a worker-side grid — compare ``windows.py:gapfill_locf``)
    then a LEFT JOIN so months with zero orders still appear.

    The spine is 12 rows — Catalyst broadcasts it; the fact side keeps its
    scan partitioning and the month-trunc join needs one partial-aggregated
    shuffle. At 100 TB the spine stays 12 rows: cost is the aggregation,
    identical to any monthly rollup. revenue is EXACT (money rule,
    CLAUDE.md — monthly sums reach ~5e10 at sf10 where double order
    noise flips the last rounded digit; caught by the round-7d expanded
    sf10 sweep), in fixed-point cents longs (q1 recipe — bit-identical
    to the decimal sum, no per-row BigDecimal cost)."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        WITH RECURSIVE m(month_start) AS (
          SELECT DATE '1996-01-01'
          UNION ALL
          SELECT CAST(month_start + INTERVAL '1' MONTH AS DATE)
          FROM m WHERE month_start < DATE '1996-12-01'
        )
        SELECT date_format(m.month_start, 'yyyy-MM') AS month,
               count(o.o_orderkey) AS n_orders,
               CAST(coalesce(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)),
                             0) AS DOUBLE) / 100 AS revenue
        FROM m LEFT JOIN orders o
          ON CAST(date_trunc('month', o.o_orderdate) AS DATE) = m.month_start
        GROUP BY 1 ORDER BY 1
        """
    )


@query(
    "scalar_variant_extract",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
           json_extract_string(props, '$.k') AS k_str,
           (json_extract(props, '$.missing') IS NULL) AS missing_is_null
    FROM events WHERE event_id <= 1000
    """,
    tags=("scalar", "json", "variant"),
)
def scalar_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access through Spark 4's VARIANT type:
    ``parse_json`` once, then typed ``variant_get`` path extraction —
    the binary-encoded replacement for per-path ``get_json_object``
    string re-parsing (one parse per row instead of one per path).

    Whole-stage-codegen JVM expressions; at 100 TB this is scan-bound.
    For repeated analytics over the same JSON column, persist the parsed
    VARIANT column once at ingest and every later path access skips the
    parse entirely."""
    e = load(spark, sf_dir, "events").where(F.col("event_id") <= 1000)
    return e.select(
        "event_id",
        F.expr("variant_get(parse_json(props), '$.k', 'int')").alias("k"),
        F.expr("variant_get(parse_json(props), '$.k', 'string')").alias("k_str"),
        F.expr("variant_get(parse_json(props), '$.missing', 'string')")
        .isNull()
        .alias("missing_is_null"),
    )


@query(
    "scalar_array_hof",
    oracle="""
    SELECT doc_id,
           CAST(len(list_filter(string_split(text, ' '), t -> length(t) > 5))
                AS INTEGER) AS n_long,
           CAST(list_sum(list_transform(string_split(text, ' '), t -> length(t)))
                AS BIGINT) AS total_chars,
           round(CAST(list_sum(list_transform(string_split(text, ' '),
                                              t -> length(t))) AS DOUBLE)
                 / len(string_split(text, ' ')), 4) AS avg_token_len
    FROM documents WHERE doc_id <= 200 ORDER BY doc_id
    """,
    tags=("scalar", "array", "hof"),
)
def scalar_array_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array higher-order functions — ``filter`` / ``transform`` /
    ``aggregate`` lambdas over per-document token arrays (DuckDB replays
    them as list lambdas).

    Correct tool here because each lambda runs ONCE per row over a short
    array. The anti-pattern this engine documents (nested lambdas whose
    inner lambda rescans per outer element — interpreted O(n²), see
    ``quality.py``) is exactly what these entries avoid."""
    d = load(spark, sf_dir, "documents").where(F.col("doc_id") <= 200)
    toks = F.split(F.col("text"), " ")
    total = F.aggregate(
        toks, F.lit(0).cast("bigint"), lambda acc, t: acc + F.length(t)
    )
    return (
        d.select(
            "doc_id",
            F.size(F.filter(toks, lambda t: F.length(t) > 5)).alias("n_long"),
            total.alias("total_chars"),
            F.round(total.cast("double") / F.size(toks), 4).alias("avg_token_len"),
        )
        .orderBy("doc_id")
    )


@query(
    "window_rolling_distinct",
    oracle="""
    SELECT event_id, user_id,
           CAST(count(DISTINCT event_type) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW
           ) AS INTEGER) AS distinct_types_5
    FROM events WHERE user_id <= 100
    ORDER BY user_id, event_id
    """,
    tags=("window", "distinct"),
)
def window_rolling_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling distinct-count per user (how many event types in the last
    5 events). Spark has no DISTINCT window aggregate, so the idiomatic
    form is ``size(collect_set(...))`` over the frame — the running set is
    bounded by the frame length (5), so per-row state is O(frame), and the
    only shuffle is the per-user hash exchange every keyed window pays.
    DuckDB's native ``count(DISTINCT) OVER`` is the oracle."""
    e = load(spark, sf_dir, "events").where(F.col("user_id") <= 100)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-4, 0)
    )
    return (
        e.select(
            "event_id",
            "user_id",
            F.size(F.collect_set("event_type").over(w)).alias("distinct_types_5"),
        )
        .orderBy("user_id", "event_id")
    )


@query(
    "scalar_tz_convert",
    oracle="""
    SELECT event_id,
           timezone('America/New_York', timezone('UTC', ts)) AS ny_time,
           CAST(date_part('hour', timezone('America/New_York', timezone('UTC', ts)))
                AS INTEGER) AS ny_hour
    FROM events WHERE event_id <= 1000
    """,
    tags=("scalar", "datetime", "timezone"),
)
def scalar_tz_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IANA-timezone conversion (UTC wall time -> America/New_York wall
    time) through the engines' built-in tz databases — not offset
    arithmetic, so DST rules apply when the span crosses a transition.
    Both sides are written session-TZ-independent: Spark's 3-arg
    ``convert_timezone`` names both zones explicitly; the oracle pairs
    DuckDB's interpret-as-UTC and render-in-zone conversions."""
    e = load(spark, sf_dir, "events").where(F.col("event_id") <= 1000)
    ny = F.convert_timezone(F.lit("UTC"), F.lit("America/New_York"), F.col("ts"))
    return e.select(
        "event_id",
        ny.alias("ny_time"),
        F.hour(ny).cast("int").alias("ny_hour"),
    )


@query(
    "agg_collation_ci",
    oracle="""
    WITH cased AS (
      SELECT CASE WHEN p_partkey % 2 = 0 THEN upper(p_type) ELSE lower(p_type) END
               AS t, p_retailprice
      FROM part
    )
    SELECT lower(t) AS p_type_ci, count(*) AS n,
           round(avg(p_retailprice), 4) AS avg_price
    FROM cased GROUP BY lower(t) ORDER BY p_type_ci
    """,
    tags=("agg", "collation"),
)
def agg_collation_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Case-insensitive grouping via Spark 4 collations: the column is
    deterministically mixed-cased (even keys upper, odd lower), then
    grouped under the ``UTF8_LCASE`` collation — the collation-aware hash
    brings both casings to one group without rewriting the data. The
    oracle replays it as lower() grouping (semantically identical for this
    collation). Collation participates in the aggregation hash, so
    partial aggregation and the single shuffle work exactly as for binary
    strings."""
    p = load(spark, sf_dir, "part")
    cased = F.when(
        F.col("p_partkey") % 2 == 0, F.upper("p_type")
    ).otherwise(F.lower("p_type"))
    return (
        p.select(F.collate(cased, "UTF8_LCASE").alias("t"), "p_retailprice")
        .groupBy("t")
        .agg(F.count("*").alias("n"), F.round(F.avg("p_retailprice"), 4).alias("avg_price"))
        .select(F.lower("t").alias("p_type_ci"), "n", "avg_price")
        .orderBy("p_type_ci")
    )


@query(
    "graph_pagerank",
    oracle="""
    WITH edges AS (
      SELECT c_custkey AS src, c_custkey // 10 AS dst
      FROM customer WHERE c_custkey >= 10
    ),
    nodes AS (SELECT DISTINCT id FROM
              (SELECT src AS id FROM edges UNION ALL SELECT dst FROM edges)),
    deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
    nn AS (SELECT count(*) AS n FROM nodes),
    r0 AS (SELECT id, 1.0 / (SELECT n FROM nn) AS rank FROM nodes),
    c1 AS (SELECT e.dst, sum(r.rank / d.deg) AS m
           FROM edges e JOIN deg d ON e.src = d.src JOIN r0 r ON r.id = e.src
           GROUP BY e.dst),
    r1 AS (SELECT nodes.id,
                  0.15 / (SELECT n FROM nn) + 0.85 * coalesce(c1.m, 0) AS rank
           FROM nodes LEFT JOIN c1 ON c1.dst = nodes.id),
    c2 AS (SELECT e.dst, sum(r.rank / d.deg) AS m
           FROM edges e JOIN deg d ON e.src = d.src JOIN r1 r ON r.id = e.src
           GROUP BY e.dst),
    r2 AS (SELECT nodes.id,
                  0.15 / (SELECT n FROM nn) + 0.85 * coalesce(c2.m, 0) AS rank
           FROM nodes LEFT JOIN c2 ON c2.dst = nodes.id),
    c3 AS (SELECT e.dst, sum(r.rank / d.deg) AS m
           FROM edges e JOIN deg d ON e.src = d.src JOIN r2 r ON r.id = e.src
           GROUP BY e.dst),
    r3 AS (SELECT nodes.id,
                  0.15 / (SELECT n FROM nn) + 0.85 * coalesce(c3.m, 0) AS rank
           FROM nodes LEFT JOIN c3 ON c3.dst = nodes.id)
    SELECT id, round(rank * (SELECT n FROM nn) + 0.000000001, 4) AS rank_scaled
    FROM r3 ORDER BY id
    """,
    tags=("graph", "iterative"),
    bench=True,
)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-iteration PageRank (3 rounds, d=0.85) over the decimal-trim
    customer hierarchy, via the reusable `operators/graph.py:pagerank`
    loop (per-iteration: one edge join reusing the persisted edge layout,
    one partial-aggregated sum, one node-sized left join, ranks
    localCheckpointed). The oracle unrolls the identical three iterations
    as chained CTEs — fixed iteration count is what makes an iterative
    algorithm exactly SQL-replayable (`kmeans_train_cells` now uses the
    same recipe for its Lloyd iterations). Ranks are
    scaled by N (so values are O(1)) and rounded to 4dp on both sides,
    with a +1e-9 nudge first: tree-PageRank values are decimal-terminating
    (denominators 2^a*5^b), so some land EXACTLY on a 4dp half-boundary
    (e.g. 6.84375) where each engine's last-bit noise would round a
    different way; the nudge moves every exact half deterministically up
    on both sides while being far above the ~1e-15 cross-engine drift."""
    from spark_hbase_connector_spark.operators.graph import pagerank

    c = load(spark, sf_dir, "customer")
    edges = c.where(F.col("c_custkey") >= 10).select(
        F.col("c_custkey").alias("src"),
        F.expr("c_custkey DIV 10").alias("dst"),
    )
    ranks = pagerank(edges, iters=3, damping=0.85)
    # N as a driver-side scalar, not a single-row broadcast join: ranks is
    # already localCheckpointed by the operator, so the count is one cheap
    # node-sized job, and the BNLJ (plus its broadcast exchange) vanishes
    # from the plan. N is a bounded scalar at any corpus size.
    n = ranks.count()
    return ranks.select(
        "id",
        F.round(F.col("rank") * F.lit(float(n)) + F.lit(1e-9), 4).alias(
            "rank_scaled"
        ),
    ).orderBy("id")


from spark_hbase_connector_spark.functions.zorder import zorder_sql_expr

_Z_EXPR = zorder_sql_expr("x", "y", bits=16)


@query(
    "scalar_zorder_key",
    oracle=f"""
    WITH d AS (
      SELECT event_id,
             CAST(user_id % 65536 AS BIGINT) AS x,
             CAST(json_extract_string(props, '$.k') AS BIGINT) % 65536 AS y
      FROM events WHERE event_id <= 2000
    )
    SELECT event_id, x, y, CAST({_Z_EXPR} AS BIGINT) AS zkey
    FROM d ORDER BY event_id
    """,
    tags=("scalar", "clustering", "zorder"),
)
def scalar_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton (z-order) clustering key over two dimensions (user bucket x
    event attribute): the multi-dimensional extension of `write_table`'s
    rowkey sort. Repartition-by-range + sort on ``zkey`` before writing
    and row-group min/max stats prune on EITHER dimension — the
    Delta/Iceberg OPTIMIZE ZORDER technique expressed as a plain column.
    The bit-interleave expression is generated once
    (`functions/zorder.py`) and evaluated verbatim by both engines —
    32 codegen'd integer ops per row, no UDF, no shuffle."""
    e = load(spark, sf_dir, "events").where(F.col("event_id") <= 2000)
    d = e.select(
        "event_id",
        (F.col("user_id") % 65536).cast("bigint").alias("x"),
        (F.get_json_object("props", "$.k").cast("bigint") % 65536).alias("y"),
    )
    return d.select(
        "event_id", "x", "y", F.expr(_Z_EXPR).cast("bigint").alias("zkey")
    ).orderBy("event_id")


@query(
    "agg_bitmap_distinct",
    oracle="""
    SELECT event_type, count(DISTINCT user_id) AS n_users
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    tags=("agg", "bitmap", "sketch"),
    bench=True,
)
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct counting via roaring-style bitmap aggregates
    (``bitmap_bucket_number`` / ``bitmap_bit_position`` /
    ``bitmap_construct_agg`` / ``bitmap_count``): ids are bucketed into
    32k-bit bitmap segments, per-bucket bitmaps OR-merge associatively,
    and the final count sums per-bucket cardinalities.

    Why it matters at 100 TB: unlike ``count(DISTINCT)`` (whose partial
    state is the value set itself), bitmap partials are fixed-size and
    MERGEABLE — they can be precomputed per partition/day, stored, and
    re-merged for any grouping rollup (the materialized-view distinct
    pattern; same role as `kv_snapshot_diff`'s incremental story). The
    oracle is plain count(DISTINCT) — bitmaps are exact, not estimates."""
    e = load(spark, sf_dir, "events")
    per_bucket = (
        e.select(
            "event_type",
            F.expr("bitmap_bucket_number(user_id)").alias("bk"),
            F.expr("bitmap_bit_position(user_id)").alias("pos"),
        )
        .groupBy("event_type", "bk")
        .agg(F.expr("bitmap_construct_agg(pos)").alias("bm"))
    )
    return (
        per_bucket.groupBy("event_type")
        .agg(F.sum(F.expr("bitmap_count(bm)")).cast("bigint").alias("n_users"))
        .orderBy("event_type")
    )


@query(
    "hll_sketch_union_qa",
    oracle="""
    SELECT event_type, count(DISTINCT user_id) AS exact_users,
           TRUE AS within_2pct
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    tags=("sketch", "qa", "hll"),
    bench=True,
)
def hll_sketch_union_qa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch distinct counting: per-DAY HLL sketches
    (``hll_sketch_agg``) are ``hll_union_agg``-merged into a per-type
    total and the estimate is gated against the exact count (<=2%
    relative error). The merge step is the point: daily sketch columns
    are tiny, storable, and re-unionable for any time rollup without
    rescanning history — the incremental-distinct pattern for 100 TB
    hypertables (`hypertable_rollup_merge`'s distinct-count analogue).
    Oracle replays the exact count and asserts the gate held (the
    estimate itself is sketch-parameter-dependent, so the CONTRACT, not
    the estimate, is the compared output — same shape as
    `approx_distinct_qa`)."""
    e = load(spark, sf_dir, "events")
    daily = (
        e.select(
            "event_type",
            F.date_trunc("day", "ts").alias("day"),
            "user_id",
        )
        .groupBy("event_type", "day")
        .agg(F.expr("hll_sketch_agg(user_id)").alias("sk"))
    )
    merged = daily.groupBy("event_type").agg(
        F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("est")
    )
    exact = e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users")
    )
    return (
        exact.join(merged, "event_type")
        .select(
            "event_type",
            "exact_users",
            (
                F.abs(F.col("est") - F.col("exact_users"))
                / F.col("exact_users")
                <= 0.02
            ).alias("within_2pct"),
        )
        .orderBy("event_type")
    )


@query(
    "scalar_url_parse",
    oracle="""
    WITH u AS (
      SELECT doc_id,
             'https://' || source || '.example.com/docs/' || doc_id
               || '?lang=' || lang AS url
      FROM documents WHERE doc_id <= 500
    )
    SELECT doc_id,
           regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host,
           regexp_extract(url, '^[a-z]+://[^/]+(/[^?]*)', 1) AS path,
           regexp_extract(url, '[?&]lang=([^&]*)', 1) AS lang_param
    FROM u ORDER BY doc_id
    """,
    tags=("scalar", "url", "text"),
)
def scalar_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL decomposition with Spark's built-in ``parse_url`` (host / path
    / single query parameter) — the first step of web-corpus curation
    (canonicalization, per-domain caps, domain mixtures all key off the
    host). JVM expression, map-only; the oracle replays it with regexes.
    URLs are synthesized deterministically from catalog columns since the
    harness tables carry no raw URLs."""
    d = load(spark, sf_dir, "documents").where(F.col("doc_id") <= 500)
    url = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"), F.lit("?lang="), F.col("lang"),
    )
    u = d.select("doc_id", url.alias("url"))
    return u.select(
        "doc_id",
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
    ).orderBy("doc_id")


@query(
    "scalar_interval_arith",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderdate + INTERVAL 3 MONTH AS TIMESTAMP) AS due_3mo,
           CAST(date_diff('day', o_orderdate, TIMESTAMP '1997-01-01') AS BIGINT)
             AS days_to_97,
           round(CAST(date_diff('day', date_trunc('month', o_orderdate),
                                o_orderdate) AS DOUBLE), 1) AS day_in_month,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS VARCHAR) AS month_end
    FROM orders WHERE o_orderkey <= 500
    """,
    tags=("scalar", "datetime", "interval"),
)
def scalar_interval_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-aware interval arithmetic parity: add-months (variable
    month lengths), day difference against an anchor, day-of-month via
    month truncation, and month-end — the datetime surface a time-series
    user hits daily. All JVM expressions; the subtlety is
    cross-engine convention (Spark datediff(end, start) vs DuckDB
    date_diff('day', start, end) — argument order differs!), pinned here
    by the shared oracle."""
    o = load(spark, sf_dir, "orders").where(F.col("o_orderkey") <= 500)
    return o.select(
        "o_orderkey",
        F.add_months("o_orderdate", 3).cast("timestamp").alias("due_3mo"),
        F.datediff(F.lit("1997-01-01").cast("date"), F.col("o_orderdate"))
        .cast("bigint")
        .alias("days_to_97"),
        F.round(
            F.datediff(
                F.col("o_orderdate"), F.date_trunc("month", "o_orderdate").cast("date")
            )
            * 1.0,
            1,
        ).alias("day_in_month"),
        F.last_day("o_orderdate").cast("string").alias("month_end"),
    )


@query(
    "scalar_haversine_nearest",
    oracle="""
    WITH pts AS (
      SELECT user_id,
             -60 + (user_id % 120) * 1.0 AS lat,
             -170 + ((user_id * 7) % 340) * 1.0 AS lon
      FROM (SELECT DISTINCT user_id FROM events WHERE user_id <= 300) t
    ),
    anchors(name, alat, alon) AS (VALUES
      ('nyc', 40.7, -74.0), ('lon', 51.5, -0.1), ('sgp', 1.35, 103.8),
      ('syd', -33.9, 151.2), ('gru', -23.5, -46.6)
    ),
    dists AS (
      SELECT p.user_id, a.name,
             2 * 6371.0 * asin(sqrt(
               pow(sin(radians(a.alat - p.lat) / 2), 2)
               + cos(radians(p.lat)) * cos(radians(a.alat))
                 * pow(sin(radians(a.alon - p.lon) / 2), 2)
             )) AS km
      FROM pts p CROSS JOIN anchors a
    )
    SELECT user_id, name AS nearest, round(km, 1) AS km
    FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                                       ORDER BY km, name) AS rn FROM dists)
    WHERE rn = 1 ORDER BY user_id
    """,
    tags=("scalar", "geo"),
)
def scalar_haversine_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geo-lite: great-circle (haversine) distance classification of each
    point to its nearest anchor city — broadcast nearest-neighbor over a
    tiny anchor table, the geo-enrichment shape (nearest warehouse /
    datacenter / store). Spherical trig is all JVM math functions;
    coordinates are synthesized deterministically from user ids (the
    harness schema carries no geo columns). At scale the anchor set
    broadcasts and the cross join is |rows| x |anchors| map-side — for
    LARGE anchor sets switch to a geohash-bucketed join (the z-order
    trick of `scalar_zorder_key` applied to lat/lon bits)."""
    e = load(spark, sf_dir, "events").where(F.col("user_id") <= 300)
    pts = e.select("user_id").distinct().select(
        "user_id",
        (-60 + (F.col("user_id") % 120) * 1.0).alias("lat"),
        (-170 + ((F.col("user_id") * 7) % 340) * 1.0).alias("lon"),
    )
    anchors = pts.sparkSession.createDataFrame(
        [
            ("nyc", 40.7, -74.0),
            ("lon", 51.5, -0.1),
            ("sgp", 1.35, 103.8),
            ("syd", -33.9, 151.2),
            ("gru", -23.5, -46.6),
        ],
        ["name", "alat", "alon"],
    )
    km = (
        2
        * 6371.0
        * F.asin(
            F.sqrt(
                F.pow(F.sin(F.radians(F.col("alat") - F.col("lat")) / 2), 2)
                + F.cos(F.radians("lat"))
                * F.cos(F.radians("alat"))
                * F.pow(F.sin(F.radians(F.col("alon") - F.col("lon")) / 2), 2)
            )
        )
    )
    dists = pts.crossJoin(F.broadcast(anchors)).select(
        "user_id", "name", km.alias("km")
    )
    w = Window.partitionBy("user_id").orderBy("km", "name")
    return (
        dists.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", F.col("name").alias("nearest"), F.round("km", 1).alias("km"))
        .orderBy("user_id")
    )


@query(
    "calendar_dim_build",
    oracle="""
    WITH RECURSIVE d(dt) AS (
      SELECT DATE '1996-01-01'
      UNION ALL SELECT dt + INTERVAL 1 DAY FROM d WHERE dt < DATE '1996-03-31'
    )
    SELECT strftime(dt, '%Y-%m-%d') AS date_key,
           CAST(isodow(dt) AS INTEGER) AS iso_dow,
           CAST(date_part('week', dt) AS INTEGER) AS iso_week,
           CAST(date_part('month', dt) AS INTEGER) AS month,
           CAST(date_part('quarter', dt) AS INTEGER) AS quarter,
           (isodow(dt) >= 6) AS is_weekend,
           strftime(dt, '%Y-%m') AS month_key
    FROM d ORDER BY date_key
    """,
    tags=("sql", "dimension", "calendar"),
)
def calendar_dim_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar dimension generation — the conformed date table every
    warehouse joins against (ISO day-of-week/week, month, quarter,
    weekend flag), built from a recursive day spine with calendar-aware
    functions rather than loaded from a file. Dimension tables are
    key-sized by construction (a century is ~36.5k rows): generate,
    write once via `write_table`, broadcast everywhere. Cross-engine
    pitfall pinned by the oracle: Spark's ``dayofweek`` is 1=Sunday,
    DuckDB's ``isodow`` is 1=Monday — both sides use the ISO convention
    (via ``weekday`` arithmetic on the Spark side)."""
    d = spark.sql(
        """
        WITH RECURSIVE d(dt) AS (
          SELECT DATE '1996-01-01'
          UNION ALL SELECT dt + INTERVAL '1' DAY FROM d WHERE dt < DATE '1996-03-31'
        )
        SELECT dt FROM d
        """
    )
    iso_dow = (F.weekday("dt") + 1).cast("int")
    return d.select(
        F.date_format("dt", "yyyy-MM-dd").alias("date_key"),
        iso_dow.alias("iso_dow"),
        F.weekofyear("dt").cast("int").alias("iso_week"),
        F.month("dt").cast("int").alias("month"),
        F.quarter("dt").cast("int").alias("quarter"),
        (iso_dow >= 6).alias("is_weekend"),
        F.date_format("dt", "yyyy-MM").alias("month_key"),
    ).orderBy("date_key")


@query(
    "scalar_inline_structs",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS l
      FROM documents WHERE doc_id <= 50
    ),
    z AS (
      SELECT doc_id, i AS pos, l[i] AS tok, length(l[i]) AS tok_len
      FROM t, unnest(range(1, least(len(l), 5) + 1)) u(i)
    )
    SELECT doc_id, CAST(pos AS INTEGER) AS pos, tok,
           CAST(tok_len AS INTEGER) AS tok_len
    FROM z ORDER BY doc_id, pos
    """,
    tags=("scalar", "array", "struct"),
)
def scalar_inline_structs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-of-structs construction and flattening: zip token/position/
    length into struct elements (``arrays_zip`` over ``slice``/
    ``sequence``) then ``inline`` them back to columns — the nested-type
    round trip ETL uses for order-preserving array pipelines (build
    structured elements, transform, flatten). Partition-local: explode
    fan-out bounded to 5 per document, no shuffle."""
    d = load(spark, sf_dir, "documents").where(F.col("doc_id") <= 50)
    toks = F.slice(F.split("text", " "), 1, 5)
    zipped = F.arrays_zip(
        F.sequence(F.lit(1), F.least(F.size(toks), F.lit(5))).alias("pos"),
        toks.alias("tok"),
        F.transform(toks, lambda t: F.length(t)).alias("tok_len"),
    )
    return (
        d.select("doc_id", F.inline(zipped))
        .select(
            "doc_id",
            F.col("pos").cast("int").alias("pos"),
            "tok",
            F.col("tok_len").cast("int").alias("tok_len"),
        )
        .orderBy("doc_id", "pos")
    )


@query(
    "table_stats_collect",
    oracle="""
    WITH exact AS (
      SELECT 'o_orderkey' AS col, count(*)::BIGINT AS n_rows,
             (count(*) - count(o_orderkey))::BIGINT AS n_nulls,
             count(DISTINCT o_orderkey)::BIGINT AS ndv_exact,
             round(min(o_orderkey) * 1.0, 4) AS min_v,
             round(max(o_orderkey) * 1.0, 4) AS max_v
      FROM orders
      UNION ALL
      SELECT 'o_custkey', count(*)::BIGINT,
             (count(*) - count(o_custkey))::BIGINT,
             count(DISTINCT o_custkey)::BIGINT,
             round(min(o_custkey) * 1.0, 4), round(max(o_custkey) * 1.0, 4)
      FROM orders
      UNION ALL
      SELECT 'o_totalprice', count(*)::BIGINT,
             (count(*) - count(o_totalprice))::BIGINT,
             count(DISTINCT o_totalprice)::BIGINT,
             round(min(o_totalprice), 4), round(max(o_totalprice), 4)
      FROM orders
    )
    SELECT col, n_rows, n_nulls, min_v, max_v,
           TRUE AS ndv_acceptable, TRUE AS hist_balanced
    FROM exact
    """,
    tags=("stats", "analyze", "qa"),
)
def table_stats_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style column statistics in ONE scan — the CBO stats
    surface (`ANALYZE TABLE .. COMPUTE STATISTICS FOR COLUMNS`): for
    each column, row/null counts, min/max, an HLL++ distinct-count
    sketch, and an equi-depth histogram sketch, ALL collected in a
    single aggregation pass (3 columns = still 1 scan — every sketch is
    a fixed-size mergeable partial, the property that makes stats
    collection affordable at 100 TB). Exact quantities (counts, min,
    max) are hash-compared; the sketch quantities are CONTRACT-gated in
    the oracle's own pattern (`approx_distinct_qa` /
    `region_split_plan_qa`): NDV within 2% of exact, equi-depth buckets
    within 2x of uniform — computed on the Spark side from the same
    scan and asserted TRUE on both sides."""
    o = load(spark, sf_dir, "orders")
    cols = ["o_orderkey", "o_custkey", "o_totalprice"]
    # Exact multi-column count_distinct must live in its OWN aggregate:
    # mixing it with the sketch aggregates makes Catalyst's distinct
    # rewrite push everything through a 4-way Expand, and the
    # sketch partials ride the exploded relation (measured ~2x slower at
    # sf1). Separate jobs keep each aggregate its natural shape; the
    # single-row results broadcast-join back together for free.
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs += [
            F.count(c).alias(f"nn_{c}"),
            F.round(F.min(F.col(c) * 1.0), 4).alias(f"min_{c}"),
            F.round(F.max(F.col(c) * 1.0), 4).alias(f"max_{c}"),
            F.approx_count_distinct(c, 0.01).alias(f"ndv_{c}"),
            # accuracy is ALSO the compress threshold: lowering it makes
            # QuantileSummaries compress more often (slower) — keep 10000
            F.percentile_approx(
                F.col(c) * 1.0, [i / 8 for i in range(1, 8)], 10000
            ).alias(f"hist_{c}"),
        ]
    exact_ndv = o.agg(
        *[F.count_distinct(F.col(c)).alias(f"ndvx_{c}") for c in cols]
    )
    stats = o.agg(*aggs).join(F.broadcast(exact_ndv))
    # gate pass (second scan, like Spark's own ANALYZE histogram step):
    # count the first equi-depth bucket per column against its sketch split
    gate = o.join(F.broadcast(stats)).agg(
        *[
            F.sum(
                F.when(
                    F.col(c) * 1.0 <= F.element_at(F.col(f"hist_{c}"), 1), 1
                ).otherwise(0)
            ).alias(f"b1_{c}")
            for c in cols
        ]
    )
    # ONE row, ONE consumer: a 3-way stack() pivots the wide stats row
    # into the per-column output rows inside a single projection — the
    # r5 shape (three selects unioned) re-executed the whole two-scan
    # stats+gate plan per column (58 s at sf1; now ~1 scan-pair total)
    row = stats.join(F.broadcast(gate))
    stack_args = []
    for c in cols:
        stack_args += [
            F.lit(c),
            F.col("n_rows").cast("bigint"),
            (F.col("n_rows") - F.col(f"nn_{c}")).cast("bigint"),
            F.col(f"min_{c}"),
            F.col(f"max_{c}"),
            (
                F.abs(F.col(f"ndv_{c}") - F.col(f"ndvx_{c}"))
                / F.col(f"ndvx_{c}")
                <= 0.02
            ),
            # equi-depth contract: the first sketch bucket holds its
            # share of rows within 2x of uniform (1/8)
            (
                (F.col(f"b1_{c}") * 1.0 / F.col("n_rows") <= 0.25)
                & (F.col(f"b1_{c}") * 1.0 / F.col("n_rows") >= 0.0625)
            ),
        ]
    return row.select(
        F.stack(F.lit(3), *stack_args).alias(
            "col", "n_rows", "n_nulls", "min_v", "max_v",
            "ndv_acceptable", "hist_balanced",
        )
    )
