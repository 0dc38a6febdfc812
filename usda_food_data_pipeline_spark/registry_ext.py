"""Engine-extension queries widening the operator surface beyond the
reference (SURVEY §2.4/2.5 'not present in the reference' lists): as-of
join, range join, set ops, unpivot, running windows, exact percentile,
posexplode, cube. Each is still oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .functions.cleaning import deterministic_sum, grid_round_col, sql_grid_round
from .operators.asof import asof_join
from .registry import register
from .sources.tables import load_table

# ---------------------------------------------------------------------------
# As-of join (SURVEY §2.4: absent from the reference; classic PIT op)
# ---------------------------------------------------------------------------

ASOF_ORACLE = """
WITH r AS (
    -- one right row per (user_id, ts): greatest value wins, mirroring
    -- the operator's pre-aggregated dedup (operators/asof.py)
    SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, 0 AS side,
           max(value) AS v, NULL AS event_id
    FROM events WHERE event_type = 'purchase'
    GROUP BY user_id, ts
),
l AS (
    SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, 1 AS side,
           NULL AS v, event_id
    FROM events
),
u AS (SELECT * FROM r UNION ALL SELECT * FROM l),
c AS (
    SELECT *,
           last_value(v IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, side
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_value
    FROM u
)
SELECT event_id, user_id, epoch_us(ts) AS ts_us, asof_value
FROM c WHERE side = 1
"""


@register(
    "asof_join_events",
    ASOF_ORACLE,
    "point-in-time join: latest prior purchase value per user at each event",
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    joined = asof_join(
        events.select("event_id", "ts", "user_id"),
        purchases,
        ts_col="ts",
        by_cols=["user_id"],
        value_cols=["value"],
    )
    return joined.select(
        "event_id", "user_id", F.unix_micros("ts").alias("ts_us"),
        F.col("asof_value"),
    )


# ---------------------------------------------------------------------------
# Range (theta) join against a band dimension
# ---------------------------------------------------------------------------

BANDS = [(0.0, 100000.0, "LOW"), (100000.0, 300000.0, "MID"), (300000.0, 1e9, "HIGH")]

RANGE_JOIN_ORACLE = f"""
WITH bands(lo, hi, band) AS (VALUES {", ".join(f"({lo}, {hi}, '{b}')" for lo, hi, b in BANDS)})
SELECT o_orderkey AS order_key, band
FROM orders JOIN bands ON o_totalprice >= lo AND o_totalprice < hi
"""


@register(
    "range_join_bands",
    RANGE_JOIN_ORACLE,
    "range join: orders against price-band dimension (bucketed hash join)",
)
def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.range_join import band_join
    from .sources.tables import spread

    # round 2: bucketed equi-join (operators/range_join.py) replaces the
    # broadcast NLJ — hash join inside codegen; spread() keeps the
    # single-row-group parquet scan from serializing on one task
    orders = spread(load_table(spark, sf_dir, "orders"))
    bands = spark.createDataFrame(BANDS, "lo double, hi double, band string")
    return band_join(
        orders, bands, "o_totalprice", bucket_width=100000.0, bucket_cap=8
    ).select(F.col("o_orderkey").alias("order_key"), "band")


# ---------------------------------------------------------------------------
# Set operations
# ---------------------------------------------------------------------------

@register(
    "set_ops",
    """
    SELECT c_custkey AS customer_key FROM customer WHERE c_mktsegment = 'BUILDING'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
    """,
    "intersect/except distinct set algebra",
)
def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    building = customer.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("customer_key")
    )
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("customer_key")
    )
    pending = orders.filter(F.col("o_orderstatus") == "P").select(
        F.col("o_custkey").alias("customer_key")
    )
    return building.intersect(urgent).exceptAll(pending.distinct())


# ---------------------------------------------------------------------------
# Unpivot (wide → long; inverse of A2)
# ---------------------------------------------------------------------------

@register(
    "unpivot_orders",
    """
    SELECT o_orderkey AS order_key, metric, val
    FROM (SELECT o_orderkey, o_totalprice AS total_price,
                 CAST(o_custkey AS DOUBLE) AS customer_key_d
          FROM orders)
    UNPIVOT (val FOR metric IN (total_price, customer_key_d))
    """,
    "unpivot/melt wide columns into (metric, value) rows",
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    wide = orders.select(
        "o_orderkey",
        F.col("o_totalprice").alias("total_price"),
        F.col("o_custkey").cast("double").alias("customer_key_d"),
    )
    return (
        wide.unpivot(["o_orderkey"], ["total_price", "customer_key_d"], "metric", "val")
        # DuckDB's UNPIVOT drops NULL measures; pin the same contract
        .filter(F.col("val").isNotNull())
        .select(F.col("o_orderkey").alias("order_key"), "metric", "val")
    )


# ---------------------------------------------------------------------------
# Running / analytic windows (lag, rank, cumulative sum)
# ---------------------------------------------------------------------------

@register(
    "window_running",
    """
    SELECT o_custkey AS customer_key, o_orderkey AS order_key,
           row_number() OVER w AS order_seq,
           lag(o_orderkey) OVER w AS prev_order_key,
           CAST(sum(CAST(o_totalprice AS DECIMAL(30,6))) OVER (
               PARTITION BY o_custkey ORDER BY o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
               AS running_total
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)
    """,
    "per-customer order sequence: row_number, lag, running decimal sum",
)
def q_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return orders.select(
        F.col("o_custkey").alias("customer_key"),
        F.col("o_orderkey").alias("order_key"),
        F.row_number().over(w).alias("order_seq"),
        F.lag("o_orderkey").over(w).alias("prev_order_key"),
        F.sum(F.col("o_totalprice").cast("decimal(30,6)")).over(wsum)
        .cast("double").alias("running_total"),
    )


# ---------------------------------------------------------------------------
# Exact percentile (interpolated median over integer-valued doubles)
# ---------------------------------------------------------------------------

@register(
    "percentile_quantity",
    """
    SELECT l_returnflag AS return_flag,
           quantile_cont(l_quantity, 0.5) AS median_qty,
           min(l_quantity) AS min_qty, max(l_quantity) AS max_qty
    FROM lineitem GROUP BY l_returnflag
    """,
    "exact interpolated median per group (+ min/max)",
)
def q_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile("l_quantity", F.lit(0.5)).alias("median_qty"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
    ).select(
        F.col("l_returnflag").alias("return_flag"), "median_qty", "min_qty", "max_qty"
    )


# ---------------------------------------------------------------------------
# posexplode / unnest with ordinality
# ---------------------------------------------------------------------------

@register(
    "posexplode_tokens",
    r"""
    SELECT doc_id, s.pos, s.tok FROM (
        SELECT doc_id,
               unnest(list_transform(range(1, len(toks) + 1),
                   i -> {'pos': CAST(i - 1 AS INTEGER), 'tok': toks[i]})) AS s
        FROM (
            SELECT doc_id,
                   list_filter(string_split_regex(lower(trim(text)), '\s+'), t -> t != '') AS toks
            FROM documents WHERE doc_id < 50
        )
    )
    """,
    "explode array to rows with position (flatten for token pipelines)",
)
def q_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.dedup import tokenize

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    return docs.select(
        "doc_id", F.posexplode(tokenize(F.col("text"))).alias("pos", "tok")
    )


# ---------------------------------------------------------------------------
# In-data regexp extraction (F9/F10 analogs)
# ---------------------------------------------------------------------------

@register(
    "regexp_extract_unit",
    r"""
    SELECT p_partkey AS part_key,
           upper(trim(p_brand)) || ' (' || upper(trim(p_type)) || ')' AS label,
           regexp_extract(upper(trim(p_brand)) || ' (' || upper(trim(p_type)) || ')',
                          '\(([^)]*)\)$', 1) AS unit
    FROM part
    """,
    "parse trailing '(UNIT)' from composite labels (reference :119 in-data)",
)
def q_regexp_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    label = F.concat(
        F.upper(F.trim("p_brand")), F.lit(" ("), F.upper(F.trim("p_type")), F.lit(")")
    )
    return part.select(
        F.col("p_partkey").alias("part_key"),
        label.alias("label"),
        F.regexp_extract(label, r"\(([^)]*)\)$", 1).alias("unit"),
    )


# ---------------------------------------------------------------------------
# A4: aggregate over a retrieval result (the assistant's "average over
# the nutrient data" instruction, usda-food-assistant/app.py:39 — here:
# top-k cosine retrieval, then avg per label over the retrieved set)
# ---------------------------------------------------------------------------

TOPK_AVG_ORACLE = """
WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
topk AS (
    SELECT vec_id,
           list_dot_product(e.embedding::DOUBLE[], q.qv)
             / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
                * sqrt(list_dot_product(q.qv, q.qv))) AS score
    FROM embeddings e, q
    ORDER BY score DESC, vec_id LIMIT 50
)
SELECT e.label,
       count(*) AS n_retrieved,
       CAST(sum(CAST(t.score AS DECIMAL(30,12))) AS DOUBLE) / count(*) AS avg_score
FROM topk t JOIN embeddings e ON t.vec_id = e.vec_id
GROUP BY e.label
"""


@register(
    "topk_avg_retrieved",
    TOPK_AVG_ORACLE,
    "aggregate over retrieval output (reference A4: avg over retrieved docs)",
)
def q_topk_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.similarity import cosine_topk

    emb = load_table(spark, sf_dir, "embeddings")
    query = emb.filter(F.col("vec_id") == 0)
    topk = cosine_topk(emb, query, k=50)
    return (
        topk.join(emb.select("vec_id", "label"), "vec_id")
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_retrieved"),
            (
                F.sum(F.col("score").cast("decimal(30,12)")).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_score"),
        )
    )


# ---------------------------------------------------------------------------
# Top-k per group (window pattern — guide's canonical OLAP shape)
# ---------------------------------------------------------------------------

@register(
    "topk_per_group",
    f"""
    SELECT segment, order_key, order_total, rnk FROM (
        SELECT c_mktsegment AS segment, o_orderkey AS order_key,
               {sql_grid_round('o_totalprice', 2)} AS order_total,
               row_number() OVER (PARTITION BY c_mktsegment
                   ORDER BY o_totalprice DESC, o_orderkey) AS rnk
        FROM orders JOIN customer ON o_custkey = c_custkey
    ) WHERE rnk <= 3
    """,
    "top-3 orders per market segment (window row_number, rank<=k)",
)
def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .select(
            F.col("c_mktsegment").alias("segment"),
            F.col("o_orderkey").alias("order_key"),
            grid_round_col("o_totalprice", 2).alias("order_total"),
            F.row_number().over(w).alias("rnk"),
        )
        .filter(F.col("rnk") <= 3)
    )


# ---------------------------------------------------------------------------
# EXISTS-shaped count per group (TPC-H Q4 shape, adapted to our schema)
# ---------------------------------------------------------------------------

@register(
    "tpch_q4_exists",
    """
    SELECT o_orderpriority AS order_priority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_quantity > 45)
    GROUP BY o_orderpriority
    """,
    "priority counts for orders having any high-quantity lineitem (EXISTS)",
)
def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    big_items = li.filter(F.col("l_quantity") > 45).select(
        F.col("l_orderkey").alias("o_orderkey")
    )
    return (
        orders.filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        )
        .join(big_items, "o_orderkey", "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .select(F.col("o_orderpriority").alias("order_priority"), "order_count")
    )


# ---------------------------------------------------------------------------
# Scalar subquery: rows above the global average (TPC-H Q17 shape)
# ---------------------------------------------------------------------------

@register(
    "above_avg_parts",
    f"""
    SELECT p_partkey AS part_key, {sql_grid_round('p_retailprice', 2)} AS retail_price
    FROM part
    WHERE p_retailprice > (
        SELECT CAST(sum(CAST(p_retailprice AS DECIMAL(30,6))) AS DOUBLE) / count(*)
        FROM part)
    """,
    "filter by scalar-subquery aggregate (global decimal-exact mean)",
)
def q_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    avg_df = part.agg(
        (
            F.sum(F.col("p_retailprice").cast("decimal(30,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_price")
    )
    return (
        part.join(F.broadcast(avg_df))
        .filter(F.col("p_retailprice") > F.col("avg_price"))
        .select(
            F.col("p_partkey").alias("part_key"),
            grid_round_col("p_retailprice", 2).alias("retail_price"),
        )
    )


# ---------------------------------------------------------------------------
# Approximate aggregates — rows-only checks by design: HLL/KLL sketch
# values are engine-specific, so no cross-engine value oracle exists.
# The tests bound their error against exact counterparts instead.
# ---------------------------------------------------------------------------

@register(
    "approx_distinct",
    None,
    "approx_count_distinct (HLL) per group; rows-only (sketch values are engine-specific)",
)
def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.approx_count_distinct("l_suppkey").alias("approx_supps"),
    ).select(F.col("l_returnflag").alias("return_flag"), "approx_parts", "approx_supps")


@register(
    "approx_quantiles",
    None,
    "percentile_approx (KLL-style) per group; rows-only",
)
def q_approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("p50_price"),
        F.percentile_approx("l_extendedprice", 0.99, 10000).alias("p99_price"),
    ).select(F.col("l_returnflag").alias("return_flag"), "p50_price", "p99_price")


# ---------------------------------------------------------------------------
# Spark SQL API path (BASELINE.json approach: "DataFrame ops + Spark
# SQL") — same Catalyst plans, SQL text surface; TPC-H Q10 shape
# ---------------------------------------------------------------------------

TPCH_Q10_SQL = """
SELECT c.c_custkey AS customer_key,
       upper(trim(c.c_name)) AS customer_name,
       n.n_name AS nation_name,
       CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(30,6))) AS DOUBLE) AS revenue
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
  AND l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY revenue DESC, customer_key
LIMIT 20
"""


@register(
    "tpch_q10_sql",
    TPCH_Q10_SQL,
    "returned-item revenue top-20 via the spark.sql text API (same SQL runs on both engines)",
)
def q_tpch_q10_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(TPCH_Q10_SQL)


# ---------------------------------------------------------------------------
# Date/time scalar functions (engine surface; testdata has real
# timestamps even though the reference pipeline used none — SURVEY §1.2)
# ---------------------------------------------------------------------------

@register(
    "date_functions",
    """
    SELECT o_orderkey AS order_key,
           CAST(year(o_orderdate) AS INTEGER) AS order_year,
           CAST(quarter(o_orderdate) AS INTEGER) AS order_quarter,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
           CAST(date_diff('day', o_orderdate, TIMESTAMP '2000-01-01 00:00:00') AS BIGINT)
               AS days_to_y2k
    FROM orders
    """,
    "year/quarter/date_trunc/datediff scalar date arithmetic",
)
def q_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        F.col("o_orderkey").alias("order_key"),
        F.year("o_orderdate").alias("order_year"),
        F.quarter("o_orderdate").alias("order_quarter"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias(
            "month_start"
        ),
        F.datediff(
            F.lit("2000-01-01").cast("date"), F.col("o_orderdate").cast("date")
        ).cast("bigint").alias("days_to_y2k"),
    )


# ---------------------------------------------------------------------------
# Explicit grouping sets via the SQL surface. The four sets listed are
# exactly CUBE(l_returnflag, l_linestatus), and ROLLUP's sets are the
# subset where g_status >= g_flag — so this one query attests the whole
# rollup/cube/grouping-sets family (round-2 consolidation to fit the
# driver's 50-entry CORRECTNESS window); tests/test_grouping.py pins the
# DataFrame rollup()/cube() APIs to subsets of this result.
# ---------------------------------------------------------------------------

GROUPING_SETS_SQL = """
SELECT l_returnflag AS return_flag, l_linestatus AS line_status,
       CAST(grouping(l_returnflag) AS BIGINT) AS g_flag,
       CAST(grouping(l_linestatus) AS BIGINT) AS g_status,
       CAST(sum(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS sum_qty,
       count(*) AS n_rows
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), (l_linestatus), ())
"""


@register(
    "grouping_sets",
    GROUPING_SETS_SQL,
    "all grouping sets of (returnflag, linestatus) in one pass (subsumes rollup+cube)",
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Pre-aggregate to the |flag|x|status| base (9 rows) BEFORE the
    # grouping-set Expand: the naive plan Expands every fact row 4x
    # (4x scan volume through the agg); rolling the sets up from base
    # partials is bit-identical (decimal sums and counts are
    # associative) and the Expand now costs 9 rows. At 100 TB this is
    # the difference between one fact-table aggregation and four.
    li = load_table(spark, sf_dir, "lineitem")
    base = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_quantity").cast("decimal(30,6)")).alias("_q"),
        F.count(F.lit(1)).alias("_n"),
    )
    return base.cube("l_returnflag", "l_linestatus").agg(
        F.grouping("l_returnflag").cast("bigint").alias("g_flag"),
        F.grouping("l_linestatus").cast("bigint").alias("g_status"),
        F.sum("_q").cast("double").alias("sum_qty"),
        F.sum("_n").alias("n_rows"),
    ).select(
        F.col("l_returnflag").alias("return_flag"),
        F.col("l_linestatus").alias("line_status"),
        "g_flag", "g_status", "sum_qty", "n_rows",
    )


# ---------------------------------------------------------------------------
# Grouped array aggregation (collect_list + array functions)
# ---------------------------------------------------------------------------

@register(
    "array_agg_quantities",
    """
    SELECT l_orderkey AS order_key,
           array_to_string(list_sort(list(CAST(l_quantity AS INTEGER))), ',') AS quantities,
           CAST(len(list_distinct(list(CAST(l_quantity AS INTEGER)))) AS INTEGER) AS n_distinct_qty
    FROM lineitem GROUP BY l_orderkey
    """,
    "per-order sorted quantity array (collect_list/sort_array/array_distinct)",
)
def q_array_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("int")
    return li.groupBy("l_orderkey").agg(
        F.concat_ws(",", F.sort_array(F.collect_list(qty))).alias("quantities"),
        F.size(F.array_distinct(F.collect_list(qty))).alias("n_distinct_qty"),
    ).select(F.col("l_orderkey").alias("order_key"), "quantities", "n_distinct_qty")


# ---------------------------------------------------------------------------
# TPC-H Q14 shape: conditional revenue share over a join
# ---------------------------------------------------------------------------

@register(
    "tpch_q14_promo_share",
    """
    SELECT 100.0 * CAST(sum(CASE WHEN p_type LIKE 'PROMO%'
                     THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6)) END) AS DOUBLE)
               / CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))) AS DOUBLE)
               AS promo_revenue_pct,
           count(*) AS n_rows
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
    """,
    "promo revenue share (conditional agg over join, TPC-H Q14 shape)",
)
def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    rev_dec = rev.cast("decimal(30,6)")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
        )
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            (
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type").like("PROMO%"), rev_dec)).cast("double")
                / F.sum(rev_dec).cast("double")
            ).alias("promo_revenue_pct"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q19 shape: disjunctive multi-range predicate over a join
# ---------------------------------------------------------------------------

@register(
    "tpch_q19_disjunctive",
    """
    SELECT CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))) AS DOUBLE) AS revenue,
           count(*) AS n_rows
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#1' AND l_quantity BETWEEN 1 AND 11 AND p_size BETWEEN 1 AND 5)
       OR (p_brand = 'Brand#2' AND l_quantity BETWEEN 10 AND 20 AND p_size BETWEEN 1 AND 10)
       OR (p_brand = 'Brand#3' AND l_quantity BETWEEN 20 AND 30 AND p_size BETWEEN 1 AND 15)
    """,
    "disjunctive range predicates across joined tables (TPC-H Q19 shape)",
)
def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    q, sz, b = F.col("l_quantity"), F.col("p_size"), F.col("p_brand")
    cond = (
        ((b == "Brand#1") & q.between(1, 11) & sz.between(1, 5))
        | ((b == "Brand#2") & q.between(10, 20) & sz.between(1, 10))
        | ((b == "Brand#3") & q.between(20, 30) & sz.between(1, 15))
    )
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(30,6)")
    return j.filter(cond).agg(
        F.sum(rev).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_rows"),
    )


# ---------------------------------------------------------------------------
# Stratified exact-n sample per group (D4 extension, portable hashing)
# ---------------------------------------------------------------------------

@register(
    "stratified_sample",
    """
    SELECT order_priority, order_key FROM (
        SELECT o_orderpriority AS order_priority, o_orderkey AS order_key,
               row_number() OVER (PARTITION BY o_orderpriority
                   ORDER BY md5('s42:' || CAST(o_orderkey AS VARCHAR)), o_orderkey) AS rn
        FROM orders
    ) WHERE rn <= 50
    """,
    "deterministic exact-n-per-group sample (md5-ordered row_number)",
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from .operators.topk import portable_hash_order

    orders = load_table(spark, sf_dir, "orders")
    h = portable_hash_order(42, "o_orderkey")
    w = Window.partitionBy("o_orderpriority").orderBy(h, F.col("o_orderkey"))
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 50)
        .select(
            F.col("o_orderpriority").alias("order_priority"),
            F.col("o_orderkey").alias("order_key"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q18 shape: HAVING over an aggregate, joined back to detail
# ---------------------------------------------------------------------------

@register(
    "tpch_q18_big_orders",
    f"""
    WITH big AS (
        SELECT l_orderkey
        FROM lineitem GROUP BY l_orderkey
        HAVING sum(l_quantity) > 150
    )
    SELECT c_custkey AS customer_key, o_orderkey AS order_key,
           {sql_grid_round('o_totalprice', 2)} AS order_total,
           CAST(sum(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS total_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (SELECT l_orderkey FROM big)
    GROUP BY c_custkey, o_orderkey, o_totalprice
    """,
    "large-volume orders: HAVING-filtered agg semi-joined back to detail (TPC-H Q18 shape)",
)
def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .functions.cleaning import deterministic_sum

    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 150)
        .select(F.col("l_orderkey").alias("o_orderkey"))
    )
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey)
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .join(big, "o_orderkey", "left_semi")
        .groupBy("c_custkey", "o_orderkey", "o_totalprice")
        .agg(deterministic_sum("l_quantity").alias("total_qty"))
        .select(
            F.col("c_custkey").alias("customer_key"),
            F.col("o_orderkey").alias("order_key"),
            grid_round_col("o_totalprice", 2).alias("order_total"),
            "total_qty",
        )
    )


# conditional_counts (count_if) was folded into registry.distinct_agg in
# round 2 — one slot now attests count(distinct) + count_if together.


# ---------------------------------------------------------------------------
# Skew-salted aggregation: salting is semantically transparent (decimal
# addition is associative), so the oracle is the PLAIN grouped sum — the
# query attests that the two-stage salted plan returns bit-identical
# results to the direct aggregation.
# ---------------------------------------------------------------------------

@register(
    "skew_salted_sum",
    """
    SELECT l_returnflag AS return_flag,
           CAST(sum(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS sum_l_quantity,
           count(*) AS n_rows
    FROM lineitem GROUP BY l_returnflag
    """,
    "two-stage salted aggregation == plain grouped sum (hot-key mitigation)",
)
def q_skew_salted_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.skew import salted_group_sum

    li = load_table(spark, sf_dir, "lineitem")
    sums = salted_group_sum(li, ["l_returnflag"], "l_quantity", n_salts=16)
    counts = li.groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("n_rows"))
    return sums.join(counts, "l_returnflag").select(
        F.col("l_returnflag").alias("return_flag"), "sum_l_quantity", "n_rows"
    )


# ---------------------------------------------------------------------------
# Grouped-agg pandas UDAF oracle row (SURVEY §2.9): geometric mean of
# l_quantity per (returnflag, linestatus). Cross-engine exactness via
# functions/portable_ln (r07 verdict #2): per-value logs ride the
# portable IEEE ln on the 9-dp integer-nano grid (l_quantity is
# integer-valued), the per-group accumulation is an exact integer sum
# (order-independent — float avg(ln) is not), and the final exp is the
# portable range-reduced Taylor form snapped to 4 dp with floor math.
# The UDAF runs the same chain in Python, bit-identical by
# construction.
# ---------------------------------------------------------------------------


def _geomean_oracle() -> str:
    from .functions.portable_ln import (
        POWS_CTE,
        sql_exp_select,
        sql_grid_nanos,
        sql_ln_select,
    )

    lnq = sql_ln_select(
        "(SELECT DISTINCT q FROM vals) _dlq",
        ["q"],
        {"a": "q"},
        [("_q_nanos", "CAST(floor(((_ln_a) * 1000000000.0) + 0.5) AS BIGINT)")],
    )
    ex = sql_exp_select(
        "g",
        ["return_flag", "line_status"],
        "CAST(s AS DOUBLE) / (CAST(k AS DOUBLE) * 1000000000.0)",
        "_gm",
    )
    return f"""
    WITH {POWS_CTE},
    vals AS (
        SELECT l_returnflag AS return_flag, l_linestatus AS line_status,
               CAST(l_quantity AS BIGINT) AS q
        FROM lineitem WHERE l_quantity > 0
    ),
    lnq AS ({lnq}),
    g AS (
        SELECT return_flag, line_status, count(*) AS k, sum(l._q_nanos) AS s
        FROM vals JOIN lnq l USING (q)
        GROUP BY return_flag, line_status
    ),
    ex AS ({ex}),
    counts AS (
        SELECT l_returnflag AS return_flag, l_linestatus AS line_status,
               CAST(count(*) AS BIGINT) AS n_items
        FROM lineitem GROUP BY 1, 2
    )
    SELECT e.return_flag, e.line_status,
           CAST({sql_grid_nanos('e._gm', 4)} AS DOUBLE) / 10000.0 AS gm_quantity,
           c.n_items
    FROM ex e JOIN counts c USING (return_flag, line_status)
    """


@register(
    "geomean_quantity",
    _geomean_oracle(),
    "grouped-agg pandas UDAF: per-group geometric mean of quantity "
    "(portable ln/exp chain — functions/portable_ln)",
)
def q_geomean_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .functions.udtf_udaf import geometric_mean

    li = load_table(spark, sf_dir, "lineitem")
    keys = [
        F.col("l_returnflag").alias("return_flag"),
        F.col("l_linestatus").alias("line_status"),
    ]
    # a grouped-agg pandas UDF cannot share an agg() with JVM aggregates
    # (INVALID_PANDAS_UDF_PLACEMENT) — run the count as its own grouped
    # agg and broadcast-join the handful of group rows back together;
    # the UDAF output is already 4-dp-snapped (portable chain)
    gm = li.groupBy(*keys).agg(geometric_mean("l_quantity").alias("gm_quantity"))
    counts = li.groupBy(*keys).agg(F.count(F.lit(1)).alias("n_items"))
    return gm.join(F.broadcast(counts), ["return_flag", "line_status"])


# ---------------------------------------------------------------------------
# SCD2 temporal versioning (operators/scd.py): event stream -> validity
# intervals per key, consecutive-unchanged rows compacted
# ---------------------------------------------------------------------------

@register(
    "scd2_history",
    """
    WITH e AS (
        SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us, event_type
        FROM events
    ),
    flagged AS (
        SELECT user_id, event_id, us, event_type,
               lag(event_type) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev_type
        FROM e
    ),
    changes AS (
        SELECT * FROM flagged WHERE prev_type IS NULL OR prev_type <> event_type
    ),
    versions AS (
        SELECT user_id, event_type, us AS valid_from_us,
               lead(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS valid_to_us
        FROM changes
    )
    SELECT user_id, event_type, valid_from_us, valid_to_us,
           valid_to_us IS NULL AS is_current
    FROM versions
    """,
    "SCD2 history of each user's event_type: change compaction + validity intervals",
)
def q_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.scd import scd2_history

    events = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type"
    )
    hist = scd2_history(events, "user_id", "ts", ["event_type"], tiebreak_col="event_id")
    return hist.select(
        "user_id",
        "event_type",
        F.unix_micros("valid_from").alias("valid_from_us"),
        F.unix_micros("valid_to").alias("valid_to_us"),
        "is_current",
    )


# ---------------------------------------------------------------------------
# Column profiling (operators/profile.py): exact per-column summary via
# unpivot + two-level aggregation, no Expand
# ---------------------------------------------------------------------------

@register(
    "profile_orders",
    """
    WITH stacked AS (
        SELECT 'o_orderkey' AS col_name, CAST(o_orderkey AS VARCHAR) AS value FROM orders
        UNION ALL
        SELECT 'o_orderstatus', o_orderstatus FROM orders
        UNION ALL
        SELECT 'o_totalprice', CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR) FROM orders
        UNION ALL
        SELECT 'o_orderdate', CAST(CAST(o_orderdate AS DATE) AS VARCHAR) FROM orders
        UNION ALL
        SELECT 'o_orderpriority', o_orderpriority FROM orders
    )
    SELECT col_name,
           count(*) AS n_rows,
           count(*) - count(value) AS n_nulls,
           count(DISTINCT value) AS n_distinct,
           min(value) AS min_value,
           max(value) AS max_value
    FROM stacked GROUP BY col_name
    """,
    "per-column profile of orders: rows/nulls/exact distinct/extrema in one pass",
)
def q_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.profile import profile_columns

    orders = load_table(spark, sf_dir, "orders")
    return profile_columns(
        orders,
        {
            "o_orderkey": F.col("o_orderkey"),
            "o_orderstatus": F.col("o_orderstatus"),
            # decimal first: raw double->string formats differ across engines
            "o_totalprice": F.col("o_totalprice").cast("decimal(18,2)"),
            "o_orderdate": F.col("o_orderdate").cast("date"),
            "o_orderpriority": F.col("o_orderpriority"),
        },
    )


# ---------------------------------------------------------------------------
# TPC-H Q13 shape: customer order-count distribution (outer-join agg)
# ---------------------------------------------------------------------------

@register(
    "tpch_q13_custdist",
    """
    SELECT c_count, count(*) AS custdist FROM (
        SELECT c.c_custkey, count(o.o_orderkey) AS c_count
        FROM customer c LEFT OUTER JOIN orders o ON c.c_custkey = o.o_custkey
        GROUP BY c.c_custkey
    ) GROUP BY c_count
    """,
    "customer order-count distribution (left-outer-join two-level agg, TPC-H Q13 shape)",
)
def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Counts-of-counts over an OUTER join: customers with zero orders
    must survive into the c_count=0 bucket, which an inner join would
    silently drop. Shape note: the first aggregate reuses the join's
    c_custkey clustering (one exchange), the second shuffles only the
    |distinct counts|-row distribution."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy(cust.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


# ---------------------------------------------------------------------------
# TPC-H Q15 shape: top-revenue supplier via scalar-max subquery
# ---------------------------------------------------------------------------

@register(
    "tpch_q15_top_supplier",
    """
    WITH rev AS (
        SELECT l_suppkey AS supplier_no,
               sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))) AS total_rev
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
    FROM supplier JOIN rev ON s_suppkey = supplier_no
    WHERE total_rev = (SELECT max(total_rev) FROM rev)
    """,
    "supplier(s) with maximum quarterly revenue (scalar-max subquery, TPC-H Q15 shape)",
)
def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The =max(...) tie semantics (ALL maximal suppliers, not an
    arbitrary top-1) need revenue on an exact grid: the per-supplier
    sums aggregate as DECIMAL, so equality against the 1-row broadcast
    max is exact on both engines — double sums would make the tie set
    aggregation-order-dependent."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(30,6)"
                )
            ).alias("total_rev")
        )
    )
    mx = rev.agg(F.max("total_rev").alias("_mx"))
    return (
        rev.join(F.broadcast(mx), rev.total_rev == F.col("_mx"))
        .join(supp, rev.supplier_no == supp.s_suppkey)
        .select("s_suppkey", "s_name", F.col("total_rev").cast("double").alias("total_revenue"))
    )


# ---------------------------------------------------------------------------
# TPC-H Q17 shape: correlated per-group average threshold
# ---------------------------------------------------------------------------

@register(
    "tpch_q17_small_quantity",
    """
    WITH pa AS (
        SELECT l_partkey AS pk,
               sum(CAST(l_quantity AS DECIMAL(12,2))) AS sq,
               count(*) AS nq
        FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) AS total_extprice,
           count(*) AS n_rows
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN pa ON pa.pk = l_partkey
    WHERE p_brand = 'Brand#1' AND p_size <= 10
      AND CAST(l_quantity AS DECIMAL(12,2)) * 5 * CAST(nq AS DECIMAL(12,0)) < sq
    """,
    "below-20%-of-part-average quantity revenue (correlated avg threshold, TPC-H Q17 shape)",
)
def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The correlated predicate ``l_quantity < 0.2 * avg(l_quantity per
    part)`` is rewritten as the exact cross-multiplied integer/decimal
    test ``5 * qty * n < sum`` — no float division anywhere, so the
    boundary rows agree across engines. The per-part aggregate joins
    back by partkey; filters prune parts before the fact join."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    qty = F.col("l_quantity").cast("decimal(12,2)")
    pa = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum(qty).alias("sq"), F.count(F.lit(1)).alias("nq")
    )
    sel_parts = part.filter((F.col("p_brand") == "Brand#1") & (F.col("p_size") <= 10))
    return (
        li.join(F.broadcast(sel_parts), li.l_partkey == sel_parts.p_partkey)
        .join(pa, li.l_partkey == pa.pk)
        # nq narrows to decimal(12,0): a bigint operand promotes to
        # decimal(20,0) and pushes the product past precision 38,
        # silently rounding the scale (the dsir_select lesson)
        .filter(qty * 5 * F.col("nq").cast("decimal(12,0)") < F.col("sq"))
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(30,6)"))
            .cast("double")
            .alias("total_extprice"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q22 shape: above-average balance + anti join
# ---------------------------------------------------------------------------

@register(
    "tpch_q22_idle_customers",
    """
    WITH avgbal AS (
        SELECT sum(CAST(c_acctbal AS DECIMAL(18,6))) AS s, count(*) AS n
        FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c_nationkey,
           count(*) AS numcust,
           CAST(sum(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS totacctbal
    FROM customer, avgbal
    WHERE CAST(c_acctbal AS DECIMAL(18,6)) * CAST(n AS DECIMAL(12,0)) > s
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_nationkey
    """,
    "idle above-average-balance customers per nation (scalar-avg + anti join, TPC-H Q22 shape)",
)
def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``c_acctbal > avg(...)`` cross-multiplies to the exact decimal
    test ``bal * n > sum`` against a 1-row broadcast aggregate (the
    float quotient would put boundary customers at ULP risk); the
    no-orders condition is a genuine anti join, which Spark executes
    broadcast- or shuffle-hash without materializing the orders side."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    bal = F.col("c_acctbal").cast("decimal(18,6)")
    avgbal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        F.sum(bal).alias("s"), F.count(F.lit(1)).alias("n")
    )
    return (
        cust.crossJoin(F.broadcast(avgbal))
        .filter(bal * F.col("n").cast("decimal(12,0)") > F.col("s"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(bal).cast("double").alias("totacctbal"),
        )
    )


# ---------------------------------------------------------------------------
# Order-independent table checksum (operators/merge.table_checksum)
# ---------------------------------------------------------------------------

def _checksum_oracle() -> str:
    from .operators.dedup import oracle_md5_int_sql

    cols = [
        "CAST(o_orderkey AS VARCHAR)",
        "CAST(o_custkey AS VARCHAR)",
        "CAST(o_orderstatus AS VARCHAR)",
        "CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR)",
        "CAST(CAST(o_orderdate AS DATE) AS VARCHAR)",
    ]
    tagged = " || ".join(f"coalesce(md5({c}), 'N')" for c in cols)
    h = oracle_md5_int_sql(f"({tagged})", 47, 12)
    return f"""
    SELECT o_orderpriority AS order_priority,
           count(*) AS n_rows,
           CAST(sum(CAST({h} AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS checksum
    FROM orders GROUP BY o_orderpriority
    """


@register(
    "table_checksum",
    _checksum_oracle(),
    "order-independent per-group content checksum (replica verification "
    "without sort or co-located join)",
)
def q_table_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.merge import table_checksum

    orders = load_table(spark, sf_dir, "orders")
    # floats/timestamps onto exactly-stringifiable grids (caller contract)
    prepped = orders.select(
        "o_orderpriority",
        F.col("o_orderkey").cast("string").alias("k1"),
        F.col("o_custkey").cast("string").alias("k2"),
        F.col("o_orderstatus").cast("string").alias("k3"),
        F.col("o_totalprice").cast("decimal(12,2)").cast("string").alias("k4"),
        F.col("o_orderdate").cast("date").cast("string").alias("k5"),
    )
    return table_checksum(
        prepped, ["o_orderpriority"], ["k1", "k2", "k3", "k4", "k5"]
    ).withColumnRenamed("o_orderpriority", "order_priority")


# ---------------------------------------------------------------------------
# TPC-H Q7 shape: bidirectional nation-pair shipping volume
# ---------------------------------------------------------------------------

@register(
    "tpch_q7_nation_volume",
    """
    SELECT supp_nation, cust_nation, l_year,
           CAST(sum(volume) AS DOUBLE) AS revenue, count(*) AS n_rows
    FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(year(l_shipdate) AS INTEGER) AS l_year,
               CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6)) AS volume
        FROM lineitem
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON n1.n_nationkey = s_nationkey
        JOIN nation n2 ON n2.n_nationkey = c_nationkey
        WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
          AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    ) GROUP BY supp_nation, cust_nation, l_year
    """,
    "bidirectional nation-pair shipping volume by year (TPC-H Q7 shape)",
)
def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Five-table join chain where the two nation dims broadcast and the
    disjunctive pair predicate prunes BEFORE the fact joins: filtering
    supplier/customer to the two nations first keeps the orders/lineitem
    shuffles to matching keys only."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")

    pair = ["NATION_1", "NATION_2"]
    n1 = nation.filter(F.col("n_name").isin(pair)).select(
        F.col("n_nationkey").alias("_sk"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.filter(F.col("n_name").isin(pair)).select(
        F.col("n_nationkey").alias("_ck"), F.col("n_name").alias("cust_nation")
    )
    s = supp.join(F.broadcast(n1), supp.s_nationkey == F.col("_sk"))
    c = cust.join(F.broadcast(n2), cust.c_nationkey == F.col("_ck"))
    j = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
        )
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(c, orders.o_custkey == c.c_custkey)
        .filter(F.col("supp_nation") != F.col("cust_nation"))
    )
    vol = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(30,6)")
    return (
        j.groupBy(
            "supp_nation", "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(
            F.sum(vol).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q8 shape: national market share within a region
# ---------------------------------------------------------------------------

@register(
    "tpch_q8_market_share",
    """
    SELECT o_year,
           CAST(sum(CASE WHEN supp_nation = 'NATION_2' THEN volume END) AS DOUBLE)
             / CAST(sum(volume) AS DOUBLE) AS mkt_share,
           count(*) AS n_rows
    FROM (
        SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
               CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6)) AS volume,
               n2.n_name AS supp_nation
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON n1.n_nationkey = c_nationkey
        JOIN region ON r_regionkey = n1.n_regionkey
        JOIN nation n2 ON n2.n_nationkey = s_nationkey
        WHERE r_name = 'ASIA' AND p_size <= 25
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    ) GROUP BY o_year
    """,
    "supplier-nation market share inside a customer region (TPC-H Q8 shape)",
)
def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seven-table chain: region/nation/part dims broadcast; the share
    divides two decimal-exact sums cast to double (the attested Q14
    pattern), so the quotient is engine-exact."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_size") <= 25)
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")

    n1 = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select(F.col("n_nationkey").alias("_ck"))
    n2 = nation.select(
        F.col("n_nationkey").alias("_sk"), F.col("n_name").alias("supp_nation")
    )
    j = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(
            orders.filter(
                (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
            ),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(n1), cust.c_nationkey == F.col("_ck"), "left_semi")
        .join(F.broadcast(supp.join(F.broadcast(n2), supp.s_nationkey == F.col("_sk"))),
              li.l_suppkey == F.col("s_suppkey"))
    )
    vol = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(30,6)")
    return (
        j.groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            (
                F.sum(F.when(F.col("supp_nation") == "NATION_2", vol)).cast("double")
                / F.sum(vol).cast("double")
            ).alias("mkt_share"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


# ---------------------------------------------------------------------------
# Nearest-direction as-of join (operators/asof.py direction="nearest")
# ---------------------------------------------------------------------------

ASOF_NEAREST_ORACLE = """
WITH r AS (
    SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, 0 AS side,
           max(value) AS v, CAST(NULL AS BIGINT) AS event_id
    FROM events WHERE event_type = 'purchase'
    GROUP BY user_id, ts
),
l AS (
    SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, 1 AS side,
           CAST(NULL AS DOUBLE) AS v, event_id
    FROM events
),
u AS (
    SELECT *, CASE WHEN side = 0 THEN ts END AS mts
    FROM (SELECT * FROM r UNION ALL SELECT * FROM l)
),
c AS (
    SELECT *,
           last_value(v IGNORE NULLS) OVER wb AS vb,
           last_value(mts IGNORE NULLS) OVER wb AS tb,
           last_value(v IGNORE NULLS) OVER wf AS vf,
           last_value(mts IGNORE NULLS) OVER wf AS tf
    FROM u
    WINDOW wb AS (PARTITION BY user_id ORDER BY ts, side
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
           wf AS (PARTITION BY user_id ORDER BY ts DESC, side
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT event_id, user_id, epoch_us(ts) AS ts_us,
       CASE WHEN tf IS NULL
              OR (tb IS NOT NULL
                  AND epoch_us(ts) - epoch_us(tb) <= epoch_us(tf) - epoch_us(ts))
            THEN vb ELSE vf END AS asof_value
FROM c WHERE side = 1
"""


@register(
    "asof_join_nearest",
    ASOF_NEAREST_ORACLE,
    "nearest-direction point-in-time join (min time distance, ties backward)",
)
def q_asof_join_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pandas merge_asof(direction='nearest') semantics: both scan
    directions share ONE partitioning exchange (two in-partition
    sorts), then a per-row integral distance pick — see
    operators/asof.py. The oracle mirrors both carries with a dual
    WINDOW clause."""
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    joined = asof_join(
        events.select("event_id", "ts", "user_id"),
        purchases,
        ts_col="ts",
        by_cols=["user_id"],
        value_cols=["value"],
        direction="nearest",
    )
    return joined.select(
        "event_id", "user_id", F.unix_micros("ts").alias("ts_us"),
        F.col("asof_value"),
    )


# ---------------------------------------------------------------------------
# Weekly retention cohorts
# ---------------------------------------------------------------------------

@register(
    "retention_cohorts",
    """
    WITH first_week AS (
        SELECT user_id, date_trunc('week', min(CAST(ts AS TIMESTAMP))) AS cw
        FROM events GROUP BY user_id
    ),
    active AS (
        SELECT DISTINCT e.user_id, f.cw,
               (CAST(date_trunc('week', CAST(e.ts AS TIMESTAMP)) AS DATE)
                - CAST(f.cw AS DATE)) // 7 AS offset_weeks
        FROM events e JOIN first_week f ON f.user_id = e.user_id
    )
    SELECT CAST(cw AS DATE) AS cohort_week,
           CAST(offset_weeks AS INTEGER) AS offset_weeks,
           count(*) AS n_users
    FROM active GROUP BY cw, offset_weeks
    """,
    "weekly cohort retention matrix (first-activity cohort x offset week)",
)
def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort analysis, shuffle-minimal: the per-user first week and the
    (user, week) activity dedup share the user_id exchange; offsets are
    exact integer day arithmetic (epoch days / 7 — no interval or float
    week math), so the matrix is engine-exact."""
    events = load_table(spark, sf_dir, "events").select("user_id", "ts")
    wk = F.date_trunc("week", F.col("ts"))
    first = events.groupBy("user_id").agg(F.min(wk).alias("cw"))
    active = (
        events.join(first, "user_id")
        .select(
            "user_id",
            "cw",
            (
                (F.unix_date(wk.cast("date")) - F.unix_date(F.col("cw").cast("date")))
                / 7
            ).cast("int").alias("offset_weeks"),
        )
        .distinct()
    )
    return active.groupBy(
        F.col("cw").cast("date").alias("cohort_week"), "offset_weeks"
    ).agg(F.count(F.lit(1)).alias("n_users"))
