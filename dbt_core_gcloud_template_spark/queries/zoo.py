"""Function-zoo coverage queries (SURVEY §2.5/§2.8): the reference
exercises almost no scalar/window surface itself (BigQuery supplied
it); these queries demonstrate the engine doesn't block the breadth a
reference user would carry over — window analytics (lag/lead/ntile/
percent_rank/cume_dist), date/time arithmetic, and string functions —
each hash-checked against DuckDB."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.registry import load_table
from . import register


# ---------------------------------------------------------------------------
# window_analytics — lag/lead/ntile/percent_rank/cume_dist over each
# customer's order history.  One shuffle on o_custkey serves every
# window (same partitioning reused).
# ---------------------------------------------------------------------------
@register(
    "window_analytics",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(round(o_totalprice, 2) AS DOUBLE) AS price,
           CAST(round(lag(o_totalprice) OVER w, 2) AS DOUBLE) AS prev_price,
           CAST(round(lead(o_totalprice) OVER w, 2) AS DOUBLE) AS next_price,
           CAST(ntile(4) OVER w AS INT) AS quartile,
           CAST(round(percent_rank() OVER w, 6) AS DOUBLE) AS pct_rank,
           CAST(round(cume_dist() OVER w, 6) AS DOUBLE) AS cume,
           CAST(date_diff('day', lag(o_orderdate) OVER w, o_orderdate) AS BIGINT)
               AS days_since_prev
    FROM orders
    WHERE o_custkey % 100 = 0
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def window_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") % 100 == 0)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round("o_totalprice", 2).cast("double").alias("price"),
        F.round(F.lag("o_totalprice").over(w), 2).cast("double").alias("prev_price"),
        F.round(F.lead("o_totalprice").over(w), 2).cast("double").alias("next_price"),
        F.ntile(4).over(w).cast("int").alias("quartile"),
        F.round(F.percent_rank().over(w), 6).cast("double").alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).cast("double").alias("cume"),
        F.datediff(
            F.col("o_orderdate"), F.lag("o_orderdate").over(w)
        ).cast("bigint").alias("days_since_prev"),
    )


# ---------------------------------------------------------------------------
# date_functions_zoo — date/time arithmetic breadth on order dates.
# ---------------------------------------------------------------------------
@register(
    "date_functions_zoo",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderdate + INTERVAL 30 DAY AS TIMESTAMP) AS due_date,
           CAST(last_day(o_orderdate) AS DATE) AS month_end,
           CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow,  -- DuckDB Sunday=0, Spark Sunday=1
           CAST(weekofyear(o_orderdate) AS INT) AS week,
           CAST(quarter(o_orderdate) AS INT) AS qtr,
           CAST(dayofyear(o_orderdate) AS INT) AS doy,
           CAST(date_diff('day', o_orderdate,
                          TIMESTAMP '2000-01-01 00:00:00') AS BIGINT) AS days_to_y2k,
           strftime(o_orderdate, '%Y-%m') AS ym
    FROM orders WHERE o_orderkey % 50 = 0
    """,
)
def date_functions_zoo(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 50 == 0)
    return o.select(
        "o_orderkey",
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("due_date"),
        F.last_day("o_orderdate").alias("month_end"),
        F.dayofweek("o_orderdate").cast("int").alias("dow"),
        F.weekofyear("o_orderdate").cast("int").alias("week"),
        F.quarter("o_orderdate").cast("int").alias("qtr"),
        F.dayofyear("o_orderdate").cast("int").alias("doy"),
        F.datediff(
            F.lit("2000-01-01").cast("date"), F.col("o_orderdate").cast("date")
        ).cast("bigint").alias("days_to_y2k"),
        F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
    )


# ---------------------------------------------------------------------------
# string_functions_zoo — string-function breadth on part names.
# ---------------------------------------------------------------------------
@register(
    "string_functions_zoo",
    oracle="""
    SELECT p_partkey,
           upper(p_name) AS name_upper,
           CAST(length(p_name) AS INT) AS name_len,
           lpad(p_brand, 12, '.') AS brand_padded,
           replace(p_name, ' ', '_') AS name_snake,
           reverse(p_type) AS type_rev,
           substr(p_name, 1, 4) AS name_prefix,
           regexp_extract(p_name, '([a-z]+)$', 1) AS last_word,
           CAST(contains(p_name, 'widget') AS BOOLEAN) AS is_widget,
           CAST(strpos(p_name, ' ') AS INT) AS first_space,
           repeat(p_brand[-1], 3) AS brand_tail3
    FROM part WHERE p_partkey % 20 = 0
    """,
)
def string_functions_zoo(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") % 20 == 0)
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.length("p_name").cast("int").alias("name_len"),
        F.lpad("p_brand", 12, ".").alias("brand_padded"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_snake"),
        F.reverse("p_type").alias("type_rev"),
        F.substring("p_name", 1, 4).alias("name_prefix"),
        F.regexp_extract("p_name", r"([a-z]+)$", 1).alias("last_word"),
        F.col("p_name").contains("widget").alias("is_widget"),
        F.instr("p_name", " ").cast("int").alias("first_space"),
        F.repeat(F.substring(F.col("p_brand"), -1, 1), 3).alias("brand_tail3"),
    )


# ---------------------------------------------------------------------------
# grouping_sets_orders — explicit GROUPING SETS + grouping() markers
# (beyond the rollup/cube queries): per (status, priority), per status,
# and grand total in one pass — Catalyst expands to a single Expand +
# aggregate, not three scans.
# ---------------------------------------------------------------------------
@register(
    "grouping_sets_orders",
    oracle="""
    SELECT coalesce(o_orderstatus, 'ALL') AS status,
           coalesce(o_orderpriority, 'ALL') AS priority,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE)
               AS total_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
    ORDER BY status, priority
    """,
)
def grouping_sets_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("_gs_orders")
    return spark.sql(
        """
        SELECT coalesce(o_orderstatus, 'ALL') AS status,
               coalesce(o_orderpriority, 'ALL') AS priority,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE)
                   AS total_price
        FROM _gs_orders
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
        ORDER BY status, priority
        """
    )


# ---------------------------------------------------------------------------
# correlated_above_avg_customers — correlated scalar subquery through
# SQL passthrough: customers above their nation's average balance.
# Catalyst decorrelates this into a join against the per-nation
# aggregate (no per-row subquery execution).
# ---------------------------------------------------------------------------
@register(
    "correlated_above_avg_customers",
    oracle="""
    SELECT n.n_name AS nation, CAST(count(*) AS BIGINT) AS n_above_avg
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE c.c_acctbal > (SELECT avg(c2.c_acctbal) FROM customer c2
                         WHERE c2.c_nationkey = c.c_nationkey)
    GROUP BY n.n_name
    ORDER BY n.n_name
    """,
)
def correlated_above_avg_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("_cs_customer")
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("_cs_nation")
    return spark.sql(
        """
        SELECT n.n_name AS nation, CAST(count(*) AS BIGINT) AS n_above_avg
        FROM _cs_customer c JOIN _cs_nation n ON c.c_nationkey = n.n_nationkey
        WHERE c.c_acctbal > (SELECT avg(c2.c_acctbal) FROM _cs_customer c2
                             WHERE c2.c_nationkey = c.c_nationkey)
        GROUP BY n.n_name
        ORDER BY n.n_name
        """
    )
