"""Extended relational coverage: TPC-H-shaped queries adapted to the
driver testdata schema (no partsupp; trimmed column set — TESTDATA.md).

These widen the SURVEY.md §2 "Spark provides natively, engine must not
block" surface with the canonical decision-support shapes: semi/anti
joins (EXISTS / NOT IN / NOT EXISTS), correlated-subquery rewrites,
scalar-subquery thresholds, disjunctive predicates, conditional
aggregation, HAVING, count-distinct, and CUBE grouping sets.

Determinism recipe (same as relational.py): money terms go through
DECIMAL(18,2) so sums are exact and order-independent in both engines,
then ROUND and CAST to DOUBLE; counts CAST to BIGINT; every LIMIT has a
total ORDER BY with a unique tiebreaker.

Scale notes (100 TB): only fixed-cardinality dims (nation=25, region=5)
are explicitly broadcast — customer/supplier/part grow with SF, so
their join strategy is left to AQE (broadcast when under threshold at
runtime, sort-merge otherwise).  Semi/anti joins are expressed as
``left_semi``/``left_anti`` so Catalyst can plan them as such rather
than materializing distinct sets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.registry import load_table
from . import register


def _dec(col: str | F.Column, p: int = 18, s: int = 2) -> F.Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({p},{s})")


def _ts(s: str) -> F.Column:
    return F.lit(s).cast("timestamp")


_REV = "CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))"


# ---------------------------------------------------------------------------
# q4 — order-priority check: EXISTS semi-join with a cross-table predicate
# (l_shipdate > o_orderdate stands in for commit<receipt; testdata has no
# commit/receipt dates).  Catalyst plans this as a left-semi hash join.
# ---------------------------------------------------------------------------
@register(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate)
    GROUP BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < _ts("1997-01-01 00:00:00"))
    )
    l = load_table(spark, sf_dir, "lineitem")
    semi = o.join(
        l,
        (o.o_orderkey == l.l_orderkey) & (l.l_shipdate > o.o_orderdate),
        "left_semi",
    )
    return semi.groupBy("o_orderpriority").agg(
        F.count("*").cast("bigint").alias("order_count")
    )


# ---------------------------------------------------------------------------
# q6 — revenue forecast: single-table filtered aggregate.  The whole WHERE
# clause reaches the parquet scan as PushedFilters; the agg is a single
# partial+final sum with no shuffle of data rows.
# ---------------------------------------------------------------------------
@register(
    "q6_revenue_forecast",
    oracle="""
    SELECT CAST(round(coalesce(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                                   * CAST(l_discount AS DECIMAL(18,2))), 0), 2)
                AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.02 AND 0.06
      AND l_quantity < 24
    """,
)
def q6_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1997-01-01 00:00:00"))
        & (F.col("l_discount") >= 0.02)
        & (F.col("l_discount") <= 0.06)
        & (F.col("l_quantity") < 24)
    )
    return l.agg(
        F.round(F.coalesce(F.sum(_dec("l_extendedprice") * _dec("l_discount")), F.lit(0)), 2)
        .cast("double")
        .alias("revenue")
    )


# ---------------------------------------------------------------------------
# q7 — bilateral trade volume: supplier-nation ↔ customer-nation pairs by
# ship year.  Nation joined twice (aliased); both sides broadcast (25 rows
# at any SF).
# ---------------------------------------------------------------------------
@register(
    "q7_nation_volume",
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS INT) AS ship_year,
           CAST(round(sum({_REV}), 2) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
    WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
       OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    GROUP BY n1.n_name, n2.n_name, year(l.l_shipdate)
    """,
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    j = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    rev = F.round(F.sum(_dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))), 2)
    return j.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").cast("int").alias("ship_year")
    ).agg(rev.cast("double").alias("revenue"))


# ---------------------------------------------------------------------------
# q10 — returned-item report: 4-way join + agg + deterministic top-20.
# ---------------------------------------------------------------------------
@register(
    "q10_returned_items",
    oracle=f"""
    SELECT c.c_custkey, c.c_name, c.c_acctbal, n.n_name,
           CAST(round(sum({_REV}), 2) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-10-01 00:00:00"))
        & (F.col("o_orderdate") < _ts("1997-01-01 00:00:00"))
    )
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    j = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
    )
    rev = F.round(F.sum(_dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))), 2)
    return (
        j.groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(rev.cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# q12 — late-shipment priority split: join + conditional (CASE) aggregation
# by ship year.
# ---------------------------------------------------------------------------
@register(
    "q12_late_priority",
    oracle="""
    SELECT CAST(year(l.l_shipdate) AS INT) AS ship_year,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT','2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT','2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate > o.o_orderdate
    GROUP BY year(l.l_shipdate)
    """,
)
def q12_late_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    j = l.join(o, (l.l_orderkey == o.o_orderkey) & (l.l_shipdate > o.o_orderdate))
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return j.groupBy(F.year("l_shipdate").cast("int").alias("ship_year")).agg(
        F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
        F.sum(F.when(~high, 1).otherwise(0)).cast("bigint").alias("low_line_count"),
    )


# ---------------------------------------------------------------------------
# q14 — promo revenue share: conditional aggregation ratio (testdata p_type
# domain is PROMO/ECONOMY/…, no second word).
# ---------------------------------------------------------------------------
@register(
    "q14_promo_revenue",
    oracle=f"""
    SELECT CAST(round(100.0 * CAST(sum(CASE WHEN p.p_type = 'PROMO'
                                            THEN {_REV} END) AS DOUBLE)
                            / CAST(sum({_REV}) AS DOUBLE), 4) AS DOUBLE)
               AS promo_share_pct
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1996-10-01 00:00:00'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-09-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1996-10-01 00:00:00"))
    )
    p = load_table(spark, sf_dir, "part")
    vol = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    j = l.join(p, l.l_partkey == p.p_partkey)
    return j.agg(
        F.round(
            F.lit(100.0)
            * F.sum(F.when(F.col("p_type") == "PROMO", vol)).cast("double")
            / F.sum(vol).cast("double"),
            4,
        )
        .cast("double")
        .alias("promo_share_pct")
    )


# ---------------------------------------------------------------------------
# q16 — supplier count by part attributes: NOT-IN anti-join (suppliers in
# bad standing excluded) + COUNT(DISTINCT).  left_anti keeps the exclusion
# a join, not a collected list.
# ---------------------------------------------------------------------------
@register(
    "q16_supplier_cnt",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#5'
      AND p.p_size IN (1, 5, 9, 13, 17, 21, 25, 29, 33, 37, 41, 45, 49)
      AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
)
def q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29, 33, 37, 41, 45, 49)
    )
    bad = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    l = load_table(spark, sf_dir, "lineitem").join(
        bad, F.col("l_suppkey") == F.col("s_suppkey"), "left_anti"
    )
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").cast("bigint").alias("supplier_cnt"))
    )


# ---------------------------------------------------------------------------
# q18 — large-volume orders: HAVING over a grouped sum, then join back to
# orders/customer.  The HAVING set is tiny relative to lineitem, so the
# join back is AQE-broadcastable at runtime.
# ---------------------------------------------------------------------------
@register(
    "q18_large_orders",
    oracle="""
    WITH big AS (
      SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(18,2))) AS total_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 200
    )
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice,
           CAST(big.total_qty AS DOUBLE) AS total_qty
    FROM big
    JOIN orders o   ON o.o_orderkey = big.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 100
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity")).alias("total_qty_dec"))
        .filter(F.col("total_qty_dec") > 200)
    )
    return (
        big.join(o, o.o_orderkey == big.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            F.col("total_qty_dec").cast("double").alias("total_qty"),
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# q19 — disjunctive predicate revenue: OR-of-ANDs across two tables.
# Catalyst extracts the common l_partkey=p_partkey equi-condition and
# evaluates the disjunction as a post-join filter.
# ---------------------------------------------------------------------------
@register(
    "q19_disjunctive_rev",
    oracle=f"""
    SELECT CAST(round(coalesce(sum({_REV}), 0), 2) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_disjunctive_rev(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    j = l.join(p, l.l_partkey == p.p_partkey).filter(
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    rev = F.sum(_dec("l_extendedprice") * (F.lit(1) - _dec("l_discount")))
    return j.agg(
        F.round(F.coalesce(rev, F.lit(0)), 2).cast("double").alias("revenue")
    )


# ---------------------------------------------------------------------------
# q22 — idle rich customers: scalar-subquery threshold (exact decimal
# sum/count, not float avg — order-independent in both engines) + NOT
# EXISTS anti-join against orders.
# ---------------------------------------------------------------------------
@register(
    "q22_idle_customers",
    oracle="""
    WITH thr AS (
      SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*)
                 AS avg_bal
      FROM customer WHERE c_acctbal > 0
    )
    SELECT c.c_mktsegment, CAST(count(*) AS BIGINT) AS numcust,
           CAST(round(sum(CAST(c.c_acctbal AS DECIMAL(18,2))), 2) AS DOUBLE)
               AS totacctbal
    FROM customer c, thr
    WHERE c.c_acctbal > thr.avg_bal
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
    GROUP BY c.c_mktsegment
    """,
)
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rich customers with no *recent* orders (the date bound keeps the
    anti-join selective but non-empty at every test SF)."""
    c = load_table(spark, sf_dir, "customer")
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= _ts("1999-01-01 00:00:00"))
        .select("o_custkey")
    )
    thr = c.filter(F.col("c_acctbal") > 0).agg(
        (F.sum(_dec("c_acctbal")).cast("double") / F.count("*")).alias("avg_bal")
    )
    rich = c.join(F.broadcast(thr)).filter(F.col("c_acctbal") > F.col("avg_bal"))
    idle = rich.join(o, rich.c_custkey == o.o_custkey, "left_anti")
    return idle.groupBy("c_mktsegment").agg(
        F.count("*").cast("bigint").alias("numcust"),
        F.round(F.sum(_dec("c_acctbal")), 2).cast("double").alias("totacctbal"),
    )


# ---------------------------------------------------------------------------
# q2-shaped — cheapest supplier per part: the classic correlated-min
# subquery, rewritten as a window rank (one shuffle on partkey instead of a
# correlated rescan per row — the scale-correct plan).
# ---------------------------------------------------------------------------
@register(
    "q2_cheapest_supplier",
    oracle="""
    WITH offers AS (
      SELECT l_partkey, l_suppkey,
             min(CAST(l_extendedprice AS DECIMAL(18,2))) AS best_price
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ), ranked AS (
      SELECT l_partkey, l_suppkey, best_price,
             row_number() OVER (PARTITION BY l_partkey
                                ORDER BY best_price, l_suppkey) AS rn
      FROM offers
    )
    SELECT p.p_partkey, p.p_brand, s.s_name AS supplier_name,
           n.n_name AS supplier_nation,
           CAST(r.best_price AS DOUBLE) AS best_price
    FROM ranked r
    JOIN part p     ON p.p_partkey = r.l_partkey
    JOIN supplier s ON s.s_suppkey = r.l_suppkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    WHERE r.rn = 1 AND p.p_size < 10
    ORDER BY p.p_partkey
    LIMIT 100
    """,
)
def q2_cheapest_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") < 10)
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    offers = l.groupBy("l_partkey", "l_suppkey").agg(
        F.min(_dec("l_extendedprice")).alias("best_price_dec")
    )
    w = Window.partitionBy("l_partkey").orderBy("best_price_dec", "l_suppkey")
    best = offers.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return (
        best.join(p, p.p_partkey == best.l_partkey)
        .join(s, s.s_suppkey == best.l_suppkey)
        .join(F.broadcast(n), n.n_nationkey == s.s_nationkey)
        .select(
            "p_partkey",
            "p_brand",
            F.col("s_name").alias("supplier_name"),
            F.col("n_name").alias("supplier_nation"),
            F.col("best_price_dec").cast("double").alias("best_price"),
        )
        .orderBy("p_partkey")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# q11-shaped — important parts: grouped revenue vs a global-share scalar
# subquery threshold (exact decimal totals on both sides of the compare).
# ---------------------------------------------------------------------------
@register(
    "q11_important_parts",
    oracle=f"""
    WITH per AS (
      SELECT l_partkey, sum({_REV}) AS rev FROM lineitem GROUP BY l_partkey
    ), tot AS (SELECT CAST(sum(rev) AS DOUBLE) / count(*) AS avg_rev FROM per)
    SELECT per.l_partkey AS partkey,
           CAST(round(per.rev, 2) AS DOUBLE) AS part_revenue
    FROM per, tot
    WHERE CAST(per.rev AS DOUBLE) > tot.avg_rev * 1.5
    """,
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts whose revenue exceeds 1.5× the per-part average — a
    scale-invariant threshold (a fixed share-of-total empties out as the
    part count grows with SF)."""
    l = load_table(spark, sf_dir, "lineitem")
    vol = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    per = l.groupBy("l_partkey").agg(F.sum(vol).alias("rev"))
    tot = per.agg((F.sum("rev").cast("double") / F.count("*")).alias("avg_rev"))
    return (
        per.join(F.broadcast(tot))
        .filter(F.col("rev").cast("double") > F.col("avg_rev") * 1.5)
        .select(
            F.col("l_partkey").alias("partkey"),
            F.round("rev", 2).cast("double").alias("part_revenue"),
        )
    )


# ---------------------------------------------------------------------------
# cube_order_stats — CUBE grouping sets over status × priority (SURVEY
# §2.4's "don't block SQL passthrough" surface: ROLLUP is covered by
# rollup_customer_counts, CUBE here).
# ---------------------------------------------------------------------------
@register(
    "cube_order_stats",
    oracle="""
    SELECT coalesce(o_orderstatus, 'ALL') AS status,
           coalesce(o_orderpriority, 'ALL') AS priority,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE)
               AS total_price
    FROM orders
    GROUP BY CUBE(o_orderstatus, o_orderpriority)
    """,
)
def cube_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            F.round(F.sum(_dec("o_totalprice")), 2).cast("double").alias("total_price"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n_orders",
            "total_price",
        )
    )


# ---------------------------------------------------------------------------
# orders_monthly_backlog — interval-overlap aggregation: for each month
# M, how many orders were placed but not yet fully shipped (orderdate
# <= M's end < last lineitem shipdate)?  The scalable shape: per-order
# [start, end) intervals explode onto the month grid they overlap
# (bounded by the order's lifespan — a few rows per order, never a
# per-day×per-order cross join), then a month-keyed count.
# ---------------------------------------------------------------------------
@register(
    "orders_monthly_backlog",
    oracle="""
    WITH spans AS (
      SELECT o.o_orderkey,
             CAST(date_trunc('month', o.o_orderdate) AS DATE) AS m0,
             CAST(date_trunc('month', max(l.l_shipdate)) AS DATE) AS m1
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY o.o_orderkey, o.o_orderdate
      HAVING max(l.l_shipdate) > last_day(o.o_orderdate)
    ),
    grid AS (
      SELECT o_orderkey,
             CAST(unnest(generate_series(m0, m1 - INTERVAL 1 MONTH,
                                         INTERVAL 1 MONTH)) AS DATE) AS month
      FROM spans
    )
    SELECT month, CAST(count(*) AS BIGINT) AS open_orders
    FROM grid
    GROUP BY month
    """,
)
def orders_monthly_backlog(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    spans = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.max("l_shipdate").alias("last_ship"))
        .filter(F.col("last_ship") > F.last_day(F.col("o_orderdate")))
        .select(
            "o_orderkey",
            F.trunc(F.col("o_orderdate"), "month").alias("m0"),
            F.trunc(F.col("last_ship"), "month").alias("m1"),
        )
    )
    months = F.sequence(
        F.col("m0"), F.add_months(F.col("m1"), -1), F.expr("INTERVAL 1 MONTH")
    )
    return (
        spans.select(F.explode(months).alias("month"))
        .groupBy("month")
        .agg(F.count("*").cast("bigint").alias("open_orders"))
    )
