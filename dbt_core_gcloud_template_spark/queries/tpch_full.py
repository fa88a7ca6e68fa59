"""Remaining TPC-H-shaped queries (q8 q9 q13 q15 q17 q20 q21) adapted
to the driver testdata schema, completing the 22-query decision-support
suite alongside ``relational.py`` / ``tpch_more.py``.

Like the rest of the suite these widen the SURVEY.md §2 "Spark provides
natively, engine must not block" surface (the reference delegates all
relational execution to BigQuery — SURVEY.md §2.3/§2.4): market-share
ratio-of-conditional-sums (q8), multi-fact star join with derived
profit (q9), outer-join histogram / double aggregation (q13),
scalar-subquery max against a derived revenue view (q15), correlated
per-group threshold rewritten as an exact integer-arithmetic join
(q17), semi-join against a HAVING-filtered aggregate (q20), and the
EXISTS / NOT-EXISTS double-correlation (q21) planned as left-semi +
left-anti joins.

Adaptations forced by the testdata schema (TESTDATA.md: no partsupp,
no commit/receipt dates, no comments): q9 derives cost from
``p_retailprice * l_quantity``; q13 filters on ``o_orderpriority``
instead of the comment regex; q17/q20 use ``p_type`` / ``p_name``
predicates that exist here; q21 defines "late" as
``l_shipdate > o_orderdate + 60 days``.

Determinism recipe (same as the rest of the suite): money sums go
through DECIMAL(18,2); ratios divide two exact decimal sums cast to
DOUBLE; q17's correlated ``qty < 0.2*avg(qty)`` threshold is rewritten
``5*qty*cnt < sum_qty`` so both engines compare exact decimals instead
of a floating-point average; every LIMIT has a total ORDER BY with a
unique tiebreaker.

Scale notes (100 TB): fixed-cardinality dims (nation=25, region=5) are
explicitly broadcast; customer/supplier/part join strategy is left to
AQE.  q17/q21's per-group lookaside aggregates shuffle once on the
same key as the main join (co-located by Catalyst); q15's scalar max
is a 1-row broadcast cross join, never a global window sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.registry import load_table
from . import register


def _dec(col: str | F.Column, p: int = 18, s: int = 2) -> F.Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({p},{s})")


def _ts(s: str) -> F.Column:
    return F.lit(s).cast("timestamp")


_REV = "CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))"


# ---------------------------------------------------------------------------
# q8 — national market share: one nation's share of a region's market for
# one part type, by order year.  Ratio of two conditional decimal sums;
# both sums are exact, cast to double only for the final division.
# ---------------------------------------------------------------------------
@register(
    "q8_market_share",
    oracle=f"""
    SELECT o_year,
           CAST(round(CAST(sum(CASE WHEN nation = 'NATION_1' THEN volume
                                    ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
                      / CAST(sum(volume) AS DOUBLE), 4) AS DOUBLE) AS mkt_share
    FROM (
        SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
               {_REV} AS volume,
               n2.n_name AS nation
        FROM lineitem l
        JOIN part p     ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1  ON n1.n_nationkey = c.c_nationkey
        JOIN region r   ON r.r_regionkey = n1.n_regionkey
        JOIN nation n2  ON n2.n_nationkey = s.s_nationkey
        WHERE r.r_name = 'EUROPE'
          AND p.p_type = 'ECONOMY'
          AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    ) all_nations
    GROUP BY o_year
    ORDER BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < _ts("1998-01-01 00:00:00"))
    )
    c = load_table(spark, sf_dir, "customer")
    n1 = load_table(spark, sf_dir, "nation")
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("nation")
    )
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    vol = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    all_nations = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(p, l.l_partkey == p.p_partkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), c.c_nationkey == n1.n_nationkey)
        .join(F.broadcast(r), n1.n_regionkey == r.r_regionkey)
        .join(F.broadcast(n2), s.s_nationkey == F.col("s_nkey"))
        .select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            vol.alias("volume"),
            F.col("nation"),
        )
    )
    zero = F.lit(0).cast("decimal(18,2)")
    return (
        all_nations.groupBy("o_year")
        .agg(
            F.round(
                F.sum(F.when(F.col("nation") == "NATION_1", F.col("volume")).otherwise(zero))
                .cast("double")
                / F.sum("volume").cast("double"),
                4,
            )
            .cast("double")
            .alias("mkt_share")
        )
        .orderBy("o_year")
    )


# ---------------------------------------------------------------------------
# q9 — product-type profit by supplier nation and year.  The testdata has
# no partsupp, so cost is derived from the part list price
# (p_retailprice * quantity) rather than ps_supplycost.
# ---------------------------------------------------------------------------
@register(
    "q9_product_profit",
    oracle=f"""
    SELECT nation, o_year, CAST(round(sum(amount), 2) AS DOUBLE) AS sum_profit
    FROM (
        SELECT n.n_name AS nation,
               CAST(year(o.o_orderdate) AS INT) AS o_year,
               {_REV} - CAST(p.p_retailprice AS DECIMAL(18,2))
                        * CAST(l.l_quantity AS DECIMAL(18,2)) AS amount
        FROM lineitem l
        JOIN part p     ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN nation n   ON n.n_nationkey = s.s_nationkey
        WHERE p.p_name LIKE '%gear%'
    ) profit
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%"))
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    rev = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    amount = rev - _dec("p_retailprice") * _dec("l_quantity")
    profit = (
        l.join(p, l.l_partkey == p.p_partkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
            amount.alias("amount"),
        )
    )
    return (
        profit.groupBy("nation", "o_year")
        .agg(F.round(F.sum("amount"), 2).cast("double").alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


# ---------------------------------------------------------------------------
# q13 — customer order-count distribution: LEFT OUTER join with an extra
# ON-clause predicate, then a histogram of per-customer counts (double
# aggregation).  count(o_orderkey) counts matches only — customers with
# no qualifying orders land in the c_count=0 bucket.
# ---------------------------------------------------------------------------
@register(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM (
        SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
        FROM customer c
        LEFT JOIN orders o
          ON c.c_custkey = o.o_custkey
         AND o.o_orderpriority <> '1-URGENT'
        GROUP BY c.c_custkey
    ) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    c_orders = (
        c.join(
            o,
            (c.c_custkey == o.o_custkey) & (o.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").cast("bigint").alias("c_count"))
    )
    return (
        c_orders.groupBy("c_count")
        .agg(F.count("*").cast("bigint").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


# ---------------------------------------------------------------------------
# q15 — top supplier(s) by quarterly revenue: derived revenue view +
# scalar-subquery max.  The max is an exact decimal compared pre-rounding;
# Spark side broadcasts the 1-row max (no global window sort).
# ---------------------------------------------------------------------------
@register(
    "q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no, sum({_REV}) AS total_rev
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name,
           CAST(round(r.total_rev, 2) AS DOUBLE) AS total_revenue
    FROM supplier s
    JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_rev = (SELECT max(total_rev) FROM revenue)
    ORDER BY s.s_suppkey
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1996-04-01 00:00:00"))
    )
    rev = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    revenue = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(rev).alias("total_rev")
    )
    max_rev = revenue.agg(F.max("total_rev").alias("max_rev"))
    s = load_table(spark, sf_dir, "supplier")
    return (
        revenue.join(F.broadcast(max_rev), F.col("total_rev") == F.col("max_rev"))
        .join(s, F.col("supplier_no") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.round("total_rev", 2).cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# q17 — small-quantity-order revenue.  The correlated
# ``l_quantity < 0.2 * avg(l_quantity) per part`` threshold is rewritten
# as exact integer-ish arithmetic: 5*qty*cnt < sum_qty (decimals on both
# sides), so no floating-point average can flip a boundary row in either
# engine.  The lookaside aggregate shuffles on l_partkey, the same key
# as the main join — one co-located exchange.
# ---------------------------------------------------------------------------
@register(
    "q17_small_qty_revenue",
    oracle="""
    SELECT CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) / 7.0, 2)
                AS DOUBLE) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN (
        SELECT l_partkey, CAST(count(*) AS BIGINT) AS cnt,
               sum(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty
        FROM lineitem
        GROUP BY l_partkey
    ) a ON a.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#1'
      AND p.p_type = 'SMALL'
      AND 5 * CAST(l.l_quantity AS DECIMAL(18,2)) * a.cnt < a.sum_qty
    """,
)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#1") & (F.col("p_type") == "SMALL")
    )
    agg = l.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        F.count("*").cast("bigint").alias("cnt"),
        F.sum(_dec("l_quantity")).alias("sum_qty"),
    )
    joined = (
        l.join(p, l.l_partkey == p.p_partkey)
        .join(agg, l.l_partkey == F.col("a_partkey"))
        .filter(F.lit(5) * _dec("l_quantity") * F.col("cnt") < F.col("sum_qty"))
    )
    return joined.agg(
        (F.round(F.sum(_dec("l_extendedprice")) / F.lit(7.0), 2))
        .cast("double")
        .alias("avg_yearly")
    )


# ---------------------------------------------------------------------------
# q20 — part-promotion suppliers: semi-join against a HAVING-filtered
# aggregate (suppliers who shipped > 300 units of 'red%' parts in 1996).
# Catalyst plans the IN-subquery as a left-semi hash join.
# ---------------------------------------------------------------------------
@register(
    "q20_promotion_suppliers",
    oracle="""
    SELECT s.s_suppkey, s.s_name
    FROM supplier s
    WHERE s.s_suppkey IN (
        SELECT l.l_suppkey
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_name LIKE 'red%'
          AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY l.l_suppkey
        HAVING sum(CAST(l.l_quantity AS DECIMAL(18,2))) > 300
    )
    ORDER BY s.s_suppkey
    """,
)
def q20_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1997-01-01 00:00:00"))
    )
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("red%"))
    heavy = (
        l.join(p, l.l_partkey == p.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum(_dec("l_quantity")).alias("sum_qty"))
        .filter(F.col("sum_qty") > 300)
    )
    s = load_table(spark, sf_dir, "supplier")
    return (
        s.join(heavy, s.s_suppkey == heavy.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# q21 — suppliers who kept orders waiting: the double correlation
# (EXISTS another supplier on the order / NOT EXISTS another *late*
# supplier on the order) becomes left-semi + left-anti joins against the
# same lineitem scan.  "Late" = shipped more than 60 days after the
# order date (testdata has no commit/receipt dates).
# ---------------------------------------------------------------------------
@register(
    "q21_waiting_suppliers",
    oracle="""
    SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o    ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey
            AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (
          SELECT 1 FROM lineitem l3
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 20
    """,
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = load_table(spark, sf_dir, "supplier")
    late_cut = F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")

    l1 = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > late_cut)
        .select(
            F.col("l_orderkey").alias("k1_orderkey"),
            F.col("l_suppkey").alias("k1_suppkey"),
            F.col("o_orderdate").alias("k1_orderdate"),
        )
    )
    l2 = l.select(
        F.col("l_orderkey").alias("k2_orderkey"),
        F.col("l_suppkey").alias("k2_suppkey"),
        F.col("l_shipdate").alias("k2_shipdate"),
    )
    # EXISTS: some other supplier on the same order
    with_other = l1.join(
        l2,
        (F.col("k1_orderkey") == F.col("k2_orderkey"))
        & (F.col("k1_suppkey") != F.col("k2_suppkey")),
        "left_semi",
    )
    # NOT EXISTS: no other *late* supplier on the same order
    only_late = with_other.join(
        l2,
        (F.col("k1_orderkey") == F.col("k2_orderkey"))
        & (F.col("k1_suppkey") != F.col("k2_suppkey"))
        & (F.col("k2_shipdate") > F.col("k1_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_anti",
    )
    return (
        only_late.join(s, F.col("k1_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").cast("bigint").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )
