"""Reference-derived + relational coverage queries (SURVEY.md §2).

Each query cites the SURVEY §2 operator ids it demonstrates and the
reference site it derives from.  Spark side is DataFrame-API
(Catalyst-optimized, whole-stage codegen); the oracle is ANSI SQL for
DuckDB over the same parquet views.

Determinism rules used throughout:
- money/double aggregates go through DECIMAL(18,2) (exact, order
  independent), then ROUND(...,N) and CAST to DOUBLE;
- every LIMIT carries a total ORDER BY (unique tiebreaker);
- counts are CAST to BIGINT on both sides (DuckDB sum() yields
  HUGEINT otherwise).
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


# ---------------------------------------------------------------------------
# stg_example — reference models/staging/stg_example.sql:4-9 (S1,P1,P3,P4).
# TPC-H mapping per FIXTURES.md F1: orders → raw.example.
# ---------------------------------------------------------------------------
@register(
    "stg_example",
    oracle="""
    SELECT o_orderkey AS id,
           CAST(CAST(o_orderdate AS VARCHAR) AS TIMESTAMP) AS created_at_ts,
           CAST(CAST(o_totalprice AS DECIMAL(38,9)) AS DOUBLE) AS value
    FROM orders
    """,
)
def stg_example(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection + alias + CAST-from-string (the raw source arrives with a
    string timestamp; reference stg_example.sql:8).

    The DECIMAL(38,9) staging cast is exercised internally but the final
    projection emits DOUBLE: raw Decimal outputs canonicalize differently
    between Spark and DuckDB client libraries (round-1 hash mismatch)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        F.col("o_orderkey").alias("id"),
        F.col("o_orderdate").cast("string").cast("timestamp").alias("created_at_ts"),
        F.col("o_totalprice").cast("decimal(38,9)").cast("double").alias("value"),
    )


# ---------------------------------------------------------------------------
# fct_example — reference models/marts/fct_example.sql:8-12 (P5,P6 CASE).
# ---------------------------------------------------------------------------
@register(
    "fct_example",
    oracle="""
    SELECT id, value, created_at_ts,
           CASE WHEN value > 100 THEN 'high' ELSE 'regular' END AS bucket
    FROM (
        SELECT o_orderkey AS id,
               CAST(CAST(o_totalprice AS DECIMAL(38,9)) AS DOUBLE) AS value,
               CAST(CAST(o_orderdate AS VARCHAR) AS TIMESTAMP) AS created_at_ts
        FROM orders
    )
    """,
)
def fct_example(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN bucketing over the staged model (fct_example.sql:12)."""
    stg = stg_example(spark, sf_dir)
    return stg.select(
        "id",
        "value",
        "created_at_ts",
        F.when(F.col("value") > 100, F.lit("high")).otherwise("regular").alias("bucket"),
    )


def _dev_prod(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """Synthesized dev/prod pair with known drift (FIXTURES.md F5)."""
    base = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("id"), _dec("o_totalprice").alias("value")
    )
    dev = base.filter(F.col("id") % 100 != 0)
    prod = base.filter(F.col("id") % 97 != 0)
    return dev, prod


_DEV_PROD_SQL = """
    base AS (SELECT o_orderkey AS id, CAST(o_totalprice AS DECIMAL(18,2)) AS value
             FROM orders),
    dev  AS (SELECT * FROM base WHERE id % 100 <> 0),
    prod AS (SELECT * FROM base WHERE id % 97 <> 0)
"""


# ---------------------------------------------------------------------------
# data_diff_rows — reference macros/compare_dev_prod.sql:97-114 (E14: J1 anti
# semi-join via EXCEPT DISTINCT, U1, U2, P8 tag-column injection).
# ---------------------------------------------------------------------------
@register(
    "data_diff_rows",
    oracle=f"""
    WITH {_DEV_PROD_SQL}
    SELECT diff_type, id, CAST(value AS DOUBLE) AS value FROM (
      SELECT 'in_dev_not_in_prod' AS diff_type, *
      FROM (SELECT * FROM dev EXCEPT SELECT * FROM prod)
      UNION ALL
      SELECT 'in_prod_not_in_dev' AS diff_type, *
      FROM (SELECT * FROM prod EXCEPT SELECT * FROM dev)
    )
    """,
)
def data_diff_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric EXCEPT DISTINCT diff with diff_type tag.

    Written as the *intended* `(A∖B) ∪ (B∖A)` rather than the reference's
    left-associative chained text (SURVEY §2.7 U3).  Catalyst plans EXCEPT
    as a left-anti hash aggregate join.  The EXCEPT runs on exact
    DECIMAL(18,2); the final projection emits DOUBLE (Decimal outputs
    canonicalize differently across clients — round-1 hash mismatch).
    """
    dev, prod = _dev_prod(spark, sf_dir)
    left = dev.subtract(prod).select(F.lit("in_dev_not_in_prod").alias("diff_type"), "*")
    right = prod.subtract(dev).select(F.lit("in_prod_not_in_dev").alias("diff_type"), "*")
    return left.unionByName(right).withColumn("value", F.col("value").cast("double"))


# ---------------------------------------------------------------------------
# data_diff_counts — reference macros/compare_dev_prod.sql:79-95 (A1,A2,A3:
# scalar counts incl. counts over derived EXCEPT sets, one summary row).
# ---------------------------------------------------------------------------
@register(
    "data_diff_counts",
    oracle=f"""
    WITH {_DEV_PROD_SQL}
    SELECT (SELECT count(*) FROM dev) AS dev_count,
           (SELECT count(*) FROM prod) AS prod_count,
           (SELECT count(*) FROM (SELECT * FROM dev EXCEPT SELECT * FROM prod))
               AS dev_not_in_prod,
           (SELECT count(*) FROM (SELECT * FROM prod EXCEPT SELECT * FROM dev))
               AS prod_not_in_dev
    """,
)
def data_diff_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    dev, prod = _dev_prod(spark, sf_dir)
    return (
        dev.agg(F.count("*").alias("dev_count"))
        .crossJoin(prod.agg(F.count("*").alias("prod_count")))
        .crossJoin(dev.subtract(prod).agg(F.count("*").alias("dev_not_in_prod")))
        .crossJoin(prod.subtract(dev).agg(F.count("*").alias("prod_not_in_dev")))
    )


# ---------------------------------------------------------------------------
# unique_test — dbt `unique` generic test semantics (A4; reference
# models/staging/stg_example.yml:5-6).  Scale note: short-circuits to an
# aggregate, never collects violating rows.
# ---------------------------------------------------------------------------
@register(
    "unique_test",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS violations,
           CAST(coalesce(sum(n), 0) AS BIGINT) AS duplicate_rows
    FROM (SELECT l_orderkey, count(*) AS n FROM lineitem
          GROUP BY l_orderkey HAVING count(*) > 1)
    """,
)
def unique_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    dupes = li.groupBy("l_orderkey").agg(F.count("*").alias("n")).filter(F.col("n") > 1)
    return dupes.agg(
        F.count("*").alias("violations"),
        F.coalesce(F.sum("n"), F.lit(0)).cast("bigint").alias("duplicate_rows"),
    )


# ---------------------------------------------------------------------------
# not_null_test — dbt `not_null` generic test (A5; fct_example.yml:5-6).
# ---------------------------------------------------------------------------
@register(
    "not_null_test",
    oracle="""
    SELECT CAST(sum(CASE WHEN c_custkey  IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_custkey,
           CAST(sum(CASE WHEN c_name     IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_name,
           CAST(sum(CASE WHEN c_acctbal  IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_acctbal,
           CAST(count(*) AS BIGINT) AS total_rows
    FROM customer
    """,
)
def not_null_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")

    def nulls(col: str, alias: str) -> F.Column:
        return (
            F.sum(F.when(F.col(col).isNull(), 1).otherwise(0)).cast("bigint").alias(alias)
        )

    return c.agg(
        nulls("c_custkey", "null_custkey"),
        nulls("c_name", "null_name"),
        nulls("c_acctbal", "null_acctbal"),
        F.count("*").alias("total_rows"),
    )


# ---------------------------------------------------------------------------
# freshness — dbt source-freshness (A6; reference src_example.yml:9-13,
# entrypoint.sh:77-105).  Anchor pinned for determinism; prod uses now().
# ---------------------------------------------------------------------------
_FRESHNESS_ANCHOR = "2024-02-15 00:00:00"


@register(
    "freshness",
    oracle=f"""
    SELECT max(ts) AS max_loaded_at,
           CAST(floor((epoch(TIMESTAMP '{_FRESHNESS_ANCHOR}')
                       - floor(epoch(max(ts)))) / 3600) AS BIGINT) AS age_hours,
           CASE
             WHEN epoch(TIMESTAMP '{_FRESHNESS_ANCHOR}') - floor(epoch(max(ts))) > 72*3600
               THEN 'error'
             WHEN epoch(TIMESTAMP '{_FRESHNESS_ANCHOR}') - floor(epoch(max(ts))) > 24*3600
               THEN 'warn'
             ELSE 'pass'
           END AS status
    FROM events
    """,
)
def freshness(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    anchor = F.unix_timestamp(F.lit(_FRESHNESS_ANCHOR).cast("timestamp"))
    agg = e.agg(F.max("ts").alias("max_loaded_at"))
    age_sec = anchor - F.unix_timestamp(F.col("max_loaded_at"))
    return agg.select(
        "max_loaded_at",
        F.floor(age_sec / 3600).cast("bigint").alias("age_hours"),
        F.when(age_sec > 72 * 3600, "error")
        .when(age_sec > 24 * 3600, "warn")
        .otherwise("pass")
        .alias("status"),
    )


# ---------------------------------------------------------------------------
# q1_pricing_summary — TPC-H Q1 shape: the canonical wide aggregate
# (A: multi-aggregate groupBy; P6 date filter pushed to the parquet scan).
# ---------------------------------------------------------------------------
@register(
    "q1_pricing_summary",
    oracle="""
    WITH li AS (
      SELECT l_returnflag, l_linestatus,
             CAST(l_quantity AS DECIMAL(18,2)) AS qty,
             CAST(l_extendedprice AS DECIMAL(18,2)) AS price,
             CAST(l_discount AS DECIMAL(18,2)) AS disc,
             CAST(l_tax AS DECIMAL(18,2)) AS tax
      FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    )
    SELECT l_returnflag, l_linestatus,
           CAST(round(sum(qty), 2) AS DOUBLE) AS sum_qty,
           CAST(round(sum(price), 2) AS DOUBLE) AS sum_base_price,
           CAST(round(sum(price * (1 - disc)), 2) AS DOUBLE) AS sum_disc_price,
           CAST(round(sum(price * (1 - disc) * (1 + tax)), 2) AS DOUBLE) AS sum_charge,
           CAST(round(CAST(sum(qty) AS DOUBLE) / count(*), 6) AS DOUBLE) AS avg_qty,
           CAST(round(CAST(sum(price) AS DOUBLE) / count(*), 6) AS DOUBLE) AS avg_price,
           CAST(round(CAST(sum(disc) AS DOUBLE) / count(*), 6) AS DOUBLE) AS avg_disc,
           CAST(count(*) AS BIGINT) AS count_order
    FROM li GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .select(
            "l_returnflag",
            "l_linestatus",
            _dec("l_quantity").alias("qty"),
            _dec("l_extendedprice").alias("price"),
            _dec("l_discount").alias("disc"),
            _dec("l_tax").alias("tax"),
        )
    )
    cnt = F.count("*")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("qty"), 2).cast("double").alias("sum_qty"),
        F.round(F.sum("price"), 2).cast("double").alias("sum_base_price"),
        F.round(F.sum(F.col("price") * (F.lit(1) - F.col("disc"))), 2)
        .cast("double")
        .alias("sum_disc_price"),
        F.round(
            F.sum(F.col("price") * (F.lit(1) - F.col("disc")) * (F.lit(1) + F.col("tax"))), 2
        )
        .cast("double")
        .alias("sum_charge"),
        F.round(F.sum("qty").cast("double") / cnt, 6).cast("double").alias("avg_qty"),
        F.round(F.sum("price").cast("double") / cnt, 6).cast("double").alias("avg_price"),
        F.round(F.sum("disc").cast("double") / cnt, 6).cast("double").alias("avg_disc"),
        F.count("*").alias("count_order"),
    )


# ---------------------------------------------------------------------------
# q3_top_revenue — TPC-H Q3 shape adapted to our schema: 3-way join +
# aggregate + deterministic top-k (ORDER BY with unique tiebreaker + LIMIT).
# ---------------------------------------------------------------------------
@register(
    "q3_top_revenue",
    oracle="""
    SELECT o.o_orderkey, o.o_orderdate, o.o_orderpriority,
           CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                          * (1 - CAST(l.l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE)
               AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
)
def q3_top_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp")
    )
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1997-01-01 00:00:00").cast("timestamp")
    )
    joined = l.join(o, l.l_orderkey == o.o_orderkey).join(
        F.broadcast(c), o.o_custkey == c.c_custkey
    )
    rev = F.round(F.sum(_dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))), 2)
    return (
        joined.groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(rev.cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), "o_orderkey")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# q5_region_revenue — TPC-H Q5 shape: 6-way star join; dims are broadcast
# (region/nation/customer/supplier tiny next to lineitem at any SF).
# ---------------------------------------------------------------------------
@register(
    "q5_region_revenue",
    oracle="""
    SELECT n.n_name,
           CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                          * (1 - CAST(l.l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE)
               AS revenue
    FROM lineitem l
    JOIN orders o    ON l.l_orderkey = o.o_orderkey
    JOIN customer c  ON o.o_custkey = c.c_custkey
    JOIN supplier s  ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n    ON s.s_nationkey = n.n_nationkey
    JOIN region r    ON n.n_regionkey = r.r_regionkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n.n_name
    ORDER BY revenue DESC, n_name
    """,
)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    joined = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    rev = F.round(F.sum(_dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))), 2)
    return (
        joined.groupBy("n_name")
        .agg(rev.cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), "n_name")
    )


# ---------------------------------------------------------------------------
# window_topk_orders — window function coverage (SURVEY §2.5): top-3 orders
# per customer, deterministic tiebreak.
# ---------------------------------------------------------------------------
@register(
    "window_topk_orders",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rn
    FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                 CAST(row_number() OVER (PARTITION BY o_custkey
                                         ORDER BY o_totalprice DESC, o_orderkey)
                      AS INT) AS rn
          FROM orders)
    WHERE rn <= 3
    """,
)
def window_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


# ---------------------------------------------------------------------------
# rollup_customer_counts — grouping-sets coverage (SURVEY §2.4 note):
# region → nation rollup of customer counts via two broadcast joins.
# ---------------------------------------------------------------------------
@register(
    "rollup_customer_counts",
    oracle="""
    SELECT r.r_name, n.n_name, CAST(count(*) AS BIGINT) AS n_customers
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP(r.r_name, n.n_name)
    """,
)
def rollup_customer_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    joined = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    )
    return joined.rollup("r_name", "n_name").agg(F.count("*").alias("n_customers"))


# ---------------------------------------------------------------------------
# set_ops_customers — U1 EXCEPT DISTINCT, U2 UNION ALL, INTERSECT
# (reference compare_dev_prod.sql:104-110 generalized).
# ---------------------------------------------------------------------------
@register(
    "set_ops_customers",
    oracle="""
    WITH a AS (SELECT DISTINCT o_custkey FROM orders
               WHERE o_orderdate < TIMESTAMP '1996-01-01 00:00:00'),
         b AS (SELECT DISTINCT o_custkey FROM orders
               WHERE o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
    SELECT 'only_early' AS tag, o_custkey FROM (SELECT * FROM a EXCEPT SELECT * FROM b)
    UNION ALL
    SELECT 'only_late' AS tag, o_custkey FROM (SELECT * FROM b EXCEPT SELECT * FROM a)
    UNION ALL
    SELECT 'both' AS tag, o_custkey FROM (SELECT * FROM a INTERSECT SELECT * FROM b)
    """,
)
def set_ops_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    a = (
        o.filter(F.col("o_orderdate") < F.lit("1996-01-01 00:00:00").cast("timestamp"))
        .select("o_custkey")
        .distinct()
    )
    b = (
        o.filter(F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp"))
        .select("o_custkey")
        .distinct()
    )
    return (
        a.subtract(b).select(F.lit("only_early").alias("tag"), "o_custkey")
        .unionByName(b.subtract(a).select(F.lit("only_late").alias("tag"), "o_custkey"))
        .unionByName(a.intersect(b).select(F.lit("both").alias("tag"), "o_custkey"))
    )


# ---------------------------------------------------------------------------
# set_ops_all — the ALL (multiset) forms of U1/U3: EXCEPT ALL keeps
# per-row multiplicity differences, INTERSECT ALL keeps the minimum
# multiplicity (Spark exceptAll/intersectAll; Catalyst plans both as
# hash joins over counted groups, not row-by-row anti joins).
# ---------------------------------------------------------------------------
@register(
    "set_ops_all",
    oracle="""
    SELECT 'except_all' AS op, CAST(custkey AS BIGINT) AS custkey FROM (
      SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
      EXCEPT ALL
      SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    )
    UNION ALL
    SELECT 'intersect_all' AS op, CAST(custkey AS BIGINT) AS custkey FROM (
      SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
      INTERSECT ALL
      SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '2-HIGH'
    )
    """,
)
def set_ops_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    open_keys = o.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("custkey")
    )
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("custkey")
    )
    high = o.filter(F.col("o_orderpriority") == "2-HIGH").select(
        F.col("o_custkey").alias("custkey")
    )
    return (
        open_keys.exceptAll(urgent).select(F.lit("except_all").alias("op"), "custkey")
        .unionByName(
            open_keys.intersectAll(high).select(
                F.lit("intersect_all").alias("op"), "custkey"
            )
        )
    )


# ---------------------------------------------------------------------------
# scalar_functions — string/date/math scalar coverage (SURVEY §2.8): all
# JVM built-ins, stays inside whole-stage codegen.
# ---------------------------------------------------------------------------
@register(
    "scalar_functions",
    oracle="""
    SELECT o_orderkey AS id,
           upper(o_orderstatus) AS status_upper,
           substr(o_orderpriority, 1, 1) AS priority_code,
           CAST(length(o_orderpriority) AS INT) AS priority_len,
           concat(o_orderstatus, '-', o_orderpriority) AS status_priority,
           CAST(year(o_orderdate) AS INT) AS order_year,
           CAST(month(o_orderdate) AS INT) AS order_month,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS order_month_start,
           CAST(round(abs(o_totalprice - 100000.0), 2) AS DOUBLE) AS dist_from_100k,
           CAST(floor(o_totalprice / 10000) AS BIGINT) AS price_decile,
           CAST(o_orderkey % 7 AS BIGINT) AS key_mod7,
           coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_decoded
    FROM orders
    WHERE o_orderkey % 10 = 0
    """,
)
def scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 10 == 0)
    return o.select(
        F.col("o_orderkey").alias("id"),
        F.upper("o_orderstatus").alias("status_upper"),
        F.substring("o_orderpriority", 1, 1).alias("priority_code"),
        F.length("o_orderpriority").cast("int").alias("priority_len"),
        F.concat_ws("-", "o_orderstatus", "o_orderpriority").alias("status_priority"),
        F.year("o_orderdate").cast("int").alias("order_year"),
        F.month("o_orderdate").cast("int").alias("order_month"),
        F.date_trunc("month", "o_orderdate").alias("order_month_start"),
        F.round(F.abs(F.col("o_totalprice") - 100000.0), 2)
        .cast("double")
        .alias("dist_from_100k"),
        F.floor(F.col("o_totalprice") / 10000).cast("bigint").alias("price_decile"),
        (F.col("o_orderkey") % 7).cast("bigint").alias("key_mod7"),
        F.coalesce(F.nullif("o_orderstatus", F.lit("O")), F.lit("OPEN")).alias(
            "status_decoded"
        ),
    )


# ---------------------------------------------------------------------------
# schema_columns — catalog scan S12 (reference pr_schema_diff.sh:112-115).
# Oracle is the *known-correct* schema as VALUES (schemas aren't data DuckDB
# can introspect identically, but the expected output is fixed).
# ---------------------------------------------------------------------------
@register(
    "schema_columns",
    oracle="""
    SELECT * FROM (VALUES
      (1, 'o_orderkey', 'bigint'),
      (2, 'o_custkey', 'bigint'),
      (3, 'o_orderstatus', 'string'),
      (4, 'o_totalprice', 'double'),
      (5, 'o_orderdate', 'timestamp'),
      (6, 'o_orderpriority', 'string')
    ) AS t(ordinal_position, column_name, data_type)
    """,
)
def schema_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    schema = load_table(spark, sf_dir, "orders").schema
    rows = [
        (i + 1, f.name, f.dataType.simpleString()) for i, f in enumerate(schema.fields)
    ]
    return spark.createDataFrame(
        rows, "ordinal_position int, column_name string, data_type string"
    )


# ---------------------------------------------------------------------------
# schema_diff_cols — E15/J2 (reference pr_schema_diff.sh:134-152): full-outer
# column-map diff between a dev and a prod relation shape.
# ---------------------------------------------------------------------------
@register(
    "schema_diff_cols",
    oracle="""
    SELECT * FROM (VALUES
      ('bucket', 'added'),
      ('id', 'type_changed'),
      ('legacy_flag', 'removed')
    ) AS t(column_name, diff_type)
    """,
)
def schema_diff_cols(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.schema_diff import schema_diff_frame

    o = load_table(spark, sf_dir, "orders")
    dev = o.select(
        F.col("o_orderkey").alias("id"),
        F.col("o_orderdate").alias("created_at_ts"),
        _dec("o_totalprice").alias("value"),
        F.lit("regular").alias("bucket"),
    )
    prod = o.select(
        F.col("o_orderkey").cast("string").alias("id"),
        F.col("o_orderdate").alias("created_at_ts"),
        _dec("o_totalprice").alias("value"),
        F.lit("n").alias("legacy_flag"),
    )
    return schema_diff_frame(spark, dev.schema, prod.schema)


# ---------------------------------------------------------------------------
# demo_bucket_stats — the demo project's Python model
# (demo_project/models/marts/agg_bucket_stats.py) re-expressed as a
# standalone oracle-checked query: per-bucket stats + share of the raw
# feed.  Verifies the dbt-Python-model semantics end to end.
# ---------------------------------------------------------------------------
@register(
    "demo_bucket_stats",
    oracle="""
    WITH stg AS (
      SELECT CAST(o_totalprice AS DECIMAL(38,9)) AS value FROM orders
    ),
    f AS (
      SELECT CASE WHEN value > 100 THEN 'high' ELSE 'regular' END AS bucket,
             value
      FROM stg
    ),
    r AS (SELECT CAST(count(*) AS BIGINT) AS n_raw FROM orders)
    SELECT bucket,
           CAST(count(*) AS BIGINT) AS n_rows,
           round(CAST(sum(value) AS DOUBLE), 2) AS total_value,
           round(avg(CAST(value AS DOUBLE)), 2) AS avg_value,
           round(count(*) * 1.0 / n_raw, 6) AS pct_of_raw
    FROM f CROSS JOIN r
    GROUP BY bucket, n_raw
    """,
)
def demo_bucket_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    stg = o.select(F.col("o_totalprice").cast("decimal(38,9)").alias("value"))
    f = stg.withColumn(
        "bucket", F.when(F.col("value") > 100, "high").otherwise("regular")
    )
    n_raw = o.agg(F.count("*").cast("bigint").alias("n_raw"))
    return (
        f.groupBy("bucket")
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.round(F.sum("value").cast("double"), 2).alias("total_value"),
            F.round(F.avg(F.col("value").cast("double")), 2).alias("avg_value"),
        )
        .crossJoin(F.broadcast(n_raw))
        .withColumn("pct_of_raw", F.round(F.col("n_rows") / F.col("n_raw"), 6))
        .drop("n_raw")
    )


# ---------------------------------------------------------------------------
# orders_window_zoo — rank-family window completeness (SURVEY §2.5):
# percent_rank / cume_dist / dense_rank / nth_value in one bounded
# pass, partitioned by order priority over each priority's 50 most
# expensive orders (the window input is pre-bounded by a row_number
# gate so the partition sort is never corpus-sized).
# ---------------------------------------------------------------------------
@register(
    "orders_window_zoo",
    oracle="""
    WITH top50 AS (
      SELECT o_orderpriority, o_orderkey, o_totalprice
      FROM (SELECT o_orderpriority, o_orderkey, o_totalprice,
                   row_number() OVER (PARTITION BY o_orderpriority
                                      ORDER BY o_totalprice DESC, o_orderkey) AS rn
            FROM orders)
      WHERE rn <= 50
    )
    SELECT o_orderpriority, o_orderkey,
           CAST(dense_rank() OVER w AS INT) AS drank,
           round(percent_rank() OVER w, 6) AS prank,
           round(cume_dist() OVER w, 6) AS cdist,
           CAST(nth_value(o_orderkey, 3) OVER (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice DESC, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
                AS BIGINT) AS third_key
    FROM top50
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def orders_window_zoo(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), "o_orderkey"
    )
    top50 = (
        orders.select("o_orderpriority", "o_orderkey", "o_totalprice")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 50)
        .drop("rn")
    )
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return top50.select(
        "o_orderpriority",
        "o_orderkey",
        F.dense_rank().over(w).cast("int").alias("drank"),
        F.round(F.percent_rank().over(w), 6).alias("prank"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
        F.nth_value("o_orderkey", 3).over(wfull).cast("bigint").alias("third_key"),
    )


# ---------------------------------------------------------------------------
# ---------------------------------------------------------------------------
# snapshot_scd2 family — the SCD2 snapshot materialization (S8;
# reference snapshots/example_snapshot.sql:1-12) under the
# cross-engine VALUE HASH — previously the only §2 materialization
# gated solely by pytest.  A deterministic two-delivery history over
# orders exercises every §7.5 trap:
#   - delivery 1 = every order except keys ≡3 (mod 7), versioned at
#     o_orderdate;
#   - delivery 2 = new keys (≡3), superseding updates 30 days later
#     (≡0: status/price change — closes the old version at the NEW
#     updated_at and inserts an open one), a SAME-TIMESTAMP update
#     (≡1: changed payload, equal updated_at — the timestamp strategy
#     must treat it as a no-op), and a LATE row (≡2: updated_at moved
#     BACKWARDS — also a no-op; history never rewinds);
#   - delivery 2 is then applied a SECOND time: rerun idempotency is
#     asserted by the hash itself (a non-idempotent merge would emit
#     extra versions and mismatch the two-delivery oracle).
# The deliveries are written ONCE per engine (one Spark builder, one
# SQL CTE constant) and shared by the plain and hard-delete
# registrations — a trap edit cannot silently fork the two entries'
# semantics.  The oracle reproduces close-and-insert in plain SQL:
# each delivery holds at most one row per key, so the final history is
# d1 versions (closed iff superseded — the hard-delete variant adds
# the vanished-key case) plus the d2 versions that entered.  scd_id is
# md5(key|valid_from-as-string) on both sides — Spark's
# timestamp→string and DuckDB's TIMESTAMP→VARCHAR agree on the
# "YYYY-MM-DD HH:MM:SS" rendering for whole-second values.
# At scale the merge is the production MERGE INTO shape (see
# operators/snapshot.py): key-partitioned joins of the open slice
# against the day's batch, never a history rewrite.
# ---------------------------------------------------------------------------
_SNAP_TS_DELIVERIES_SQL = """d1 AS (
      SELECT o_orderkey AS k, o_orderstatus AS status,
             o_totalprice AS price, CAST(o_orderdate AS TIMESTAMP) AS u
      FROM orders WHERE o_orderkey % 7 <> 3
    ),
    d2 AS (
      SELECT o_orderkey AS k, o_orderstatus AS status,
             o_totalprice AS price, CAST(o_orderdate AS TIMESTAMP) AS u
      FROM orders WHERE o_orderkey % 7 = 3
      UNION ALL
      SELECT o_orderkey, 'U', o_totalprice + 1.0,
             CAST(o_orderdate AS TIMESTAMP) + INTERVAL 30 DAY
      FROM orders WHERE o_orderkey % 7 = 0
      UNION ALL
      SELECT o_orderkey, 'S', o_totalprice, CAST(o_orderdate AS TIMESTAMP)
      FROM orders WHERE o_orderkey % 7 = 1
      UNION ALL
      SELECT o_orderkey, 'L', o_totalprice,
             CAST(o_orderdate AS TIMESTAMP) - INTERVAL 10 DAY
      FROM orders WHERE o_orderkey % 7 = 2
    )"""


def _snap_ts_oracle(vto_case: str, with_updated_at: bool) -> str:
    """Timestamp-strategy oracle: the shared delivery CTEs + the
    close-and-insert reconstruction, parameterized only by the
    dbt_valid_to CASE (supersession alone vs supersession-or-deletion)
    and whether dbt_updated_at is in the hashed output."""
    upd = "vfrom AS dbt_updated_at,\n           " if with_updated_at else ""
    return f"""
    WITH {_SNAP_TS_DELIVERIES_SQL},
    hist AS (
      SELECT d1.k, d1.status, d1.price, d1.u AS vfrom,
             {vto_case} AS vto
      FROM d1 LEFT JOIN d2 ON d1.k = d2.k
      UNION ALL
      SELECT d2.k, d2.status, d2.price, d2.u, NULL
      FROM d2 LEFT JOIN d1 ON d2.k = d1.k
      WHERE d1.k IS NULL OR d2.u > d1.u
    )
    SELECT k, status, CAST(price AS DOUBLE) AS price,
           md5(CAST(k AS VARCHAR) || '|' || CAST(vfrom AS VARCHAR))
             AS dbt_scd_id,
           {upd}vfrom AS dbt_valid_from,
           vto AS dbt_valid_to
    FROM hist
    """


def _snap_ts_deliveries(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """The Spark rendering of :data:`_SNAP_TS_DELIVERIES_SQL` — one
    builder for both timestamp-strategy registrations."""
    o = load_table(spark, sf_dir, "orders")
    base = o.select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").alias("price"),
        F.col("o_orderdate").cast("timestamp").alias("updated_at"),
    )
    m = F.col("k") % 7
    d1 = base.filter(m != 3)
    d2 = (
        base.filter(m == 3)
        .unionByName(
            base.filter(m == 0)
            .withColumn("status", F.lit("U"))
            .withColumn("price", F.col("price") + F.lit(1.0))
            .withColumn(
                "updated_at", F.col("updated_at") + F.expr("INTERVAL 30 DAYS")
            )
        )
        .unionByName(base.filter(m == 1).withColumn("status", F.lit("S")))
        .unionByName(
            base.filter(m == 2)
            .withColumn("status", F.lit("L"))
            .withColumn(
                "updated_at", F.col("updated_at") - F.expr("INTERVAL 10 DAYS")
            )
        )
    )
    return d1, d2


@register(
    "snapshot_scd2",
    oracle=_snap_ts_oracle(
        "CASE WHEN d2.u > d1.u THEN d2.u END", with_updated_at=True
    ),
)
def snapshot_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.snapshot import snapshot_merge

    d1, d2 = _snap_ts_deliveries(spark, sf_dir)
    # Each delivery merges against the STORED snapshot and the result
    # is materialized before the next delivery reads it — exactly what
    # run_snapshot's write/read cycle does in production (at scale the
    # store is a table and the merge is MERGE INTO).  Pinning each
    # state (localCheckpoint) mirrors that: without it the declarative
    # 3-merge chain re-derives every prior delivery at each reference
    # (a 100+-scan plan for a 3-delivery replay).
    s = snapshot_merge(None, d1, "k", "updated_at").localCheckpoint(eager=True)
    s = snapshot_merge(s, d2, "k", "updated_at").localCheckpoint(eager=True)
    # rerun the SAME delivery: idempotency is part of the hashed result
    s = snapshot_merge(s, d2, "k", "updated_at")
    return s.select(
        "k",
        "status",
        F.col("price").cast("double").alias("price"),
        "dbt_scd_id",
        "dbt_updated_at",
        "dbt_valid_from",
        "dbt_valid_to",
    )


# ---------------------------------------------------------------------------
# snapshot_scd2_check — the dbt CHECK strategy under the value hash
# (S8's second strategy; public dbt semantics: a row is a new version
# when any check column differs, null-safely, and dbt_valid_from of
# new versions is the pinned run timestamp).  Same two-delivery replay
# discipline as snapshot_scd2, with pinned run times T1/T2 so both
# engines agree on every validity boundary:
#   - delivery 1 (run at T1) = all keys except ≡3 (mod 7);
#   - delivery 2 (run at T2) = changed payload for ≡0 (close at T2 +
#     insert open), IDENTICAL payload for ≡1/≡5/≡6 (scd-id equality ⇒
#     no-op), brand-new keys ≡3; keys ≡2/≡4 are ABSENT — the check
#     strategy has no hard-delete, so they must stay open untouched;
#   - delivery 2 re-applied: idempotency under the hash.
# dbt_scd_id is excluded from the hashed output: it hashes a
# NUL-separated payload encoding that has no portable SQL literal;
# the payload columns and both validity bounds pin the same facts.
# ---------------------------------------------------------------------------
@register(
    "snapshot_scd2_check",
    oracle="""
    WITH base AS (
      SELECT o_orderkey AS k, o_orderstatus AS status,
             o_totalprice AS price, o_orderkey % 7 AS m
      FROM orders
    )
    SELECT k, status, CAST(price AS DOUBLE) AS price,
           TIMESTAMP '2024-01-01 00:00:00' AS dbt_valid_from,
           CASE WHEN m = 0 THEN TIMESTAMP '2024-02-01 00:00:00' END
             AS dbt_valid_to
    FROM base WHERE m <> 3
    UNION ALL
    SELECT k, 'U', CAST(price + 1.0 AS DOUBLE),
           TIMESTAMP '2024-02-01 00:00:00', NULL
    FROM base WHERE m = 0
    UNION ALL
    SELECT k, status, CAST(price AS DOUBLE),
           TIMESTAMP '2024-02-01 00:00:00', NULL
    FROM base WHERE m = 3
    """,
)
def snapshot_scd2_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datetime import datetime

    from ..operators.snapshot import snapshot_merge_check

    t1 = datetime(2024, 1, 1)
    t2 = datetime(2024, 2, 1)
    o = load_table(spark, sf_dir, "orders")
    base = o.select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").alias("price"),
    )
    m = F.col("k") % 7
    d1 = base.filter(m != 3)
    d2 = (
        base.filter(m == 3)
        .unionByName(
            base.filter(m == 0)
            .withColumn("status", F.lit("U"))
            .withColumn("price", F.col("price") + F.lit(1.0))
        )
        # identical payload: the scd-id equality path (no-op)
        .unionByName(base.filter(m.isin(1, 5, 6)))
        # keys ≡2/≡4 absent: no hard-delete in the check strategy
    )
    cols = ["status", "price"]
    s = snapshot_merge_check(None, d1, "k", cols, now=t1).localCheckpoint(
        eager=True
    )
    s = snapshot_merge_check(s, d2, "k", cols, now=t2).localCheckpoint(
        eager=True
    )
    # rerun the SAME delivery: idempotency is part of the hashed result
    s = snapshot_merge_check(s, d2, "k", cols, now=t2)
    return s.select(
        "k",
        "status",
        F.col("price").cast("double").alias("price"),
        "dbt_valid_from",
        "dbt_valid_to",
    )


# ---------------------------------------------------------------------------
# snapshot_scd2_invalidate — hard_deletes='invalidate' under the value
# hash (dbt 1.9 semantics: a key that VANISHES from the source closes
# its open version at the run timestamp, so history records the
# deletion).  Same deliveries as snapshot_scd2 (shared builder/CTEs
# above), but delivery 2 runs with invalidate and a pinned `now`: keys
# ≡4/≡5/≡6 (present in delivery 1, absent from delivery 2) close at
# `now`; superseded keys (≡0) still close at the NEW updated_at
# (supersession wins over deletion timing); same-timestamp (≡1) and
# late (≡2) keys are present in delivery 2, so they stay open.  The
# rerun re-applies delivery 2: already-invalidated keys are closed
# (not open) rows, so nothing double-closes — idempotency under the
# hash again.
# ---------------------------------------------------------------------------
@register(
    "snapshot_scd2_invalidate",
    oracle=_snap_ts_oracle(
        "CASE WHEN d2.u > d1.u THEN d2.u "
        "WHEN d2.k IS NULL THEN TIMESTAMP '2099-01-01 00:00:00' END",
        with_updated_at=False,
    ),
)
def snapshot_scd2_invalidate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datetime import datetime

    from ..operators.snapshot import snapshot_merge

    now = datetime(2099, 1, 1)
    d1, d2 = _snap_ts_deliveries(spark, sf_dir)
    s = snapshot_merge(None, d1, "k", "updated_at").localCheckpoint(eager=True)
    s = snapshot_merge(
        s, d2, "k", "updated_at", hard_deletes="invalidate", now=now
    ).localCheckpoint(eager=True)
    # rerun: already-invalidated keys are closed rows — nothing
    # double-closes, and the hash certifies it
    s = snapshot_merge(
        s, d2, "k", "updated_at", hard_deletes="invalidate", now=now
    )
    return s.select(
        "k",
        "status",
        F.col("price").cast("double").alias("price"),
        "dbt_scd_id",
        "dbt_valid_from",
        "dbt_valid_to",
    )
