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


# ---------------------------------------------------------------------------
# order_value_percentiles — exact interpolated percentiles (median/p90/
# p99) of order value per priority.  Spark `percentile` and DuckDB
# `quantile_cont` both do linear interpolation over the sorted values,
# so the result is order-independent (hash-stable) unlike float SUMs.
# Scale note: exact percentile sorts each group — at 100 TB switch to
# `approx_percentile` (t-digest, mergeable map-side sketch); kept exact
# here because the oracle gate needs determinism.
# ---------------------------------------------------------------------------
@register(
    "order_value_percentiles",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(round(quantile_cont(o_totalprice, 0.5), 6) AS DOUBLE) AS p50,
           CAST(round(quantile_cont(o_totalprice, 0.9), 6) AS DOUBLE) AS p90,
           CAST(round(quantile_cont(o_totalprice, 0.99), 6) AS DOUBLE) AS p99
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def order_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.expr("percentile(o_totalprice, 0.5D)"), 6).alias("p50"),
            F.round(F.expr("percentile(o_totalprice, 0.9D)"), 6).alias("p90"),
            F.round(F.expr("percentile(o_totalprice, 0.99D)"), 6).alias("p99"),
        )
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# lineitem_corr_stats — correlation / covariance / stddev / OLS slope of
# quantity vs extended price per return flag.  Built-in corr()/regr_*()
# exist in both engines but accumulate doubles in partition order, so
# their low bits are nondeterministic across engines AND across runs —
# instead the moments (n, Σx, Σy, Σx², Σy², Σxy) are accumulated as
# exact DECIMAL sums (order-independent, map-side-combinable: ONE
# shuffle at any scale) and the statistics derived in one deterministic
# double-precision step.  The textbook single-pass parallel formulation.
# ---------------------------------------------------------------------------
_MOMENTS_SQL = """
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy
    FROM lineitem GROUP BY l_returnflag
"""


@register(
    "lineitem_corr_stats",
    oracle=f"""
    WITH m AS ({_MOMENTS_SQL})
    SELECT l_returnflag, n,
           CAST(round((n*sxy - sx*sy) / sqrt((n*sxx - sx*sx) * (n*syy - sy*sy)), 6) + 0.0 AS DOUBLE) AS corr_qty_price,
           CAST(round((sxy - sx*sy/n) / n, 4) + 0.0 AS DOUBLE) AS covar_pop,
           CAST(round(sqrt((sxx - sx*sx/n) / (n - 1)), 6) AS DOUBLE) AS stddev_qty,
           CAST(round((n*sxy - sx*sy) / (n*sxx - sx*sx), 6) + 0.0 AS DOUBLE) AS regr_slope,
           CAST(round((sy - ((n*sxy - sx*sy) / (n*sxx - sx*sx)) * sx) / n, 4) + 0.0 AS DOUBLE) AS regr_intercept
    FROM m ORDER BY l_returnflag
    """,
)
def lineitem_corr_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("decimal(18,2)")
    y = F.col("l_extendedprice").cast("decimal(18,2)")
    m = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(x * x).cast("double").alias("sxx"),
        F.sum(y * y).cast("double").alias("syy"),
        F.sum(x * y).cast("double").alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return m.select(
        "l_returnflag",
        "n",
        # + 0.0 on every sign-indefinite stat: IEEE -0.0 normalization
        # (DuckDB and Spark round tiny negatives to differently-signed
        # zeros; see docs_weighted_sample)
        (F.round(
            (n * sxy - sx * sy)
            / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)),
            6,
        ) + F.lit(0.0)).alias("corr_qty_price"),
        (F.round((sxy - sx * sy / n) / n, 4) + F.lit(0.0)).alias("covar_pop"),
        F.round(F.sqrt((sxx - sx * sx / n) / (n - F.lit(1))), 6).alias("stddev_qty"),
        (F.round(slope, 6) + F.lit(0.0)).alias("regr_slope"),
        (F.round((sy - slope * sx) / n, 4) + F.lit(0.0)).alias("regr_intercept"),
    ).orderBy("l_returnflag")


# ---------------------------------------------------------------------------
# approx_distinct_parts — HyperLogLog++ distinct-count sketch (the
# 100 TB way to count distincts: fixed-size mergeable state, one
# shuffle of sketches instead of a full distinct shuffle).  No oracle:
# HLL estimates are engine-specific (Spark's relativeSD=0.05 default vs
# DuckDB's implementation differ by design) — the driver records the
# weaker rows-only check; exactness is covered by `scalar_functions`'
# count_distinct.  SELF-CHECKING (r7 verdict #4): the exact count rides
# alongside the sketch and an in-plan assert_true fails the query
# loudly if any group's relative error leaves the 5x-relativeSD band —
# the rows-only driver row therefore certifies the sketch's accuracy
# contract, not just a row count.
# ---------------------------------------------------------------------------
_HLL_RSD = 0.05  # Spark's approx_count_distinct default relativeSD


@register("approx_distinct_parts")
def approx_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    bound = 5 * _HLL_RSD
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey", _HLL_RSD).alias("approx_parts"),
            F.countDistinct("l_partkey").alias("exact_parts"),
        )
        .withColumn(
            "rel_error",
            # an all-NULL key group has exact == approx == 0: error 0,
            # not a 0/0 NULL that would trip the in-plan assert
            F.when(
                F.col("exact_parts") > 0,
                F.round(
                    F.abs(F.col("approx_parts") - F.col("exact_parts"))
                    / F.col("exact_parts"),
                    4,
                ),
            ).otherwise(F.lit(0.0)),
        )
        .withColumn("rel_error_bound", F.lit(bound))
        .withColumn(
            "rel_error",
            F.coalesce(
                F.assert_true(
                    F.col("rel_error") <= bound,
                    F.lit(
                        "HLL relative error exceeded 5x relativeSD: "
                        "sketch accuracy invariant violated"
                    ),
                ),
                F.col("rel_error"),
            ),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# customer_rfm — RFM segmentation (recency / frequency / monetary
# quartiles via ntile): the classic warehouse customer-scoring query.
# Deterministic: every ntile orders with the customer key tie-break.
# ---------------------------------------------------------------------------
@register(
    "customer_rfm",
    oracle="""
    WITH base AS (
      SELECT o_custkey,
             max(o_orderdate) AS last_order,
             CAST(count(*) AS BIGINT) AS n_orders,
             CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE)
               AS total_spend
      FROM orders GROUP BY o_custkey
    ),
    scored AS (
      SELECT o_custkey AS custkey, n_orders, total_spend,
             CAST(ntile(4) OVER (ORDER BY last_order ASC, o_custkey) AS INT) AS r_score,
             CAST(ntile(4) OVER (ORDER BY n_orders ASC, o_custkey) AS INT) AS f_score,
             CAST(ntile(4) OVER (ORDER BY total_spend ASC, o_custkey) AS INT) AS m_score
      FROM base
    )
    SELECT r_score, f_score, m_score,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(round(sum(CAST(total_spend AS DECIMAL(18,2))), 2) AS DOUBLE)
             AS segment_spend
    FROM scored GROUP BY 1, 2, 3
    """,
)
def customer_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM quartiles via the DISTRIBUTED exact-ntile operator
    (operators/distributed_rank.py): bit-exact with ``ntile(4) OVER
    (ORDER BY ...)`` — the DuckDB oracle below still uses plain ntile —
    but computed with range-bucketed parallel windows instead of the
    single-partition global window, so a billion-customer dimension
    ranks across the cluster.  rows_per_bucket is set low enough that
    the sf0.01 correctness gate exercises the multi-bucket path."""
    from ..operators.distributed_rank import exact_ntile_multi

    o = load_table(spark, sf_dir, "orders")
    base = o.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count("*").cast("bigint").alias("n_orders"),
        F.round(F.sum(F.col("o_totalprice").cast("decimal(18,2)")), 2)
        .cast("double")
        .alias("total_spend"),
    )
    # Materialize the per-customer aggregate ONCE: the rank passes'
    # driver actions (count + boundary sample + bucket histogram)
    # would otherwise re-run the full orders aggregation per job.
    # At scale this is the persist-the-dimension-across-rank-passes
    # pattern — the aggregate is |customers|, far smaller than orders.
    # LAZY checkpoint + count = ONE job (r14): the count fully
    # materializes the checkpoint, exactly like the eager form, and
    # feeds all three rank passes (row count is invariant).
    base = base.localCheckpoint(eager=False)
    rpb = 500  # force >1 bucket even on the small gate data
    n = base.count()
    # ONE sample job + ONE bucket-histogram job for all three rank
    # dimensions (r13: the chained exact_ntile calls paid 2 driver
    # jobs per dimension — exact_ntile_multi shares them; ranks and
    # tiles are bit-identical, see operators/distributed_rank.py)
    scored = exact_ntile_multi(
        base,
        4,
        [
            (["last_order", "o_custkey"], "r_score"),
            (["n_orders", "o_custkey"], "f_score"),
            (["total_spend", "o_custkey"], "m_score"),
        ],
        rows_per_bucket=rpb,
        n_rows=n,
    )
    scored = scored.select(
        F.col("o_custkey").alias("custkey"),
        "n_orders",
        "total_spend",
        "r_score",
        "f_score",
        "m_score",
    )
    return scored.groupBy("r_score", "f_score", "m_score").agg(
        F.count("*").cast("bigint").alias("n_customers"),
        F.round(F.sum(F.col("total_spend").cast("decimal(18,2)")), 2)
        .cast("double")
        .alias("segment_spend"),
    )


# ---------------------------------------------------------------------------
# basket_part_pairs — market-basket co-occurrence over lineitem: parts
# (bucketed to 100 groups) ordered together, with support and lift.
# Grouped-pairs pattern (collect each order's sorted buckets, emit
# ordered pairs from the array) — no self-join; pairs with n>=2, top
# 50 by lift.
# ---------------------------------------------------------------------------
@register(
    "basket_part_pairs",
    oracle="""
    WITH items AS (
      SELECT DISTINCT l_orderkey, l_partkey % 100 AS part_bucket FROM lineitem
    ),
    n_orders AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n FROM items),
    pf AS (SELECT part_bucket, CAST(count(*) AS BIGINT) AS n_p FROM items GROUP BY 1),
    pairs AS (
      SELECT a.part_bucket AS p_a, b.part_bucket AS p_b,
             CAST(count(*) AS BIGINT) AS n_ab
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.part_bucket < b.part_bucket
      GROUP BY 1, 2
      HAVING count(*) >= 2
    ),
    scored AS (
      SELECT p_a, p_b, n_ab,
             round(n_ab * 1.0 / n, 6) AS support,
             round((n_ab * 1.0 / n)
                   / ((fa.n_p * 1.0 / n) * (fb.n_p * 1.0 / n)), 4) AS lift
      FROM pairs
      JOIN pf fa ON fa.part_bucket = p_a
      JOIN pf fb ON fb.part_bucket = p_b
      CROSS JOIN n_orders
    )
    SELECT p_a, p_b, n_ab, support, lift, rank FROM (
      SELECT *, CAST(row_number() OVER (ORDER BY lift DESC, p_a, p_b) AS INT)
               AS rank
      FROM scored
    ) WHERE rank <= 50
    """,
)
def basket_part_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    items = li.select(
        "l_orderkey", (F.col("l_partkey") % 100).alias("part_bucket")
    ).distinct()
    # Materialize the per-order bucket arrays ONCE and derive ALL FOUR
    # consumers (pair expansion, both bucket-frequency sides, the order
    # total) from the checkpointed frame: Catalyst plans each branch
    # independently, so the previous formulation re-ran the full
    # lineitem scan + distinct FOUR times (guide §2.4/§5 — one corpus
    # pass where one suffices; the frame is |orders| rows of tiny
    # arrays, far smaller than lineitem).  exploding the sorted arrays
    # yields exactly the distinct (order, bucket) rows back, so n_p and
    # n are value-identical to the items-derived aggregates.
    grouped = (
        items.groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_list("part_bucket")).alias("bs"))
        .localCheckpoint(eager=False)
    )
    n_orders = grouped.agg(
        F.count_distinct("l_orderkey").cast("bigint").alias("n")
    )
    pf = (
        grouped.select(F.explode("bs").alias("part_bucket"))
        .groupBy("part_bucket")
        .agg(F.count("*").cast("bigint").alias("n_p"))
    )
    bs = F.col("bs")
    combos = F.flatten(
        F.transform(
            bs,
            lambda x, i: F.transform(
                F.slice(bs, i + F.lit(2), F.greatest(F.size(bs) - i - 1, F.lit(0))),
                lambda y: F.struct(x.alias("p_a"), y.alias("p_b")),
            ),
        )
    )
    pairs = (
        grouped.select(F.explode(combos).alias("p"))
        .select("p.p_a", "p.p_b")
        .groupBy("p_a", "p_b")
        .agg(F.count("*").cast("bigint").alias("n_ab"))
        .filter(F.col("n_ab") >= 2)
    )
    fa = pf.select(F.col("part_bucket").alias("p_a"), F.col("n_p").alias("n_a"))
    fb = pf.select(F.col("part_bucket").alias("p_b"), F.col("n_p").alias("n_b"))
    scored = (
        pairs.join(F.broadcast(fa), "p_a")
        .join(F.broadcast(fb), "p_b")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "p_a",
            "p_b",
            "n_ab",
            F.round(F.col("n_ab") / F.col("n"), 6).alias("support"),
            F.round(
                (F.col("n_ab") / F.col("n"))
                / ((F.col("n_a") / F.col("n")) * (F.col("n_b") / F.col("n"))),
                4,
            ).alias("lift"),
        )
    )
    top = scored.orderBy(F.col("lift").desc(), "p_a", "p_b").limit(50)
    w = Window.orderBy(F.col("lift").desc(), "p_a", "p_b")
    return top.withColumn("rank", F.row_number().over(w).cast("int"))


# ---------------------------------------------------------------------------
# lateral_top_orders — correlated LATERAL table subquery (SQL
# passthrough): each customer's 2 priciest open orders via a
# per-customer ordered-limit subquery.  Catalyst rewrites the lateral
# into a ranked window join — same plan family as window_topk_orders —
# so the SQL surface costs nothing extra at scale; registered to pin
# the LATERAL syntax itself (both engines support it).
# ---------------------------------------------------------------------------
@register(
    "lateral_top_orders",
    oracle="""
    SELECT c.c_custkey, t.o_orderkey,
           CAST(round(CAST(t.o_totalprice AS DECIMAL(18,2)), 2) AS DOUBLE)
               AS price
    FROM customer c,
         LATERAL (
           SELECT o_orderkey, o_totalprice
           FROM orders o
           WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O'
           ORDER BY o.o_totalprice DESC, o.o_orderkey
           LIMIT 2
         ) t
    WHERE c.c_mktsegment = 'BUILDING'
    ORDER BY c.c_custkey, t.o_orderkey
    """,
)
def lateral_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("_lat_customer")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("_lat_orders")
    return spark.sql(
        """
        SELECT c.c_custkey, t.o_orderkey,
               CAST(round(CAST(t.o_totalprice AS DECIMAL(18,2)), 2) AS DOUBLE)
                   AS price
        FROM _lat_customer c,
             LATERAL (
               SELECT o_orderkey, o_totalprice
               FROM _lat_orders o
               WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O'
               ORDER BY o.o_totalprice DESC, o.o_orderkey
               LIMIT 2
             ) t
        WHERE c.c_mktsegment = 'BUILDING'
        ORDER BY c.c_custkey, t.o_orderkey
        """
    )


# ---------------------------------------------------------------------------
# orders_rolling_7d — time-RANGE window frame: each order's trailing
# 7-day spend for its customer (RANGE BETWEEN INTERVAL ... PRECEDING).
# Spark expresses interval ranges as epoch-second offsets on a long
# orderBy key; sums stay DECIMAL inside the frame so both engines are
# exact.  Same o_custkey shuffle serves the whole window.
# ---------------------------------------------------------------------------
@register(
    "orders_rolling_7d",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2)))
               OVER (PARTITION BY o_custkey ORDER BY o_orderdate
                     RANGE BETWEEN INTERVAL 6 DAYS PRECEDING AND CURRENT ROW), 2)
             AS DOUBLE) AS spend_7d,
           CAST(count(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate
                     RANGE BETWEEN INTERVAL 6 DAYS PRECEDING AND CURRENT ROW)
             AS BIGINT) AS n_orders_7d
    FROM orders
    WHERE o_custkey % 20 = 0
    """,
)
def orders_rolling_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") % 20 == 0)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").cast("timestamp").cast("long"))
        .rangeBetween(-6 * 86400, 0)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).over(w), 2)
        .cast("double")
        .alias("spend_7d"),
        F.count("*").over(w).cast("bigint").alias("n_orders_7d"),
    )


# ---------------------------------------------------------------------------
# recursive_supplier_chain — WITH RECURSIVE passthrough (Spark 4.1 /
# GoogleSQL / DuckDB all support it): walk each supplier up the
# implicit binary hierarchy parent(k) = k div 2 to the root,
# accumulating depth and path sum.  Acyclic by construction — Spark's
# recursive CTEs support UNION ALL only (no visited-set dedup), so
# cyclic closures stay with operators/dedup.connected_components; this
# pins the recursive-SQL surface itself.  Plan: each round is one
# self-reference scan + filter, AQE-coalesced; depth ≤ log2(max key).
# ---------------------------------------------------------------------------
@register(
    "recursive_supplier_chain",
    oracle="""
    WITH RECURSIVE chain(suppkey, node, depth) AS (
      SELECT s_suppkey, s_suppkey, 0 FROM supplier
      UNION ALL
      SELECT c.suppkey, c.node // 2, c.depth + 1
      FROM chain c WHERE c.node > 1
    )
    SELECT CAST(suppkey AS BIGINT) AS suppkey,
           CAST(max(depth) AS INT) AS depth_to_root,
           CAST(sum(node) AS BIGINT) AS path_sum,
           CAST(count(*) AS INT) AS chain_len
    FROM chain
    GROUP BY suppkey
    """,
)
def recursive_supplier_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "supplier").createOrReplaceTempView("_rec_supplier")
    return spark.sql(
        """
        WITH RECURSIVE chain(suppkey, node, depth) AS (
          SELECT s_suppkey, s_suppkey, 0 FROM _rec_supplier
          UNION ALL
          SELECT c.suppkey, c.node DIV 2, c.depth + 1
          FROM chain c WHERE c.node > 1
        )
        SELECT CAST(suppkey AS BIGINT) AS suppkey,
               CAST(max(depth) AS INT) AS depth_to_root,
               CAST(sum(node) AS BIGINT) AS path_sum,
               CAST(count(*) AS INT) AS chain_len
        FROM chain
        GROUP BY suppkey
        """
    )


# ---------------------------------------------------------------------------
# orders_daily_anomalies — pipeline-ops volume monitoring: z-score of
# each day's order count against the full-history mean/std.  The moments
# (Σn, Σn²) are exact integers, so mean/std are bit-deterministic in
# both engines (no float-sum order issues); z rounded 6dp.  Plan: one
# date-keyed partial agg, then a 1-row broadcast of the stats.
# ---------------------------------------------------------------------------
@register(
    "orders_daily_anomalies",
    oracle="""
    WITH daily AS (
      SELECT o_orderdate AS d, CAST(count(*) AS BIGINT) AS n
      FROM orders GROUP BY o_orderdate
    ),
    stats AS (
      SELECT CAST(count(*) AS BIGINT) AS nd,
             CAST(sum(n) AS BIGINT) AS s1,
             CAST(sum(n * n) AS BIGINT) AS s2
      FROM daily
    )
    SELECT d, n,
           round((n - CAST(s1 AS DOUBLE) / nd)
                 / sqrt((CAST(s2 AS DOUBLE)
                         - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / nd)
                        / (nd - 1)), 6) AS z
    FROM daily CROSS JOIN stats
    """,
)
def orders_daily_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.count("*").cast("bigint").alias("n")
    )
    stats = daily.agg(
        F.count("*").cast("bigint").alias("nd"),
        F.sum("n").cast("bigint").alias("s1"),
        F.sum(F.col("n") * F.col("n")).cast("bigint").alias("s2"),
    )
    mean = F.col("s1").cast("double") / F.col("nd")
    var = (
        F.col("s2").cast("double")
        - F.col("s1").cast("double") * F.col("s1").cast("double") / F.col("nd")
    ) / (F.col("nd") - F.lit(1))
    return daily.crossJoin(F.broadcast(stats)).select(
        "d",
        "n",
        F.round((F.col("n") - mean) / F.sqrt(var), 6).alias("z"),
    )


# ---------------------------------------------------------------------------
# orders_mad_outliers — robust per-group outlier stats: median, MAD
# (median absolute deviation), and the count beyond the 3σ-equivalent
# robust fence (3 · 1.4826 · MAD).  Exact interpolated percentiles are
# order-independent, so both engines agree bitwise; the per-row
# deviation arithmetic is fixed-order doubles.  Two grouped percentile
# passes over the same o_orderpriority partitioning.
# ---------------------------------------------------------------------------
@register(
    "orders_mad_outliers",
    oracle="""
    WITH med AS (
      SELECT o_orderpriority AS prio,
             quantile_cont(CAST(o_totalprice AS DOUBLE), 0.5) AS med
      FROM orders GROUP BY o_orderpriority
    ),
    dev AS (
      SELECT prio, med,
             abs(CAST(o_totalprice AS DOUBLE) - med) AS adev
      FROM orders JOIN med ON o_orderpriority = prio
    )
    SELECT prio,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(any_value(med), 6) AS median_price,
           round(quantile_cont(adev, 0.5), 6) AS mad,
           CAST(sum(CASE WHEN adev > 3 * 1.4826 * quantile_med THEN 1 ELSE 0 END)
                AS BIGINT) AS n_outliers
    FROM (
      SELECT prio, med, adev,
             quantile_cont(adev, 0.5) OVER (PARTITION BY prio) AS quantile_med
      FROM dev
    )
    GROUP BY prio
    """,
)
def orders_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("prio"),
        F.col("o_totalprice").cast("double").alias("price"),
    )
    med = o.groupBy("prio").agg(
        F.expr("percentile(price, 0.5D)").alias("med")
    )
    dev = o.join(F.broadcast(med), "prio").withColumn(
        "adev", F.abs(F.col("price") - F.col("med"))
    )
    mad = dev.groupBy("prio").agg(
        F.expr("percentile(adev, 0.5D)").alias("mad_raw")
    )
    return (
        dev.join(F.broadcast(mad), "prio")
        .groupBy("prio")
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            F.round(F.first("med"), 6).alias("median_price"),
            F.round(F.first("mad_raw"), 6).alias("mad"),
            F.sum(
                (
                    F.col("adev")
                    > F.lit(3) * F.lit(1.4826) * F.col("mad_raw")
                ).cast("bigint")
            ).cast("bigint").alias("n_outliers"),
        )
    )


# ---------------------------------------------------------------------------
# bq_safe_functions — BigQuery compatibility shims in action
# (functions/bigquery_compat.py): SAFE_DIVIDE's NULL-on-zero, the
# (value, part) truncation order, ISO date parsing.  SQL-body session
# functions — Catalyst inlines them, so the shim layer costs nothing
# (same plan as hand-written CASE).
# ---------------------------------------------------------------------------
@register(
    "bq_safe_functions",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(CASE WHEN l_discount = 0 OR l_discount IS NULL THEN NULL
                      ELSE CAST(l_extendedprice AS DOUBLE)
                           / CAST(l_discount AS DOUBLE) END, 4)
             AS price_per_discount,
           CAST(date_trunc('month', CAST(l_shipdate AS TIMESTAMP))
                AS TIMESTAMP) AS ship_month,
           CAST(strptime(strftime(l_shipdate, '%Y-%m-%d'), '%Y-%m-%d')
                AS DATE) AS reparsed
    FROM lineitem
    WHERE l_orderkey < 200
    """,
)
def bq_safe_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.bigquery_compat import register_bigquery_compat

    register_bigquery_compat(spark)
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("_bq_lineitem")
    return spark.sql(
        """
        SELECT l_orderkey, l_linenumber,
               round(safe_divide(CAST(l_extendedprice AS DOUBLE),
                                 CAST(l_discount AS DOUBLE)), 4)
                 AS price_per_discount,
               bq_timestamp_trunc(CAST(l_shipdate AS TIMESTAMP), 'month')
                 AS ship_month,
               bq_parse_date_iso(date_format(l_shipdate, 'yyyy-MM-dd'))
                 AS reparsed
        FROM _bq_lineitem
        WHERE l_orderkey < 200
        """
    )


# ---------------------------------------------------------------------------
# lineitem_key_skew — pre-shuffle key diagnostic (operators/skew.
# key_skew_profile): decide plain join vs AQE skew vs salted_join from
# exact per-key counts, before paying for the shuffle.
# ---------------------------------------------------------------------------
@register(
    "lineitem_key_skew",
    oracle="""
    WITH counts AS (
      SELECT l_suppkey AS k, CAST(count(*) AS BIGINT) AS c
      FROM lineitem GROUP BY l_suppkey
    ),
    top5 AS (
      SELECT sum(c) AS t FROM (SELECT c FROM counts ORDER BY c DESC LIMIT 5)
    )
    SELECT CAST(sum(c) AS BIGINT) AS n_rows,
           CAST(count(*) AS BIGINT) AS n_keys,
           CAST(max(c) AS BIGINT) AS max_freq,
           round(max(c) / (sum(c) / count(*)), 6) AS skew_ratio,
           round((SELECT t FROM top5) / sum(c), 6) AS top5_share
    FROM counts
    """,
)
def lineitem_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.skew import key_skew_profile

    return key_skew_profile(
        load_table(spark, sf_dir, "lineitem"), "l_suppkey", top_n=5
    )


# ---------------------------------------------------------------------------
# orders_histogram_quantiles — mergeable equi-width histogram sketch
# (operators/histogram.py): p50/p90/p99 of order value estimated from
# 64 exact bin counts over a declared range.  One map-side-combined
# shuffle with 64 distinct keys at ANY input scale; deterministic
# unlike approx_percentile's t-digest.
# ---------------------------------------------------------------------------
_H_LO, _H_HI, _H_BINS = 800.0, 600000.0, 64
_H_QS = [0.5, 0.9, 0.99]


@register(
    "orders_histogram_quantiles",
    oracle=f"""
    WITH b AS (
      SELECT least({_H_BINS - 1}, greatest(0,
               CAST(floor((CAST(o_totalprice AS DOUBLE) - {_H_LO})
                          / {(_H_HI - _H_LO) / _H_BINS}) AS INT))) AS bin,
             CAST(count(*) AS BIGINT) AS c
      FROM orders GROUP BY 1
    ),
    cum AS (
      SELECT bin, c,
             sum(c) OVER (ORDER BY bin) AS cum,
             sum(c) OVER () AS n_total
      FROM b
    ),
    qs AS (SELECT unnest(CAST([0.5, 0.9, 0.99] AS DOUBLE[])) AS q),
    hit AS (
      SELECT q,
             min(struct_pack(bin := bin, c := c, cum := cum,
                             n_total := n_total)) AS s
      FROM cum CROSS JOIN qs
      WHERE cum >= q * n_total
      GROUP BY q
    )
    SELECT q,
           CAST(s.n_total AS BIGINT) AS n_total,
           round({_H_LO} + (s.bin + (q * s.n_total - (s.cum - s.c)) / s.c)
                 * {(_H_HI - _H_LO) / _H_BINS}, 6) AS est
    FROM hit
    """,
)
def orders_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import histogram

    o = load_table(spark, sf_dir, "orders")
    bins = histogram.histogram_bins(o, "o_totalprice", _H_LO, _H_HI, _H_BINS)
    return histogram.histogram_quantiles(bins, _H_LO, _H_HI, _H_BINS, _H_QS)
