"""OLAP analytics queries over the TPC-H-shaped tables — the classic
warehouse shapes (pricing summary, selective revenue scan, join+top-k,
windowed ranking) expressed Catalyst-first, each with a DuckDB oracle twin.

These go beyond the reference's surface (it has no group-by at all) and
exist to prove the engine side of "analytics engine": multi-key hash
aggregation with partial (map-side) combine, broadcast dimension joins,
deterministic top-k, and window ranking — the plans Spark must get right
at 100 TB.

Cross-engine float discipline: every SUM over row-dependent doubles runs
through DECIMAL(18,4) internally (exact, order-free — a double sum would
be partition-order dependent) and casts to double at the end; AVG is the
quotient of two exact decimal aggregates, divided in double.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import query, spread_table, table

_DEC = "decimal(18,4)"


def _dsum(col) -> F.Column:
    return F.sum(col.cast(_DEC))


@query(
    "olap_pricing_summary",
    """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
         AS sum_disc_price,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
         / count(*) AS avg_qty,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-09-01 00:00:00'
GROUP BY l_returnflag, l_linestatus""",
)
def olap_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: single-pass multi-aggregate scan. One shuffle over
    (returnflag, linestatus) — 6 groups — after map-side partial
    aggregation; the scan prunes to 5 columns and pushes the shipdate
    predicate into parquet."""
    # 5 decimal multiply-aggregates over a single-task scan at bench scale:
    # spread across cores (guide §2.5); decimal sums + counts are order-free
    # exact, and the shipdate predicate still pushes through the exchange
    # into the parquet scan
    li = spread_table(spark, sf_dir, "lineitem", key="l_orderkey").where(
        F.col("l_shipdate") <= F.lit("2001-09-01 00:00:00").cast("timestamp")
    )
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        _dsum(F.col("l_quantity")).cast("double").alias("sum_qty"),
        _dsum(F.col("l_extendedprice")).cast("double").alias("sum_base_price"),
        _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
        .cast("double")
        .alias("sum_disc_price"),
        (_dsum(F.col("l_quantity")).cast("double") / F.count(F.lit(1))).alias("avg_qty"),
        F.count(F.lit(1)).alias("count_order"),
    )


@query(
    "olap_revenue_filter",
    """
SELECT CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) AS DOUBLE)
         AS revenue,
       count(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN CAST(0.05 AS DOUBLE) AND CAST(0.07 AS DOUBLE)
  AND l_quantity < CAST(24.0 AS DOUBLE)""",
)
def olap_revenue_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: highly selective scan -> global aggregate. All four
    predicates push down to the parquet reader (PushedFilters); the
    aggregate is a two-phase partial/final with no group keys."""
    li = table(spark, sf_dir, "lineitem")
    return li.where(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24.0)
    ).agg(
        _dsum(F.col("l_extendedprice") * F.col("l_discount"))
        .cast("double")
        .alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@query(
    "olap_topk_customers",
    """
SELECT c_custkey, c_mktsegment,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
         AS revenue,
       count(*) AS n_lines
FROM customer
JOIN orders ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE o_orderstatus = 'F'
GROUP BY c_custkey, c_mktsegment
ORDER BY revenue DESC, c_custkey LIMIT 10""",
)
def olap_topk_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: fact-to-dim joins + grouped revenue + deterministic
    top-k. customer and (filtered) orders both broadcast, so lineitem — the
    only big table — never shuffles for the joins; the single exchange is
    the group-by on custkey, and the top-k is a TakeOrderedAndProject (no
    global sort materialization)."""
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    orders = (
        table(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_custkey")
    )
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    return (
        li.join(F.broadcast(orders), li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(10)
    )


@query(
    "join_semi_open_orders",
    """
SELECT o_orderpriority, count(*) AS n_orders
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > TIMESTAMP '2000-01-01 00:00:00')
GROUP BY o_orderpriority""",
)
def join_semi_open_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join (TPC-H Q4 shape): orders having >=1 late-shipped line.
    Semi joins never duplicate the left side, so no post-join distinct is
    needed — the probe side short-circuits on first match."""
    orders = table(spark, sf_dir, "orders")
    late = (
        table(spark, sf_dir, "lineitem")
        .where(F.col("l_shipdate") > F.lit("2000-01-01 00:00:00").cast("timestamp"))
        .select("l_orderkey")
    )
    return (
        orders.join(late, orders.o_orderkey == late.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@query(
    "join_anti_customers_no_orders",
    """
SELECT c_mktsegment, count(*) AS n_customers
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00')
GROUP BY c_mktsegment""",
)
def join_anti_customers_no_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join: customers with no order since 1997, by segment — the
    null-safe NOT EXISTS shape (anti join avoids NOT IN's null trap)."""
    cust = table(spark, sf_dir, "customer")
    orders = (
        table(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        .select("o_custkey")
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@query(
    "setop_intersect_repeat_buyers",
    """
SELECT o_custkey AS custkey FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
INTERSECT
SELECT o_custkey FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'""",
)
def setop_intersect_repeat_buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct semantics): customers active in both 1996 and
    1997. Catalyst plans it as a left-semi join over pre-aggregated sides."""
    orders = table(spark, sf_dir, "orders")

    def active(year: int):
        return orders.where(
            (F.col("o_orderdate") >= F.lit(f"{year}-01-01 00:00:00").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit(f"{year + 1}-01-01 00:00:00").cast("timestamp"))
        ).select(F.col("o_custkey").alias("custkey"))

    return active(1996).intersect(active(1997))


@query(
    "setop_except_lapsed_buyers",
    """
SELECT o_custkey AS custkey FROM orders
WHERE o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
EXCEPT
SELECT o_custkey FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'""",
)
def setop_except_lapsed_buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct semantics): customers who ordered before 1997 but
    never after — planned as a left-anti join."""
    orders = table(spark, sf_dir, "orders")
    cutoff = F.lit("1997-01-01 00:00:00").cast("timestamp")
    before = orders.where(F.col("o_orderdate") < cutoff).select(
        F.col("o_custkey").alias("custkey")
    )
    after = orders.where(F.col("o_orderdate") >= cutoff).select(
        F.col("o_custkey").alias("custkey")
    )
    return before.subtract(after)


@query(
    "olap_rollup_revenue",
    """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
         AS revenue,
       count(*) AS n_lines
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)""",
)
def olap_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy: (flag, status) -> (flag) -> grand total in one
    pass — Spark expands grouping sets map-side, so the scan is still
    single. NULL grouping markers match ANSI semantics in both engines.
    Spread (guide §2.5): the 3x grouping-set expand + decimal sum is pure
    per-row CPU on a 1-task scan at bench scale; order-free exact."""
    li = spread_table(spark, sf_dir, "lineitem", key="l_orderkey")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
        .cast("double")
        .alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@query(
    "olap_cube_counts",
    """
SELECT l_returnflag, l_linestatus,
       GROUPING(l_returnflag) AS g_flag, GROUPING(l_linestatus) AS g_status,
       count(*) AS n_lines
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)""",
)
def olap_cube_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (flag, status) with GROUPING markers — all 2^2 grouping
    sets in one scan; the grouping() bits disambiguate real NULL data from
    subtotal rows (both engines use identical ANSI semantics)."""
    li = table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.grouping("l_returnflag").alias("g_flag"),
        F.grouping("l_linestatus").alias("g_status"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@query(
    "olap_grouping_sets",
    """
SELECT l_returnflag, l_linestatus,
       GROUPING(l_returnflag) AS g_flag, GROUPING(l_linestatus) AS g_status,
       count(*) AS n_lines
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""",
)
def olap_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — the per-dimension marginals + grand total
    WITHOUT the cross products a CUBE would compute: ((flag), (status),
    ()). One scan, map-side grouping-set expansion, GROUPING() markers
    disambiguate subtotal rows from real NULLs (ANSI semantics in both
    engines). Completes the rollup/cube/grouping-sets family."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupingSets(
        [["l_returnflag"], ["l_linestatus"], []], "l_returnflag", "l_linestatus"
    ).agg(
        F.grouping("l_returnflag").alias("g_flag"),
        F.grouping("l_linestatus").alias("g_status"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@query(
    "events_retention_cohorts",
    """
WITH first AS (
  SELECT user_id, min(CAST(ts AS DATE)) AS cohort FROM events GROUP BY 1),
act AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
r AS (
  SELECT f.cohort, datediff('day', f.cohort, a.d) AS day_offset
  FROM first f JOIN act a USING (user_id))
SELECT cohort, day_offset, count(*) AS n_users
FROM r WHERE day_offset <= 14
GROUP BY 1, 2""",
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users grouped by first-activity date,
    counted per day-offset of later activity (0..14) — the
    product-analytics companion to the funnel. Scale shape: both the
    first-activity aggregate and the distinct-activity set hash-partition
    on user_id, the join is co-partitioned on that same key (no second
    shuffle of the big side), and the final aggregate is
    (cohort, offset)-keyed — bounded output."""
    from . import events_table

    ev = events_table(spark, sf_dir)
    first = ev.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("cohort"))
    act = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    return (
        first.join(act, "user_id")
        .select("cohort", F.datediff("d", "cohort").alias("day_offset"))
        .where(F.col("day_offset") <= 14)
        .groupBy("cohort", "day_offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


@query(
    "olap_nation_share",
    """
WITH rev AS (
  SELECT n_name, CAST(year(l_shipdate) AS INTEGER) AS yr,
         CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
              AS DOUBLE) AS revenue
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  GROUP BY 1, 2)
SELECT n_name, yr, revenue,
       round((revenue / sum(revenue) OVER (PARTITION BY yr)) * 10000) / 10000
         AS share
FROM rev""",
)
def olap_nation_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier-nation revenue share per ship year: the windowed-ratio
    OLAP pattern. Both dimension joins broadcast (supplier + nation are
    small sides), revenue aggregates through DECIMAL (order-free exact),
    and the share window runs over the tiny (nation x year) aggregate —
    the fact table shuffles exactly once, for its own groupBy."""
    li = table(spark, sf_dir, "lineitem")
    sup = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rev = (
        li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .groupBy("n_name", F.year("l_shipdate").alias("yr"))
        .agg(
            _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            .cast("double")
            .alias("revenue")
        )
    )
    w = Window.partitionBy("yr")
    return rev.select(
        "n_name",
        "yr",
        "revenue",
        (F.round((F.col("revenue") / F.sum("revenue").over(w)) * 10000) / 10000).alias(
            "share"
        ),
    )


@query(
    "events_ab_conversion",
    f"""
WITH assign AS (
  SELECT DISTINCT user_id,
         CAST({{md5u}} % 2 AS INTEGER) AS variant
  FROM events),
conv AS (
  SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
SELECT a.variant, count(*) AS n_users,
       CAST(count(c.user_id) AS BIGINT) AS n_converted,
       round((CAST(count(c.user_id) AS DOUBLE) / count(*)) * 10000) / 10000
         AS conversion_rate
FROM assign a LEFT JOIN conv c ON a.user_id = c.user_id
GROUP BY 1""".format(
        md5u="CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8) AS BIGINT)"
    ),
)
def events_ab_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic A/B split report: users hash into two variants
    (md5(user_id) % 2 — stable across runs/engines, the experiment
    bucketing every growth pipeline needs), conversion = any purchase
    event. Two user_id-keyed distinct aggregates, one co-partitioned
    join, two output rows."""
    from ..functions import texts
    from . import events_table

    ev = events_table(spark, sf_dir)
    assign = ev.select("user_id").distinct().select(
        "user_id",
        (texts.md5int32(F.col("user_id").cast("string")) % 2).cast("int").alias("variant"),
    )
    conv = (
        ev.where(F.col("event_type") == "purchase")
        .select(F.col("user_id").alias("c_user"))
        .distinct()
    )
    return (
        assign.join(conv, assign.user_id == conv.c_user, "left")
        .groupBy("variant")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.count("c_user").alias("n_converted"),
        )
        .select(
            "variant",
            "n_users",
            "n_converted",
            (F.round((F.col("n_converted").cast("double") / F.col("n_users")) * 10000) / 10000).alias(
                "conversion_rate"
            ),
        )
    )


EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]


@query(
    "events_pivot_type_counts",
    f"""
SELECT user_id,
       {", ".join(f"count(*) FILTER (event_type = '{t}') AS {t}" for t in EVENT_TYPES)}
FROM events GROUP BY user_id""",
)
def events_pivot_type_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: per-user event-type counts as columns. The value list is
    explicit (EVENT_TYPES) — at scale an unlisted pivot forces an extra
    distinct-values job and an unbounded schema; the oracle is the
    equivalent conditional aggregation."""
    from . import events_table

    ev = events_table(spark, sf_dir)
    return (
        ev.groupBy("user_id")
        .pivot("event_type", EVENT_TYPES)
        .agg(F.count(F.lit(1)))
        .na.fill(0, EVENT_TYPES)
    )


@query(
    "olap_above_class_avg",
    """
WITH w AS (
  SELECT o_orderkey, o_orderpriority, o_totalprice,
         CAST(avg(CAST(o_totalprice AS DECIMAL(18,4)))
              OVER (PARTITION BY o_orderpriority) AS DOUBLE) AS class_avg
  FROM orders)
SELECT o_orderpriority, count(*) AS n_above,
       CAST(max(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS max_price
FROM w WHERE o_totalprice > class_avg
GROUP BY o_orderpriority""",
)
def olap_above_class_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated-aggregate filter (orders above their priority class's
    average) via a window aggregate — the DataFrame form of a correlated
    scalar subquery. The class average aggregates DECIMAL internally so
    the comparison boundary is identical across engines and partition
    orders."""
    orders = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority")
    avg_price = (
        F.avg(F.col("o_totalprice").cast(_DEC)).over(w).cast("double")
    )
    return (
        orders.withColumn("class_avg", avg_price)
        .where(F.col("o_totalprice") > F.col("class_avg"))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_above"),
            F.max(F.col("o_totalprice").cast(_DEC)).cast("double").alias("max_price"),
        )
    )


@query(
    "olap_monthly_top_supplier",
    """
WITH rev AS (
  SELECT date_trunc('month', l_shipdate) AS ship_month, l_suppkey,
         CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
           AS revenue
  FROM lineitem GROUP BY 1, 2),
ranked AS (
  SELECT *, rank() OVER (PARTITION BY ship_month
                         ORDER BY revenue DESC, l_suppkey) AS rnk
  FROM rev)
SELECT ship_month, l_suppkey, revenue FROM ranked WHERE rnk = 1""",
)
def olap_monthly_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed ranking: revenue per (month, supplier), keep each month's
    top supplier. Group-by shuffle on (month, suppkey), then a window
    shuffle on month; rank ties broken by suppkey for determinism."""
    li = table(spark, sf_dir, "lineitem")
    rev = (
        li.groupBy(
            F.date_trunc("month", "l_shipdate").alias("ship_month"), "l_suppkey"
        )
        .agg(
            _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            .cast("double")
            .alias("revenue")
        )
    )
    w = Window.partitionBy("ship_month").orderBy(F.col("revenue").desc(), "l_suppkey")
    return (
        rev.withColumn("rnk", F.rank().over(w))
        .where(F.col("rnk") == 1)
        .select("ship_month", "l_suppkey", "revenue")
    )
