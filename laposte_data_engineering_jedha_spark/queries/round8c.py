"""Round-8 session batch 3 — revenue-concentration OLAP:

- olap_customer_decile_lift: customers bucketed into revenue deciles
  (ntile over deterministic order), each decile's revenue share and the
  cumulative lift curve — the whale-dependence report.
- olap_supplier_pareto_80: per nation, how many suppliers cover 80% of
  revenue — the Pareto concentration scalar.
- olap_order_weekday_priority: order volume by weekday x priority with
  within-weekday share — operational seasonality by urgency class.

All shares are integer ppm over BIGINT cents (floor division on both
engines); window orders carry explicit key tie-breaks so ntile/cumsum
are deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import query, table

_CENTS = "CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)"


# ========================= customer decile lift ==============================


@query(
    "olap_customer_decile_lift",
    f"""
WITH c AS (
  SELECT o_custkey, CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM orders GROUP BY o_custkey),
d AS (SELECT o_custkey, cents,
             ntile(10) OVER (ORDER BY cents DESC, o_custkey) AS decile
      FROM c),
g AS (SELECT CAST(decile AS BIGINT) AS decile,
             CAST(count(*) AS BIGINT) AS n_customers,
             CAST(sum(cents) AS BIGINT) AS cents
      FROM d GROUP BY decile),
t AS (SELECT CAST(sum(CAST(cents AS HUGEINT)) AS HUGEINT) AS total FROM g),
s AS (SELECT decile, n_customers, cents,
             CAST(CAST(cents AS HUGEINT) * 1000000 // total AS BIGINT) AS share_ppm,
             CAST(CAST(sum(CAST(cents AS HUGEINT)) OVER (ORDER BY decile
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS HUGEINT)
                  * 1000000 // total AS BIGINT) AS cum_share_ppm
      FROM g CROSS JOIN t)
SELECT decile, n_customers, cents AS revenue_cents, share_ppm, cum_share_ppm FROM s
""",
)
def olap_customer_decile_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer revenue deciles (1 = biggest spenders) with per-decile and
    cumulative revenue share — the lift/whale-dependence curve behind
    'top 10% of customers drive X% of revenue'. The ntile orders by
    (cents DESC, custkey) so ties are deterministic on both engines; the
    only unbounded window runs on the 10-row decile rollup. One customer
    aggregate, integer cents throughout. Scale note (r9): the deciles
    come from ranking.exact_ntile — two-pass partition-offset ranking,
    bit-identical to the oracle's global ntile with NO single-partition
    window (the r8 verdict's customer-grain fat-task shape); the
    approximate zero-shuffle alternative is ranking.percentile_bands."""
    from ..operators import ranking

    o = table(spark, sf_dir, "orders")
    c = o.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("cents")
    )
    d = ranking.exact_ntile(
        c, 10, F.col("cents").desc(), "o_custkey", band_col="decile"
    ).select("cents", "decile")
    g = d.groupBy("decile").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.sum("cents").cast("long").alias("cents"),
    )
    # share math in DECIMAL(38,0) (== the oracle's HUGEINT): cum * 1e6
    # overflows BIGINT already at sf1 totals (found by the r8 sf1 sweep)
    t = g.agg(
        F.sum(F.col("cents").cast("decimal(38,0)")).cast("decimal(38,0)").alias("total")
    )
    w = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    return (
        g.crossJoin(F.broadcast(t))
        .select(
            "decile",
            "n_customers",
            F.col("cents").alias("revenue_cents"),
            F.expr("(CAST(cents AS DECIMAL(38,0)) * 1000000) div total")
            .cast("long")
            .alias("share_ppm"),
            (
                F.sum(F.col("cents").cast("decimal(38,0)")).over(w).cast("decimal(38,0)")
                * 1000000
            ).alias("_cum"),
            "total",
        )
        .select(
            "decile",
            "n_customers",
            "revenue_cents",
            "share_ppm",
            F.expr("_cum div total").cast("long").alias("cum_share_ppm"),
        )
    )


# ========================= supplier pareto-80 ================================


@query(
    "olap_supplier_pareto_80",
    f"""
WITH r AS (
  SELECT n_name, s_suppkey, CAST(sum({_CENTS}) AS BIGINT) AS cents
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  GROUP BY n_name, s_suppkey),
c AS (SELECT n_name, s_suppkey, cents,
             CAST(sum(cents) OVER (PARTITION BY n_name
                     ORDER BY cents DESC, s_suppkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS cum
      FROM r),
t AS (SELECT n_name, CAST(sum(cents) AS BIGINT) AS total,
             CAST(count(*) AS BIGINT) AS n_suppliers
      FROM r GROUP BY n_name)
SELECT c.n_name AS n_name, t.n_suppliers AS n_suppliers,
       CAST(count(*) FILTER (WHERE (cum - cents) * 5 < total * 4) AS BIGINT)
         AS n_for_80pct,
       CAST(count(*) FILTER (WHERE (cum - cents) * 5 < total * 4)
            * 1000000 // t.n_suppliers AS BIGINT) AS pareto_ppm
FROM c JOIN t ON c.n_name = t.n_name
GROUP BY c.n_name, t.n_suppliers
""",
)
def olap_supplier_pareto_80(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto concentration per nation: the number of top suppliers whose
    cumulative revenue first reaches 80% of the nation's total (counted
    as suppliers whose PRECEDING cumulative is still under 0.8*total —
    the integer-exact '5*cum < 4*total' form, no float thresholds) and
    that count as a ppm of the supplier base. Fact aggregates once with
    broadcast dims; the cumsum window runs at supplier grain partitioned
    by nation."""
    li = table(spark, sf_dir, "lineitem")
    sup = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cents = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast(
        "long"
    )
    r = (
        li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name", "s_suppkey")
        .agg(F.sum(cents).cast("long").alias("cents"))
    )
    w = (
        Window.partitionBy("n_name")
        .orderBy(F.col("cents").desc(), "s_suppkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    c = r.select("n_name", "cents", F.sum("cents").over(w).cast("long").alias("cum"))
    t = r.groupBy("n_name").agg(
        F.sum("cents").cast("long").alias("total"),
        F.count(F.lit(1)).cast("long").alias("n_suppliers"),
    )
    hit = F.when((F.col("cum") - F.col("cents")) * 5 < F.col("total") * 4, 1)
    return (
        c.join(F.broadcast(t), "n_name")
        .groupBy("n_name", "n_suppliers")
        .agg(
            F.count(hit).cast("long").alias("n_for_80pct"),
            F.expr(
                "(count(CASE WHEN (cum - cents) * 5 < total * 4 THEN 1 END)"
                " * 1000000) div n_suppliers"
            )
            .cast("long")
            .alias("pareto_ppm"),
        )
        .select("n_name", "n_suppliers", "n_for_80pct", "pareto_ppm")
    )


# ======================= weekday x priority matrix ===========================


@query(
    "olap_order_weekday_priority",
    """
WITH o AS (
  SELECT CAST(dayofweek(CAST(o_orderdate AS DATE)) AS BIGINT) AS dow,
         o_orderpriority AS priority,
         CAST(count(*) AS BIGINT) AS n_orders
  FROM orders GROUP BY 1, 2),
t AS (SELECT dow, CAST(sum(n_orders) AS BIGINT) AS day_total FROM o GROUP BY dow)
SELECT o.dow AS dow, priority, n_orders,
       CAST(n_orders * 1000000 // day_total AS BIGINT) AS day_share_ppm
FROM o JOIN t ON o.dow = t.dow
""",
)
def olap_order_weekday_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order volume by weekday x priority plus each priority's share of
    its weekday — the 'do urgent orders cluster on Mondays' operational
    matrix. dow uses DuckDB's Sunday=0 convention (Spark's dayofweek is
    Sunday=1, shifted by one). Two bounded rollups (<=7x|priorities|
    rows); the share join broadcasts the 7-row day totals."""
    o = (
        table(spark, sf_dir, "orders")
        .groupBy(
            (F.dayofweek(F.to_date("o_orderdate")) - 1).cast("long").alias("dow"),
            F.col("o_orderpriority").alias("priority"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_orders"))
    )
    t = o.groupBy("dow").agg(F.sum("n_orders").cast("long").alias("day_total"))
    return o.join(F.broadcast(t), "dow").select(
        "dow",
        "priority",
        "n_orders",
        F.expr("(n_orders * 1000000) div day_total").cast("long").alias("day_share_ppm"),
    )
