"""Round-7 session batch 7 — interval accounting, exact medians, and
transition timing, all with full DuckDB oracle twins.

- olap_open_order_backlog: how many orders are OPEN (placed, not yet
  fully shipped) at the end of each day — computed with the +1/-1 delta
  trick (every order contributes an open event at o_orderdate and a
  close event at its max ship date) and ONE cumulative window over the
  day grain. This is the canonical scale rewrite of "count intervals
  covering each point": the naive day x order range join is
  |days| * |orders|, the delta encoding is two narrow aggregates plus a
  calendar-bounded window.
- olap_monthly_median_order_value: exact interpolated median and p90 of
  order value cents per month (Spark `percentile` == DuckDB
  `quantile_cont`, the ship_cycle_percentiles pairing).
- events_transition_timing: per (prev_type -> type) transition, the
  count and exact p50/p90 of the gap in integer microseconds — the
  latency companion to events_markov_transitions (which counts
  transitions but not how long they take).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import events_table, query, table

# =========================== open-order backlog ==============================


@query(
    "olap_open_order_backlog",
    """
WITH ship AS (
  SELECT l_orderkey AS okey, max(CAST(l_shipdate AS DATE)) AS close_day
  FROM lineitem GROUP BY l_orderkey),
deltas AS (
  SELECT CAST(o_orderdate AS DATE) AS day, 1 AS delta FROM orders
  UNION ALL
  SELECT s.close_day AS day, -1 AS delta
  FROM orders o JOIN ship s ON o.o_orderkey = s.okey),
byday AS (
  SELECT day, CAST(sum(delta) AS BIGINT) AS net FROM deltas GROUP BY day)
SELECT day, net,
       CAST(sum(net) OVER (ORDER BY day
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS open_orders
FROM byday
""",
)
def olap_open_order_backlog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-of-day open-order backlog via delta encoding: +1 on the order
    date, -1 on the order's final ship date (orders with no lineitem
    never close), summed per day and accumulated with one cumulative
    window over the calendar-bounded day grain. The naive formulation —
    join every day against every order whose interval covers it — is
    |days| x |orders|; the delta form is two narrow aggregates and a
    window whose input is bounded by the calendar no matter the corpus
    size. The global window is at the day grain (~365 rows/year), not a
    scale surface."""
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    ship = li.groupBy(F.col("l_orderkey").alias("okey")).agg(
        F.max(F.to_date("l_shipdate")).alias("close_day")
    )
    opens = orders.select(F.to_date("o_orderdate").alias("day"), F.lit(1).alias("delta"))
    closes = orders.join(ship, orders.o_orderkey == ship.okey).select(
        F.col("close_day").alias("day"), F.lit(-1).alias("delta")
    )
    byday = (
        opens.unionAll(closes)
        .groupBy("day")
        .agg(F.sum("delta").cast("long").alias("net"))
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return byday.select(
        "day", "net", F.sum("net").over(w).cast("long").alias("open_orders")
    )


# ======================= monthly median order value ==========================


@query(
    "olap_monthly_median_order_value",
    """
WITH ov AS (
  SELECT l_orderkey,
         strftime(min(CAST(l_shipdate AS DATE)), '%Y-%m') AS month,
         CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                       AS BIGINT)) AS BIGINT) AS cents
  FROM lineitem GROUP BY l_orderkey)
SELECT month, CAST(count(*) AS BIGINT) AS n_orders,
       quantile_cont(cents, 0.5) / 100 AS median_value,
       quantile_cont(cents, 0.9) / 100 AS p90_value
FROM ov GROUP BY month
""",
)
def olap_monthly_median_order_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated median and p90 of order value per first-ship
    month. Order values are integer cents (one order-grain aggregate);
    the percentile groups are |months|-sized. Spark `percentile` and
    DuckDB `quantile_cont` share the same (n-1)*p interpolation rule —
    the olap_ship_cycle_percentiles pairing — and the final /100 is the
    only other float op."""
    li = table(spark, sf_dir, "lineitem")
    ov = li.groupBy("l_orderkey").agg(
        F.date_format(F.min(F.to_date("l_shipdate")), "yyyy-MM").alias("month"),
        F.sum(
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast(
                "long"
            )
        )
        .cast("long")
        .alias("cents"),
    )
    return ov.groupBy("month").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        (F.expr("percentile(cents, 0.5)") / 100).alias("median_value"),
        (F.expr("percentile(cents, 0.9)") / 100).alias("p90_value"),
    )


# =========================== transition timing ===============================


@query(
    "events_transition_timing",
    """
WITH s AS (
  SELECT user_id, event_type, epoch_us(ts) AS us,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type,
         lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_us
  FROM events)
SELECT prev_type, event_type AS next_type,
       CAST(count(*) AS BIGINT) AS n,
       quantile_cont(us - prev_us, 0.5) AS p50_gap_us,
       quantile_cont(us - prev_us, 0.9) AS p90_gap_us
FROM s WHERE prev_type IS NOT NULL
GROUP BY prev_type, event_type
""",
)
def events_transition_timing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How long each event-type transition takes: per (prev -> next)
    pair, the count and exact p50/p90 of the inter-event gap in integer
    microseconds — the latency companion to events_markov_transitions'
    probability matrix (a funnel that converts in median 40 s is a
    different product than one converting in 2 days at the same rate).
    One user_id window pass feeds a |types^2|-group percentile
    aggregate; gaps are integer micros so the dyadic-fraction
    interpolation is bit-exact cross-engine."""
    ev = events_table(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.select(
        "event_type",
        F.unix_micros("ts").alias("us"),
        F.lag("event_type").over(w).alias("prev_type"),
        F.lag(F.unix_micros("ts")).over(w).alias("prev_us"),
    ).where(F.col("prev_type").isNotNull())
    return s.groupBy("prev_type", F.col("event_type").alias("next_type")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.expr("percentile(us - prev_us, 0.5)").alias("p50_gap_us"),
        F.expr("percentile(us - prev_us, 0.9)").alias("p90_gap_us"),
    )
