"""Round-8 session batch 8 — attribution, fulfillment, and migration:

- events_attribution_time_decay: time-decay multi-touch attribution with
  EXACT dyadic weights — each click preceding a purchase within 24 h gets
  weight 2^-k for its 6 h-bucket age k, so the credit mass is integer
  arithmetic end to end (no pow(), no float decay accumulation).
- olap_fulfillment_latency_by_size: order fulfillment latency (order date
  -> last line shipped) percentiles by power-of-two order-size band —
  'do big orders ship slower'.
- olap_customer_migration: year-over-year spend-tercile transition matrix
  (1997 -> 1998) — the segment-migration report behind churn/upsell
  planning; terciles via deterministic ntile, counts integral.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import events_table, query, table

# ====================== time-decay attribution ===============================

_ATT_WINDOW_US = 24 * 3_600_000_000
_ATT_BUCKET_US = 6 * 3_600_000_000  # k = age div 6h; weight = 2^-k, k in 0..3


@query(
    "events_attribution_time_decay",
    f"""
WITH c AS (SELECT user_id, epoch_us(ts) AS c_us FROM events
           WHERE event_type = 'click'),
p AS (SELECT user_id, epoch_us(ts) AS p_us FROM events
      WHERE event_type = 'purchase'),
j AS (
  SELECT (p_us - c_us) // {_ATT_BUCKET_US} AS k
  FROM c JOIN p USING (user_id)
  WHERE c_us <= p_us AND p_us - c_us < {_ATT_WINDOW_US}),
w AS (SELECT CAST(k AS BIGINT) AS k, CAST(count(*) AS BIGINT) AS n_credits,
             CAST(count(*) * (1 << (3 - CAST(k AS INTEGER))) AS BIGINT) AS weight_units
      FROM j GROUP BY k),
t AS (SELECT CAST(sum(weight_units) AS BIGINT) AS total FROM w)
SELECT k AS age_bucket_6h, n_credits, weight_units,
       CAST(weight_units * 1000000 // total AS BIGINT) AS credit_share_ppm
FROM w CROSS JOIN t
""",
)
def events_attribution_time_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-decay attribution: every click within 24 h BEFORE a purchase
    by the same user earns weight 2^-k (k = age div 6 h) — weights are
    exact powers of two, so total credit is an integer unit count
    (2^(3-k) units per click) and shares are integer ppm. The click x
    purchase join co-partitions on user_id (bounded per-user fan-out);
    the rollup is 4 rows. The decay view tells you how much credit a
    longer lookback actually buys."""
    ev = events_table(spark, sf_dir)
    c = ev.where(F.col("event_type") == "click").select(
        "user_id", F.unix_micros("ts").alias("c_us")
    )
    p = ev.where(F.col("event_type") == "purchase").select(
        "user_id", F.unix_micros("ts").alias("p_us")
    )
    j = (
        c.join(p, "user_id")
        .where(
            (F.col("c_us") <= F.col("p_us"))
            & (F.col("p_us") - F.col("c_us") < _ATT_WINDOW_US)
        )
        .select(
            F.expr(f"(p_us - c_us) div {_ATT_BUCKET_US}").alias("k")
        )
    )
    w = (
        j.select(F.col("k").cast("long").alias("k"))
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_credits"),
            F.expr("count(*) * shiftleft(1, CAST(3 - k AS INT))")
            .cast("long")
            .alias("weight_units"),
        )
    )
    t = w.agg(F.sum("weight_units").cast("long").alias("total"))
    return w.crossJoin(F.broadcast(t)).select(
        F.col("k").alias("age_bucket_6h"),
        "n_credits",
        "weight_units",
        F.expr("(weight_units * 1000000) div total")
        .cast("long")
        .alias("credit_share_ppm"),
    )


# ==================== fulfillment latency by order size ======================


@query(
    "olap_fulfillment_latency_by_size",
    """
WITH o AS (
  SELECT l_orderkey,
         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty,
         max(l_shipdate) AS last_ship
  FROM lineitem GROUP BY l_orderkey),
j AS (
  SELECT CAST(length(bin(qty)) AS BIGINT) AS size_band,
         CAST(datediff('day', CAST(o_orderdate AS DATE), CAST(last_ship AS DATE))
              AS BIGINT) AS latency_days
  FROM o JOIN orders ON l_orderkey = o_orderkey)
SELECT size_band, CAST(count(*) AS BIGINT) AS n_orders,
       quantile_cont(latency_days, 0.5) AS p50_days,
       quantile_cont(latency_days, 0.9) AS p90_days,
       CAST(max(latency_days) AS BIGINT) AS max_days
FROM j GROUP BY size_band
""",
)
def olap_fulfillment_latency_by_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order fulfillment latency (order placement -> LAST line shipped) by
    power-of-two total-quantity band (bit-length bucketing, no libm) —
    the 'do big orders ship slower' operations report. One line-grain
    reduce to order grain, a co-partitioned orderkey join, a <=|bands|
    percentile rollup on integer days."""
    li = table(spark, sf_dir, "lineitem")
    o = li.groupBy("l_orderkey").agg(
        F.sum(F.col("l_quantity").cast("long")).cast("long").alias("qty"),
        F.max("l_shipdate").alias("last_ship"),
    )
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    j = o.join(orders, o.l_orderkey == orders.o_orderkey).select(
        F.length(F.bin("qty")).cast("long").alias("size_band"),
        F.datediff(F.to_date("last_ship"), F.to_date("o_orderdate"))
        .cast("long")
        .alias("latency_days"),
    )
    return j.groupBy("size_band").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.expr("percentile(latency_days, 0.5)").alias("p50_days"),
        F.expr("percentile(latency_days, 0.9)").alias("p90_days"),
        F.max("latency_days").cast("long").alias("max_days"),
    )


# ======================== customer tercile migration =========================

_MIG_Y0, _MIG_Y1 = 1997, 1998


def _sql_terciles(year: int, alias: str) -> str:
    return f"""
{alias} AS (
  SELECT o_custkey,
         ntile(3) OVER (ORDER BY cents DESC, o_custkey) AS tercile
  FROM (
    SELECT o_custkey,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
    FROM orders WHERE year(CAST(o_orderdate AS DATE)) = {year}
    GROUP BY o_custkey))"""


@query(
    "olap_customer_migration",
    f"""
WITH {_sql_terciles(_MIG_Y0, 'a')},
{_sql_terciles(_MIG_Y1, 'b')},
m AS (
  SELECT coalesce(CAST(a.tercile AS BIGINT), 0) AS from_tercile,
         coalesce(CAST(b.tercile AS BIGINT), 0) AS to_tercile
  FROM a FULL OUTER JOIN b ON a.o_custkey = b.o_custkey)
SELECT from_tercile, to_tercile, CAST(count(*) AS BIGINT) AS n_customers
FROM m GROUP BY from_tercile, to_tercile
""",
)
def olap_customer_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year spend-tercile migration matrix ({_MIG_Y0} ->
    {_MIG_Y1}): customers ranked into terciles per year (deterministic
    ntile over (cents DESC, custkey)), full-outer-joined so tercile 0
    means 'absent that year' (churned in / out). The matrix is the
    segment-migration report behind retention planning. Two bounded
    customer-grain aggregates + one co-partitioned key join; the
    terciles come from ranking.exact_ntile (r9) — two-pass partition-
    offset ranking, bit-identical to the oracle's global ntile with NO
    single-partition customer-grain window."""
    from ..operators import ranking

    o = table(spark, sf_dir, "orders")

    def terciles(year: int) -> DataFrame:
        c = (
            o.where(F.year(F.to_date("o_orderdate")) == year)
            .groupBy("o_custkey")
            .agg(
                F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
                .cast("long")
                .alias("cents")
            )
        )
        return ranking.exact_ntile(
            c, 3, F.col("cents").desc(), "o_custkey", band_col="tercile"
        ).select("o_custkey", "tercile")

    a = terciles(_MIG_Y0).withColumnRenamed("tercile", "ta")
    b = terciles(_MIG_Y1).withColumnRenamed("tercile", "tb")
    m = a.join(b, "o_custkey", "full_outer").select(
        F.coalesce("ta", F.lit(0)).cast("long").alias("from_tercile"),
        F.coalesce("tb", F.lit(0)).cast("long").alias("to_tercile"),
    )
    return m.groupBy("from_tercile", "to_tercile").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers")
    )
