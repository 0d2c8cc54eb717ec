"""Round-7 session batch 10 — chained-stateful streaming DAU + returns /
variance / log-histogram OLAP, all with full DuckDB oracle twins.

- stream_tumbling_dau: batch run of the dedup -> windowed-aggregation
  CHAIN (two stateful operators in one streaming query — the only way
  Structured Streaming can produce an EXACT windowed distinct count in
  append mode; count(DISTINCT) is not a supported streaming aggregate).
  The streaming run is pinned equal in tests/test_streaming.py.
- olap_returns_rate_by_brand: per-brand return rate and its lift over
  the corpus baseline — integer cross-products, rate as one final
  division.
- olap_supplier_delay_variance: population variance of the order-to-ship
  day lag per supplier via the integer moments recipe (exact in BIGINT;
  n <= ~600 lines/supplier bounds the squared sums far under 2^63).
- olap_order_value_log2_histogram: powers-of-two order-value histogram
  using length(bin(cents)) as the EXACT integer log2 bucket — both
  engines produce identical binary strings, so the bucketing never
  touches floating point (no libm log).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..streaming import jobs as streaming_jobs
from . import events_table, query, table

# ============================ streaming exact DAU ============================


@query(
    "stream_tumbling_dau",
    """
SELECT (epoch_us(ts) // 3600000000) * 3600 AS bucket_start,
       CAST(count(DISTINCT user_id) AS BIGINT) AS dau
FROM events GROUP BY 1
""",
)
def stream_tumbling_dau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact hourly distinct users from the dedup -> windowed-count CHAIN
    (streaming/jobs.py:tumbling_distinct_users) — the multi-stateful-
    operator pipeline that makes exact windowed DISTINCT possible in
    append-mode streaming (dedup state holds one row per (window, user)
    inside the watermark; the downstream count is an ordinary windowed
    aggregate). This is the batch run of the IDENTICAL plan; the
    streaming availableNow run is asserted row-equal in
    tests/test_streaming.py. The oracle is the plain GROUP BY the chain
    provably equals in batch."""
    return streaming_jobs.tumbling_distinct_users(events_table(spark, sf_dir))


# ========================= returns rate by brand =============================


@query(
    "olap_returns_rate_by_brand",
    """
WITH j AS (
  SELECT p_brand AS brand,
         CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS r
  FROM lineitem JOIN part ON l_partkey = p_partkey),
b AS (SELECT brand, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(r) AS BIGINT) AS n_ret
      FROM j GROUP BY brand),
t AS (SELECT CAST(sum(n) AS BIGINT) AS tot, CAST(sum(n_ret) AS BIGINT) AS tot_ret
      FROM b)
SELECT brand, n AS n_lines, n_ret AS n_returned,
       round(CAST(n_ret AS DOUBLE) / n * 1000000) / 1000000 AS return_rate,
       CASE WHEN tot_ret = 0 THEN NULL
            ELSE round((CAST(n_ret AS DOUBLE) * tot)
                       / (CAST(n AS DOUBLE) * tot_ret) * 1000000) / 1000000
       END AS lift
FROM b CROSS JOIN t
""",
)
def olap_returns_rate_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Return rate per brand and its lift over the corpus baseline — the
    defect-concentration report (lift >> 1 = a brand quality problem,
    not general churn). Counts stay integral; rate and lift are single
    guarded divisions; the baseline is a broadcast 1-row aggregate over
    the brand rollup (never a second fact scan)."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey", F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("r")
    )
    part = table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    b = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("r").cast("long").alias("n_ret"),
        )
    )
    t = b.agg(
        F.sum("n").cast("long").alias("tot"), F.sum("n_ret").cast("long").alias("tot_ret")
    )
    return b.crossJoin(F.broadcast(t)).select(
        "brand",
        F.col("n").alias("n_lines"),
        F.col("n_ret").alias("n_returned"),
        (F.round(F.col("n_ret").cast("double") / F.col("n") * 1000000) / 1000000).alias(
            "return_rate"
        ),
        F.when(F.col("tot_ret") == 0, F.lit(None).cast("double"))
        .otherwise(
            F.round(
                (F.col("n_ret").cast("double") * F.col("tot"))
                / (F.col("n").cast("double") * F.col("tot_ret"))
                * 1000000
            )
            / 1000000
        )
        .alias("lift"),
    )


# ======================= supplier delay variance =============================


@query(
    "olap_supplier_delay_variance",
    """
WITH lag AS (
  SELECT l_suppkey,
         CAST(datediff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE))
              AS BIGINT) AS d
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
m AS (SELECT l_suppkey, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(d) AS BIGINT) AS s, CAST(sum(d * d) AS BIGINT) AS ss
      FROM lag GROUP BY l_suppkey)
SELECT l_suppkey AS suppkey, n AS n_lines,
       round(CAST(s AS DOUBLE) / n * 1000000) / 1000000 AS mean_delay_days,
       round(CAST(n * ss - s * s AS DOUBLE) / (CAST(n AS DOUBLE) * n) * 1000000)
         / 1000000 AS var_delay_days
FROM m
""",
)
def olap_supplier_delay_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship delay mean and population variance per supplier —
    the SLA-consistency screen (two suppliers with the same mean and 10x
    different variance are different risks). Integer day lags feed the
    exact BIGINT moments (n*ss - s^2); each statistic is one final
    double expression. One co-partitioned orderkey join + a supplier
    aggregate."""
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    lag = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "l_suppkey",
        F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate"))
        .cast("long")
        .alias("d"),
    )
    m = lag.groupBy("l_suppkey").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("d").cast("long").alias("s"),
        F.sum(F.col("d") * F.col("d")).cast("long").alias("ss"),
    )
    n, s = F.col("n"), F.col("s")
    return m.select(
        F.col("l_suppkey").alias("suppkey"),
        n.alias("n_lines"),
        (F.round(s.cast("double") / n * 1000000) / 1000000).alias("mean_delay_days"),
        (
            F.round(
                (n * F.col("ss") - s * s).cast("double") / (n.cast("double") * n) * 1000000
            )
            / 1000000
        ).alias("var_delay_days"),
    )


# ====================== log2 order-value histogram ===========================


@query(
    "olap_order_value_log2_histogram",
    """
WITH ov AS (
  SELECT l_orderkey,
         CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                       AS BIGINT)) AS BIGINT) AS cents
  FROM lineitem GROUP BY l_orderkey),
b AS (SELECT CAST(CASE WHEN cents <= 0 THEN 0
                       ELSE length(bin(cents)) END AS BIGINT) AS bucket
      FROM ov)
SELECT bucket, CAST(pow(CAST(2.0 AS DOUBLE), bucket - 1) AS BIGINT) AS lo_cents,
       CAST(count(*) AS BIGINT) AS n_orders
FROM b GROUP BY bucket
""",
)
def olap_order_value_log2_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-value histogram with power-of-two bins, where the bin is the
    bit length of the integer cents — length(bin(cents)) — so the
    "log-scale" bucketing is EXACT integer work on both engines (no libm
    log whose last bits differ). Doubling bins are the standard latency/
    value histogram layout (HDR-style); one order-grain aggregate + a
    <=40-bucket rollup. lo_cents (2^(bucket-1)) is derived from the
    integer bucket, exact in double far past any order value."""
    li = table(spark, sf_dir, "lineitem")
    ov = li.groupBy("l_orderkey").agg(
        F.sum(
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast(
                "long"
            )
        )
        .cast("long")
        .alias("cents")
    )
    b = ov.select(
        F.when(F.col("cents") <= 0, F.lit(0))
        .otherwise(F.length(F.bin("cents")))
        .cast("long")
        .alias("bucket")
    )
    return b.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders")
    ).select(
        "bucket",
        F.pow(F.lit(2.0), F.col("bucket") - 1).cast("long").alias("lo_cents"),
        "n_orders",
    )
