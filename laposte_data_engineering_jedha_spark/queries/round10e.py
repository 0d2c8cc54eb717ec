"""Round-10 session batch 5 — grouped regression:

- olap_revenue_trend_by_segment: closed-form per-group OLS (slope /
  intercept / r^2) of daily revenue against time, one segment per
  group — the grouped-trend primitive behind growth dashboards and
  drift monitors. All five sufficient statistics (n, Sx, Sy, Sxy, Sxx,
  Syy) are EXACT integer sums (x = epoch day, y = integer cents), so
  the only floating-point steps are the final three divisions — both
  engines compute bit-identical numerators/denominators and the result
  hash-matches at 6 decimals without an epsilon. One partial-aggregated
  scan, |segments| output rows; the sufficient-statistic shape is the
  canonical map-side-combine regression at any scale (the same five
  sums merge associatively across 1000 executors).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import query, table
from .llmops import sql_round

_RT_DAY0 = "1992-01-01"  # epoch origin for x: keeps day numbers small


@query(
    "olap_revenue_trend_by_segment",
    f"""
WITH d AS (
  SELECT c_mktsegment AS segment,
         date_diff('day', DATE '{_RT_DAY0}', CAST(o_orderdate AS DATE)) AS x,
         CAST(round(o_totalprice * 100) AS BIGINT) AS y
  FROM orders JOIN customer ON o_custkey = c_custkey),
s AS (
  SELECT segment,
         CAST(count(*) AS HUGEINT) AS n,
         CAST(sum(x) AS HUGEINT) AS sx,
         CAST(sum(y) AS HUGEINT) AS sy,
         CAST(sum(CAST(x AS BIGINT) * y) AS HUGEINT) AS sxy,
         CAST(sum(CAST(x AS BIGINT) * x) AS HUGEINT) AS sxx,
         CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy
  FROM d GROUP BY segment),
t AS (
  SELECT segment, n,
         n * sxy - sx * sy AS num,
         n * sxx - sx * sx AS den,
         n * syy - sy * sy AS sst,
         sx, sy
  FROM s)
SELECT segment, CAST(n AS BIGINT) AS n,
       {sql_round("num * 1.0 / den", 6)} AS slope_cents_per_day,
       {sql_round("(sy * 1.0 / n) - (num * 1.0 / den) * (sx * 1.0 / n)", 2)}
         AS intercept_cents,
       {sql_round("(num * 1.0 / den) * (num * 1.0 / sst)", 6)} AS r2
FROM t
""",
)
def olap_revenue_trend_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-market-segment OLS trend of order value vs order date:
    slope (cents/day), intercept (cents at {_RT_DAY0}), and r^2, from
    the five exact integer sufficient statistics — the shape that
    map-side-combines: each executor folds its partition into (n, Sx,
    Sy, Sxy, Sxx, Syy), the merge is addition, and a 1000-executor
    cluster ships 6 numbers per (segment, partition). Cross-products
    exceed int64 already at sf0.1 (n * Sxy ~ 1e20 — the first closing
    bench caught the long overflow), so every product rides
    DECIMAL(38,0) (HUGEINT in the oracle); num^2 would exceed even 38
    digits, so r^2 is computed as the product of two exact-ratio
    doubles in the same expression order on both engines. customer is
    broadcast onto the orders scan."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    d = o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"]).select(
        F.col("c_mktsegment").alias("segment"),
        F.datediff(F.to_date("o_orderdate"), F.lit(_RT_DAY0).cast("date"))
        .cast("long")
        .alias("x"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("y"),
    )
    dec = "decimal(38,0)"
    s = d.groupBy("segment").agg(
        F.count(F.lit(1)).cast(dec).alias("n"),
        F.sum("x").cast(dec).alias("sx"),
        F.sum("y").cast(dec).alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast(dec).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast(dec).alias("sxx"),
        F.sum(F.col("y").cast(dec) * F.col("y")).cast(dec).alias("syy"),
    )
    # cross-products exceed int64 at sf0.1 (n * Sxy ~ 1e20): every product
    # rides DECIMAL(38,0) (HUGEINT in the oracle); num^2 would exceed even
    # decimal(38), so r^2 is the PRODUCT OF TWO EXACT-RATIO DOUBLES —
    # identical expression order both engines, hence identical doubles
    t = s.select(
        "segment",
        "n",
        "sx",
        "sy",
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).alias("num"),
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).alias("den"),
        (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).alias("sst"),
    )
    slope = F.col("num") * 1.0 / F.col("den")
    return t.select(
        "segment",
        F.col("n").cast("long").alias("n"),
        (F.round(slope * 1e6) / 1e6).alias("slope_cents_per_day"),
        (
            F.round(
                (
                    (F.col("sy") * 1.0 / F.col("n"))
                    - slope * (F.col("sx") * 1.0 / F.col("n"))
                )
                * 100
            )
            / 100
        ).alias("intercept_cents"),
        (
            F.round(slope * (F.col("num") * 1.0 / F.col("sst")) * 1e6) / 1e6
        ).alias("r2"),
    )
