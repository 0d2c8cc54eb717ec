"""Round-11 session batch 4 — exact sequential statistics:

- events_cusum_changepoint: CUSUM change-point detection over the daily
  event-count series with INTEGER-EXACT test statistics: the CUSUM
  deviation sum_{i<=k}(x_i - mean) is carried as its integer numerator
  n_days*prefix_k - k*total (exact BIGINT in both engines — no float
  accumulation anywhere), and only the final reported statistic divides
  by n_days. Prefix sums and day indexes run through the gated
  scale-safe machinery (operators/ranking.py), so the plan holds when
  the day grain is wide (think per-minute at 100 TB).
- olap_weighted_median_price: exact quantity-weighted median of
  lineitem extended price per return flag — per-group cumulative-weight
  scan (window PARTITIONED by the group, bounded per-group sort, never
  a global window), first price where twice the cumulative weight
  reaches the group total. Cents-integer arithmetic end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import ranking
from . import events_table, query, table
from .llmops import sql_round

# ======================== CUSUM change-point ==================================


@query(
    "events_cusum_changepoint",
    f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1),
tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total,
               CAST(count(*) AS BIGINT) AS n_days
        FROM daily),
pre AS (
  SELECT day, cnt,
         CAST(sum(cnt) OVER (ORDER BY day
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS prefix,
         CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS k
  FROM daily),
stat AS (
  SELECT day, cnt, k, n_days,
         n_days * prefix - k * total AS cusum_num
  FROM pre CROSS JOIN tot)
SELECT day AS change_day, cnt AS day_count, k AS day_index, n_days,
       cusum_num,
       {sql_round("cusum_num * 1.0 / n_days", 6)} AS cusum
FROM stat
ORDER BY abs(cusum_num) DESC, day
LIMIT 1
""",
)
def events_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point over the daily event-count series: the day k
    maximizing |sum_{i<=k}(x_i - mean)| — the classic level-shift
    detector. All comparisons run on the exact integer numerator
    n_days*prefix_k - k*total (multiplying the deviation sum through by
    n_days), so the argmax is bit-deterministic in both engines and no
    float ever accumulates; the single reported float is one division
    at the end. The prefix sum and day index come from the gated
    offsets machinery (ranking.global_prefix_sum / global_ranks — a
    plain bounded window at fixture scale, partition-offset form above
    the gate), because at 100 TB the 'day' grain is really minutes or
    finer and a single-partition ordered window would be the
    plan-killer. Ties on |statistic| break on the earlier day."""
    daily = (
        events_table(spark, sf_dir)
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    tot = daily.agg(
        F.sum("cnt").cast("long").alias("total"),
        F.count(F.lit(1)).cast("long").alias("n_days"),
    )
    pre = ranking.global_prefix_sum(daily, "cnt", "day", out_col="prefix")
    ranked, _n = ranking.global_ranks(pre, "day", rank_col="k")
    stat = ranked.crossJoin(F.broadcast(tot)).withColumn(
        "cusum_num",
        F.col("n_days") * F.col("prefix") - F.col("k") * F.col("total"),
    )
    return (
        stat.select(
            F.col("day").alias("change_day"),
            F.col("cnt").alias("day_count"),
            F.col("k").cast("long").alias("day_index"),
            "n_days",
            F.col("cusum_num").cast("long").alias("cusum_num"),
            (F.round(F.col("cusum_num") * 1.0 / F.col("n_days") * 1e6) / 1e6).alias(
                "cusum"
            ),
        )
        .orderBy(F.abs(F.col("cusum_num")).desc(), "change_day")
        .limit(1)
    )


# ======================== exact weighted median ===============================


@query(
    "olap_weighted_median_price",
    """
WITH li AS (
  SELECT l_returnflag AS flag,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
         CAST(l_quantity AS BIGINT) AS w
  FROM lineitem),
tot AS (SELECT flag, CAST(sum(w) AS BIGINT) AS total_w FROM li GROUP BY flag),
cum AS (
  SELECT flag, cents, w,
         CAST(sum(w) OVER (PARTITION BY flag ORDER BY cents, w
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cw
  FROM li),
med AS (
  SELECT c.flag AS flag, min(c.cents) AS med_cents
  FROM cum c JOIN tot t ON c.flag = t.flag
  WHERE 2 * c.cw >= t.total_w
  GROUP BY c.flag)
SELECT m.flag AS flag, t.total_w AS total_weight,
       round(m.med_cents * 1.0) / 100 AS weighted_median_price
FROM med m JOIN tot t ON m.flag = t.flag
ORDER BY flag
""",
)
def olap_weighted_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact quantity-weighted median extended price per return flag —
    the 'median price of a SOLD UNIT' (not of a line item), the robust
    center a pricing analyst actually wants when line sizes vary. Lower
    weighted median by the standard definition: the smallest price whose
    cumulative weight reaches half the total. Integer cents and integer
    weights end to end — the cumulative scan, the 2*cw >= total_w
    threshold, and the argmin are all exact, so both engines agree
    bit-for-bit. The cumulative window is PARTITIONED by the group (per
    group bounded sort, the scale-safe shape); the totals ride a
    broadcast join."""
    li = table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
        F.col("l_quantity").cast("long").alias("w"),
    )
    tot = li.groupBy("flag").agg(F.sum("w").cast("long").alias("total_w"))
    w = (
        Window.partitionBy("flag")
        .orderBy("cents", "w")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = li.withColumn("cw", F.sum("w").over(w).cast("long"))
    med = (
        cum.join(F.broadcast(tot), "flag")
        .where(2 * F.col("cw") >= F.col("total_w"))
        .groupBy("flag")
        .agg(F.min("cents").alias("med_cents"))
    )
    return (
        med.join(F.broadcast(tot), "flag")
        .select(
            "flag",
            F.col("total_w").alias("total_weight"),
            (F.round(F.col("med_cents") * 1.0) / 100).alias(
                "weighted_median_price"
            ),
        )
        .orderBy("flag")
    )
