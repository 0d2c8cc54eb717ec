"""Round-7 session batch 4 — time-series operators over the event stream,
all with full DuckDB oracle twins.

- events_holt_linear: Holt double exponential smoothing (level + trend,
  alpha = beta = 1/2) over daily value totals. The recursion cannot be
  unrolled into a window convolution (level and trend are coupled), so
  the Spark side is the canonical huge->tiny->exact-local-fold shape:
  one shuffle reduces 21M+ events to the day grain (bounded by the
  calendar, ~365 rows/year at ANY corpus size), then a single
  applyInPandas group folds the recursion. The oracle is a recursive
  CTE executing the IDENTICAL float64 op sequence — with dyadic
  smoothing weights every op is add/subtract/divide-by-2, all
  correctly-rounded IEEE ops, so results are bit-identical across
  engines with NO rounding step (the events_ewma_daily precedent).
- events_weekday_seasonality: weekday traffic index (weekday mean daily
  count / overall mean daily count) in pure integer cross-products
  until one final division.
- events_error_burn_rate: per-day error-rate burn multiple vs the
  corpus-wide baseline; the >= 2x alert is evaluated as an integer
  cross-multiplication so the flag never depends on float rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import exprs
from . import SQL_WEEKDAY_NAME, events_table, query

# ============================ Holt linear trend ==============================

_HOLT_SCHEMA = (
    "day date, cents long, level double, trend double, forecast_next double"
)


@query(
    "events_holt_linear",
    """
WITH RECURSIVE d AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY day),
seq AS (
  SELECT row_number() OVER (ORDER BY day) AS i, day, cents FROM d),
h AS (
  SELECT i, day, cents, CAST(cents AS DOUBLE) AS level, CAST(0 AS DOUBLE) AS trend
  FROM seq WHERE i = 1
  UNION ALL
  SELECT s.i, s.day, s.cents,
         (CAST(s.cents AS DOUBLE) + (h.level + h.trend)) / 2 AS level,
         (((CAST(s.cents AS DOUBLE) + (h.level + h.trend)) / 2) - h.level + h.trend) / 2
           AS trend
  FROM h JOIN seq s ON s.i = h.i + 1)
SELECT day, cents, level, trend, level + trend AS forecast_next FROM h
""",
)
def events_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt linear-trend smoothing of daily value totals (alpha = beta =
    1/2): level_t = (y_t + (level + trend)) / 2, trend_t = ((level_t -
    level) + trend) / 2, forecast = level + trend. One shuffle reduces
    the stream to integer day cents; the recursion folds in ONE pandas
    group over the calendar-bounded day series (~365 rows/year no matter
    the corpus size — this is the one shape where a single-group fold is
    the scale-correct plan, not a bottleneck). Dyadic weights keep every
    float op (+, -, /2) correctly-rounded-identical to the oracle's
    recursive CTE, so no rounding step is needed."""
    import pandas as pd

    daily = (
        events_table(spark, sf_dir)
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.sum(F.round(F.col("value") * 100).cast("long")).cast("long").alias("cents"))
    )

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("day").reset_index(drop=True)
        level = trend = 0.0
        levels, trends = [], []
        for i, y in enumerate(pdf["cents"].astype("float64")):
            if i == 0:
                level, trend = y, 0.0
            else:
                new_level = (y + (level + trend)) / 2
                trend = ((new_level - level) + trend) / 2
                level = new_level
            levels.append(level)
            trends.append(trend)
        pdf["level"] = levels
        pdf["trend"] = trends
        pdf["forecast_next"] = pdf["level"] + pdf["trend"]
        return pdf[["day", "cents", "level", "trend", "forecast_next"]]

    return (
        daily.withColumn("_g", F.lit(1))
        .groupBy("_g")
        .applyInPandas(lambda _, pdf: fold(pdf), schema=_HOLT_SCHEMA)
    )


# ========================= weekday seasonality index =========================


@query(
    "events_weekday_seasonality",
    f"""
WITH d AS (
  SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY day),
t AS (SELECT CAST(count(*) AS BIGINT) AS n_days,
             CAST(sum(c) AS BIGINT) AS total FROM d),
w AS (
  SELECT CAST(isodow(day) AS BIGINT) AS weekday_num,
         {SQL_WEEKDAY_NAME.format(ts='day')} AS weekday,
         CAST(count(*) AS BIGINT) AS n_days_wd,
         CAST(sum(c) AS BIGINT) AS n_events
  FROM d GROUP BY 1, 2)
SELECT weekday_num, weekday, n_days_wd, n_events,
       round((CAST(n_events AS DOUBLE) * n_days) / (CAST(n_days_wd AS DOUBLE) * total)
             * 1000000) / 1000000 AS seasonality_index
FROM w CROSS JOIN t
""",
)
def events_weekday_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Traffic seasonality by weekday: mean daily event count for each
    weekday over the overall mean daily count (index 1.0 = flat). Both
    means stay integer cross-products — (sum_wd * n_days) /
    (n_days_wd * total) — with ONE final division. Two tiny aggregates
    over the day grain; the 1-row total broadcasts."""
    ev = events_table(spark, sf_dir)
    d = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    t = d.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("c").cast("long").alias("total"),
    )
    w = d.groupBy(
        (F.weekday("day") + 1).cast("long").alias("weekday_num"),
        exprs.weekday_name(F.col("day")).alias("weekday"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_days_wd"),
        F.sum("c").cast("long").alias("n_events"),
    )
    return w.crossJoin(F.broadcast(t)).select(
        "weekday_num",
        "weekday",
        "n_days_wd",
        "n_events",
        (
            F.round(
                (F.col("n_events").cast("double") * F.col("n_days"))
                / (F.col("n_days_wd").cast("double") * F.col("total"))
                * 1000000
            )
            / 1000000
        ).alias("seasonality_index"),
    )


# ============================ error-rate burn alert ==========================

_BURN_ALERT_X = 2  # alert when a day's error rate is >= 2x the baseline


@query(
    "events_error_burn_rate",
    f"""
WITH d AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(count(*) AS BIGINT) AS tot,
         CAST(count(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS err
  FROM events GROUP BY day),
t AS (SELECT CAST(sum(tot) AS BIGINT) AS tot_all,
             CAST(sum(err) AS BIGINT) AS err_all FROM d)
SELECT day, tot AS n_events, err AS n_errors,
       CASE WHEN err_all = 0 THEN NULL
            ELSE round((CAST(err AS DOUBLE) * tot_all)
                       / (CAST(tot AS DOUBLE) * err_all) * 1000000) / 1000000
       END AS burn_rate,
       CAST(err * tot_all >= {_BURN_ALERT_X} * tot * err_all AS BOOLEAN) AS alert
FROM d CROSS JOIN t
""",
)
def events_error_burn_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SRE-style burn-rate report: each day's error rate as a multiple of
    the corpus-wide baseline rate, with the >= {_BURN_ALERT_X}x alert
    decided by INTEGER cross-multiplication (err_d * tot_all >=
    {_BURN_ALERT_X} * tot_d * err_all) so the flag is exact on both
    engines regardless of float rounding; the reported multiple is one
    final guarded division. One day-grain aggregate + a broadcast 1-row
    baseline."""
    ev = events_table(spark, sf_dir)
    d = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("tot"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
        .cast("long")
        .alias("err"),
    )
    t = d.agg(
        F.sum("tot").cast("long").alias("tot_all"),
        F.sum("err").cast("long").alias("err_all"),
    )
    return d.crossJoin(F.broadcast(t)).select(
        "day",
        F.col("tot").alias("n_events"),
        F.col("err").alias("n_errors"),
        F.when(F.col("err_all") == 0, F.lit(None).cast("double"))
        .otherwise(
            F.round(
                (F.col("err").cast("double") * F.col("tot_all"))
                / (F.col("tot").cast("double") * F.col("err_all"))
                * 1000000
            )
            / 1000000
        )
        .alias("burn_rate"),
        (
            F.col("err") * F.col("tot_all")
            >= F.lit(_BURN_ALERT_X) * F.col("tot") * F.col("err_all")
        ).alias("alert"),
    )
