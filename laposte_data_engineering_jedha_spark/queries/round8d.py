"""Round-8 session batch 4 — behavioral events analytics:

- events_value_winsorized_stats: per-type value stats after p1/p99
  winsorization — the robust-mean report; bounds quantize to integer
  centi-cents BEFORE clamping so no float ever crosses a group boundary.
- events_inactivity_churn: users banded by activity level (bit length of
  their event count), with the share whose last event sits more than 24 h
  before the corpus horizon — the churn-rate report at activity-band
  grain.
- events_hourly_autocorr: Pearson autocorrelation of the hourly event
  volume at lag 1h and lag 24h over the zero-filled hour spine — the
  seasonality scalar (daily rhythm shows up as high lag-24 r). Moments
  are BIGINT end to end; only the final r divides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import events_table, query

# ========================= winsorized value stats ============================


@query(
    "events_value_winsorized_stats",
    """
WITH v AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents FROM events),
b AS (
  SELECT event_type,
         CAST(round(quantile_cont(cents, 0.01) * 100) AS BIGINT) AS lo_q,
         CAST(round(quantile_cont(cents, 0.99) * 100) AS BIGINT) AS hi_q
  FROM v GROUP BY event_type),
w AS (
  SELECT v.event_type AS event_type, lo_q, hi_q, cents,
         least(greatest(cents * 100, lo_q), hi_q) AS wq
  FROM v JOIN b ON v.event_type = b.event_type)
SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
       lo_q AS lo_centicents, hi_q AS hi_centicents,
       CAST(sum(wq) // count(*) AS BIGINT) AS winsor_mean_centicents,
       CAST(count(*) FILTER (WHERE wq <> cents * 100) AS BIGINT) AS n_clamped
FROM w GROUP BY event_type, lo_q, hi_q
""",
)
def events_value_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type value stats after p1/p99 winsorization — the robust mean
    an outlier-heavy value column needs. The percentile bounds (exact,
    interpolated — Spark `percentile` == DuckDB `quantile_cont` on the
    integer cents) quantize to BIGINT centi-cents before clamping, so
    the clamped values and their sums stay integers in any aggregation
    order. Two passes over events (bounds, then clamp+fold), the bounds
    join broadcast at |types| rows."""
    ev = events_table(spark, sf_dir)
    v = ev.select(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("cents")
    )
    b = v.groupBy("event_type").agg(
        F.round(F.expr("percentile(cents, 0.01)") * 100).cast("long").alias("lo_q"),
        F.round(F.expr("percentile(cents, 0.99)") * 100).cast("long").alias("hi_q"),
    )
    w = v.join(F.broadcast(b), "event_type").select(
        "event_type",
        "lo_q",
        "hi_q",
        "cents",
        F.least(F.greatest(F.col("cents") * 100, F.col("lo_q")), F.col("hi_q")).alias(
            "wq"
        ),
    )
    return w.groupBy("event_type", "lo_q", "hi_q").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.expr("sum(wq) div count(*)").cast("long").alias("winsor_mean_centicents"),
        F.count(F.when(F.col("wq") != F.col("cents") * 100, 1))
        .cast("long")
        .alias("n_clamped"),
    ).select(
        "event_type",
        "n_events",
        F.col("lo_q").alias("lo_centicents"),
        F.col("hi_q").alias("hi_centicents"),
        "winsor_mean_centicents",
        "n_clamped",
    )


# ========================== inactivity churn =================================

_CHURN_GAP_US = 86_400_000_000  # inactive for > 24 h at the horizon = churned


@query(
    "events_inactivity_churn",
    f"""
WITH u AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
         epoch_us(max(ts)) AS last_us
  FROM events GROUP BY user_id),
g AS (SELECT CAST(max(epoch_us(ts)) AS BIGINT) AS horizon_us FROM events),
b AS (SELECT CAST(length(bin(n_events)) AS BIGINT) AS activity_band,
             last_us, horizon_us
      FROM u CROSS JOIN g)
SELECT activity_band, CAST(count(*) AS BIGINT) AS n_users,
       CAST(count(*) FILTER (WHERE last_us < horizon_us - {_CHURN_GAP_US})
            AS BIGINT) AS n_churned,
       CAST(count(*) FILTER (WHERE last_us < horizon_us - {_CHURN_GAP_US})
            * 1000000 // count(*) AS BIGINT) AS churn_ppm
FROM b GROUP BY activity_band
""",
)
def events_inactivity_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Churn by activity level: users banded by the bit length of their
    event count (power-of-two activity bands, exact integer bucketing),
    with the share whose LAST event sits more than 24 h before the corpus
    horizon — the 'do light users churn more' report, the batch proxy for
    'inactive now'. One user aggregate, a broadcast 1-row horizon, a
    <=|bands|-row rollup — integer microseconds, integer ppm."""
    ev = events_table(spark, sf_dir)
    u = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.unix_micros(F.max("ts")).alias("last_us"),
    )
    g = ev.agg(F.max(F.unix_micros("ts")).cast("long").alias("horizon_us"))
    churned = F.when(F.col("last_us") < F.col("horizon_us") - _CHURN_GAP_US, 1)
    return (
        u.crossJoin(F.broadcast(g))
        .select(
            F.length(F.bin("n_events")).cast("long").alias("activity_band"),
            "last_us",
            "horizon_us",
        )
        .groupBy("activity_band")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.count(churned).cast("long").alias("n_churned"),
            F.expr(
                f"(count(CASE WHEN last_us < horizon_us - {_CHURN_GAP_US} THEN 1 END)"
                " * 1000000) div count(*)"
            )
            .cast("long")
            .alias("churn_ppm"),
        )
    )


# ========================= hourly autocorrelation ============================


def _sql_pearson(x: str, y: str) -> str:
    """Integer-moment Pearson r, rounded to 6 dp; 0.0 when either side is
    constant (zero variance)."""
    num = f"(n * sxy_{x}{y} - sx_{x} * sx_{y})"
    den = (
        f"sqrt(CAST(n * sxx_{x} - sx_{x} * sx_{x} AS DOUBLE))"
        f" * sqrt(CAST(n * sxx_{y} - sx_{y} * sx_{y} AS DOUBLE))"
    )
    return (
        f"CASE WHEN n * sxx_{x} = sx_{x} * sx_{x} OR n * sxx_{y} = sx_{y} * sx_{y}"
        f" THEN CAST(0.0 AS DOUBLE)"
        f" ELSE round(CAST({num} AS DOUBLE) / ({den}) * 1000000) / 1000000 END"
    )


@query(
    "events_hourly_autocorr",
    f"""
WITH c AS (
  SELECT epoch_us(ts) // 3600000000 AS h, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY h),
bounds AS (SELECT min(h) AS h0, max(h) AS h1 FROM c),
spine AS (SELECT unnest(range(h0, h1 + 1)) AS h FROM bounds),
f AS (SELECT spine.h AS h, coalesce(c.n, 0) AS n
      FROM spine LEFT JOIN c ON spine.h = c.h),
l AS (SELECT h, n,
             lag(n, 1) OVER (ORDER BY h) AS n1,
             lag(n, 24) OVER (ORDER BY h) AS n24
      FROM f),
m1 AS (SELECT CAST(count(*) AS BIGINT) AS n,
              CAST(sum(n) AS BIGINT) AS sx_a, CAST(sum(n1) AS BIGINT) AS sx_b,
              CAST(sum(n * n) AS BIGINT) AS sxx_a,
              CAST(sum(n1 * n1) AS BIGINT) AS sxx_b,
              CAST(sum(n * n1) AS BIGINT) AS sxy_ab
       FROM l WHERE n1 IS NOT NULL),
m24 AS (SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(n) AS BIGINT) AS sx_a, CAST(sum(n24) AS BIGINT) AS sx_b,
               CAST(sum(n * n) AS BIGINT) AS sxx_a,
               CAST(sum(n24 * n24) AS BIGINT) AS sxx_b,
               CAST(sum(n * n24) AS BIGINT) AS sxy_ab
        FROM l WHERE n24 IS NOT NULL)
SELECT CAST(1 AS BIGINT) AS lag_hours, n AS n_pairs, {_sql_pearson('a', 'b')} AS r
FROM m1
UNION ALL
SELECT CAST(24 AS BIGINT) AS lag_hours, n AS n_pairs, {_sql_pearson('a', 'b')} AS r
FROM m24
""",
)
def events_hourly_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation of hourly event volume at lag 1 and lag 24 over the
    ZERO-FILLED hour spine (missing hours are real zeros — skipping them
    biases r upward). Daily seasonality shows up as r(24) >> r(1)'s
    baseline. Counts and all Pearson moments are BIGINT (the corr-matrix
    precedent); the spine is |hours| rows so the lag window is one tiny
    single-partition sort. The only full-table work is the hour-count
    aggregate."""
    ev = events_table(spark, sf_dir)
    c = ev.groupBy(F.expr("unix_micros(ts) div 3600000000").alias("h")).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    bounds = c.agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
    spine = bounds.select(
        F.explode(F.sequence(F.col("h0"), F.col("h1"))).alias("h")
    )
    f = spine.join(c, "h", "left").select(
        "h", F.coalesce("n", F.lit(0)).cast("long").alias("n")
    )
    w = Window.orderBy("h")
    l = f.select(
        "n",
        F.lag("n", 1).over(w).alias("n1"),
        F.lag("n", 24).over(w).alias("n24"),
    )

    def moments(col: str):
        d = l.where(F.col(col).isNotNull())
        return d.agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("n").cast("long").alias("sx_a"),
            F.sum(col).cast("long").alias("sx_b"),
            F.sum(F.col("n") * F.col("n")).cast("long").alias("sxx_a"),
            F.sum(F.col(col) * F.col(col)).cast("long").alias("sxx_b"),
            F.sum(F.col("n") * F.col(col)).cast("long").alias("sxy_ab"),
        )

    def r_row(df: DataFrame, lag_hours: int) -> DataFrame:
        num = F.col("n") * F.col("sxy_ab") - F.col("sx_a") * F.col("sx_b")
        va = F.col("n") * F.col("sxx_a") - F.col("sx_a") * F.col("sx_a")
        vb = F.col("n") * F.col("sxx_b") - F.col("sx_b") * F.col("sx_b")
        r = F.when((va == 0) | (vb == 0), F.lit(0.0)).otherwise(
            F.round(
                num.cast("double") / (F.sqrt(va.cast("double")) * F.sqrt(vb.cast("double")))
                * 1000000
            )
            / 1000000
        )
        return df.select(
            F.lit(lag_hours).cast("long").alias("lag_hours"),
            F.col("n").alias("n_pairs"),
            r.alias("r"),
        )

    return r_row(moments("n1"), 1).unionByName(r_row(moments("n24"), 24))
