"""Round-12 session batch 6 — nonparametric monitoring statistics, both
integer-exact until one final reported division:

- events_mann_kendall_trend: the Mann-Kendall trend test over the daily
  event-count series — the standard "is this metric drifting?" monitor
  that needs no distributional assumption. S = sum of sign(x_j - x_i)
  over ordered day pairs is exact integer; the tie-corrected variance is
  exact integer arithmetic; only the reported z-statistic divides/roots
  once. The day-pair self-join is at DAY grain (the aggregate output),
  so its size is days^2 — constants at any corpus scale; at 100 TB the
  corpus-sized work is the one groupBy(day) underneath.
- events_user_fano_burstiness: over-dispersion screen per user — the
  Fano factor (variance/mean) of each user's hourly event counts, with
  the over-dispersion verdict (fano > 1, i.e. burstier than Poisson)
  evaluated as the exact integer cross-multiplication
  n*sxx - sx*sx > n*sx. Bot/anomaly triage input: genuine humans are
  bursty, schedulers are sub-Poisson-regular. Two keyed aggregates,
  map-side partials, a one-row report.

Reference parity note: extension surface (the reference has no
statistical monitors).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import events_table, query
from .llmops import sql_round

# ========================= Mann-Kendall trend =================================


@query(
    "events_mann_kendall_trend",
    """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS x
  FROM events GROUP BY 1),
s AS (
  SELECT CAST(sum(CASE WHEN b.x > a.x THEN 1 WHEN b.x < a.x THEN -1 ELSE 0 END)
              AS BIGINT) AS s_stat,
         CAST(count(*) AS BIGINT) AS n_pairs
  FROM daily a JOIN daily b ON a.day < b.day),
n_ AS (SELECT CAST(count(*) AS BIGINT) AS n FROM daily),
ties AS (
  SELECT CAST(COALESCE(sum(t * (t - 1) * (2 * t + 5)), 0) AS BIGINT) AS tie_term
  FROM (SELECT x, CAST(count(*) AS BIGINT) AS t FROM daily GROUP BY x)
  WHERE t > 1),
v AS (SELECT n, tie_term,
             n * (n - 1) * (2 * n + 5) - tie_term AS var18
      FROM n_ CROSS JOIN ties)
SELECT s_stat, n AS n_days,
       CAST(var18 AS BIGINT) AS var_numer_18x,
       CASE WHEN var18 <= 0 THEN NULL
            ELSE round((CASE WHEN s_stat > 0 THEN s_stat - 1
                             WHEN s_stat < 0 THEN s_stat + 1
                             ELSE 0 END)
                       / sqrt(CAST(var18 AS DOUBLE) / 18.0) * 1e6) / 1e6
       END AS z_stat
FROM s CROSS JOIN v
""",
)
def events_mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall monotone-trend test over the daily event-count
    series: S = sum over ordered day pairs of sign(x_j - x_i) (exact
    BIGINT — a day-grain self-join whose size is days^2, constants at
    any corpus scale), tie-corrected variance kept as its exact integer
    numerator var*18 = n(n-1)(2n+5) - sum_t t(t-1)(2t+5), and the
    continuity-corrected z = (S -/+ 1)/sqrt(var) as the ONE float
    expression at the end. |z| > 1.96 is the standard drift alarm; the
    sign says which way. The corpus-sized work is the one groupBy(day);
    everything after runs on the aggregate."""
    daily = (
        events_table(spark, sf_dir)
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(F.count(F.lit(1)).cast("long").alias("x"))
    )
    a = daily.select(F.col("day").alias("da"), F.col("x").alias("xa"))
    b = daily.select(F.col("day").alias("db"), F.col("x").alias("xb"))
    s = (
        a.join(b, F.col("da") < F.col("db"))
        .agg(
            F.sum(
                F.when(F.col("xb") > F.col("xa"), 1)
                .when(F.col("xb") < F.col("xa"), -1)
                .otherwise(0)
            )
            .cast("long")
            .alias("s_stat"),
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
        )
    )
    n_ = daily.agg(F.count(F.lit(1)).cast("long").alias("n"))
    ties = (
        daily.groupBy("x")
        .agg(F.count(F.lit(1)).cast("long").alias("t"))
        .where(F.col("t") > 1)
        .agg(
            F.coalesce(
                F.sum(F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)), F.lit(0)
            )
            .cast("long")
            .alias("tie_term")
        )
    )
    v = n_.crossJoin(ties).select(
        "n",
        (
            F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5) - F.col("tie_term")
        ).alias("var18"),
    )
    sc = F.col("s_stat")
    corrected = (
        F.when(sc > 0, sc - 1).when(sc < 0, sc + 1).otherwise(F.lit(0))
    )
    return s.crossJoin(F.broadcast(v)).select(
        "s_stat",
        F.col("n").alias("n_days"),
        F.col("var18").cast("long").alias("var_numer_18x"),
        F.when(F.col("var18") <= 0, F.lit(None).cast("double"))
        .otherwise(
            F.round(
                corrected / F.sqrt(F.col("var18").cast("double") / 18.0) * 1e6
            )
            / 1e6
        )
        .alias("z_stat"),
    )


# ========================= Fano over-dispersion ===============================


@query(
    "events_user_fano_burstiness",
    f"""
WITH hourly AS (
  SELECT user_id, date_trunc('hour', ts) AS h, CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2),
m AS (
  SELECT user_id,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(c) AS BIGINT) AS sx,
         CAST(sum(c * c) AS BIGINT) AS sxx
  FROM hourly GROUP BY user_id),
f AS (
  SELECT user_id, n, sx, sxx,
         CASE WHEN n * sxx - sx * sx > n * sx THEN 1 ELSE 0 END AS overdispersed
  FROM m WHERE n > 1)
SELECT CAST(count(*) AS BIGINT) AS n_users,
       CAST(sum(overdispersed) AS BIGINT) AS n_overdispersed,
       {sql_round("max((n * sxx - sx * sx) * 1.0 / (n * sx))", 6)} AS max_fano
FROM f
""",
)
def events_user_fano_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Over-dispersion screen per user: the Fano factor of each user's
    ACTIVE-hour event counts — variance/mean of the per-hour count
    series, with population variance and mean sharing the denominator n
    so Fano = (n*sxx - sx^2)/(n*sx). A Poisson process has Fano 1; the
    over-dispersion verdict (burstier than Poisson — human sessions,
    incident traffic) is the exact integer comparison
    n*sxx - sx^2 > n*sx, so the count of flagged users is
    bit-deterministic; only the reported max ratio divides (numerator/
    denominator are exact integers < 2^53, so the division itself is
    correctly rounded and identical in both engines). Two keyed
    aggregates ((user, hour) then user) with map-side partials."""
    hourly = (
        events_table(spark, sf_dir)
        .groupBy("user_id", F.date_trunc("hour", "ts").alias("h"))
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    m = hourly.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("c").cast("long").alias("sx"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("sxx"),
    )
    n, sx, sxx = F.col("n"), F.col("sx"), F.col("sxx")
    f = m.where(n > 1).select(
        "user_id",
        "n",
        "sx",
        "sxx",
        F.when(n * sxx - sx * sx > n * sx, 1).otherwise(0).alias("overdispersed"),
    )
    return f.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("overdispersed").cast("long").alias("n_overdispersed"),
        (
            F.round(
                F.max((n * sxx - sx * sx) * 1.0 / (n * sx)) * 1e6
            )
            / 1e6
        ).alias("max_fano"),
    )
