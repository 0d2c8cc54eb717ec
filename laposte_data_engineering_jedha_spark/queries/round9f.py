"""Round-9 session batch 6 — growth-curve + resampling shapes:

- events_cumulative_unique_users: new-vs-cumulative distinct users per
  day (the growth curve every product dashboard opens with) — running
  COUNT(DISTINCT) decomposed as first-seen-day + day-grain cumsum, so
  the distinct never recomputes per day.
- olap_bootstrap_mean_ci: the distributed POISSON BOOTSTRAP — each row's
  weight in replicate r is a Poisson(1) draw derived deterministically
  from md5(key, r), giving R independent resampled means in ONE pass
  with no per-replicate shuffle (the standard bootstrap-at-scale trick:
  sampling WITH replacement without materializing resamples). md5-based
  draws make the whole resampling oracle-expressible.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import events_table, query, spread_table, table

# ========================= cumulative unique users ===========================


@query(
    "events_cumulative_unique_users",
    """
WITH f AS (
  SELECT user_id, CAST(min(CAST(ts AS DATE)) AS DATE) AS first_day
  FROM events GROUP BY user_id),
d AS (SELECT first_day, CAST(count(*) AS BIGINT) AS n_new FROM f GROUP BY first_day)
SELECT CAST(first_day AS VARCHAR) AS day, n_new,
       CAST(sum(n_new) OVER (ORDER BY first_day
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cum_users
FROM d
""",
)
def events_cumulative_unique_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily new users and the cumulative distinct-user curve: running
    COUNT(DISTINCT user_id) decomposed into each user's FIRST-SEEN day
    (one user-grain aggregate) plus a day-grain cumulative sum — the
    decomposition that turns an unbounded-state running distinct into
    one pass + a spine-bounded window (day grain: bounded by the time
    span, never by volume; the round7g precedent)."""
    ev = events_table(spark, sf_dir)
    f = ev.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("first_day"))
    d = f.groupBy("first_day").agg(F.count(F.lit(1)).cast("long").alias("n_new"))
    w = Window.orderBy("first_day").rowsBetween(Window.unboundedPreceding, 0)
    return d.select(
        F.col("first_day").cast("string").alias("day"),
        "n_new",
        F.sum("n_new").over(w).cast("long").alias("cum_users"),
    )


# ========================= Poisson bootstrap ==================================

_BOOT_R = 16  # replicates
_BOOT_BITS = 1 << 52
# cumulative Poisson(1) thresholds scaled to the 52-bit md5 hash space:
# P(X <= k) for k = 0..5; a hash above the last threshold draws 6.
_BOOT_CUM = [
    math.floor(p * _BOOT_BITS)
    for p in (
        0.36787944117144233,
        0.7357588823428847,
        0.9196986029286058,
        0.9810118431238462,
        0.9963401531726563,
        0.9994058151824183,
    )
]


def _sql_pois(hv: str) -> str:
    arms = " ".join(
        f"WHEN {hv} < {t} THEN {k}" for k, t in enumerate(_BOOT_CUM)
    )
    return f"CASE {arms} ELSE 6 END"


@query(
    "olap_bootstrap_mean_ci",
    f"""
WITH base AS (
  SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders),
rep AS (
  SELECT CAST(r.range AS BIGINT) AS replicate, o_orderkey, cents,
         CAST('0x' || substr(md5(CAST(o_orderkey AS VARCHAR) || '|' ||
              CAST(r.range AS VARCHAR)), 1, 13) AS BIGINT) AS hv
  FROM base CROSS JOIN range(0, {_BOOT_R}) r),
w AS (SELECT replicate, cents, CAST({_sql_pois('hv')} AS BIGINT) AS k FROM rep)
SELECT replicate,
       CAST(sum(k) AS BIGINT) AS n_eff,
       CAST(sum(k * cents) AS BIGINT) AS sum_cents,
       CAST(CASE WHEN sum(k) = 0 THEN NULL
                 ELSE sum(k * cents) // sum(k) END AS BIGINT) AS mean_cents
FROM w GROUP BY replicate
""",
)
def olap_bootstrap_mean_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson bootstrap of the mean order value, {_BOOT_R} replicates in
    ONE scan: row i's weight in replicate r ~ Poisson(1), drawn by
    mapping the 52-bit md5(o_orderkey, r) hash through the exact
    cumulative-Poisson thresholds (integer constants — both engines draw
    the identical weights). The replicate means' spread IS the sampling
    distribution of the mean (read the CI off their quantiles) — the
    bootstrap-at-scale pattern that never materializes a resample and
    never reshuffles per replicate: one map-side explode x R, one
    aggregate. Integer cents; one guarded integer division per
    replicate."""
    # The 16x md5 explode below is pure per-row CPU on a 1-task scan at bench
    # scale — spread it across cores (guide §2.5); everything downstream is
    # integer algebra, so the redistribution is order-free exact.
    o = spread_table(
        spark, sf_dir, "orders", min_bytes=2 << 20, key="o_orderkey"
    ).select(
        "o_orderkey", F.round(F.col("o_totalprice") * 100).cast("long").alias("cents")
    )
    rep = o.select(
        F.explode(F.sequence(F.lit(0), F.lit(_BOOT_R - 1))).alias("replicate"),
        "o_orderkey",
        "cents",
    ).withColumn("replicate", F.col("replicate").cast("long")).select(
        "replicate",
        "cents",
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "|",
                        F.col("o_orderkey").cast("string"),
                        F.col("replicate").cast("string"),
                    )
                ),
                1,
                13,
            ),
            16,
            10,
        )
        .cast("long")
        .alias("hv"),
    )
    k = F.lit(6)
    for kk, t in reversed(list(enumerate(_BOOT_CUM))):
        k = F.when(F.col("hv") < t, F.lit(kk)).otherwise(k)
    w = rep.select("replicate", "cents", k.cast("long").alias("k"))
    return w.groupBy("replicate").agg(
        F.sum("k").cast("long").alias("n_eff"),
        F.sum(F.col("k") * F.col("cents")).cast("long").alias("sum_cents"),
        F.when(
            F.sum("k") == 0, F.lit(None).cast("long")
        )
        .otherwise(F.expr("sum(k * cents) div sum(k)"))
        .cast("long")
        .alias("mean_cents"),
    )
