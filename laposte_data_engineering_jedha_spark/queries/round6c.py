"""Round-6 session batch 3 — event-stream hygiene + behavioral analytics,
each with a full DuckDB oracle twin:

- events_debounce: window-lag debounce (drop same-user same-type repeats
  inside 5 s) — the click-spam filter every ingest pipeline runs.
- events_pattern_match: MATCH_RECOGNIZE-style sequence detection — the
  view(>click)*>purchase pattern — expressed portably as a deterministic
  ordered path string + one RE2 regex per session.
- dq_k_anonymity: the privacy half of the DQ gate family — quasi-identifier
  cells with fewer than K members (re-identification risk report).
- events_anomaly_mad: robust anomaly flags via median absolute deviation
  (the zscore twin's mean/stddev are themselves corrupted by the outliers
  they look for; median/MAD are not). Exact dyadic medians, no rounding.
- events_attribution_position: U-shaped (40/20/40) multi-touch
  attribution in integer MILLIONTHS — remainder assigned deterministically
  to the earliest middle touches, so every journey's credit sums to
  exactly 1,000,000 and the cross-engine hash needs no float convention.

Shared conventions: 30-min sessionization fragment mirrors
llmops.events_sessionize (epoch_us gap > 1_800_000_000); exact percentile
= Spark `percentile` == DuckDB `quantile_cont` (bit-equal, pinned by
events_value_quantiles); ordered aggregations always tie-break (ts,
event_id)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import events_table, query

# --- debounce ----------------------------------------------------------------

_DEBOUNCE_US = 5_000_000


@query(
    "events_debounce",
    f"""
WITH x AS (
  SELECT event_type,
         epoch_us(ts) - lag(epoch_us(ts)) OVER (
             PARTITION BY user_id, event_type ORDER BY ts, event_id) AS gap
  FROM events)
SELECT event_type,
       count(*) AS n_raw,
       CAST(sum(CASE WHEN gap IS NULL OR gap >= {_DEBOUNCE_US}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
FROM x GROUP BY event_type
""",
)
def events_debounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Debounce repeated (user, type) events inside 5 s of the PREVIOUS RAW
    event (the one-lag window formulation; chain-debounce against the last
    KEPT event is inherently sequential — that variant lives in streaming
    state, this is the batch hygiene filter). One shuffle on (user_id,
    event_type) serves both the lag and the final per-type rollup."""
    ev = events_table(spark, sf_dir)
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    gap = F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
    return (
        ev.select("event_type", gap.alias("gap"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_raw"),
            F.sum(
                F.when(
                    F.col("gap").isNull() | (F.col("gap") >= _DEBOUNCE_US), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_kept"),
        )
    )


# --- sequence pattern match ----------------------------------------------------

_PATTERN = "(^|>)view(>click)*>purchase(>|$)"

_SESSION_CTE = """
WITH x AS (
  SELECT user_id, ts, event_id, event_type,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pts
  FROM events),
y AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN pts IS NULL
                   OR epoch_us(ts) - epoch_us(pts) > 1800000000
              THEN 1 ELSE 0 END AS ns
  FROM x),
z AS (
  SELECT user_id, ts, event_id, event_type,
         CAST(sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM y)"""


@query(
    "events_pattern_match",
    _SESSION_CTE
    + f""",
p AS (
  SELECT user_id, session_id,
         count(*) AS n_events,
         string_agg(event_type, '>' ORDER BY ts, event_id) AS path
  FROM z GROUP BY user_id, session_id)
SELECT user_id, session_id, n_events, md5(path) AS path_md5,
       regexp_matches(path, '{_PATTERN}') AS matched
FROM p
""",
)
def events_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-pattern detection over 30-min sessions: did the session
    contain a view followed by a purchase with only clicks between —
    SQL:2016 MATCH_RECOGNIZE's PATTERN (V C* P), expressed portably by
    building each session's deterministic '>'-joined type path (ordered
    by ts, event_id) and running ONE RE2 regex on it. The path string is
    emitted md5-hashed so the report row stays narrow on long sessions.
    Same single user_id shuffle as events_sessionize; the path build is
    a sorted collect_list bounded by session length (watermark-bounded in
    the streaming twin)."""
    ev = events_table(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
    new_sess = F.when(gap.isNull() | (gap > 1_800_000_000), 1).otherwise(0)
    sess = F.sum(new_sess).over(w.rowsBetween(Window.unboundedPreceding, 0))
    path = F.array_join(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct("ts", "event_id", "event_type"))
            ),
            lambda s: s["event_type"],
        ),
        ">",
    )
    return (
        ev.select("user_id", "ts", "event_id", "event_type", sess.alias("session_id"))
        .groupBy("user_id", "session_id")
        .agg(F.count(F.lit(1)).alias("n_events"), path.alias("path"))
        .select(
            "user_id",
            "session_id",
            "n_events",
            F.md5("path").alias("path_md5"),
            F.col("path").rlike(_PATTERN).alias("matched"),
        )
    )


# --- k-anonymity --------------------------------------------------------------

_K_ANON = 5


@query(
    "dq_k_anonymity",
    f"""
SELECT lang, source, count(*) AS n
FROM documents
GROUP BY lang, source
HAVING count(*) < {_K_ANON}
""",
)
def dq_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-anonymity risk report over the (lang, source) quasi-identifier
    pair: cells with fewer than K=5 documents, i.e. groups where metadata
    alone narrows a document to under K candidates. The privacy-side DQ
    gate next to dq_documents_checks' integrity side; release pipelines
    suppress or generalize these cells before publication."""
    from . import table

    return (
        table(spark, sf_dir, "documents")
        .groupBy("lang", "source")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") < _K_ANON)
    )


# --- MAD anomaly flags ----------------------------------------------------------


@query(
    "events_anomaly_mad",
    """
WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n_events
               FROM events GROUP BY event_type, CAST(ts AS DATE)),
med AS (SELECT event_type, quantile_cont(n_events, 0.5) AS med FROM daily GROUP BY event_type),
mad AS (SELECT daily.event_type AS event_type,
               quantile_cont(abs(n_events - med), 0.5) AS mad
        FROM daily JOIN med ON daily.event_type = med.event_type
        GROUP BY daily.event_type)
SELECT daily.event_type AS event_type, day, n_events, med.med AS med, mad.mad AS mad
FROM daily
JOIN med ON daily.event_type = med.event_type
JOIN mad ON daily.event_type = mad.event_type
WHERE abs(n_events - med.med) > 3 * mad.mad
""",
)
def events_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust daily-volume anomaly flags: |count - median| > 3 * MAD per
    event type. The MAD (median absolute deviation) survives the very
    outliers that inflate events_anomaly_zscore's mean and stddev — the
    robust-statistics twin of that query. Medians of integer counts are
    exact dyadic rationals (worst case x.5), so both engines agree
    bit-for-bit with no rounding convention. Exact percentile sorts each
    type's ~days-sized group — trivially small; a 100 TB deployment with
    billions of groups swaps in approx_percentile's mergeable t-digest."""
    ev = events_table(spark, sf_dir)
    daily = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n_events")
    )
    med = daily.groupBy("event_type").agg(
        F.expr("percentile(n_events, 0.5)").alias("med")
    )
    mad = (
        daily.join(med, "event_type")
        .groupBy("event_type")
        .agg(F.expr("percentile(abs(n_events - med), 0.5)").alias("mad"))
    )
    return (
        daily.join(med, "event_type")
        .join(mad, "event_type")
        .where(F.abs(F.col("n_events") - F.col("med")) > 3 * F.col("mad"))
        .select("event_type", "day", "n_events", "med", "mad")
    )


# --- U-shaped multi-touch attribution -------------------------------------------

_TOTAL = 1_000_000  # credit per journey, in millionths
_END = 400_000  # first / last touch share (>= 3 touches)
_MID_POOL = _TOTAL - 2 * _END


@query(
    "events_attribution_position",
    f"""
WITH fp AS (
  SELECT user_id, min(ts) AS first_purchase
  FROM events WHERE event_type = 'purchase' GROUP BY user_id),
t AS (
  SELECT e.user_id AS user_id, e.event_type AS event_type, e.ts AS ts, e.event_id AS event_id
  FROM events e JOIN fp ON e.user_id = fp.user_id
  WHERE e.event_type IN ('view', 'click')
    AND e.ts < fp.first_purchase
    AND e.ts >= fp.first_purchase - INTERVAL 7 DAY),
r AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pos,
         count(*) OVER (PARTITION BY user_id) AS tt
  FROM t),
c AS (
  SELECT event_type,
         CASE WHEN tt = 1 THEN {_TOTAL}
              WHEN tt = 2 THEN {_TOTAL // 2}
              WHEN pos = 1 OR pos = tt THEN {_END}
              ELSE {_MID_POOL} // (tt - 2)
                   + CASE WHEN pos - 1 <= {_MID_POOL} % (tt - 2)
                          THEN 1 ELSE 0 END
         END AS credit
  FROM r)
SELECT event_type, CAST(sum(credit) AS BIGINT) AS credit_millionths
FROM c GROUP BY event_type
""",
)
def events_attribution_position(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U-shaped (position-based) multi-touch attribution for each user's
    FIRST purchase: touches (views/clicks) in the 7 days before it share
    1,000,000 millionths of credit — 40% first, 40% last, 20% split over
    the middle touches, with the integer-division remainder handed to the
    EARLIEST middles one millionth each. Every journey sums to exactly
    1,000,000, all arithmetic is integral, so the per-channel rollup
    hash-matches with no float convention. Plan: one small aggregate for
    first purchases joined back (AQE broadcasts it), one user_id window —
    the same single-shuffle shape as the sessionizer."""
    ev = events_table(spark, sf_dir)
    fp = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_purchase"))
    )
    touches = (
        ev.join(fp, "user_id")
        .where(
            F.col("event_type").isin("view", "click")
            & (F.col("ts") < F.col("first_purchase"))
            & (F.col("ts") >= F.col("first_purchase") - F.expr("INTERVAL 7 DAYS"))
        )
        .select("user_id", "event_type", "ts", "event_id")
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wall = Window.partitionBy("user_id")
    r = touches.select(
        "event_type",
        F.row_number().over(w).alias("pos"),
        F.count(F.lit(1)).over(wall).alias("tt"),
    )
    mid = F.col("tt") - 2
    credit = (
        F.when(F.col("tt") == 1, F.lit(_TOTAL))
        .when(F.col("tt") == 2, F.lit(_TOTAL // 2))
        .when((F.col("pos") == 1) | (F.col("pos") == F.col("tt")), F.lit(_END))
        .otherwise(
            F.expr(f"{_MID_POOL} div (tt - 2)")
            + F.when(F.col("pos") - 1 <= F.lit(_MID_POOL) % mid, 1).otherwise(0)
        )
    )
    return (
        r.select("event_type", credit.alias("credit"))
        .groupBy("event_type")
        .agg(F.sum("credit").cast("long").alias("credit_millionths"))
    )
