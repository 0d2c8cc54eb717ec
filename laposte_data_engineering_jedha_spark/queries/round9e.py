"""Round-9 session batch 5 — privacy + sweep-line shapes:

- dq_l_diversity: l-diversity over the (lang, source) quasi-identifier
  — the companion gate to dq_k_anonymity (a k-anonymous cell whose
  sensitive attribute is CONSTANT still leaks; l counts distinct
  sensitive values per cell). Sensitive attribute here: the document
  length band (what an attacker learns).
- events_peak_concurrency: sweep-line maximum concurrency per day —
  each event opens a 5-minute activity interval; +1/-1 boundary points
  are prefix-summed in GLOBAL time order via ranking.global_prefix_sum
  (partition-offset, no single-task sort), the classic interval-overlap
  shape (capacity planning, rate-limit sizing) made 100 TB-safe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import ranking
from . import events_table, query, table

_LDIV_L = 3  # cells with fewer distinct sensitive values are risky

# ========================= l-diversity =======================================


@query(
    "dq_l_diversity",
    f"""
WITH s AS (
  SELECT lang, source,
         CAST(length(bin(CAST(greatest(n_chars, 1) AS BIGINT))) AS BIGINT)
           AS len_band
  FROM documents),
c AS (
  SELECT lang, source,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(count(DISTINCT len_band) AS BIGINT) AS l_distinct
  FROM s GROUP BY lang, source)
SELECT lang, source, n_docs, l_distinct
FROM c WHERE l_distinct < {_LDIV_L}
""",
)
def dq_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L-diversity audit over the (lang, source) quasi-identifier with
    the document length band (bit length of n_chars: power-of-two
    buckets, exact integer) as the sensitive attribute: cells where
    fewer than {_LDIV_L} distinct bands occur — groups where metadata
    alone pins down the sensitive value even if the cell is k-anonymous
    (the homogeneity attack dq_k_anonymity can't see). Release
    pipelines generalize or suppress these cells. One two-key aggregate
    with a count-distinct; integer bands on both engines."""
    s = table(spark, sf_dir, "documents").select(
        "lang",
        "source",
        F.length(F.bin(F.greatest(F.col("n_chars"), F.lit(1)).cast("long")))
        .cast("long")
        .alias("len_band"),
    )
    return (
        s.groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.countDistinct("len_band").cast("long").alias("l_distinct"),
        )
        .where(F.col("l_distinct") < _LDIV_L)
    )


# ========================= sweep-line peak concurrency =======================

_CONC_WINDOW_US = 300_000_000  # each event opens a 5-minute activity interval


@query(
    "events_peak_concurrency",
    f"""
WITH pts AS (
  SELECT epoch_us(ts) AS t, CAST(1 AS BIGINT) AS delta, event_id FROM events
  UNION ALL
  SELECT epoch_us(ts) + {_CONC_WINDOW_US}, CAST(-1 AS BIGINT), event_id
  FROM events),
r AS (
  SELECT t, CAST(sum(delta) OVER (ORDER BY t, delta, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS live
  FROM pts),
d AS (SELECT CAST(to_timestamp(CAST(t // 1000000 AS BIGINT)) AS DATE) AS day,
             live
      FROM r)
SELECT CAST(day AS VARCHAR) AS day, CAST(max(live) AS BIGINT) AS peak_concurrent
FROM d GROUP BY day
""",
)
def events_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sweep-line peak concurrency per day: every event opens a 5-minute
    activity interval; interval boundaries become +1/-1 points and the
    running sum in global time order is the live-interval count — the
    interval-overlap maximum behind capacity planning and rate-limit
    sizing. Tie order (t, delta, event_id) closes intervals BEFORE
    opening same-instant ones on both engines (delta -1 sorts first).

    Scale shape: the global running sum uses ranking.global_prefix_sum
    (partition-offset prefix sums over the range-partitioned boundary
    points — bit-exact for integers, no single-task sort), then a
    day-grain max. The classic formulation is a global-order window;
    this one survives 100 TB of boundary points."""
    ev = events_table(spark, sf_dir)
    starts = ev.select(
        F.unix_micros("ts").alias("t"),
        F.lit(1).cast("long").alias("delta"),
        "event_id",
    )
    ends = ev.select(
        (F.unix_micros("ts") + _CONC_WINDOW_US).alias("t"),
        F.lit(-1).cast("long").alias("delta"),
        "event_id",
    )
    pts = starts.unionAll(ends)
    live = ranking.global_prefix_sum(
        pts, "delta", "t", "delta", "event_id", out_col="live"
    )
    return (
        live.select(
            F.to_date(F.timestamp_seconds(F.expr("t div 1000000"))).cast("string").alias("day"),
            "live",
        )
        .groupBy("day")
        .agg(F.max("live").cast("long").alias("peak_concurrent"))
    )


# ========================= streaming top-k trending ==========================


@query(
    "stream_topk_trending",
    """
WITH g AS (
  SELECT CAST(epoch_us(date_trunc('hour', ts)) AS BIGINT) AS window_us,
         event_type, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2),
r AS (SELECT *, row_number() OVER (PARTITION BY window_us
                                   ORDER BY n DESC, event_type) AS rnk
      FROM g)
SELECT window_us, CAST(rnk AS BIGINT) AS rank, event_type, n
FROM r WHERE rnk <= 3
""",
)
def stream_topk_trending(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch-mode run of the windowed top-k trending operator's SEMANTICS
    (per 1-hour tumbling event-time window, the top-3 event types by
    (count desc, type asc)). The custom stateful streaming operator
    (streaming/jobs.py:topk_trending_stream — per-window count-table
    state, exactly-once emission when the watermark finalizes the
    window, counts commute so no arrival-order buffer is needed) is
    pinned equivalent to this formulation under shuffled arrival in
    tests/test_streaming_shuffled.py; the registered callable is the
    deterministic window form, so it carries a full DuckDB oracle."""
    from ..streaming import jobs

    return jobs.batch_topk_trending(events_table(spark, sf_dir))
