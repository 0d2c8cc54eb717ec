"""Round-13 session batch 1 — the HOLT LINEAR-TREND FORECASTER joins the
streaming layer (the 7th custom stateful operator) with an
oracle-checked batch twin (r12 verdict item 6: one more stateful
operator whose batch==stream semantics are hash-gated, not pytest-only):

- events_holt_forecast: per event type, Holt double exponential
  smoothing over daily counts — level_k = floor((256*x + 3*(level +
  trend)) / 4), trend_k = floor((level_k - level_{k-1} + 7*trend) / 8),
  forecast made BEFORE seeing the day, alarm when the forecast missed
  by more than 25% of its own (floored) magnitude. Integer fixed-point
  (1/256 units) with power-of-two FLOOR divisions, so the fold is
  bit-exact in all three places it runs: Python's // in the Arrow
  batch (streaming/jobs.py:batch_holt_forecast), the same ints inside
  the stateful stream (holt_forecast_stream), and floor(a / 4.0) in the
  recursive-CTE oracle (exact for |a| < 2^53 — a power-of-two divide
  only shifts the float exponent). The recursion is order-dependent
  (floor kills associativity exactly like CUSUM's max(0,...) clamp), so
  the oracle steps day ranks recursively; trend can go NEGATIVE, which
  is why the SQL uses floor() and not DuckDB's truncating // (Python
  -7 // 8 = -1, DuckDB -7 // 8 = 0 — the one-ULP trap this docstring
  exists to record).

vs events_cusum_control (round12g.py): CUSUM pages on sustained LEVEL
shifts; Holt pages on broken TRAJECTORIES (a feed growing 10%/day going
flat alarms here long before its level drops below a CUSUM band).

Reference parity note: the reference has no streaming or monitoring
surface; extension layer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..streaming import jobs
from . import events_table, query

# level', duplicated because a recursive CTE's step can't name an
# intermediate column: floor((256*x + 3*forecast) / 4)
_LVL = "CAST(floor((256 * r.x + 3 * (h.level + h.trend)) / 4.0) AS BIGINT)"


@query(
    "events_holt_forecast",
    f"""
WITH RECURSIVE daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS x
  FROM events GROUP BY 1, 2),
r AS (
  SELECT event_type, day, x,
         CAST(row_number() OVER (PARTITION BY event_type ORDER BY day)
              AS BIGINT) AS k
  FROM daily),
h AS (
  SELECT event_type, day, x, k,
         256 * x AS level, CAST(0 AS BIGINT) AS trend,
         CAST(0 AS BIGINT) AS forecast, CAST(0 AS INTEGER) AS alarm
  FROM r WHERE k = 1
  UNION ALL
  SELECT r.event_type, r.day, r.x, r.k,
         {_LVL},
         CAST(floor(({_LVL} - h.level + 7 * h.trend) / 8.0) AS BIGINT),
         h.level + h.trend,
         CAST(CASE WHEN 4 * abs(256 * r.x - (h.level + h.trend))
                        > greatest(h.level + h.trend, 256)
              THEN 1 ELSE 0 END AS INTEGER)
  FROM h JOIN r ON r.event_type = h.event_type AND r.k = h.k + 1)
SELECT event_type, day, x AS day_count, forecast, level, trend, alarm
FROM h WHERE k >= 2
ORDER BY event_type, day
""",
)
def events_holt_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt linear-trend forecast chart per event type over daily event
    counts — the online trajectory monitor (first present day seeds
    level/trend, every later present day is forecast BEFORE it is
    seen, then folded into the smoothing state; alarm when the forecast
    missed by > 25%). Integer fixed-point end-to-end. The Spark plan
    aggregates to day grain (the only corpus-sized work) and runs the
    genuinely-sequential recursion in one Arrow batch per type
    (streaming/jobs.py:batch_holt_forecast); the oracle is a recursive
    CTE over day ranks. The STREAMING form of this exact chart —
    finalized day-by-day as the watermark passes, state = 2 longs per
    type — is streaming/jobs.py:holt_forecast_stream, equivalence- and
    kill-restart-pinned in tests/test_round13.py."""
    return jobs.batch_holt_forecast(events_table(spark, sf_dir)).orderBy(
        "event_type", "day"
    )
