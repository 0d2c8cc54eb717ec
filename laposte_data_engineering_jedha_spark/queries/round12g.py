"""Round-12 session batch 7 — the CUSUM CONTROL CHART joins the
streaming layer (the 6th custom stateful operator) with an
oracle-checked batch twin:

- events_cusum_control: per event type, the one-sided upper CUSUM
  control chart over daily counts — baseline = the first present day
  (target = its count, slack = target div 10), then the sequential
  fold cusum_k = max(0, cusum_{k-1} + x_k - target - slack), alarm when
  cusum > target. All integer. The recursion is order-dependent (not a
  prefix sum — the max(0,...) clamp kills associativity), so the oracle
  is a RECURSIVE CTE stepping day ranks, and the Spark side runs the
  fold in one Arrow batch per event type over the day-grain aggregate
  (streaming/jobs.py:batch_cusum_control). The streaming twin
  (cusum_control_stream, applyInPandasWithState keyed by event type,
  watermark-finalized days) is equivalence-tested against this exact
  plan in tests/test_streaming.py — the same batch==stream contract as
  the sessionizer.

vs events_cusum_changepoint (round11d.py): that is the RETROSPECTIVE
level-shift test (argmax of the global-mean deviation sum — needs the
whole window); this is the ONLINE monitor a pipeline actually pages on.

Reference parity note: the reference has no streaming or monitoring
surface; extension layer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..streaming import jobs
from . import events_table, query


@query(
    "events_cusum_control",
    """
WITH RECURSIVE daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS x
  FROM events GROUP BY 1, 2),
r AS (
  SELECT event_type, day, x,
         CAST(row_number() OVER (PARTITION BY event_type ORDER BY day)
              AS BIGINT) AS k
  FROM daily),
t AS (SELECT event_type, x AS target, x // 10 AS slack FROM r WHERE k = 1),
c AS (
  SELECT r.event_type, r.day, r.x, r.k,
         CAST(greatest(0, r.x - t.target - t.slack) AS BIGINT) AS cusum
  FROM r JOIN t USING (event_type) WHERE r.k = 2
  UNION ALL
  SELECT r.event_type, r.day, r.x, r.k,
         CAST(greatest(0, c.cusum + r.x - t.target - t.slack) AS BIGINT)
  FROM c
  JOIN r ON r.event_type = c.event_type AND r.k = c.k + 1
  JOIN t ON t.event_type = r.event_type)
SELECT c.event_type AS event_type, c.day AS day, c.x AS day_count,
       c.cusum AS cusum,
       CAST(CASE WHEN c.cusum > t.target THEN 1 ELSE 0 END AS INTEGER) AS alarm
FROM c JOIN t ON t.event_type = c.event_type
ORDER BY event_type, day
""",
)
def events_cusum_control(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided upper CUSUM control chart per event type over daily
    event counts — the online drift monitor (baseline day sets
    target/slack; every later present day folds
    max(0, cusum + x - target - slack); alarm when cusum exceeds
    target). Integer end-to-end. The max(0,...) clamp makes the fold
    genuinely sequential, so the Spark plan aggregates to day grain
    (the only corpus-sized work) and runs the recursion in one Arrow
    batch per type; the oracle is a recursive CTE over day ranks. The
    STREAMING form of this exact chart — finalized day-by-day as the
    watermark passes, state = 3 longs per type — is
    streaming/jobs.py:cusum_control_stream, equivalence-pinned in
    tests/test_streaming.py."""
    return batch_sorted(jobs.batch_cusum_control(events_table(spark, sf_dir)))


def batch_sorted(df: DataFrame) -> DataFrame:
    return df.orderBy("event_type", "day")
