"""Round-6 session batch 5 — forward as-of correlation and the CEP
automaton's declarative batch twin:

- events_asof_next_error: for every purchase, the NEXT error by the same
  user within 1 hour (support-ticket / failure-correlation shape). The
  Spark side is the union-sort-carry FORWARD as-of join
  (operators/joins.py::_asof_forward — one user_id shuffle, no range
  join); the oracle deliberately uses the naive range LEFT JOIN + min()
  the as-of shape replaces.
- events_cep_completions: every completion of the CEP pattern
  view (click)* purchase, expressed DECLARATIVELY: a purchase completes
  iff the most recent preceding non-click event of that user is a view
  (equivalent to the streaming automaton in
  streaming/jobs.py::pattern_completions_stream — a second view re-arms,
  any other event disarms, a purchase consumes the armed view; the
  equivalence is asserted in tests/test_round6e.py). Output schema is
  the stream's (user_id, view_us, purchase_us), integer micros.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import joins
from . import events_table, query

_TOL_S = 3600


@query(
    "events_asof_next_error",
    f"""
WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
e AS (SELECT user_id, ts FROM events WHERE event_type = 'error'),
m AS (SELECT p.event_id AS event_id, p.user_id AS user_id,
             epoch_us(p.ts) AS purchase_us,
             min(epoch_us(e.ts)) AS err_us
      FROM p LEFT JOIN e
        ON p.user_id = e.user_id
       AND e.ts >= p.ts
       AND epoch_us(e.ts) - epoch_us(p.ts) <= {_TOL_S * 1_000_000}
      GROUP BY p.event_id, p.user_id, epoch_us(p.ts))
SELECT event_id, user_id, purchase_us, err_us,
       err_us - purchase_us AS wait_us
FROM m
""",
)
def events_asof_next_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Next-error-after-purchase correlation: forward as-of join with a
    1-hour tolerance. The oracle is the quadratic-candidate range join +
    per-purchase min(); the Spark plan is the merge-carry over ONE
    user_id shuffle — the difference between the two is this operator's
    entire reason to exist at 100 TB (the backward twin is
    events_asof_last_purchase)."""
    ev = events_table(spark, sf_dir)
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    errors = ev.where(F.col("event_type") == "error").select(
        "user_id", "ts", F.unix_micros("ts").alias("err_us")
    )
    out = joins.asof_join(
        purchases,
        errors,
        on="ts",
        by="user_id",
        value_cols=["err_us"],
        tolerance_s=_TOL_S,
        direction="forward",
    )
    return out.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("purchase_us"),
        F.col("asof_err_us").alias("err_us"),
        (F.col("asof_err_us") - F.unix_micros("ts")).alias("wait_us"),
    )


@query(
    "events_cep_completions",
    """
WITH o AS (
  SELECT user_id, ts, event_id, event_type,
         last_value(CASE WHEN event_type != 'click' THEN event_type END
                    IGNORE NULLS) OVER w AS prev_nc_type,
         last_value(CASE WHEN event_type != 'click' THEN epoch_us(ts) END
                    IGNORE NULLS) OVER w AS prev_nc_us
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
SELECT user_id, prev_nc_us AS view_us, epoch_us(ts) AS purchase_us
FROM o WHERE event_type = 'purchase' AND prev_nc_type = 'view'
""",
)
def events_cep_completions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All completions of the CEP pattern view (click)* purchase, one row
    per completing purchase: the most recent preceding NON-CLICK event of
    the user must be a view (clicks are transparent; a later view re-arms
    with its own timestamp; the emitting purchase itself disarms the next
    one — all of which this single ignore-nulls carry window encodes
    without an automaton). Batch twin of
    streaming/jobs.py::pattern_completions_stream; events_pattern_match
    answers the session-grain yes/no version, this emits every completion
    with its exact (view, purchase) micro-timestamps."""
    ev = events_table(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    nc = F.col("event_type") != "click"
    prev_type = F.last(F.when(nc, F.col("event_type")), ignorenulls=True).over(w)
    prev_us = F.last(F.when(nc, F.unix_micros("ts")), ignorenulls=True).over(w)
    return (
        ev.select(
            "user_id",
            "ts",
            "event_type",
            prev_type.alias("prev_nc_type"),
            prev_us.alias("prev_nc_us"),
        )
        .where((F.col("event_type") == "purchase") & (F.col("prev_nc_type") == "view"))
        .select(
            "user_id",
            F.col("prev_nc_us").alias("view_us"),
            F.unix_micros("ts").alias("purchase_us"),
        )
    )
