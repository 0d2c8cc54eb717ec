"""Round-13 session batch 4 — a third sketch family, the epoch-plan
side of data mixing, and a sessionization rollup:

- events_countmin_estimates: Count-Min sketch (depth 4 x width 256,
  md5-seeded rows) built over the event-type stream, then read back —
  per type, the true count next to the sketch's min-over-rows estimate.
  The sketch is fully deterministic (fixed hash seeds, integer
  counters), so the ORACLE rebuilds the identical counter matrix and
  the estimate is hash-checkable — the property that makes a sketch
  auditable in production. Complements the HLL family (distinct counts)
  with the frequency-estimate sketch.
- corpus_mix_epoch_plan: per-source EPOCH plan for a token budget —
  where corpus_mix_domains downsamples rich sources, this reports the
  other half of the recipe: how many passes (epochs, capped) each
  source needs to fill its target share, and the unfilled deficit. The
  5-row report a data-mixing run prints before training.
- events_session_length_hist: distribution of session sizes (events
  per 30-minute-gap session, capped histogram) — composed ON TOP of
  the registered sessionizer semantics, so the histogram's oracle
  re-derives sessions in SQL and must agree with the Spark windows
  end-to-end.

Reference parity note: the reference has no sketch/mixing/session
surface; extension layer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import texts
from . import events_table, query, sort_report, table

_CM_DEPTH = 4
_CM_WIDTH = 256

_CM_BUCKET = (
    "CAST('0x' || substr(md5(event_type || '_cm' || CAST(j AS VARCHAR)), 1, 13) "
    f"AS BIGINT) % {_CM_WIDTH}"
)


@query(
    "events_countmin_estimates",
    f"""
WITH keyed AS (
  SELECT event_type, CAST(r.range AS BIGINT) AS j, {_CM_BUCKET} AS bucket
  FROM events CROSS JOIN range(0, {_CM_DEPTH}) r),
counters AS (
  SELECT j, bucket, CAST(count(*) AS BIGINT) AS c
  FROM keyed GROUP BY j, bucket),
truth AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS true_n
  FROM events GROUP BY event_type),
probes AS (
  SELECT event_type, CAST(r.range AS BIGINT) AS j, {_CM_BUCKET} AS bucket
  FROM truth CROSS JOIN range(0, {_CM_DEPTH}) r)
SELECT t.event_type AS event_type, t.true_n AS true_n,
       CAST(min(c.c) AS BIGINT) AS cm_estimate,
       CAST(min(c.c) - t.true_n AS BIGINT) AS overcount
FROM probes p JOIN counters c ON p.j = c.j AND p.bucket = c.bucket
JOIN truth t ON t.event_type = p.event_type
GROUP BY t.event_type, t.true_n
ORDER BY event_type""",
)
def events_countmin_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch over the event stream, then audited against the
    truth: build the {_CM_DEPTH}x{_CM_WIDTH} counter matrix (row j
    hashes a key with seed j; every arrival increments one counter per
    row), estimate each type's frequency as min over rows, and report
    estimate vs true count. CM guarantees estimate >= true with
    overcount bounded by collisions — `overcount` IS that audit, and
    because the hashes are fixed md5 seeds the whole sketch is
    bit-reproducible in SQL (a sketch you can hash-check is a sketch
    you can trust in a 100 TB pipeline, where it would be built
    map-side in one pass and merged by + across partitions — the
    counter matrix is {_CM_DEPTH * _CM_WIDTH} longs regardless of
    stream size). Scale shape: the build is one partial-aggregated
    shuffle of (j, bucket) keys; probes touch |types| x depth rows."""
    ev = events_table(spark, sf_dir)
    j_range = F.sequence(F.lit(0), F.lit(_CM_DEPTH - 1))
    bucket = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("event_type"), F.lit("_cm"), F.col("j").cast("string")
                    )
                ),
                1,
                13,
            ),
            16,
            10,
        ).cast("long")
        % _CM_WIDTH
    )
    keyed = (
        ev.select("event_type", F.explode(j_range).alias("j0"))
        .select("event_type", F.col("j0").cast("long").alias("j"))
        .select("event_type", "j", bucket.alias("bucket"))
    )
    counters = keyed.groupBy("j", "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    truth = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("true_n")
    )
    probes = (
        truth.select("event_type", "true_n", F.explode(j_range).alias("j0"))
        .select("event_type", "true_n", F.col("j0").cast("long").alias("j"))
        .select("event_type", "true_n", "j", bucket.alias("bucket"))
    )
    return (
        probes.join(counters, ["j", "bucket"])
        .groupBy("event_type", "true_n")
        .agg(F.min("c").cast("long").alias("cm_estimate"))
        .select(
            "event_type",
            "true_n",
            "cm_estimate",
            (F.col("cm_estimate") - F.col("true_n")).cast("long").alias("overcount"),
        )
        .transform(sort_report, "event_type")
    )


_EP_BUDGET = 1_000_000  # total token budget for the plan
_EP_CAP_BP = 40_000  # max epochs in basis points (4.00x)
# target mix shares in basis points, summing to 10000 (sources beyond
# these get share 0) — the corpus_mix_domains weights, reused so the two
# reports describe the same recipe
_EP_SHARES = {"src0": 4000, "src1": 2500, "src2": 1500, "src3": 1000, "src4": 1000}

_EP_SHARE_CASE = (
    "CASE source "
    + " ".join(f"WHEN '{k}' THEN {v}" for k, v in _EP_SHARES.items())
    + " ELSE 0 END"
)


@query(
    "corpus_mix_epoch_plan",
    f"""
WITH toks AS (
  SELECT source,
         CASE WHEN trim(text) = '' THEN 0
              ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_tokens
  FROM documents),
dom AS (
  SELECT source, CAST(sum(n_tokens) AS BIGINT) AS have,
         CAST({_EP_SHARE_CASE} AS BIGINT) AS share_bp
  FROM toks GROUP BY source),
plan AS (
  SELECT source, have, share_bp,
         CAST({_EP_BUDGET} AS BIGINT) * share_bp // 10000 AS want,
         least(CAST({_EP_CAP_BP} AS BIGINT),
               (CAST({_EP_BUDGET} AS BIGINT) * share_bp // 10000) * 10000
                 // greatest(have, 1)) AS epochs_bp
  FROM dom WHERE share_bp > 0)
SELECT source, have AS have_tokens, want AS want_tokens,
       epochs_bp,
       CAST(least(want, epochs_bp * have // 10000) AS BIGINT) AS planned_tokens,
       CAST(greatest(want - epochs_bp * have // 10000, 0) AS BIGINT)
         AS deficit_tokens
FROM plan ORDER BY source""",
)
def corpus_mix_epoch_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The EPOCH side of a pretraining data recipe: for each source with
    a target share of a {_EP_BUDGET}-token budget, how many passes over
    the source fill it (epochs in basis points, capped at
    {_EP_CAP_BP / 10000}x — the repeat-data ceiling after which quality
    degrades), how many tokens that actually yields, and the deficit
    the mixer must reallocate. corpus_mix_domains implements the
    DOWNSAMPLING half (rich sources); this is the UPSAMPLING half
    (poor sources) — together they are the printed plan of a data-mix
    run. All integer basis-point arithmetic (floor division, mirrored
    `//` vs `div` on nonnegative operands), one |sources|-row
    aggregate; the corpus is scanned once for token totals."""
    docs = table(spark, sf_dir, "documents")
    dom = (
        docs.select("source", texts.token_count("text").alias("n_tokens"))
        .groupBy("source")
        .agg(F.sum("n_tokens").cast("long").alias("have"))
        .withColumn(
            "share_bp",
            F.coalesce(
                *[
                    F.when(F.col("source") == k, F.lit(v))
                    for k, v in _EP_SHARES.items()
                ],
                F.lit(0),
            ).cast("long"),
        )
        .where(F.col("share_bp") > 0)
    )
    want = F.expr(f"CAST({_EP_BUDGET} AS BIGINT) * share_bp div 10000")
    plan = dom.withColumn("want", want).withColumn(
        "epochs_bp",
        F.least(
            F.lit(_EP_CAP_BP).cast("long"),
            F.expr("want * 10000 div greatest(have, 1)"),
        ),
    )
    return plan.select(
        "source",
        F.col("have").alias("have_tokens"),
        F.col("want").alias("want_tokens"),
        "epochs_bp",
        F.least("want", F.expr("epochs_bp * have div 10000"))
        .cast("long")
        .alias("planned_tokens"),
        F.greatest(
            F.col("want") - F.expr("epochs_bp * have div 10000"), F.lit(0)
        )
        .cast("long")
        .alias("deficit_tokens"),
    ).transform(sort_report, "source")


_SLH_CAP = 10  # histogram cap: sessions with >= cap events share a bucket


@query(
    "events_session_length_hist",
    f"""
WITH x AS (
  SELECT user_id, ts, event_id,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pts
  FROM events),
y AS (
  SELECT user_id, ts, event_id,
         CASE WHEN pts IS NULL
                   OR epoch_us(ts) - epoch_us(pts) > 1800000000
              THEN 1 ELSE 0 END AS ns
  FROM x),
z AS (
  SELECT user_id,
         CAST(sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM y),
s AS (SELECT user_id, session_id, count(*) AS n_events
      FROM z GROUP BY user_id, session_id)
SELECT CAST(least(n_events, {_SLH_CAP}) AS BIGINT) AS len_bucket,
       CAST(count(*) AS BIGINT) AS n_sessions
FROM s GROUP BY 1 ORDER BY len_bucket""",
)
def events_session_length_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-size distribution: events per 30-minute-gap session
    (the events_sessionize semantics re-derived, so this rollup's hash
    row transitively re-checks the sessionizer's window chain), bucketed
    at {_SLH_CAP}+ — the engagement histogram behind bot filtering
    (one-event sessions) and power-user analysis (capped tail). One
    user-keyed shuffle serves both windows and the session group-by;
    the histogram itself is {_SLH_CAP} rows."""
    from pyspark.sql import Window

    ev = events_table(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
    ns = F.when(gap.isNull() | (gap > 1_800_000_000), 1).otherwise(0)
    z = ev.select(
        "user_id",
        F.sum(ns).over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("long")
        .alias("session_id"),
    )
    s = z.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    return (
        s.select(F.least("n_events", F.lit(_SLH_CAP)).cast("long").alias("len_bucket"))
        .groupBy("len_bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n_sessions"))
        .transform(sort_report, "len_bucket")
    )
