"""Round-10 session batch 2 — sketch algebra + data-quality forensics:

- sketch_theta_intersection: set-INTERSECTION cardinality from mergeable
  KMV/theta sketches (the union case is round9c.py:sketch_kmv_union; the
  intersection estimator is the other half of the theta-sketch algebra —
  count common hashes below the joint threshold, scale by 1/theta). At
  100 TB the two user sets never materialize: each side ships k 52-bit
  mins, the estimate is computed from 2k values.
- dq_benford_first_digit: Benford's-law first-digit profile of order
  totals next to the theoretical log10(1 + 1/d) shares — the classic
  bulk fraud / synthetic-data forensic, one scan + a 9-row aggregate.
- dq_sequential_gap_report: per-block integrity audit of a supposedly
  dense id sequence (missing ids + duplicate ids per fixed-width id
  block, computed from span vs distinct-count arithmetic — no global
  sort, no self-join, block-local aggregates only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import caches
from . import events_table, query, table
from .llmops import sql_round

# ===================== theta-sketch intersection ==============================

_THI_K = 64
_THI_SPACE = 1 << 52
_THI_A, _THI_B = "click", "purchase"
_THI_HV = "CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 13) AS BIGINT)"


@query(
    "sketch_theta_intersection",
    f"""
WITH h AS (SELECT DISTINCT event_type AS scope, {_THI_HV} AS hv
           FROM events WHERE event_type IN ('{_THI_A}', '{_THI_B}')),
r AS (SELECT scope, hv, row_number() OVER (PARTITION BY scope ORDER BY hv) AS rn
      FROM h),
mins AS (SELECT scope, hv FROM r WHERE rn <= {_THI_K}),
per AS (SELECT scope, max(hv) AS kth, count(*) AS kcnt FROM mins GROUP BY scope),
th AS (SELECT min(CASE WHEN kcnt = {_THI_K} THEN kth ELSE {_THI_SPACE} END)
              AS theta
       FROM per),
cand AS (SELECT a.hv AS hv FROM mins a JOIN mins b ON a.hv = b.hv
         WHERE a.scope = '{_THI_A}' AND b.scope = '{_THI_B}'),
icnt AS (SELECT count(*) AS c FROM cand, th WHERE cand.hv < th.theta),
ex AS (SELECT
         (SELECT count(*) FROM h WHERE scope = '{_THI_A}') AS n_a_exact,
         (SELECT count(*) FROM h WHERE scope = '{_THI_B}') AS n_b_exact,
         (SELECT count(*) FROM h a JOIN h b ON a.hv = b.hv
          WHERE a.scope = '{_THI_A}' AND b.scope = '{_THI_B}') AS n_inter_exact)
SELECT CAST(n_a_exact AS BIGINT) AS n_a_exact,
       CAST(n_b_exact AS BIGINT) AS n_b_exact,
       CAST(n_inter_exact AS BIGINT) AS n_inter_exact,
       CAST(CASE WHEN theta >= {_THI_SPACE} THEN c
                 ELSE (c * {_THI_SPACE}) // theta END AS BIGINT)
         AS theta_inter_est
FROM icnt, th, ex
""",
)
def sketch_theta_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """|users who {_THI_A}ed ∩ users who {_THI_B}d| estimated from two
    k={_THI_K} KMV sketches: theta = the smaller k-th minimum (or the
    full 52-bit space when a sketch is under-full and therefore exact),
    estimate = (common mins below theta) / theta. Exact counts ride
    along as audit columns. The k-min selection uses the two-level
    window (bucketed row_number, then per-scope rank over <= 16k
    survivors) so no single task ever sorts a full user set; everything
    downstream of the sketches is a few-row broadcast. Deterministic md5
    hashing makes both engines' sketches identical bit-for-bit."""
    ev = events_table(spark, sf_dir).where(
        F.col("event_type").isin(_THI_A, _THI_B)
    )
    h = caches.track(
        ev.select(
            F.col("event_type").alias("scope"),
            F.conv(
                F.substring(F.md5(F.col("user_id").cast("string")), 1, 13), 16, 10
            )
            .cast("long")
            .alias("hv"),
        )
        .distinct()
        .persist()
    )  # reused by the sketch, both exact counts, and the intersection:
    # persisting the (scope, hv) distinct set (<= 2x user count rows)
    # collapses six event scans into one
    lvl1 = Window.partitionBy("scope", F.pmod("hv", F.lit(16))).orderBy("hv")
    lvl2 = Window.partitionBy("scope").orderBy("hv")
    mins = (
        h.withColumn("_r1", F.row_number().over(lvl1))
        .where(F.col("_r1") <= _THI_K)
        .withColumn("_r2", F.row_number().over(lvl2))
        .where(F.col("_r2") <= _THI_K)
        .select("scope", "hv")
    )
    per = mins.groupBy("scope").agg(
        F.max("hv").alias("kth"), F.count(F.lit(1)).alias("kcnt")
    )
    th = per.agg(
        F.min(
            F.when(F.col("kcnt") == _THI_K, F.col("kth")).otherwise(
                F.lit(_THI_SPACE)
            )
        ).alias("theta")
    )
    cand = (
        mins.where(F.col("scope") == _THI_A)
        .select("hv")
        .join(mins.where(F.col("scope") == _THI_B).select("hv"), "hv")
    )
    icnt = (
        cand.join(F.broadcast(th))
        .where(F.col("hv") < F.col("theta"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    ha = h.where(F.col("scope") == _THI_A).select("hv")
    hb = h.where(F.col("scope") == _THI_B).select("hv")
    ex = (
        ha.agg(F.count(F.lit(1)).cast("long").alias("n_a_exact"))
        .crossJoin(
            F.broadcast(hb.agg(F.count(F.lit(1)).cast("long").alias("n_b_exact")))
        )
        .crossJoin(
            F.broadcast(
                ha.join(hb, "hv").agg(
                    F.count(F.lit(1)).cast("long").alias("n_inter_exact")
                )
            )
        )
    )
    est = F.when(F.col("theta") >= _THI_SPACE, F.col("c")).otherwise(
        F.expr(f"(c * {_THI_SPACE}) div theta")
    )
    return (
        icnt.crossJoin(F.broadcast(th))
        .crossJoin(F.broadcast(ex))
        .select(
            "n_a_exact",
            "n_b_exact",
            "n_inter_exact",
            est.cast("long").alias("theta_inter_est"),
        )
    )


# ===================== Benford first-digit profile ============================


@query(
    "dq_benford_first_digit",
    f"""
WITH c AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents
           FROM orders WHERE o_totalprice > 0),
d AS (SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS BIGINT) AS digit
      FROM c),
t AS (SELECT count(*) AS n_total FROM d)
SELECT digit, CAST(count(*) AS BIGINT) AS n,
       {sql_round("count(*) * 1.0 / n_total", 6)} AS share,
       {sql_round("log10(1 + 1.0 / digit)", 6)} AS benford_share
FROM d, t GROUP BY digit, n_total
""",
)
def dq_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-significant-digit distribution of order totals vs the
    Benford expectation log10(1 + 1/d) — the standard forensic screen
    for fabricated or synthesized monetary data (real multiplicative
    processes are Benford-ish; uniform generators are flat). Digit
    extraction goes through exact integer cents -> string, never
    float-log bucketing, so both engines bin identically. One scan, one
    9-row aggregate, a broadcast total."""
    o = table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 0)
    d = o.select(
        F.substring(
            F.round(F.col("o_totalprice") * 100).cast("long").cast("string"), 1, 1
        )
        .cast("long")
        .alias("digit")
    )
    t = d.agg(F.count(F.lit(1)).alias("n_total"))
    return (
        d.groupBy("digit")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .crossJoin(F.broadcast(t))
        .select(
            "digit",
            "n",
            (F.round(F.col("n") * 1.0 / F.col("n_total") * 1e6) / 1e6).alias(
                "share"
            ),
            (F.round(F.log10(1 + 1.0 / F.col("digit")) * 1e6) / 1e6).alias(
                "benford_share"
            ),
        )
    )


# ===================== sequential-id gap report ===============================

_GAP_BLOCK = 100


@query(
    "dq_sequential_gap_report",
    f"""
SELECT event_id // {_GAP_BLOCK} AS block,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(DISTINCT event_id) AS BIGINT) AS n_ids,
       CAST(max(event_id) - min(event_id) + 1 - count(DISTINCT event_id)
            AS BIGINT) AS n_missing_interior,
       CAST(count(*) - count(DISTINCT event_id) AS BIGINT) AS n_duplicates
FROM events GROUP BY 1
""",
)
def dq_sequential_gap_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integrity audit of the (supposedly dense) event_id sequence, per
    {_GAP_BLOCK}-id block: interior gaps from span-vs-distinct
    arithmetic (max - min + 1 - n_distinct) and duplicate ids from
    rows-vs-distinct — the ingestion-pipeline loss/replay detector. No
    global sort, no lag() over the full sequence, no self-join: block
    hash-aggregates only, so the plan is one partial-aggregated scan at
    any corpus size."""
    return (
        events_table(spark, sf_dir)
        .groupBy(F.expr(f"event_id div {_GAP_BLOCK}").alias("block"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.countDistinct("event_id").cast("long").alias("n_ids"),
            (
                F.max("event_id")
                - F.min("event_id")
                + 1
                - F.countDistinct("event_id")
            )
            .cast("long")
            .alias("n_missing_interior"),
            (F.count(F.lit(1)) - F.countDistinct("event_id"))
            .cast("long")
            .alias("n_duplicates"),
        )
    )
