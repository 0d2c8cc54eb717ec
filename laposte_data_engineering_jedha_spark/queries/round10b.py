"""Round-10 session batch 2 — sketch algebra + data-quality forensics:

- sketch_theta_intersection: set-INTERSECTION cardinality from mergeable
  KMV/theta sketches (the union case is round9c.py:sketch_kmv_union; the
  intersection estimator is the other half of the theta-sketch algebra —
  count common hashes below the joint threshold, scale by 1/theta). At
  100 TB the two user sets never materialize: each side ships k 52-bit
  mins, the estimate is computed from 2k values.
- olap_bloom_join_prune: Bloom-filter semi-join pruning — hash the
  selective dim side into a broadcastable m-bit filter and pre-filter
  the fact scan before any shuffle, reporting the filter's measured
  operating point (passes vs true matches vs false-positive rate). The
  runtime-filter primitive large engines apply at the 100 TB join.
  (A Benford first-digit query was built here first and then REMOVED as
  a near-duplicate of round7l.py:dq_value_first_digit.)
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


# ===================== Bloom-filter join pruning ==============================

# m sized for the key population, not the fixture: ~15k dim keys at sf1
# put ~45k bits in 2^17 (fill 0.29, fp ~2.4%); the round-10 sf1 sweep
# caught the original m=4096 saturating at sf1 (fp -> 1, and the per-row
# array_contains probe scanning the whole bits array made the query
# superlinear — the probe is now a broadcast hash join, O(1) per bit).
_BLM_M = 1 << 17  # bits
_BLM_K = 3  # hash functions
_BLM_PRED_SQL = "c_acctbal > 9000"  # ~10% of customers: a selective dim


def _sql_bit(key: str, i: int) -> str:
    return (
        f"CAST('0x' || substr(md5(CAST({key} AS VARCHAR) || '#{i}'), 1, 13)"
        f" AS BIGINT) % {_BLM_M}"
    )


@query(
    "olap_bloom_join_prune",
    f"""
WITH dim AS (SELECT DISTINCT c_custkey AS k FROM customer
             WHERE {_BLM_PRED_SQL}),
bits AS ({" UNION ".join(f"SELECT DISTINCT {_sql_bit('k', i)} AS b FROM dim"
                          for i in range(1, _BLM_K + 1))}),
barr AS (SELECT list(b) AS arr FROM bits),
probe AS (
  SELECT CASE WHEN {" AND ".join(f"list_contains(arr, {_sql_bit('o_custkey', i)})"
                                  for i in range(1, _BLM_K + 1))}
              THEN 1 ELSE 0 END AS pass,
         CASE WHEN o_custkey IN (SELECT k FROM dim) THEN 1 ELSE 0 END AS hit
  FROM orders, barr)
SELECT CAST(count(*) AS BIGINT) AS n_fact,
       CAST(sum(pass) AS BIGINT) AS n_bloom_pass,
       CAST(sum(hit) AS BIGINT) AS n_true_match,
       {sql_round(
           "(sum(pass) - sum(hit)) * 1.0 / NULLIF(count(*) - sum(hit), 0)", 6
       )}
         AS false_positive_rate
FROM probe
""",
)
def olap_bloom_join_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter semi-join pruning, the 100 TB join-pushdown
    primitive: hash the SELECTIVE dim side's keys into an m={_BLM_M}-bit
    k={_BLM_K} Bloom filter (a KB-scale bit set), broadcast it, and
    pre-filter the fact scan before any shuffle — the runtime-filter
    trick engines apply when the dim predicate survives far fewer keys
    than the fact has rows. Reports the filter's real operating point:
    fact rows, Bloom passes, true matches, and the measured
    false-positive rate (never a false negative — asserted by
    n_bloom_pass >= n_true_match in the oracle equality itself).
    Deterministic md5 bit positions, so both engines build the identical
    filter. The Bloom set rides a broadcast; the fact side never
    shuffles."""
    dim = (
        table(spark, sf_dir, "customer")
        .where(F.col("c_acctbal") > 9000)
        .select(F.col("c_custkey").alias("k"))
        .distinct()
    )

    def bit(key: str, i: int):
        return F.pmod(
            F.conv(
                F.substring(
                    F.md5(F.concat(F.col(key).cast("string"), F.lit(f"#{i}"))),
                    1,
                    13,
                ),
                16,
                10,
            ).cast("long"),
            F.lit(_BLM_M),
        )

    bits = None
    for i in range(1, _BLM_K + 1):
        sel = dim.select(bit("k", i).alias("b"))
        bits = sel if bits is None else bits.unionAll(sel)
    bloom = bits.distinct()
    fact = table(spark, sf_dir, "orders").select("o_custkey")
    # probe = one broadcast HASH-join lookup per hash function: O(1) per
    # probed bit and ZERO fact-side shuffle (array_contains would scan
    # the whole bits array per row — the sf1 sweep measured that
    # superlinear). AND of the k membership markers == the oracle's AND
    # of list_contains.
    probe = fact
    markers = []
    for i in range(1, _BLM_K + 1):
        side = F.broadcast(
            bloom.select(
                F.col("b").alias(f"__b{i}"), F.lit(1).alias(f"__m{i}")
            )
        )
        probe = probe.join(
            side, bit("o_custkey", i) == F.col(f"__b{i}"), "left"
        )
        markers.append(F.col(f"__m{i}") == 1)
    passed = markers[0]
    for m in markers[1:]:
        passed = passed & m
    probe = probe.join(
        F.broadcast(dim.withColumn("__hit", F.lit(1))),
        F.col("o_custkey") == F.col("k"),
        "left",
    ).select(
        F.when(passed, 1).otherwise(0).alias("pass"),
        F.coalesce(F.col("__hit"), F.lit(0)).alias("hit"),
    )
    return probe.agg(
        F.count(F.lit(1)).cast("long").alias("n_fact"),
        F.sum("pass").cast("long").alias("n_bloom_pass"),
        F.sum("hit").cast("long").alias("n_true_match"),
        (
            # NULLIF-guarded denominator (ADVICE r10): if the dim
            # predicate ever covered EVERY fact key there are zero
            # true negatives and the FPR is undefined — both engines
            # must agree on NULL rather than DuckDB erroring while
            # Spark yields NULL-by-division.
            F.round(
                (F.sum("pass") - F.sum("hit"))
                * 1.0
                / F.nullif(
                    (F.count(F.lit(1)) - F.sum("hit")).cast("double"), F.lit(0.0)
                )
                * 1e6
            )
            / 1e6
        ).alias("false_positive_rate"),
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
