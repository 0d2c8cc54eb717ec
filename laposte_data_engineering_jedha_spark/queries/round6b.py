"""Round-6 session batch 2 — bounded-memory summaries and pipeline-ops
queries, each with a full DuckDB oracle twin:

- events_heavy_hitters: EXACT heavy hitters via two-pass Misra-Gries
  (per-partition O(budget) summaries -> candidate recount). The oracle is
  the plain GROUP BY ... HAVING the two-pass scheme provably equals.
- events_kmv_distinct: KMV / theta-sketch distinct estimate (k smallest
  md5 values). Deterministic given the hash, so BOTH engines compute the
  same sketch bit-for-bit — the estimate itself is oracle-checkable,
  unlike randomized sketch libraries.
- dq_schema_profile: per-column profiling report (nulls, distincts,
  md5-canonical min/max) in ONE scan — the schema-drift half of the DQ
  gate family (dq_orders_checks & co cover value constraints).
- events_ewma_daily: exponentially weighted daily event counts
  (alpha = 1/2, 20-day horizon). Dyadic weights keep every partial sum
  EXACT in binary doubles, so the result is bit-identical across engines
  with no rounding step — see the exactness note on the query.
- corpus_negative_pairs: deterministic in-batch negative sampling for
  contrastive training pairs — hash-ring bucket hop, broadcast-join
  scale shape (no per-anchor sort, no cross join).

Float discipline per queries/__init__.py: integer arithmetic end-to-end
except ewma's exact dyadic division and the KMV integer division.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import texts
from ..operators import sketches
from . import events_table, query, table

# --- exact heavy hitters -----------------------------------------------------

_HH_K = 120  # report keys with count * K > n  (n/120 ~ 83 at sf0.01)
_HH_BUDGET = 128  # MG counters per partition; >= K keeps the result exact


@query(
    "events_heavy_hitters",
    f"""
SELECT user_id, count(*) AS n_events
FROM events
WHERE user_id IS NOT NULL
GROUP BY user_id
HAVING count(*) * {_HH_K}
       > (SELECT count(*) FROM events WHERE user_id IS NOT NULL)
""",
)
def events_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Users generating more than 1/120 of all traffic — computed with the
    two-pass Misra-Gries scheme (operators/sketches.py): pass 1 keeps an
    O(budget) in-task summary per partition (no per-key shuffle), pass 2
    recounts only the broadcast candidate set. Provably equal to the
    oracle's full GROUP BY ... HAVING because every key above n/(budget+1)
    survives some partition summary (mergeable-summaries guarantee)."""
    ev = events_table(spark, sf_dir)
    return (
        sketches.heavy_hitters(ev, "user_id", k=_HH_K, budget=_HH_BUDGET)
        .select(F.col("user_id").cast("long").alias("user_id"), "n_events")
    )


# --- KMV distinct sketch -----------------------------------------------------

_KMV_K = 16
_KMV_NUM = (_KMV_K - 1) * (1 << 52)  # (k-1) * 2^52, the estimate numerator


@query(
    "events_kmv_distinct",
    f"""
WITH h AS (SELECT DISTINCT event_type,
                  CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 13) AS BIGINT) AS hv
           FROM events),
r AS (SELECT event_type, hv,
             row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rn
      FROM h),
k AS (SELECT event_type, max(hv) AS kth_hash, count(*) AS kcnt
      FROM r WHERE rn <= {_KMV_K} GROUP BY event_type),
x AS (SELECT event_type, count(*) AS n_exact FROM h GROUP BY event_type)
SELECT x.event_type AS event_type, n_exact,
       CASE WHEN kcnt < {_KMV_K} THEN kcnt
            ELSE {_KMV_NUM} // kth_hash END AS kmv_est
FROM x JOIN k ON x.event_type = k.event_type
""",
)
def events_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values / theta sketch) distinct-user estimate per
    event type, k=16 over a 52-bit md5 hash: est = (k-1) * 2^52 / h_(k)
    (Bar-Yossef et al. counting-distinct sketch; Beyer et al. KMV). The
    k-th smallest is found with a SALTED two-level window — level 1 ranks
    inside (type, hv mod 16) so no single sort ever sees a whole type's
    hash stream, level 2 ranks the <=256 survivors — the shape that holds
    when a type has billions of distinct users. Exact distinct count is
    emitted alongside so the estimate is auditable; both engines compute
    the identical sketch, so even `kmv_est` hash-matches."""
    ev = events_table(spark, sf_dir)
    h = (
        ev.select(
            "event_type",
            F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 13), 16, 10)
            .cast("long")
            .alias("hv"),
        )
        .distinct()
    )
    lvl1 = Window.partitionBy("event_type", F.pmod("hv", F.lit(16))).orderBy("hv")
    lvl2 = Window.partitionBy("event_type").orderBy("hv")
    kmins = (
        h.withColumn("_r1", F.row_number().over(lvl1))
        .where(F.col("_r1") <= _KMV_K)
        .withColumn("_r2", F.row_number().over(lvl2))
        .where(F.col("_r2") <= _KMV_K)
        .groupBy("event_type")
        .agg(F.max("hv").alias("kth_hash"), F.count(F.lit(1)).alias("kcnt"))
    )
    exact = h.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_exact"))
    return exact.join(kmins, "event_type").select(
        "event_type",
        "n_exact",
        F.when(F.col("kcnt") < _KMV_K, F.col("kcnt"))
        .otherwise(F.expr(f"CAST({_KMV_NUM} AS BIGINT) div kth_hash"))
        .alias("kmv_est"),
    )


# --- schema / column profile -------------------------------------------------

_PROFILE_COLS = ["doc_id", "text", "lang", "source", "n_chars"]


def _profile_col_sql(c: str) -> str:
    v = f"CAST({c} AS VARCHAR)"
    return f"""
SELECT '{c}' AS col_name,
       count(*) - count({c}) AS n_nulls,
       count(DISTINCT {c}) AS n_distinct,
       min(md5({v})) AS min_md5,
       max(md5({v})) AS max_md5
FROM documents"""


@query(
    "dq_schema_profile",
    " UNION ALL ".join(_profile_col_sql(c) for c in _PROFILE_COLS),
)
def dq_schema_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-profile report over documents: null count, exact distinct
    count, and md5-canonical min/max per column (md5, not raw values, so
    the cross-engine comparison never depends on string collation and the
    report row stays narrow even for document-length text). Spark side is
    ONE scan — all 5x4 aggregates in a single agg, stacked to long form —
    where the oracle's UNION ALL scans per column; at 100 TB the single
    pass is the point of the operator."""
    docs = table(spark, sf_dir, "documents")
    aggs = []
    for c in _PROFILE_COLS:
        v = F.col(c).cast("string")
        aggs += [
            (F.count(F.lit(1)) - F.count(c)).alias(f"nn_{c}"),
            F.count_distinct(F.col(c)).alias(f"nd_{c}"),
            F.min(F.md5(v)).alias(f"mn_{c}"),
            F.max(F.md5(v)).alias(f"mx_{c}"),
        ]
    wide = docs.agg(*aggs)
    stack = ", ".join(f"'{c}', nn_{c}, nd_{c}, mn_{c}, mx_{c}" for c in _PROFILE_COLS)
    return wide.selectExpr(
        f"stack({len(_PROFILE_COLS)}, {stack}) AS (col_name, n_nulls, n_distinct, min_md5, max_md5)"
    )


# --- exponentially weighted daily counts -------------------------------------

_EWMA_HORIZON = 19  # days preceding; alpha = 1/2


@query(
    "events_ewma_daily",
    f"""
WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n_events
               FROM events GROUP BY event_type, CAST(ts AS DATE)),
m AS (SELECT min(day) AS d0 FROM daily),
d AS (SELECT event_type, day, n_events,
             date_diff('day', d0, day) AS day_idx
      FROM daily, m)
SELECT event_type, day, n_events,
       sum(n_events * pow(2.0, day_idx)) OVER (
           PARTITION BY event_type ORDER BY day_idx
           RANGE BETWEEN {_EWMA_HORIZON} PRECEDING AND CURRENT ROW
       ) / pow(2.0, day_idx + 1) AS ewma
FROM d
""",
)
def events_ewma_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA-smoothed daily event counts per type, alpha = 1/2 over a
    20-day horizon: ewma_t = sum_{j=0..19} x_{t-j} * 0.5^(j+1), with
    calendar gaps contributing 0 (the RANGE frame on a day index skips
    them, a ROWS frame would not).

    Exactness: weights are dyadic, counts are small integers, and the
    frame spans 20 dyadic octaves, so every term AND every partial sum
    fits in a double's 53-bit significand (~9 count bits + 19 shift bits
    + log2(20) carry bits). The division by 2^(idx+1) is exact too —
    bit-identical across engines with NO rounding convention needed,
    and immune to either engine's summation order."""
    ev = events_table(spark, sf_dir)
    daily = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n_events")
    )
    d0 = daily.agg(F.min("day").alias("_d0"))
    d = (
        daily.crossJoin(F.broadcast(d0))
        .withColumn("day_idx", F.datediff("day", "_d0"))
        .drop("_d0")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day_idx")
        .rangeBetween(-_EWMA_HORIZON, 0)
    )
    return d.select(
        "event_type",
        "day",
        "n_events",
        (
            F.sum(F.col("n_events") * F.pow(F.lit(2.0), F.col("day_idx"))).over(w)
            / F.pow(F.lit(2.0), F.col("day_idx") + 1)
        ).alias("ewma"),
    )


# --- deterministic negative sampling ------------------------------------------

_NEG_BUCKETS = 64
_NEG_PER_ANCHOR = 3


@query(
    "corpus_negative_pairs",
    f"""
WITH d AS (SELECT doc_id,
                  CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
                      % {_NEG_BUCKETS} AS bucket,
                  CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) AS h
           FROM documents),
reps AS (SELECT bucket, doc_id AS rep_id
         FROM (SELECT bucket, doc_id,
                      row_number() OVER (PARTITION BY bucket ORDER BY h, doc_id) AS rn
               FROM d)
         WHERE rn = 1),
a AS (SELECT doc_id, bucket, j
      FROM d CROSS JOIN (SELECT unnest([1, 2, 3]) AS j))
SELECT a.doc_id AS doc_id, a.j AS j, reps.rep_id AS neg_id
FROM a JOIN reps ON (a.bucket + a.j) % {_NEG_BUCKETS} = reps.bucket
WHERE reps.rep_id != a.doc_id
""",
)
def corpus_negative_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic negative sampling for contrastive pairs: every doc
    draws {_NEG_PER_ANCHOR} negatives by hopping to the next 3 buckets on
    a 64-bucket md5 hash ring and taking each bucket's canonical
    representative (min md5, doc_id tiebreak). Reproducible across runs /
    engines / partitionings (no rand()), and the scale shape is a
    BROADCAST join against a 64-row rep table — no per-anchor top-k sort,
    no cross join, unlike 'rank all candidates per anchor' sampling."""
    docs = table(spark, sf_dir, "documents").select("doc_id")
    sid = F.col("doc_id").cast("string")
    d = docs.select(
        "doc_id",
        F.pmod(texts.md5int32(sid), F.lit(_NEG_BUCKETS)).alias("bucket"),
        texts.md5int60(sid).alias("h"),
    )
    rn = Window.partitionBy("bucket").orderBy("h", "doc_id")
    reps = (
        d.withColumn("_rn", F.row_number().over(rn))
        .where(F.col("_rn") == 1)
        .select(F.col("bucket").alias("rep_bucket"), F.col("doc_id").alias("rep_id"))
    )
    anchors = d.select(
        "doc_id",
        "bucket",
        F.explode(F.array(*[F.lit(j) for j in range(1, _NEG_PER_ANCHOR + 1)])).alias("j"),
    )
    return (
        anchors.join(
            F.broadcast(reps),
            F.pmod(F.col("bucket") + F.col("j"), F.lit(_NEG_BUCKETS))
            == F.col("rep_bucket"),
        )
        .where(F.col("rep_id") != F.col("doc_id"))
        .select("doc_id", "j", F.col("rep_id").alias("neg_id"))
    )
