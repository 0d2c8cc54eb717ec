"""Round-7 session batch 8 — nearest as-of, dedup-threshold tuning, and
snapshot reconciliation, all with full DuckDB oracle twins.

- events_asof_nearest_error: completes the as-of family (backward since
  r03, forward since r06) with pandas merge_asof's direction='nearest'
  — each purchase matched to its CLOSEST error by absolute time
  distance within tolerance, ties to the backward match
  (operators/joins.py:asof_join_nearest).
- dedup_threshold_sweep: the Jaccard histogram of every LSH-candidate
  pair, bucketed in integer basis points — ONE candidate pass answers
  "what would each dedup threshold keep/drop", the tuning table behind
  the 0.5 default every minhash query uses.
- dq_snapshot_rowdiff: row-level reconciliation of two table snapshots
  (added / removed / changed / unchanged) via ONE full outer join on
  the key with md5 row fingerprints — the row-level drill-down behind
  the dq_table_checksums anti-entropy gate. Snapshots are derived
  deterministically from orders so both engines diff identical inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import texts
from ..operators import dedup, joins
from . import events_table, query, table
from .llmops import _ROWS, _SQL_SHINGLE_CTES, _SQL_SIG, sql_md5i, sql_round

_TOL_S = 3600

# ============================ nearest as-of ==================================


@query(
    "events_asof_nearest_error",
    f"""
WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS us FROM events
           WHERE event_type = 'purchase'),
e AS (SELECT user_id, epoch_us(ts) AS us FROM events WHERE event_type = 'error'),
b AS (SELECT p.event_id AS event_id, max(e.us) AS back_us
      FROM p LEFT JOIN e ON p.user_id = e.user_id
        AND e.us <= p.us AND p.us - e.us <= {_TOL_S * 1_000_000}
      GROUP BY p.event_id),
f AS (SELECT p.event_id AS event_id, min(e.us) AS fwd_us
      FROM p LEFT JOIN e ON p.user_id = e.user_id
        AND e.us >= p.us AND e.us - p.us <= {_TOL_S * 1_000_000}
      GROUP BY p.event_id)
SELECT p.event_id AS event_id, p.user_id AS user_id, p.us AS purchase_us,
       CASE WHEN back_us IS NULL THEN fwd_us
            WHEN fwd_us IS NULL THEN back_us
            WHEN p.us - back_us <= fwd_us - p.us THEN back_us
            ELSE fwd_us END AS nearest_err_us
FROM p JOIN b USING (event_id) JOIN f USING (event_id)
""",
)
def events_asof_nearest_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each purchase matched to the user's CLOSEST error event within
    +-1 h — merge_asof direction='nearest' semantics (ties -> the
    backward match), via operators/joins.py:asof_join_nearest: the
    backward and forward union-sort-carry passes reconciled on the
    purchase id. Two user_id-keyed window shuffles + one id-keyed join;
    no range join, neither side broadcasts. The oracle's aggregate
    formulation (max over <=, min over >=) is what those carries
    provably equal."""
    ev = events_table(spark, sf_dir)
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    errors = ev.where(F.col("event_type") == "error").select("user_id", "ts")
    out = joins.asof_join_nearest(
        purchases, errors, on="ts", by="user_id", id_cols=["event_id"],
        tolerance_s=_TOL_S,
    )
    return out.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("purchase_us"),
        F.unix_micros("asof_ts").alias("nearest_err_us"),
    )


# ========================== dedup threshold sweep ============================


@query(
    "dedup_threshold_sweep",
    f"""
WITH {_SQL_SHINGLE_CTES},
sigs AS (
  SELECT doc_id, h, {_SQL_SIG} AS sig
  FROM (SELECT doc_id, [{sql_md5i('x')} for x in s] AS h FROM sh)
  WHERE len(h) > 0),
bands AS (
  SELECT doc_id, sig, h, r.range AS band,
         array_to_string(sig[r.range * {_ROWS} + 1 : r.range * {_ROWS} + {_ROWS}], '_') AS key
  FROM sigs CROSS JOIN range(0, {texts.MINHASH_BANDS}) r),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
scored AS (
  SELECT CAST(round(CAST(len(list_intersect(sa.h, sb.h)) AS DOUBLE)
              / (len(sa.h) + len(sb.h) - len(list_intersect(sa.h, sb.h)))
              * 10000) AS BIGINT) AS bp
  FROM cand JOIN sigs sa ON id_a = sa.doc_id JOIN sigs sb ON id_b = sb.doc_id)
SELECT bp // 1000 AS bucket,
       round(CAST(bp // 1000 AS DOUBLE) / 10 * 1000000) / 1000000
         AS jaccard_lo,
       CAST(count(*) AS BIGINT) AS n_pairs
FROM scored GROUP BY bp // 1000
""",
)
def dedup_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threshold-tuning table for MinHash dedup: EVERY LSH-candidate pair
    verified once, bucketed by exact Jaccard into 0.1-wide bins (integer
    basis points, so binning is integer division — no float boundary
    risk). Reading the histogram answers "what does moving the threshold
    from 0.5 to 0.6 drop" WITHOUT re-running the pipeline per threshold
    — one candidate pass serves every threshold decision, which at
    100 TB is the difference between one dedup job and five. Same
    signature/banding fragments as dedup_minhash_lsh (threshold=0 keeps
    all verified candidates)."""
    docs = table(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(docs, threshold=0.0)
    return (
        pairs.select(F.expr("CAST(round(jaccard * 10000) AS BIGINT) div 1000").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
        .select(
            "bucket",
            (F.round(F.col("bucket").cast("double") / 10 * 1000000) / 1000000).alias(
                "jaccard_lo"
            ),
            "n_pairs",
        )
    )


# =========================== snapshot row diff ===============================

# Deterministic synthetic snapshots of `orders`:
#   snapshot A = orders with o_orderkey % 10 <> 0   (some rows "deleted" in B)
#   snapshot B = orders with o_orderkey % 10 <> 1   (so A-only keys % 10 = 1,
#                B-only keys % 10 = 0), and every key % 7 = 0 gets its
#                totalprice bumped one cent ("changed").

# Every fingerprint input is COALESCE'd to a NULL sentinel on BOTH engines
# (ADVICE r7): bare '||' NULL-poisons the whole md5 in DuckDB while Spark's
# concat_ws silently SKIPS NULLs — orders' NOT NULL columns masked the
# divergence, but a nullable snapshot source would classify every NULL-
# bearing row as 'changed'. The sentinel also disambiguates NULL from the
# empty string at field boundaries.
_FP_NULL = "'<NULL>'"


def _sql_fp_field(expr: str) -> str:
    return f"COALESCE({expr}, {_FP_NULL})"


_SNAP_FP = (
    f"md5({_sql_fp_field('CAST(o_custkey AS VARCHAR)')} || '|' "
    f"|| {_sql_fp_field('o_orderstatus')} || '|' "
    f"|| {_sql_fp_field('CAST(cents AS VARCHAR)')} || '|' "
    f"|| {_sql_fp_field('CAST(CAST(o_orderdate AS DATE) AS VARCHAR)')} "
    f"|| '|' || {_sql_fp_field('o_orderpriority')})"
)


@query(
    "dq_snapshot_rowdiff",
    f"""
WITH base AS (
  SELECT o_orderkey, o_custkey, o_orderstatus, o_orderdate, o_orderpriority,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents0
  FROM orders),
a AS (
  SELECT o_orderkey, {_SNAP_FP.replace('cents', 'cents0')} AS fp
  FROM base WHERE o_orderkey % 10 <> 0),
b AS (
  SELECT o_orderkey,
         {_SNAP_FP.replace('cents', '(CASE WHEN o_orderkey % 7 = 0 THEN cents0 + 1 ELSE cents0 END)')} AS fp
  FROM base WHERE o_orderkey % 10 <> 1)
SELECT CASE WHEN a.o_orderkey IS NULL THEN 'added'
            WHEN b.o_orderkey IS NULL THEN 'removed'
            WHEN a.fp = b.fp THEN 'unchanged'
            ELSE 'changed' END AS diff_class,
       CAST(count(*) AS BIGINT) AS n_rows
FROM a FULL OUTER JOIN b ON a.o_orderkey = b.o_orderkey
GROUP BY 1
""",
)
def dq_snapshot_rowdiff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level snapshot reconciliation: two deterministic snapshots of
    `orders` (B deletes keys ending in 1, adds keys ending in 0, and
    bumps every key divisible by 7 one cent) classified into
    added/removed/changed/unchanged with ONE full outer join on the key
    and md5 row fingerprints — the drill-down a failed
    dq_table_checksums row triggers. At 100 TB the fingerprints are
    computed map-side (one narrow string per row) and the outer join
    co-partitions on the key; nothing else crosses the shuffle."""
    base = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_orderdate",
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents0"),
    )

    def fp(cents: F.Column) -> F.Column:
        # coalesce-to-sentinel per field (see _SNAP_FP): concat_ws would
        # SKIP a NULL (colliding with the empty string and drifting from
        # the oracle's ||); the guarded fields can never be NULL, so
        # concat_ws == '||' exactly.
        def g(c: F.Column) -> F.Column:
            return F.coalesce(c, F.lit("<NULL>"))

        return F.md5(
            F.concat_ws(
                "|",
                g(F.col("o_custkey").cast("string")),
                g(F.col("o_orderstatus")),
                g(cents.cast("string")),
                g(F.to_date("o_orderdate").cast("string")),
                g(F.col("o_orderpriority")),
            )
        )

    a = base.where(F.col("o_orderkey") % 10 != 0).select(
        F.col("o_orderkey").alias("ka"), fp(F.col("cents0")).alias("fpa")
    )
    b = base.where(F.col("o_orderkey") % 10 != 1).select(
        F.col("o_orderkey").alias("kb"),
        fp(
            F.when(F.col("o_orderkey") % 7 == 0, F.col("cents0") + 1).otherwise(
                F.col("cents0")
            )
        ).alias("fpb"),
    )
    j = a.join(b, a.ka == b.kb, "full_outer")
    return (
        j.select(
            F.when(F.col("ka").isNull(), "added")
            .when(F.col("kb").isNull(), "removed")
            .when(F.col("fpa") == F.col("fpb"), "unchanged")
            .otherwise("changed")
            .alias("diff_class")
        )
        .groupBy("diff_class")
        .agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
    )
