"""Round-6 session batch 8 — measurement-of-the-measurement queries:

- dedup_minhash_calibration: how good is the MinHash estimator on THIS
  corpus — candidate count, precision at the 0.5 Jaccard threshold, and
  the integer-exact mean absolute error between the signature estimate
  and exact Jaccard (both first rounded to basis points, so the error
  mass sums as integers — no order-dependent double accumulation). The
  report that justifies (or indicts) the LSH band/row configuration.
- events_ab_health: the two checks every experiment readout needs before
  anyone looks at lift — sample-ratio-mismatch chi-square on the split
  (broken randomization detector) and the pooled two-proportion z-score
  on conversion. All counts integral; chi2 is ONE exact division; z is
  the identical chained-double expression on both engines, rounded at 6
  decimals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import texts
from ..operators import dedup
from . import events_table, query, table
from .llmops import _SQL_SHINGLE_CTES, _SQL_SIG, _ROWS, sql_md5i, sql_round

_PERMS = texts.MINHASH_PERMS


@query(
    "dedup_minhash_calibration",
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
  SELECT id_a, id_b,
    len([i for i in range(1, {_PERMS + 1}) if sa.sig[i] = sb.sig[i]]) AS agree,
    len(list_intersect(sa.h, sb.h)) AS inter, len(sa.h) AS na, len(sb.h) AS nb
  FROM cand JOIN sigs sa ON id_a = sa.doc_id JOIN sigs sb ON id_b = sb.doc_id),
p AS (
  SELECT CAST(round({sql_round(f'CAST(agree AS DOUBLE) / {_PERMS}', 4)} * 10000) AS BIGINT) AS est_bp,
         CAST(round({sql_round('CAST(inter AS DOUBLE) / (na + nb - inter)', 4)} * 10000) AS BIGINT) AS j_bp
  FROM scored)
SELECT count(*) AS n_candidates,
       CAST(sum(CASE WHEN j_bp >= 5000 THEN 1 ELSE 0 END) AS BIGINT) AS n_true,
       {sql_round('CAST(sum(CASE WHEN j_bp >= 5000 THEN 1 ELSE 0 END) AS DOUBLE) / count(*)', 4)}
         AS precision_05,
       CAST(sum(abs(est_bp - j_bp)) AS BIGINT) AS abs_err_bp_total,
       CAST(sum(abs(est_bp - j_bp)) AS DOUBLE) / count(*) AS mae_bp
FROM p
""",
)
def dedup_minhash_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-quality calibration for the MinHash-LSH dedup path: over ALL
    banded candidates (threshold 0 — the unfiltered candidate stream),
    report how many are true near-dups at Jaccard >= 0.5 (precision of
    the band configuration) and the mean absolute error of the
    {_PERMS}-perm signature estimator vs exact Jaccard. Both quantities
    are first snapped to integer basis points so the aggregation is
    exact-integer (no engine-order float drift); MAE in bp is ONE final
    division. This is the report you re-run after changing bands/rows or
    shingle size — an estimator drifting from exact Jaccard silently
    changes who gets deduplicated at 100 TB."""
    pairs = dedup.minhash_lsh_pairs(
        table(spark, sf_dir, "documents"), threshold=0.0
    )
    est_bp = F.round(F.col("est_jaccard") * 10000).cast("long")
    j_bp = F.round(F.col("jaccard") * 10000).cast("long")
    p = pairs.select(est_bp.alias("est_bp"), j_bp.alias("j_bp"))
    n = F.count(F.lit(1))
    n_true = F.sum(F.when(F.col("j_bp") >= 5000, 1).otherwise(0))
    err = F.sum(F.abs(F.col("est_bp") - F.col("j_bp")))
    return p.agg(
        n.alias("n_candidates"),
        n_true.cast("long").alias("n_true"),
        (F.round(n_true.cast("double") / n * 10000) / 10000).alias("precision_05"),
        err.cast("long").alias("abs_err_bp_total"),
        (err.cast("double") / n).alias("mae_bp"),
    )


_MD5U = "CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8) AS BIGINT)"


@query(
    "events_ab_health",
    f"""
WITH assign AS (
  SELECT DISTINCT user_id, CAST({_MD5U} % 2 AS INTEGER) AS variant
  FROM events),
conv AS (SELECT user_id FROM events WHERE event_type = 'purchase'
         GROUP BY user_id HAVING count(*) > {{thr}}),
g AS (SELECT variant, count(*) AS n, count(c.user_id) AS c
      FROM assign a LEFT JOIN conv c ON a.user_id = c.user_id
      GROUP BY variant),
w AS (SELECT
        CAST(sum(CASE WHEN variant = 0 THEN n END) AS BIGINT) AS n_a,
        CAST(sum(CASE WHEN variant = 0 THEN c END) AS BIGINT) AS c_a,
        CAST(sum(CASE WHEN variant = 1 THEN n END) AS BIGINT) AS n_b,
        CAST(sum(CASE WHEN variant = 1 THEN c END) AS BIGINT) AS c_b
      FROM g)
SELECT n_a, c_a, n_b, c_b,
       CAST((n_a - n_b) * (n_a - n_b) AS DOUBLE) / (n_a + n_b) AS srm_chi2,
       CASE WHEN n_a = 0 OR n_b = 0 OR c_a + c_b = 0 OR c_a + c_b = n_a + n_b
            THEN NULL
            ELSE round(((CAST(c_a AS DOUBLE) / n_a - CAST(c_b AS DOUBLE) / n_b)
                 / sqrt((CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))
                        * (1 - CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))
                        * (CAST(1 AS DOUBLE) / n_a + CAST(1 AS DOUBLE) / n_b)))
                * 1000000) / 1000000 END AS z_score
FROM w
""".format(thr=15),
)
def events_ab_health(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experiment health readout for the md5 % 2 split: sample-ratio-
    mismatch chi-square ((n_a-n_b)^2/(n_a+n_b), 1 dof — anything above
    ~3.84 means the 50/50 randomization itself is broken and the lift
    numbers are garbage) and the pooled two-proportion z-score on
    conversion (= heavy buyer, >15 purchases — every fixture user makes
    SOME purchase, which would degenerate the pooled variance to zero;
    the degenerate cases emit NULL on both engines by explicit CASE, not
    by divide-by-zero luck). Counts stay integral; chi2 is one exact
    division; the z expression is written in the identical association
    order as the oracle and rounded at 6 decimals. Two aggregates and
    one co-partitioned join — same plan as events_ab_conversion."""
    ev = events_table(spark, sf_dir)
    assign = (
        ev.select("user_id")
        .distinct()
        .select(
            "user_id",
            (texts.md5int32(F.col("user_id").cast("string")) % 2)
            .cast("int")
            .alias("variant"),
        )
    )
    conv = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("_np"))
        .where(F.col("_np") > 15)
        .select(F.col("user_id").alias("c_user"))
    )
    g = (
        assign.join(conv, assign.user_id == conv.c_user, "left")
        .groupBy("variant")
        .agg(F.count(F.lit(1)).alias("n"), F.count("c_user").alias("c"))
    )
    w = g.agg(
        F.sum(F.when(F.col("variant") == 0, F.col("n"))).cast("long").alias("n_a"),
        F.sum(F.when(F.col("variant") == 0, F.col("c"))).cast("long").alias("c_a"),
        F.sum(F.when(F.col("variant") == 1, F.col("n"))).cast("long").alias("n_b"),
        F.sum(F.when(F.col("variant") == 1, F.col("c"))).cast("long").alias("c_b"),
    )
    n_a, c_a = F.col("n_a"), F.col("c_a")
    n_b, c_b = F.col("n_b"), F.col("c_b")
    pool = (c_a + c_b).cast("double") / (n_a + n_b)
    z = (c_a.cast("double") / n_a - c_b.cast("double") / n_b) / F.sqrt(
        pool * (1 - pool) * (F.lit(1).cast("double") / n_a + F.lit(1).cast("double") / n_b)
    )
    degenerate = (
        (n_a == 0) | (n_b == 0) | (c_a + c_b == 0) | (c_a + c_b == n_a + n_b)
    )
    return w.select(
        "n_a",
        "c_a",
        "n_b",
        "c_b",
        (((n_a - n_b) * (n_a - n_b)).cast("double") / (n_a + n_b)).alias("srm_chi2"),
        F.when(degenerate, F.lit(None).cast("double"))
        .otherwise(F.round(z * 1000000) / 1000000)
        .alias("z_score"),
    )
