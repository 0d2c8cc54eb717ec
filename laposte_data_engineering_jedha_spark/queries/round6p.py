"""Round-6 session batch 17 — product health and embedding quality, each
with a full DuckDB oracle twin:

- events_session_bounce_rate: share of single-event sessions per day —
  the bounce-rate row of every product dashboard, at the shared 30-min
  session grain.
- embedding_knn_label_accuracy: 1-NN label agreement for a deterministic
  64-probe sample against the full corpus — the standard quick probe of
  embedding quality (if nearest neighbors don't share labels, the space
  is noise). The probe side is hash-sampled and BROADCAST, so the scan
  is probes x corpus, never corpus x corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import texts
from . import events_table, query, table
from .llmops import sql_md5i

_N_PROBES = 64


@query(
    "events_session_bounce_rate",
    """
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
  SELECT user_id, ts,
         CAST(sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM y),
s AS (
  SELECT user_id, session_id, min(CAST(ts AS DATE)) AS day,
         count(*) AS n_events
  FROM z GROUP BY user_id, session_id)
SELECT day, count(*) AS n_sessions,
       CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bounces,
       CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS DOUBLE) / count(*)
         AS bounce_rate
FROM s GROUP BY day
""",
)
def events_session_bounce_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily bounce rate: share of 30-min-gap sessions containing exactly
    one event, attributed to the session's start day. Same single
    user_id shuffle as the sessionizer; integer counts with one final
    division per day. The oracle's lag/cumsum CTE is the shared
    sessionization fragment with the full (ts, event_id) tie-break."""
    ev = events_table(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
    new_sess = F.when(gap.isNull() | (gap > 1_800_000_000), 1).otherwise(0)
    sess = F.sum(new_sess).over(w.rowsBetween(Window.unboundedPreceding, 0))
    s = (
        ev.select("user_id", "ts", sess.alias("session_id"))
        .groupBy("user_id", "session_id")
        .agg(
            F.min(F.to_date("ts")).alias("day"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    bounces = F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0))
    return s.groupBy("day").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        bounces.cast("long").alias("n_bounces"),
        (bounces.cast("double") / F.count(F.lit(1))).alias("bounce_rate"),
    )


_SQL_QVEC = (
    "[CAST(floor(CAST(x AS DOUBLE) * 1000 + CAST(0.5 AS DOUBLE)) AS BIGINT)"
    " for x in embedding]"
)


def _sql_sqdist(a: str, b: str) -> str:
    return (
        "list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"[({a}[i] - {b}[i]) * ({a}[i] - {b}[i]) for i in range(1, 65)]), "
        "(s, x) -> s + x)"
    )


@query(
    "embedding_knn_label_accuracy",
    f"""
WITH q AS (SELECT vec_id, label, {_SQL_QVEC} AS q FROM embeddings),
probes AS (SELECT * FROM q
           WHERE {sql_md5i("CAST(vec_id AS VARCHAR)")} % 100 < 13
           ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT {_N_PROBES}),
d AS (SELECT p.vec_id AS probe_id, p.label AS probe_label,
             c.vec_id AS cand_id, c.label AS cand_label,
             {_sql_sqdist('p.q', 'c.q')} AS dist
      FROM probes p JOIN q c ON p.vec_id != c.vec_id),
nn AS (SELECT probe_id, probe_label, cand_label FROM d
       QUALIFY row_number() OVER (PARTITION BY probe_id
                                  ORDER BY dist, cand_id) = 1)
SELECT count(*) AS n_probes,
       CAST(sum(CASE WHEN probe_label = cand_label THEN 1 ELSE 0 END) AS BIGINT)
         AS n_label_match,
       CAST(sum(CASE WHEN probe_label = cand_label THEN 1 ELSE 0 END) AS DOUBLE)
         / count(*) AS knn1_accuracy
FROM nn
""",
)
def embedding_knn_label_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-NN label agreement over a deterministic md5-sampled probe set
    ({_N_PROBES} probes, broadcast) against the full grid-quantized
    corpus: for each probe, does its nearest non-self neighbor (integer
    squared distance, (dist, cand_id) tie-break) share its label? The
    standard smoke probe of embedding quality — random vectors score at
    chance (1/|labels|), a trained space scores far above. Scan cost is
    probes x corpus with the probe side broadcast — the same bounded
    shape as knn_brute_force, never corpus x corpus."""
    emb = table(spark, sf_dir, "embeddings")
    q = emb.select(
        "vec_id",
        "label",
        F.transform(
            "embedding",
            lambda x: F.floor(x.cast("double") * 1000 + F.lit(0.5)).cast("long"),
        ).alias("q"),
    )
    hpct = F.pmod(texts.md5int32(F.col("vec_id").cast("string")), F.lit(100))
    probes = (
        q.where(hpct < 13)
        .orderBy(F.md5(F.col("vec_id").cast("string")))
        .limit(_N_PROBES)
        .select(
            F.col("vec_id").alias("probe_id"),
            F.col("label").alias("probe_label"),
            F.col("q").alias("pq"),
        )
    )
    d = q.crossJoin(F.broadcast(probes)).where(F.col("vec_id") != F.col("probe_id"))
    dist = F.aggregate(
        F.zip_with("pq", "q", lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda s, x: s + x,
    )
    nn = (
        d.select(
            "probe_id",
            "probe_label",
            F.struct(
                dist.alias("dist"),
                F.col("vec_id").alias("cand_id"),
                F.col("label").alias("cand_label"),
            ).alias("dc"),
        )
        .groupBy("probe_id")
        .agg(F.min("dc").alias("m"), F.first("probe_label").alias("probe_label"))
        .select("probe_id", "probe_label", F.col("m.cand_label").alias("cand_label"))
    )
    match = F.sum(F.when(F.col("probe_label") == F.col("cand_label"), 1).otherwise(0))
    return nn.agg(
        F.count(F.lit(1)).alias("n_probes"),
        match.cast("long").alias("n_label_match"),
        (match.cast("double") / F.count(F.lit(1))).alias("knn1_accuracy"),
    )
