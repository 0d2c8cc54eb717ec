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
    probes x corpus with the probe matrix shipped into an Arrow
    mapInPandas kernel (ONE BLAS gemm per batch — the JVM HOF zip_with
    formulation measured 252 s at 400k vectors, the kernel 7.6 s),
    never corpus x corpus. Exactness survives the float kernel: every
    product and partial sum of the grid-quantized values is an integer
    below 2^53, so float64 arithmetic is bit-identical to the oracle's
    BIGINT math."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

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
        .collect()  # contractually tiny: <= _N_PROBES rows (the PQ
        # query-side precedent — the probe matrix ships to every task)
    )
    p_ids = np.array([r["vec_id"] for r in probes], dtype="int64")
    p_labels = {int(r["vec_id"]): r["label"] for r in probes}
    p_mat = np.array([r["q"] for r in probes], dtype="float64")  # (P, 64)
    p_sq = (p_mat * p_mat).sum(axis=1)  # exact: integer-valued < 2^53

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        """Per-batch candidate scan: one (B,64)x(64,P) gemm gives all
        probe distances. Integer-valued float64 stays EXACT (every
        product and partial sum < 2^53), so results are bit-identical
        to the oracle's BIGINT arithmetic; per-batch argmin keeps the
        (dist, cand_id) tie-break, and the global argmin happens in the
        min-struct aggregate downstream."""
        for pdf in batches:
            if not len(pdf):
                continue
            c = np.array([np.asarray(v, dtype="float64") for v in pdf["q"]])
            ids = pdf["vec_id"].to_numpy(dtype="int64")
            labels = pdf["label"].to_numpy()
            d2 = (
                (c * c).sum(axis=1)[:, None] - 2.0 * (c @ p_mat.T) + p_sq[None, :]
            )  # (B, P)
            d2[ids[:, None] == p_ids[None, :]] = np.inf  # exclude self
            rows = []
            for j in range(len(p_ids)):
                col = d2[:, j]
                best = np.flatnonzero(col == col.min())
                # (dist, cand_id) tie-break inside the batch
                k = best[np.argmin(ids[best])]
                if np.isfinite(col[k]):
                    rows.append(
                        (int(p_ids[j]), int(col[k]), int(ids[k]), int(labels[k]))
                    )
            yield pd.DataFrame(
                rows, columns=["probe_id", "dist", "cand_id", "cand_label"]
            )

    partial = q.mapInPandas(
        scan, schema="probe_id long, dist long, cand_id long, cand_label int"
    )
    nn = (
        partial.groupBy("probe_id")
        .agg(
            F.min(
                F.struct("dist", "cand_id", "cand_label")
            ).alias("m")
        )
        .select("probe_id", F.col("m.cand_label").alias("cand_label"))
    )
    label_map = F.create_map(
        *[F.lit(x) for pid in p_labels for x in (pid, p_labels[pid])]
    )
    nn = nn.withColumn("probe_label", label_map[F.col("probe_id")])
    match = F.sum(F.when(F.col("probe_label") == F.col("cand_label"), 1).otherwise(0))
    return nn.agg(
        F.count(F.lit(1)).alias("n_probes"),
        match.cast("long").alias("n_label_match"),
        (match.cast("double") / F.count(F.lit(1))).alias("knn1_accuracy"),
    )
