"""Round-7 session batch 9 — freshness DQ, market-share momentum, and
media chunk planning, all with full DuckDB oracle twins.

- dq_freshness_report: per time-bearing table, the newest timestamp and
  its staleness against the newest timestamp anywhere — the ingestion
  health gate (a stalled feed shows up as one table's lag exploding).
- olap_nation_share_momentum: per (nation, month) revenue share and its
  month-over-month delta, BOTH in integer parts-per-million (share via
  BIGINT integer division, delta via lag over the integer shares) so
  momentum never depends on float rounding.
- multimodal_chunk_windows: fixed-window-with-overlap chunk plan for
  audio media (the whisper-style 30 s / 5 s-overlap transcription
  layout) — offsets are pure arithmetic over synthetic durations, the
  explode is map-side, and the decode stage stays the documented codec
  stub (operators/multimodal.py): the Spark-side plumbing is what this
  verifies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import ensure_runtime_confs, events_table, query, table

# ============================ freshness report ===============================

# (table, SQL timestamp-micros expr, Spark builder) — events.ts needs the
# nanos-as-long read handled by events_table; order/ship dates are midnight
# timestamps in both engines.
_FRESH_SQL_SRC = [
    ("events", "SELECT epoch_us(ts) AS us FROM events"),
    ("orders", "SELECT epoch_us(o_orderdate) AS us FROM orders"),
    ("lineitem", "SELECT epoch_us(l_shipdate) AS us FROM lineitem"),
]

_FRESH_SQL = f"""
WITH u AS ({' UNION ALL '.join(f"SELECT '{t}' AS table_name, us FROM ({q}) q_{t}" for t, q in _FRESH_SQL_SRC)}),
m AS (SELECT table_name, CAST(count(*) AS BIGINT) AS n_rows,
             CAST(max(us) AS BIGINT) AS max_us
      FROM u GROUP BY table_name),
g AS (SELECT CAST(max(max_us) AS BIGINT) AS global_max FROM m)
SELECT table_name, n_rows, max_us,
       CAST(global_max - max_us AS BIGINT) AS staleness_us
FROM m CROSS JOIN g
"""


@query("dq_freshness_report", _FRESH_SQL)
def dq_freshness_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingestion freshness: for each time-bearing table, the newest
    event-time and its lag behind the newest event-time anywhere in the
    warehouse — the gate that catches a stalled feed before every
    downstream join silently goes stale. One max-aggregate per table
    (map-side partials, no shuffle beyond the 1-row combines) + a
    broadcast global max. Integer microseconds end to end."""
    ensure_runtime_confs(spark)
    srcs = [
        ("events", events_table(spark, sf_dir).select(F.unix_micros("ts").alias("us"))),
        (
            # date columns read as TIMESTAMP_NTZ; the cast is
            # value-preserving under the UTC session (events_table note)
            "orders",
            table(spark, sf_dir, "orders").select(
                F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("us")
            ),
        ),
        (
            "lineitem",
            table(spark, sf_dir, "lineitem").select(
                F.unix_micros(F.col("l_shipdate").cast("timestamp")).alias("us")
            ),
        ),
    ]
    frames = [
        df.agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.max("us").cast("long").alias("max_us"),
        ).select(F.lit(t).alias("table_name"), "n_rows", "max_us")
        for t, df in srcs
    ]
    m = frames[0]
    for f in frames[1:]:
        m = m.unionAll(f)
    g = m.agg(F.max("max_us").cast("long").alias("global_max"))
    return m.crossJoin(F.broadcast(g)).select(
        "table_name",
        "n_rows",
        "max_us",
        (F.col("global_max") - F.col("max_us")).cast("long").alias("staleness_us"),
    )


# ======================== nation share momentum ==============================


@query(
    "olap_nation_share_momentum",
    """
WITH r AS (
  SELECT n_name, strftime(CAST(l_shipdate AS DATE), '%Y-%m') AS month,
         CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                       AS BIGINT)) AS BIGINT) AS cents
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  GROUP BY n_name, month),
t AS (SELECT month, CAST(sum(cents) AS BIGINT) AS total FROM r GROUP BY month),
s AS (
  SELECT n_name, r.month AS month, cents,
         CAST((cents * 1000000) // total AS BIGINT) AS share_ppm
  FROM r JOIN t ON r.month = t.month)
SELECT n_name, month, cents AS revenue_cents, share_ppm,
       CAST(share_ppm - lag(share_ppm) OVER (PARTITION BY n_name ORDER BY month)
            AS BIGINT) AS delta_ppm
FROM s
""",
)
def olap_nation_share_momentum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly revenue share per nation in integer parts-per-million
    (BIGINT floor division — identical on both engines) plus the
    month-over-month share delta via one lag window at the
    (nation, month) grain. Momentum in market share is the report
    behind mixture rebalancing decisions; keeping shares integral means
    a +-1 ppm move is a real move, not float noise. Note the ppm
    numerator bounds BIGINT at ~9e12 total cents — beyond that scale
    the same expression runs in DECIMAL(38,0) (supplier_hhi precedent).
    One fact aggregate (dims broadcast), one tiny window."""
    li = table(spark, sf_dir, "lineitem")
    sup = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    r = (
        li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name", F.date_format(F.to_date("l_shipdate"), "yyyy-MM").alias("month"))
        .agg(
            F.sum(
                F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
                .cast("long")
            )
            .cast("long")
            .alias("cents")
        )
    )
    t = r.groupBy("month").agg(F.sum("cents").cast("long").alias("total"))
    # the totals side is |months| rows — broadcast it back into the
    # (nation, month) relation instead of letting the planner SMJ two
    # aggregate-grain relations (r8 plan pin)
    s = r.join(F.broadcast(t), "month").select(
        "n_name",
        "month",
        "cents",
        F.expr("(cents * 1000000) div total").cast("long").alias("share_ppm"),
    )
    w = Window.partitionBy("n_name").orderBy("month")
    return s.select(
        "n_name",
        "month",
        F.col("cents").alias("revenue_cents"),
        "share_ppm",
        (F.col("share_ppm") - F.lag("share_ppm").over(w)).cast("long").alias("delta_ppm"),
    )


# =========================== media chunk planning ============================

_CHUNK_MS = 30_000  # 30 s windows
_STRIDE_MS = 25_000  # 5 s overlap
_MS_PER_BYTE = 5  # synthetic duration: 5 ms of audio per payload byte


@query(
    "multimodal_chunk_windows",
    f"""
WITH a AS (
  SELECT doc_id,
         CAST(octet_length(encode(text)) AS BIGINT) * {_MS_PER_BYTE} AS duration_ms
  FROM documents WHERE doc_id % 3 = 1),
c AS (
  SELECT doc_id, duration_ms, CAST(r.range AS BIGINT) AS chunk_idx,
         CAST(r.range AS BIGINT) * {_STRIDE_MS} AS start_ms
  FROM a CROSS JOIN range(0, 4096) r
  WHERE CAST(r.range AS BIGINT) * {_STRIDE_MS} < duration_ms)
SELECT doc_id, duration_ms, chunk_idx, start_ms,
       CAST(least(start_ms + {_CHUNK_MS}, duration_ms) AS BIGINT) AS end_ms
FROM c
""",
)
def multimodal_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whisper-style transcription chunk plan for the audio rows of the
    media table (media_type round-robins by doc_id % 3, matching
    operators/multimodal.py:media_table; duration is the documented
    synthetic stand-in — {_MS_PER_BYTE} ms per payload byte — because
    audio codecs are stubbed in this container): 30 s windows every
    25 s (5 s overlap, so no utterance is cut at every boundary), last
    window clamped to the duration. The plan is pure map-side
    arithmetic + a bounded explode — at 100 TB this is the stage that
    fans a media corpus out to transcription workers, and it never
    shuffles."""
    docs = table(spark, sf_dir, "documents")
    a = docs.where(F.col("doc_id") % 3 == 1).select(
        "doc_id",
        (F.octet_length(F.encode("text", "utf-8")).cast("long") * _MS_PER_BYTE).alias(
            "duration_ms"
        ),
    )
    n_chunks = F.ceil(F.col("duration_ms") / _STRIDE_MS).cast("int")
    c = a.select(
        "doc_id",
        "duration_ms",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), n_chunks - 1), lambda i: i.cast("long")
            )
        ).alias("chunk_idx"),
    )
    return c.select(
        "doc_id",
        "duration_ms",
        "chunk_idx",
        (F.col("chunk_idx") * _STRIDE_MS).alias("start_ms"),
        F.least(
            F.col("chunk_idx") * _STRIDE_MS + _CHUNK_MS, F.col("duration_ms")
        )
        .cast("long")
        .alias("end_ms"),
    )
