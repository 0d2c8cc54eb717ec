"""Round-5 session additions — operators a reference user would reach for
next, each with a full DuckDB oracle twin:

- dedup_passage: passage-level exact dedup stats (the C4/CCNet span-scrub
  measure) — cross-doc duplicated 8-token passages per doc.
- corpus_pack_bins: power-of-two length-bucket packing report — the
  padding-waste number that motivates sequence packing.
- multimodal_phash_dedup: perceptual-hash near-dup over media payloads —
  SimHash votes on content grams + banded Hamming join (bytes never
  shuffle).
- olap_scd2_history: SCD Type-2 dimension history (half-open validity
  intervals) built from a deterministic version stream.
- events_windowed_topk: top-3 event types per day by DECIMAL-exact spend
  with a deterministic tie-break — the windowed heavy-hitters report.
- text_oov_rate: per-doc out-of-vocabulary rate against the corpus top-20
  vocabulary — build-small-dim-then-broadcast, the tokenizer-coverage
  check before a training run.

Float/ordering discipline follows queries/__init__.py's registry header:
integer-exact arithmetic until one final double division, `round(x*10^k)/
10^k` on both sides, identical association order, aliases matched.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import texts
from ..operators import dedup, merge, multimodal
from . import events_table, query, table
from .llmops import _SQL_SIMHASH, _W, sql_toks

_P = 8  # tokens per passage (dedup_passage)

_PASSAGE_SQL = f"""
WITH toks AS (SELECT doc_id, {sql_toks('text')} AS t FROM documents),
pl AS (SELECT doc_id, CAST(ceil(len(t) / {_P}) AS BIGINT) AS n_passages,
              [md5(array_to_string(t[i * {_P} + 1 : i * {_P} + {_P}], ' '))
               for i in range(0, CAST(ceil(len(t) / {_P}) AS INT))] AS ps
       FROM toks),
p AS (SELECT doc_id, unnest(ps) AS key FROM pl),
dupkeys AS (SELECT key FROM p GROUP BY key HAVING count(DISTINCT doc_id) >= 2),
dd AS (SELECT doc_id, count(*) AS n_dup FROM p JOIN dupkeys USING (key)
       GROUP BY doc_id)
SELECT doc_id, n_passages,
       CAST(COALESCE(n_dup, 0) AS BIGINT) AS n_dup_passages,
       CASE WHEN n_passages = 0 THEN CAST(0.0 AS DOUBLE)
            ELSE round(CAST(COALESCE(n_dup, 0) AS DOUBLE) / n_passages * 10000)
                 / 10000
       END AS dup_ratio
FROM pl LEFT JOIN dd USING (doc_id)"""


@query("dedup_passage", _PASSAGE_SQL)
def dedup_passage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Passage-level exact dedup stats (operators/dedup.py
    passage_dup_stats): consecutive 8-token passages hashed map-side; a
    passage counts as duplicated when its hash occurs in >= 2 distinct
    docs. Two narrow-key shuffles total (passage-frequency aggregate +
    per-doc re-aggregate); the dup-key join is co-partitioned with the
    aggregate that produced it. The per-doc dup_ratio is what a C4-style
    boilerplate scrub thresholds on."""
    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    return dedup.passage_dup_stats(docs, passage_tokens=_P)


_BINS = [16, 32, 64, 128, 256, 512]
_BIN_CASE = (
    "CASE "
    + " ".join(f"WHEN n <= {b} THEN {b}" for b in _BINS)
    + " ELSE 1024 END"
)

_PACK_BINS_SQL = f"""
WITH t AS (SELECT CAST(len(regexp_extract_all(text, '{texts.BPE_TOKEN_RE}'))
                  AS BIGINT) AS n
           FROM documents),
b AS (SELECT {_BIN_CASE} AS bin, n FROM t),
g AS (SELECT CAST(bin AS BIGINT) AS bin, count(*) AS n_docs,
             CAST(sum(n) AS BIGINT) AS sum_tokens
      FROM b GROUP BY bin)
SELECT bin, n_docs, sum_tokens, bin * n_docs AS capacity,
       round(CAST(bin * n_docs - sum_tokens AS DOUBLE) / (bin * n_docs) * 10000)
         / 10000 AS pad_ratio
FROM g"""


@query("corpus_pack_bins", _PACK_BINS_SQL)
def corpus_pack_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power-of-two length-bucket packing report: docs binned by BPE-ish
    token count into [16..512, 1024+] capacity buckets; per bucket the
    doc count, token mass, padded capacity, and padding-waste ratio —
    the number that justifies pack_sequences over pad-to-bucket. One
    map-side pass + one tiny aggregate (<= 7 groups) at any scale; the
    ratio is one IEEE division over integer-exact sums."""
    docs = table(spark, sf_dir, "documents")
    n = texts.bpe_token_count("text").cast("long")
    bin_col = F.lit(1024)
    for b in reversed(_BINS):
        bin_col = F.when(n <= b, F.lit(b)).otherwise(bin_col)
    g = (
        docs.select(bin_col.cast("long").alias("bin"), n.alias("n"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n").alias("sum_tokens"))
    )
    cap = F.col("bin") * F.col("n_docs")
    return g.select(
        "bin",
        "n_docs",
        "sum_tokens",
        cap.alias("capacity"),
        (
            F.round((cap - F.col("sum_tokens")).cast("double") / cap * 10000) / 10000
        ).alias("pad_ratio"),
    )


_PHASH_SQL = f"""
WITH g AS (SELECT doc_id,
      [CAST('0x' || substr(md5(substr(text, i * {multimodal.PHASH_GRAM} + 1,
                                      {multimodal.PHASH_GRAM})), 1, 15) AS BIGINT)
       for i in range(0, CAST(ceil(len(text) / {multimodal.PHASH_GRAM}) AS INT))]
        AS h
      FROM documents),
sims AS (SELECT doc_id, {_SQL_SIMHASH} AS sim FROM g),
bands AS (SELECT doc_id, sim, r.range AS band,
          (sim >> (CAST(r.range AS INTEGER) * {_W})) & {(1 << _W) - 1} AS key
          FROM sims CROSS JOIN range(0, 4) r),
cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
                bit_count(xor(a.sim, b.sim)) AS hamming
         FROM bands a JOIN bands b
           ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id)
SELECT id_a, id_b, hamming FROM cand WHERE hamming <= 3"""


@query("multimodal_phash_dedup", _PHASH_SQL)
def multimodal_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash near-dup pairs over media payloads
    (operators/multimodal.py phash_pairs): 60-bit SimHash votes over
    4-char content grams of the decoded payload (Arrow kernel — a real
    codec would emit DCT/spectral frames at the same spot), then the
    shared banded-Hamming engine (4 x 15-bit bands, full recall at
    d <= 3 by pigeonhole). Payload bytes never shuffle — candidates move
    (id, phash, band, key) only. The oracle rebuilds the grams with
    substr over the same text the media payload encodes."""
    docs = table(spark, sf_dir, "documents")
    media = multimodal.media_table(docs)
    return multimodal.phash_pairs(media, max_hamming=3)


_SCD2_SQL = """
WITH keys AS (SELECT o_orderkey AS k, o_totalprice AS p0,
                     CAST(o_orderdate AS DATE) AS d0
              FROM orders WHERE o_orderkey % 20 = 3),
vers AS (SELECT k, CAST(v.range AS INT) AS version,
                CASE WHEN v.range = 0 THEN p0
                     ELSE round(p0 * (100 + 5 * CAST(v.range AS INT))) / 100
                END AS price,
                d0 + CAST(v.range AS INT) AS valid_from
         FROM keys CROSS JOIN range(0, 4) v)
SELECT k, version, price, valid_from,
       lead(valid_from) OVER (PARTITION BY k ORDER BY valid_from) AS valid_to,
       lead(valid_from) OVER (PARTITION BY k ORDER BY valid_from) IS NULL
         AS is_current
FROM vers"""


@query("olap_scd2_history", _SCD2_SQL)
def olap_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 dimension history (operators/merge.py scd2_history) from
    a deterministic version stream: every 20th order gets 4 price
    versions (base + 5%-step repricings effective on consecutive days);
    the operator emits half-open [valid_from, valid_to) validity
    intervals with `is_current` on the open one. The history build is ONE
    per-key window — each key's version list is bounded by change
    frequency, so the single key Exchange is the whole cost at any
    scale. Complements olap_cdc_merge (latest-snapshot MERGE) with the
    keep-history half of CDC ingestion."""
    orders = table(spark, sf_dir, "orders")
    keys = orders.where(F.col("o_orderkey") % 20 == 3).select(
        F.col("o_orderkey").alias("k"),
        F.col("o_totalprice").alias("p0"),
        F.col("o_orderdate").cast("date").alias("d0"),
    )
    vers = keys.select(
        "k", "p0", "d0", F.explode(F.sequence(F.lit(0), F.lit(3))).alias("version")
    ).select(
        "k",
        "version",
        F.when(F.col("version") == 0, F.col("p0"))
        .otherwise(
            F.round(F.col("p0") * (F.lit(100) + F.lit(5) * F.col("version"))) / 100
        )
        .alias("price"),
        F.date_add("d0", F.col("version")).alias("valid_from"),
    )
    return merge.scd2_history(vers, ["k"], "valid_from")


_WINDOWED_TOPK_SQL = """
WITH agg AS (
  SELECT CAST(ts AS DATE) AS day, event_type,
         CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS revenue
  FROM events GROUP BY day, event_type),
r AS (SELECT day, event_type, revenue,
             row_number() OVER (PARTITION BY day
                                ORDER BY revenue DESC, event_type) AS rnk
      FROM agg)
SELECT day, event_type, revenue, rnk FROM r WHERE rnk <= 3"""


@query("events_windowed_topk", _WINDOWED_TOPK_SQL)
def events_windowed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed heavy hitters: top-3 event types per day by DECIMAL-exact
    spend, deterministic tie-break (spend desc, type asc). Partial
    aggregation shrinks the shuffle to |days x types| rows before the
    per-day rank window — the map-side-combine shape that makes windowed
    top-k linear at 100 TB (contrast a direct rank over raw events,
    which would sort the fact table)."""
    ev = events_table(spark, sf_dir)
    agg = (
        ev.select(
            F.col("ts").cast("date").alias("day"),
            "event_type",
            F.col("value").cast("decimal(18,4)").alias("v"),
        )
        .groupBy("day", "event_type")
        .agg(F.sum("v").cast("double").alias("revenue"))
    )
    w = Window.partitionBy("day").orderBy(F.col("revenue").desc(), "event_type")
    return agg.select(
        "day", "event_type", "revenue", F.row_number().over(w).alias("rnk")
    ).where(F.col("rnk") <= 3)


_VOCAB_K = 20

_OOV_SQL = f"""
WITH toks AS (SELECT doc_id, {sql_toks('text')} AS t FROM documents),
tf AS (SELECT term, count(*) AS c
       FROM (SELECT unnest(t) AS term FROM toks) GROUP BY term),
vocab AS (SELECT term FROM tf ORDER BY c DESC, term LIMIT {_VOCAB_K}),
oov AS (SELECT doc_id, count(*) AS n_oov
        FROM (SELECT doc_id, unnest(t) AS term FROM toks) p
        WHERE NOT EXISTS (SELECT 1 FROM vocab v WHERE v.term = p.term)
        GROUP BY doc_id)
SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens,
       CAST(COALESCE(n_oov, 0) AS BIGINT) AS n_oov,
       round(CAST(COALESCE(n_oov, 0) AS DOUBLE) / len(t) * 10000) / 10000
         AS oov_rate
FROM toks LEFT JOIN oov USING (doc_id)"""


@query("text_oov_rate", _OOV_SQL)
def text_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc out-of-vocabulary rate against the corpus top-20 vocabulary
    (count desc, term asc tie-break) — the tokenizer-coverage check run
    before committing a vocab. Build-small-broadcast-wide: the term
    frequency aggregate reduces to a 20-row dim (TakeOrderedAndProject —
    no global sort materializes), collapsed to a ONE-ROW array that
    broadcasts under every doc; the per-doc OOV count is then a map-side
    higher-order `filter` over the token array — no explode of the big
    side, no per-token shuffle, no re-aggregation. Measured at 1M docs /
    60M tokens: 56 s as explode+anti-join+regroup, 27 s in this shape
    (SCALE.md) — the remainder is the vocab build's one irreducible
    token-grain pass, which at 100 TB is the only stage that touches a
    token-grain relation (score pass is map-side against the broadcast
    array)."""
    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = docs.select("doc_id", texts.tokens("text").alias("t"))
    vocab = (
        toks.select(F.explode("t").alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), "term")
        .limit(_VOCAB_K)
    )
    varr = vocab.agg(F.collect_list("term").alias("v"))  # 1 row x 20 terms
    n_oov = F.size(
        F.filter("t", lambda x: ~F.array_contains("v", x))
    ).cast("long")
    return toks.crossJoin(F.broadcast(varr)).select(
        "doc_id",
        F.size("t").cast("long").alias("n_tokens"),
        n_oov.alias("n_oov"),
        (F.round(n_oov.cast("double") / F.size("t").cast("long") * 10000) / 10000).alias(
            "oov_rate"
        ),
    )
