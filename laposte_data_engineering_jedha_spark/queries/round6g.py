"""Round-6 session batch 7 — forecasting, inequality, and readability
metrics, each with a full DuckDB oracle twin:

- events_forecast_seasonal_naive: the seasonal-naive baseline (forecast =
  same weekday last week) with integer-exact MAE/bias backtest — the
  benchmark every real forecasting model must beat, and the volume-drift
  alarm (MAE spikes when traffic shifts regime).
- corpus_length_gini: Gini coefficient of document lengths per language —
  the corpus-balance inequality report (a handful of giant documents
  dominating a language's token budget is a curation smell).
- text_readability: Flesch reading-ease per document from portable
  regexp counts (sentences, words, vowel-group syllable proxy) — the
  classic quality-filter feature next to the Gopher rules.

Float discipline: integer counts end-to-end; MAE/bias/gini/flesch are
single final expressions over integer inputs (identical IEEE ops both
engines), flesch additionally rounded at 4 decimals by the shared
round(x*10^k)/10^k convention because its constant multiplies are chained.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import texts
from . import events_table, query, table


@query(
    "events_forecast_seasonal_naive",
    """
WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
               FROM events GROUP BY event_type, CAST(ts AS DATE)),
j AS (SELECT a.event_type AS event_type, a.day AS day, a.n AS actual,
             b.n AS forecast
      FROM daily a JOIN daily b
        ON a.event_type = b.event_type AND b.day = a.day - 7)
SELECT event_type,
       count(*) AS n_days,
       CAST(sum(abs(actual - forecast)) AS BIGINT) AS abs_err_total,
       CAST(sum(abs(actual - forecast)) AS DOUBLE) / count(*) AS mae,
       CAST(sum(actual - forecast) AS DOUBLE) / count(*) AS bias
FROM j GROUP BY event_type
""",
)
def events_forecast_seasonal_naive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backtest of the seasonal-naive forecaster (predict each day's
    volume with the SAME WEEKDAY LAST WEEK) per event type: days with a
    7-day-old sibling are scored, MAE and signed bias reported. All error
    mass stays integral until the two final divisions. The join is
    daily-aggregate x daily-aggregate on (type, day-7) — |types x days|
    rows, broadcastable at any event volume because the aggregation
    happened first (the scale story: never window the raw stream when the
    statistic lives at the aggregate grain)."""
    ev = events_table(spark, sf_dir)
    daily = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n")
    )
    a = daily.select("event_type", "day", F.col("n").alias("actual"))
    b = daily.select(
        "event_type", F.date_add("day", 7).alias("day"), F.col("n").alias("forecast")
    )
    j = a.join(b, ["event_type", "day"])
    return j.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum(F.abs(F.col("actual") - F.col("forecast")))
        .cast("long")
        .alias("abs_err_total"),
        (
            F.sum(F.abs(F.col("actual") - F.col("forecast"))).cast("double")
            / F.count(F.lit(1))
        ).alias("mae"),
        (
            F.sum(F.col("actual") - F.col("forecast")).cast("double")
            / F.count(F.lit(1))
        ).alias("bias"),
    )


@query(
    "corpus_length_gini",
    """
WITH r AS (SELECT lang, n_chars,
                  row_number() OVER (PARTITION BY lang
                                     ORDER BY n_chars, doc_id) AS i
           FROM documents)
SELECT lang, count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       CAST(2 * sum(i * n_chars) - (count(*) + 1) * sum(n_chars) AS DOUBLE)
         / (count(*) * sum(n_chars)) AS gini
FROM r GROUP BY lang
""",
)
def corpus_length_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of document lengths per language via the exact
    rank formula G = (2*sum(i*x_i) - (n+1)*sum(x_i)) / (n*sum(x_i)) over
    ascending-sorted lengths — every term integral, one final division.
    Within-tie ordering cannot change the statistic (equal x across a tie
    block contributes x * sum(ranks) either way), but the (n_chars,
    doc_id) sort is pinned anyway. The rank window partitions by lang;
    the 100 TB variant of per-GROUP inequality would bucket the sort
    exactly like events_kmv_distinct's salted two-level rank."""
    docs = table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy("n_chars", "doc_id")
    r = docs.select("lang", "n_chars", F.row_number().over(w).alias("i"))
    n = F.count(F.lit(1))
    sx = F.sum("n_chars")
    six = F.sum(F.col("i") * F.col("n_chars"))
    return r.groupBy("lang").agg(
        n.alias("n_docs"),
        sx.cast("long").alias("total_chars"),
        ((2 * six - (n + 1) * sx).cast("double") / (n * sx)).alias("gini"),
    )


_VOWEL_RE = "[aeiouy]+"
_SENT_RE = "[.!?]"


@query(
    "text_readability",
    f"""
WITH m AS (
  SELECT doc_id,
         len(string_split_regex(trim(lower(text)), '\\s+')) AS n_words,
         greatest(1, len(regexp_extract_all(text, '{_SENT_RE}'))) AS n_sentences,
         len(regexp_extract_all(lower(text), '{_VOWEL_RE}')) AS n_syllables
  FROM documents WHERE trim(text) != '')
SELECT doc_id, n_words, n_sentences, n_syllables,
       round((CAST(206.835 AS DOUBLE)
              - CAST(1.015 AS DOUBLE) * n_words / n_sentences
              - CAST(84.6 AS DOUBLE) * n_syllables / n_words) * 10000) / 10000
         AS flesch
FROM m WHERE n_words > 0
""",
)
def text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease per document from engine-portable counts:
    whitespace words, [.!?] sentence enders (min 1), and vowel-group
    syllable proxy — the classic readability feature for quality
    filtering (very negative = run-on garbage, ~60-80 = plain prose).
    Pure map-side regexp work, no shuffle at all; constants CAST to
    DOUBLE and the chained expression rounded at 4 decimals per the
    shared convention."""
    docs = table(spark, sf_dir, "documents").where(F.trim("text") != "")
    n_words = texts.token_count("text")
    n_sent = F.greatest(
        F.lit(1), F.size(F.regexp_extract_all(F.col("text"), F.lit(_SENT_RE), 0))
    )
    n_syl = F.size(F.regexp_extract_all(F.lower("text"), F.lit(_VOWEL_RE), 0))
    m = docs.select(
        "doc_id",
        n_words.alias("n_words"),
        n_sent.alias("n_sentences"),
        n_syl.alias("n_syllables"),
    ).where(F.col("n_words") > 0)
    flesch = (
        F.lit(206.835)
        - F.lit(1.015) * F.col("n_words") / F.col("n_sentences")
        - F.lit(84.6) * F.col("n_syllables") / F.col("n_words")
    )
    return m.select(
        "doc_id",
        "n_words",
        "n_sentences",
        "n_syllables",
        (F.round(flesch * 10000) / 10000).alias("flesch"),
    )
