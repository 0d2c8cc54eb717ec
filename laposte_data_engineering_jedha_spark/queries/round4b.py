"""Round-4 corpus-curation extensions: the aggregate/diagnostic layer a
training-data pipeline runs ON TOP of the per-doc signals — language
confusion matrices, Gopher-style rule funnels, corpus bigram statistics,
Zipf-curve fits, n-gram novelty, token-budget histograms — plus the
DAU/WAU engagement view on the events stream. Each with a DuckDB oracle
twin under the repo's cross-engine float discipline (integer-exact counts
wherever possible; libm-sensitive math in Arrow kernels; round(x*10^k)/10^k
quantization on both sides)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import texts
from . import events_table, query, table
from .llmops import (
    _SQL_SHINGLE_CTES,
    sql_lang_pred,
    sql_md5i,
    sql_round,
    sql_stop_hits,
    sql_toks,
)


def _r4(c: F.Column) -> F.Column:
    return F.round(c * 10000) / 10000


@query(
    "text_lang_confusion",
    f"""
SELECT lang, lang_pred, count(*) AS n
FROM {sql_lang_pred(extra_cols=', lang')} q
GROUP BY lang, lang_pred""",
)
def text_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declared-vs-predicted language confusion matrix — the calibration
    view over the stopword-voting language ID (how often does the cheap
    classifier disagree with the upstream label, and toward which
    languages?). Per-doc prediction is the same single-pass JVM aggregate
    as text_lang_id; the matrix is one small hash aggregate on the two
    label columns (map-side partial combine; at 100 TB the shuffle carries
    |langs|^2 partial rows per task, i.e. nothing)."""
    docs = table(spark, sf_dir, "documents")
    return (
        docs.select("lang", texts.lang_id("text").alias("lang_pred"))
        .groupBy("lang", "lang_pred")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "text_gopher_rules",
    rf"""
WITH sig AS (
  SELECT source,
         CASE WHEN trim(text) = '' THEN 0 ELSE len(t) END AS n_tokens,
         length(text) AS n_chars,
         len(regexp_extract_all(text, '[^a-zA-Z0-9\s]')) AS n_sym,
         {sql_stop_hits('en')} AS stop_hits
  FROM (SELECT source, text, {sql_toks('text')} AS t FROM documents)),
flags AS (
  SELECT source,
         CASE WHEN n_tokens BETWEEN 10 AND 2000 THEN 1 ELSE 0 END AS len_ok,
         CASE WHEN CAST(n_chars AS DOUBLE) / greatest(n_tokens, 1)
                   BETWEEN CAST(3.0 AS DOUBLE) AND CAST(10.0 AS DOUBLE)
              THEN 1 ELSE 0 END AS word_ok,
         CASE WHEN CAST(n_sym AS DOUBLE) / greatest(n_chars, 1)
                   <= CAST(0.1 AS DOUBLE) THEN 1 ELSE 0 END AS sym_ok,
         CASE WHEN stop_hits >= 2 THEN 1 ELSE 0 END AS stop_ok
  FROM sig)
SELECT source,
       count(*) AS n_docs,
       CAST(sum(len_ok) AS BIGINT) AS n_len_ok,
       CAST(sum(word_ok) AS BIGINT) AS n_word_ok,
       CAST(sum(sym_ok) AS BIGINT) AS n_sym_ok,
       CAST(sum(stop_ok) AS BIGINT) AS n_stop_ok,
       CAST(sum(len_ok * word_ok * sym_ok * stop_ok) AS BIGINT) AS n_keep,
       {sql_round('CAST(sum(len_ok * word_ok * sym_ok * stop_ok) AS DOUBLE) / count(*)', 4)}
         AS keep_rate
FROM flags GROUP BY source""",
)
def text_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style (Rae et al. 2021) rule-filter funnel per source: how
    many documents pass each individual heuristic — token-count band,
    mean-word-length band, symbol ratio, minimum stopword evidence — and
    how many survive all of them. Where text_quality scores documents,
    this is the PIPELINE view: per-source keep rates are what decide
    which crawl snapshots are worth the compute.

    One pass: every signal is a codegen'd string expression computed
    map-side (the tokenization subtree is shared via a projected alias, so
    it runs once per row), then a single per-source aggregate of 0/1
    flags — integer-exact across engines; the only double is the final
    keep_rate quotient, quantized r4 on both sides."""
    docs = table(spark, sf_dir, "documents")
    toks = texts.tokens("text")
    n_tokens = texts.token_count("text")
    n_chars = F.length("text")
    n_sym = F.size(F.regexp_extract_all("text", F.lit(r"[^a-zA-Z0-9\s]"), 0))
    stop_hits = texts.stopword_hits("text", "en")
    sig = docs.select(
        "source",
        n_tokens.alias("n_tokens"),
        n_chars.alias("n_chars"),
        n_sym.alias("n_sym"),
        stop_hits.alias("stop_hits"),
    )
    mean_word = F.col("n_chars").cast("double") / F.greatest(F.col("n_tokens"), F.lit(1))
    sym_ratio = F.col("n_sym").cast("double") / F.greatest(F.col("n_chars"), F.lit(1))
    flags = sig.select(
        "source",
        F.when(F.col("n_tokens").between(10, 2000), 1).otherwise(0).alias("len_ok"),
        F.when((mean_word >= 3.0) & (mean_word <= 10.0), 1).otherwise(0).alias("word_ok"),
        F.when(sym_ratio <= 0.1, 1).otherwise(0).alias("sym_ok"),
        F.when(F.col("stop_hits") >= 2, 1).otherwise(0).alias("stop_ok"),
    )
    keep = F.col("len_ok") * F.col("word_ok") * F.col("sym_ok") * F.col("stop_ok")
    return flags.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("len_ok").alias("n_len_ok"),
        F.sum("word_ok").alias("n_word_ok"),
        F.sum("sym_ok").alias("n_sym_ok"),
        F.sum("stop_ok").alias("n_stop_ok"),
        F.sum(keep).alias("n_keep"),
        _r4(F.sum(keep).cast("double") / F.count(F.lit(1))).alias("keep_rate"),
    )


_TOP_BIGRAMS = 50


@query(
    "corpus_token_bigrams",
    f"""
WITH toks AS (SELECT doc_id, {sql_toks('text')} AS t FROM documents),
bg AS (SELECT doc_id, unnest([t[i] || ' ' || t[i + 1] for i in range(1, len(t))]) AS bigram
       FROM toks)
SELECT bigram, count(*) AS n, count(DISTINCT doc_id) AS n_docs
FROM bg GROUP BY bigram
ORDER BY n DESC, bigram LIMIT {_TOP_BIGRAMS}""",
)
def corpus_token_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide top-{50} token bigrams with occurrence and document
    frequency — the phrase-level boilerplate detector (a bigram whose
    count dwarfs its document frequency is a within-doc repetition; one
    that appears in most documents is template text to strip).

    Bigram construction is a map-side array transform (adjacent-pair
    concat, no self-join of the token table); then one hash aggregate on
    the bigram key (count + distinct-doc expansion) and a deterministic
    TakeOrderedAndProject top-{50} (count ties broken by bigram). The
    shuffle carries (bigram, doc_id) pairs — at 100 TB this is the
    standard n-gram count job, and the top-k is per-partition-pruned
    before the single-reducer merge."""
    docs = table(spark, sf_dir, "documents")
    bigrams = F.expr(
        "filter(transform(t, (x, i) -> "
        "IF(i < size(t) - 1, concat(x, ' ', element_at(t, i + 2)), NULL)), "
        "x -> x IS NOT NULL)"
    )
    bg = (
        docs.select("doc_id", texts.tokens("text").alias("t"))
        .select("doc_id", F.explode(bigrams).alias("bigram"))
    )
    return (
        bg.groupBy("bigram")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .orderBy(F.col("n").desc(), "bigram")
        .limit(_TOP_BIGRAMS)
    )


_ZIPF_TOP = 64


@query(
    "text_zipf_fit",
    f"""
WITH toks AS (SELECT doc_id, unnest({sql_toks('text')}) AS tok
              FROM documents WHERE trim(text) <> ''),
tf AS (SELECT tok, count(*) AS f FROM toks GROUP BY 1),
top AS (SELECT f, tok FROM (
          SELECT f, tok, row_number() OVER (ORDER BY f DESC, tok) AS r FROM tf)
        WHERE r <= {_ZIPF_TOP}),
l AS (SELECT list(f ORDER BY f DESC, tok) AS fs,
             len(list(f)) AS n FROM top),
sums AS (
  SELECT n,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           [ln(CAST(i AS DOUBLE)) for i in range(1, n + 1)]), (a, x) -> a + x) AS sx,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           [ln(CAST(fs[i] AS DOUBLE)) for i in range(1, n + 1)]), (a, x) -> a + x) AS sy,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           [ln(CAST(i AS DOUBLE)) * ln(CAST(fs[i] AS DOUBLE)) for i in range(1, n + 1)]),
           (a, x) -> a + x) AS sxy,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           [ln(CAST(i AS DOUBLE)) * ln(CAST(i AS DOUBLE)) for i in range(1, n + 1)]),
           (a, x) -> a + x) AS sxx
  FROM l)
SELECT n AS n_ranks,
       (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
       (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n AS intercept
FROM sums""",
)
def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OLS fit of the corpus Zipf curve over the top-{64} token ranks:
    ln(freq) ~ slope * ln(rank) + intercept. Natural language sits near
    slope -1; a flattened slope flags templated/machine text, and the
    before/after-dedup slope delta is the classic over-dedup check.

    Shape: one token-count aggregate (the same shuffle as every n-gram
    job), a top-{64} TakeOrderedAndProject (freq ties broken by token, so
    the rank assignment is engine-identical), then ONE driver-sized row:
    the frequencies collapse to a rank-ordered array and the four OLS
    sums fold left-to-right inside an Arrow kernel (C libm ln — Spark's
    StrictMath diverges from DuckDB in the low bits; the kernel's doubles
    hash-match the twin's list_reduce folds unrounded, same rule as
    text_perplexity_proxy)."""
    docs = table(spark, sf_dir, "documents")
    toks = (
        docs.where(F.trim(F.col("text")) != "")
        .select("doc_id", F.explode(texts.tokens("text")).alias("tok"))
    )
    tf = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("f"))
    top = tf.orderBy(F.col("f").desc(), "tok").limit(_ZIPF_TOP)
    # rank order == (f desc, tok asc): sort on (-f, tok), then project f.
    arr = top.agg(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct((-F.col("f")).alias("nf"), "tok", "f"))
            ),
            lambda s: s["f"],
        ).alias("fs")
    )
    fit = texts.pd_zipf_fit("fs")
    return arr.select(
        F.size("fs").alias("n_ranks"),
        fit["slope"].alias("slope"),
        fit["intercept"].alias("intercept"),
    )


@query(
    "corpus_trigram_novelty",
    f"""
WITH {_SQL_SHINGLE_CTES},
inv AS (SELECT doc_id, unnest(s) AS shingle FROM sh),
freq AS (SELECT shingle, count(*) AS df FROM inv GROUP BY 1),
per_doc AS (
  SELECT doc_id, count(*) AS n_shingles,
         CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_novel
  FROM inv JOIN freq USING (shingle)
  GROUP BY doc_id)
SELECT d.doc_id,
       coalesce(n_shingles, 0) AS n_shingles,
       coalesce(n_novel, 0) AS n_novel,
       {sql_round('CAST(n_novel AS DOUBLE) / n_shingles', 4)} AS novelty_ratio
FROM documents d LEFT JOIN per_doc USING (doc_id)""",
)
def corpus_trigram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document trigram novelty: of a document's DISTINCT 3-gram
    shingles, what fraction occurs in no other document? The type-level
    complement of text_rarity's token statistics — high novelty marks
    genuinely original passages worth up-weighting; near-zero novelty
    marks template text even when no single duplicate pair exists.

    Reuses the exact shingle universe of the dedup family — including its
    Arrow shingle kernel (pd_shingles; the codegen'd slice/concat HOF
    chain measured 10x slower at 500k docs, scripts/scale_smoke.py) —
    then one df aggregate on the shingle key, a shingle-keyed join back
    (narrow (doc_id, shingle) rows; AQE absorbs stop-shingle skew), one
    per-doc aggregate, and a LEFT join from documents so sub-3-token docs
    surface with zero shingles and a NULL ratio instead of vanishing."""
    docs = table(spark, sf_dir, "documents")
    sh = docs.select(
        "doc_id", F.explode(texts.pd_shingles(texts.tokens("text"))).alias("shingle")
    )
    freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    per_doc = (
        sh.join(freq, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.when(F.col("df") == 1, 1).otherwise(0)).alias("n_novel"),
        )
    )
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_shingles", F.lit(0)).alias("n_shingles"),
            F.coalesce("n_novel", F.lit(0)).alias("n_novel"),
            _r4(F.col("n_novel").cast("double") / F.col("n_shingles")).alias(
                "novelty_ratio"
            ),
        )
    )


@query(
    "corpus_length_histogram",
    rf"""
WITH n AS (
  SELECT source,
         CASE WHEN trim(text) = '' THEN 0
              ELSE len({sql_toks('text')}) END AS n_tokens
  FROM documents)
SELECT source, length(CAST(n_tokens AS VARCHAR)) AS magnitude,
       count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       min(n_tokens) AS min_tokens, max(n_tokens) AS max_tokens
FROM n GROUP BY source, magnitude""",
)
def corpus_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-count histogram per source in order-of-magnitude buckets —
    the budgeting view behind sequence packing and per-source sampling
    quotas (how much of each source's token mass sits in short-tail vs
    long-tail documents?).

    The bucket is the DIGIT COUNT of the token count (1-9, 10-99, ... —
    an exact string-length op, deliberately not floor(log2/log10): float
    log of an integer near a bucket edge is exactly the kind of
    cross-engine coin flip the registry bans). Map-side expression, one
    tiny (source x magnitude) aggregate, integer-exact everywhere."""
    docs = table(spark, sf_dir, "documents")
    n_tokens = texts.token_count("text")
    return (
        docs.select(
            "source",
            n_tokens.alias("n_tokens"),
        )
        .select(
            "source",
            "n_tokens",
            F.length(F.col("n_tokens").cast("string")).alias("magnitude"),
        )
        .groupBy("source", "magnitude")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.min("n_tokens").alias("min_tokens"),
            F.max("n_tokens").alias("max_tokens"),
        )
    )


@query(
    "events_daily_stickiness",
    """
WITH pairs AS (SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events),
contrib AS (
  SELECT d + CAST(r AS INTEGER) AS day, user_id
  FROM pairs CROSS JOIN (SELECT unnest(range(0, 7)) AS r) offsets),
wau AS (SELECT day, count(DISTINCT user_id) AS wau FROM contrib GROUP BY 1),
dau AS (SELECT d AS day, count(DISTINCT user_id) AS dau FROM pairs GROUP BY 1)
SELECT dau.day AS day, dau, wau,
       round(CAST(dau AS DOUBLE) / wau * 10000) / 10000 AS stickiness
FROM dau JOIN wau ON dau.day = wau.day""",
)
def events_daily_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily active users, trailing-7-day weekly actives, and the DAU/WAU
    stickiness ratio — the engagement health metric of every product
    dashboard, computed EXACTLY (the HLL-sketch variant for 100 TB lives
    in events_sketch_aggregates; this is the precise twin).

    Shape: distinct (day, user) pairs first (collapses the event stream
    to its activity support — the only big shuffle), then each pair is
    fanned to the 7 trailing windows it contributes to via a map-side
    sequence explode (7x narrow rows, NO range join / no BNLJ), and two
    distinct-count aggregates share the day key. Days with no events
    drop out via the inner join (a calendar dimension would fill them;
    the fixture has no gaps)."""
    ev = events_table(spark, sf_dir)
    pairs = ev.select(F.to_date("ts").alias("d"), "user_id").distinct()
    contrib = pairs.select(
        F.explode(F.sequence(F.col("d"), F.date_add(F.col("d"), 6))).alias("day"),
        "user_id",
    )
    wau = contrib.groupBy("day").agg(F.countDistinct("user_id").alias("wau"))
    dau = pairs.groupBy(F.col("d").alias("day")).agg(
        F.countDistinct("user_id").alias("dau")
    )
    return dau.join(wau, "day").select(
        "day",
        "dau",
        "wau",
        _r4(F.col("dau").cast("double") / F.col("wau")).alias("stickiness"),
    )


@query(
    "stream_session_window",
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
  FROM y)
SELECT user_id, epoch_us(min(ts)) AS session_start_us,
       epoch_us(max(ts)) + 1800000000 AS session_close_us,
       count(*) AS n_events
FROM z GROUP BY user_id, session_id""",
)
def stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch run of the streaming-capable native session-window job
    (streaming/jobs.py session_window_counts; batch==stream equivalence
    asserted in tests/test_streaming.py::test_session_window_stream_matches_batch).
    The oracle is the lag/cumsum sessionization with the empirically-pinned
    inclusive-30:00 merge boundary, emitting µs epochs (the job's
    timezone-agnostic output contract)."""
    from ..streaming import jobs as streaming_jobs

    return streaming_jobs.session_window_counts(events_table(spark, sf_dir))


@query(
    "text_tokenizer_fertility",
    rf"""
WITH n AS (
  SELECT lang,
         CASE WHEN trim(text) = '' THEN 0
              ELSE len({sql_toks('text')}) END AS n_ws,
         len(regexp_extract_all(text, '{texts.BPE_TOKEN_RE}')) AS n_bpe
  FROM documents)
SELECT lang, count(*) AS n_docs,
       CAST(sum(n_ws) AS BIGINT) AS ws_tokens,
       CAST(sum(n_bpe) AS BIGINT) AS bpe_tokens,
       {sql_round('CAST(sum(n_bpe) AS DOUBLE) / greatest(sum(n_ws), 1)', 4)}
         AS fertility
FROM n GROUP BY lang""",
)
def text_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility per language: BPE-style pre-tokens per
    whitespace word — THE metric for how fairly a tokenizer treats each
    language (high fertility = more sequence positions per word = higher
    effective cost and shorter context for that language). Pure map-side
    counting expressions shared with text_token_count, one |langs|-row
    aggregate; the ratio is the only double, r4 on both sides."""
    docs = table(spark, sf_dir, "documents")
    return (
        docs.select(
            "lang",
            texts.token_count("text").alias("n_ws"),
            texts.bpe_token_count("text").alias("n_bpe"),
        )
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_ws").alias("ws_tokens"),
            F.sum("n_bpe").alias("bpe_tokens"),
            (
                F.round(
                    F.sum("n_bpe").cast("double") / F.greatest(F.sum("n_ws"), F.lit(1)) * 10000
                )
                / 10000
            ).alias("fertility"),
        )
    )


from .llmops import sql_md5i, sql_quality  # noqa: E402


@query(
    "corpus_curriculum_order",
    f"""
SELECT doc_id, quality,
       ntile(4) OVER (ORDER BY quality DESC, doc_id) AS phase,
       CAST({sql_md5i('CAST(doc_id AS VARCHAR)')} % 8 AS BIGINT) AS shard
FROM {sql_quality()} q""",
)
def corpus_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum layout: documents ranked into 4 quality phases (phase 1
    = highest-quality quartile — where curriculum schedules start) and a
    deterministic md5 shard within each phase, so the training loader can
    stream phase 1 shard-by-shard, then phase 2, with no global sort at
    read time. ntile over (quality desc, doc_id) is deterministic because
    the tie-break key is unique; the shard gate is the same hash-mod
    discipline as corpus_shard_shuffle. Global ntile is one single-
    partition window over per-doc rows — the reporting-scale trade
    documented on olap_customer_quartiles; the 100 TB variant swaps in
    approx quantile cut-points on the quality score."""
    from pyspark.sql import Window as W

    docs = table(spark, sf_dir, "documents")
    quality = F.round(texts.quality_score("text") * 10000) / 10000
    scored = docs.select("doc_id", quality.alias("quality"))
    w = W.orderBy(F.col("quality").desc(), "doc_id")
    return scored.select(
        "doc_id",
        "quality",
        F.ntile(4).over(w).alias("phase"),
        (texts.md5int32(F.col("doc_id").cast("string")) % 8).alias("shard"),
    )


_SQL_QUALITY_VIEW = sql_quality()


@query(
    "corpus_quality_calibration",
    rf"""
WITH flags AS (
  SELECT doc_id,
         CASE WHEN (CASE WHEN trim(text) = '' THEN 0 ELSE len(t) END)
                   BETWEEN 10 AND 2000 THEN 1 ELSE 0 END
         * (CASE WHEN CAST(length(text) AS DOUBLE)
                      / greatest(CASE WHEN trim(text) = '' THEN 0 ELSE len(t) END, 1)
                   BETWEEN CAST(3.0 AS DOUBLE) AND CAST(10.0 AS DOUBLE)
                 THEN 1 ELSE 0 END)
         * (CASE WHEN CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9\s]')) AS DOUBLE)
                      / greatest(length(text), 1) <= CAST(0.1 AS DOUBLE)
                 THEN 1 ELSE 0 END)
         * (CASE WHEN {sql_stop_hits('en')} >= 2 THEN 1 ELSE 0 END) AS keep
  FROM (SELECT doc_id, text, {sql_toks('text')} AS t FROM documents)),
scored AS (
  SELECT q.doc_id, quality, keep,
         ntile(10) OVER (ORDER BY quality, q.doc_id) AS decile
  FROM {_SQL_QUALITY_VIEW} q JOIN flags USING (doc_id))
SELECT decile, count(*) AS n_docs,
       CAST(sum(keep) AS BIGINT) AS n_keep,
       {sql_round('CAST(sum(keep) AS DOUBLE) / count(*)', 4)} AS keep_rate,
       min(quality) AS min_quality, max(quality) AS max_quality
FROM scored GROUP BY decile""",
)
def corpus_quality_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calibration of the scalar quality score against the Gopher rule
    filter: per score decile, what fraction of documents the rules keep.
    A well-calibrated score shows keep_rate rising monotonically with
    decile — the check run before replacing a rule cascade with a learned
    quality classifier threshold (and the shape fastText-style filters
    are validated with).

    Both signals are map-side expressions over one shared tokenization;
    the decile is a global ntile over (quality, doc_id) — unique tie-break,
    single-partition reporting window (the olap_customer_quartiles trade);
    the final aggregate is 10 rows. Integer keep counts; r4 rate."""
    from pyspark.sql import Window as W

    docs = table(spark, sf_dir, "documents")
    quality = F.round(texts.quality_score("text") * 10000) / 10000
    n_tokens = texts.token_count("text")
    n_chars = F.length("text")
    n_sym = F.size(F.regexp_extract_all("text", F.lit(r"[^a-zA-Z0-9\s]"), 0))
    mean_word = n_chars.cast("double") / F.greatest(n_tokens, F.lit(1))
    sym_ratio = n_sym.cast("double") / F.greatest(n_chars, F.lit(1))
    keep = (
        F.when(n_tokens.between(10, 2000), 1).otherwise(0)
        * F.when((mean_word >= 3.0) & (mean_word <= 10.0), 1).otherwise(0)
        * F.when(sym_ratio <= 0.1, 1).otherwise(0)
        * F.when(texts.stopword_hits("text", "en") >= 2, 1).otherwise(0)
    )
    scored = docs.select("doc_id", quality.alias("quality"), keep.alias("keep"))
    w = W.orderBy("quality", "doc_id")
    return (
        scored.withColumn("decile", F.ntile(10).over(w))
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("keep").alias("n_keep"),
            (F.round(F.sum("keep").cast("double") / F.count(F.lit(1)) * 10000) / 10000).alias("keep_rate"),
            F.min("quality").alias("min_quality"),
            F.max("quality").alias("max_quality"),
        )
    )


@query(
    "corpus_source_overlap",
    rf"""
WITH vocab AS (
  SELECT DISTINCT source, unnest({sql_toks('text')}) AS tok
  FROM documents WHERE trim(text) <> ''),
sz AS (SELECT source, count(*) AS n FROM vocab GROUP BY 1),
inter AS (
  SELECT a.source AS src_a, b.source AS src_b, count(*) AS n_shared
  FROM vocab a JOIN vocab b ON a.tok = b.tok AND a.source < b.source
  GROUP BY 1, 2)
SELECT src_a, src_b, n_shared, sa.n AS n_a, sb.n AS n_b,
       {sql_round('CAST(n_shared AS DOUBLE) / (sa.n + sb.n - n_shared)', 4)}
         AS vocab_jaccard
FROM inter
JOIN sz sa ON src_a = sa.source
JOIN sz sb ON src_b = sb.source""",
)
def corpus_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise vocabulary Jaccard between sources — the domain-similarity
    matrix consulted when merging crawl sources (near-identical
    vocabularies = redundant source worth down-weighting; disjoint =
    genuine diversity). Same inverted-index shape as the dedup family,
    one level up: distinct (source, token) support, token-keyed
    self-join producing source PAIRS (fan-out bounded by |sources|^2 per
    token — the same bounded-domain argument as events_type_affinity; a
    web-scale run caps stop-token df first, exactly like
    dedup_ngram_jaccard), intersection counts + size join, one r4 ratio."""
    docs = table(spark, sf_dir, "documents")
    vocab = (
        docs.where(F.trim(F.col("text")) != "")
        .select("source", F.explode(texts.tokens("text")).alias("tok"))
        .distinct()
    )
    sz = vocab.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    a = vocab.select(F.col("source").alias("src_a"), "tok")
    b = vocab.select(F.col("source").alias("src_b"), "tok")
    inter = (
        a.join(b, "tok")
        .where(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    sa = sz.select(F.col("source").alias("src_a"), F.col("n").alias("n_a"))
    sb = sz.select(F.col("source").alias("src_b"), F.col("n").alias("n_b"))
    return (
        inter.join(F.broadcast(sa), "src_a")
        .join(F.broadcast(sb), "src_b")
        .select(
            "src_a", "src_b", "n_shared", "n_a", "n_b",
            _r4(
                F.col("n_shared").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_shared"))
            ).alias("vocab_jaccard"),
        )
    )


@query(
    "corpus_split_assign",
    f"""
WITH assigned AS (
  SELECT doc_id, source,
         CASE WHEN h < 90 THEN 'train' WHEN h < 95 THEN 'val' ELSE 'test' END AS split
  FROM (SELECT doc_id, source,
               {sql_md5i("CAST(doc_id AS VARCHAR) || '_split'")} % 100 AS h
        FROM documents))
SELECT source, split, count(*) AS n_docs
FROM assigned GROUP BY source, split""",
)
def corpus_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 90/5/5 train/val/test assignment by salted id hash,
    reported as the per-(source, split) manifest. The hash gate (not
    rand()) means membership is a pure function of doc_id — stable across
    runs, engines, partitionings, and INCREMENTAL INGESTION (a re-crawled
    doc lands in the same split forever, the property that keeps eval
    sets uncontaminated as the corpus grows; the same salt discipline as
    corpus_hash_sample). Map-side assignment, one tiny aggregate."""
    docs = table(spark, sf_dir, "documents")
    h = texts.md5int32(F.concat(F.col("doc_id").cast("string"), F.lit("_split"))) % 100
    split = (
        F.when(h < 90, "train").when(h < 95, "val").otherwise("test")
    )
    return (
        docs.select("source", split.alias("split"))
        .groupBy("source", "split")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


@query(
    "dedup_savings_report",
    rf"""
WITH sized AS (
  SELECT doc_id, source, md5(text) AS content_md5,
         CASE WHEN trim(text) = '' THEN 0 ELSE len({sql_toks('text')}) END AS n_tokens
  FROM documents),
grouped AS (
  SELECT content_md5, min(source) AS source, count(*) AS n_copies,
         min(doc_id) AS keep_doc, any_value(n_tokens) AS n_tokens
  FROM sized GROUP BY content_md5)
SELECT source,
       count(*) AS n_groups,
       CAST(sum(n_copies) AS BIGINT) AS n_docs,
       CAST(sum(n_copies - 1) AS BIGINT) AS n_removed,
       CAST(sum(n_tokens * (n_copies - 1)) AS BIGINT) AS tokens_saved,
       CAST(sum(n_tokens * n_copies) AS BIGINT) AS tokens_before
FROM grouped GROUP BY source""",
)
def dedup_savings_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The executive number behind exact dedup: per source, how many
    byte-identical copies get removed and how many TOKENS that saves —
    what justifies (or kills) a dedup stage in the corpus budget.
    (Copies of one group share a token count by construction, so savings
    = tokens x (copies - 1); group source = min() for determinism when
    copies span sources.) One md5-keyed aggregate over map-side hashes +
    a per-source rollup — integer-exact end to end."""
    docs = table(spark, sf_dir, "documents")
    sized = docs.select(
        "doc_id",
        "source",
        F.md5("text").alias("content_md5"),
        texts.token_count("text").alias("n_tokens"),
    )
    grouped = sized.groupBy("content_md5").agg(
        F.min("source").alias("source"),
        F.count(F.lit(1)).alias("n_copies"),
        F.min("doc_id").alias("keep_doc"),
        F.first("n_tokens").alias("n_tokens"),
    )
    return grouped.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum("n_copies").alias("n_docs"),
        F.sum(F.col("n_copies") - 1).alias("n_removed"),
        F.sum(F.col("n_tokens") * (F.col("n_copies") - 1)).alias("tokens_saved"),
        F.sum(F.col("n_tokens") * F.col("n_copies")).alias("tokens_before"),
    )
