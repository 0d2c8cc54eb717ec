"""Round-7 session batch 2 — ML-feature / model-eval operators, all with
full DuckDB oracle twins.

- events_target_encoding: leave-one-out target encoding of event_type
  against the event value — the standard high-cardinality categorical
  feature for tabular models, in its leakage-free LOO form (each row's
  own target is excluded from its category mean). Integer cents end to
  end; one final guarded division.
- eval_value_auc: exact ROC-AUC of `value` as a purchase classifier via
  the rank statistic (Mann-Whitney U) with average ranks for ties. The
  whole computation happens at the DISTINCT-SCORE grain (bounded by the
  value domain, NOT the event count), in 2x-rank integers so there is no
  float until the single final division.
- olap_numeric_corr_matrix: the 4x4 Pearson moment matrix over
  lineitem's numeric columns in ONE aggregate pass (count + 4 sums + 10
  products in DECIMAL(38,0)), unpivoted to the 6 distinct pairs — the
  single-pass profiling shape: at 100 TB you never scan per pair.
- events_bot_detection: per-user abuse features (trailing-1h max burst,
  sub-60s interarrival count) off ONE user_id shuffle that serves both
  windows and the final rollup, with the flag threshold applied
  identically on both engines.

Float discipline per queries/__init__.py: integer/decimal arithmetic
until one final division, rounded via round(x*1e6)/1e6 on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import events_table, query, spread_table, table

# ============================ target encoding ================================


@query(
    "events_target_encoding",
    """
WITH e AS (
  SELECT event_id, event_type, CAST(round(value * 100) AS BIGINT) AS cents
  FROM events),
s AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS cnt,
         CAST(sum(cents) AS BIGINT) AS sc
  FROM e GROUP BY event_type)
SELECT event_id, e.event_type AS event_type,
       CASE WHEN cnt = 1 THEN NULL
            ELSE round(CAST(sc - cents AS DOUBLE) / ((cnt - 1) * 100) * 1000000)
                 / 1000000 END AS te_value
FROM e JOIN s ON e.event_type = s.event_type
""",
)
def events_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding of event_type against value: each
    event gets its category's mean value COMPUTED WITHOUT ITSELF —
    (sum_cat - own) / (n_cat - 1) — the leakage-free form used for
    training folds (plain category means leak the row's own target).
    Category sums are integer cents; the per-row encode is one guarded
    division. Plan: the |event_types|-row stats side broadcasts back onto
    the stream — the fact table never shuffles, the exact shape a
    100 TB feature pipeline needs for every categorical column."""
    e = events_table(spark, sf_dir).select(
        "event_id",
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    s = e.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.sum("cents").cast("long").alias("sc"),
    )
    return e.join(F.broadcast(s), "event_type").select(
        "event_id",
        "event_type",
        F.when(F.col("cnt") == 1, F.lit(None).cast("double"))
        .otherwise(
            F.round(
                (F.col("sc") - F.col("cents")).cast("double")
                / ((F.col("cnt") - 1) * 100)
                * 1000000
            )
            / 1000000
        )
        .alias("te_value"),
    )


# ================================ exact AUC ==================================


@query(
    "eval_value_auc",
    """
WITH e AS (
  SELECT CAST(round(value * 100) AS BIGINT) AS cents,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
  FROM events),
g AS (
  SELECT cents, CAST(count(*) AS BIGINT) AS n, CAST(sum(pos) AS BIGINT) AS npos
  FROM e GROUP BY cents),
r AS (
  SELECT cents, n, npos,
         COALESCE(CAST(sum(n) OVER (ORDER BY cents
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
                  0) AS cumbefore
  FROM g),
a AS (
  SELECT CAST(sum(npos * (2 * cumbefore + n + 1)) AS BIGINT) AS r2,
         CAST(sum(npos) AS BIGINT) AS p,
         CAST(sum(n - npos) AS BIGINT) AS q
  FROM r)
SELECT p AS n_pos, q AS n_neg,
       CASE WHEN p = 0 OR q = 0 THEN NULL
            ELSE round(CAST(r2 - p * (p + 1) AS DOUBLE) / (2 * p * q) * 1000000)
                 / 1000000 END AS auc
FROM a
""",
)
def eval_value_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ROC-AUC of `value` scoring event_type = 'purchase', via the
    Mann-Whitney rank statistic with average ranks for ties:
    AUC = (R+ - P(P+1)/2) / (P*Q) where R+ sums the positives' average
    ranks. Computed in DOUBLED ranks so tie-averages stay integral
    (avg2 = 2*cum_before + n_group + 1); the only float op is the final
    division. The ranking window runs at the DISTINCT-SCORE grain —
    bounded by the value domain (<= 49k cents values), not by event
    count, so the single global window is a constant-size stage at any
    corpus scale; events are reduced map-side by the groupBy first."""
    e = events_table(spark, sf_dir).select(
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("pos"),
    )
    g = e.groupBy("cents").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("pos").cast("long").alias("npos"),
    )
    w = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, -1)
    r = g.select(
        "n",
        "npos",
        F.coalesce(F.sum("n").over(w), F.lit(0)).cast("long").alias("cumbefore"),
    )
    a = r.agg(
        F.sum(F.col("npos") * (2 * F.col("cumbefore") + F.col("n") + 1))
        .cast("long")
        .alias("r2"),
        F.sum("npos").cast("long").alias("p"),
        F.sum(F.col("n") - F.col("npos")).cast("long").alias("q"),
    )
    p, qn = F.col("p"), F.col("q")
    return a.select(
        p.alias("n_pos"),
        qn.alias("n_neg"),
        F.when((p == 0) | (qn == 0), F.lit(None).cast("double"))
        .otherwise(
            F.round(
                (F.col("r2") - p * (p + 1)).cast("double") / (2 * p * qn) * 1000000
            )
            / 1000000
        )
        .alias("auc"),
    )


# ========================= one-pass correlation matrix =======================

_CORR_COLS = [
    ("quantity", "CAST(l_quantity AS BIGINT)"),
    ("extendedprice", "CAST(round(l_extendedprice * 100) AS BIGINT)"),
    ("discount", "CAST(round(l_discount * 10000) AS BIGINT)"),
    ("tax", "CAST(round(l_tax * 10000) AS BIGINT)"),
]
_CORR_PAIRS = [
    (i, j) for i in range(len(_CORR_COLS)) for j in range(len(_CORR_COLS)) if i < j
]


def _corr_matrix_sql() -> str:
    proj = ", ".join(f"{expr} AS x{i}" for i, (_, expr) in enumerate(_CORR_COLS))
    sums = ["CAST(count(*) AS DECIMAL(38,0)) AS n"]
    for i in range(len(_CORR_COLS)):
        sums.append(f"CAST(sum(x{i}) AS DECIMAL(38,0)) AS s{i}")
        sums.append(
            f"CAST(sum(CAST(x{i} AS DECIMAL(38,0)) * x{i}) AS DECIMAL(38,0)) AS s{i}{i}"
        )
    for i, j in _CORR_PAIRS:
        sums.append(
            f"CAST(sum(CAST(x{i} AS DECIMAL(38,0)) * x{j}) AS DECIMAL(38,0)) AS s{i}{j}"
        )
    arms = []
    for i, j in _CORR_PAIRS:
        vx, vy = f"(n * s{i}{i} - s{i} * s{i})", f"(n * s{j}{j} - s{j} * s{j})"
        num = f"(n * s{i}{j} - s{i} * s{j})"
        arms.append(
            f"SELECT '{_CORR_COLS[i][0]}' AS col_a, '{_CORR_COLS[j][0]}' AS col_b, "
            f"CASE WHEN {vx} = 0 OR {vy} = 0 THEN NULL "
            f"ELSE round(CAST({num} AS DOUBLE) / sqrt(CAST({vx} AS DOUBLE) "
            f"* CAST({vy} AS DOUBLE)) * 1000000) / 1000000 END AS pearson_r FROM m"
        )
    body = " UNION ALL ".join(arms)
    return f"WITH j AS (SELECT {proj} FROM lineitem),\nm AS (SELECT {', '.join(sums)} FROM j)\n{body}"


@query("olap_numeric_corr_matrix", _corr_matrix_sql())
def olap_numeric_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlations over lineitem's four numeric columns
    (quantity / extendedprice / discount / tax), all six pairs from ONE
    aggregate pass: the count, four sums, four squared sums, and six
    cross-products accumulate together in DECIMAL(38,0) over integer-
    snapped values (cents / basis points), then each pair is one final
    double expression. This is the profiling shape that matters at
    100 TB — the moment matrix costs one scan regardless of how many
    column pairs it answers, where a per-pair corr() would scan six
    times. Zero-variance guard by explicit CASE on both engines."""
    # the 15 DECIMAL(38,0) multiply-aggregates are pure per-row CPU on a
    # single-task scan at bench scale — spread across cores (guide §2.5);
    # integer-decimal sums are order-free exact, so the redistribution
    # cannot move the result
    li = spread_table(spark, sf_dir, "lineitem", key="l_orderkey")
    j = li.select(*[F.expr(expr).alias(f"x{i}") for i, (_, expr) in enumerate(_CORR_COLS)])
    dec = "decimal(38,0)"
    aggs = [F.count(F.lit(1)).cast(dec).alias("n")]
    for i in range(len(_CORR_COLS)):
        aggs.append(F.sum(f"x{i}").cast(dec).alias(f"s{i}"))
        aggs.append(
            F.sum(F.col(f"x{i}").cast(dec) * F.col(f"x{i}")).cast(dec).alias(f"s{i}{i}")
        )
    for i, jx in _CORR_PAIRS:
        aggs.append(
            F.sum(F.col(f"x{i}").cast(dec) * F.col(f"x{jx}")).cast(dec).alias(f"s{i}{jx}")
        )
    m = j.agg(*aggs)
    n = F.col("n")
    # all six pairs in ONE projection over the single moment row — an
    # explode of a literal struct array. Six unionAll branches off the
    # un-persisted aggregate would each re-run the full lineitem scan
    # (measured 5.7 s at sf0.1; this shape is ~1 s).
    pair_structs = []
    for i, jx in _CORR_PAIRS:
        vx = n * F.col(f"s{i}{i}") - F.col(f"s{i}") * F.col(f"s{i}")
        vy = n * F.col(f"s{jx}{jx}") - F.col(f"s{jx}") * F.col(f"s{jx}")
        num = (n * F.col(f"s{i}{jx}") - F.col(f"s{i}") * F.col(f"s{jx}")).cast("double")
        pair_structs.append(
            F.struct(
                F.lit(_CORR_COLS[i][0]).alias("col_a"),
                F.lit(_CORR_COLS[jx][0]).alias("col_b"),
                F.when((vx == 0) | (vy == 0), F.lit(None).cast("double"))
                .otherwise(
                    F.round(
                        num / F.sqrt(vx.cast("double") * vy.cast("double")) * 1000000
                    )
                    / 1000000
                )
                .alias("pearson_r"),
            )
        )
    return m.select(F.explode(F.array(*pair_structs)).alias("p")).select("p.*")


# ============================== bot detection ================================

_BOT_WINDOW_US = 3_600_000_000  # trailing 1 hour
_BOT_BURST_K = 3  # max-burst threshold that flags a user
_FAST_GAP_US = 60_000_000  # "machine-speed" interarrival bound


@query(
    "events_bot_detection",
    f"""
WITH e AS (
  SELECT user_id, epoch_us(ts) AS us FROM events),
w AS (
  SELECT user_id,
         count(*) OVER (PARTITION BY user_id ORDER BY us
                        RANGE BETWEEN {_BOT_WINDOW_US - 1} PRECEDING
                        AND CURRENT ROW) AS burst,
         us - lag(us) OVER (PARTITION BY user_id ORDER BY us) AS gap
  FROM e)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(max(burst) AS BIGINT) AS max_burst_1h,
       CAST(count(*) FILTER (WHERE gap IS NOT NULL AND gap < {_FAST_GAP_US})
            AS BIGINT) AS n_fast_gaps,
       CAST(max(burst) >= {_BOT_BURST_K} AS BOOLEAN) AS is_bot
FROM w GROUP BY user_id
""",
)
def events_bot_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user abuse screen: trailing-1h max burst (RANGE window — peers
    sharing a timestamp count together on both engines), count of
    machine-speed (<60 s) interarrival gaps, and the burst-threshold
    flag. ONE hash exchange on user_id serves the RANGE window, the lag,
    and the final rollup — the plan a 100 TB abuse pipeline needs (state
    per user is the window frame, never the history). Thresholds are
    report inputs, applied identically in the oracle."""
    ev = events_table(spark, sf_dir).select("user_id", F.unix_micros("ts").alias("us"))
    wr = (
        Window.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(-(_BOT_WINDOW_US - 1), 0)
    )
    wl = Window.partitionBy("user_id").orderBy("us")
    w = ev.select(
        "user_id",
        F.count(F.lit(1)).over(wr).alias("burst"),
        (F.col("us") - F.lag("us").over(wl)).alias("gap"),
    )
    return w.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.max("burst").cast("long").alias("max_burst_1h"),
        F.sum(
            F.when(F.col("gap").isNotNull() & (F.col("gap") < _FAST_GAP_US), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_fast_gaps"),
        (F.max("burst") >= _BOT_BURST_K).alias("is_bot"),
    )
