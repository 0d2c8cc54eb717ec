"""Round-13 session batch 14 — the multi-step BPE trainer:

- text_bpe_train_merges: FOUR consecutive BPE merges learned
  corpus-wide — the iterated form of text_bpe_merge_step (round7e),
  which established the single hash-checkable step. Each round splits
  the unit-separated symbol strings, counts adjacent SYMBOL pairs
  weighted by word frequency, picks the winner with the deterministic
  (count desc, s1, s2) tie-break, and applies the merge as a greedy
  left-to-right replace; later rounds merge MULTI-character symbols
  (the part a single step cannot exercise). Output is the learned
  merge table — (step, s1, s2, pair_count) — i.e. the actual artifact
  a BPE tokenizer ships. The oracle unrolls the four rounds as
  generated CTE stages, exactly the GD-trainer pattern
  (queries/round13j.py) applied to tokenizer induction.

Scale shape: the corpus reduces ONCE to the word-frequency table (one
token shuffle); every round runs at the DISTINCT-TOKEN grain weighted
by counts — bounded by vocabulary, not corpus — with the 1-row winner
broadcast into a map-side replace and the vocab relation
localCheckpoint'ed per round (linear plan in K, the round13j lesson).

Reference parity note: the reference has no tokenizer surface;
extension layer for the training-data-pipeline mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import texts
from . import query, table
from .llmops import sql_toks
from .round7e import _CLAMP, _SEP, _SQL_SYMS

_BPE_STEPS = 4


def _bpe_train_sql() -> str:
    base = f"""toks AS (
  SELECT {sql_toks('text')} AS t FROM documents),
wc AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS w
  FROM (SELECT unnest(t) AS tok FROM toks WHERE len(t) > 0)
  WHERE length(tok) > 0 GROUP BY tok),
m0 AS (SELECT {_SQL_SYMS} AS m, w FROM wc)"""
    stages, selects = [base], []
    for k in range(1, _BPE_STEPS + 1):
        p = f"m{k - 1}"
        stages.append(f"""a{k} AS (
  SELECT string_split(m, '{_SEP}') AS a, w, m FROM {p}),
p{k} AS (
  SELECT a[CAST(r.range AS INT) + 1] AS s1,
         a[CAST(r.range AS INT) + 2] AS s2, w
  FROM a{k} CROSS JOIN range(0, {_CLAMP - 1}) r
  WHERE CAST(r.range AS INT) < len(a) - 1),
win{k} AS (
  SELECT s1, s2, n FROM (
    SELECT s1, s2, CAST(sum(w) AS BIGINT) AS n FROM p{k} GROUP BY s1, s2)
  ORDER BY n DESC, s1, s2 LIMIT 1),
m{k} AS (
  SELECT replace(m, win{k}.s1 || '{_SEP}' || win{k}.s2,
                 win{k}.s1 || win{k}.s2) AS m, w
  FROM {p} CROSS JOIN win{k})""")
        selects.append(
            f"SELECT CAST({k} AS BIGINT) AS step, s1, s2, n AS pair_count "
            f"FROM win{k}"
        )
    return (
        "WITH " + ",\n".join(stages) + "\n"
        + "\nUNION ALL ".join(selects)
        + "\nORDER BY step"
    )


@query("text_bpe_train_merges", _bpe_train_sql())
def text_bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{_BPE_STEPS} consecutive corpus-wide BPE merges (the learned
    merge table a tokenizer ships): per round, adjacent-symbol pair
    counts at the weighted vocab grain, deterministic winner
    (count desc, s1, s2), greedy left-to-right merge via replace over
    the unit-separated symbol string — replace's non-overlapping
    left-to-right scan IS the BPE application rule in both engines
    (pinned on the self-overlap case in tests/test_round7e). Rounds 2+
    merge multi-character symbols — the winner of round k becomes a
    single symbol in round k+1's pair statistics, which is what makes
    this a TRAINER rather than a repeated first step. Plan: one token
    shuffle to word frequencies, then K rounds of vocab-grain work
    with 1-row broadcast winners and per-round localCheckpoint
    (lineage linear in K — the round13j GD lesson)."""
    docs = table(spark, sf_dir, "documents")
    wc = (
        docs.select(F.explode(texts.tokens("text")).alias("tok"))
        .where(F.length("tok") > 0)
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
    )
    # Spark rtrim(trimStr, str) argument order (round7e precedent)
    sep_syms = F.expr(
        f"rtrim('{_SEP}', regexp_replace(substring(tok, 1, {_CLAMP}), "
        f"'(.)', '$1{_SEP}'))"
    )
    m = wc.select(sep_syms.alias("m"), "w").localCheckpoint(eager=True)
    out = []
    for k in range(1, _BPE_STEPS + 1):
        a = m.select(F.split("m", _SEP).alias("a"), "w", "m")
        pairs = a.select(
            F.explode(
                F.expr(
                    f"transform(slice(sequence(0, greatest(size(a) - 2, 0)), "
                    f"1, greatest(least(size(a) - 1, {_CLAMP - 1}), 0)), "
                    "i -> struct(a[i] AS s1, a[i + 1] AS s2))"
                )
            ).alias("pr"),
            "w",
        ).select(F.col("pr.s1").alias("s1"), F.col("pr.s2").alias("s2"), "w")
        win = (
            pairs.groupBy("s1", "s2")
            .agg(F.sum("w").cast("long").alias("n"))
            .orderBy(F.col("n").desc(), "s1", "s2")
            .limit(1)
        )
        m = (
            m.crossJoin(F.broadcast(win.select(
                F.col("s1").alias("_ws1"), F.col("s2").alias("_ws2"))))
            .select(
                F.expr(f"replace(m, _ws1 || '{_SEP}' || _ws2, _ws1 || _ws2)").alias("m"),
                "w",
            )
            .localCheckpoint(eager=True)
        )
        out.append(
            win.select(
                F.lit(k).cast("long").alias("step"),
                "s1",
                "s2",
                F.col("n").alias("pair_count"),
            )
        )
    res = out[0]
    for o in out[1:]:
        res = res.unionByName(o)
    return res.orderBy("step")
