"""Round-13 session batch 10 — distributed iterative model training with
a fully deterministic cross-engine contract:

- ml_gate_distill_gd: 8 full-batch gradient-descent steps of a linear
  classifier (hard-sigmoid logistic link) DISTILLING the tokenizer-based
  corpus gate `token_count >= 50` into two byte-level features readable
  without tokenizing (chars / 1000, whitespace fraction) — the "train a
  tiny filter on the cluster, deploy it as a scan predicate upstream of
  the tokenizer" loop a 100 TB corpus pipeline actually runs. The
  determinism problem with distributed GD is the GRADIENT SUM: a float
  sum over a shuffled corpus is partition-order-dependent, so two
  engines (or two runs of the same engine) drift in the last ULPs and
  the trained weights diverge. Here every per-row gradient component —
  a fixed-shape rational double over integer counts and broadcast
  weights, no exp/log anywhere (the hard-sigmoid clamp(z/4 + 1/2, 0, 1)
  replaces the logistic link precisely because exp is the op two libms
  disagree on) — is QUANTIZED to integer micro-units per row (the
  round7m ANOVA discipline), so only BIGINTs cross partition
  boundaries; weight updates are then single deterministic double
  expressions over exact sums. The oracle unrolls the steps as
  generated CTE stages carrying the weight vector as a 1-row relation;
  Spark carries it as a broadcast scalar join — same dataflow, zero
  driver-side collect in the lineage, so the whole training run is ONE
  lazy plan.

Reference parity note: the reference has no ML surface; extension layer
for the training-data-pipeline mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import texts
from ..operators import caches
from . import query, table
from .llmops import sql_toks

_GD_STEPS = 8
_GD_LR = 4.0
_GD_Q = 1_000_000  # per-row gradient quantization (micro-units)
_GD_GATE = 50  # token-count gate being distilled


def _gd_oracle_sql() -> str:
    """Unrolled K-step GD: feat -> (g1, w1, a1) -> ... -> union of the
    per-step weight/accuracy rows. Weight state is a 1-row CTE cross-
    joined into the next stage — the SQL twin of a broadcast scalar.
    Every stage is AS MATERIALIZED: DuckDB inlines plain CTEs, and the
    weight chain re-expands its whole history per reference — the same
    exponential-in-K blowup the Spark side solves with localCheckpoint
    (measured 13.5 s -> ms on a 2-row corpus)."""
    feat = f"""feat AS MATERIALIZED (
  SELECT CASE WHEN len({sql_toks('text')}) >= {_GD_GATE} THEN 1 ELSE 0 END AS y,
         CAST(n_chars AS DOUBLE) / 1000 AS x1,
         CAST(length(text) - length(replace(text, ' ', '')) AS DOUBLE)
           / length(text) AS x2
  FROM documents WHERE length(text) > 0),
n AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS n FROM feat),
w0 AS MATERIALIZED (SELECT CAST(0.0 AS DOUBLE) AS w0, CAST(0.0 AS DOUBLE) AS w1,
              CAST(0.0 AS DOUBLE) AS w2)"""
    stages, selects = [feat], []
    for k in range(1, _GD_STEPS + 1):
        p, c = f"w{k - 1}", f"w{k}"
        z = f"({p}.w0 + {p}.w1 * x1 + {p}.w2 * x2)"
        r = f"(least(greatest({z} / 4 + 0.5, 0.0), 1.0) - y)"
        stages.append(f"""g{k} AS MATERIALIZED (
  SELECT CAST(sum(CAST(round({r} * {_GD_Q}) AS BIGINT)) AS BIGINT) AS q0,
         CAST(sum(CAST(round({r} * x1 * {_GD_Q}) AS BIGINT)) AS BIGINT) AS q1,
         CAST(sum(CAST(round({r} * x2 * {_GD_Q}) AS BIGINT)) AS BIGINT) AS q2
  FROM feat CROSS JOIN {p})""")
        stages.append(f"""w{k} AS MATERIALIZED (
  SELECT {p}.w0 - {_GD_LR} * (CAST(q0 AS DOUBLE) / ({_GD_Q}.0 * n)) AS w0,
         {p}.w1 - {_GD_LR} * (CAST(q1 AS DOUBLE) / ({_GD_Q}.0 * n)) AS w1,
         {p}.w2 - {_GD_LR} * (CAST(q2 AS DOUBLE) / ({_GD_Q}.0 * n)) AS w2
  FROM g{k} CROSS JOIN {p} CROSS JOIN n)""")
        zc = f"({c}.w0 + {c}.w1 * x1 + {c}.w2 * x2)"
        stages.append(f"""a{k} AS MATERIALIZED (
  SELECT CAST(sum(CASE WHEN ({zc} > 0) = (y = 1) THEN 1 ELSE 0 END)
              AS BIGINT) AS n_correct
  FROM feat CROSS JOIN {c})""")
        selects.append(
            f"SELECT CAST({k} AS BIGINT) AS step, "
            f"round(w0 * {_GD_Q}) / {_GD_Q} AS w0, "
            f"round(w1 * {_GD_Q}) / {_GD_Q} AS w1, "
            f"round(w2 * {_GD_Q}) / {_GD_Q} AS w2, "
            f"CAST((n_correct * {_GD_Q}) // n AS BIGINT) AS acc_ppm "
            f"FROM w{k} CROSS JOIN a{k} CROSS JOIN n"
        )
    return (
        "WITH " + ",\n".join(stages) + "\n"
        + "\nUNION ALL ".join(selects)
        + "\nORDER BY step"
    )


@query("ml_gate_distill_gd", _gd_oracle_sql())
def ml_gate_distill_gd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{_GD_STEPS} full-batch GD steps distilling the token-count gate
    (y = token_count >= {_GD_GATE}) into a hard-sigmoid linear scorer
    over byte-level features (chars/1000, whitespace fraction) —
    emitting per step the updated weight vector (rounded to micro-units)
    and its training accuracy in ppm (which climbs from the majority-
    class floor as the boundary is learned; tests pin the monotone
    improvement). Scale shape: the feature relation is computed ONCE
    (persisted; Catalyst token exprs, no UDF) and each step is two
    partial-aggregated scans over it — the three quantized gradient
    sums, then the accuracy count — with the weight vector flowing as a
    BROADCAST 1-row relation, never a driver collect, so the K-step
    training is one lazy plan a 1000-executor cluster runs with
    2K small shuffles of 1-row aggregates. Per-row floats are
    fixed-shape rationals (no exp/log), per-row contributions quantize
    to integer micro-units BEFORE the cross-partition sum (order-free
    BIGINT addition), and weight updates are single double expressions
    over exact operands — so the trained weights are bit-identical
    across engines, partitionings, and re-runs: the reproducibility
    property distributed training pipelines usually give up."""
    docs = table(spark, sf_dir, "documents")
    t = texts.tokens("text")
    y = F.when(F.size(t) >= _GD_GATE, 1).otherwise(0)
    ws_frac = (
        (F.length("text") - F.length(F.regexp_replace("text", " ", ""))).cast(
            "double"
        )
        / F.length("text")
    )
    feat = caches.track(
        docs.where(F.length("text") > 0)
        .select(
            y.alias("y"),
            (F.col("n_chars").cast("double") / 1000).alias("x1"),
            ws_frac.alias("x2"),
        )
        .persist()
    )
    n = feat.agg(F.count(F.lit(1)).cast("long").alias("n"))
    w = None  # None encodes the all-zero w0 (literals fold into exprs)
    out = []
    lrq = F.lit(float(_GD_Q))
    for k in range(1, _GD_STEPS + 1):
        if w is None:
            z = F.lit(0.0)
        else:
            z = F.col("w0") + F.col("w1") * F.col("x1") + F.col("w2") * F.col("x2")
        r = F.least(F.greatest(z / 4 + 0.5, F.lit(0.0)), F.lit(1.0)) - F.col("y")
        src = feat if w is None else feat.crossJoin(F.broadcast(w))
        g = src.agg(
            F.sum(F.round(r * _GD_Q).cast("long")).cast("long").alias("q0"),
            F.sum(F.round(r * F.col("x1") * _GD_Q).cast("long"))
            .cast("long")
            .alias("q1"),
            F.sum(F.round(r * F.col("x2") * _GD_Q).cast("long"))
            .cast("long")
            .alias("q2"),
        )
        base = g.crossJoin(F.broadcast(n))
        prev = [F.lit(0.0)] * 3 if w is None else [F.col(f"w{j}") for j in range(3)]
        cols = [
            (prev[j] - _GD_LR * (F.col(f"q{j}").cast("double") / (lrq * F.col("n"))))
            .alias(f"w{j}")
            for j in range(3)
        ]
        w = (base if w is None else base.crossJoin(F.broadcast(w))).select(*cols)
        # truncate lineage per step (the connected-components pattern):
        # without this the weight row re-expands its whole history into
        # every consumer and the plan grows EXPONENTIALLY in K (measured:
        # StackOverflow in AQE at K=8). eager=False truncates the LOGICAL
        # plan just the same (the LogicalRDD replaces the lineage at call
        # time) but defers the tiny per-step materialization jobs into the
        # consuming action — 8 fewer driver job round-trips (guide §1.2:
        # fewer passes), still no driver-side value in the dataflow.
        w = w.localCheckpoint(eager=False)
        zc = F.col("w0") + F.col("w1") * F.col("x1") + F.col("w2") * F.col("x2")
        acc = feat.crossJoin(F.broadcast(w)).agg(
            F.sum(F.when((zc > 0) == (F.col("y") == 1), 1).otherwise(0))
            .cast("long")
            .alias("n_correct")
        )
        out.append(
            w.crossJoin(F.broadcast(acc))
            .crossJoin(F.broadcast(n))
            .select(
                F.lit(k).cast("long").alias("step"),
                (F.round(F.col("w0") * _GD_Q) / _GD_Q).alias("w0"),
                (F.round(F.col("w1") * _GD_Q) / _GD_Q).alias("w1"),
                (F.round(F.col("w2") * _GD_Q) / _GD_Q).alias("w2"),
                F.expr(f"CAST((n_correct * {_GD_Q}) div n AS BIGINT)").alias(
                    "acc_ppm"
                ),
            )
        )
    res = out[0]
    for o in out[1:]:
        res = res.unionByName(o)
    return res.orderBy("step")
