"""Skew-mitigation operators — salting for hot keys.

AQE's skew-join splitting (on in the session factory) handles most skew at
runtime by splitting oversized partitions, but two shapes still need
manual salting at 100 TB:

- joining a skewed fact key against a SMALL-but-not-broadcastable side:
  `salted_join` replicates the small side `salt` ways and scatters the big
  side uniformly, so one hot key spreads over `salt` reducers;
- high-cardinality aggregation with a few hot groups: `salted_sum` does a
  two-phase (key, salt) partial -> key final aggregation, the classic
  map-side scatter for algebraic aggregates.

The salt on the big side is derived from a HASH of the row's own join key
plus a per-row uniform draw — `rand(seed)` keeps it deterministic per run
for testability; at production scale the seedless form is fine because
salting never changes results, only placement.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt: int = 8,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """Equi-join `big ⋈ small on key` with the hot-key load spread over
    `salt` shuffle partitions per key.

    big rows get a uniform salt in [0, salt); small rows are replicated
    once per salt value (explode of a literal range — `salt`x duplication
    of the SMALL side only). The join key becomes (key, salt), so rows of
    one hot key land in `salt` different reducers instead of one.
    Semantically identical to `big.join(small, on, how)` for one-to-many
    joins (small side unique on the key)."""
    salted_big = big.withColumn("_salt", (F.rand(seed) * salt).cast("int"))
    salted_small = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = salted_big.join(salted_small, [on, "_salt"], how)
    return out.drop("_salt")


def salted_sum(
    df: DataFrame,
    key: str,
    value: Column | str,
    salt: int = 8,
    seed: int = 42,
) -> DataFrame:
    """`df.groupBy(key).sum(value)` as a two-phase salted aggregation:
    partial sums over (key, salt), final sum over key. Output columns:
    (key, total, n). Exact for algebraic aggregates; the value is summed
    as DECIMAL(18,4) so the two-phase re-association cannot perturb float
    low bits (library-wide cross-engine discipline)."""
    v = F.col(value) if isinstance(value, str) else value
    partial = (
        df.withColumn("_salt", (F.rand(seed) * salt).cast("int"))
        .groupBy(key, "_salt")
        .agg(
            F.sum(v.cast("decimal(18,4)")).alias("_psum"),
            F.count(F.lit(1)).alias("_pn"),
        )
    )
    return partial.groupBy(key).agg(
        F.sum("_psum").cast("double").alias("total"),
        F.sum("_pn").alias("n"),
    )
