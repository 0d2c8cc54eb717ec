"""Corpus-assembly operators for LLM training-data pipelines: global
running sums without a single-partition window, offset-based sequence
packing, and deterministic hash sampling.

The classic Spark trap for "global cumulative sum" is
`Window.orderBy(col)` with no partitionBy — Catalyst executes it as ONE
partition holding the entire dataset (it even warns), which caps the op
at one executor's memory and serializes the whole job. The scale-safe
shape (same as Beam/Flink's split-combine prefix sum) is implemented in
`global_running_sum`: shard by order-range, cumsum within shards, then a
tiny per-shard-offset cumsum (shards-many rows) broadcast back.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import texts


def global_running_sum(
    df: DataFrame,
    order_col: str,
    val_col: str,
    out_col: str = "running_sum",
    shards: int = 256,
) -> DataFrame:
    """Inclusive running sum of `val_col` in global `order_col` order
    (order_col must be unique), scale-safely:

    1. order-preserving shard id from the order column's range (the bounds
       row is a broadcast 1-row join, not a driver collect),
    2. per-shard window cumsum — `shards` independent partitions,
    3. per-shard totals -> offset cumsum over `shards` rows (the ONLY
       single-partition window, bounded at `shards` rows by construction),
    4. broadcast the offsets back.

    Shuffles: one hash exchange on _shard for the window, one tiny
    aggregate, one broadcast join — vs. the naive global window's
    single-partition sort of the entire table.
    """
    o, v = F.col(order_col), F.col(val_col)
    bounds = df.agg(F.min(o).alias("_lo"), F.max(o).alias("_hi"))
    span = F.col("_hi") - F.col("_lo") + 1
    sharded = (
        df.join(F.broadcast(bounds))
        .withColumn("_shard", ((o - F.col("_lo")) * shards / span).cast("long"))
        .drop("_lo", "_hi")
    )
    w = Window.partitionBy("_shard").orderBy(order_col)
    local = sharded.withColumn("_local", F.sum(v).over(w))
    totals = local.groupBy("_shard").agg(F.sum(v).alias("_total"))
    # offset for shard s = sum of totals of shards < s; `shards` rows total
    off_w = Window.orderBy("_shard").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "_shard", F.coalesce(F.sum("_total").over(off_w), F.lit(0)).alias("_offset")
    )
    return (
        local.join(F.broadcast(offsets), "_shard")
        .withColumn(out_col, (F.col("_local") + F.col("_offset")).cast("long"))
        .drop("_shard", "_local", "_offset")
    )


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    budget: int = 2048,
) -> DataFrame:
    """Offset-based contiguous sequence packing — the GPT-style pretraining
    layout where documents concatenate in `id_col` order into one token
    stream that is then cut into `budget`-token blocks. Each doc gets the
    block containing its FIRST token (docs may straddle a boundary; the
    cut, like the tokenizer's, happens mid-doc at training time).

    Adds `start_offset` (position of the doc's first token in the stream)
    and `seq_id` (= start_offset // budget). Built on `global_running_sum`,
    so no single-partition window anywhere.
    """
    cum = global_running_sum(df, id_col, tokens_col, out_col="_cum")
    start = F.col("_cum") - F.col(tokens_col)
    return (
        cum.withColumn("start_offset", start.cast("long"))
        .withColumn("seq_id", (start / budget).cast("long"))
        .drop("_cum")
    )


def hash_sample(
    df: DataFrame, id_col: str = "doc_id", percent: int = 10, salt: str = ""
) -> DataFrame:
    """Deterministic hash sampling: keep rows whose md5(id || salt) bucket
    (mod 100) falls under `percent`. The standard reproducible corpus
    split — unlike `df.sample`, the kept set is stable across runs,
    engines, partitionings, and appends, and disjoint salts give
    disjoint-ish folds. Map-side filter only; fully pushdown-friendly
    for everything downstream."""
    bucket = texts.md5int32(F.concat(F.col(id_col).cast("string"), F.lit(salt))) % 100
    return df.where(bucket < percent)
