"""Bounded-memory streaming summaries the engine can run per partition.

Misra-Gries heavy hitters here; the HLL / KMV distinct sketches live as
pure DataFrame compositions in the query layer (they need no Python).

Scale rationale: a plain groupBy-count finds heavy hitters but shuffles
EVERY distinct key. The two-pass scheme below shuffles only the candidate
set (<= budget keys per partition): pass 1 runs a Misra-Gries summary
inside each partition (mergeable-summaries semantics, Agarwal et al.,
PODS'12), pass 2 recounts ONLY the union of candidates exactly. MG's
guarantee — every key with global frequency > n/(budget+1) survives in at
least one partition summary (averaging argument over partitions) — makes
the two-pass result EXACTLY the true heavy-hitter set, which is what lets
the DuckDB oracle be a plain GROUP BY ... HAVING.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_merge(summary: dict[str, int], counts: dict[str, int], budget: int) -> None:
    """Merge exact batch counts into a Misra-Gries summary in place.

    The mergeable-summaries MERGE: add, and if more than `budget` keys
    remain, subtract the (budget+1)-th largest count from every key and
    drop the non-positive ones. Error stays <= n_seen/(budget+1)."""
    for k, c in counts.items():
        summary[k] = summary.get(k, 0) + int(c)
    if len(summary) > budget:
        cut = sorted(summary.values(), reverse=True)[budget]
        for k in list(summary):
            summary[k] -= cut
            if summary[k] <= 0:
                del summary[k]


def mg_candidates(df: DataFrame, key: str, budget: int = 128) -> DataFrame:
    """Per-partition Misra-Gries candidate keys (pass 1 of exact heavy
    hitters). Output: (key, mg_est) — one row per surviving counter per
    partition; dedup/recount happens in pass 2.

    Memory per task is O(budget) regardless of partition size — the
    property that lets this run on a 100 TB scan where per-partition
    distinct counts would OOM a dict-of-everything."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        summary: dict[str, int] = {}
        for pdf in batches:
            _mg_merge(summary, pdf[key].astype(str).value_counts().to_dict(), budget)
        yield pd.DataFrame(
            {key: list(summary), "mg_est": list(summary.values())}
        )

    return df.select(F.col(key).cast("string").alias(key)).mapInPandas(
        run, schema=f"{key} string, mg_est long"
    )


def heavy_hitters(df: DataFrame, key: str, k: int, budget: int = 128) -> DataFrame:
    """Exact heavy hitters (keys with count * k > n) in two passes:
    MG candidates per partition, then an exact recount of candidates only.

    Requires budget >= k so the MG guarantee (catches freq > n/(budget+1))
    covers the reporting threshold n/k. The candidate set is tiny
    (partitions x budget rows), so the recount join broadcasts it.

    NULL keys are excluded from BOTH the candidate stream and the total n:
    pandas value_counts drops NaN and the recount equi-join drops NULLs, so
    counting NULL rows in n would inflate the threshold while making a
    NULL heavy-hitter group unreportable — the exactness claim vs a plain
    GROUP BY/HAVING oracle holds over the non-NULL key domain, and the
    oracle must carry the same `key IS NOT NULL` filter explicitly."""
    if budget < k:
        raise ValueError(f"budget {budget} must be >= k {k} for exactness")
    keyed = df.select(F.col(key).cast("string").alias(key)).where(
        F.col(key).isNotNull()
    )
    cands = mg_candidates(keyed, key, budget=budget).select(key).distinct()
    total = keyed.select(F.count(F.lit(1)).alias("_n"))
    return (
        keyed.join(F.broadcast(cands), key)
        .groupBy(key)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .crossJoin(F.broadcast(total))
        .where(F.col("n_events") * k > F.col("_n"))
        .drop("_n")
    )
