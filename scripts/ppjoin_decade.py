#!/usr/bin/env python
"""Second-decade scale ladder for the EXACT prefix-filter Jaccard join
(operators/dedup.ppjoin_pairs — the zero-false-negative twin of
MinHash-LSH, new in round 13): 55k -> 550k docs on the same two corpora
as the MinHash ladder, with planted-near-dup recall REQUIRED to be exact
(an exact algorithm that drops a planted pair is a bug, not a knob).

    python scripts/ppjoin_decade.py [OUT_JSON]

Reuses scripts/minhash_decade.py's corpora (doc_d1 = sf1 documents + 5k
planted near-dups; doc_d2 = structure-identical 10x synthesis + 50k
planted) so the two families' exponents are measured on identical data —
the number an operator needs when choosing between "probable recall,
tunable cost" (MinHash banding) and "exact recall, skew-tracking cost"
(AllPairs/PPJoin) at the next decade.

Timing protocol: warm-up once per size, then N_RUNS interleaved passes
(read -> shingle-hash -> rank -> prefix join -> positional prune ->
verify -> one aggregating action) with cache release between passes;
median reported; exponent = log10(t_big / t_small).
"""

from __future__ import annotations

import json
import math
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

import minhash_decade as mh  # noqa: E402  (corpus recipe shared by contract)
from laposte_data_engineering_jedha_spark.operators import caches, dedup  # noqa: E402
from laposte_data_engineering_jedha_spark.session import get_spark  # noqa: E402

N_RUNS = 3


def run_ppjoin(spark, path: str) -> tuple[float, int, int, int, int]:
    """One self-contained timed pass over a corpus; the single action
    aggregates pair volume + planted recall."""
    docs = spark.read.parquet(path)
    n_docs = docs.count()
    n_planted = docs.where(F.col("doc_id") >= mh.PLANT_OFFSET).count()
    t0 = time.monotonic()
    pairs = dedup.ppjoin_pairs(docs, threshold=0.5)
    row = pairs.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.coalesce(
            F.sum(
                F.when(
                    F.col("id_b") == F.col("id_a") + mh.PLANT_OFFSET, 1
                ).otherwise(0)
            ),
            F.lit(0),
        ).alias("n_recovered"),
    ).first()
    wall = time.monotonic() - t0
    caches.release_all()
    spark.catalog.clearCache()
    return wall, n_docs, int(row["n_pairs"]), int(row["n_recovered"]), n_planted


def main() -> None:
    out_json = (
        sys.argv[1]
        if len(sys.argv) > 1
        else os.path.join(mh.SCALE_DIR, "ppjoin_decade.json")
    )
    spark = get_spark(app_name="ppjoin_decade")
    paths = mh.ensure_corpora(spark)

    runs = [("pp_d1", paths["doc_d1"]), ("pp_d2", paths["doc_d2"])]
    for _, p in runs:
        run_ppjoin(spark, p)
    walls: dict[str, list[float]] = {k: [] for k, _ in runs}
    stats: dict[str, tuple] = {}
    for i in range(N_RUNS):
        for name, p in runs:
            wall, n_docs, n_pairs, n_rec, n_planted = run_ppjoin(spark, p)
            walls[name].append(wall)
            stats[name] = (n_docs, n_pairs, n_rec, n_planted)
            print(
                f"run{i} {name}: {wall:.1f}s docs={n_docs:,} pairs={n_pairs:,} "
                f"recall={n_rec}/{n_planted}",
                flush=True,
            )
    med = {k: statistics.median(v) for k, v in walls.items()}
    result = {
        "sizes": {k: stats[k][0] for k in med},
        "median_sec": {k: round(med[k], 2) for k in med},
        "all_sec": {k: [round(x, 2) for x in v] for k, v in walls.items()},
        "n_pairs": {k: stats[k][1] for k in med},
        "recall": {
            k: round(stats[k][2] / stats[k][3], 6) if stats[k][3] else None
            for k in med
        },
        "exponent": round(math.log10(med["pp_d2"] / med["pp_d1"]), 3),
    }
    with open(out_json, "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps(result, indent=1))
    # exact family: anything below 100% planted recall is a correctness
    # failure of the ladder itself
    for k in stats:
        assert stats[k][2] == stats[k][3], (k, stats[k])


if __name__ == "__main__":
    main()
