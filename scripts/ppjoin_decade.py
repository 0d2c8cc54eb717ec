#!/usr/bin/env python
"""Second-decade scale ladder for the EXACT prefix-filter Jaccard join
(operators/dedup.ppjoin_pairs — the zero-false-negative twin of
MinHash-LSH, new in round 13): 55k -> 550k docs with planted-near-dup
recall REQUIRED to be exact (an exact algorithm that drops a planted
pair is a bug, not a knob).

    python scripts/ppjoin_decade.py [OUT_JSON]

Corpus design — and why it differs from the MinHash ladder's d2:
AllPairs/PPJoin cost is CANDIDATE PAIR MASS, ~ sum_p C(f_p, 2) over
prefix-indexed shingles, i.e. ~ n^2 / |effective shingle space|. The
MinHash d2 corpus reuses the fixture's 31-word vocabulary at 10x the
docs, which DENSIFIES shingles 10x — fine for banding (bucket width is
a tunable), but for an exact join it is the boilerplate-flood worst
case where no correct implementation is subquadratic (the first run of
this ladder measured exactly that: the candidate join spilled >65 GB
and died — the honest number for that regime is the PAIR MASS below,
not a wall time). Real corpora grow vocabulary with size (Heaps' law),
keeping per-shingle posting lists roughly constant. So:

- pp_d1: the MinHash ladder's doc_d1 (sf1 documents + 5k planted
  near-dups, 31-word vocab) — identical data, cross-family comparable.
- pp_d2: 10x docs synthesized by the same length/dup recipe over a
  10x vocabulary (310 deterministic variants of the fixture words) +
  50k planted near-dups — constant posting-list density, the regime
  the exact join is FOR.
- Additionally records dedup.ppjoin_pair_mass for pp_d1, pp_d2 AND the
  dense doc_d2 — one cheap aggregate each — demonstrating the
  pre-flight report that routes the dense corpus to MinHash banding
  instead of the exact join (mass_d2_dense / mass_pp_d2 is the
  ~quadratic-vs-linear gap, purchased without running the quadratic
  join).

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

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

import minhash_decade as mh  # noqa: E402  (d1 corpus + recipe shared by contract)
from laposte_data_engineering_jedha_spark.operators import caches, dedup  # noqa: E402
from laposte_data_engineering_jedha_spark.session import get_spark  # noqa: E402
from laposte_data_engineering_jedha_spark.sources.testdata import DOC_VOCAB  # noqa: E402

N_RUNS = 3
PP_D2_DOCS = 500_000
PP_D2_SEED = 778
VOCAB_SCALE = 10


def _synth_docs_scaled_vocab(n_doc: int, seed: int):
    """The fixture generator's documents recipe over a VOCAB_SCALE-x
    vocabulary (deterministic suffixed variants of the fixture words):
    Heaps-consistent growth — shingle space scales with the corpus, so
    per-shingle posting lists keep the d1 density."""
    import pandas as pd

    rng = np.random.default_rng(seed)
    vocab = np.array(
        [f"{w}{k}" if k else w for k in range(VOCAB_SCALE) for w in DOC_VOCAB]
    )
    texts = []
    for _ in range(n_doc):
        n_words = int(rng.integers(8, 100))
        texts.append(" ".join(vocab[rng.integers(0, len(vocab), n_words)]))
    for i in range(0, n_doc, 25):
        texts[i] = texts[(i + 7) % n_doc]
    return pd.DataFrame({"doc_id": np.arange(n_doc, dtype="int64"), "text": texts})


def ensure_pp_corpus(spark) -> str:
    path = os.path.join(mh.SCALE_DIR, "doc_pp_d2.parquet")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        pdf = _synth_docs_scaled_vocab(PP_D2_DOCS, PP_D2_SEED)
        docs = spark.createDataFrame(pdf)
        mh._with_planted(docs).repartition(32).write.mode("overwrite").parquet(path)
    return path


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


def pair_mass(spark, path: str) -> dict:
    row = dedup.ppjoin_pair_mass(spark.read.parquet(path)).first()
    caches.release_all()
    spark.catalog.clearCache()
    return {k: int(row[k]) for k in row.asDict()}


def main() -> None:
    out_json = (
        sys.argv[1]
        if len(sys.argv) > 1
        else os.path.join(mh.SCALE_DIR, "ppjoin_decade.json")
    )
    spark = get_spark(app_name="ppjoin_decade")
    paths = mh.ensure_corpora(spark)
    pp_d2 = ensure_pp_corpus(spark)

    masses = {
        "pp_d1": pair_mass(spark, paths["doc_d1"]),
        "pp_d2": pair_mass(spark, pp_d2),
        "d2_dense": pair_mass(spark, paths["doc_d2"]),
    }
    print("pair masses:", json.dumps(masses), flush=True)

    runs = [("pp_d1", paths["doc_d1"]), ("pp_d2", pp_d2)]
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
        "pair_mass": masses,
        "dense_regime_note": (
            "doc_d2 (31-word vocab at 550k docs) pair mass is the"
            " quadratic boilerplate-flood regime; the pre-flight report"
            " routes it to MinHash banding instead of the exact join"
        ),
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
