#!/usr/bin/env python
"""Second-decade scale ladder for MinHash-LSH dedup (r11 verdict item 5):
the 0.21 exponent for `dedup_minhash_lsh` — the most 100 TB-critical
operator — rests on the single sf0.1 -> sf1 step (5k -> 50k docs). This
script measures the NEXT decade, 55k -> 550k docs, with planted-duplicate
recall held, using the same interleaved self-contained protocol as
scripts/second_decade.py.

    python scripts/minhash_decade.py [OUT_JSON]

Corpora (generated once into .scale/, parquet-backed):
- doc_d1: the sf1 documents table (50k docs) + 5k planted near-dups
  (every 10th doc re-emitted at doc_id + 10M with one appended sentinel
  token — jaccard just under 1, always above the 0.5 threshold).
- doc_d2: a STRUCTURE-IDENTICAL 10x corpus synthesized by the same
  vocabulary/length/dup-slice recipe as the fixture generator
  (sources/testdata.py documents block, fresh seed) + 50k planted
  near-dups by the same rule. Synthesis, not replication-with-suffix:
  suffixed copies of the same base text are near-dups OF EACH OTHER,
  which multiplies true-pair density quadratically in the replica count
  and would measure the dup-mass worst case (scripts/scale_smoke.py
  covers that separately), not the operator's scaling on
  constant-density data.

Timing: warm-up once, then N_RUNS interleaved passes over the two sizes
with signature build + band join + verify + action inside the timed
region and cache release between passes; median reported; exponent =
log10(t_big / t_small). Recall = recovered planted pairs / planted.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from laposte_data_engineering_jedha_spark.operators import caches, dedup  # noqa: E402
from laposte_data_engineering_jedha_spark.session import get_spark  # noqa: E402
from laposte_data_engineering_jedha_spark.sources.testdata import DOC_VOCAB  # noqa: E402

N_RUNS = 3
SCALE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scale"
)
PLANT_OFFSET = 10_000_000
D2_DOCS = 500_000
D2_SEED = 777


def _with_planted(docs):
    planted = docs.where(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + PLANT_OFFSET).alias("doc_id"),
        F.concat("text", F.lit(" neardupsentinel")).alias("text"),
    )
    return docs.unionByName(planted)


def _synth_docs_pandas(n_doc: int, seed: int):
    """The fixture generator's documents recipe (sources/testdata.py:214)
    at an arbitrary size: vocab draws, 8-100 word lengths, every 25th doc
    an exact copy of doc (i+7) % n — same duplicate density per decade."""
    import pandas as pd

    rng = np.random.default_rng(seed)
    vocab = np.array(DOC_VOCAB)
    texts = []
    for _ in range(n_doc):
        n_words = int(rng.integers(8, 100))
        texts.append(" ".join(vocab[rng.integers(0, len(vocab), n_words)]))
    for i in range(0, n_doc, 25):
        texts[i] = texts[(i + 7) % n_doc]
    return pd.DataFrame({"doc_id": np.arange(n_doc, dtype="int64"), "text": texts})


def ensure_corpora(spark) -> dict[str, str]:
    paths = {
        "doc_d1": os.path.join(SCALE_DIR, "doc_d1.parquet"),
        "doc_d2": os.path.join(SCALE_DIR, "doc_d2.parquet"),
    }
    if not os.path.exists(os.path.join(paths["doc_d1"], "_SUCCESS")):
        docs = spark.read.parquet(
            os.path.join(SCALE_DIR, "sf1", "documents.parquet")
        ).select("doc_id", "text")
        _with_planted(docs).repartition(8).write.mode("overwrite").parquet(
            paths["doc_d1"]
        )
    if not os.path.exists(os.path.join(paths["doc_d2"], "_SUCCESS")):
        pdf = _synth_docs_pandas(D2_DOCS, D2_SEED)
        docs = spark.createDataFrame(pdf)
        _with_planted(docs).repartition(32).write.mode("overwrite").parquet(
            paths["doc_d2"]
        )
    return paths


def run_minhash(spark, path: str) -> tuple[float, int, int, int, int]:
    """One self-contained timed pass: read -> sign -> band-join ->
    verify -> single action aggregating pair volume + planted recall."""
    docs = spark.read.parquet(path)
    n_docs = docs.count()
    n_planted = docs.where(F.col("doc_id") >= PLANT_OFFSET).count()
    t0 = time.monotonic()
    pairs = dedup.minhash_lsh_pairs(docs, threshold=0.5)
    row = pairs.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        # coalesce: SUM over zero rows is NULL — a zero-pair run must
        # report recall 0, not crash the ladder (ADVICE r12)
        F.coalesce(
            F.sum(
                F.when(F.col("id_b") == F.col("id_a") + PLANT_OFFSET, 1).otherwise(0)
            ),
            F.lit(0),
        ).alias("n_recovered"),
    ).first()
    wall = time.monotonic() - t0
    caches.release_all()
    return wall, n_docs, int(row["n_pairs"]), int(row["n_recovered"]), n_planted


def main() -> None:
    out_json = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        SCALE_DIR, "minhash_decade.json"
    )
    spark = get_spark(app_name="minhash_decade")
    paths = ensure_corpora(spark)

    runs = [("mh_d1", paths["doc_d1"]), ("mh_d2", paths["doc_d2"])]
    # warm-up once per size (JVM/codegen), then interleaved timed passes
    for _, p in runs:
        run_minhash(spark, p)
    walls: dict[str, list[float]] = {k: [] for k, _ in runs}
    stats: dict[str, tuple] = {}
    for i in range(N_RUNS):
        for name, p in runs:
            wall, n_docs, n_pairs, n_rec, n_planted = run_minhash(spark, p)
            walls[name].append(wall)
            stats[name] = (n_docs, n_pairs, n_rec, n_planted)
            print(
                f"run{i} {name}: {wall:.1f}s docs={n_docs:,} pairs={n_pairs:,} "
                f"recall={n_rec}/{n_planted}",
                flush=True,
            )
    med = {k: statistics.median(v) for k, v in walls.items()}
    import math

    result = {
        "sizes": {k: stats[k][0] for k in med},
        "median_sec": {k: round(med[k], 2) for k in med},
        "all_sec": {k: [round(x, 2) for x in v] for k, v in walls.items()},
        "n_pairs": {k: stats[k][1] for k in med},
        "recall": {
            k: round(stats[k][2] / stats[k][3], 6) if stats[k][3] else None
            for k in med
        },
        "exponent": round(math.log10(med["mh_d2"] / med["mh_d1"]), 3),
    }
    with open(out_json, "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
