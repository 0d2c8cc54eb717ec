#!/usr/bin/env python
"""Auto-banding sf1 proof point (r8 VERDICT item 4): time the embedding
near-dup candidate generator (the dedup family's worst sf1 exponent,
1.59 at fixed 8x4 banding) across the 10x corpus step with FIXED vs
AUTO banding and print the per-variant scaling exponent.

    python scripts/auto_band_sf1.py [SF01_DIR] [SF1_DIR]

Protocol: one warm-up run at the small size (session/JIT), then each
(size, variant) timed self-contained — operator build + action + cache
release inside the timed region, interleaved A/B/A/B so host drift hits
both variants equally; median of 3."""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from laposte_data_engineering_jedha_spark import queries as q  # noqa: E402
from laposte_data_engineering_jedha_spark.operators import caches, dedup  # noqa: E402
from laposte_data_engineering_jedha_spark.session import get_spark  # noqa: E402

N_RUNS = 3


def run_once(spark, sf_dir: str, planes: int) -> tuple[float, int]:
    emb = q.table(spark, sf_dir, "embeddings")
    t0 = time.monotonic()
    n_pairs = dedup.embedding_dup_pairs_lsh(
        emb, threshold=0.9, bands=8, band_planes=planes
    ).count()
    dt = time.monotonic() - t0
    caches.release_all()
    spark.catalog.clearCache()
    return dt, n_pairs


def main() -> None:
    sf01 = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    sf1 = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scale", "sf1"
    )
    spark = get_spark()
    sizes = {}
    for label, d in (("sf0.1", sf01), ("sf1", sf1)):
        sizes[label] = q.table(spark, d, "embeddings").count()
    print("corpus sizes:", sizes, flush=True)
    run_once(spark, sf01, 4)  # warm-up, discarded

    results: dict[tuple[str, str], list[float]] = {}
    pairs: dict[tuple[str, str], int] = {}
    for _ in range(N_RUNS):
        for label, d in (("sf0.1", sf01), ("sf1", sf1)):
            for variant in ("fixed", "auto"):
                planes = 4 if variant == "fixed" else dedup.auto_band_planes(
                    sizes[label]
                )
                dt, np_ = run_once(spark, d, planes)
                results.setdefault((label, variant), []).append(dt)
                pairs[(label, variant)] = np_
    import math

    print("\nvariant  planes(sf0.1/sf1)  t_sf0.1  t_sf1  growth  exponent  pairs(sf0.1/sf1)")
    for variant in ("fixed", "auto"):
        t_small = statistics.median(results[("sf0.1", variant)])
        t_big = statistics.median(results[("sf1", variant)])
        growth = t_big / t_small
        exp = math.log10(growth)  # 10x step
        p_s = 4 if variant == "fixed" else dedup.auto_band_planes(sizes["sf0.1"])
        p_b = 4 if variant == "fixed" else dedup.auto_band_planes(sizes["sf1"])
        print(
            f"{variant:7s}  {p_s}/{p_b}  {t_small:.2f}  {t_big:.2f}  x{growth:.2f}  "
            f"{exp:.2f}  {pairs[('sf0.1', variant)]}/{pairs[('sf1', variant)]}",
            flush=True,
        )


if __name__ == "__main__":
    main()
