"""Round-9 additions: auto-banding end-to-end at two corpus sizes
(r8 verdict item 4) and the exact_ntile migration invariants."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from laposte_data_engineering_jedha_spark.functions import vectors
from laposte_data_engineering_jedha_spark.operators import caches, dedup


def _corpus(spark, n, dim=16, dup_every=40):
    """Deterministic unit-ish vectors with planted EXACT duplicates: row i
    copies row i-1's vector when i % dup_every == 0 (i-1 is never itself
    a dup row, so the copy source's formula is unmodified) — exact dups
    collide in EVERY LSH band, so recall is banding-independent and the
    planted-pair set is the ground truth at any (bands, planes)."""
    src = F.when(
        (F.col("id") % dup_every == 0) & (F.col("id") >= dup_every),
        F.col("id") - 1,
    ).otherwise(F.col("id"))
    return spark.range(n).select(
        F.col("id").cast("long").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(dim)),
            lambda d: (F.sin(src * d * 0.7391 + d * d * 0.113) * 2 - 1).cast(
                "double"
            ),
        ).alias("embedding"),
    )


def _pair_mass(df, dim, bands, planes):
    """Candidate-pair mass = sum over (band, bucket) of c*(c-1)/2 — the
    cost the LSH self-join actually pays."""
    buckets = df.select(
        F.posexplode(
            vectors.pd_lsh_buckets_banded("embedding", dim, bands, planes)
        ).alias("band", "key")
    )
    row = (
        buckets.groupBy("band", "key")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.sum(F.expr("c * (c - 1) / 2")).alias("mass"))
        .collect()[0]
    )
    return float(row["mass"])


def test_auto_banding_end_to_end_two_corpus_sizes(spark):
    """END-TO-END at 2k and 8k vectors (a 4x step): with auto banding the
    full embedding_dup_pairs_lsh operator (bucket -> self-join -> exact
    verify) still finds every planted duplicate pair at BOTH sizes, while
    candidate-pair mass grows ~linearly (fixed 4-plane banding grows it
    ~quadratically — the measured sf1 exponent-1.59 shape)."""
    dim, bands = 16, 8
    sizes = (2000, 8000)
    masses = {}
    for n in sizes:
        df = _corpus(spark, n).cache()
        planted = {(float(i - 1), float(i)) for i in range(40, n, 40)}
        planes = dedup.auto_band_planes(n)
        got = {
            (float(r["id_a"]), float(r["id_b"]))
            for r in dedup.embedding_dup_pairs_lsh(
                df, threshold=0.9999, dim=dim, bands=bands, band_planes=planes
            ).collect()
        }
        caches.release_all()
        # exact duplicates collide in every band: recall 1 regardless of
        # planes; threshold 0.9999 keeps sin-noise neighbors out
        missing = {
            p
            for p in planted
            if p not in got and (p[1], p[0]) not in got
        }
        assert not missing, f"n={n}: {len(missing)} planted dups missed"
        masses[n] = _pair_mass(df, dim, bands, planes)
        df.unpersist()
    # auto banding: expected occupancy constant -> pair mass ~linear in n.
    # fixed banding at the small size for reference:
    fixed_mass_small = _pair_mass(_corpus(spark, sizes[0]), dim, bands, 4)
    fixed_mass_big = _pair_mass(_corpus(spark, sizes[1]), dim, bands, 4)
    auto_growth = masses[sizes[1]] / max(masses[sizes[0]], 1.0)
    fixed_growth = fixed_mass_big / max(fixed_mass_small, 1.0)
    step = sizes[1] / sizes[0]
    # fixed banding pays ~step^2 growth; auto must stay well under it and
    # within ~2x of linear (exponent <= ~1.5 on the 4x step even under
    # bucket-skew noise; measured ~1.0)
    assert fixed_growth > step * 2, f"fixture lost its quadratic shape: {fixed_growth}"
    assert auto_growth < fixed_growth / 2
    assert auto_growth < step ** 1.5
    exponent = math.log(auto_growth, step)
    assert exponent < 1.5, exponent


def test_auto_band_planes_monotone_and_floored():
    assert dedup.auto_band_planes(10) == 4
    vals = [dedup.auto_band_planes(n) for n in (100, 1000, 10_000, 100_000, 10**7)]
    assert vals == sorted(vals)
    assert dedup.auto_band_planes(64 * 2**20) == 20
