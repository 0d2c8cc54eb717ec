#!/usr/bin/env python
"""Second-decade scale ladder for the two cured superlinear families
(r10 verdict item 3): the 0.21 (auto-banded LSH dedup) and 0.16 (capped
triangles) exponents rest on a single sf0.1 -> sf1 step where fixed job
costs dominate; this script runs the SAME interleaved self-contained
protocol one decade further — ~200k vectors and ~10M events — where
fixed costs no longer mask candidate mass, and re-measures planted-dup
recall at both vector sizes.

    python scripts/second_decade.py [OUT_JSON]

Corpora (generated once into .scale/, parquet-backed so timed runs read
files exactly like every other decade):
- vec_d1 / vec_d2: 19k+1k and 190k+10k planted near-dup corpora
  (scale_smoke.planted_dup_vecs shape: random-normal base + 5%
  perturbed copies at cos ~0.995, copy id = base id + 1e9).
- ev_d2: the sf1 events corpus replicated 10x with disjoint per-replica
  user-id ranges (same hours: per-(hour,type) bucket population grows
  10x, which is exactly the load the bucket cap exists to bound).

Timing: warm-up once, then N_RUNS interleaved passes over
(size, family) with operator build + action + cache release inside the
timed region; median reported; exponent = log10(t_big/t_small).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from laposte_data_engineering_jedha_spark.operators import (  # noqa: E402
    caches,
    dedup,
    graphs,
)
from laposte_data_engineering_jedha_spark.session import get_spark  # noqa: E402

N_RUNS = 3
SCALE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scale"
)
DUP_OFFSET = 1_000_000_000


def planted_dup_vecs(spark, n_base: int, n_dups: int, dim: int = 64):
    base = spark.range(n_base).select(
        F.col("id").alias("vec_id"),
        F.array(*[F.randn(seed=1000 + i) for i in range(dim)]).alias("embedding"),
    )
    dups = base.where(F.col("vec_id") < n_dups).select(
        (F.col("vec_id") + DUP_OFFSET).alias("vec_id"),
        F.zip_with(
            "embedding",
            F.array(*[F.randn(seed=9000 + i) for i in range(dim)]),
            lambda x, y: x + 0.1 * y,
        ).alias("embedding"),
    )
    return base.unionByName(dups)


def _bigint_ts_micros(ev):
    """Convert a bigint `ts` column to epoch MICROS with the unit
    DETECTED from magnitude (ADVICE r11: assuming nanoseconds mis-scales
    a micros/millis-encoded column by 1000x, collapsing the
    per-(hour,type) buckets the triangle-ladder exponent depends on).
    Any epoch between 1973 and ~2100 lands in a distinct decade per
    unit, so the max-magnitude probe is unambiguous; the derived range
    is asserted afterwards as a hard guard."""
    probe = ev.agg(F.max(F.abs(F.col("ts"))).alias("m")).first()["m"] or 0
    if probe >= 10**17:  # nanoseconds
        micros = F.expr("ts div 1000")
    elif probe >= 10**14:  # microseconds
        micros = F.col("ts")
    elif probe >= 10**11:  # milliseconds
        micros = F.col("ts") * 1000
    else:  # seconds
        micros = F.col("ts") * 1_000_000
    out = F.timestamp_micros(micros)
    bounds = ev.agg(
        F.min(F.year(out)).alias("lo"), F.max(F.year(out)).alias("hi")
    ).first()
    if bounds["lo"] is not None and not (1970 <= bounds["lo"] <= bounds["hi"] <= 2100):
        raise AssertionError(
            f"bigint ts unit detection produced years {bounds['lo']}..{bounds['hi']} "
            f"(probe magnitude {probe}); refusing to time a mis-scaled ladder"
        )
    return out


def ensure_corpora(spark) -> dict[str, str]:
    paths = {
        "vec_d1": os.path.join(SCALE_DIR, "vec_d1.parquet"),
        "vec_d2": os.path.join(SCALE_DIR, "vec_d2.parquet"),
        "ev_d2": os.path.join(SCALE_DIR, "ev_d2.parquet"),
    }
    if not os.path.exists(os.path.join(paths["vec_d1"], "_SUCCESS")):
        planted_dup_vecs(spark, 19_000, 1_000).write.mode("overwrite").parquet(
            paths["vec_d1"]
        )
    if not os.path.exists(os.path.join(paths["vec_d2"], "_SUCCESS")):
        planted_dup_vecs(spark, 190_000, 10_000).repartition(32).write.mode(
            "overwrite"
        ).parquet(paths["vec_d2"])
    if not os.path.exists(os.path.join(paths["ev_d2"], "_SUCCESS")):
        ev = spark.read.parquet(os.path.join(SCALE_DIR, "sf1", "events.parquet"))
        reps = spark.range(10).select(F.col("id").alias("rep"))
        ev.crossJoin(reps).select(
            (F.col("event_id") + F.col("rep") * 100_000_000).alias("event_id"),
            _bigint_ts_micros(ev).alias("ts")
            if dict(ev.dtypes).get("ts") == "bigint"
            else F.col("ts").cast("timestamp").alias("ts"),
            (F.col("user_id") + F.col("rep") * 10_000_000).alias("user_id"),
            "event_type",
            "value",
            "props",
        ).repartition(64).write.mode("overwrite").parquet(paths["ev_d2"])
    return paths


def run_lsh(spark, path: str) -> tuple[float, int, int, tuple]:
    emb = spark.read.parquet(path)
    n = emb.count()
    n_dups = emb.where(F.col("vec_id") >= DUP_OFFSET).count()
    planes = dedup.auto_band_planes(n)
    t0 = time.monotonic()
    pairs = dedup.embedding_dup_pairs_lsh(
        emb, threshold=0.9, bands=8, band_planes=planes
    )
    # one action: total pair volume + planted-pair recall numerator
    row = pairs.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(
            F.when(F.col("id_b") - F.col("id_a") == DUP_OFFSET, 1).otherwise(0)
        ).alias("found"),
    ).collect()[0]
    dt = time.monotonic() - t0
    caches.release_all()
    spark.catalog.clearCache()
    recall = (row["found"] or 0) / n_dups if n_dups else None
    return dt, n, planes, (row["n_pairs"], row["found"], round(recall, 4))


def run_tri(spark, path: str) -> tuple[float, int, tuple]:
    ev = spark.read.parquet(path)
    ts_type = dict(ev.dtypes).get("ts")
    if ts_type == "bigint":
        ev = ev.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_type == "timestamp_ntz":
        ev = ev.withColumn("ts", F.col("ts").cast("timestamp"))
    n = ev.count()
    t0 = time.monotonic()
    row = graphs.co_activity_triangles(ev, min_w=2).collect()[0]
    dt = time.monotonic() - t0
    caches.release_all()
    spark.catalog.clearCache()
    return dt, n, (row["n_edges"], row["n_nodes"], row["n_triangles"])


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        SCALE_DIR, "second_decade.json"
    )
    spark = get_spark(app_name="second_decade")
    paths = ensure_corpora(spark)
    sf1_events = os.path.join(SCALE_DIR, "sf1", "events.parquet")

    jobs = [
        ("lsh_d1", lambda: run_lsh(spark, paths["vec_d1"])),
        ("lsh_d2", lambda: run_lsh(spark, paths["vec_d2"])),
        ("tri_d1", lambda: run_tri(spark, sf1_events)),
        ("tri_d2", lambda: run_tri(spark, paths["ev_d2"])),
    ]
    run_lsh(spark, paths["vec_d1"])  # warm-up, discarded

    times: dict[str, list[float]] = {k: [] for k, _ in jobs}
    meta: dict[str, tuple] = {}
    for i in range(N_RUNS):
        for name, fn in jobs:
            r = fn()
            times[name].append(r[0])
            meta[name] = r[1:]
            print(f"run {i}: {name} {r[0]:.1f}s {r[1:]}", flush=True)

    import math

    med = {k: statistics.median(v) for k, v in times.items()}
    result = {
        "medians_s": {k: round(v, 2) for k, v in med.items()},
        "meta": {k: str(v) for k, v in meta.items()},
        "exp_lsh_decade2": round(math.log10(med["lsh_d2"] / med["lsh_d1"]), 2),
        "exp_tri_decade2": round(math.log10(med["tri_d2"] / med["tri_d1"]), 2),
        "n_runs": N_RUNS,
    }
    line = json.dumps(result)
    print(line)
    with open(out_path, "w") as fh:
        fh.write(line + "\n")


if __name__ == "__main__":
    main()
