"""Lifecycle registry (operators/caches.py): bounded tracking + release.

ADVICE r7: _TRACKED held strong references and grew without bound in any
long-lived session that never calls release_all (the external-driver
path). track() now evicts the oldest entries past MAX_TRACKED.

ADVICE r9: the ranking operators bake driver-collected offsets into lazy
plans over a sampled repartitionByRange persist — evicting that persist
before the consumer materializes silently corrupts ranks. track(pin=True)
exempts such relations from MAX_TRACKED eviction.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from laposte_data_engineering_jedha_spark.operators import caches


def test_track_evicts_oldest_beyond_cap(spark):
    caches.release_all()
    dfs = [
        spark.range(5).select((F.col("id") + i).alias("v")).persist()
        for i in range(caches.MAX_TRACKED + 3)
    ]
    for df in dfs:
        caches.track(df)
    # registry bounded, newest retained, oldest evicted + unpersisted
    tracked = [d for d, _ in caches._TRACKED]
    assert len(tracked) == caches.MAX_TRACKED
    assert tracked[-1] is dfs[-1]
    assert all(d not in tracked for d in dfs[:3])
    assert all(d.storageLevel.useMemory is False for d in dfs[:3])
    # the retained tail is still persisted until release_all
    assert dfs[-1].storageLevel.useMemory is True
    assert caches.release_all() == caches.MAX_TRACKED
    assert caches._TRACKED == []
    assert dfs[-1].storageLevel.useMemory is False


def test_release_all_idempotent(spark):
    caches.release_all()
    df = caches.track(spark.range(3).persist())
    assert caches.release_all() == 1
    assert caches.release_all() == 0
    assert df.storageLevel.useMemory is False


def test_pinned_entries_survive_eviction_pressure(spark):
    """A pinned relation must never be LRU-evicted no matter how many
    unpinned relations are tracked after it (ADVICE r9: eviction of a
    ranking persist between offset collection and consumer
    materialization is a correctness hazard, not a recompute)."""
    caches.release_all()
    pinned = caches.track(
        spark.range(7).select(F.col("id").alias("p")).persist(), pin=True
    )
    dfs = [
        spark.range(5).select((F.col("id") + i).alias("v")).persist()
        for i in range(caches.MAX_TRACKED + 5)
    ]
    for df in dfs:
        caches.track(df)
    # the pinned entry is still registered and still persisted; the cap
    # holds by evicting unpinned entries only
    assert len(caches._TRACKED) == caches.MAX_TRACKED
    assert any(d is pinned and p for d, p in caches._TRACKED)
    assert pinned.storageLevel.useMemory is True
    assert all(d.storageLevel.useMemory is False for d in dfs[:5])
    # release_all releases pinned entries too
    assert caches.release_all() == caches.MAX_TRACKED
    assert pinned.storageLevel.useMemory is False


def test_all_pinned_never_evicts(spark):
    """If every tracked relation is pinned, track() must keep them all
    (correctness beats the bound) rather than evict a pin."""
    caches.release_all()
    dfs = [
        spark.range(3).select((F.col("id") + i).alias("v")).persist()
        for i in range(caches.MAX_TRACKED + 2)
    ]
    for df in dfs:
        caches.track(df, pin=True)
    assert len(caches._TRACKED) == caches.MAX_TRACKED + 2
    assert all(d.storageLevel.useMemory is True for d in dfs)
    assert caches.release_all() == caches.MAX_TRACKED + 2
