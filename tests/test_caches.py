"""Lifecycle registry (operators/caches.py): bounded tracking + release.

ADVICE r7: _TRACKED held strong references and grew without bound in any
long-lived session that never calls release_all (the external-driver
path). track() now evicts the oldest entries past MAX_TRACKED.
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
    assert len(caches._TRACKED) == caches.MAX_TRACKED
    assert caches._TRACKED[-1] is dfs[-1]
    assert all(d not in caches._TRACKED for d in dfs[:3])
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
