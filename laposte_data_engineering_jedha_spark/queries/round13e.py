"""Round-13 session batch 5 — partition-pruned layout identity:

- layout_partition_prune_identity: rewrite the projected events table
  HIVE-PARTITIONED by day, read back exactly ONE day through the
  partition column, and prove (a) the pruned slice's row multiset is
  bit-identical to filtering the source (the same order-free xor-of-
  row-digests as layout_compact_identity) and (b) — in the pinning test
  — that the scan plans a PartitionFilters entry, i.e. Spark never
  touches the other days' files. This is the third leg of the layout
  family (compaction identity, z-order identity, bucketed join): at
  100 TB, date partitioning is the difference between scanning one
  directory and scanning three years. (Day grain, not month: the
  fixture corpus spans ~one month, so only day partitioning makes the
  prune non-trivial — 1/30 of the files — at every oracle scale.)

Reference parity note: the reference writes single files per format
(supercourier_etl load step); partition layout is extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import layout
from . import query
from .round11a import (
    _EV_COLS,
    _SQL_EV_DIGEST,
    _SQL_EV_PROJ,
    _content_summary,
    _events_projected,
    _scratch,
)


def _pruned_scan(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, str]:
    """(one-day pruned read of the partitioned rewrite, day key).

    The rewrite is idempotent per (sf_dir, pid) scratch location; the
    probed day is the corpus's MINIMUM day, computed with one tiny
    aggregate so the filter lands as a plan-time literal — exactly how a
    daily job addresses yesterday's partition."""
    path = _scratch(sf_dir, "pruneday")
    src = _events_projected(spark, sf_dir).withColumn(
        "day", F.date_format(F.timestamp_micros("ts_us"), "yyyy-MM-dd")
    )
    layout.write_partitioned(src, path, ["day"])
    min_day = (
        _events_projected(spark, sf_dir)
        .agg(F.min(F.date_format(F.timestamp_micros("ts_us"), "yyyy-MM-dd")))
        .first()[0]
    )
    back = spark.read.parquet(path).where(F.col("day") == min_day)
    return back, min_day


@query(
    "layout_partition_prune_identity",
    f"""
WITH src AS ({_SQL_EV_PROJ}),
m AS (SELECT min(strftime(make_timestamp(ts_us), '%Y-%m-%d')) AS d FROM src),
sl AS (SELECT src.* FROM src CROSS JOIN m
       WHERE strftime(make_timestamp(ts_us), '%Y-%m-%d') = m.d)
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(bit_xor({_SQL_EV_DIGEST}) AS BIGINT) AS content_digest
FROM sl
""",
)
def layout_partition_prune_identity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-partitioned rewrite + single-partition read-back identity:
    the pruned day's rows must carry the exact multiset digest of
    filtering the ORIGINAL relation to that day — the partition
    layout is semantically invisible, only the I/O geometry changes
    (the plan-level PartitionFilters guarantee is pinned in
    tests/test_round13.py::test_partition_prune_plan_has_filters). The
    day key is derived from the SAME integer microseconds on both
    engines (date_format vs strftime over a UTC session), and the
    digest drops the partition column so the identity is over the
    original six columns."""
    back, _ = _pruned_scan(spark, sf_dir)
    return _content_summary(back.select(*_EV_COLS), None).select(
        "n_rows", "content_digest"
    )
