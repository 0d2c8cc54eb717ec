"""Round-13 session batch 7 — the foreachBatch IVM sink's registered
batch twin:

- stream_ivm_counts: the (event_type, day) count view that
  streaming/ivm.py maintains incrementally (foreachBatch merge into a
  parquet table published by atomic rename, exactly-once via a
  batch_id manifest — the EIGHTH stateful streaming surface, and the
  one canonical pattern applyInPandasWithState doesn't cover: state as
  a TABLE any reader can query mid-stream). Registered as its
  deterministic batch aggregate, the same graduation shape as
  stream_tumbling_counts / stream_sessionize; the incremental
  machinery itself is pinned by tests/test_streaming.py (view == batch
  after ~31 merges, kill-restart resume, replayed-batch_id no-op).

Reference parity note: the reference has no streaming surface;
extension layer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..streaming import ivm
from . import events_table, query


@query(
    "stream_ivm_counts",
    """
SELECT event_type, CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS n
FROM events GROUP BY 1, 2 ORDER BY event_type, day""",
)
def stream_ivm_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the incrementally-maintained (type, day) counts
    view (streaming/ivm.py): after ANY prefix of appends, the published
    view must equal this one-shot aggregate over the same rows — the
    IVM invariant the foreachBatch merge maintains batch by batch. One
    partial-aggregated shuffle; the streaming form's per-merge cost is
    |view| + |micro-batch delta|, never a history re-scan."""
    return ivm.batch_counts(events_table(spark, sf_dir)).orderBy(
        "event_type", "day"
    )
