"""Lifecycle registry for operator-internal persisted relations.

Several operators persist a narrow internal projection because it is
referenced multiple times in one plan and PythonUDF subtrees never
canonicalize equal (SCALE.md finding 11): minhash_lsh_pairs' signature
relation, knn_graph's banded projection, embedding_dup_pairs_lsh's
normalized source. A registered query is LAZY — the persist pays off only
when the caller materializes the result — so the operator itself can never
unpersist, and per-caller monkey-patched DataFrame-attribute handles
silently disappear as soon as the result is transformed (ADVICE r6; the
last one, knn_graph's `_knn_graph_src`, was removed in round 8). This
module is the explicit alternative:

- operators call `track(df)` on every internal persist;
- batch runners (bench.py, the oracle-parity replica gate, long-lived
  registry sessions) call `release_all()` AFTER materializing each query,
  which unpersists every tracked relation and clears the registry.

A runner that never calls `release_all()` (e.g. the external driver, which
runs ~50 queries once each) degrades to the previous behavior — bounded by
Spark's LRU block eviction — rather than failing. Handles are held
strongly: a weakref would let Python GC drop the handle while the JVM
still holds the cached blocks, making them unreleasable. To keep that
never-releasing path bounded on the PYTHON side too (ADVICE r7: the JVM
blocks are LRU-bounded but an unbounded handle list leaks), `track`
unpersists and drops the OLDEST entries once the registry exceeds
`MAX_TRACKED` — by then the oldest relations belong to queries whose
results were long since materialized, so releasing them costs at most a
recompute, never correctness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []

# Generous vs. real usage (no single query tracks more than a handful of
# relations) while keeping a run-forever session's handle list — and the
# JVM cache footprint it pins — bounded.
MAX_TRACKED = 32


def track(df: DataFrame) -> DataFrame:
    """Register a persisted relation for batch-runner cleanup; returns it.
    Evicts (unpersists + drops) the oldest registered relations beyond
    `MAX_TRACKED`, so sessions that never call release_all stay bounded."""
    _TRACKED.append(df)
    while len(_TRACKED) > MAX_TRACKED:
        old = _TRACKED.pop(0)
        try:
            old.unpersist()
        except Exception:  # pragma: no cover - session already stopped
            pass
    return df


def release_all() -> int:
    """Unpersist every tracked relation (blocking=False) and clear the
    registry. Returns the number of relations released. Safe to call at
    any time — unpersisting a relation that was never materialized, or
    one whose blocks were already LRU-evicted, is a no-op JVM-side."""
    n = 0
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:  # pragma: no cover - session already stopped
            pass
    return n
