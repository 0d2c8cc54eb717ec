"""Anti-entropy reconciliation between two table snapshots ("replicas")
via hierarchical Merkle bucket digests — the incremental-reconcile
operator promised by the registered `dq_merkle_bucket_diff` oracle
(queries/round9g.py, whose fixed one-mutation shape stays the external
hash surface; this module is the general API over ARBITRARY snapshots).

The 100 TB shape: two replicas of a table diverge by a handful of rows.
Shipping either table to compare is off the table; the Merkle ladder
ships DIGESTS instead:

1. level 1 — one scan per side producing `n_coarse` (bit_xor of 52-bit
   md5 row digests, row count) pairs: a few KB crossing the wire. The
   xor fold is order-free and mergeable, so it partial-aggregates
   map-side and never shuffles rows, only bucket digests. Counts ride
   along to catch xor-cancelling pair anomalies (two rows swapping
   digests xor to the same bucket value; their counts usually differ —
   and a same-count swap still flips the fine level below).
2. level 2 — only buckets whose (digest, count) disagree (including
   buckets missing entirely on one side: the compare is a full outer
   join) are re-digested at `n_fine`-way granularity. The scan is
   filtered by a BROADCAST of the dirty coarse ids — at sane divergence
   rates that is a handful of ids against a full scan's worth of data.
3. row pulls — rows of both sides restricted (again by broadcast) to
   the dirty fine buckets are outer-joined on the key: rows missing on
   one side are inserts/deletes, equal keys with different value
   digests are updates. Only the divergent slice of the table is ever
   joined row-by-row.

Buckets are assigned by the digest of the KEY alone, so a value update
stays in its bucket (one dirty fine bucket), while inserts/deletes also
perturb the bucket counts. All digests are md5-based and deterministic,
so any other engine (the DuckDB oracles) reproduces them bit-for-bit.

Collision note: a mutated row is missed only if its 52-bit row digest
collides on the same key, p = 2^-52 per row — the standard Merkle
anti-entropy trade (Dynamo/Cassandra replica repair use the same
construction with wider hashes).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from . import caches
from .ranking import GATE_MAX_EST_BYTES, _estimated_bytes

_KH = "__mrk_kh"  # 52-bit key digest (bucket routing)
_H = "__mrk_h"  # 52-bit row digest (key + values)


def _tokens(cols: list[str]) -> list[Column]:
    """INJECTIVE field encoding (ADVICE r10): each field is
    LENGTH-PREFIXED — `len(value) ':' value '|'`, with NULL as the
    distinct token `'N|'` (a length prefix always starts with a digit,
    so 'N' cannot collide with real content). A plain separator join
    ('|'-concat) is NOT injective — a literal '|' inside a value shifts
    content across field boundaries (('a|','b') and ('a','|b') both
    encode as 'a||b'), turning two different rows into a deterministic
    digest collision instead of the documented 2^-52 random one; the
    length prefix makes the parse unambiguous (read digits to ':',
    consume exactly that many chars, expect '|')."""
    out = []
    for c in cols:
        s = F.col(c).cast("string")
        out.append(
            F.when(s.isNull(), F.lit("N|")).otherwise(
                F.concat(F.length(s).cast("string"), F.lit(":"), s, F.lit("|"))
            )
        )
    return out


def _digest52(cols: list[str]) -> Column:
    """Deterministic 52-bit digest of the named columns over the
    injective token encoding. One md5 per row — the per-column-md5
    alternative measured ~2x the digest cost on the three-scan Merkle
    ladder. 13 hex chars = 52 bits — inside a BIGINT and DuckDB's exact
    integer range, reproducible by any engine."""
    return F.conv(F.substring(F.md5(F.concat(*_tokens(cols))), 1, 13), 16, 10).cast(
        "long"
    )


def _bucketed(
    df: DataFrame, key_cols: list[str], value_cols: list[str],
    n_coarse: int, n_fine: int,
) -> DataFrame:
    # The key token payload is built and md5'd ONCE (r11 verdict item 2:
    # digesting key_cols twice — once for _KH, once inside _H's
    # key+value payload — paid double token construction and double md5
    # input on every ladder scan). _KH is carved out of the key md5's
    # hex; _H re-hashes that FIXED-WIDTH 32-hex token concatenated with
    # the value tokens, which keeps the encoding injective (the hex
    # prefix cannot shift across the boundary) while roughly halving the
    # per-row digest bytes for key-heavy schemas. A row digest now
    # collides across different keys only via a full md5 collision of
    # the key payloads — far below the documented 2^-52 row-digest rate.
    staged = df.select(
        *key_cols,
        F.md5(F.concat(*_tokens(list(key_cols)))).alias("__kh_hex"),
        F.concat(*_tokens(list(value_cols))).alias("__vals"),
    ).select(
        *key_cols,
        F.conv(F.substring("__kh_hex", 1, 13), 16, 10).cast("long").alias(_KH),
        F.col("__kh_hex"),
        F.col("__vals"),
    )
    return staged.select(
        *key_cols,
        F.pmod(F.col(_KH), F.lit(n_coarse)).cast("int").alias("coarse"),
        F.expr(f"CAST(pmod({_KH} div {n_coarse}, {n_fine}) AS INT)").alias("fine"),
        F.conv(
            F.substring(F.md5(F.concat("__kh_hex", "__vals")), 1, 13), 16, 10
        )
        .cast("long")
        .alias(_H),
    )


def _dirty(a: DataFrame, b: DataFrame, grain: list[str]) -> DataFrame:
    """Full-outer digest compare at a grain: a bucket is dirty when the
    digests or counts differ, INCLUDING buckets present on one side
    only (missing side compares as NULL — never null-safe-equal)."""
    return (
        a.join(b, grain, "full_outer")
        .where(
            ~F.col("dig_left").eqNullSafe(F.col("dig_right"))
            | ~F.col("n_left").eqNullSafe(F.col("n_right"))
        )
    )


def _resolve_value_cols(
    left: DataFrame, right: DataFrame, key_cols: list[str],
    value_cols: list[str] | None,
) -> list[str]:
    if value_cols is None:
        value_cols = [c for c in left.columns if c not in set(key_cols)]
    missing = [c for c in key_cols + value_cols if c not in right.columns]
    if missing:
        raise ValueError(f"right snapshot lacks columns {missing}")
    return value_cols


def _maybe_cached(df: DataFrame, small: bool) -> DataFrame:
    """The bucketed digest relation is consumed 2-3 times per ladder.
    Persist it ONLY when `small` (the caller's stats gate): at bench
    scale the cache collapses repeat scans; at 100 TB caching an
    O(corpus) relation would write the corpus to local disk, and
    sequential recompute scans are the right trade. Tracked unpinned —
    eviction only recomputes."""
    if small:
        return caches.track(df.persist())
    return df


def _replicas_small(left: DataFrame, right: DataFrame) -> bool:
    """Shared stats gate for BOTH snapshots, from the MINIMUM of the two
    input estimates (r13 optimization): the snapshots are replicas of the
    same table by this module's contract, but a replica assembled as
    scan + delta-union (the incremental-reconcile shape) carries a
    garbage Catalyst estimate — measured 4.9e18 bytes for a ~20 MB
    relation (union with a LocalRelation; the same estimate-inflation
    family as ppjoin_pairs' post-join stats) — so gating each side on its
    OWN estimate silently left the delta side recomputing its whole
    digest pipeline twice per query. The honest scan-side estimate
    stands in for both; at 100 TB it is big and both sides keep the
    recompute plan."""
    return (
        min(_estimated_bytes(left), _estimated_bytes(right)) <= GATE_MAX_EST_BYTES
    )


def _ladder_digests(d: DataFrame, side: str) -> DataFrame:
    """BOTH ladder grains from ONE aggregation pass (r12: the two-pass
    form scanned — and digested — each side twice; at 100 TB the fine
    pass re-reads the full corpus even though its output is filtered to
    dirty coarse buckets, because the coarse id is itself a digest
    function). rollup(coarse, fine) partial-aggregates map-side like any
    xor/count fold; the fine grain is ≤ n_coarse*n_fine rows, so
    computing it for CLEAN coarse buckets too costs KBs of aggregate
    state, not a corpus scan. grouping_id: 0 = (coarse, fine) grain,
    1 = (coarse) grain; the () grand-total row (3) is dropped."""
    lv = (
        d.rollup("coarse", "fine")
        .agg(
            F.expr(f"bit_xor({_H})").cast("long").alias(f"dig_{side}"),
            F.count(F.lit(1)).cast("long").alias(f"n_{side}"),
            F.grouping_id().alias("__g"),
        )
    )
    return lv


def _dirty_fine_buckets(da: DataFrame, db: DataFrame) -> DataFrame:
    # r13 optimization (guide §2.4): each side's ladder output is consumed
    # TWICE (the coarse grain for dirty_coarse, the fine grain for fa/fb),
    # and without a persist each reference re-runs the full rollup
    # aggregation over the bucketed digest relation — one whole extra
    # digest-scan pass per side per query. The ladder output is bounded by
    # CONSTRUCTION at <= n_coarse*(n_fine+1)+1 rows (grains of a rollup
    # over two bounded-modulus keys), independent of corpus size, so the
    # persist is unconditionally safe at 100 TB — no stats gate needed.
    la = caches.track(_ladder_digests(da, "left").persist())
    lb = caches.track(_ladder_digests(db, "right").persist())
    dirty_coarse = _dirty(
        la.where(F.col("__g") == 1).select("coarse", "dig_left", "n_left"),
        lb.where(F.col("__g") == 1).select("coarse", "dig_right", "n_right"),
        ["coarse"],
    ).select("coarse")
    fa = la.where(F.col("__g") == 0).join(F.broadcast(dirty_coarse), "coarse")
    fb = lb.where(F.col("__g") == 0).join(F.broadcast(dirty_coarse), "coarse")
    return _dirty(
        fa.select("coarse", "fine", "dig_left", "n_left"),
        fb.select("coarse", "fine", "dig_right", "n_right"),
        ["coarse", "fine"],
    ).select("coarse", "fine", "dig_left", "dig_right", "n_left", "n_right")


def merkle_bucket_diff(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    value_cols: list[str] | None = None,
    n_coarse: int = 64,
    n_fine: int = 256,
) -> DataFrame:
    """Locate WHERE two snapshots differ: returns the dirty FINE buckets
    as (coarse, fine, dig_left, dig_right, n_left, n_right) — digests /
    counts are NULL for a side with no rows in that bucket. Two digest
    scans per side; rows never cross the wire. `value_cols` defaults to
    every non-key column of `left` (both sides must share the schema).

    Contract note (ADVICE r13): `left` and `right` must be REPLICAS of
    the same table — the small-scale persist gate reads
    min(est(left), est(right)) because a replica assembled as
    scan + delta-union carries a garbage Catalyst estimate
    (_replicas_small). Passing two genuinely different-sized relations
    violates that contract and can persist an O(big-side) relation."""
    value_cols = _resolve_value_cols(left, right, key_cols, value_cols)
    small = _replicas_small(left, right)
    da = _maybe_cached(_bucketed(left, key_cols, value_cols, n_coarse, n_fine), small)
    db = _maybe_cached(_bucketed(right, key_cols, value_cols, n_coarse, n_fine), small)
    return _dirty_fine_buckets(da, db)


def merkle_reconcile(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    value_cols: list[str] | None = None,
    n_coarse: int = 64,
    n_fine: int = 256,
) -> DataFrame:
    """Row-level divergence between two snapshots, computed WITHOUT a
    full row-level compare: the Merkle ladder (merkle_bucket_diff)
    narrows to dirty fine buckets, then only rows in those buckets are
    outer-joined on the key. Returns one row per divergent key:
    (*key_cols, change) with change in
    {'missing_in_right', 'missing_in_left', 'changed'} — i.e. the rows a
    repair job would pull/push/overwrite. Empty when the snapshots
    agree. The bucketed digest relations are shared between the ladder
    and the row-pull stage (one construction per side, stats-gate
    persisted at small scale). Same replica contract as
    merkle_bucket_diff: both inputs must be snapshots of the SAME table
    (the persist gate reads the minimum of the two estimates)."""
    value_cols = _resolve_value_cols(left, right, key_cols, value_cols)
    small = _replicas_small(left, right)
    da = _maybe_cached(_bucketed(left, key_cols, value_cols, n_coarse, n_fine), small)
    db = _maybe_cached(_bucketed(right, key_cols, value_cols, n_coarse, n_fine), small)
    dirty_fine = _dirty_fine_buckets(da, db).select("coarse", "fine")
    la = da.join(F.broadcast(dirty_fine), ["coarse", "fine"]).select(
        *key_cols, F.col(_H).alias("__h_l")
    )
    lb = db.join(F.broadcast(dirty_fine), ["coarse", "fine"]).select(
        *key_cols, F.col(_H).alias("__h_r")
    )
    change = (
        F.when(F.col("__h_r").isNull(), F.lit("missing_in_right"))
        .when(F.col("__h_l").isNull(), F.lit("missing_in_left"))
        .otherwise(F.lit("changed"))
    )
    return (
        la.join(lb, list(key_cols), "full_outer")
        .where(~F.col("__h_l").eqNullSafe(F.col("__h_r")))
        .select(*key_cols, change.alias("change"))
    )
