"""Custom join operators Spark lacks as built-ins.

`asof_join` — the time-series staple (join each left row to the LATEST
right row at or before its timestamp, per key). Spark has no native as-of
join (pandas-on-Spark's merge_asof exists but routes through a different
API); the scalable DataFrame formulation used here is UNION + WINDOW:

    tag left/right -> union by (key, ts) -> per key, order by ts with
    right rows first on ties -> last_value(right payload, ignorenulls)
    over rows unbounded preceding -> keep left rows

One shuffle on the key (the window), no per-key driver loops, no
broadcast requirement on either side — both sides can be arbitrarily
large, which is exactly what the naive "filter right <= ts then take max
per pair" cross-join formulation cannot do.

`range_join` — inequality-band join (left.ts within [right.start,
right.end)) via bucketing both sides to coarse time buckets so the
planner gets an EQUI-join on bucket id instead of a pure cross product
with a range filter; exact predicate re-checked after the bucket match.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    value_cols: list[str] | None = None,
    tolerance_s: int | None = None,
    direction: str = "backward",
) -> DataFrame:
    """For every left row, attach the latest right row with
    `right.on <= left.on` within the same `by` key (nulls when none) —
    or, with direction="forward", the EARLIEST right row with
    `right.on >= left.on` (pandas merge_asof's direction semantics).

    value_cols: right columns to carry (default: all but `on`/`by`).
    tolerance_s: optional max staleness in seconds — older matches null out
    (matches pandas merge_asof(tolerance=...)); for forward joins it bounds
    how far AHEAD the match may be.

    Both directions are the union-sort-carry shape: one shuffle on the
    `by` key, no range join, no per-row subquery — the formulation that
    survives when both sides are 100 TB fact streams.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    if direction == "forward":
        return _asof_forward(left, right, on, by, value_cols, tolerance_s)
    value_cols = value_cols or [c for c in right.columns if c not in (on, by)]

    lhs = left.withColumn("_side", F.lit(1))
    rhs = right.select(
        by, on, *[F.col(c).alias(f"_r_{c}") for c in value_cols]
    ).withColumn("_side", F.lit(0))
    for c in left.columns:
        if c not in (on, by) and c not in rhs.columns:
            rhs = rhs.withColumn(c, F.lit(None))
    for c in value_cols:
        lhs = lhs.withColumn(f"_r_{c}", F.lit(None))
    merged = lhs.select(rhs.columns).unionByName(rhs.select(rhs.columns))

    # right rows sort BEFORE left rows at equal timestamps (_side 0 < 1),
    # so an exact-timestamp right row is visible to that left row. The
    # carried value columns complete the ORDER BY: duplicate right-side
    # (key, ts) rows would otherwise make last() partition-order-dependent
    # (the deterministic winner is the row with the greatest value tuple,
    # and ignorenulls makes null placement irrelevant on both engines).
    w = (
        Window.partitionBy(by)
        .orderBy(F.col(on), F.col("_side"), *[F.col(f"_r_{c}") for c in value_cols])
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = [
        F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_c_{c}") for c in value_cols
    ]
    carried_ts = F.max(F.when(F.col("_side") == 0, F.col(on))).over(w).alias("_c_ts")
    out = merged.select("*", *carried, carried_ts).where(F.col("_side") == 1)

    fresh = (
        F.unix_micros(F.col(on)) - F.unix_micros(F.col("_c_ts"))
        <= F.lit(tolerance_s).cast("long") * 1_000_000
        if tolerance_s is not None
        else F.lit(True)
    )
    final_cols = [c for c in left.columns] + [
        F.when(fresh, F.col(f"_c_{c}")).otherwise(F.lit(None)).alias(f"asof_{c}")
        for c in value_cols
    ]
    return out.select(*final_cols)


def _asof_forward(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    value_cols: list[str] | None = None,
    tolerance_s: int | None = None,
) -> DataFrame:
    """Forward as-of: earliest right row with `right.on >= left.on` per
    `by` key. Mirror of the backward carry: right rows sort AFTER left
    rows at equal timestamps (_side 2 > 1) so an exact-timestamp right row
    IS visible forward; `first(ignorenulls)` over [current, +inf) carries
    the next right value back; duplicate right (key, ts) rows resolve to
    the SMALLEST value tuple (the forward mirror of backward's greatest),
    keeping the winner partition-order-independent."""
    value_cols = value_cols or [c for c in right.columns if c not in (on, by)]

    lhs = left.withColumn("_side", F.lit(1))
    rhs = right.select(
        by, on, *[F.col(c).alias(f"_r_{c}") for c in value_cols]
    ).withColumn("_side", F.lit(2))
    for c in left.columns:
        if c not in (on, by) and c not in rhs.columns:
            rhs = rhs.withColumn(c, F.lit(None))
    for c in value_cols:
        lhs = lhs.withColumn(f"_r_{c}", F.lit(None))
    merged = lhs.select(rhs.columns).unionByName(rhs.select(rhs.columns))

    w = (
        Window.partitionBy(by)
        .orderBy(F.col(on), F.col("_side"), *[F.col(f"_r_{c}") for c in value_cols])
        .rowsBetween(0, Window.unboundedFollowing)
    )
    carried = [
        F.first(f"_r_{c}", ignorenulls=True).over(w).alias(f"_c_{c}")
        for c in value_cols
    ]
    carried_ts = F.min(F.when(F.col("_side") == 2, F.col(on))).over(w).alias("_c_ts")
    out = merged.select("*", *carried, carried_ts).where(F.col("_side") == 1)

    fresh = (
        F.unix_micros(F.col("_c_ts")) - F.unix_micros(F.col(on))
        <= F.lit(tolerance_s).cast("long") * 1_000_000
        if tolerance_s is not None
        else F.lit(True)
    )
    final_cols = [c for c in left.columns] + [
        F.when(fresh, F.col(f"_c_{c}")).otherwise(F.lit(None)).alias(f"asof_{c}")
        for c in value_cols
    ]
    return out.select(*final_cols)


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_start: str,
    right_end: str,
    bucket_s: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """left rows joined to right intervals containing them
    (`right_start <= left_ts < right_end`) via time-bucket equi-join.

    Each right interval is exploded to the buckets it overlaps; left rows
    key on their single bucket — the join becomes an equi-join on bucket
    id (hash-partitionable) with the exact range predicate re-applied.
    Choose bucket_s near the typical interval length: too small explodes
    the right side, too big degrades to the cross product.
    """
    lb = left.withColumn(
        "_bucket", F.floor(F.unix_micros(F.col(left_ts)) / (bucket_s * 1_000_000))
    )
    rb = right.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(F.unix_micros(F.col(right_start)) / (bucket_s * 1_000_000)),
                F.floor(
                    (F.unix_micros(F.col(right_end)) - 1) / (bucket_s * 1_000_000)
                ),
            )
        ),
    )
    cond = (
        (lb["_bucket"] == rb["_bucket"])
        & (F.col(right_start) <= F.col(left_ts))
        & (F.col(left_ts) < F.col(right_end))
    )
    return lb.join(rb, cond, how).drop("_bucket")


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    id_cols: list[str],
    value_cols: list[str] | None = None,
    tolerance_s: int | None = None,
) -> DataFrame:
    """Nearest as-of (pandas merge_asof direction='nearest'): per left
    row, the CLOSER of the backward and forward matches by absolute time
    distance, ties resolved to the backward match. Adds `asof_ts` (the
    matched right timestamp) next to the `asof_{col}` payloads.

    Built as the two union-sort-carry passes reconciled with an equi-join
    on the left row identity (`id_cols` must uniquely identify left
    rows): two key shuffles + one id join, still no range join and no
    broadcast requirement — each pass is the same shape that survives
    100 TB fact streams, and the reconcile join is keyed on the left's
    own id."""
    value_cols = value_cols or [c for c in right.columns if c not in (on, by)]
    rts = right.withColumn("_rts", F.col(on))
    vcols = value_cols + ["_rts"]
    b = asof_join(left, rts, on, by, vcols, tolerance_s, "backward")
    f = asof_join(left, rts, on, by, vcols, tolerance_s, "forward")
    fsel = f.select(
        *id_cols, *[F.col(f"asof_{c}").alias(f"_f_{c}") for c in vcols]
    )
    j = b.join(fsel, id_cols)
    bd = F.unix_micros(F.col(on)) - F.unix_micros(F.col("asof__rts"))
    fd = F.unix_micros(F.col("_f__rts")) - F.unix_micros(F.col(on))
    use_b = F.col("asof__rts").isNotNull() & (F.col("_f__rts").isNull() | (bd <= fd))
    return j.select(
        *left.columns,
        *[
            F.when(use_b, F.col(f"asof_{c}")).otherwise(F.col(f"_f_{c}")).alias(f"asof_{c}")
            for c in value_cols
        ],
        F.when(use_b, F.col("asof__rts")).otherwise(F.col("_f__rts")).alias("asof_ts"),
    )
