"""Scalar expression layer — every expression op from SURVEY.md §2.3/§2.7.

Each builder returns a Catalyst `Column`, so the whole business-rule model
stays inside whole-stage codegen (no Python UDFs anywhere on this path).
Semantics are bit-matched to the reference (file:line cited per function,
paths relative to /root/reference/).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

# --- business-rule constants (reference core/transform.py:148-178) ---------

PACKAGE_FACTORS: dict[str, float] = {
    "Small": 1.0,
    "Medium": 1.2,
    "Large": 1.5,
    "Extra Large": 2.0,
    "Special": 2.5,
}
ZONE_FACTORS: dict[str, float] = {
    "Urban": 1.2,
    "Suburban": 1.0,
    "Rural": 1.3,
    "Industrial": 0.9,
    "Shopping Center": 1.4,
}
WEEKDAY_NAMES: dict[int, str] = {  # ISO weekday 1-7 (core/transform.py:134)
    1: "Monday",
    2: "Tuesday",
    3: "Wednesday",
    4: "Thursday",
    5: "Friday",
    6: "Saturday",
    7: "Sunday",
}
BASE_TIME_MINUTES = 30.0
DISTANCE_FACTOR = 0.8
DELAY_THRESHOLD = 1.2


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


# --- generic expression ops -------------------------------------------------


def dict_map_strict(col: Column | str, mapping: Mapping, default) -> Column:
    """Categorical -> value map with default — `replace_strict(dict, default)`
    (reference core/transform.py:137,151-152) as a first-match CASE chain.

    A CASE chain over literals constant-folds in Catalyst and, unlike a join
    against a values table, costs zero shuffle at any scale.
    """
    col = _c(col)
    expr = None
    for k, v in mapping.items():
        cond = col == F.lit(k)
        expr = F.when(cond, F.lit(v)) if expr is None else expr.when(cond, F.lit(v))
    if expr is None:
        return F.lit(default)
    return expr.otherwise(F.lit(default))


def ts_diff_seconds(end: Column | str, start: Column | str) -> Column:
    """Timestamp difference in whole seconds (reference core/transform.py:120:
    Polars Duration `.dt.total_seconds()` -> Int64).

    `unix_timestamp` arithmetic keeps it a long column; the reference
    generator is minute-granular so sub-second truncation never bites.
    """
    return F.unix_timestamp(_c(end)) - F.unix_timestamp(_c(start))


def round2(col: Column) -> Column:
    """2-decimal rounding as `round(x * 100) / 100`.

    Library-wide convention: engine-native `round(x, 2)` on doubles is not
    portable (Spark HALF_UP on the shortest decimal repr vs DuckDB's
    value-based rounding disagree on e.g. 1.005), while rounding at scale 0
    is identical for every double in both engines — so this form makes the
    DuckDB correctness oracle match bit-for-bit. Differs from the
    reference's Polars `.round(2)` only on knife-edge .xx5 values
    (tolerance-level, SURVEY.md §7.3a).
    """
    return F.round(col * 100) / 100


def minutes_from_seconds(secs: Column) -> Column:
    """seconds/60 rounded to 2 decimals (core/transform.py:122)."""
    return round2(secs / 60)


def mmss_display(secs: Column) -> Column:
    """`"{secs // 60}.{secs % 60 zero-padded}"` (core/transform.py:123)."""
    return F.concat(
        F.floor(secs / 60).cast("string"),
        F.lit("."),
        F.lpad((secs % 60).cast("string"), 2, "0"),
    )


def hour_of(ts: Column | str) -> Column:
    """`dt.hour()` (core/transform.py:136)."""
    return F.hour(_c(ts))


def weekday_name(ts: Column | str) -> Column:
    """ISO weekday (Mon=1..Sun=7) -> English name via strict dict map
    (core/transform.py:134-137).

    Built as a CASE over `F.weekday` (0=Monday) rather than
    `date_format('EEEE')` for locale-independence.
    """
    iso = F.weekday(_c(ts)) + 1
    return dict_map_strict(iso, WEEKDAY_NAMES, None).cast("string")


def date_of(ts: Column | str) -> Column:
    """`dt.date()` (core/transform.py:48,96,105)."""
    return F.to_date(_c(ts))


# --- factor expressions (core/transform.py:148-176) -------------------------


def package_factor(col: Column | str = "Package_Type") -> Column:
    return dict_map_strict(col, PACKAGE_FACTORS, 1.0)


def zone_factor(col: Column | str = "Delivery_Zone") -> Column:
    return dict_map_strict(col, ZONE_FACTORS, 1.0)


def peak_hour_factor(col: Column | str = "Hour") -> Column:
    """Hour in [7,9] -> 1.3, [17,19] -> 1.4, else 1.0; closed bounds
    (core/transform.py:154-158 — `is_between(..., closed='both')`)."""
    col = _c(col)
    return (
        F.when(col.between(7, 9), 1.3)
        .when(col.between(17, 19), 1.4)
        .otherwise(1.0)
    )


def day_factor(col: Column | str = "Weekday") -> Column:
    """Mon/Fri -> 1.2, Sat/Sun -> 0.9, else 1.0 (core/transform.py:159-163)."""
    col = _c(col)
    return (
        F.when(col.isin("Monday", "Friday"), 1.2)
        .when(col.isin("Saturday", "Sunday"), 0.9)
        .otherwise(1.0)
    )


def weather_factor(col: Column | str = "Weather_Condition") -> Column:
    """NULL -> 1.0; case-insensitive first-match regex arms
    (core/transform.py:164-170). Order matters: the null check runs first
    and "drizzle" strings must hit the rain arm before any later arm."""
    col = _c(col)
    return (
        F.when(col.isNull(), 1.0)
        .when(col.rlike("(?i)rain|drizzle"), 1.2)
        .when(col.rlike("(?i)snow|blizzard|sleet"), 1.8)
        .when(col.rlike("(?i)fog|mist"), 1.1)
        .otherwise(1.0)
    )


def theoretical_time(
    distance: Column | str = "Distance",
    package_type: Column | str = "Package_Type",
    zone: Column | str = "Delivery_Zone",
    hour: Column | str = "Hour",
    weekday: Column | str = "Weekday",
    weather: Column | str = "Weather_Condition",
) -> Column:
    """`(30 + Distance*0.8) * package * zone * peak * day * weather`
    (core/transform.py:172-176). Returned UNROUNDED — the status comparison
    uses the unrounded value (core/transform.py:178-181); callers round only
    the output column (core/transform.py:188)."""
    return (
        (F.lit(BASE_TIME_MINUTES) + _c(distance) * DISTANCE_FACTOR)
        * package_factor(package_type)
        * zone_factor(zone)
        * peak_hour_factor(hour)
        * day_factor(weekday)
        * weather_factor(weather)
    )


def delay_status(
    actual_minutes: Column | str = "Actual_Delivery_Time_Minutes",
    theoretical: Column | None = None,
    **theoretical_kwargs,
) -> Column:
    """'Delayed' iff actual > unrounded theoretical * 1.2, else 'On-time'
    (core/transform.py:178-185)."""
    theo = theoretical if theoretical is not None else theoretical_time(**theoretical_kwargs)
    return (
        F.when(_c(actual_minutes) > theo * DELAY_THRESHOLD, F.lit("Delayed"))
        .otherwise(F.lit("On-time"))
    )


# --- misc parity expressions -------------------------------------------------


def null_string_lit(name: str = "Weather_Condition") -> Column:
    """Typed all-null column — `pl.lit(None, dtype=Utf8)` fallback when the
    weather fetch yields nothing (core/transform.py:100-101)."""
    return F.lit(None).cast("string").alias(name)


def sequential_string_id(id_col: Column | str = "id", prefix: str = "SC", base: int = 1000) -> Column:
    """`f"SC{1000 + i}"` sequential IDs (core/extract.py:107) over a
    `spark.range` id column."""
    return F.concat(F.lit(prefix), (_c(id_col) + base).cast("string"))


def weighted_choice(
    rand_col: Column,
    values: Sequence[str],
    probs: Sequence[float],
) -> Column:
    """`np.random.choice(values, p=probs)` (core/extract.py:110,112) as a
    cumulative-probability CASE over a uniform [0,1) column — distributed,
    seedable, and codegen-friendly."""
    expr = None
    cum = 0.0
    for v, p in zip(values[:-1], probs[:-1]):
        cum += p
        cond = rand_col < F.lit(cum)
        expr = F.when(cond, F.lit(v)) if expr is None else expr.when(cond, F.lit(v))
    if expr is None:
        return F.lit(values[-1])
    return expr.otherwise(F.lit(values[-1]))
