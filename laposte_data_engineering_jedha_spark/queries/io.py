"""Source/sink queries — SURVEY.md §2.1/§2.2 Op-IDs as write→read→return
round-trips so the DuckDB oracle verifies BOTH directions of each format.

Each round-trip materializes the deterministic deliveries view through a
sink, reads it back through the matching reader, applies the timestamp-
cast contract, and returns the canonical 6 columns — the oracle is simply
the deliveries view itself, so any loss in either direction (type,
precision, encoding) fails the hash.

src_generate is value-checked through its pinned-seed distribution
audit (counts are closed-form constants given seed + partitioning).
src_xlsx/sink_xlsx round-trip through the pure-stdlib OOXML codec
(sources/xlsx_codec.py), so they register unconditionally — no
openpyxl/xlsxwriter dependency.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import RAW_COLUMNS
from ..sources import writers
from ..sources.generate import generate_deliveries
from ..sources.readers import READER_MAP, cast_timestamp_contract
from . import deliveries_from_orders, query, with_deliveries

_DELIVERIES_ORACLE = with_deliveries("SELECT * FROM deliveries")


def _roundtrip(spark: SparkSession, sf_dir: str, fmt: str, ext: str) -> DataFrame:
    df = deliveries_from_orders(spark, sf_dir)
    tmp = tempfile.mkdtemp(prefix=f"laposte_rt_{fmt}_")
    path = os.path.join(tmp, f"deliveries{ext}")
    writers.WRITER_MAP[fmt](path).write(df)
    back = READER_MAP[ext](path).read(spark)
    return cast_timestamp_contract(back).select(*RAW_COLUMNS)


@query("src_csv_roundtrip", oracle=_DELIVERIES_ORACLE)
def src_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sink_csv + src_csv + src_cast_ts: header CSV out, inferred-schema
    read back, ISO timestamp strings re-cast (reference readers.py:30-33,
    writers.py:24-29, extract.py:77-80)."""
    return _roundtrip(spark, sf_dir, "csv", ".csv")


@query("src_json_roundtrip", oracle=_DELIVERIES_ORACLE)
def src_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sink_json (NDJSON) + src_json (reference readers.py:35-38,
    writers.py:31-36)."""
    return _roundtrip(spark, sf_dir, "json", ".json")


@query("src_parquet_roundtrip", oracle=_DELIVERIES_ORACLE)
def src_parquet_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sink_parquet + src_parquet (reference readers.py:40-43,
    writers.py:38-43)."""
    return _roundtrip(spark, sf_dir, "parquet", ".parquet")


@query("src_sqlite_roundtrip", oracle=_DELIVERIES_ORACLE)
def src_sqlite_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sink_sqlite (chunked appends) + src_sqlite (`SELECT * FROM
    deliveries`) (reference readers.py:45-50, writers.py:45-59)."""
    return _roundtrip(spark, sf_dir, "sqlite", ".db")


@query("src_xlsx_roundtrip", oracle=_DELIVERIES_ORACLE)
def src_xlsx_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sink_xlsx (streaming write) + src_xlsx (reference readers.py:52-55,
    writers.py:61-70) via the pure-stdlib OOXML codec — registers
    unconditionally, no openpyxl dependency."""
    return _roundtrip(spark, sf_dir, "xlsx", ".xlsx")


_WX_DATES = ["2025-03-01", "2025-03-02", "2025-03-03"]
_WX_CONDS = ["Clear", "Light rain", "Fog", "Heavy snow"]
_WX_LIST = "[" + ", ".join(f"'{c}'" for c in _WX_CONDS) + "]"


@query(
    "src_weather_flatten",
    f"""
WITH dates AS (
  SELECT CAST(d AS DATE) AS date
  FROM (VALUES {", ".join(f"('{d}')" for d in _WX_DATES)}) v(d)),
grid AS (
  SELECT date, CAST(h.range AS INTEGER) AS Hour
  FROM dates CROSS JOIN range(0, 24) h)
SELECT date, Hour,
       ({_WX_LIST})[
         (datediff('day', DATE '0001-01-01', date) + 1 + Hour) % 4 + 1
       ] AS Weather_Condition
FROM grid""",
)
def src_weather_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The native JSON flatten path (reference core/transform.py:78-85 ->
    from_json + explode, SURVEY.md §2.1 src_weather_flatten) driven over
    the fake client's canned payloads; the oracle recomputes the fake's
    closed-form condition rule (conditions[(toordinal(date)+hour) % 4])
    directly, so the whole parse->explode->project pipeline is value-checked."""
    import datetime

    from ..sources.weather import FakeWeatherClient, fetch_payloads, flatten_weather

    dates = [datetime.date.fromisoformat(d) for d in _WX_DATES]
    payloads = fetch_payloads(FakeWeatherClient(conditions=_WX_CONDS), dates)
    return flatten_weather(spark, payloads)


_GENERATE_AUDIT_ORACLE = """
SELECT * FROM (VALUES
  ('dist_decade', '0', CAST(200 AS BIGINT)), ('dist_decade', '1', 208),
  ('dist_decade', '2', 190), ('dist_decade', '3', 210),
  ('dist_decade', '4', 192),
  ('dur_hour', '0', 123), ('dur_hour', '1', 189), ('dur_hour', '2', 167),
  ('dur_hour', '3', 164), ('dur_hour', '4', 190), ('dur_hour', '5', 167),
  ('pkg', 'Extra Large', 16), ('pkg', 'Large', 160), ('pkg', 'Medium', 406),
  ('pkg', 'Small', 417), ('pkg', 'Special', 1),
  ('zone', 'Industrial', 44), ('zone', 'Rural', 200),
  ('zone', 'Shopping Center', 5), ('zone', 'Suburban', 372),
  ('zone', 'Urban', 379)
) t(metric, bucket, n)"""


@query("src_generate", oracle=_GENERATE_AUDIT_ORACLE)
def src_generate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded synthetic generator (reference core/extract.py:82-119),
    value-checked through a distribution audit: marginal counts of the
    categorical columns plus decade/hour moment buckets of Distance and
    trip duration, at the PINNED (seed=42, 1000 rows, 8 partitions)
    configuration. Spark's rand(seed) stream is deterministic given the
    partitioning (XORShift seeded per partition), so these counts are
    host-independent constants and the oracle is the closed-form VALUES
    list — same shape as corpus_bloom_contains' pinned bitmap. Duration
    is a timestamp DIFFERENCE, immune to session timezone. Broader
    distributional parity (uniformity, probability vectors) is asserted
    in tests/test_sources.py; rows-only through round 5, graduated here.

    One generate scan: the four marginals explode to (metric, bucket)
    pairs row-side and collapse in a single aggregation."""
    df = generate_deliveries(spark, 1000, seed=42, num_partitions=8)
    dur_min = (
        (
            F.unix_timestamp("Delivery_Timestamp")
            - F.unix_timestamp("Pickup_DateTime")
        )
        / 60
    ).cast("int")
    pairs = F.array(
        F.struct(F.lit("pkg").alias("metric"), F.col("Package_Type").alias("bucket")),
        F.struct(F.lit("zone").alias("metric"), F.col("Delivery_Zone").alias("bucket")),
        F.struct(
            F.lit("dist_decade").alias("metric"),
            F.floor(F.col("Distance") / 10).cast("int").cast("string").alias("bucket"),
        ),
        F.struct(
            F.lit("dur_hour").alias("metric"),
            F.floor(dur_min / 60).cast("int").cast("string").alias("bucket"),
        ),
    )
    return (
        df.select(F.explode(pairs).alias("mb"))
        .groupBy(F.col("mb.metric").alias("metric"), F.col("mb.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query("src_orc_roundtrip", oracle=_DELIVERIES_ORACLE)
def src_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sink_orc + src_orc: Spark's second native columnar format, same
    vectorized-scan / pushdown machinery as parquet (extension beyond the
    reference's format set — a lake standardized on ORC/Hive switches
    WRITER_MAP['orc'] in and nothing else changes)."""
    return _roundtrip(spark, sf_dir, "orc", ".orc")


@query(
    "src_partitioned_roundtrip",
    """
SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us, value
FROM events WHERE event_type = 'purchase'""",
)
def src_partitioned_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-partitioned sink + partition-pruned source: events written
    `partitionBy(event_type)`, read back filtered to one partition. The
    value-hash proves the layout round-trip is lossless (partition column
    rehydrated from directory names, timestamps micro-exact); the plan
    pin in tests/test_plans.py proves the filter became a PartitionFilter
    (the scan never touches the other 4/5 of the data) — the layout
    pattern that turns a 100 TB full scan into a 20 TB one before a
    single row is read."""
    from . import events_table

    ev = events_table(spark, sf_dir).select(
        "event_id", "user_id", "event_type", "ts", "value"
    )
    tmp = tempfile.mkdtemp(prefix="laposte_rt_part_")
    path = os.path.join(tmp, "events_by_type.parquet")
    ev.write.mode("overwrite").partitionBy("event_type").parquet(path)
    back = spark.read.parquet(path).where(F.col("event_type") == "purchase")
    return back.select(
        "event_id",
        "user_id",
        F.col("event_type").cast("string").alias("event_type"),
        F.unix_micros("ts").alias("ts_us"),
        "value",
    )
