"""File readers — the reference's five-format reader family
(sources/readers.py:26-55) plus the extension dispatch + timestamp-cast
contract (core/extract.py:16-22,57-80).

csv/json/parquet are native distributed `spark.read` scans (predicate
pushdown + column pruning for free). SQLite and XLSX have no core-Spark
source in this environment, so they bridge through the driver — fine for
the reference's single-file semantics; the docstrings note the cluster
path (JDBC / spark-excel connector) for real deployments.
"""

from __future__ import annotations

import os
import sqlite3

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class BaseReader:
    def __init__(self, path: str):
        self.path = path

    def read(self, spark: SparkSession) -> DataFrame:
        raise NotImplementedError


class CsvReader(BaseReader):
    """CSV with header + inferred types (reference sources/readers.py:30-33)."""

    def read(self, spark: SparkSession) -> DataFrame:
        return (
            spark.read.option("header", True).option("inferSchema", True).csv(self.path)
        )


class JsonReader(BaseReader):
    """JSON (reference sources/readers.py:35-38 reads an array-of-records
    file, Polars-style). Spark's native JSON is NDJSON; an array file is
    detected by its first non-whitespace byte and read multiLine."""

    def read(self, spark: SparkSession) -> DataFrame:
        multiline = False
        with open(self.path, "rb") as fh:
            head = fh.read(64).lstrip()
            multiline = head.startswith(b"[")
        return spark.read.option("multiLine", multiline).json(self.path)


class ParquetReader(BaseReader):
    """Parquet (reference sources/readers.py:40-43)."""

    def read(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.path)


class OrcReader(BaseReader):
    """ORC — Spark's second native columnar format (vectorized reader,
    predicate pushdown, column pruning — same scan machinery as parquet).
    Beyond the reference's format set, but a drop-in for lakes standardized
    on ORC/Hive."""

    def read(self, spark: SparkSession) -> DataFrame:
        return spark.read.orc(self.path)


class SqliteReader(BaseReader):
    """SQLite, fixed query `SELECT * FROM deliveries` (reference
    sources/readers.py:45-50). Driver-side sqlite3 -> Arrow-backed
    createDataFrame; on a cluster this becomes
    `spark.read.format('jdbc').option('url', 'jdbc:sqlite:...')` with a
    partitioned read (no sqlite-jdbc jar in this sandbox)."""

    TABLE = "deliveries"

    def read(self, spark: SparkSession) -> DataFrame:
        with sqlite3.connect(self.path) as conn:
            pdf = pd.read_sql_query(f"SELECT * FROM {self.TABLE}", conn)
        return spark.createDataFrame(pdf)


class XlsxReader(BaseReader):
    """Excel workbook (reference sources/readers.py:52-55) via the
    pure-stdlib OOXML codec (sources/xlsx_codec.py) — no openpyxl needed;
    `pandas.read_excel` is used instead when available. Single-workbook
    driver-side bridge by nature; the cluster-scale alternative is the
    com.crealytics:spark-excel connector."""

    def read(self, spark: SparkSession) -> DataFrame:
        try:  # pragma: no cover - env-dependent
            import openpyxl  # noqa: F401

            pdf = pd.read_excel(self.path)
        except ImportError:
            from . import xlsx_codec

            pdf = xlsx_codec.read_xlsx_pandas(self.path)
        return spark.createDataFrame(pdf)


READER_MAP: dict[str, type[BaseReader]] = {
    ".csv": CsvReader,
    ".json": JsonReader,
    ".parquet": ParquetReader,
    ".orc": OrcReader,
    ".db": SqliteReader,
    ".xlsx": XlsxReader,
}


def cast_timestamp_contract(df: DataFrame) -> DataFrame:
    """Post-read contract cast (reference core/extract.py:77-80): both
    datetime columns -> timestamp regardless of source (parses the ISO
    strings that CSV round-trips produce)."""
    return df.withColumns(
        {
            "Pickup_DateTime": F.to_timestamp("Pickup_DateTime"),
            "Delivery_Timestamp": F.to_timestamp("Delivery_Timestamp"),
        }
    )


def read_file(spark: SparkSession, path: str) -> DataFrame:
    """Extension dispatch with the reference's error semantics
    (core/extract.py:57-75): FileNotFoundError for a missing path,
    ValueError for an unknown extension."""
    if not path or not os.path.exists(path):
        raise FileNotFoundError(f"Source file not found at path: {path}")
    ext = os.path.splitext(path)[1]
    reader_class = READER_MAP.get(ext)
    if not reader_class:
        raise ValueError(f"Unsupported file type: {ext}")
    return reader_class(path).read(spark)


def extract_data(spark: SparkSession, config: dict) -> DataFrame:
    """Config-driven extract (reference core/extract.py:34-80): dispatch on
    source.type ('generate' | 'file'), then apply the timestamp contract."""
    from .generate import generate_deliveries

    source = config.get("source", {})
    source_type = source.get("type")
    if source_type == "generate":
        df = generate_deliveries(
            spark,
            source.get("rows", 1000),
            seed=source.get("seed", 42),
            anchor=source.get("anchor", _default_anchor()),
        )
    elif source_type == "file":
        df = read_file(spark, source.get("path"))
    else:
        raise ValueError(f"Unknown or missing source type in config: {source_type}")
    return cast_timestamp_contract(df)


def _default_anchor() -> str:
    from .generate import DEFAULT_ANCHOR

    return DEFAULT_ANCHOR
