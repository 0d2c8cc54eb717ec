"""Local replica of the driver's DuckDB-oracle correctness gate.

For every registered query with an oracle, run the Spark DataFrame and the
DuckDB SQL on the same sf0.001 parquet and compare row counts + column names
+ exact canonicalized values (order-insensitive) — so mismatches surface
here before the driver's sf0.01 run.
"""

from __future__ import annotations

import datetime
import math

import duckdb
import pandas as pd
import pytest

from laposte_data_engineering_jedha_spark import queries as q

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


@pytest.fixture(scope="session")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    yield con
    con.close()


def _canon_value(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        return repr(v)
    if isinstance(v, (pd.Timestamp, datetime.datetime)):
        if pd.isna(v):
            return "NULL"
        ts = pd.Timestamp(v)
        # DuckDB's pandas bridge yields DATE columns as datetime64 midnights
        # while Spark yields datetime.date — canonicalize midnight to date.
        if ts.time() == datetime.time(0, 0) and ts.tz is None:
            return ts.date().isoformat()
        return ts.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)) or hasattr(v, "tolist"):
        seq = v.tolist() if hasattr(v, "tolist") else list(v)
        return "[" + ",".join(_canon_value(x) for x in seq) + "]"
    try:
        if pd.isna(v):
            return "NULL"
    except (TypeError, ValueError):
        pass
    return str(v)


def canon_rows(pdf: pd.DataFrame) -> list[tuple]:
    cols = sorted(pdf.columns)
    return sorted(
        tuple(_canon_value(v) for v in row)
        for row in pdf[cols].itertuples(index=False, name=None)
    )


@pytest.mark.parametrize("name", sorted(q.oracle_sql()))
def test_query_matches_oracle(name, spark, sf_dir, duck):
    from laposte_data_engineering_jedha_spark.operators import caches

    spark_pdf = q.queries()[name](spark, sf_dir).toPandas()
    # 229 oracles share one session: release operator-persisted relations
    # per query so the replica gate doesn't accumulate cached RDDs
    caches.release_all()
    oracle_pdf = duck.execute(q.oracle_sql()[name]).df()

    assert sorted(spark_pdf.columns) == sorted(oracle_pdf.columns), "column names differ"
    assert len(spark_pdf) == len(oracle_pdf), (
        f"row count: spark={len(spark_pdf)} oracle={len(oracle_pdf)}"
    )

    srows, orows = canon_rows(spark_pdf), canon_rows(oracle_pdf)
    if srows != orows:
        diffs = [(s, o) for s, o in zip(srows, orows) if s != o][:5]
        raise AssertionError(f"value mismatch ({len(diffs)}+ rows), first diffs: {diffs}")
