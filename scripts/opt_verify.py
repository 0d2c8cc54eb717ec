#!/usr/bin/env python
"""Round-13 optimization equivalence check: run named queries AND their
DuckDB oracles at an arbitrary SF dir (default the bench's sf0.1, where the
scale-adaptive paths actually fire) and compare canonicalized rows exactly —
the same canonicalization as tests/test_oracle_parity.py, which only runs at
sf0.001.

    python scripts/opt_verify.py [--sf-dir DIR] q1 q2 ...
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import duckdb

from laposte_data_engineering_jedha_spark import queries as q
from laposte_data_engineering_jedha_spark.operators import caches
from laposte_data_engineering_jedha_spark.session import get_spark
from test_oracle_parity import TABLES, canon_rows


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    spark = get_spark(app_name="opt_verify")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{args.sf_dir}/{t}.parquet'")

    registry, oracles = q.queries(), q.oracle_sql()
    failed = []
    for name in args.names:
        spark.sparkContext.setJobDescription(f"verify:{name}")
        spark_pdf = registry[name](spark, args.sf_dir).toPandas()
        caches.release_all()
        oracle_pdf = con.execute(oracles[name]).df()
        ok = (
            sorted(spark_pdf.columns) == sorted(oracle_pdf.columns)
            and len(spark_pdf) == len(oracle_pdf)
            and canon_rows(spark_pdf) == canon_rows(oracle_pdf)
        )
        print(f"{'OK  ' if ok else 'FAIL'} {name} ({len(spark_pdf)} rows)", flush=True)
        if not ok:
            failed.append(name)
            s, o = canon_rows(spark_pdf), canon_rows(oracle_pdf)
            for sr, orow in list(zip(s, o))[:3]:
                if sr != orow:
                    print(f"  spark : {sr}\n  oracle: {orow}")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
