#!/usr/bin/env python
"""Round-13 optimization harness: isolated per-query timing + plan capture.

    python scripts/opt_measure.py [--runs N] [--plan-tag TAG] q1 q2 ...

For each named query: warm once at the target SF, time `--runs` noop-sink
materializations (median + spread, bench.py methodology), release operator
caches, and — when --plan-tag is given — write the full
`explain("formatted")` output to plans/r13/<query>_<TAG>.txt.

Timing and the sink match bench.py exactly (guide §1.4: noop sink times the
computation, not the sink; §1.5: jobs are labelled for the UI/event log).
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from laposte_data_engineering_jedha_spark import queries as q
from laposte_data_engineering_jedha_spark.operators import caches
from laposte_data_engineering_jedha_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PLANS_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans",
    os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r14"),
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--plan-tag", default=None)
    args = ap.parse_args()

    spark = get_spark(app_name="opt_measure")
    registry = q.queries()
    out: dict[str, dict[str, float]] = {}
    for name in args.names:
        fn = registry[name]
        if args.plan_tag:
            os.makedirs(PLANS_DIR, exist_ok=True)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                fn(spark, SF_DIR).explain("formatted")
            with open(os.path.join(PLANS_DIR, f"{name}_{args.plan_tag}.txt"), "w") as fh:
                fh.write(buf.getvalue())
        spark.sparkContext.setJobDescription(f"warm:{name}")
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        samples: list[float] = []
        for i in range(args.runs):
            spark.sparkContext.setJobDescription(f"time:{name}:{i}")
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
        spark.sparkContext.setJobDescription(None)
        caches.release_all()
        out[name] = {
            "median": round(statistics.median(samples), 3),
            "min": round(min(samples), 3),
            "spread": round(max(samples) - min(samples), 3),
        }
        print(json.dumps({"q": name, **out[name]}), flush=True)


if __name__ == "__main__":
    main()
