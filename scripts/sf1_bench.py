#!/usr/bin/env python
"""Full-registry bench at sf1 (10x the gate fixture) — the quadratic-
behavior smoke the sf0.1 gate can't see (VERDICT r7 item 7).

    python scripts/sf1_bench.py [SF_DIR] [OUT_JSONL]

One timed run per query after a session warm-up, each under a watchdog
that cancels the query's job group after WATCHDOG_S (a stuck/quadratic
query records 'timeout' instead of wedging the sweep). Results append to
OUT_JSONL incrementally so a killed run keeps its partials; rerunning
skips names already recorded.
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from laposte_data_engineering_jedha_spark import queries as q  # noqa: E402
from laposte_data_engineering_jedha_spark.operators import caches  # noqa: E402
from laposte_data_engineering_jedha_spark.session import get_spark  # noqa: E402

WATCHDOG_S = 300


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale/sf1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.scale/sf1_bench.jsonl"
    done = set()
    if os.path.exists(out):
        with open(out) as fh:
            done = {json.loads(line)["name"] for line in fh if line.strip()}
    spark = get_spark(app_name="sf1_bench")
    sc = spark.sparkContext
    registry = q.queries()
    # session warm-up (JIT, Arrow init) outside any timing
    registry["pipeline_delay_status"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    caches.release_all()
    for name, fn in registry.items():
        if name in done:
            continue
        sc.setJobGroup(name, name, interruptOnCancel=True)
        timer = threading.Timer(WATCHDOG_S, lambda n=name: sc.cancelJobGroup(n))
        timer.start()
        t0 = time.time()
        err = None
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        except Exception as e:  # includes watchdog cancellation
            err = str(e).splitlines()[0][:200] if str(e) else type(e).__name__
        finally:
            timer.cancel()
            caches.release_all()
        rec = {"name": name, "sec": round(time.time() - t0, 3), "err": err}
        with open(out, "a") as fh:
            fh.write(json.dumps(rec) + "\n")
        print(rec, flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
