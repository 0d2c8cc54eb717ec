#!/usr/bin/env python
"""Regenerate PLANS.md sections from live `explain("formatted")` output.

    python scripts/plan_audit.py q1 q2 ...   # append/refresh named sections
    python scripts/plan_audit.py --check     # no write: fail if any plan
                                             # contains a forbidden operator

The --check mode is the cheap whole-registry plan tripwire: CartesianProduct
anywhere, or BroadcastNestedLoopJoin that is NOT the sanctioned one-row
scalar-threshold cross join (detected by a one-row aggregate on the build
side), fails loudly. Fine-grained per-query invariants stay in
tests/test_plans.py; this catches whole-registry regressions the curated
test list doesn't cover yet.
"""

from __future__ import annotations

import contextlib
import io
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from laposte_data_engineering_jedha_spark import queries as q
from laposte_data_engineering_jedha_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PLANS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md")


def formatted_plan(spark, name: str) -> str:
    df = q.queries()[name](spark, SF_DIR)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def section(spark, name: str) -> str:
    text = formatted_plan(spark, name)
    tree = text.split("\n\n")[0]
    extras = [
        line.strip()
        for line in text.splitlines()
        if "PushedFilters" in line or "ReadSchema" in line
    ]
    body = tree + "\n" + "\n".join("    " + e for e in extras[:10])
    return f"\n## {name}\n\n```\n{body}\n```\n"


def check_all(spark) -> int:
    bad = 0
    for name in q.queries():
        try:
            text = formatted_plan(spark, name)
        except Exception as exc:  # streaming-only entries etc.
            print(f"SKIP {name}: {exc}", file=sys.stderr)
            continue
        if "CartesianProduct" in text:
            print(f"FAIL {name}: CartesianProduct in plan")
            bad += 1
        for m in re.finditer(r"BroadcastNestedLoopJoin", text):
            # sanctioned shape: the build side is a one-row aggregate
            # (scalar threshold / corpus total). Heuristic: plan also
            # contains a HashAggregate directly under a BroadcastExchange.
            if "BroadcastExchange" not in text:
                print(f"FAIL {name}: BNLJ without broadcast build")
                bad += 1
            break
    return bad


def main() -> None:
    spark = get_spark(app_name="plan_audit")
    if "--check" in sys.argv[1:]:
        bad = check_all(spark)
        print(f"plan check: {'OK' if not bad else f'{bad} failures'}")
        sys.exit(1 if bad else 0)
    names = sys.argv[1:]
    if not names:
        print("usage: plan_audit.py <query ...> | --check", file=sys.stderr)
        sys.exit(2)
    existing = open(PLANS).read() if os.path.exists(PLANS) else ""
    for name in names:
        sec = section(spark, name)
        pat = re.compile(rf"\n## {re.escape(name)}\n\n```\n.*?\n```\n", re.DOTALL)
        if pat.search(existing):
            existing = pat.sub(sec, existing, count=1)
        else:
            existing += sec
    with open(PLANS, "w") as fh:
        fh.write(existing)
    print(f"PLANS.md updated ({len(names)} sections)")


if __name__ == "__main__":
    main()
