#!/usr/bin/env python
"""Scaling report: join the sf1 sweep (scripts/sf1_bench.py JSONL) with the
sf0.1 per-query medians (BENCH_DETAIL.json) and print per-family scaling
exponents — exponent = log10(t_sf1 / t_sf0.1) for a 10x data step, so
1.0 = linear, 2.0 = quadratic, ~0 = scale-free (bounded rollups /
fixed-size fits dominate at fixture scale).

    python scripts/sf1_report.py [SF1_JSONL] [DETAIL_JSON]
"""

from __future__ import annotations

import json
import math
import os
import sys
from collections import defaultdict

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def family(name: str) -> str:
    return name.split("_", 1)[0]


def main() -> None:
    sf1_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(_HERE, ".scale/sf1_bench.jsonl")
    det_path = sys.argv[2] if len(sys.argv) > 2 else os.path.join(_HERE, "BENCH_DETAIL.json")
    sf1: dict[str, float] = {}
    errs: dict[str, str] = {}
    with open(sf1_path) as fh:
        for line in fh:
            r = json.loads(line)
            if r.get("err"):
                errs[r["name"]] = r["err"]
            else:
                sf1[r["name"]] = r["sec"]
    with open(det_path) as fh:
        base = json.load(fh).get("queries", {})

    rows = []
    for name, t1 in sf1.items():
        t0 = base.get(name)
        if not t0 or t0 <= 0:
            continue
        # floor tiny times: sub-0.2s measurements are job-overhead noise
        exp = math.log10(max(t1, 0.05) / max(t0, 0.05))
        rows.append((name, t0, t1, exp))

    fams: dict[str, list] = defaultdict(list)
    for name, t0, t1, exp in rows:
        fams[family(name)].append((name, t0, t1, exp))

    print(f"{'family':<12}{'n':>4}{'sf0.1 sum':>11}{'sf1 sum':>10}{'med exp':>9}{'max exp (query)':>42}")
    for fam in sorted(fams):
        rs = fams[fam]
        exps = sorted(e for _, _, _, e in rs)
        med = exps[len(exps) // 2]
        worst = max(rs, key=lambda r: r[3])
        print(
            f"{fam:<12}{len(rs):>4}{sum(r[1] for r in rs):>11.1f}{sum(r[2] for r in rs):>10.1f}"
            f"{med:>9.2f}{worst[3]:>8.2f} {worst[0]:>33}"
        )
    total0 = sum(r[1] for r in rows)
    total1 = sum(r[2] for r in rows)
    print(f"\nTOTAL {len(rows)} queries: sf0.1 {total0:.1f}s -> sf1 {total1:.1f}s "
          f"(x{total1 / total0:.2f} for 10x data; overall exponent "
          f"{math.log10(total1 / total0):.2f})")
    print("\nworst 15 by exponent:")
    for name, t0, t1, exp in sorted(rows, key=lambda r: -r[3])[:15]:
        print(f"  {name:<44} {t0:>7.2f}s -> {t1:>8.2f}s  exp {exp:>5.2f}")
    if errs:
        print("\nERRORS / TIMEOUTS:")
        for n, e in errs.items():
            print(f"  {n}: {e}")


if __name__ == "__main__":
    main()
