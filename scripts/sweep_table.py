#!/usr/bin/env python3
"""Dev tool: render the PLANS sweep table from three Bench artifacts.

Usage: sweep_table.py <1x.json> <10x.json> <100x.json>
Prints a markdown table row per query with per-decade exponents
(log10 of the decade ratio) and the 100x [min,median,max] spread.
"""
import json
import math
import sys


def main() -> None:
    a, b, c = (json.load(open(p)) for p in sys.argv[1:4])
    qs = [q for q in c["queries"] if q in a["queries"] and q in b["queries"]]
    qs.sort(key=lambda q: -c["queries"][q])
    for q in qs:
        t1, t10, t100 = a["queries"][q], b["queries"][q], c["queries"][q]
        e1 = math.log10(t10 / t1) if t1 > 0 else float("nan")
        e2 = math.log10(t100 / t10) if t10 > 0 else float("nan")
        sp = c.get("spread", {}).get(q, [])
        spread = "[" + ", ".join(f"{v:.1f}" for v in sp) + "]" if sp else ""
        print(f"| {q} | {t1:.2f} | {t10:.2f} | {t100:.2f} "
              f"| {e1:.2f} | {e2:.2f} | {spread} |")


if __name__ == "__main__":
    main()
