#!/usr/bin/env python3
"""Regenerate the README's uniform scale-probe ratio table from
SCALE_PROBE.json (three ratio buckets, entries sorted ascending), so a
probe refresh updates the README mechanically instead of by hand-edit.

Usage: python3 tools/probe_table.py [SCALE_PROBE.json]
"""
import json
import sys


def main() -> int:
    path = sys.argv[1] if len(sys.argv) > 1 else "SCALE_PROBE.json"
    d = json.load(open(path))
    rows = sorted(
        ((v["ratio"], q) for q, v in d["queries"].items()),
        key=lambda t: (t[0], t[1]))
    buckets = [("≤ 1.5×", [r for r in rows if r[0] <= 1.5]),
               ("1.5–2.5×", [r for r in rows if 1.5 < r[0] <= 2.5]),
               ("> 2.5×", [r for r in rows if r[0] > 2.5])]
    print(f"mult={d['mult']} total {d['total_base']} -> "
          f"{d['total_scaled']} s "
          f"({d['total_scaled'] / d['total_base']:.1f}x overall)\n")
    print("| ratio | queries |")
    print("|---|---|")
    for label, rs in buckets:
        names = ", ".join(f"{q} {r:.1f}" for r, q in rs)
        print(f"| {label} | {names} |")
    banded = [q for q, v in d["queries"].items() if "band" in v]
    print(f"\nband fields on {len(banded)}/{len(d['queries'])} entries")
    return 0


if __name__ == "__main__":
    sys.exit(main())
