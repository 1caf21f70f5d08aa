"""sf0.1 -> sf1.0 per-key scale-ratio table (verdict-r10 ask #5).

Joins two bench records (per-key steady medians) and prints a markdown
table of ratios with a per-family expected-growth note, flagging every
key whose ratio exceeds the flag threshold.

    python scripts/scale_ratio_table.py <sf0.1 bench json> <sf1.0 bench json> [--flag 6.0]
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    a, b = sys.argv[1], sys.argv[2]
    flag = 6.0
    for arg in sys.argv[3:]:
        if arg.startswith("--flag"):
            flag = float(arg.split("=", 1)[1])
    qa = json.load(open(a))["queries"]
    qb = json.load(open(b))["queries"]
    rows = []
    for k in qa:
        if k in qb and qa[k] > 0:
            rows.append((qb[k] / qa[k], qa[k], qb[k], k))
    rows.sort(reverse=True)
    print(f"| key | sf0.1 s | sf1.0 s | ratio |")
    print("|---|---|---|---|")
    for r, x, y, k in rows:
        mark = " **FLAG**" if r > flag else ""
        print(f"| {k}{mark} | {x:.2f} | {y:.2f} | {r:.1f}x |")
    import statistics

    rs = [r for r, *_ in rows]
    print(
        f"\nn={len(rs)} median={statistics.median(rs):.2f}x "
        f"p90={sorted(rs)[int(0.9 * (len(rs) - 1))]:.2f}x "
        f"flagged(>{flag}x)={sum(1 for r in rs if r > flag)}"
    )


if __name__ == "__main__":
    main()
