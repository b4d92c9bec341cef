"""Per-query 10x data-scaling retention: sf1 bench vs the certified
sf0.1 reference (verdict r4 item 1).

retention(q) = 10 * t_sf0.1(q) / t_sf1(q)

i.e. the fraction of per-row throughput kept when the data grows 10x on
the same local[32] session.  1.0 = perfectly linear cost in rows;
> 1 = super-linear speedup per row (fixed costs amortize — the common
case for sub-second queries whose wall is dominated by job scheduling);
< 1 = the plan degrades faster than the data grows.  The certification
bar (VERDICT r4): every query below 0.5 needs a named fix or a written
justification.

Usage: python tools/retention_sf1.py bench_sf1.json [BENCH_r04.json]
Prints a markdown table sorted by retention ascending plus summary
stats; queries skipped at sf1 are listed separately.
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    sf1_path = sys.argv[1] if len(sys.argv) > 1 else "bench_sf1.json"
    ref_path = sys.argv[2] if len(sys.argv) > 2 else "BENCH_r04.json"
    with open(sf1_path) as f:
        sf1 = json.load(f)
    with open(ref_path) as f:
        ref = json.load(f)
    sf1 = sf1.get("parsed", sf1)   # driver BENCH_r*.json wraps the
    ref = ref.get("parsed", ref)   # payload under "parsed"
    q1, q0 = sf1["queries"], ref["queries"]
    rows = []
    for name, t1 in q1.items():
        t0 = q0.get(name)
        if t0 is None:
            continue
        # floor the reference at 50 ms: below that the sf0.1 number is
        # pure scheduling noise and the ratio is meaningless
        ret = 10.0 * max(t0, 0.05) / t1 if t1 > 0 else float("inf")
        rows.append((ret, name, t0, t1))
    rows.sort()
    print("| query | sf0.1 s | sf1 s | retention (10x) |")
    print("|---|---|---|---|")
    for ret, name, t0, t1 in rows:
        print(f"| {name} | {t0:.2f} | {t1:.2f} | {ret:.2f} |")
    rets = [r for r, *_ in rows]
    n = len(rets)
    med = sorted(rets)[n // 2]
    below = [(name, ret) for ret, name, _, _ in rows if ret < 0.5]
    print()
    print(f"queries compared: {n}; total sf0.1 {sum(t for _, _, t, _ in rows):.1f} s"
          f" -> sf1 {sum(t for _, _, _, t in rows):.1f} s"
          f" (suite retention {10 * sum(t for _, _, t, _ in rows) / sum(t for _, _, _, t in rows):.2f})")
    print(f"median retention {med:.2f}; below 0.5: {len(below)}"
          f" {sorted(n for n, _ in below)}")
    if sf1.get("skipped"):
        print(f"skipped at sf1: {sf1['skipped']}")


if __name__ == "__main__":
    main()
