#!/usr/bin/env python3
"""Compare two Bench JSON lines (e.g. BENCH_r1.json vs BENCH_r2.json).

Usage: python3 tools/bench_compare.py <old.json> <new.json>

Prints total delta and the per-query regressions/improvements beyond 20%,
so a round's perf work (or regressions) is visible at a glance.
"""
import json
import sys


def load(path: str) -> dict:
    with open(path) as f:
        return json.load(f)


def main(old_path: str, new_path: str) -> int:
    old, new = load(old_path), load(new_path)
    # SPARK_GRAFT_BENCH_ONLY runs write a marked partial record; a subset
    # total is meaningless against a full record (or a different subset) —
    # refuse rather than print a bogus ratio (the check.py stale-partial
    # refusal, applied to bench records).
    os_sub, ns_sub = old.get("subset"), new.get("subset")
    if os_sub != ns_sub:
        print(f"FAIL: subset mismatch — {old_path} subset={os_sub!r}, "
              f"{new_path} subset={ns_sub!r}; totals are not comparable "
              f"across different query sets")
        return 1
    if os_sub is not None:
        print(f"(comparing PARTIAL records, subset={os_sub})")
    print(f"total: {old['value']:.2f}s -> {new['value']:.2f}s "
          f"({new['value'] / max(old['value'], 1e-9):.2f}x)")
    oq, nq = old["queries"], new["queries"]
    rows = []
    for name in sorted(set(oq) | set(nq)):
        a, b = oq.get(name), nq.get(name)
        if a is None:
            rows.append((float("inf"), f"  NEW   {b:7.2f}s  {name}"))
        elif b is None:
            rows.append((0.0, f"  GONE  ({a:.2f}s)  {name}"))
        elif b > a * 1.2 or a > b * 1.2:
            rows.append((b / max(a, 1e-9),
                         f"  {a:7.2f}s -> {b:7.2f}s ({b / max(a, 1e-9):4.2f}x)  {name}"))
    for _, line in sorted(rows, key=lambda r: -r[0]):
        print(line)
    if not rows:
        print("  (no per-query change beyond 20%)")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
