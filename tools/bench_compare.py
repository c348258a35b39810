#!/usr/bin/env python3
"""Compare two Bench JSON lines (same commit, back-to-back runs) against
the round-6 reproducibility criterion: a query "regressed" only when it
moved BOTH >20% relative AND >100 ms absolute.

Rationale: on a shared 32-core host the per-rep noise floor is
~±50-100 ms of scheduler/GC jitter regardless of query cost (measured:
same-commit min-of-5 pairs agree on totals within 2% while individual
0.2-0.5 s queries swing 25%). A 100 ms delta on a 250 ms query is not a
regression signal; a 100 ms delta on a 5 s query is invisible at 20%.
The round-5 failure mode this criterion exists to catch — multi-second
swings on untouched code (q6 1.59→3.89 s) — trips both bounds.

Usage: bench_compare.py runA.json runB.json [rel_tol] [abs_tol_sec]
"""
import json
import sys


def load(path):
    with open(path) as f:
        return json.loads(f.read().strip())


def main():
    a, b = load(sys.argv[1]), load(sys.argv[2])
    rel_tol = float(sys.argv[3]) if len(sys.argv) > 3 else 0.20
    abs_tol = float(sys.argv[4]) if len(sys.argv) > 4 else 0.10
    qa, qb = a["queries"], b["queries"]
    common = sorted(set(qa) & set(qb))
    bad = []
    print(f"total: {a['value']:.3f}s vs {b['value']:.3f}s "
          f"({abs(a['value'] - b['value']) / max(a['value'], b['value']):+.1%})")
    for q in common:
        x, y = qa[q], qb[q]
        rel = abs(x - y) / max(x, y) if max(x, y) > 0 else 0.0
        dev = rel > rel_tol and abs(x - y) > abs_tol
        if dev or rel > rel_tol:
            print(f"  {q:28s} {x:7.3f} {y:7.3f} {rel:6.1%} "
                  f"{'REGRESSION-SIGNAL' if dev else 'jitter'}")
        if dev:
            bad.append(q)
    print(f"== {len(common) - len(bad)}/{len(common)} reproducible "
          f"(>{rel_tol:.0%} AND >{abs_tol * 1000:.0f}ms = signal) ==")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
