#!/usr/bin/env python3
"""Compare two Bench JSON lines (same commit, back-to-back runs) against
the round-6 reproducibility criterion: per-query medians within +/-20%.

Usage: bench_compare.py runA.json runB.json [tolerance]
Exits 1 if any query with a meaningful runtime (>= 0.2 s in either run)
deviates more than the tolerance; sub-0.2 s queries are reported but not
gated (absolute jitter of ~40 ms dominates relative deltas there).
"""
import json
import sys


def load(path):
    with open(path) as f:
        return json.loads(f.read().strip())


def main():
    a, b = load(sys.argv[1]), load(sys.argv[2])
    tol = float(sys.argv[3]) if len(sys.argv) > 3 else 0.20
    qa, qb = a["queries"], b["queries"]
    common = sorted(set(qa) & set(qb))
    bad = []
    print(f"total: {a['value']:.3f}s vs {b['value']:.3f}s "
          f"({abs(a['value'] - b['value']) / max(a['value'], b['value']):+.1%})")
    for q in common:
        x, y = qa[q], qb[q]
        rel = abs(x - y) / max(x, y) if max(x, y) > 0 else 0.0
        gated = max(x, y) >= 0.2
        flag = "GATED-FAIL" if (rel > tol and gated) else (
            "jitter" if rel > tol else "ok")
        if rel > tol or not gated:
            print(f"  {q:28s} {x:7.3f} {y:7.3f} {rel:6.1%} {flag}")
        if rel > tol and gated:
            bad.append(q)
    print(f"== {len(common) - len(bad)}/{len(common)} within {tol:.0%} "
          f"(gated at >=0.2s) ==")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
