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

With 3+ runs, a query is a CONFIRMED signal only if it trips the bound
in EVERY adjacent pairing: measured on this host, single-pair flags are
disjoint between independent pairs (pure noise — a real regression
reproduces in all of them). Protocol: run the bench twice; if a pair
flags queries, run a third and require the flag to survive.

Usage: bench_compare.py run1.json run2.json [run3.json ...]
       [--rel 0.20] [--abs 0.10]
"""
import json
import sys


def load(path):
    with open(path) as f:
        return json.loads(f.read().strip())


def main():
    # accept both --rel=0.2 and --rel 0.2 (the usage string shows the
    # space form; the old parser only took '=', silently treating the
    # value as a run file)
    args, opts = [], {}
    argv = sys.argv[1:]
    i = 0
    while i < len(argv):
        a = argv[i]
        if a.startswith("--"):
            if "=" in a:
                k, v = a[2:].split("=", 1)
            # a following "--flag" is the NEXT option, not this one's
            # value — without the check `--rel --abs 0.1` died on
            # float('--abs') with a bare traceback
            elif i + 1 < len(argv) and not argv[i + 1].startswith("--"):
                k, v = a[2:], argv[i + 1]
                i += 1
            else:
                sys.exit(f"missing value for {a}")
            if k not in ("rel", "abs"):
                sys.exit(f"unknown option --{k} (valid: --rel, --abs)")
            try:
                opts[k] = float(v)
            except ValueError:
                sys.exit(f"--{k} needs a number, got {v!r}")
        else:
            args.append(a)
        i += 1
    rel_tol = opts.get("rel", 0.20)
    abs_tol = opts.get("abs", 0.10)
    runs = [load(p) for p in args]
    if len(runs) < 2:
        sys.exit("need at least two run files")
    common = sorted(set.intersection(*[set(r["queries"]) for r in runs]))
    # A query present in one run but absent from another is a SIGNAL,
    # not something to silently drop from the intersection: Bench
    # excludes throwing queries from its map and records them in
    # "failed", so a query that STARTS failing between runs would
    # otherwise vanish from the comparison and read as a clean pass.
    union = set.union(*[set(r["queries"]) for r in runs])
    missing_any = False
    for i, r in enumerate(runs):
        absent = sorted(union - set(r["queries"]))
        for q in absent:
            why = "FAILED" if q in set(r.get("failed", [])) else "missing"
            print(f"NOT COMPARABLE: {q} {why} in run{i + 1} ({args[i]})")
            missing_any = True
    totals = [r["value"] for r in runs]
    spread = (max(totals) - min(totals)) / max(totals)
    print("totals: " + " ".join(f"{t:.3f}" for t in totals)
          + f"  (spread {spread:.1%})")

    def flags(a, b):
        out = {}
        for q in common:
            x, y = a["queries"][q], b["queries"][q]
            rel = abs(x - y) / max(x, y) if max(x, y) > 0 else 0.0
            if rel > rel_tol and abs(x - y) > abs_tol:
                out[q] = (x, y, rel)
        return out

    pair_flags = [flags(runs[i], runs[i + 1]) for i in range(len(runs) - 1)]
    for i, pf in enumerate(pair_flags):
        for q, (x, y, rel) in sorted(pf.items()):
            print(f"  pair{i + 1} {q:28s} {x:7.3f} {y:7.3f} {rel:6.1%}")
    # A regression is MONOTONE: it must trip the bound in every pairing
    # AND move the same direction each time. Host-noise bounce flips
    # sign between pairings (measured: runs at totals 27.6/31.9/35.1 s
    # "confirmed" five queries on magnitude alone, every one of them a
    # down-then-up or up-then-down flip) — direction agreement is what
    # separates a code regression from a load swing.
    confirmed = {
        q for q in set.intersection(*[set(pf) for pf in pair_flags])
        if len({pf[q][1] > pf[q][0] for pf in pair_flags}) == 1
    }
    for q in sorted(confirmed):
        print(f"CONFIRMED REGRESSION-SIGNAL: {q}")
    print(f"== {len(common) - len(confirmed)}/{len(common)} reproducible; "
          f"{len(confirmed)} confirmed signal(s) across {len(pair_flags)} "
          f"pairing(s) (>{rel_tol:.0%} AND >{abs_tol * 1000:.0f}ms) ==")
    sys.exit(1 if confirmed or missing_any else 0)


if __name__ == "__main__":
    main()
