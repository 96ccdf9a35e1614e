"""Controlled bench re-measure: n fresh-JVM runs of bench.py, per-query
medians (round-2 judge item #2 — single driver-bench runs at sf0.1 are
load-noise-dominated on this shared host: the same hits3 workload
measured 17.7s and 3.8s hours apart with no code change).

Each repeat is a fresh subprocess (the scaling_bench subprocess
pattern): fresh JVM, fresh codegen, fresh page cache state. Medians per
query + the headline eps are printed as one JSON line and appended to
BENCH.md.

Usage: python scripts/bench_median.py [--repeats 3]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import time


def run_once(repo: str) -> dict:
    # --once: bench.py's default mode is now itself the median protocol
    # (it orchestrates fresh-JVM repeats); this script drives the inner
    # single-shot mode directly to keep its own interleaving.
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "bench.py"), "--once"],
        capture_output=True, text=True, check=True, cwd=repo,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    runs = []
    for i in range(args.repeats):
        r = run_once(repo)
        runs.append(r)
        print(f"# run {i + 1}/{args.repeats}: value={r['value']} "
              f"queries={r['queries']}", file=sys.stderr)

    queries = sorted(runs[0]["queries"])
    med = {q: round(statistics.median(r["queries"][q] for r in runs), 3)
           for q in queries}
    summary = {
        "repeats": args.repeats,
        "median_value": round(statistics.median(r["value"] for r in runs), 1),
        "best_value": round(max(r["value"] for r in runs), 1),
        "median_queries": med,
        "min_queries": {q: round(min(r["queries"][q] for r in runs), 3)
                        for q in queries},
        "sf": runs[0]["sf"],
        "cpus": runs[0]["cpus"],
    }
    print(json.dumps(summary))

    stamp = time.strftime("%Y-%m-%d %H:%M:%S")
    with open(os.path.join(repo, "BENCH.md"), "a") as fh:
        fh.write(
            f"\n## Controlled median bench {stamp} "
            f"(n={args.repeats} fresh-JVM runs, interleaved sequentially)\n\n"
            f"| query | median sec | min sec | per-run sec |\n|---|---|---|---|\n"
        )
        for q in queries:
            per = [round(r["queries"][q], 2) for r in runs]
            fh.write(f"| {q} | {med[q]} | {summary['min_queries'][q]} | {per} |\n")
        fh.write(
            f"\nheadline eps median {summary['median_value']:,} "
            f"(best {summary['best_value']:,}), sf={summary['sf']}, "
            f"cpus={summary['cpus']}.\n"
        )


if __name__ == "__main__":
    main()
