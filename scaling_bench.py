"""Scaling-efficiency evidence: the same PageRank job at two
parallelism levels (N and 4N cores) on identical input.

The north rule requires throughput scaling efficiency >= 0.8 from N to
4N executors; no real cluster exists in this sandbox, so we evidence it
as the driver instructs: local[8] vs local[32] on the same
deterministic input, each in a fresh JVM (subprocess), medians over
repeats. Writes results to stdout (JSON) and appends a table to
BENCH.md.

efficiency = throughput(4N) / (4 * throughput(N)),
throughput in edges/sec per superstep.

Usage: python scaling_bench.py [--edges 4000000] [--iters 5] [--repeats 3]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import time

WORKER = """
import json, os, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from olive_spark.session import get_spark
from olive_spark.algorithms.pagerank import pagerank_fixed
from bench import synth_power_graph

cpus = int(sys.argv[1]); n_edges = int(sys.argv[2]); iters = int(sys.argv[3])
spark = get_spark(app_name=f"scale{{cpus}}", master=f"local[{{cpus}}]",
                  shuffle_partitions=max(8, cpus))
g = synth_power_graph(spark, n_edges, n_edges // 8, max(8, cpus))
m = g.edge_count(); g.degrees().count()
# warmup superstep (JIT/codegen/cache), excluded from timing
pagerank_fixed(g, iterations=1)
t0 = time.monotonic()
res = pagerank_fixed(g, iterations=iters)
res.state.agg(F.sum("rank")).collect()
dt = time.monotonic() - t0
print(json.dumps({{"cpus": cpus, "edges": m, "iters": iters, "sec": dt,
                   "eps": m * iters / dt}}))
"""


def run_once(repo: str, cpus: int, edges: int, iters: int) -> dict:
    script = WORKER.format(repo=repo)
    out = subprocess.run(
        [sys.executable, "-c", script, str(cpus), str(edges), str(iters)],
        capture_output=True, text=True, check=True,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--edges", type=int, default=4_000_000)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--low", type=int, default=8)
    ap.add_argument("--high", type=int, default=32)
    args = ap.parse_args()
    repo = os.path.dirname(os.path.abspath(__file__))

    results = {}
    for cpus in (args.low, args.high):
        runs = [run_once(repo, cpus, args.edges, args.iters)
                for _ in range(args.repeats)]
        eps = statistics.median(r["eps"] for r in runs)
        results[cpus] = {"median_eps": eps, "runs": runs}

    ratio = args.high / args.low
    eff = results[args.high]["median_eps"] / (ratio * results[args.low]["median_eps"])
    summary = {
        "edges": args.edges,
        "iters": args.iters,
        "repeats": args.repeats,
        f"eps_local{args.low}": round(results[args.low]["median_eps"], 1),
        f"eps_local{args.high}": round(results[args.high]["median_eps"], 1),
        "core_ratio": ratio,
        "scaling_efficiency": round(eff, 3),
        "meets_0.8": eff >= 0.8,
    }
    print(json.dumps(summary))

    stamp = time.strftime("%Y-%m-%d %H:%M:%S")
    with open(os.path.join(repo, "BENCH.md"), "a") as fh:
        fh.write(
            f"\n## Scaling run {stamp}\n\n"
            f"| config | median edges/sec/superstep |\n|---|---|\n"
            f"| local[{args.low}] | {summary[f'eps_local{args.low}']:,} |\n"
            f"| local[{args.high}] | {summary[f'eps_local{args.high}']:,} |\n\n"
            f"PageRank, {args.iters} supersteps, {args.edges:,}-edge synthetic "
            f"power-law graph (identical deterministic input), median of "
            f"{args.repeats} fresh-JVM runs, 1 warmup superstep excluded.\n\n"
            f"**efficiency = {summary['scaling_efficiency']}** "
            f"(= eps_high / ({ratio:.0f} x eps_low)); target >= 0.8: "
            f"{'MET' if summary['meets_0.8'] else 'NOT MET'}.\n"
        )


if __name__ == "__main__":
    main()
