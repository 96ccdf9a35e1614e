"""CSR-block fast path vs pure-DataFrame path, measured head-to-head
(round-3 judge item #5: "ONE recorded 128M-edge CSR-vs-DataFrame
measurement to decide whether the path earns its keep").

Both paths run 5 PageRank supersteps on the SAME deterministic
128M-edge / 4M-vertex synthetic power-law graph (the scaling-campaign
input) in fresh JVMs, interleaved df/csr/df/csr so host-load drift
biases both equally; medians over --repeats. The CSR one-time block
build (pack + repartition + cache materialization) is timed separately
from the per-superstep loop — at 100 TB the build amortizes over the
whole convergence run, so both numbers matter.

Appends the verdict to BENCH.md.

Usage: python scripts/csr_vs_df_bench.py [--edges 128000000]
       [--repeats 3] [--cpus 8] [--iters 5]
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
from bench import synth_power_graph

mode = sys.argv[1]; cpus = int(sys.argv[2]); n_edges = int(sys.argv[3])
iters = int(sys.argv[4]); vratio = int(sys.argv[5])
parts = 4 * cpus
extra = {{}}
local_dir = os.environ.get("OLIVE_SPARK_LOCAL_DIR")
if local_dir:
    os.makedirs(local_dir, exist_ok=True)
    extra["spark.local.dir"] = local_dir
spark = get_spark(app_name=f"csrdf-{{mode}}{{cpus}}", master=f"local[{{cpus}}]",
                  shuffle_partitions=parts, extra_conf=extra)
g = synth_power_graph(spark, n_edges, n_edges // vratio, parts)
m = g.edge_count(); g.degrees().count()
build_sec = 0.0
if mode == "csr":
    from olive_spark.csr import build_blocks, pagerank_csr
    t0 = time.monotonic()
    blocks = build_blocks(g)
    blocks.count()  # materialize the cache
    build_sec = time.monotonic() - t0
    pagerank_csr(g, iterations=1, blocks=blocks).unpersist()  # warmup
    t0 = time.monotonic()
    res = pagerank_csr(g, iterations=iters, blocks=blocks)
    res.agg(F.sum("rank")).collect()
    dt = time.monotonic() - t0
    res.unpersist(); blocks.unpersist()
else:
    from olive_spark.algorithms.pagerank import pagerank_fixed
    pagerank_fixed(g, iterations=1).free()  # warmup
    t0 = time.monotonic()
    res = pagerank_fixed(g, iterations=iters)
    res.state.agg(F.sum("rank")).collect()
    dt = time.monotonic() - t0
    res.free()
print(json.dumps({{"mode": mode, "edges": m, "sec": dt,
                   "eps": m * iters / dt, "build_sec": build_sec,
                   "load_1m": os.getloadavg()[0]}}))
"""


def run_once(repo: str, mode: str, cpus: int, edges: int, iters: int, vratio: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", WORKER.format(repo=repo),
         mode, str(cpus), str(edges), str(iters), str(vratio)],
        capture_output=True, text=True, check=True,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--edges", type=int, default=128_000_000)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--vratio", type=int, default=32)
    ap.add_argument("--no-bench-md", action="store_true")
    args = ap.parse_args()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    runs: dict[str, list[dict]] = {"df": [], "csr": []}
    for rep in range(args.repeats):
        for mode in ("df", "csr"):
            r = run_once(repo, mode, args.cpus, args.edges, args.iters, args.vratio)
            runs[mode].append(r)
            print(
                f"# rep {rep + 1}/{args.repeats} {mode}: eps={r['eps']:,.0f} "
                f"sec={r['sec']:.1f} build={r['build_sec']:.1f} "
                f"load_1m={r['load_1m']:.2f}",
                file=sys.stderr, flush=True,
            )

    med = {m: statistics.median(r["eps"] for r in rs) for m, rs in runs.items()}
    best = {m: max(r["eps"] for r in rs) for m, rs in runs.items()}
    build_med = statistics.median(r["build_sec"] for r in runs["csr"])
    summary = {
        "edges": args.edges, "iters": args.iters, "cpus": args.cpus,
        "repeats": args.repeats,
        "df_median_eps": round(med["df"], 1), "csr_median_eps": round(med["csr"], 1),
        "df_best_eps": round(best["df"], 1), "csr_best_eps": round(best["csr"], 1),
        "csr_block_build_sec_median": round(build_med, 2),
        "csr_over_df_median": round(med["csr"] / med["df"], 3),
        "csr_over_df_best": round(best["csr"] / best["df"], 3),
    }
    print(json.dumps(summary))

    if not args.no_bench_md:
        stamp = time.strftime("%Y-%m-%d %H:%M:%S")
        with open(os.path.join(repo, "BENCH.md"), "a") as fh:
            fh.write(
                f"\n## CSR vs DataFrame path {stamp} "
                f"({args.edges:,} edges, local[{args.cpus}], n={args.repeats} "
                f"fresh-JVM interleaved)\n\n"
                f"PageRank {args.iters} supersteps on the scaling-campaign "
                f"graph ({args.edges // args.vratio:,} vertices).\n\n"
                f"| path | median eps | best eps |\n|---|---|---|\n"
                f"| DataFrame | {summary['df_median_eps']:,} | "
                f"{summary['df_best_eps']:,} |\n"
                f"| CSR blocks | {summary['csr_median_eps']:,} | "
                f"{summary['csr_best_eps']:,} |\n\n"
                f"CSR/DF throughput ratio: median "
                f"{summary['csr_over_df_median']}, best "
                f"{summary['csr_over_df_best']}; one-time CSR block "
                f"build+cache {summary['csr_block_build_sec_median']}s "
                f"(amortized over the full convergence run). Per-run eps: "
                f"df={[round(r['eps'] / 1e6, 2) for r in runs['df']]}M, "
                f"csr={[round(r['eps'] / 1e6, 2) for r in runs['csr']]}M; "
                f"per-run load_1m: "
                f"df={[round(r['load_1m'], 2) for r in runs['df']]}, "
                f"csr={[round(r['load_1m'], 2) for r in runs['csr']]}.\n"
            )


if __name__ == "__main__":
    main()
