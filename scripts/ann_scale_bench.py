"""At-scale ANN record: IVF search over a >=10^6-vector deterministic
synthetic corpus, recall measured against the exact BLAS brute-force
baseline on a 10^3-query sample (r4 judge item #5 — gives ivf_knn the
same at-scale record the dedup family got in round 4).

Corpus (pure column expressions, generated distributedly, identical at
any parallelism — the dedup_scale_bench fixture discipline applied to
vectors): n_clusters centers, each component a hash-derived value in
[-1, 1); vector i = center(i % n_clusters) + noise_scale * hash-noise.
Cluster structure is what IVF exploits, hash noise keeps every vector
unique, and nothing depends on numpy RNG state or row order.

Stages timed (mirroring ivf_knn's composition train -> assign ->
probe/re-rank), plus the brute-force ground truth and recall@k:

  corpus_build     spark.range -> arrays, localCheckpoint
  ivf_e2e          ivf_knn() end-to-end (train + assign + probe)
  brute_force      brute_force_knn_arrow() on the same queries
  recall@k         |IVF top-k ∩ exact top-k| / |exact top-k|

Usage:
  python scripts/ann_scale_bench.py --vectors 1000000          # the record
  python scripts/ann_scale_bench.py --vectors 50000 --queries 50 --no-bench-md
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def synth_vectors(spark, n: int, dim: int, n_clusters: int,
                  noise: float, partitions: int):
    """(vec_id, embedding: array<double>) — deterministic clustered
    corpus from pure built-ins (xxhash64 -> [-1,1) components)."""
    d = spark.range(n).repartition(partitions, "id").select(
        F.col("id").alias("vec_id")
    )
    cid = F.col("vec_id") % n_clusters
    j = F.sequence(F.lit(0), F.lit(dim - 1))
    unit = lambda h: (F.pmod(h, F.lit(2_000_000)) / F.lit(1_000_000.0)) - F.lit(1.0)
    comp = F.transform(
        j,
        lambda i: unit(F.xxhash64(cid * dim + i))
        + F.lit(noise) * unit(F.xxhash64(F.col("vec_id") * dim + i, F.lit(7))),
    )
    return d.select("vec_id", comp.alias("embedding"))


def _cpu_ticks():
    with open("/proc/stat") as f:
        vals = [float(x) for x in f.readline().split()[1:]]
    return (vals[7] if len(vals) > 7 else 0.0), sum(vals[:8])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--vectors", type=int, default=1_000_000)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--clusters", type=int, default=200)
    ap.add_argument("--noise", type=float, default=0.25)
    ap.add_argument("--queries", type=int, default=1000)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--n-lists", type=int, default=256)
    ap.add_argument("--n-probe", type=int, default=16)
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--no-bench-md", action="store_true")
    args = ap.parse_args()

    from olive_spark.metrics import SuperstepMetricsCollector
    from olive_spark.pipeline.similarity import brute_force_knn_arrow, ivf_knn
    from olive_spark.session import get_spark

    parts = max(8, args.cpus * 2)
    spark = get_spark(app_name="ann_scale_bench",
                      master=f"local[{args.cpus}]", shuffle_partitions=parts)
    coll = SuperstepMetricsCollector(spark, prefix="ann-scale-")
    coll.tag(0)

    s0, t0c = _cpu_ticks()
    timings: dict[str, float] = {}
    t0 = time.monotonic()
    corpus = synth_vectors(spark, args.vectors, args.dim, args.clusters,
                           args.noise, parts).localCheckpoint(eager=True)
    # query sample: every (n/queries)-th vector — deterministic, spans
    # all clusters
    stride = max(1, args.vectors // args.queries)
    queries = corpus.filter(F.col("vec_id") % stride == 0).limit(args.queries)
    queries = queries.localCheckpoint(eager=True)
    n_q = queries.count()
    timings["corpus_build"] = round(time.monotonic() - t0, 2)

    t0 = time.monotonic()
    approx = ivf_knn(corpus, queries, k=args.k, n_lists=args.n_lists,
                     n_probe=args.n_probe).localCheckpoint(eager=True)
    n_approx = approx.count()
    timings["ivf_e2e"] = round(time.monotonic() - t0, 2)

    t0 = time.monotonic()
    exact = brute_force_knn_arrow(corpus, queries, k=args.k)
    exact = exact.localCheckpoint(eager=True)
    n_exact = exact.count()
    timings["brute_force"] = round(time.monotonic() - t0, 2)

    hit = approx.select("query_id", "vec_id").intersect(
        exact.select("query_id", "vec_id")
    ).count()
    recall = hit / max(n_exact, 1)

    m = coll.collect(0)
    coll.clear()
    s1, t1c = _cpu_ticks()

    out = {
        "vectors": args.vectors, "dim": args.dim,
        "clusters": args.clusters, "noise": args.noise,
        "queries": n_q, "k": args.k,
        "n_lists": args.n_lists, "n_probe": args.n_probe,
        "ivf_rows": n_approx, "exact_rows": n_exact,
        "recall_at_k": round(recall, 4),
        "timings_sec": timings,
        "total_sec": round(sum(timings.values()), 2),
        "shuffle_read_bytes": m.get("shuffle_read_bytes"),
        "shuffle_write_bytes": m.get("shuffle_write_bytes"),
        "steal_frac": round((s1 - s0) / max(t1c - t0c, 1.0), 4),
        "load_avg_1m": round(os.getloadavg()[0], 2),
        "cpus": args.cpus,
    }
    print(json.dumps(out))
    if recall < 0.8:
        raise SystemExit(f"FAIL: recall {recall:.3f} < 0.8")

    if not args.no_bench_md:
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        stamp = time.strftime("%Y-%m-%d %H:%M:%S")
        frac = args.n_probe / args.n_lists
        with open(os.path.join(repo, "BENCH.md"), "a") as fh:
            fh.write(
                f"\n## ANN at scale {stamp} ({args.vectors:,} vectors x "
                f"{args.dim} dims, local[{args.cpus}])\n\n"
                f"ivf_knn(n_lists={args.n_lists}, n_probe={args.n_probe}) "
                f"vs brute_force_knn_arrow on {n_q:,} queries, k={args.k}.\n\n"
                f"| stage | sec |\n|---|---|\n"
                + "".join(f"| {k} | {v} |\n" for k, v in timings.items())
                + f"\n**recall@{args.k} = {recall:.4f}** (target >= 0.8) "
                f"while scanning ~{frac:.1%} of the corpus per query "
                f"(n_probe/n_lists). Shuffle read/write "
                f"{m.get('shuffle_read_bytes')}/"
                f"{m.get('shuffle_write_bytes')} bytes. "
                f"steal={out['steal_frac']:.1%}, "
                f"load_1m={out['load_avg_1m']}.\n"
            )


if __name__ == "__main__":
    main()
