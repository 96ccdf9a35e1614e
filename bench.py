"""Benchmark harness — one JSON line on stdout.

Runs the headline graph workloads at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] (default 32):

- pagerank10_tpch: 10 supersteps over the testdata bipartite graph.
- pagerank5_power: 5 supersteps over a deterministic synthetic
  power-law graph (hash-generated, ~4M edges) — the skew-shaped
  workload the 100TB design point cares about; the headline
  edges/sec-per-superstep metric comes from this run.
- cc_converged / labelprop3 / bfs / triangles over the tripartite graph.
- ingest: synthetic page table -> Arrow-UDF link extraction ->
  resolved graph -> degrees (the production input path).

Output: {"metric": "edges_per_sec_per_superstep", "value": N,
         "unit": "sec", "queries": {name: seconds}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
POWER_EDGES = int(os.environ.get("OLIVE_BENCH_EDGES", str(4_000_000)))
POWER_VERTS = POWER_EDGES // 8


def synth_power_graph(spark, n_edges: int, n_vertices: int, partitions: int):
    """Deterministic hash-generated power-law-ish multigraph.

    src ~ uniform(V); dst = floor(V * u^3) — heavy mass near 0 (hubs).
    Pure column expressions over spark.range: generated distributedly,
    identical across runs and parallelism levels.
    """
    from olive_spark.graph import Graph

    e = spark.range(n_edges)
    u_src = (F.pmod(F.xxhash64(F.col("id") * 2 + 1), F.lit(1_000_003)) / 1_000_003.0)
    u_dst = (F.pmod(F.xxhash64(F.col("id") * 2), F.lit(1_000_003)) / 1_000_003.0)
    edges = e.select(
        F.floor(u_src * n_vertices).cast("long").alias("src"),
        F.floor(F.pow(u_dst, F.lit(3.0)) * n_vertices).cast("long").alias("dst"),
        F.lit(1.0).alias("weight"),
    )
    verts = spark.range(n_vertices).select(F.col("id").cast("long").alias("id"))
    return Graph.from_edges(spark, edges, vertices=verts, num_partitions=partitions)


def main():
    from olive_spark.session import get_spark
    from olive_spark.algorithms.pagerank import pagerank_fixed
    from olive_spark.algorithms.cc import connected_components
    from olive_spark.algorithms.labelprop import label_propagation
    from olive_spark.algorithms.bfs import bfs
    from olive_spark.algorithms.triangles import triangle_count
    from olive_spark.ingest.resolve import testdata_graph, testdata_tri_graph
    from olive_spark.ingest.pages import synth_pages
    from olive_spark.ingest.resolve import build_graph_from_pages
    from olive_spark.fixtures import chain_graph

    spark = get_spark(app_name="olive_bench", master=f"local[{CPUS}]",
                      shuffle_partitions=max(8, CPUS))
    timings: dict[str, float] = {}
    extras: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.monotonic()
        out = fn()
        timings[name] = round(time.monotonic() - t0, 3)
        return out

    # -- tpch-derived bipartite graph, 10 PR supersteps -------------------
    g_bi = testdata_graph(spark, SF_DIR)
    bi_edges = g_bi.edge_count()  # materializes cache
    g_bi.degrees().count()
    pagerank_fixed(g_bi, iterations=1).free()  # warmup: codegen + join paths

    def run_pr_tpch():
        res = pagerank_fixed(g_bi, iterations=10)
        res.state.agg(F.sum("rank")).collect()
        res.free()
        return res

    timed("pagerank10_tpch", run_pr_tpch)

    # -- synthetic power-law graph, 5 PR supersteps (headline) ------------
    g_pow = synth_power_graph(spark, POWER_EDGES, POWER_VERTS, max(8, CPUS))
    pow_edges = g_pow.edge_count()
    g_pow.degrees().count()
    pagerank_fixed(g_pow, iterations=1).free()  # warmup

    def run_pr_power():
        res = pagerank_fixed(g_pow, iterations=5)
        res.state.agg(F.sum("rank")).collect()
        res.free()
        return res

    timed("pagerank5_power", run_pr_power)
    eps = pow_edges * 5 / timings["pagerank5_power"]
    extras["edges_per_sec_per_superstep_power"] = round(eps, 1)
    extras["edges_per_sec_per_superstep_tpch"] = round(
        bi_edges * 10 / timings["pagerank10_tpch"], 1
    )

    # -- tripartite graph workloads --------------------------------------
    g_tri = testdata_tri_graph(spark, SF_DIR)
    g_tri.edge_count()

    timed("cc_converged", lambda: connected_components(g_tri).state.count())
    timed("labelprop3", lambda: label_propagation(g_tri, iterations=3).state.count())
    timed("bfs", lambda: bfs(g_tri, source=0).state.count())
    timed("triangles", lambda: triangle_count(g_tri))

    # -- HITS: the bidirectional-join workload (auth along forward edges,
    # hub along reverse) over the bipartite graph ------------------------
    from olive_spark.algorithms.hits import hits

    timed("hits3_tpch", lambda: hits(g_bi, iterations=3).count())

    # -- ingest path ------------------------------------------------------
    def run_ingest():
        n, e = chain_graph(20_000)
        pages = synth_pages(spark, n, e, num_partitions=max(8, CPUS))
        graph, _ = build_graph_from_pages(spark, pages, id_method="hash",
                                          num_partitions=max(8, CPUS))
        return graph.degrees().count()

    timed("ingest20k", run_ingest)

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "edges_per_sec_per_superstep",
        "value": extras["edges_per_sec_per_superstep_power"],
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR,
        "total_sec": total,
        "cpus": CPUS,
        "power_graph_edges": pow_edges,
        "tpch_graph_edges": bi_edges,
        **extras,
    }))


if __name__ == "__main__":
    main()
