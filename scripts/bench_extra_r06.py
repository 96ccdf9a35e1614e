"""Round-6 isolated per-query A/B harness (guide §1.4 discipline).

bench.py is FROZEN for driver measurement; this file reproduces the
isolated measurements cited in OPTIMIZATION_r06.md:

    python scripts/bench_extra_r06.py pagerank_bcast   # broadcast vs shuffle-hash state
    python scripts/bench_extra_r06.py triangles        # cold + steady-state reps
    python scripts/bench_extra_r06.py ingest           # phase-split ingest reps
    python scripts/bench_extra_r06.py hits             # hits reps

Each rep prints wall seconds plus the /proc/stat hypervisor-steal
fraction over the rep window, so dirty-window readings are visible in
the output itself (reps >2% steal should be discarded).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _steal():
    with open("/proc/stat") as f:
        v = [float(x) for x in f.readline().split()[1:]]
    return v[7] if len(v) > 7 else 0.0, sum(v[:8])


def _timed(label, fn):
    s0, t0 = _steal()
    t = time.monotonic()
    fn()
    wall = time.monotonic() - t
    s1, t1 = _steal()
    print(f"{label}: {wall:.2f}s steal={(s1 - s0) / max(t1 - t0, 1):.2%}", flush=True)
    return wall


def _spark():
    from olive_spark.session import get_spark

    return get_spark(
        app_name="bench_extra_r06",
        master=f"local[{CPUS}]",
        shuffle_partitions=max(8, CPUS),
    )


def run_pagerank_bcast():
    """Broadcast vs co-partitioned SHUFFLE_HASH for full-frontier state
    (the r6 broadcast_threshold=100k decision)."""
    from olive_spark.pregel import ACCUM, PregelProgram, pregel, src
    import bench

    spark = _spark()
    g = bench.synth_power_graph(spark, 4_000_000, 500_000, max(8, CPUS))
    g.edge_count()
    g.degrees().count()
    n = g.vertex_count()

    def prog():
        return PregelProgram(
            init={"rank": F.lit(1.0 / n)},
            gather=src("rank") / src("outdeg"),
            agg=F.sum,
            update={"rank": F.lit(0.85) * ACCUM() + F.lit(0.15 / n)},
            cond=None,
            accum_default=0.0,
            full_frontier=True,
        )

    for thr in (1_000_000, 0):
        pregel(g, prog(), max_iterations=1, broadcast_threshold=thr).free()
    for rep in range(3):
        for name, thr in (("broadcast", 1_000_000), ("shuffle_hash", 0)):
            def run():
                r = pregel(g, prog(), max_iterations=5, broadcast_threshold=thr)
                r.state.agg(F.sum("rank")).collect()
                r.free()

            _timed(f"pr5_power_{name}_rep{rep}", run)


def run_triangles():
    from olive_spark.algorithms.triangles import triangle_count
    from olive_spark.ingest.resolve import testdata_tri_graph

    spark = _spark()
    g = testdata_tri_graph(spark, SF_DIR)
    g.edge_count()
    g.vertex_count()
    for rep in range(4):  # rep0 = cold (codegen/planning), rest steady
        _timed(f"triangles_rep{rep}", lambda: triangle_count(g))


def run_ingest():
    from olive_spark.fixtures import chain_graph
    from olive_spark.ingest.pages import synth_pages
    from olive_spark.ingest.resolve import build_graph_from_pages

    spark = _spark()
    for rep in range(3):  # rep0 = cold python workers
        def run():
            n, e = chain_graph(20_000)
            pages = synth_pages(spark, n, e, num_partitions=max(8, CPUS))
            g, _ = build_graph_from_pages(
                spark, pages, id_method="hash", num_partitions=max(8, CPUS)
            )
            g.degrees().count()
            g.unpersist()

        _timed(f"ingest20k_rep{rep}", run)


def run_hits():
    from olive_spark.algorithms.hits import hits
    from olive_spark.ingest.resolve import testdata_graph

    spark = _spark()
    g = testdata_graph(spark, SF_DIR)
    g.edge_count()
    g.degrees().count()
    for rep in range(4):
        _timed(f"hits3_rep{rep}", lambda: hits(g, iterations=3).count())


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    runs = {
        "pagerank_bcast": run_pagerank_bcast,
        "triangles": run_triangles,
        "ingest": run_ingest,
        "hits": run_hits,
    }
    if which == "all":
        for fn in runs.values():
            fn()
    else:
        runs[which]()
