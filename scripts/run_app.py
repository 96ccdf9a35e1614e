"""spark-submit entry point for the link-graph apps.

Ship the package and run any app on a cluster:

    cd /root/repo && zip -qr /tmp/olive_spark.zip olive_spark
    spark-submit --py-files /tmp/olive_spark.zip scripts/run_app.py \
        pagerank --edges /data/edges.parquet --vertices /data/verts.parquet \
        --output /data/ranks --checkpoint-dir /data/ckpt --resume

Apps: pagerank | cc | labelprop | bfs | sssp | triangles | ingest.
Input is either a parquet edge table (--edges [+ --vertices]) or a
pages table (--pages) for the full web ingest path. Every iterative
app supports --checkpoint-dir/--resume (per-superstep durable
snapshots + per-partition lineage). Mirrors the reference app mains
(PageRank.cu:89-145, BFS.cu:82-160, SSSP.cu:106-175): parse args ->
load graph -> superstep loop -> dump vertex values.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="olive_spark link-graph apps")
    p.add_argument("app", choices=["pagerank", "cc", "labelprop", "bfs", "sssp",
                                   "triangles", "ingest", "hits", "ppr",
                                   "kcore", "hostgraph"])
    p.add_argument("--edges", help="parquet edge table (src,dst[,weight])")
    p.add_argument("--vertices", help="parquet vertex table (id); else derived")
    p.add_argument("--pages", help="parquet/iceberg pages table (url,warc_ts,html,text,lang)")
    p.add_argument("--output", required=True)
    p.add_argument("--checkpoint-dir")
    p.add_argument("--run-id", default="run0")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--checkpoint-every", type=int, default=1)
    p.add_argument("--partitions", type=int, default=None)
    p.add_argument("--iterations", type=int, default=None)
    p.add_argument("--source", type=int, default=0, help="bfs/sssp source (-s)")
    p.add_argument("--damping", type=float, default=0.85)
    p.add_argument("--epsilon", type=float, default=1e-7)
    p.add_argument("--id-method", choices=["sort", "hash"], default="hash")
    p.add_argument("--variant", choices=["default", "stars"], default="default",
                   help="cc: stars = O(log n) large/small-star contraction")
    p.add_argument("--weighted", action="store_true",
                   help="sssp: force double-valued distances (auto-detected "
                        "for fractional weights)")
    p.add_argument("--sources", default="0",
                   help="ppr: comma-separated seed vertex ids")
    p.add_argument("--k", type=int, default=2, help="kcore: minimum degree")
    return p



def _iters(args, default: int) -> int:
    """--iterations with an explicit 0 honored (``or`` would treat 0 as
    unset and silently run the default)."""
    return default if args.iterations is None else args.iterations


def main(argv=None):
    args = build_parser().parse_args(argv)

    from pyspark.sql import SparkSession

    from olive_spark.graph import Graph
    from olive_spark.checkpoint import CheckpointStore

    # under spark-submit the session already carries cluster config;
    # getOrCreate just attaches
    spark = SparkSession.builder.appName(f"olive_{args.app}").getOrCreate()

    if args.pages:
        from olive_spark.ingest.resolve import build_graph_from_pages

        pages = spark.read.parquet(args.pages)
        if args.app != "hostgraph":  # hostgraph rolls up links directly
            graph, vert_urls = build_graph_from_pages(
                spark, pages, id_method=args.id_method, num_partitions=args.partitions
            )
    elif args.edges:
        edges = spark.read.parquet(args.edges)
        vertices = spark.read.parquet(args.vertices) if args.vertices else None
        graph = Graph.from_edges(spark, edges, vertices=vertices,
                                 num_partitions=args.partitions)
    elif args.app != "ingest":
        raise SystemExit("need --edges or --pages")

    store = None
    if args.checkpoint_dir:
        store = CheckpointStore(spark, args.checkpoint_dir, run_id=args.run_id)
    kw = dict(checkpoint_store=store, checkpoint_every=args.checkpoint_every,
              resume=args.resume)

    t0 = time.monotonic()
    if args.app == "pagerank":
        from olive_spark.algorithms.pagerank import pagerank

        res = pagerank(graph, damping=args.damping, epsilon=args.epsilon,
                       max_iterations=_iters(args, 100), **kw)
        out, meta = res.state, {"supersteps": res.supersteps, "converged": res.converged}
    elif args.app == "cc":
        if args.variant == "stars":
            from olive_spark.algorithms.cc import connected_components_stars

            out = connected_components_stars(graph)
            meta = {"variant": "stars"}
        else:
            from olive_spark.algorithms.cc import connected_components

            res = connected_components(graph, max_iterations=args.iterations, **kw)
            out, meta = res.state, {"supersteps": res.supersteps,
                                    "converged": res.converged}
    elif args.app == "labelprop":
        from olive_spark.algorithms.labelprop import label_propagation

        res = label_propagation(graph, iterations=_iters(args, 10), **kw)
        out, meta = res.state, {"supersteps": res.supersteps}
    elif args.app == "bfs":
        from olive_spark.algorithms.bfs import bfs

        res = bfs(graph, source=args.source, max_iterations=args.iterations, **kw)
        out, meta = res.state, {"supersteps": res.supersteps, "converged": res.converged}
    elif args.app == "sssp":
        from pyspark.sql import functions as F

        from olive_spark.algorithms.sssp import sssp, sssp_weighted

        # int-unit distances silently truncate fractional weights
        # (edge('weight').cast('long')): dispatch on integrality.
        frac = graph.edges.filter(
            F.col("weight") != F.floor("weight").cast("double")
        ).limit(1).count()
        if frac or args.weighted:
            res = sssp_weighted(graph, source=args.source,
                                max_iterations=args.iterations, **kw)
        else:
            res = sssp(graph, source=args.source, unit_weights=False,
                       max_iterations=args.iterations, **kw)
        out, meta = res.state, {
            "supersteps": res.supersteps,
            "converged": res.converged,
            "weighted": bool(frac or args.weighted),
            "negative_cycle_suspected": res.negative_cycle_suspected,
        }
    elif args.app == "triangles":
        from olive_spark.algorithms.triangles import triangle_count

        per, total = triangle_count(graph)
        out, meta = per, {"total_triangles": total}
    elif args.app == "hits":
        from olive_spark.algorithms.hits import hits

        n_it = _iters(args, 20)
        out = hits(graph, iterations=n_it)
        meta = {"iterations": n_it}
    elif args.app == "ppr":
        from olive_spark.algorithms.pagerank import personalized_pagerank

        seeds = [int(s) for s in args.sources.split(",") if s.strip()]
        res = personalized_pagerank(
            graph, sources=seeds, damping=args.damping, epsilon=args.epsilon,
            max_iterations=_iters(args, 100), **kw)
        out, meta = res.state, {"supersteps": res.supersteps,
                                "converged": res.converged, "sources": seeds}
    elif args.app == "kcore":
        from olive_spark.algorithms.kcore import kcore

        res = kcore(graph, k=args.k, max_rounds=_iters(args, 100))
        out, meta = res.state, {"rounds": res.rounds,
                                "converged": res.converged, "k": args.k}
    elif args.app == "hostgraph":
        if not args.pages:
            raise SystemExit("hostgraph needs --pages")
        from olive_spark.ingest.resolve import host_graph_edges

        out, meta = host_graph_edges(pages), {}
    elif args.app == "ingest":
        if not args.pages:
            raise SystemExit("ingest needs --pages")
        graph.edges.write.mode("overwrite").parquet(f"{args.output}/edges")
        vert_urls.write.mode("overwrite").parquet(f"{args.output}/vertices")
        print(json.dumps({"app": "ingest", "edges": graph.edge_count(),
                          "vertices": graph.vertex_count(),
                          "sec": round(time.monotonic() - t0, 2)}))
        return

    out.write.mode("overwrite").parquet(args.output)
    meta.update({"app": args.app, "sec": round(time.monotonic() - t0, 2),
                 "output": args.output})
    print(json.dumps(meta))


if __name__ == "__main__":
    main()
