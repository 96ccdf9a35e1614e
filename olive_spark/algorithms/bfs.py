"""BFS levels with exact reference semantics (BFS.cu).

- init: level = INF (0x7fffffff) except source = 0  (BFS.cu:101-114)
- gather: src.level + 1                              (BFS_edge_F, BFS.cu:48-50)
- reduce: overwrite w/ benign race -> deterministically F.min
  (all competing values equal anyway: level+1)       (BFS.cu:52-55)
- cond: level == INF                                 (BFS_cond_F, BFS.cu:66-69)
- frontier: newly-levelled vertices; terminate on empty frontier
  (BFS.cu:142) — the dense->sparse->dense frontier flip of the
  reference collapses to one frontier DataFrame here.

Scale: frontier-driven — small frontiers are broadcast to the cached,
src-partitioned edge table (no shuffle of the big side).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from olive_spark.graph import Graph
from olive_spark.pregel import ACCUM, PregelProgram, PregelResult, pregel, src

INF32 = 2147483647


def bfs(graph: Graph, source: int, max_iterations: int | None = None,
        checkpoint_store=None, checkpoint_every: int = 1,
        resume: bool = False) -> PregelResult:
    if max_iterations is None:
        max_iterations = graph.vertex_count() + 1
    program = PregelProgram(
        init={
            "level": F.when(F.col("id") == source, F.lit(0)).otherwise(F.lit(INF32)).cast("long"),
            "_active": F.col("id") == source,
        },
        gather=src("level") + F.lit(1),
        agg=F.min,
        update={"level": ACCUM()},
        cond=F.col("level") == INF32,
        accum_default=None,  # no message -> no update (cond AND accum not null)
        full_frontier=False,
    )
    return pregel(graph, program, max_iterations=max_iterations,
                  checkpoint_store=checkpoint_store, checkpoint_every=checkpoint_every,
                  resume=resume)
