"""Connected components via min-label propagation (north rule).

Not in the reference repo, but it is the identical operator skeleton as
BFS/SSSP (SSSP.cu:54-76 with `label` for `distance` — SURVEY.md §7 M1):
- closure: undirected (edges ∪ reversed), FIXTURES.md cc_out
- init: label = id, all vertices active
- gather: src.label            reduce: min     cond: accum < label
- terminate on empty frontier -> label = min id reachable = component.

Converges in O(diameter) supersteps. For high-diameter graphs at scale,
pair with the large-star/small-star contraction variant (future work);
the frontier shrinks monotonically so late supersteps broadcast tiny
frontiers against the cached edge table.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from olive_spark.graph import Graph
from olive_spark.pregel import ACCUM, PregelProgram, PregelResult, pregel, src


def connected_components(
    graph: Graph,
    max_iterations: int | None = None,
    symmetrize: bool = True,
    checkpoint_store=None,
    checkpoint_every: int = 1,
    resume: bool = False,
) -> PregelResult:
    g = graph.symmetrized() if symmetrize else graph
    if max_iterations is None:
        max_iterations = graph.vertex_count() + 1
    program = PregelProgram(
        init={"component": F.col("id")},
        gather=src("component"),
        agg=F.min,
        update={"component": ACCUM()},
        cond=ACCUM() < F.col("component"),
        accum_default=None,
        full_frontier=False,
    )
    res = pregel(g, program, max_iterations=max_iterations,
                 checkpoint_store=checkpoint_store, checkpoint_every=checkpoint_every,
                 resume=resume)
    if symmetrize:
        g.unpersist()
    return res


def connected_components_fixed(graph: Graph, iterations: int) -> PregelResult:
    """Exactly `iterations` synchronous min-label rounds (oracle parity)."""
    g = graph.symmetrized()
    program = PregelProgram(
        init={"component": F.col("id")},
        gather=src("component"),
        agg=F.min,
        update={"component": ACCUM()},
        cond=ACCUM() < F.col("component"),
        accum_default=None,
        full_frontier=True,  # fixed rounds: no frontier, no early stop
    )
    res = pregel(g, program, max_iterations=iterations)
    g.unpersist()
    return res
