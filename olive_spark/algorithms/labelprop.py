"""Synchronous label propagation (community detection flavor).

Not in the reference repo; included per the north rule. Same
edge-phase/vertex-phase skeleton as the other apps, but the reduce is a
frequency-argmax rather than a single commutative aggregate, expressed
with the ``agg_df`` escape hatch as two built-in aggregations:

    msgs(id, label) -> groupBy(id, label).count()
                    -> max_by over (count, -label)   [deterministic]

Tie-break: higher count wins; equal counts -> smallest label. With a
fixed iteration count the algorithm is fully deterministic (synchronous
updates, no RNG), matching olive_spark.oracle.label_propagation.

Scale: two shuffles per superstep — (id,label) count then per-id argmax
— both with map-side partial aggregation; the (id,label) key space
spreads hub skew across labels.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from olive_spark.graph import Graph
from olive_spark.pregel import ACCUM, PregelProgram, PregelResult, pregel, src


def _mode_agg(msgs: DataFrame) -> DataFrame:
    counts = msgs.groupBy("id", "g").agg(F.count("*").alias("cnt"))
    # argmax by (cnt desc, label asc): max_by with a sortable struct —
    # (cnt, -label) lexicographic max == deterministic tie-break.
    return counts.groupBy("id").agg(
        F.max_by("g", F.struct(F.col("cnt"), (-F.col("g")).alias("neg"))).alias("accum")
    )


def label_propagation(
    graph: Graph,
    iterations: int = 10,
    symmetrize: bool = True,
    checkpoint_store=None,
    checkpoint_every: int = 1,
    resume: bool = False,
) -> PregelResult:
    """Exactly `iterations` synchronous rounds; vertices with no
    neighbors keep their own label."""
    g = graph.symmetrized() if symmetrize else graph
    program = PregelProgram(
        init={"label": F.col("id")},
        gather=src("label"),
        agg=None,
        agg_df=_mode_agg,
        update={"label": ACCUM()},
        cond=None,
        accum_default=None,  # no neighbors -> keep label (cond AND not-null)
        full_frontier=True,
    )
    # the symmetrized closure is memoized on `graph` (shared with CC
    # etc.); graph.unpersist() releases it (two-probe alternative
    # rejected in r6 — see cc.py / OPTIMIZATION_r06.md)
    return pregel(g, program, max_iterations=iterations,
                  checkpoint_store=checkpoint_store, checkpoint_every=checkpoint_every,
                  resume=resume)
