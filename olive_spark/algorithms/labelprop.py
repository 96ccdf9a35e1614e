"""Synchronous label propagation (community detection flavor).

Not in the reference repo; included per the north rule. Same
edge-phase/vertex-phase skeleton as the other apps, but the reduce is a
frequency-argmax rather than a single commutative aggregate, expressed
with the ``agg_df`` escape hatch as ONE built-in aggregation (r6):

    msgs(id, label) -> groupBy(id).agg(mode(label, deterministic=True))

``mode(col, True)`` is Spark's typed-imperative frequency-argmax whose
tie-break (greatest frequency, then LOWEST value) is exactly this
algorithm's contract: higher count wins; equal counts -> smallest
label. With a fixed iteration count the algorithm is fully
deterministic (synchronous updates, no RNG), matching
olive_spark.oracle.label_propagation.

Scale: ONE shuffle per superstep with map-side partial aggregation (the
ObjectHashAggregate buffers are per-id label->count maps — the same
per-partition (id,label) state the old two-groupBy formulation held,
merged map-side before the exchange, so hub skew still collapses before
the shuffle). The old shape — groupBy(id, label).count() then max_by —
paid a second exchange + aggregate pair per superstep for the same
result; fresh-JVM A/B at sf0.1 (OPTIMIZATION_r06.md): cold 7.9-8.9s ->
5.3-5.6s, warm ~3.1 -> ~2.7s, outputs exactly equal; raising
spark.sql.objectHashAggregate.sortBased.fallbackThreshold showed no
additional win (clean reps at parity-to-worse), so the default
sort-based fallback stays — it is also the memory-safety story at
100TB group counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from olive_spark.graph import Graph
from olive_spark.pregel import ACCUM, PregelProgram, PregelResult, pregel, src


def _mode_agg(msgs: DataFrame) -> DataFrame:
    # frequency-argmax in ONE exchange: mode(col, deterministic=True)
    # returns the most frequent label, ties -> lowest label — the exact
    # (cnt desc, label asc) tie-break the old two-groupBy shape
    # (groupBy(id, g).count() -> max_by((cnt, -g))) computed with a
    # second exchange (r6; A/B + exact-equality evidence in the module
    # docstring).
    return msgs.groupBy("id").agg(F.mode("g", True).alias("accum"))


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
