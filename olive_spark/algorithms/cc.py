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
    # NOTE: the symmetrized closure is memoized on `graph` (shared with
    # label propagation etc.); graph.unpersist() releases it. A
    # two-probe alternative (forward cache + reversed layout, messages
    # unioned — message-multiset-identical, half the one-time layout
    # exchange) was A/B'd in r6 and REJECTED: the doubled probe stages
    # cost ~+0.4s/superstep at bench scale, far exceeding the one-time
    # saving (OPTIMIZATION_r06.md "rejected").
    return pregel(g, program, max_iterations=max_iterations,
                  checkpoint_store=checkpoint_store, checkpoint_every=checkpoint_every,
                  resume=resume)


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
    return pregel(g, program, max_iterations=iterations)


def connected_components_stars(
    graph: Graph,
    max_rounds: int = 50,
    symmetrize: bool = True,
    round_metrics: list | None = None,
) -> "DataFrame":
    """Connected components via alternating large-star/small-star
    contraction — O(log n) rounds instead of O(diameter) supersteps.

    The min-label propagation above needs one superstep per hop of the
    component diameter (a 10^6-vertex chain needs 10^6 supersteps); this
    is the standard MapReduce-style cure (Kiveris et al., "Connected
    Components in MapReduce and Beyond", SoCC'14): each round every
    vertex links its larger (resp. not-larger) neighbors directly to its
    minimum neighbor, halving path lengths geometrically until the edge
    set is a star forest rooted at component minima.

    Per round: two groupBy(u).min + join passes over the (shrinking)
    edge set; convergence detected by an order-insensitive checksum of
    the edge multiset (one cheap aggregate action per round).

    Returns a DataFrame (id, component) — exact, same contract as
    `connected_components(...).state`.

    round_metrics: optional caller-supplied list; one dict per
    contraction round is appended ({round, edges, ms}) so scale runs
    can record the O(log n) convergence directly (the per-round edge
    count comes from the convergence checksum — no extra job).
    """
    import time as _time
    from pyspark.sql import DataFrame

    spark = graph.edges.sparkSession
    p = graph.num_partitions

    e = graph.edges.select("src", "dst").filter(F.col("src") != F.col("dst"))
    if symmetrize:
        e = e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    # canonical undirected pairs (u > v): small-star input convention
    edges = (
        e.select(F.greatest("src", "dst").alias("u"), F.least("src", "dst").alias("v"))
        .distinct()
        .repartition(p, "u")
        .localCheckpoint(eager=True)
    )

    def checksum(df: DataFrame):
        row = df.agg(
            F.count("*").alias("n"),
            F.sum(F.xxhash64("u", "v") % F.lit(1_000_000_007)).alias("h"),
        ).first()
        return (row["n"], row["h"])

    def large_star(df: DataFrame) -> DataFrame:
        # neighborhoods over BOTH directions; connect strictly-larger
        # neighbors to min(N(u) ∪ {u})
        sym = df.unionByName(df.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = sym.groupBy("u").agg(F.min("v").alias("mn"))
        mins = mins.select("u", F.least("mn", F.col("u")).alias("m"))
        out = (
            sym.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )
        return out.filter(F.col("u") != F.col("v")).distinct()

    def small_star(df: DataFrame) -> DataFrame:
        # df is canonical (u > v): neighbors-not-larger of u are exactly
        # the v's; connect them (and u) to the minimum
        mins = df.groupBy("u").agg(F.min("v").alias("m"))
        nbrs = df.join(mins, "u").filter(F.col("v") != F.col("m")).select(
            F.col("v").alias("u"), F.col("m").alias("v")
        )
        selfe = mins.select("u", F.col("m").alias("v"))
        out = nbrs.unionByName(selfe)
        return out.filter(F.col("u") != F.col("v")).distinct()

    from olive_spark.pregel import _free_checkpoint, stable_partitioning

    # iterative co-partitioned joins: keep partition counts stable and
    # let the per-round eager localCheckpoints record their hash(u, P)
    # partitioning (see stable_partitioning — under AQE the snapshots
    # report unknown partitioning and every round re-exchanges)
    with stable_partitioning(spark, disable_aqe=True):
        prev_sum = checksum(edges)
        for rnd in range(max_rounds):
            t0 = _time.monotonic()
            ls = large_star(edges)
            ss = small_star(
                ls.select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")).distinct()
            )
            new_edges = (
                ss.select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
                .distinct()
                .repartition(p, "u")
                .localCheckpoint(eager=True)
            )
            new_sum = checksum(new_edges)
            _free_checkpoint(edges)
            edges = new_edges
            if round_metrics is not None:
                round_metrics.append(
                    {
                        "round": rnd + 1,
                        "edges": int(new_sum[0]),
                        "ms": round((_time.monotonic() - t0) * 1000.0, 1),
                    }
                )
            if new_sum == prev_sum:
                break
            prev_sum = new_sum

    # star forest: every u points at its root v; isolated vertices map to self
    roots = edges.groupBy("u").agg(F.min("v").alias("component")).select(
        F.col("u").alias("id"), "component"
    )
    out = (
        graph.vertices.join(roots, "id", "left")
        .select("id", F.coalesce("component", F.col("id")).alias("component"))
    )
    return out
