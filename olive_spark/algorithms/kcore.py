"""k-core decomposition by iterative peeling.

The k-core of a graph is the maximal subgraph in which every vertex
has degree >= k (undirected closure; multigraph semantics — duplicate
edges count multiply, consistent with the engine's edge model,
csrGraph.h:106-171). Standard link-graph primitive (spam-farm and
community detection on web graphs).

Algorithm: synchronous peeling — each round drops every vertex whose
CURRENT degree is < k, then removes its edges, until a fixpoint (or a
caller-fixed round budget, which is what the deterministic contract
query uses: after R rounds the surviving set is well-defined whether
or not the fixpoint was reached).

Scale design (same discipline as the pregel loop):
- per round: ONE groupBy (map-side partial agg) for degrees + two
  semi-joins to drop edges of peeled vertices + ONE count action that
  doubles as the snapshot materialization.
- the edge set shrinks monotonically; lineage is truncated per round
  with lazy localCheckpoint and superseded snapshots are freed.
- peeling rounds are bounded by the degeneracy ordering depth; for a
  bounded-round contract run it is exactly R passes over the
  (shrinking) edge set.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from olive_spark.graph import Graph
from olive_spark.pregel import _free_checkpoint, stable_partitioning


@dataclass
class KCoreResult:
    state: DataFrame  # (id, in_core)
    rounds: int
    converged: bool


def kcore(graph: Graph, k: int, max_rounds: int = 100) -> KCoreResult:
    """Peel to the k-core (or for at most ``max_rounds`` synchronous
    rounds). Returns every vertex with an ``in_core`` flag: the
    vertices whose degree was >= k at the last completed round."""
    if k < 0:
        raise ValueError("k must be >= 0")
    if k == 0:
        # 0-core = every vertex (including isolated ones, which never
        # appear in the degree table the peeling loop filters on)
        state = graph.degrees().select("id", F.lit(True).alias("in_core"))
        return KCoreResult(state=state, rounds=0, converged=True)
    with stable_partitioning(graph.edges.sparkSession):
        return _kcore_impl(graph, k, max_rounds)


def _kcore_impl(graph: Graph, k: int, max_rounds: int) -> KCoreResult:
    edges = graph.edges
    verts = graph.degrees().select("id")

    sym = edges.select("src", "dst").union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    sym = sym.repartition(graph.num_partitions, "src").localCheckpoint(eager=False)
    n_edges = sym.count()

    keep = None
    rounds = 0
    converged = False
    while rounds < max_rounds:
        prev_keep = keep
        deg = sym.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
        keep = (
            deg.filter(F.col("deg") >= k)
            .select(F.col("src").alias("id"))
            .localCheckpoint(eager=False)
        )
        new_sym = (
            sym.join(keep.hint("shuffle_hash"), sym["src"] == keep["id"], "left_semi")
            .join(
                keep.withColumnRenamed("id", "_kid").hint("shuffle_hash"),
                F.col("dst") == F.col("_kid"),
                "left_semi",
            )
            .localCheckpoint(eager=False)
        )
        # one barrier action: materializes keep + the shrunken edge set
        new_n = new_sym.count()
        rounds += 1
        _free_checkpoint(sym)
        if prev_keep is not None:
            _free_checkpoint(prev_keep)
        sym = new_sym
        if new_n == n_edges:
            # no edge removed => no vertex peeled => fixpoint
            converged = True
            break
        n_edges = new_n

    if keep is None:  # max_rounds == 0
        keep = verts.select("id")
    state = verts.join(
        keep.withColumn("in_core", F.lit(True)), "id", "left"
    ).select("id", F.coalesce("in_core", F.lit(False)).alias("in_core"))
    return KCoreResult(state=state, rounds=rounds, converged=converged)
