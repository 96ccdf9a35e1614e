"""Per-partition CSR adjacency blocks — the vectorized fast path.

The reference materializes each partition's subgraph as CSR arrays once
and then runs every superstep's gather over them (Partition::fromSubgraph,
partition.h:234-336; CSR layout csrGraph.h:55-84). The Spark twin:

- ``build_blocks``: one pass over the src-hash-partitioned edge table
  packs each partition's adjacency into numpy CSR arrays (unique srcs,
  offsets, dst indices, out-degrees) shipped as binary columns — ONE
  row per partition, cached. Built once, reused across supersteps.
- ``gather_sum``: per superstep, a ``cogroup().applyInPandas`` pairs
  each CSR block with the vertex-state rows that hash to the same
  partition (ids co-hash with srcs by construction), gathers
  ``value[src]/outdeg`` (or a caller-supplied numpy kernel) along all
  out-edges with numpy fancy indexing, and partially reduces by dst
  inside the partition (pandas C-level groupby — the analogue of the
  reference's per-partition accumulate, oliveKernel.h:67-84). Only the
  per-partition partial sums cross the shuffle (the outbox,
  messageBox.h:52-142); a final ``groupBy(dst).sum`` completes the
  reduce (the scatter, oliveKernel.h:92-106).

Equivalence with the pure-DataFrame path is asserted in tests; which
path is faster depends on edge-table width and JVM-vs-Arrow transfer
cost — measured in bench.py, not assumed.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from olive_spark.graph import Graph

BLOCK_SCHEMA = (
    "pid int, n_src long, nnz long, srcs binary, offsets binary, "
    "dsts binary, outdeg binary, weights binary"
)


def _pid(col, p: int):
    return F.pmod(F.xxhash64(col), F.lit(p)).cast("int")


def build_blocks(graph: Graph, num_partitions: int | None = None) -> DataFrame:
    """Pack each src-hash partition's adjacency into CSR arrays.

    Returns a cached DataFrame with ONE row per non-empty partition.
    """
    p = num_partitions or graph.num_partitions

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        src = pdf["src"].to_numpy(np.int64)
        dst = pdf["dst"].to_numpy(np.int64)
        w = pdf["weight"].to_numpy(np.float64)
        order = np.argsort(src, kind="stable")
        src, dst, w = src[order], dst[order], w[order]
        usrc, counts = np.unique(src, return_counts=True)
        offsets = np.zeros(len(usrc) + 1, dtype=np.int64)
        np.cumsum(counts, out=offsets[1:])
        return pd.DataFrame(
            {
                "pid": [int(pdf["pid"].iloc[0])],
                "n_src": [len(usrc)],
                "nnz": [len(dst)],
                "srcs": [usrc.tobytes()],
                "offsets": [offsets.tobytes()],
                "dsts": [dst.tobytes()],
                "outdeg": [counts.tobytes()],
                "weights": [w.tobytes()],
            }
        )

    e = graph.edges.withColumn("pid", _pid(F.col("src"), p))
    return e.groupBy("pid").applyInPandas(pack, schema=BLOCK_SCHEMA).cache()


def gather_sum(
    blocks: DataFrame,
    state: DataFrame,
    value_col: str,
    num_partitions: int,
    kernel: Callable[[np.ndarray, np.ndarray], np.ndarray] | None = None,
    reduce_op: str = "sum",
) -> DataFrame:
    """One edge-expansion pass over the CSR blocks.

    state must contain (id, <value_col>). kernel(values_per_src,
    outdeg_per_src) -> per-SRC gather value (default: value/outdeg, the
    PageRank gather, PageRank.cu:53-55); it is then repeated along each
    src's out-edges and reduced by dst. Returns (id, accum) partials
    fully reduced (sum or min).

    FRONTIER-DRIVEN by construction: only srcs present in ``state`` are
    gathered from (missing srcs are masked out of the edge walk, the
    CSR twin of the workset gate in oliverKernel.h:148-178) — pass the
    full state for edgeMap semantics, or just the active rows for
    edgeFilter semantics (BFS/CC frontiers).
    """
    st = state.select("id", value_col).withColumn(
        "pid", _pid(F.col("id"), num_partitions)
    )

    def run(block_it: pd.DataFrame, state_it: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"id": pd.Series([], dtype="int64"),
                              "partial": pd.Series([], dtype="float64")})
        if len(block_it) == 0 or len(state_it) == 0:
            return empty
        row = block_it.iloc[0]
        usrc = np.frombuffer(row["srcs"], dtype=np.int64)
        counts = np.frombuffer(row["outdeg"], dtype=np.int64)
        dst = np.frombuffer(row["dsts"], dtype=np.int64)
        vals = (
            pd.Series(
                state_it[value_col].to_numpy(np.float64),
                index=state_it["id"].to_numpy(np.int64),
            )
            .reindex(usrc)
            .to_numpy(np.float64)
        )
        # frontier mask: srcs absent from the passed state are inactive
        active = ~np.isnan(vals)
        if not active.all():
            usrc, counts, vals = usrc[active], counts[active], vals[active]
            dst = dst[np.repeat(active, np.frombuffer(row["outdeg"], dtype=np.int64))]
        if len(usrc) == 0:
            return empty
        per_src = kernel(vals, counts) if kernel else vals / counts
        per_edge = np.repeat(per_src, counts)
        s = pd.Series(per_edge)
        grouped = s.groupby(dst)
        partial = grouped.sum() if reduce_op == "sum" else grouped.min()
        return pd.DataFrame(
            {"id": partial.index.to_numpy(np.int64), "partial": partial.to_numpy()}
        )

    msgs = (
        blocks.groupBy("pid")
        .cogroup(st.groupBy("pid"))
        .applyInPandas(lambda b, s: run(b, s), schema="id long, partial double")
    )
    agg = F.sum("partial") if reduce_op == "sum" else F.min("partial")
    return msgs.groupBy("id").agg(agg.alias("accum"))


def bfs_csr(
    graph: Graph,
    source: int,
    max_iterations: int = 10_000,
    blocks: DataFrame | None = None,
) -> DataFrame:
    """Frontier-driven BFS over CSR blocks (the edgeFilter/vertexFilter
    pattern, BFS.cu:124-148): per superstep only the CURRENT frontier's
    rows are shipped to the block cogroup, so late supersteps walk only
    the frontier's out-edges — the CSR twin of the frontier-driven
    DataFrame path (algorithms/bfs.py), equivalence-tested against it.
    Returns (id, level) with unreached vertices at level 2^31-1."""
    INF = (1 << 31) - 1
    p = graph.num_partitions
    if blocks is None:
        blocks = build_blocks(graph)
    from olive_spark.pregel import _free_checkpoint

    state = graph.vertices.select(
        "id",
        F.when(F.col("id") == source, F.lit(0)).otherwise(F.lit(INF)).alias("level"),
    ).localCheckpoint(eager=True)
    frontier_size = 1

    it = 0
    while frontier_size > 0 and it < max_iterations:
        it += 1
        frontier = state.filter(F.col("level") < INF).filter(
            F.col("level") == it - 1
        ).select("id", F.col("level").cast("double").alias("lv"))
        acc = gather_sum(
            blocks, frontier, "lv", p,
            kernel=lambda vals, counts: vals + 1.0, reduce_op="min",
        )
        new_state = (
            state.join(acc, "id", "left")
            .select(
                "id",
                F.when(
                    F.col("accum").isNotNull()
                    & (F.col("accum").cast("int") < F.col("level")),
                    F.col("accum").cast("int"),
                )
                .otherwise(F.col("level"))
                .alias("level"),
            )
            .localCheckpoint(eager=True)
        )
        frontier_size = new_state.filter(F.col("level") == it).count()
        _free_checkpoint(state)
        state = new_state
    return state


def pagerank_csr(
    graph: Graph,
    iterations: int,
    damping: float = 0.85,
    blocks: DataFrame | None = None,
) -> DataFrame:
    """PageRank over CSR blocks — identical semantics to
    algorithms.pagerank.pagerank_fixed (dangling mass lost, duplicate
    edges counted). Returns (id, rank)."""
    n = graph.vertex_count()
    p = graph.num_partitions
    if blocks is None:
        blocks = build_blocks(graph)
    add_const = (1.0 - damping) / n
    state = graph.vertices.select("id", F.lit(1.0 / n).alias("rank"))
    state = state.localCheckpoint(eager=True)
    from olive_spark.pregel import _free_checkpoint

    for _ in range(iterations):
        acc = gather_sum(blocks, state, "rank", p)
        new_state = (
            graph.vertices.join(acc, "id", "left")
            .select(
                "id",
                (F.lit(damping) * F.coalesce("accum", F.lit(0.0)) + F.lit(add_const)).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
        _free_checkpoint(state)
        state = new_state
    return state
