"""CSR-block fast path: equivalence with the DataFrame path / oracle."""

from __future__ import annotations

import numpy as np
import pytest

from olive_spark import oracle
from olive_spark.csr import (
    bfs_csr,
    build_blocks,
    cc_csr,
    gather_sum,
    pagerank_csr,
    sssp_csr,
)
from olive_spark.fixtures import (
    acyclic_graph,
    chain_graph,
    grid_graph,
    isolated_graph,
    maxflow_graph,
    ordered_graph_9,
    star_graph,
)
from olive_spark.graph import Graph

from pyspark.sql import functions as F


@pytest.mark.parametrize(
    "fix",
    [grid_graph(), ordered_graph_9(), star_graph(100), acyclic_graph(25),
     maxflow_graph(), isolated_graph(30)],
    ids=["grid", "ordered9", "star100", "acyclic25", "maxflow", "isolated30"],
)
def test_pagerank_csr_matches_oracle(spark, fix):
    n, e = fix
    g = Graph.from_edge_list(spark, e, n_vertices=n, num_partitions=4)
    out = pagerank_csr(g, iterations=8)
    got = np.array([r["rank"] for r in out.orderBy("id").collect()])
    exp = oracle.pagerank_fixed(n, e, iterations=8)
    assert len(got) == n
    assert np.allclose(got, exp, atol=1e-12, rtol=1e-9)


def test_blocks_shape(spark):
    n, e = star_graph(50)
    g = Graph.from_edge_list(spark, e, n_vertices=n, num_partitions=4)
    blocks = build_blocks(g)
    rows = blocks.collect()
    assert sum(r["nnz"] for r in rows) == len(e)
    assert all(len(r["dsts"]) == 8 * r["nnz"] for r in rows)
    # srcs unique per block, offsets monotone
    for r in rows:
        srcs = np.frombuffer(r["srcs"], dtype=np.int64)
        off = np.frombuffer(r["offsets"], dtype=np.int64)
        assert len(np.unique(srcs)) == len(srcs)
        assert (np.diff(off) > 0).all()
        assert off[-1] == r["nnz"]
    blocks.unpersist()


@pytest.mark.parametrize(
    "fix, source",
    [(grid_graph(), 0), (chain_graph(20), 3), (star_graph(40), 1),
     (acyclic_graph(15), 0), (isolated_graph(12), 0)],
    ids=["grid", "chain20", "star40-from-spoke", "acyclic15", "isolated12"],
)
def test_bfs_csr_matches_oracle(spark, fix, source):
    """Frontier-driven CSR BFS == serial oracle (levels exact): only the
    active frontier's rows enter the block cogroup each superstep."""
    n, e = fix
    g = Graph.from_edge_list(spark, e, n_vertices=n, num_partitions=4)
    out = bfs_csr(g, source=source)
    got = np.array([r["level"] for r in out.orderBy("id").collect()])
    exp = oracle.bfs(n, e, source=source)
    assert len(got) == n
    assert np.array_equal(got, exp)


@pytest.mark.parametrize(
    "fix",
    [grid_graph(), chain_graph(30), star_graph(40), maxflow_graph(),
     isolated_graph(12)],
    ids=["grid", "chain30", "star40", "maxflow", "isolated12"],
)
def test_cc_csr_matches_oracle(spark, fix):
    """Frontier-driven CSR min-label CC == union-find oracle (exact)."""
    n, e = fix
    g = Graph.from_edge_list(spark, e, n_vertices=n, num_partitions=4)
    out = cc_csr(g)
    got = np.array([r["component"] for r in out.orderBy("id").collect()])
    exp = oracle.connected_components(n, e)
    assert np.array_equal(got, exp)


@pytest.mark.parametrize(
    "fix, source",
    [(grid_graph(), 0), (chain_graph(25), 0), (maxflow_graph(), 0)],
    ids=["grid", "chain25", "maxflow"],
)
def test_sssp_csr_weighted_matches_oracle(spark, fix, source):
    """CSR Bellman-Ford (gather = dist + weight via edge_kernel) ==
    serial weighted oracle, including unreached = +inf."""
    n, e = fix
    # deterministic non-uniform weights so the edge_kernel path is real
    # (from_edge_list discards weights by reference semantics, so build
    # the weighted edge table directly)
    we = [(u, v, 1.0 + ((u * 7 + v * 13) % 5) * 0.25) for (u, v) in e]
    edf = spark.createDataFrame(we, schema="src long, dst long, weight double")
    vdf = spark.range(n).select(F.col("id").cast("long").alias("id"))
    g = Graph.from_edges(spark, edf, vertices=vdf, num_partitions=4)
    out = sssp_csr(g, source=source)
    got = np.array([r["distance"] for r in out.orderBy("id").collect()])
    exp = oracle.sssp_weighted(n, we, source)
    assert np.allclose(got, exp, atol=1e-12, equal_nan=False)


def test_gather_sum_nan_state_propagates(spark):
    """A src whose state value is genuinely NaN must propagate NaN to
    its out-neighbors, NOT be dropped as 'absent' (r3 ADVICE: membership
    mask, not NaN sentinel)."""
    # 0->1, 0->2, 3->2 ; state for all of 0..3 with value[0] = NaN
    e = [(0, 1), (0, 2), (3, 2)]
    g = Graph.from_edge_list(spark, e, n_vertices=4, num_partitions=2)
    blocks = build_blocks(g)
    state = g.degrees().withColumn(
        "rank",
        F.when(F.col("id") == 0, F.lit(float("nan"))).otherwise(
            F.col("id").cast("double")
        ),
    )
    got = {
        r["id"]: r["accum"]
        for r in gather_sum(
            blocks, state, "rank", g.num_partitions, kernel=lambda v, c: v
        ).collect()
    }
    blocks.unpersist()
    # dst 1 and 2 both receive NaN from src 0 (sum with NaN = NaN)
    assert np.isnan(got[1])
    assert np.isnan(got[2])


def test_gather_sum_frontier_masks_inactive_srcs(spark):
    """Passing only a subset of vertices as state gathers ONLY along
    their out-edges (edgeFilter semantics, oliverKernel.h:148-178)."""
    n, e = maxflow_graph()
    g = Graph.from_edge_list(spark, e, n_vertices=n, num_partitions=4)
    blocks = build_blocks(g)
    active = [v for v in range(n) if v % 3 == 0]
    state = (g.degrees().filter(F.col("id").isin(active))
             .withColumn("rank", (F.col("id") + 1).cast("double")))
    got = {
        r["id"]: r["accum"]
        for r in gather_sum(blocks, state, "rank", g.num_partitions).collect()
    }
    j = state.alias("s").join(g.edges.alias("e"), F.col("s.id") == F.col("e.src"))
    exp = {
        r["id"]: r["accum"]
        for r in j.select(
            F.col("e.dst").alias("id"),
            (F.col("s.rank") / F.col("s.outdeg")).alias("g"),
        ).groupBy("id").agg(F.sum("g").alias("accum")).collect()
    }
    assert set(got) == set(exp)
    for k in got:
        assert abs(got[k] - exp[k]) < 1e-9
    blocks.unpersist()


def test_gather_sum_equals_dataframe_gather(spark):
    """One edge-expansion over CSR blocks == join + groupBy(dst).sum."""
    n, e = maxflow_graph()
    g = Graph.from_edge_list(spark, e, n_vertices=n, num_partitions=4)
    state = g.degrees().withColumn("rank", (F.col("id") + 1).cast("double"))
    blocks = build_blocks(g)
    got = {
        r["id"]: r["accum"]
        for r in gather_sum(blocks, state, "rank", g.num_partitions).collect()
    }
    j = state.alias("s").join(g.edges.alias("e"), F.col("s.id") == F.col("e.src"))
    exp = {
        r["id"]: r["accum"]
        for r in j.select(
            F.col("e.dst").alias("id"),
            (F.col("s.rank") / F.col("s.outdeg")).alias("g"),
        ).groupBy("id").agg(F.sum("g").alias("accum")).collect()
    }
    assert set(got) == set(exp)
    for k in got:
        assert abs(got[k] - exp[k]) < 1e-9
    blocks.unpersist()
