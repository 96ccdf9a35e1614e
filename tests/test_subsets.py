"""Vertex-subset algebra + DIMACS loader (SURVEY §2.1/§2.4 coverage)."""

from __future__ import annotations

from olive_spark.graph import Graph
from olive_spark.subsets import (
    make_subset,
    subset_and,
    subset_contains,
    subset_minus,
    subset_or,
    subset_size,
    subset_xor,
)


def ids(df):
    return sorted(r["id"] for r in df.collect())


def test_subset_algebra(spark):
    a = make_subset(spark, [1, 2, 3, 4])
    b = make_subset(spark, [3, 4, 5])
    assert ids(subset_and(a, b)) == [3, 4]
    assert ids(subset_or(a, b)) == [1, 2, 3, 4, 5]
    assert ids(subset_xor(a, b)) == [1, 2, 5]
    assert ids(subset_minus(a, b)) == [1, 2]
    assert subset_contains(a, 2)
    assert not subset_contains(a, 9)
    assert subset_size(a) == 4


def test_dimacs_loader(spark, tmp_path):
    """DIMACS adjacency: 1-indexed neighbor lists, one line per vertex;
    undirected edges appear in both lists (csrGraph.h:177-236)."""
    p = tmp_path / "g.dimacs"
    # triangle 0-1-2 plus pendant 3 attached to 0 (1-indexed in file)
    p.write_text("% comment\n4 4\n2 3 4\n1 3\n1 2\n1\n")
    g = Graph.from_dimacs_file(spark, str(p), num_partitions=2)
    assert g.vertex_count() == 4
    assert g.edge_count() == 8  # doubled, as in the reference
    got = sorted((r["src"], r["dst"]) for r in g.edges.collect())
    assert got == sorted(
        [(0, 1), (0, 2), (0, 3), (1, 0), (1, 2), (2, 0), (2, 1), (3, 0)]
    )
