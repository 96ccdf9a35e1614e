"""Exact triangle counting via degree-oriented edge joins.

The one reference-app-suite algorithm that is NOT gather-apply-scatter
(SURVEY.md §7 M3). Standard distributed formulation:

1. simplify: drop self-loops, dedup the undirected edge set
   (canonical (min,max) pairs) — triangles are defined on the simple
   undirected graph.
2. orient every edge from the lower-(degree, id) endpoint to the
   higher one: each triangle then has exactly ONE wedge at its
   lowest-ranked vertex, and every vertex's oriented out-degree is
   O(sqrt(E)) — the classic skew cure that keeps hub adjacency
   manageable at web scale.
3. wedges = oriented ⋈ oriented on (a->b, a->c), b<c by rank;
   triangles = wedges semi-joined against the oriented edge set (b->c).

Three shuffles total, all equi-joins Catalyst can plan (sort-merge +
AQE skew handling); no UDFs, no driver-side iteration.

Per-vertex counts: each closed wedge (a,b,c) contributes one triangle
to a, b and c — explode + groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from olive_spark.graph import Graph


def _oriented_edges(graph: Graph) -> DataFrame:
    """Canonical undirected edge set, oriented by (degree, id) rank."""
    und = (
        graph.edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .distinct()
    )
    # undirected degree on the simple graph
    deg = (
        und.select(F.col("a").alias("v"))
        .unionByName(und.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count("*").alias("deg"))
    )
    da = deg.select(F.col("v").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("v").alias("b"), F.col("deg").alias("deg_b"))
    withdeg = und.join(da, "a").join(db, "b")
    # orient low (deg, id) -> high (deg, id); total order, no ties
    lo_first = (F.col("deg_a") < F.col("deg_b")) | (
        (F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))
    )
    return withdeg.select(
        F.when(lo_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(lo_first, F.col("b")).otherwise(F.col("a")).alias("v"),
    )


def triangle_count(graph: Graph) -> tuple[DataFrame, int]:
    """Returns (per_vertex: DataFrame(id, triangles), total: int).

    Every vertex of the graph appears in per_vertex (0 for none).
    """
    spark = graph.edges.sparkSession
    oriented = _oriented_edges(graph).cache()

    e1 = oriented.select(F.col("u").alias("a"), F.col("v").alias("b"))
    e2 = oriented.select(F.col("u").alias("a"), F.col("v").alias("c"))
    wedges = e1.join(e2, "a").filter(F.col("b") < F.col("c"))
    closing = oriented.select(F.col("u").alias("b"), F.col("v").alias("c")).unionByName(
        oriented.select(F.col("v").alias("b"), F.col("u").alias("c"))
    )
    tris = wedges.join(closing, ["b", "c"], "left_semi").cache()  # closed wedges

    per = (
        tris.select(F.explode(F.array("a", "b", "c")).alias("id"))
        .groupBy("id")
        .agg(F.count("*").alias("triangles"))
    )
    per_all = (
        graph.vertices.join(per, "id", "left")
        .select("id", F.coalesce("triangles", F.lit(0)).alias("triangles"))
        .cache()
    )
    # one action materializes per_all; total = sum/3 (each triangle
    # contributes once to each of its three vertices)
    s = per_all.agg(F.sum("triangles").alias("s")).first()["s"] or 0
    oriented.unpersist()
    tris.unpersist()
    return per_all, int(s) // 3


def local_clustering(graph: Graph) -> DataFrame:
    """Per-vertex local clustering coefficient on the simple undirected
    graph: lcc(v) = 2 * triangles(v) / (deg(v) * (deg(v) - 1)), defined
    as 0.0 where deg < 2. Returns DataFrame(id, triangles, deg, lcc)
    over ALL vertices.

    The closed-wedge count comes from :func:`triangle_count` (the
    degree-oriented join plan); the denominator's undirected simple
    degree is one extra dedup'd scan of the edge set — both sides are
    single groupBy aggregations, so the whole query is three equi-join
    shuffles + two aggs, no UDFs. (Reference computes the same simple-
    graph statistics family from its CSR degrees, csrGraph.h:253-284.)
    """
    per, _ = triangle_count(graph)
    und = (
        graph.edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("id"))
        .unionByName(und.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("deg"))
    )
    out = (
        per.join(deg, "id", "left")
        .select(
            "id",
            "triangles",
            F.coalesce("deg", F.lit(0)).alias("deg"),
        )
        .withColumn(
            "lcc",
            F.when(
                F.col("deg") >= 2,
                (F.lit(2.0) * F.col("triangles")) / (F.col("deg") * (F.col("deg") - 1)),
            ).otherwise(F.lit(0.0)),
        )
        .cache()
    )
    # materialize out so per (cached by triangle_count, no handle
    # returned to our caller) can be released here instead of leaking
    # one cached table per call
    out.count()
    per.unpersist()
    return out
