"""Plan audit for the round-2 operators: print the physical plans and
grep them for the properties we claim (no cartesian products except the
intended 1-row norm joins, shuffle-hash builds on the small side,
map-side partial aggregation, no Python row UDFs in hot paths).

Usage: python scripts/plan_audit_r2.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from olive_spark.session import get_spark  # noqa: E402


def audit(name: str, df, forbid=("PythonUDF", "CartesianProduct"), allow=()):
    plan = df._jdf.queryExecution().executedPlan().toString()
    flags = []
    for pat in forbid:
        if pat in plan and pat not in allow:
            flags.append(f"FORBIDDEN: {pat}")
    agg_partial = "partial" in plan.lower() or "HashAggregate" in plan
    print(f"=== {name}: {'FLAGS: ' + '; '.join(flags) if flags else 'clean'} "
          f"(HashAggregate={'HashAggregate' in plan}, "
          f"ShuffledHashJoin={'ShuffledHashJoin' in plan}, "
          f"BroadcastNLJ={'BroadcastNestedLoopJoin' in plan}, "
          f"codegen={'WholeStageCodegen' in plan})")
    return plan


def main():
    spark = get_spark(app_name="plan_audit", master="local[4]",
                      shuffle_partitions=8)
    from olive_spark.fixtures import chain_graph, grid_graph
    from olive_spark.graph import Graph

    n, e = grid_graph()
    g = Graph.from_edge_list(spark, e, n_vertices=n, num_partitions=4)

    # HITS: expect shuffle-hash joins + hash aggregates + 1-row
    # BroadcastNestedLoopJoin for each L2 norm (intended; 1-row side).
    from olive_spark.algorithms.hits import hits

    audit("hits(3)", hits(g, iterations=3),
          forbid=("PythonUDF",))

    # kcore: expect left-semi shuffle-hash joins, hash aggregate degrees.
    from olive_spark.algorithms.kcore import kcore

    nc, ec = chain_graph(30)
    gc = Graph.from_edge_list(spark, ec, n_vertices=nc, num_partitions=4)
    audit("kcore(3, r4)", kcore(gc, k=3, max_rounds=4).state)

    # ngram_counts: expect ONE shuffle (partial_count -> final after
    # exchange), no Python UDF (pure codegen transform/explode).
    import pandas as pd

    from olive_spark.pipeline.textstats import ngram_counts

    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0, 1], "text": ["a b c", "b c d"]}))
    audit("ngram_counts", ngram_counts(docs, n=2, min_count=1))

    # dedup_clusters final join: corpus-sized part must be ONE join, no
    # iteration (the CC loop runs only over pair members upstream).
    from olive_spark.pipeline.dedup import dedup_clusters

    pairs = spark.createDataFrame(pd.DataFrame({"doc_a": [0], "doc_b": [1]}))
    audit("dedup_clusters", dedup_clusters(docs, pairs, iterations=2))

    # host_graph_edges: parse_url must stay JVM-side (no PythonUDF),
    # count aggregate must be partial (map-side combine).
    from olive_spark.ingest.pages import synth_pages
    from olive_spark.ingest.resolve import host_graph_edges

    pages = synth_pages(spark, 10, [(0, 1), (1, 2)], num_partitions=2)
    plan = audit("host_graph_edges", host_graph_edges(pages),
                 forbid=("CartesianProduct",))
    # The page SYNTH (MapInPandas) and link extraction (ArrowEvalPython)
    # are the intended Arrow-batch Python nodes; anything else — in
    # particular a row-at-a-time BatchEvalPython for the host parse —
    # would mean parse_url fell off the JVM. (F.parse_url is a JVM
    # built-in; this pins it.)
    import re

    py_nodes = set(re.findall(r"BatchEvalPython|ArrowEvalPython|MapInPandas", plan))
    assert "BatchEvalPython" not in py_nodes, py_nodes
    print("host_graph python nodes (Arrow-only, as intended):", sorted(py_nodes))


if __name__ == "__main__":
    main()
