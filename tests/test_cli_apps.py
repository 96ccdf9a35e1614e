"""CLI driver (scripts/run_app.py) smoke tests for the round-2 apps —
in-process main(argv) invocation; getOrCreate attaches to the test
session."""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from run_app import main as run_app_main  # noqa: E402

from olive_spark import oracle  # noqa: E402
from olive_spark.fixtures import grid_graph  # noqa: E402


@pytest.fixture(scope="module")
def grid_inputs(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("cli")
    n, e = grid_graph()
    from pyspark.sql import functions as F

    spark.createDataFrame(
        [(a, b, 1.0) for a, b in e], "src long, dst long, weight double"
    ).write.mode("overwrite").parquet(str(base / "edges"))
    spark.range(n).select(F.col("id").cast("long").alias("id")).write.mode(
        "overwrite"
    ).parquet(str(base / "verts"))
    return base, n, e


def test_cli_hits(spark, grid_inputs, tmp_path):
    base, n, e = grid_inputs
    out = str(tmp_path / "hits")
    run_app_main(
        ["hits", "--edges", str(base / "edges"), "--vertices",
         str(base / "verts"), "--iterations", "3", "--output", out]
    )
    rows = {r["id"]: r for r in spark.read.parquet(out).collect()}
    exp_hub, exp_auth = oracle.hits_fixed(n, e, iterations=3)
    got_hub = np.array([rows[i]["hub"] for i in range(n)])
    got_auth = np.array([rows[i]["auth"] for i in range(n)])
    assert np.allclose(got_hub, exp_hub, atol=1e-9)
    assert np.allclose(got_auth, exp_auth, atol=1e-9)


def test_cli_ppr(spark, grid_inputs, tmp_path):
    base, n, e = grid_inputs
    out = str(tmp_path / "ppr")
    run_app_main(
        ["ppr", "--edges", str(base / "edges"), "--vertices",
         str(base / "verts"), "--sources", "0,3", "--iterations", "5",
         "--epsilon", "1e-12", "--output", out]
    )
    rows = {r["id"]: r["rank"] for r in spark.read.parquet(out).collect()}
    exp = oracle.personalized_pagerank_fixed(n, e, [0, 3], iterations=5)
    got = np.array([rows[i] for i in range(n)])
    assert np.allclose(got, exp, atol=1e-9)


def test_cli_kcore(spark, grid_inputs, tmp_path):
    base, n, e = grid_inputs
    out = str(tmp_path / "kcore")
    run_app_main(
        ["kcore", "--edges", str(base / "edges"), "--vertices",
         str(base / "verts"), "--k", "3", "--iterations", "10",
         "--output", out]
    )
    rows = {r["id"]: r["in_core"] for r in spark.read.parquet(out).collect()}
    exp, _, _ = oracle.kcore_fixed(n, e, 3, max_rounds=10)
    assert all(rows[i] == bool(exp[i]) for i in range(n))


def test_cli_hostgraph(spark, tmp_path):
    from olive_spark.fixtures import chain_graph
    from olive_spark.ingest.pages import synth_pages

    n, e = chain_graph(12)
    pages_path = str(tmp_path / "pages")
    synth_pages(spark, n, e, num_partitions=2).write.mode("overwrite").parquet(
        pages_path
    )
    out = str(tmp_path / "hg")
    run_app_main(["hostgraph", "--pages", pages_path, "--output", out])
    got = {
        (r["src_host"], r["dst_host"]): r["n_links"]
        for r in spark.read.parquet(out).collect()
    }
    exp = {}
    for s, d in e:
        key = (f"site{s % 97}.example", f"site{d % 97}.example")
        exp[key] = exp.get(key, 0) + 1
    assert got == exp
