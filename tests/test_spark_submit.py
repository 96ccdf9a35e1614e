"""Ship-shape test: the engine really runs as `spark-submit --py-files
olive_spark.zip scripts/run_app.py ...` — the north-rule packaging
claim, exercised end-to-end in a fresh driver JVM.

The subprocess gets a scrubbed environment (no PYTHONPATH) and a temp
cwd, so `olive_spark` is importable ONLY from the `--py-files` zip —
if the package zip were broken or the driver script leaked a repo-path
dependency, the run would fail with ImportError rather than silently
pass against the checkout. Mirrors how the reference ships a single
binary per app (PageRank.cu:89-145's main) as one submit unit.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import zipfile

import numpy as np
import pytest

from olive_spark import oracle
from olive_spark.fixtures import grid_graph

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SPARK_SUBMIT = shutil.which("spark-submit") or (
    "/opt/spark/bin/spark-submit"
    if os.path.exists("/opt/spark/bin/spark-submit")
    else None
)

pytestmark = pytest.mark.skipif(
    SPARK_SUBMIT is None, reason="spark-submit not on PATH"
)


def _build_zip(dest: str) -> str:
    """Package olive_spark/ exactly as the README ships it (zip -qr)."""
    pkg = os.path.join(REPO, "olive_spark")
    path = os.path.join(dest, "olive_spark.zip")
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, dirs, files in os.walk(pkg):
            # mirror `zip -qr olive_spark` exactly: every file ships,
            # not just *.py (ADVICE r5: a py-only zip would silently
            # diverge if the package gains py.typed/SQL/data resources)
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for f in files:
                if f.endswith(".pyc"):
                    continue
                full = os.path.join(root, f)
                zf.write(full, os.path.relpath(full, REPO))
    return path


def test_spark_submit_pagerank_end_to_end(spark, tmp_path):
    n, edges = grid_graph()
    edges_dir = str(tmp_path / "edges")
    verts_dir = str(tmp_path / "verts")
    out_dir = str(tmp_path / "ranks")
    spark.createDataFrame(
        [(a, b) for a, b in edges], "src long, dst long"
    ).write.parquet(edges_dir)
    spark.range(n).selectExpr("cast(id as long) as id").write.parquet(verts_dir)

    zip_path = _build_zip(str(tmp_path))
    workdir = str(tmp_path / "cwd")
    os.makedirs(workdir)

    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("PYTHONPATH", "SPARK_HOME")
    }
    # keep the child JVM small and isolated from the test session
    # (APPEND: don't drop JVM options the environment requires)
    env["SPARK_SUBMIT_OPTS"] = (
        os.environ.get("SPARK_SUBMIT_OPTS", "") + " -Dderby.system.home=" + workdir
    ).strip()

    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[2]",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_path,
            os.path.join(REPO, "scripts", "run_app.py"),
            "pagerank",
            "--edges", edges_dir,
            "--vertices", verts_dir,
            "--iterations", "5",
            "--output", out_dir,
        ],
        cwd=workdir,
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, (
        f"spark-submit failed\nstdout:\n{proc.stdout[-4000:]}"
        f"\nstderr:\n{proc.stderr[-4000:]}"
    )

    rows = {r["id"]: r["rank"] for r in spark.read.parquet(out_dir).collect()}
    exp = oracle.pagerank_fixed(n, edges, iterations=5)
    got = np.array([rows[i] for i in range(n)])
    assert np.allclose(got, exp, rtol=0, atol=1e-9)
