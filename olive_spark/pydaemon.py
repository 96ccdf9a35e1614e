"""PySpark worker daemon with heavy imports preloaded before forking.

Python workers are forked from the daemon process; modules imported
HERE are inherited by every worker via copy-on-write, so the first
Python-evaluating stage of a job no longer pays ``import pandas`` /
``import pyarrow`` once per worker (32 concurrent cold imports on a
local[32] master — the measured cold-start term of the Arrow ingest
path, and the part of it that co-tenant CPU contention amplifies).

Standard public mechanism: ``spark.python.daemon.module`` (see
python/pyspark/daemon.py in the Spark source tree). The module must be
importable on the executor's PYTHONPATH — it ships inside the engine
package, so anywhere olive_spark runs, it resolves.
"""

# Preload the libraries every Arrow/pandas UDF in this engine touches.
# Failures fall through to the worker's own import (no harm, no speedup).
try:  # pragma: no cover - trivial import shims
    import numpy  # noqa: F401
    import pandas  # noqa: F401
    import pyarrow  # noqa: F401
except Exception:  # pragma: no cover
    pass

from pyspark.daemon import manager  # noqa: E402

if __name__ == "__main__":
    manager()
