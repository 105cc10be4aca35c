"""Ship the engine package to executor Python workers.

UDF closures (mapInPandas/applyInPandas transports, the repair ladder)
are pickled by reference to this package; workers must be able to import
it. When the driver process was started outside the repo (the harness
imports ``__spark_entry__.py`` by path), the package isn't on the worker
path — so we zip it and ``addPyFile`` it onto the running SparkContext.
This is exactly the mechanism used to deploy to a real multi-node
cluster, so local tests and the 1000-executor case share one code path.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_SHIPPED: set[str] = set()


def ensure_shipped(spark: SparkSession) -> None:
    """Idempotently add a zip of this package to the Spark context."""
    sc = spark.sparkContext
    app_id = sc.applicationId
    if app_id in _SHIPPED:
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    pkg_name = os.path.basename(pkg_dir)
    zip_path = os.path.join(
        tempfile.gettempdir(), f"{pkg_name}-{os.getpid()}-{app_id}.zip"
    )
    if not os.path.exists(zip_path):
        with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
            for root, _dirs, files in os.walk(pkg_dir):
                for fname in files:
                    if not fname.endswith(".py"):
                        continue
                    full = os.path.join(root, fname)
                    rel = os.path.join(pkg_name, os.path.relpath(full, pkg_dir))
                    zf.write(full, rel)
    sc.addPyFile(zip_path)
    _SHIPPED.add(app_id)
