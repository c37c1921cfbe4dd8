"""Ship this package to executors.

Python-side operators (mapInPandas decode, pandas_udf embedders) reference
module-level functions/classes; cloudpickle serializes those *by reference*,
so executor workers must be able to ``import vector_db_mvp_spark``. When the
driver process was launched from outside the repo (the benchmark driver, a
spark-submit from elsewhere), workers inherit neither cwd nor sys.path — so
we zip the package once per SparkContext and ``addPyFile`` it. Idempotent
and cheap (a few KB of source)."""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession


def ensure_package_shipped(spark: SparkSession) -> None:
    sc = spark.sparkContext
    if getattr(sc, "_vdbms_pkg_shipped", False):
        return
    import vector_db_mvp_spark

    pkg_dir = os.path.dirname(os.path.abspath(vector_db_mvp_spark.__file__))
    zpath = os.path.join(
        tempfile.gettempdir(), f"vector_db_mvp_spark_{os.getpid()}.zip"
    )
    with zipfile.ZipFile(zpath, "w") as z:
        for root, _dirs, files in os.walk(pkg_dir):
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(root, fn)
                    rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                    z.write(full, rel)
    sc.addPyFile(zpath)
    sc._vdbms_pkg_shipped = True
