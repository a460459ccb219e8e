"""Ship this package to Spark executors.

On a real cluster the job runs ``spark-submit --py-files rps.zip`` (north
rule); for library/driver-API use this helper builds the equivalent zip once
per process and registers it with ``SparkContext.addPyFile`` so Python
workers can unpickle the extraction UDF regardless of the driver's cwd or
sys.path."""

from __future__ import annotations

import os
import tempfile
import zipfile

_SHIPPED_ATTR = "_readability_php_spark_shipped"


def package_zip_path() -> str:
    import readability_php_spark

    pkg_dir = os.path.dirname(os.path.abspath(readability_php_spark.__file__))
    zip_path = os.path.join(
        tempfile.gettempdir(),
        f"readability_php_spark-{readability_php_spark.__version__}-py.zip",
    )
    if not os.path.exists(zip_path):
        tmp = zip_path + ".tmp"
        with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as zf:
            for root, _dirs, files in os.walk(pkg_dir):
                if "__pycache__" in root:
                    continue
                for fn in files:
                    if not fn.endswith(".py"):
                        continue
                    full = os.path.join(root, fn)
                    rel = os.path.join(
                        "readability_php_spark", os.path.relpath(full, pkg_dir)
                    )
                    zf.write(full, rel)
        os.replace(tmp, zip_path)
    return zip_path


def ship_package(spark) -> None:
    """Idempotent: register the package zip with the session's context."""
    sc = spark.sparkContext
    if getattr(sc, _SHIPPED_ATTR, False):
        return
    sc.addPyFile(package_zip_path())
    setattr(sc, _SHIPPED_ATTR, True)
