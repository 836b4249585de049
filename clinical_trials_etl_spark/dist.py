"""Self-distribution of this package to Python workers.

Any operator whose pandas UDF / mapInPandas closure references a module
in this package needs the package importable on the executor side. On a
cluster that's ``spark-submit --py-files``; in a harness that built its
own SparkSession (possibly with a cwd outside the repo), we zip the
package once and ``addPyFile`` it — the worker-side equivalent of
--py-files, applied lazily per SparkContext.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_added_contexts: set[int] = set()


def ensure_package_on_executors(spark: SparkSession) -> None:
    sc = spark.sparkContext
    key = id(sc)
    if key in _added_contexts:
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    root = os.path.dirname(pkg_dir)
    if not os.path.isdir(pkg_dir):
        # package imported from a zip (spark-submit --py-files): the
        # submit machinery already shipped that zip to every executor,
        # so there is nothing to re-zip — and os.walk over a zip path
        # would silently produce an empty archive
        _added_contexts.add(key)
        return
    zpath = os.path.join(
        tempfile.gettempdir(), f"clinical_trials_etl_spark_{os.getpid()}.zip"
    )
    with zipfile.ZipFile(zpath, "w") as z:
        for dirpath, _dirs, files in os.walk(pkg_dir):
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    z.write(full, os.path.relpath(full, root))
    sc.addPyFile(zpath)
    _added_contexts.add(key)
