"""Ship this package to executor Python workers.

mapInPandas / pandas_udf kernels are pickled by reference to this module,
so executor workers must be able to `import tidb_lightning_spark`. When
the driver imported us from a plain directory (file path, arbitrary cwd —
exactly how the verification driver loads __spark_entry__.py), workers
would fail with ModuleNotFoundError. `ensure_shipped(spark)` zips the
package once and registers it with addPyFile — call it before building
any plan that runs package code inside executors.

On a real cluster this is also the correct deployment story (--py-files).
"""

from __future__ import annotations

import os
import tempfile
import zipfile

_SHIPPED_ATTR = "_tls_package_shipped"


def ensure_shipped(spark) -> None:
    sc = spark.sparkContext
    if getattr(sc, _SHIPPED_ATTR, False):
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    fd, zip_path = tempfile.mkstemp(prefix="tls_pkg_", suffix=".zip")
    os.close(fd)
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _, files in os.walk(pkg_dir):
            for f in files:
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                rel = os.path.join(
                    "tidb_lightning_spark", os.path.relpath(full, pkg_dir)
                )
                zf.write(full, rel)
    sc.addPyFile(zip_path)
    setattr(sc, _SHIPPED_ATTR, True)
