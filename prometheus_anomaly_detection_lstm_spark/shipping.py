"""Self-shipping: make this package importable on executor Python workers.

Closures sent through mapInPandas/applyInPandas reference package
classes BY MODULE PATH (cloudpickle pickles importable symbols by
reference), so the Python worker must be able to import
``prometheus_anomaly_detection_lstm_spark`` — which is not guaranteed when the
driving process runs from another directory.  ``ensure_shipped`` zips
the package once per process and registers it with
``SparkContext.addPyFile`` so every worker can.
"""

from __future__ import annotations

import os
import shutil
import tempfile

_shipped: set[int] = set()


def ensure_shipped(spark) -> None:
    sc = spark.sparkContext
    key = id(sc)
    if key in _shipped:
        return
    import prometheus_anomaly_detection_lstm_spark as pkg

    pkg_dir = os.path.dirname(os.path.abspath(pkg.__file__))
    root = os.path.dirname(pkg_dir)
    out = os.path.join(
        tempfile.gettempdir(), f"prometheus_anomaly_detection_lstm_spark_{os.getpid()}"
    )
    zip_path = shutil.make_archive(
        out, "zip", root_dir=root, base_dir="prometheus_anomaly_detection_lstm_spark"
    )
    sc.addPyFile(zip_path)
    _shipped.add(key)
