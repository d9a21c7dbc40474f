"""Custom pyspark daemon module that preloads the heavy imports.

PySpark's daemon forks one worker per task; anything imported here before
the fork is inherited copy-on-write, so workers skip the ~2 s
numpy/pandas/pyarrow (+ engine kernels) import on every fork — measured as
the dominant cost of UDF-heavy stages with many tasks (hundreds of
core-seconds per stage at 32 cores).

Activated by ``spark.python.daemon.module=pyramidscheme_jl_spark.daemon_preload``
(set in session.get_spark, with the package root appended to the JVM's
PYTHONPATH so the daemon can import us).
"""

import numpy  # noqa: F401
import pandas  # noqa: F401
import pyarrow  # noqa: F401

try:  # engine kernels used inside every tile UDF
    from pyramidscheme_jl_spark.functions import cells, codec, reducers  # noqa: F401
except Exception:  # pragma: no cover - package not on daemon path yet
    pass

from pyspark.daemon import manager

if __name__ == "__main__":
    manager()
