"""PySpark worker daemon with the heavy Arrow stack preloaded.

The engine runs with ``spark.python.worker.reuse=false`` (see
``session.py`` — Spark 4.1's idle-worker pool intermittently hands a
later Arrow stage a stale worker that stalls its whole stage). The
cost of that choice is a fresh Python worker per task, and the
dominant term in that fork is not the fork itself but each worker
importing numpy/pandas/pyarrow from scratch (~200-300 ms × 32 tasks
× every Arrow stage).

Unix PySpark forks workers from a long-lived daemon process
(``spark.python.daemon.module``, default ``pyspark.daemon``). Pointing
that config here imports the heavy modules ONCE in the daemon, so
every forked worker inherits them already-initialized through
copy-on-write pages — fresh-worker semantics at ~10 ms instead of
~300 ms per task.

Pure composition of public Spark configuration: the daemon protocol
is unchanged; this module just front-loads imports and then delegates
to the stock ``pyspark.daemon.manager``.
"""

from __future__ import annotations

if __name__ == "__main__":
    # the preload: everything the engine's Arrow kernels touch
    import numpy  # noqa: F401
    import pandas  # noqa: F401
    import pyarrow  # noqa: F401

    try:  # the serializer path workers hit first
        import pyarrow.pandas_compat  # noqa: F401
        import pyspark.sql.pandas.serializers  # noqa: F401
        import pyspark.sql.pandas.types  # noqa: F401
    except ImportError:
        pass

    from pyspark.daemon import manager

    manager()
