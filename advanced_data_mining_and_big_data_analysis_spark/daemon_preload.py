"""Python-worker daemon that preloads the Arrow/pandas stack before forking.

Configured via ``spark.python.daemon.module`` (session.py). PySpark's
stock daemon (pyspark/daemon.py) forks a fresh worker per executor core;
each fork then imports pandas + pyarrow + numpy on first use (~1.5-2 s
apiece on this container), which is exactly the cold-start observed on
the first mapInPandas/pandas_udf stage of a session (BENCH r5: q113
cold 6.4 s vs 0.78 s warm). Importing the stack HERE — in the daemon,
before any fork — lets every forked worker inherit the warm modules via
copy-on-write, so worker startup is a plain fork again.

Pure mechanism, no policy: delegates straight to pyspark.daemon.manager.
"""

# Preload order matters only for speed; failures fall through silently so
# a stripped-down cluster image without pandas still runs non-Arrow jobs.
try:  # noqa: SIM105
    import numpy  # noqa: F401
    import pandas  # noqa: F401
    import pyarrow  # noqa: F401
    import pyarrow.pandas_compat  # noqa: F401  # the lazy half of the Arrow<->pandas bridge
except Exception:  # pragma: no cover - optional on exotic images
    pass

from pyspark.daemon import manager

if __name__ == "__main__":
    manager()
