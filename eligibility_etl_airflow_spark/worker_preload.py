"""Python-worker daemon preload — guide §4.5 taken to the process level.

Launched in place of ``pyspark.daemon`` via
``spark.python.daemon.module=eligibility_etl_airflow_spark.worker_preload``
(set in :mod:`eligibility_etl_airflow_spark.session`). The stock daemon
forks one Python process per task slot; each FRESH fork then re-imports
everything the unpickled task closure references — numpy, pandas,
pyarrow and this engine's operator modules — before it can touch its
first Arrow batch. Measured on this box: ~0.5-1.5 s of imports per
worker, and a 32-core local session forks 32-64 workers on the first
Python-stage query, so a cold session burned 15-20 s of wall on imports
alone (multimodal_features rep0: 22.9 s vs 6.7 s warm, almost all of it
worker spin-up).

Importing those modules HERE — in the daemon process, before the fork
loop starts — lets every worker inherit the warm ``sys.modules`` pages
copy-on-write for free. Workers still import anything unusual a closure
drags in; this only front-loads the dependencies every engine worker
needs anyway.

Contracts kept:

- Imports are best-effort (``try``/``except``): a missing optional dep
  or a broken engine module must degrade to the stock daemon behavior
  (the affected worker re-raises at unpickle time, exactly as before),
  never kill the daemon.
- No Spark session, no JVM contact, no file I/O beyond the imports —
  the daemon must stay a pure fork server.
- ``pyspark.daemon`` parses ``sys.argv[1]`` (the worker module name) at
  IMPORT time, so delegating via a plain import + ``manager()`` call
  preserves the stock argv contract.
"""

from __future__ import annotations


def _patch_zipimport_invalidate() -> None:
    """Backport Python 3.12's mtime-guarded
    ``zipimporter.invalidate_caches`` (python/cpython gh-97850 family) —
    the single largest per-task cost of this engine's Python stages on
    3.11.

    pyspark's worker calls ``importlib.invalidate_caches()`` once per
    TASK (worker_util.setup_spark_files), and on 3.11
    ``zipimporter.invalidate_caches()`` EAGERLY re-parses the zip
    central directory. The worker path carries ~16 zip importers
    (pyspark.zip, py4j, the spark-core jar, addPyFile zips), so every
    task re-read ~0.55 s of zip directories before touching its first
    row — cProfile of a reused worker: 0.551 s of a 0.658 s task inside
    ``zipimport._read_directory``. The guard skips the re-read while
    the archive's mtime is unchanged, which is exactly the 3.12
    stdlib semantics — a replaced-in-place zip (new mtime) still
    invalidates, so addPyFile/--py-files hot-swaps keep working. The
    patch is applied in the daemon, so every forked worker inherits it;
    driver-side imports are untouched (this module only runs as the
    daemon)."""
    import os
    import zipimport

    orig = zipimport.zipimporter.invalidate_caches
    # distinct unset sentinel (r11 ADVICE fix): a missing archive yields
    # mtime=None, which must NOT equal the never-checked state — with a
    # bare None sentinel a deleted addPyFile zip would never invalidate,
    # diverging from both stock 3.11 and 3.12 semantics
    _unset = object()

    def guarded(self):  # noqa: ANN001 - stdlib signature
        try:
            mtime = os.path.getmtime(self.archive)
        except OSError:
            mtime = None
        if getattr(self, "_graft_zip_mtime", _unset) == mtime:
            return
        orig(self)
        self._graft_zip_mtime = mtime

    try:
        zipimport.zipimporter.invalidate_caches = guarded
    except Exception:  # pragma: no cover - immutable type on odd builds
        pass


def _preload() -> None:
    # Heavy third-party deps first: every Arrow-batched stage needs them.
    for mod in ("numpy", "pandas", "pyarrow"):
        try:
            __import__(mod)
        except Exception:  # pragma: no cover - absent optional dep
            pass
    # Engine modules referenced by task closures (mapInPandas/mapInArrow
    # functions are pickled by reference to their defining module, so
    # each worker imports that module — and its import chain — on first
    # unpickle). registry.load_all() imports every plans/operators
    # module and is side-effect-free by construction (it only registers
    # query functions in a dict; no SparkSession, no I/O).
    try:
        from eligibility_etl_airflow_spark import registry

        registry.load_all()
    except Exception:  # pragma: no cover - engine not on sys.path
        pass
    # Prime the guarded zipimporter caches (mtime attrs) on the daemon's
    # own path entries, so even each worker's FIRST task skips the
    # ~0.55 s zip-directory re-read — children inherit the primed
    # importer instances through sys.path_importer_cache.
    try:
        import importlib

        importlib.invalidate_caches()
    except Exception:  # pragma: no cover
        pass


_patch_zipimport_invalidate()
_preload()


if __name__ == "__main__":
    import pyspark.daemon as _daemon

    _daemon.manager()
