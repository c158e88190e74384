"""Filesystem helpers that work on ANY Hadoop-supported scheme.

Driver-local ``os.path`` calls only understand ``file://`` paths; a
lake on HDFS/S3/ABFS would silently look "missing" and an os.rename
swap would fail outright. These helpers go through the JVM's
``org.apache.hadoop.fs.FileSystem`` so the incremental engine and the
metadata swap behave identically on a laptop and a cluster.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def _fs_and_path(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, hpath


def path_exists(spark: SparkSession, path: str) -> bool:
    fs, hpath = _fs_and_path(spark, path)
    return bool(fs.exists(hpath))


def rename(spark: SparkSession, src: str, dst: str) -> bool:
    """False on failure — NEVER raises for a losable race.

    Hadoop's FileSystem#rename contract is "report failure by returning
    false", but several implementations (RawLocalFileSystem included)
    THROW instead when the source vanishes mid-call — exactly what a
    concurrent metadata swap produces when the other writer moves the
    table aside first (caught live by tests/
    test_metadata_crash_consistency.py::test_interleaved_writers_never_
    tear). Normalize to the documented contract so callers' checked
    rollback logic (plans/metadata.py::_atomic_overwrite) sees one
    failure mode, not two.
    """
    fs, hsrc = _fs_and_path(spark, src)
    _, hdst = _fs_and_path(spark, dst)
    try:
        return bool(fs.rename(hsrc, hdst))
    except Exception as e:  # Py4JJavaError: losing a rename race is a False
        # ... but a permissions error / dead gateway is NOT a race —
        # keep the root cause visible instead of silently eating it
        import logging

        logging.getLogger(__name__).warning(
            "rename %s -> %s raised (normalized to False): %s", src, dst, e
        )
        return False


def delete(spark: SparkSession, path: str) -> bool:
    fs, hpath = _fs_and_path(spark, path)
    return bool(fs.delete(hpath, True))
