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
    fs, hsrc = _fs_and_path(spark, src)
    _, hdst = _fs_and_path(spark, dst)
    return bool(fs.rename(hsrc, hdst))


def delete(spark: SparkSession, path: str) -> bool:
    fs, hpath = _fs_and_path(spark, path)
    return bool(fs.delete(hpath, True))
