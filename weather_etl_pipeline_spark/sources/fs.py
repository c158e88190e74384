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

    Only the IOException family the race actually produces is
    normalized; a permissions error, dead gateway, or Python-side bug
    re-raises — conflating those with the benign lost-rename race would
    hide fatal misconfiguration behind a generic "swap failed".
    """
    from py4j.protocol import Py4JJavaError

    fs, hsrc = _fs_and_path(spark, src)
    _, hdst = _fs_and_path(spark, dst)
    try:
        return bool(fs.rename(hsrc, hdst))
    except Py4JJavaError as e:
        # the race manifests as FileNotFoundException (source moved
        # aside mid-call) or a bare IOException subclass from the
        # FileSystem impl; anything else (AccessControlException,
        # IllegalArgumentException, ...) is a real fault. Connectivity
        # faults (dead HDFS/S3 gateway) also extend IOException, so
        # they are re-raised BY NAME — normalizing those to False would
        # report a cluster outage as a benign lost-rename race.
        _FATAL = (
            "org.apache.hadoop.security.AccessControlException",
            "java.net.ConnectException",
            "java.net.SocketTimeoutException",
            "java.net.UnknownHostException",
            "org.apache.hadoop.net.ConnectTimeoutException",
        )
        jexc = e.java_exception
        names = []
        jcls = jexc.getClass()
        while jcls is not None:
            names.append(jcls.getName())
            jcls = jcls.getSuperclass()
        if not any(
            n in ("java.io.FileNotFoundException", "java.io.IOException")
            for n in names
        ) or any(n in names for n in _FATAL):
            raise
        import logging

        logging.getLogger(__name__).warning(
            "rename %s -> %s raised %s (normalized to False): %s",
            src,
            dst,
            names[0],
            e,
        )
        return False


def delete(spark: SparkSession, path: str) -> bool:
    fs, hpath = _fs_and_path(spark, path)
    return bool(fs.delete(hpath, True))


def touch(spark: SparkSession, path: str) -> None:
    """Create an empty file at ``path`` (parents included), overwriting
    any existing one — the commit-marker primitive (idempotent: a
    replay re-touching an existing marker is a no-op result-wise)."""
    fs, hpath = _fs_and_path(spark, path)
    fs.create(hpath, True).close()


def copy_tree(spark: SparkSession, src: str, dst: str) -> None:
    """Recursive copy (file or dir) via Hadoop's FileUtil — used to
    carry sidecar markers into a staged table rewrite. Raises on
    failure (FileUtil.copy returns false / throws)."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    fs_src, hsrc = _fs_and_path(spark, src)
    fs_dst, hdst = _fs_and_path(spark, dst)
    ok = jvm.org.apache.hadoop.fs.FileUtil.copy(
        fs_src, hsrc, fs_dst, hdst, False, conf
    )
    if not ok:
        raise IOError(f"copy_tree: could not copy {src} -> {dst}")


def list_dir(spark: SparkSession, path: str) -> list[str]:
    """Names (not full paths) of the immediate children of ``path``;
    empty list if the dir is missing."""
    fs, hpath = _fs_and_path(spark, path)
    if not fs.exists(hpath):
        return []
    return [st.getPath().getName() for st in fs.listStatus(hpath)]
