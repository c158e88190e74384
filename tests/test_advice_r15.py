"""Round-15 ADVICE regressions — one test per advisor finding.

1. ``table_file_bytes``'s os.walk fast path must skip Hadoop marker
   files (``_SUCCESS``, ``.part-*.crc``) exactly like the Hadoop
   ChecksumFileSystem listing it replaced, so directory-shaped tables
   report data bytes only.
(The asof NULL-left-pred carry fix is pinned in
tests/test_asof_same_scan.py::test_same_scan_null_left_pred_carries.)
"""

from __future__ import annotations

import os

from weather_etl_pipeline_spark.catalog import table_file_bytes


def test_table_file_bytes_skips_hidden_and_marker_files(tmp_path):
    tdir = tmp_path / "mytable.parquet"
    tdir.mkdir()
    (tdir / "part-00000.snappy.parquet").write_bytes(b"x" * 1000)
    (tdir / "part-00001.snappy.parquet").write_bytes(b"y" * 500)
    # Hadoop artifacts the ChecksumFileSystem listing never returned
    (tdir / "_SUCCESS").write_bytes(b"")
    (tdir / ".part-00000.snappy.parquet.crc").write_bytes(b"z" * 64)
    (tdir / "._COMMITTED_123").write_bytes(b"w" * 32)
    # spark unused on the local-dir fast path
    assert table_file_bytes(None, str(tmp_path), "mytable") == 1500


def test_table_file_bytes_single_file_and_amplification(tmp_path):
    (tmp_path / "t.parquet").write_bytes(b"a" * 123)
    assert table_file_bytes(None, str(tmp_path), "t") == 123
    # @xN amplification multiplies fact-table listings; 't' is not a
    # fact table so replication stays 1
    assert table_file_bytes(None, str(tmp_path) + "@x10", "t") == 123


def test_table_file_bytes_dir_amplification_counts_data_only(tmp_path):
    from weather_etl_pipeline_spark.catalog import _SCALE_FACT_TABLES

    name = sorted(_SCALE_FACT_TABLES)[0]
    tdir = tmp_path / f"{name}.parquet"
    tdir.mkdir()
    (tdir / "part-00000.snappy.parquet").write_bytes(b"x" * 100)
    (tdir / "_SUCCESS").write_bytes(b"")
    assert table_file_bytes(None, str(tmp_path) + "@x10", name) == 1000
