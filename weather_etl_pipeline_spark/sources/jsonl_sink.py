"""Custom Python DataSource WRITER (Spark 4) — JSONL export sink.

Completes the custom-connector story next to the weather DataSource
READER (`weather_source.py`): the executor-side write protocol with a
driver-side commit. Each task serializes its partition to a temp JSONL
part file and returns the path + row count in its commit message; the
driver's `commit()` atomically publishes the parts (rename into the
target dir) and writes a `_MANIFEST.json` with per-part counts — the
same task-attempt/commit separation real sinks (parquet's
_spark_metadata, Iceberg snapshots) are built on, so speculative or
retried tasks can never double-publish.

Scale posture: one part file per partition, no driver data movement —
the driver only sees paths and counts. JSONL is the interchange format
for LLM-corpus handoff (tokenizer/training pipelines).
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql.datasource import (
    DataSource,
    DataSourceWriter,
    WriterCommitMessage,
)


class _PartCommit(WriterCommitMessage):
    def __init__(self, path: str, n_rows: int):
        self.path = path
        self.n_rows = n_rows


class JsonlWriter(DataSourceWriter):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl sink requires a 'path' option")
        self.staging = os.path.join(self.path, "_staging")

    def write(self, rows) -> _PartCommit:
        os.makedirs(self.staging, exist_ok=True)
        part = os.path.join(self.staging, f"part-{uuid.uuid4().hex}.jsonl")
        n = 0
        with open(part, "w", encoding="utf-8") as f:
            for row in rows:
                f.write(json.dumps(row.asDict(), default=str) + "\n")
                n += 1
        return _PartCommit(part, n)

    def commit(self, messages) -> None:
        manifest = []
        for i, m in enumerate(messages):
            final = os.path.join(self.path, f"part-{i:05d}.jsonl")
            os.replace(m.path, final)
            manifest.append({"file": os.path.basename(final), "rows": m.n_rows})
        with open(os.path.join(self.path, "_MANIFEST.json"), "w") as f:
            json.dump({"parts": manifest, "total": sum(p["rows"] for p in manifest)}, f)
        try:
            os.rmdir(self.staging)
        except OSError:
            pass  # leftover aborted-task parts keep the dir non-empty

    def abort(self, messages) -> None:
        for m in messages:
            try:
                os.remove(m.path)
            except OSError:
                pass


class JsonlSink(DataSource):
    @classmethod
    def name(cls) -> str:
        return "jsonl_sink"

    def writer(self, schema, overwrite: bool) -> JsonlWriter:
        return JsonlWriter(self.options)


def register_jsonl_sink(spark) -> None:
    spark.dataSource.register(JsonlSink)
