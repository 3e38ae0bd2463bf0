"""Per-partition lineage manifests + checkpoint resume (SURVEY.md T6, §4.3.4).

The reference's resumability is its replay input (replay.go upstream):
re-ingest an immutable tap archive from the top. The north_rule demands
more: *checkpoint-resumable execution carrying per-partition lineage and
metrics*. Spark's batch writer has no such sink, so this module implements
it storage-side, Iceberg-commit-style:

- every sink write ends with an atomically-renamed ``_lineage.json``
  recording: sink name, row count, input files consumed
  (``input_file_name()``), per-spark-partition row counts, stage versions,
  attempt id, wall time.
- a sink whose manifest exists and matches the current plan fingerprint is
  SKIPPED on re-run (resume); a missing/partial sink re-executes. Combined
  with deterministic inputs this gives idempotent, resumable multi-sink
  jobs — the batch analog of streaming's checkpointLocation.

Atomicity without Iceberg: write to ``_lineage.json.tmp`` + fsync +
``os.replace`` (POSIX atomic rename); the manifest is the commit marker,
so a crash mid-write leaves no marker and the sink re-runs.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MANIFEST = "_lineage.json"


def partition_lineage(df: DataFrame) -> list[dict]:
    """Per-spark-partition lineage rows: (partition id, rows, input files),
    computed with an extra aggregation over the branch. NOTE: costs a full
    scan and loses input_file_name() through a cache — prefer
    ``output_lineage`` (parquet-footer walk, near-free) for written sinks;
    this form remains for non-parquet sinks."""
    rows = (
        df.select(
            F.spark_partition_id().alias("partition_id"),
            F.input_file_name().alias("input_file"),
        )
        .groupBy("partition_id")
        .agg(
            F.count(F.lit(1)).alias("rows"),
            F.array_sort(F.collect_set("input_file")).alias("input_files"),
        )
        .collect()
    )
    return [
        {
            "partition_id": r["partition_id"],
            "rows": r["rows"],
            "input_files": [f for f in r["input_files"] if f],
        }
        for r in sorted(rows, key=lambda r: r["partition_id"])
    ]


def output_lineage(path: str) -> list[dict]:
    """Per-output-partition lineage from the written parquet footers: one
    entry per data file with (file, hive partition values, rows). Pure
    footer metadata reads — O(files), no Spark job, no data scan. This is
    the Iceberg-manifest analog for the parquet fallback."""
    out = []
    for dirpath, _dirnames, filenames in os.walk(path):
        for fn in sorted(filenames):
            if not fn.endswith(".parquet"):
                continue
            fp = os.path.join(dirpath, fn)
            rel = os.path.relpath(fp, path)
            parts = dict(
                seg.split("=", 1)
                for seg in rel.split(os.sep)[:-1]
                if "=" in seg
            )
            import pyarrow.parquet as pq

            out.append({
                "file": rel,
                "partition_values": parts,
                "rows": pq.ParquetFile(fp).metadata.num_rows,
            })
    return out


def commit_manifest(
    path: str,
    sink: str,
    row_count: int,
    plan_fingerprint: str,
    partitions: list[dict] | None = None,
    metrics: dict | None = None,
    attempt: int = 0,
) -> dict:
    """Atomically commit the lineage manifest for a completed sink write."""
    manifest = {
        "sink": sink,
        "row_count": row_count,
        "plan_fingerprint": plan_fingerprint,
        "partitions": partitions or [],
        "metrics": metrics or {},
        "attempt": attempt,
        "committed_at": time.time(),
        "version": 1,
    }
    os.makedirs(path, exist_ok=True)
    tmp = os.path.join(path, MANIFEST + ".tmp")
    final = os.path.join(path, MANIFEST)
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, final)
    return manifest


def read_manifest(path: str) -> dict | None:
    p = os.path.join(path, MANIFEST)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def is_committed(path: str, plan_fingerprint: str) -> bool:
    """Resume predicate: sink already written by THIS plan version."""
    m = read_manifest(path)
    return bool(m) and m.get("plan_fingerprint") == plan_fingerprint
