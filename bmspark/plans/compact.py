"""Small-file compaction — table maintenance for incremental sinks.

Incremental ticks and streaming micro-batches accrete small files; at
object-storage scale small files dominate job latency (listing + open
overhead per task). This job bin-packs each hive partition back to
target-sized files, rewriting atomically (write to _compact_tmp, swap,
drop old) so readers never see a partial state.

Iceberg's rewrite_data_files does this natively; this is the parquet-
fallback twin, driven by the same footer metadata as the lineage
manifests (no data scan to DECIDE — only rewritten partitions are read).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import SparkSession


def partition_file_stats(path: str) -> dict[str, list[tuple[str, int]]]:
    """hive-partition dir → [(file, bytes)] from the filesystem only."""
    out: dict[str, list[tuple[str, int]]] = {}
    for dirpath, _dirs, files in os.walk(path):
        parquet = [f for f in files if f.endswith(".parquet")]
        if not parquet:
            continue
        rel = os.path.relpath(dirpath, path)
        out[rel] = [
            (f, os.path.getsize(os.path.join(dirpath, f))) for f in sorted(parquet)
        ]
    return out


_OLD_SUFFIX = "_compact_old"
_TMP_SUFFIX = "_compact_tmp"


def recover_interrupted(path: str) -> dict[str, str]:
    """Crash recovery (ADVICE r2 #5): a prior compact may have died
    mid-swap, leaving ``.<leaf>_compact_old`` / ``_tmp`` siblings behind.
    If the live partition is MISSING, the crash hit between the two
    os.replace calls — restore it from old (the data was intact there).
    Then clear remaining swap dirs so this run's os.replace calls can't
    raise ENOTEMPTY and wedge the partition. Returns
    {partition_leaf: action} for observability."""
    actions: dict[str, str] = {}
    for dirpath, dirs, _files in os.walk(path):
        for d in list(dirs):
            if not (d.startswith(".") and (d.endswith(_OLD_SUFFIX) or d.endswith(_TMP_SUFFIX))):
                continue
            swap_dir = os.path.join(dirpath, d)
            if d.endswith(_OLD_SUFFIX):
                leaf = d[1:-len(_OLD_SUFFIX)]
                live = os.path.join(dirpath, leaf)
                if not os.path.isdir(live):
                    os.replace(swap_dir, live)
                    actions[leaf] = "restored_from_old"
                    dirs.remove(d)
                    continue
            shutil.rmtree(swap_dir, ignore_errors=True)
            dirs.remove(d)
            actions.setdefault(d.lstrip("."), "removed_leftover")
    return actions


def compact(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    min_files_to_compact: int = 4,
) -> dict:
    """Rewrite partitions whose files are many-and-small. Returns a
    summary {partition: (files_before, files_after)}. Row fidelity is the
    caller-visible contract (asserted in tests). Starts by recovering any
    swap dirs a crashed prior run left behind (recover_interrupted), so
    stats are computed over the restored live tree."""
    recover_interrupted(path)
    stats = partition_file_stats(path)
    summary = {}
    for part, files in stats.items():
        total = sum(sz for _f, sz in files)
        if len(files) < min_files_to_compact or total / len(files) >= target_file_bytes / 2:
            continue
        n_out = max(1, round(total / target_file_bytes))
        part_dir = os.path.join(path, part) if part != "." else path
        # swap dirs are dot-prefixed SIBLINGS: Spark/Hive file indexes
        # ignore dot/underscore-prefixed paths, so concurrent readers of
        # the table root never see them as extra partitions while the
        # swap is in flight
        parent, leaf = os.path.split(part_dir)
        tmp_dir = os.path.join(parent, f".{leaf}{_TMP_SUFFIX}")
        (
            spark.read.parquet(part_dir)
            .coalesce(n_out)
            .write.mode("overwrite")
            .parquet(tmp_dir)
        )
        # swap: move old out, tmp in, drop old. The window between the
        # two os.replace calls is NOT atomic — a crash there leaves the
        # partition momentarily absent; the next run's recover_interrupted
        # renames .<leaf>_compact_old back. Readers never see duplicates.
        old_dir = os.path.join(parent, f".{leaf}{_OLD_SUFFIX}")
        os.replace(part_dir, old_dir) if os.path.isdir(part_dir) else None
        os.replace(tmp_dir, part_dir)
        shutil.rmtree(old_dir, ignore_errors=True)
        summary[part] = (len(files), n_out)
    return summary
