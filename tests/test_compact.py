"""Compaction: fewer files, identical rows, partitions below threshold
left untouched."""

from __future__ import annotations

from bmspark import fixtures
from bmspark.plans import compact


def test_compact_preserves_rows_and_reduces_files(spark, tmp_path):
    path = str(tmp_path / "tbl")
    pages = fixtures.synth_pages(spark, 1200, partitions=24)  # 24 tiny files
    pages.write.mode("overwrite").parquet(path)
    before = spark.read.parquet(path).select("url").collect()
    stats0 = compact.partition_file_stats(path)
    assert sum(len(v) for v in stats0.values()) >= 24

    summary = compact.compact(spark, path, target_file_bytes=64 * 1024 * 1024)
    assert summary, "nothing compacted"
    stats1 = compact.partition_file_stats(path)
    assert sum(len(v) for v in stats1.values()) < sum(len(v) for v in stats0.values())

    after = spark.read.parquet(path).select("url").collect()
    assert sorted(r.url for r in before) == sorted(r.url for r in after)


def test_compact_skips_healthy_partitions(spark, tmp_path):
    path = str(tmp_path / "tbl2")
    fixtures.synth_pages(spark, 500, partitions=2).write.parquet(path)
    summary = compact.compact(
        spark, path, target_file_bytes=64 * 1024 * 1024, min_files_to_compact=4
    )
    assert summary == {}  # only 2 files — below the compaction threshold


def test_compact_recovers_from_crashed_swap(spark, tmp_path):
    """ADVICE r2 #5: simulate the two crash windows — (a) died BETWEEN
    the os.replace calls (live partition missing, data in _compact_old):
    the next run restores it and compacts normally; (b) died AFTER the
    swap but before cleanup (stale non-empty _compact_old next to a live
    partition): the leftover is removed, not ENOTEMPTY-wedged."""
    import os
    import shutil

    root = tmp_path / "tbl3"
    path = str(root)
    pages = fixtures.synth_pages(spark, 1200, partitions=24)
    pages.write.mode("overwrite").parquet(path)
    before = sorted(
        r.url for r in spark.read.parquet(path).select("url").collect()
    )

    # (a) mid-swap crash: partition dir moved to .<leaf>_compact_old,
    # live dir gone (tbl3 is an unpartitioned table → leaf = tbl3 itself)
    os.replace(path, str(tmp_path / ".tbl3_compact_old"))
    assert not root.exists()
    actions = compact.recover_interrupted(str(tmp_path))
    assert actions.get("tbl3") == "restored_from_old"
    after = sorted(r.url for r in spark.read.parquet(path).select("url").collect())
    assert after == before

    # (b) stale old + tmp dirs NEXT TO a live partition: removed, then a
    # fresh compact over the same root succeeds (no ENOTEMPTY)
    shutil.copytree(path, str(tmp_path / ".tbl3_compact_old"))
    shutil.copytree(path, str(tmp_path / ".tbl3_compact_tmp"))
    summary = compact.compact(
        spark, str(tmp_path), target_file_bytes=64 * 1024 * 1024
    )
    assert not (tmp_path / ".tbl3_compact_old").exists()
    assert not (tmp_path / ".tbl3_compact_tmp").exists()
    assert summary, "nothing compacted after recovery"
    final = sorted(r.url for r in spark.read.parquet(path).select("url").collect())
    assert final == before
