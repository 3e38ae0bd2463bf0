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
