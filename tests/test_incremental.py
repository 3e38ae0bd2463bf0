"""Incremental (file-CDC) ingest: only new files processed per tick;
union of ticks ≡ full recompute; idle ticks are no-ops."""

from __future__ import annotations

from pyspark.sql import functions as F

from bmspark import fixtures
from bmspark.plans import incremental, spec


def test_incremental_ticks_equal_full_recompute(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    batch1 = fixtures.synth_pages(spark, 600, partitions=3)
    batch1.write.mode("overwrite").parquet(src)
    s = spec.PipelineSpec(source_path=src, out_dir=out, routes=spec.DEFAULT_ROUTES)

    r1 = incremental.incremental_run(spark, s)
    assert r1 is not None and r1.input_count == 600

    # idle tick: nothing new → no-op, state unchanged
    assert incremental.incremental_run(spark, s) is None
    assert len(incremental.read_state(out)["runs"]) == 1

    # new data arrives (rows 600..999 — disjoint ids, same generator)
    import pandas as pd

    batch2 = spark.createDataFrame(
        pd.DataFrame([fixtures.make_page(i) for i in range(600, 1000)]),
        schema=fixtures.PAGES_SCHEMA,
    ).repartition(2)
    batch2.write.mode("append").parquet(src)

    r2 = incremental.incremental_run(spark, s)
    assert r2 is not None and r2.input_count == 400
    state = incremental.read_state(out)
    assert len(state["runs"]) == 2
    assert state["runs"][1]["n_new_files"] >= 1

    # union over ticks per sink == full recompute on all 1000 rows
    full_out = str(tmp_path / "full")
    full = spec.run_pipeline(
        spark,
        spec.PipelineSpec(source_path=src, out_dir=full_out, routes=spec.DEFAULT_ROUTES),
    )
    for sink in ["sink_en", "sink_romance", "sink_other", "deadletter"]:
        inc_df = incremental.read_sink_union(spark, s, sink).select("url")
        full_df = spark.read.parquet(f"{full_out}/{sink}").select("url")
        assert inc_df.exceptAll(full_df).isEmpty(), sink
        assert full_df.exceptAll(inc_df).isEmpty(), sink
    inc_total = sum(r2.counts.values()) - r2.counts.get("agg_hourly", 0) + (
        sum(r1.counts.values()) - r1.counts.get("agg_hourly", 0)
    )
    full_total = sum(v for k, v in full.counts.items() if k != "agg_hourly")
    assert inc_total == full_total == 1000


def test_incremental_single_pass_mode(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    fixtures.synth_pages(spark, 300, partitions=2).write.parquet(src)
    s = spec.PipelineSpec(
        source_path=src, out_dir=out, routes=spec.DEFAULT_ROUTES,
        route_mode="single_pass",
    )
    r = incremental.incremental_run(spark, s)
    assert r.input_count == 300
    en = incremental.read_sink_union(spark, s, "sink_en")
    assert en.count() == r.counts["sink_en"]


def test_tick_retry_after_crash_sees_late_files(spark, tmp_path):
    """Regression (round-2 advice): a tick that crashed after committing
    sink manifests but BEFORE committing state must not resume those
    manifests when the input file set has since grown — the tick
    fingerprint folds in the planned file list, so the retry rewrites
    every sink from the full new-file set."""
    import pandas as pd

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    fixtures.synth_pages(spark, 300, partitions=2).write.mode("overwrite").parquet(src)
    s = spec.PipelineSpec(source_path=src, out_dir=out, routes=spec.DEFAULT_ROUTES)
    r1 = incremental.incremental_run(spark, s)
    assert r1 is not None and r1.input_count == 300

    # batch B arrives; simulate a tick that ran to sink-commit but crashed
    # before the state commit: run the pipeline into the tick-1 dir with
    # B's files only, writing manifests but never touching state
    def _append(lo, hi, parts):
        df = spark.createDataFrame(
            pd.DataFrame([fixtures.make_page(i) for i in range(lo, hi)]),
            schema=fixtures.PAGES_SCHEMA,
        ).repartition(parts)
        df.write.mode("append").parquet(src)

    _append(300, 500, 1)
    state = incremental.read_state(out)
    seen = set(state["processed_files"])
    files_b = [f for f in sorted(spark.read.parquet(src).inputFiles()) if f not in seen]
    import hashlib

    crashed_spec = spec.PipelineSpec(
        source_path=src,
        out_dir=f"{out}/ticks/000001",
        routes=s.routes,
        input_manifest=hashlib.sha256("\n".join(files_b).encode()).hexdigest()[:16],
    )
    spec.run_pipeline(spark, crashed_spec, pages=spark.read.parquet(*files_b))

    # batch C arrives BEFORE the retry
    _append(500, 600, 1)

    # retry: the tick now plans B ∪ C; its fingerprint differs from the
    # crashed run's, so the committed B-only manifests are invalid and
    # every sink is rewritten — nothing skipped, C's rows present
    r2 = incremental.incremental_run(spark, s)
    assert r2 is not None
    assert r2.input_count == 300  # 200 (B) + 100 (C)
    assert not r2.skipped, f"stale manifests were resumed: {r2.skipped}"

    total = None
    for sink in ["sink_en", "sink_romance", "sink_other", "deadletter"]:
        part = incremental.read_sink_union(spark, s, sink).select("url")
        total = part if total is None else total.unionByName(part)
    all_pages = spark.read.parquet(src).select("url")
    assert total.exceptAll(all_pages).isEmpty()
    assert all_pages.exceptAll(total).isEmpty()
