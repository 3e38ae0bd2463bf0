"""Declarative pipeline spec + compiler — the bigmuddy-shaped API.

The reference's defining interface is ``pipeline.conf``: INI sections
declare input stages, output stages, codecs and metrics, and the daemon
wires them into a dataflow at startup (pipeline.go upstream). The graft
keeps that shape: a PipelineSpec (plain dict / dataclass, loadable from
JSON) declares source → parse → enrich → route → aggregate, and
``run_pipeline`` compiles it into ONE DataFrame DAG:

    scan → parse_full (Arrow UDF) → broadcast-enrich → persist()
        → N conditional sink writes (+ deadletter)        [router]
        → hourly counter aggregate write                   [metrics]
        → per-sink lineage manifests                       [metamonitor]

Resume: sinks whose ``_lineage.json`` matches the spec fingerprint are
skipped (SURVEY.md T6); the run is idempotent and crash-resumable.
"""

from __future__ import annotations

import hashlib
import json
import time
from dataclasses import asdict, dataclass, field

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from bmspark.functions import parse as parse_fns
from bmspark.operators import aggregate as agg_ops
from bmspark.plans import lineage


@dataclass
class RouteRule:
    """One output stage: rows where ``predicate`` (SQL expr over enriched
    columns) is true go to sink ``name`` at ``{out_dir}/{name}``.

    ``fmt`` is the sink's output encoding — the graft of the reference's
    per-output codec (each output stage declares its wire format and the
    router re-encodes per sink; codec dispatch in the output path,
    upstream). parquet | json | csv. Only honored in multi-action route
    mode (single_pass requires a shared format by construction)."""

    name: str
    predicate: str
    fmt: str = "parquet"


@dataclass
class PipelineSpec:
    """Graft of pipeline.conf. ``version`` participates in the plan
    fingerprint — bumping it invalidates resume state."""

    source_path: str
    out_dir: str
    routes: list[RouteRule] = field(default_factory=list)
    #: optional subscription predicate over RAW source columns, applied
    #: before parse — the gRPC dial-in path-subscription analog
    #: (xport_grpc.go upstream: the pipeline subscribes to a subset of
    #: sensor paths; here a subset of pages). On raw columns it reaches
    #: the parquet scan as a pushed filter / partition prune.
    subscription: str | None = None
    deadletter: str = "deadletter"
    enrich_lang_dim: bool = True
    aggregate_name: str = "agg_hourly"
    partition_cols: tuple[str, ...] = ("dt",)
    #: conditional sinks write the DECODED projection (the reference's
    #: sinks receive the re-encoded message, not the wire bytes); raw
    #: payload ships only to the deadletter for reprocessing. At 100 TB
    #: this cuts sink write volume by the html-to-text ratio (~10x).
    sink_columns: tuple[str, ...] = (
        "url", "domain", "lang", "warc_ts", "dt", "title",
        "extracted_text", "text_sha", "n_links", "n_bytes",
        "n_tokens", "simhash",
    )
    #: write all sinks concurrently from driver threads: tasks interleave
    #: on the same executors, per-sink driver latency and commit I/O
    #: overlap. The Go reference does exactly this with per-output
    #: goroutines (pipeline.go upstream).
    parallel_sinks: bool = True
    #: "multi": one write action per sink (per-sink schema/layout — raw
    #: html only in deadletter; the default, matches reference semantics
    #: of independent output stages). "single_pass": route label becomes
    #: a dynamic partition column and the WHOLE fan-out is one write job
    #: — no persist, no per-sink passes; the cheapest correct fan-out
    #: when sinks share a format (sink tables live at
    #: out_dir/routed/__sink=<name>).
    route_mode: str = "multi"
    version: int = 1
    #: hash of the exact input file set this spec was planned against
    #: (set by incremental ticks). Participates in the fingerprint, so a
    #: retry after the input set changed (crash mid-tick, more files
    #: arrived) invalidates partially-committed sink manifests instead of
    #: skipping them with stale, smaller data.
    input_manifest: str | None = None

    def fingerprint(self) -> str:
        blob = json.dumps(asdict(self), sort_keys=True, default=str)
        return hashlib.sha256(blob.encode()).hexdigest()[:16]


@dataclass
class PipelineResult:
    counts: dict[str, int]
    skipped: list[str]
    input_count: int
    wall_secs: float
    docs_per_sec: float
    paths: dict[str, str]


def build_enriched(
    spark: SparkSession,
    spec: PipelineSpec,
    pages: DataFrame | None = None,
    parse_udf=None,
) -> DataFrame:
    """The shared upstream subplan: scan → parse → enrich. Returned
    un-persisted; run_pipeline persists before fan-out."""
    from bmspark import fixtures

    df = pages if pages is not None else spark.read.parquet(spec.source_path)
    if spec.subscription:
        df = df.filter(F.expr(spec.subscription))
    parsed = parse_fns.with_parsed(df, udf=parse_udf)
    flat = parsed.select(
        "*",
        F.col("parsed.title").alias("title"),
        F.col("parsed.text").alias("extracted_text"),
        F.col("parsed.text_sha").alias("text_sha"),
        F.col("parsed.n_links").alias("n_links"),
        F.col("parsed.n_bytes").alias("n_bytes"),
        F.col("parsed.parse_ok").alias("parse_ok"),
        F.col("parsed.n_tokens").alias("n_tokens"),
        F.col("parsed.simhash").alias("simhash"),
    ).drop("parsed")
    if "text" in flat.columns:
        # fixture ground-truth column — not pipeline data; dropping it
        # halves the persisted footprint before fan-out
        flat = flat.drop("text")
    if "domain" not in flat.columns:
        flat = flat.withColumn("domain", parse_fns.domain_of("url"))
    flat = flat.withColumn("dt", F.to_date("warc_ts"))
    if spec.enrich_lang_dim:
        flat = flat.join(F.broadcast(fixtures.dim_lang(spark)), on="lang", how="left")
    return flat


def run_pipeline(
    spark: SparkSession,
    spec: PipelineSpec,
    pages: DataFrame | None = None,
    parse_udf=None,
) -> PipelineResult:
    """Compile + execute the spec. Returns exact per-sink counts (taken by
    Observation inside each write — the metamonitor analog) and writes one
    lineage manifest per sink."""
    if spec.route_mode == "single_pass":
        return _run_single_pass(spark, spec, pages=pages, parse_udf=parse_udf)
    t0 = time.monotonic()
    fp = spec.fingerprint()
    enriched = build_enriched(spark, spec, pages=pages, parse_udf=parse_udf).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    try:
        counts: dict[str, int] = {}
        paths: dict[str, str] = {}
        skipped: list[str] = []

        # fail fast: resolve every route predicate against the enriched
        # schema BEFORE any action — a typo'd predicate must not cost a
        # full parse pass (observed: OOM-then-AnalysisException at 400k
        # rows when validation ran after materialization)
        for rule in spec.routes:
            enriched.filter(F.expr(rule.predicate))

        input_obs = Observation("input")
        enriched.observe(input_obs, F.count(F.lit(1)).alias("n")).write.format(
            "noop"
        ).mode("overwrite").save()
        input_count = input_obs.get["n"]
        # lineage must record what was ACTUALLY consumed: for an explicit
        # pages DataFrame (e.g. an incremental tick's new-file subset)
        # that is pages.inputFiles(), not a relisting of source_path
        try:
            if pages is not None:
                source_files = sorted(pages.inputFiles())
            else:
                source_files = sorted(spark.read.parquet(spec.source_path).inputFiles())
        except Exception:
            source_files = []  # inline DataFrame with no file source

        # NULL-safe routing: a predicate like `lang = 'en'` evaluates NULL
        # for NULL lang; unwrapped, such rows match neither any sink
        # (~dl_pred & NULL is non-true) nor the deadletter (dl_pred | ~NULL
        # is non-true) and silently vanish — violating routed-row equality.
        # coalesce(pred, false) makes NULL-predicate rows fall through to
        # the deadletter, same as single_pass mode's .otherwise().
        dl_pred = ~F.coalesce(F.col("parse_ok"), F.lit(False))
        matched_any = F.lit(False)
        sink_cols = [c for c in spec.sink_columns if c in enriched.columns]
        extra_dims = [c for c in ("lang_name", "lang_family") if c in enriched.columns]
        branches: list[tuple[str, DataFrame]] = []
        for rule in spec.routes:
            pred = F.coalesce(F.expr(rule.predicate), F.lit(False))
            branches.append(
                (rule.name, enriched.filter(~dl_pred & pred).select(*sink_cols, *extra_dims))
            )
            matched_any = matched_any | pred
        # deadletter keeps the raw payload (html) for reprocessing
        branches.append(
            (spec.deadletter, enriched.filter(dl_pred | ~matched_any))
        )

        fmts = {rule.name: rule.fmt for rule in spec.routes}

        def write_sink(name: str, branch: DataFrame) -> tuple[str, int, bool]:
            path = f"{spec.out_dir}/{name}"
            if lineage.is_committed(path, fp):
                return name, lineage.read_manifest(path)["row_count"], True
            obs = Observation(f"sink_{name}_{fp}")
            fmt = fmts.get(name, "parquet")
            observed = branch.observe(obs, F.count(F.lit(1)).alias("n"))
            if fmt == "json":  # binary columns are not JSON-encodable
                observed = observed.drop("html")
            (
                observed.write.mode("overwrite")
                .partitionBy(*spec.partition_cols)
                .format(fmt)
                .save(path)
            )
            n = obs.get["n"]
            lineage.commit_manifest(
                path,
                sink=name,
                row_count=n,
                plan_fingerprint=fp,
                partitions=lineage.output_lineage(path),
                metrics={"input_count": input_count, "source_files": source_files},
            )
            return name, n, False

        for name, _ in branches:
            paths[name] = f"{spec.out_dir}/{name}"
        if spec.parallel_sinks and len(branches) > 1:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=len(branches)) as pool:
                results = list(pool.map(lambda nb: write_sink(*nb), branches))
        else:
            results = [write_sink(n, b) for n, b in branches]
        for name, n, was_skipped in results:
            counts[name] = n
            if was_skipped:
                skipped.append(name)

        # metrics stage: hourly counters (metrics.go analog)
        agg_path = f"{spec.out_dir}/{spec.aggregate_name}"
        paths[spec.aggregate_name] = agg_path
        if lineage.is_committed(agg_path, fp):
            skipped.append(spec.aggregate_name)
            counts[spec.aggregate_name] = lineage.read_manifest(agg_path)["row_count"]
        else:
            agg = agg_ops.hourly_counters(
                enriched.filter(F.col("parse_ok")),
                measures={
                    "total_links": F.sum("n_links"),
                    "total_bytes": F.sum("n_bytes"),
                },
            )
            obs = Observation(f"agg_{fp}")
            agg.observe(obs, F.count(F.lit(1)).alias("n")).write.mode(
                "overwrite"
            ).parquet(agg_path)
            counts[spec.aggregate_name] = obs.get["n"]
            lineage.commit_manifest(
                agg_path, sink=spec.aggregate_name, row_count=counts[spec.aggregate_name],
                plan_fingerprint=fp,
            )

        wall = time.monotonic() - t0
        return PipelineResult(
            counts=counts,
            skipped=skipped,
            input_count=input_count,
            wall_secs=wall,
            docs_per_sec=input_count / wall if wall > 0 else 0.0,
            paths=paths,
        )
    finally:
        enriched.unpersist()


def _run_single_pass(
    spark: SparkSession,
    spec: PipelineSpec,
    pages: DataFrame | None = None,
    parse_udf=None,
) -> PipelineResult:
    """Single-pass fan-out: scan → parse → enrich → ONE partitioned write
    with the route label as a dynamic partition column, counters riding
    the same pass via Observation. No cache, no per-sink jobs — at 10^12
    docs this halves cluster time vs the multi-action router whenever all
    sinks share a format. Raw html is retained only on deadletter rows
    (nulled elsewhere; nulls cost nothing in parquet)."""
    t0 = time.monotonic()
    fp = spec.fingerprint()
    enriched = build_enriched(spark, spec, pages=pages, parse_udf=parse_udf)

    # single_pass is NULL-safe by construction: a NULL predicate is
    # non-true in when(), so the row falls through to .otherwise(deadletter)
    dl_pred = ~F.coalesce(F.col("parse_ok"), F.lit(False))
    label = None
    for rule in spec.routes:
        pred = F.expr(rule.predicate)
        branch_label = F.when(~dl_pred & pred, F.lit(rule.name))
        label = branch_label if label is None else label.when(~dl_pred & pred, F.lit(rule.name))
    label = (label if label is not None else F.when(F.lit(False), F.lit(""))).otherwise(
        F.lit(spec.deadletter)
    )

    sink_cols = [c for c in spec.sink_columns if c in enriched.columns]
    extra = [c for c in ("lang_name", "lang_family") if c in enriched.columns]
    routed = enriched.withColumn("__sink", label).select(
        "__sink",
        *sink_cols,
        *extra,
        F.when(F.col("__sink") == spec.deadletter, F.col("html")).alias("html"),
    )

    routed_path = f"{spec.out_dir}/routed"
    if lineage.is_committed(routed_path, fp):
        m = lineage.read_manifest(routed_path)
        return PipelineResult(
            counts=m["metrics"]["sink_counts"],
            skipped=["routed"],
            input_count=m["metrics"]["input_count"],
            wall_secs=time.monotonic() - t0,
            docs_per_sec=0.0,
            paths={"routed": routed_path},
        )

    obs = Observation(f"route_{fp}_{time.monotonic_ns()}")
    aggs = [F.count(F.lit(1)).alias("__input")] + [
        F.sum(F.when(F.col("__sink") == name, 1).otherwise(0)).alias(name)
        for name in [r.name for r in spec.routes] + [spec.deadletter]
    ]
    (
        routed.observe(obs, *aggs)
        .write.mode("overwrite")
        .partitionBy("__sink", *spec.partition_cols)
        .parquet(routed_path)
    )
    got = obs.get
    counts = {
        name: int(got[name] or 0)
        for name in [r.name for r in spec.routes] + [spec.deadletter]
    }
    input_count = got["__input"]
    lineage.commit_manifest(
        routed_path,
        sink="routed",
        row_count=input_count,
        plan_fingerprint=fp,
        partitions=lineage.output_lineage(routed_path),
        metrics={"input_count": input_count, "sink_counts": counts},
    )
    wall = time.monotonic() - t0
    return PipelineResult(
        counts=counts,
        skipped=[],
        input_count=input_count,
        wall_secs=wall,
        docs_per_sec=input_count / wall if wall else 0.0,
        paths={"routed": routed_path,
               **{r.name: f"{routed_path}/__sink={r.name}" for r in spec.routes},
               spec.deadletter: f"{routed_path}/__sink={spec.deadletter}"},
    )


def reprocess_deadletter(spark: SparkSession, spec: PipelineSpec) -> PipelineResult:
    """Replay the deadletter archive through the salvage decoder — the
    reference's recover-by-replay pattern (replay.go: re-ingest a tap
    archive after fixing the pipeline). Rows that the lenient parse can
    now decode are routed into ``{out_dir}/reprocessed/<sink>``; rows
    that still fail stay in the reprocessed deadletter. The original
    deadletter archive is never mutated (auditable)."""
    dl_path = f"{spec.out_dir}/{spec.deadletter}"
    raw_cols = ["url", "warc_ts", "html", "lang"]
    dl = spark.read.parquet(dl_path)
    raw = dl.select(*[c for c in raw_cols if c in dl.columns])
    sub = PipelineSpec(
        source_path=dl_path,
        out_dir=f"{spec.out_dir}/reprocessed",
        routes=spec.routes,
        deadletter=spec.deadletter,
        enrich_lang_dim=spec.enrich_lang_dim,
        partition_cols=spec.partition_cols,
        sink_columns=spec.sink_columns,
        version=spec.version,
    )
    return run_pipeline(spark, sub, pages=raw, parse_udf=parse_fns.parse_lenient)


DEFAULT_ROUTES = [
    RouteRule("sink_en", "lang = 'en'"),
    RouteRule("sink_romance", "lang IN ('fr','es')"),
    RouteRule("sink_other", "lang NOT IN ('en','fr','es')"),
]
