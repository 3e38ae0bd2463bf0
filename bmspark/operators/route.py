"""Fan-out router — the graft of the reference's core (SURVEY.md S10).

The reference's defining structure (pipeline.go/message.go upstream) is a
broadcast bus: every input message is delivered to every configured output
stage, each output applies its own encoding/filtering, and per-stage
counters record delivered/dropped. The graft reproduces this as N
conditional writes from ONE persisted upstream DataFrame:

    scan → parse → enrich → persist() → [filter(pred_i) → write(sink_i)]*
                                       → filter(no pred) → write(deadletter)

with per-sink counts taken via ``Observation`` (zero extra passes — the
metamonitor analog, metamonitor.go upstream) and routed-row equality
(union of sinks + deadletter ≡ input) as the correctness contract
(BASELINE.json north_rule).

Scale notes:
- ``persist(MEMORY_AND_DISK)`` is MANDATORY, not an optimization: Catalyst
  does not share subplans across write actions, so without it the scan +
  parse UDF re-execute once per sink (SURVEY.md §4.3.2).
- each sink write partitions by (dt, domain_bucket) — hive layout standing
  in for Iceberg ``days(warc_ts) × bucket(domain)``; partition count stays
  bounded (days × buckets) no matter the data volume.
- routing predicates are evaluated JVM-side on enriched columns — the
  cost model is one codegen'd filter per sink over cached columnar data.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


@dataclass
class SinkSpec:
    """One output stage (reference: a [section] with stage=xport_output).

    mode:
      - "conditional": receives rows matching ``predicate`` (router
        partition semantics; participates in routed-row equality)
      - "broadcast": receives ALL rows (reference's native broadcast
        semantics — e.g. a raw tap archive; excluded from equality)
      - "countonly": no rows written, only the count observed
        (tap.go ``countonly=true``)
    """

    name: str
    predicate: Column | None = None
    path: str | None = None
    mode: str = "conditional"
    fmt: str = "parquet"
    partition_by: list[str] = field(default_factory=list)


@dataclass
class RouteResult:
    counts: dict[str, int]
    paths: dict[str, str]
    input_count: int
    #: sink name → mode ("conditional" | "broadcast"; deadletter recorded
    #: as "deadletter") — lets routed-row-equality checks exclude
    #: broadcast sinks, which receive ALL rows by design
    modes: dict[str, str] = field(default_factory=dict)


def route(
    df: DataFrame,
    sinks: list[SinkSpec],
    deadletter_path: str | None = None,
    extra_deadletter_pred: Column | None = None,
) -> RouteResult:
    """Execute the fan-out. Returns exact per-sink counts (Observation —
    measured inside each write action, no second pass).

    Deadletter receives rows that (a) match ``extra_deadletter_pred``
    (e.g. parse failures) or (b) match no conditional sink. Conditional
    sinks see only rows NOT claimed by the deadletter predicate, so
    sinks ∪ deadletter partitions the input exactly when the sink
    predicates partition the non-deadletter rows.
    """
    df = df.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        counts: dict[str, int] = {}
        paths: dict[str, str] = {}
        modes: dict[str, str] = {}
        input_obs = Observation("router_input")
        df_obs = df.observe(input_obs, F.count(F.lit(1)).alias("n"))
        # one cheap action materializes the cache + input counter
        df_obs.write.format("noop").mode("overwrite").save()
        input_count = input_obs.get["n"]

        # NULL-safe routing (see plans/spec.py): coalesce(pred, false) so a
        # NULL-evaluating predicate row falls to the deadletter instead of
        # vanishing from both the sink and the deadletter.
        dl_pred = (
            F.coalesce(extra_deadletter_pred, F.lit(False))
            if extra_deadletter_pred is not None
            else F.lit(False)
        )
        routable = df.filter(~dl_pred)

        matched_any = F.lit(False)
        for s in sinks:
            pred = (
                F.coalesce(s.predicate, F.lit(False))
                if s.predicate is not None
                else None
            )
            if s.mode == "broadcast":
                branch = df
            elif s.mode == "countonly":
                branch = routable.filter(pred) if pred is not None else routable
                counts[s.name] = branch.count()
                continue
            else:
                branch = routable.filter(pred)
                matched_any = matched_any | pred
            obs = Observation(f"sink_{s.name}")
            branch = branch.observe(obs, F.count(F.lit(1)).alias("n"))
            writer = branch.write.mode("overwrite").format(s.fmt)
            if s.partition_by:
                writer = writer.partitionBy(*s.partition_by)
            writer.save(s.path)
            counts[s.name] = obs.get["n"]
            paths[s.name] = s.path
            modes[s.name] = s.mode

        if deadletter_path is not None:
            dl = df.filter(dl_pred | ~matched_any)
            obs = Observation("sink_deadletter")
            dl = dl.observe(obs, F.count(F.lit(1)).alias("n"))
            dl.write.mode("overwrite").parquet(deadletter_path)
            counts["deadletter"] = obs.get["n"]
            paths["deadletter"] = deadletter_path
            modes["deadletter"] = "deadletter"
        return RouteResult(
            counts=counts, paths=paths, input_count=input_count, modes=modes
        )
    finally:
        df.unpersist()


def observe_counts(df: DataFrame, sinks: list[SinkSpec]) -> dict[str, int]:
    """Single-pass countonly router: ALL sink counters from ONE scan via
    one Observation with a conditional count per sink (tap countonly=true
    for every output at once — the metamonitor shape, zero data movement).

    This is the scale path for counter-only fan-out: at 10^12 docs it
    costs exactly one pass with no shuffle, no cache, no writes — the
    counters ride the scan. Also the compute-bound job used for the
    N-vs-4N scaling evidence (disk-free, so throughput tracks cores).
    """
    obs = Observation("router_counts")
    aggs = [F.count(F.lit(1)).alias("__input")]
    for s in sinks:
        pred = s.predicate if s.predicate is not None else F.lit(True)
        aggs.append(
            F.sum(F.when(pred, 1).otherwise(0)).alias(s.name)
        )
    df.observe(obs, *aggs).write.format("noop").mode("overwrite").save()
    got = obs.get
    return {"input": got["__input"], **{s.name: int(got[s.name] or 0) for s in sinks}}


def check_routed_equality(
    spark, input_df: DataFrame, result: RouteResult, key_cols: list[str]
) -> dict[str, bool]:
    """Routing algebra (SURVEY.md O3, §5.2.4): union(conditional sinks ∪
    deadletter) ≡ input via exceptAll both directions; sinks pairwise
    disjoint. Broadcast sinks receive ALL rows by design and are excluded
    (result.modes records each sink's mode). Returns named boolean checks."""
    names = [
        n
        for n, p in result.paths.items()
        if result.modes.get(n, "conditional") in ("conditional", "deadletter")
    ]
    union = None
    for n in names:
        part = spark.read.parquet(result.paths[n]).select(*key_cols)
        union = part if union is None else union.unionByName(part)
    inp = input_df.select(*key_cols)
    checks = {
        "no_lost_rows": inp.exceptAll(union).isEmpty(),
        "no_invented_rows": union.exceptAll(inp).isEmpty(),
    }
    for i in range(len(names)):
        for j in range(i + 1, len(names)):
            a = spark.read.parquet(result.paths[names[i]]).select(*key_cols)
            b = spark.read.parquet(result.paths[names[j]]).select(*key_cols)
            checks[f"disjoint_{names[i]}_{names[j]}"] = a.intersect(b).isEmpty()
    return checks
