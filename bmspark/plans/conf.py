"""INI ``pipeline.conf`` loader — the reference's configuration surface.

The reference is configured entirely through an INI file: each section
declares a stage (``stage = xport_input`` / ``xport_output``), its
transport ``type`` (tcp/grpc/kafka/file/replay), codec/encoding, and the
daemon wires the declared stages into a dataflow at startup (pipeline.go
config loader, upstream final branch). This module is the thin bridge
from that exact file shape to a :class:`bmspark.plans.spec.PipelineSpec`
— so a bigmuddy-shaped conf runs on the Spark engine unchanged in
spirit: one input stage, N output stages, a metrics stage.

Recognized layout::

    [default]
    id = mypipeline          ; optional, recorded nowhere (daemon name)
    out = /data/out          ; output root (CLI --out overrides)
    deadletter = deadletter  ; optional sink rename
    route_mode = multi       ; multi | single_pass
    version = 1

    [pages_in]
    stage = xport_input
    type = file              ; file | kafka
    file = /data/pages       ; for type=file
    subscription = lang IS NOT NULL   ; optional raw-column predicate

    [sink_en]
    stage = xport_output
    predicate = lang = 'en'
    encoding = parquet       ; parquet | json | csv (per-output codec)

    [metrics]
    stage = metrics
    name = agg_hourly

Kafka input stages (type = kafka) carry the reference's consumer options
(``brokers``, ``topic``, ``consumergroup``); :func:`kafka_options` maps
them to Structured Streaming's kafka source options and
:func:`build_kafka_stream` constructs the ``readStream`` — the code path
exists and is config-mapped even though this sandbox has no kafka
connector jar (the test suite asserts the mapping and skips the load).
"""

from __future__ import annotations

import configparser
import io

from bmspark.plans.spec import PipelineSpec, RouteRule

_INPUT_STAGES = {"xport_input", "input"}
_OUTPUT_STAGES = {"xport_output", "output"}


def parse_conf(text: str) -> configparser.ConfigParser:
    cp = configparser.ConfigParser(inline_comment_prefixes=(";", "#"))
    cp.read_file(io.StringIO(text))
    return cp


def load_spec(
    conf: str | configparser.ConfigParser,
    out_dir: str | None = None,
    source_path: str | None = None,
) -> PipelineSpec:
    """Compile an INI pipeline.conf (text or parsed) into a PipelineSpec.
    ``out_dir`` / ``source_path`` override the conf (CLI wins, same
    precedence as the reference's flag-over-file rule)."""
    cp = parse_conf(conf) if isinstance(conf, str) else conf
    default = cp["default"] if cp.has_section("default") else {}

    src = source_path
    subscription = None
    for name in cp.sections():
        sec = cp[name]
        if sec.get("stage") in _INPUT_STAGES:
            if sec.get("type", "file") == "file" and src is None:
                src = sec.get("file")
            subscription = sec.get("subscription", subscription)

    routes: list[RouteRule] = []
    for name in cp.sections():
        sec = cp[name]
        if sec.get("stage") in _OUTPUT_STAGES:
            pred = sec.get("predicate")
            if pred is None:
                raise ValueError(f"output stage [{name}] missing predicate")
            routes.append(RouteRule(name, pred, fmt=sec.get("encoding", "parquet")))

    agg_name = "agg_hourly"
    for name in cp.sections():
        if cp[name].get("stage") == "metrics":
            agg_name = cp[name].get("name", agg_name)

    if src is None:
        raise ValueError("no input stage with a file= path and no source_path given")
    out = out_dir or default.get("out")
    if out is None:
        raise ValueError("no [default] out= and no out_dir given")

    return PipelineSpec(
        source_path=src,
        out_dir=out,
        routes=routes,
        subscription=subscription,
        deadletter=default.get("deadletter", "deadletter"),
        aggregate_name=agg_name,
        route_mode=default.get("route_mode", "multi"),
        version=int(default.get("version", 1)),
    )


# ---------------------------------------------------------------------------
# Kafka input stage (xport_kafka analog)
# ---------------------------------------------------------------------------

def kafka_options(section) -> dict[str, str]:
    """Map a bigmuddy kafka input section to Structured Streaming kafka
    source options. Reference keys: brokers, topic, consumergroup."""
    if section.get("type") != "kafka":
        raise ValueError("not a kafka stage")
    opts = {
        "kafka.bootstrap.servers": section["brokers"],
        "subscribe": section["topic"],
        "startingOffsets": section.get("startingoffsets", "earliest"),
    }
    if section.get("consumergroup"):
        opts["kafka.group.id"] = section["consumergroup"]
    if section.get("maxoffsetspertrigger"):
        opts["maxOffsetsPerTrigger"] = section["maxoffsetspertrigger"]
    return opts


def build_kafka_stream(spark, options: dict[str, str]):
    """readStream.format("kafka") with the mapped options. Requires the
    spark-sql-kafka connector jar on the cluster; calling .load() without
    it raises — the builder itself is jar-free and unit-testable."""
    reader = spark.readStream.format("kafka")
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader
