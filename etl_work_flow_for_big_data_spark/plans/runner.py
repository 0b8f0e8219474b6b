"""Batch pipeline runner: source → compiled spec → sink, all three
resolved by name from their registries — the one-call equivalent of a
reference component run (fetch/read, session chain, writer demux;
``MFramework::Run``, MFramework.cpp:89-339) for batch workloads.
Streaming pipelines keep using ``streaming.engine.PipelineManager``
with builder functions, where lifecycle matters.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from etl_work_flow_for_big_data_spark.plans.spec import PipelineSpec
from etl_work_flow_for_big_data_spark.sources.registry import (
    DEFAULT as SOURCES,
    SINKS,
)


@dataclass(frozen=True)
class IOBinding:
    """A named-format endpoint: ``fmt`` resolved in the source or sink
    registry, plus its path and options."""

    fmt: str
    path: str
    options: dict[str, Any] = field(default_factory=dict)


def run_batch_pipeline(
    spark: SparkSession,
    spec: PipelineSpec,
    source: IOBinding,
    sink: IOBinding | None = None,
) -> DataFrame:
    """Read ``source``, compile the spec's operator chain over it (ONE
    Catalyst plan — stage hops cost nothing), and write to ``sink`` if
    given. Returns the output DataFrame either way (pre-write plan, so
    callers can inspect/extend it). If the spec declares a terminal
    route (``next_component_type``) and the sink does not override
    ``partition_by``, routed sinks partition by the route column when
    present."""
    df = SOURCES.read(spark, source.fmt, source.path, **source.options)
    out = spec.compile(df)
    if sink is not None:
        opts = dict(sink.options)
        if (
            "partition_by" not in opts
            and spec.route is not None
            and "route" in out.columns
        ):
            opts["partition_by"] = ["route"]
        SINKS.write(sink.fmt, out, sink.path, **opts)
    return out
