"""Pipeline spec: topology-as-data compiled to one DataFrame plan.

The reference defines its stage graph relationally — one row per
session (stage) in a per-component session table, edges in
``M_LINKED_SESSIONS`` (``/root/reference/MFramework.cpp:938-1014``);
the framework instantiates each stage's plugin and wires them with
queues. Our spec mirrors those tables 1:1 (see FIXTURES.md
``pipeline_spec``) but compiles to a *single chained DataFrame plan*:
stages are named operators from the registry, composition is function
composition, and Catalyst fuses the whole chain into as few physical
stages as the shuffles require — the queue hops cost nothing.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame

from etl_work_flow_for_big_data_spark.operators.registry import (
    DEFAULT,
    OperatorRegistry,
)


@dataclass(frozen=True)
class Stage:
    """One pipeline stage — the analog of a session row
    (session_id / SO name / linked next session,
    MFramework.cpp:966-975, :1000-1001)."""

    session_id: int
    operator: str
    session_name: str = ""
    params: dict[str, Any] = field(default_factory=dict)
    next_session_id: int | None = None
    next_component_type: str | None = None  # route tag for the sink


@dataclass
class PipelineSpec:
    name: str
    stages: list[Stage]

    @classmethod
    def from_dataframe(cls, name: str, df: DataFrame) -> "PipelineSpec":
        """Load the topology from a relational table — the literal
        M_SESSION/M_LINKED_SESSIONS pattern (the reference reads its
        pipeline graph from Oracle, MFramework.cpp:938-1014; here any
        DataFrame with the ``pipeline_spec`` schema of FIXTURES.md §B
        works: jdbc, parquet, csv...). Params may be a JSON string
        column ``params``."""
        import json

        rows = []
        for r in df.collect():  # topology tables are tiny by definition
            d = r.asDict()
            if isinstance(d.get("params"), str):
                try:
                    d["params"] = json.loads(d["params"]) if d["params"] else {}
                except json.JSONDecodeError as exc:
                    raise ValueError(
                        f"pipeline {name}: session_id "
                        f"{d.get('session_id')} has invalid params JSON: "
                        f"{d['params']!r}"
                    ) from exc
            rows.append(d)
        return cls.from_rows(name, rows)

    @classmethod
    def from_rows(cls, name: str, rows: list[dict[str, Any]]) -> "PipelineSpec":
        """Build from session-table-shaped dicts (keys: session_id,
        operator_name, session_name, params?, next_session_id,
        next_component_type) — the M_LINKED_SESSIONS mirror."""
        stages = [
            Stage(
                session_id=r["session_id"],
                operator=r["operator_name"],
                session_name=r.get("session_name", ""),
                params=r.get("params", {}) or {},
                next_session_id=r.get("next_session_id"),
                next_component_type=r.get("next_component_type"),
            )
            for r in rows
        ]
        return cls(name=name, stages=stages)

    def ordered(self) -> list[Stage]:
        """Topological chain order: the unique root (no inbound edge)
        followed along next_session_id. Raises on forks, cycles,
        orphans — the reference trusts its config tables; we validate."""
        by_id = {s.session_id: s for s in self.stages}
        if len(by_id) != len(self.stages):
            raise ValueError(f"pipeline {self.name}: duplicate session_id")
        targets = {
            s.next_session_id for s in self.stages if s.next_session_id is not None
        }
        unknown = targets - set(by_id)
        if unknown:
            raise ValueError(f"pipeline {self.name}: dangling next_session_id {unknown}")
        roots = [s for s in self.stages if s.session_id not in targets]
        if len(roots) != 1:
            raise ValueError(
                f"pipeline {self.name}: expected exactly 1 root stage, got "
                f"{[s.session_id for s in roots]}"
            )
        chain, seen = [], set()
        cur: Stage | None = roots[0]
        while cur is not None:
            if cur.session_id in seen:
                raise ValueError(f"pipeline {self.name}: cycle at {cur.session_id}")
            seen.add(cur.session_id)
            chain.append(cur)
            cur = by_id[cur.next_session_id] if cur.next_session_id is not None else None
        if len(chain) != len(self.stages):
            raise ValueError(
                f"pipeline {self.name}: {len(self.stages) - len(chain)} orphan stage(s)"
            )
        return chain

    def compile(
        self, df: DataFrame, registry: OperatorRegistry = DEFAULT
    ) -> DataFrame:
        """Chain the stages' operators over ``df`` — pure plan
        composition; nothing executes until an action."""
        out = df
        for stage in self.ordered():
            out = registry.apply(stage.operator, out, stage.params)
        return out

    @property
    def route(self) -> str | None:
        """The terminal stage's next_component_type = output route tag
        (the 't' key the reference stamps for the writer demux)."""
        return self.ordered()[-1].next_component_type


def load_settings(
    df: DataFrame, key_col: str = "name", value_col: str = "value"
) -> dict[str, str]:
    """Load a key→value settings table into a dict — the
    M_SYSTEM_SETTINGS pattern (the reference fetches global settings
    relationally at boot, MFramework.cpp:393-426; an empty table is
    fine and the component continues, :426-431). Settings tables are
    tiny by definition; any registry source works (jdbc, parquet,
    csv)."""
    return {
        r[key_col]: r[value_col]
        for r in df.select(key_col, value_col).collect()
        if r[key_col] is not None
    }


def setting_as(
    settings: dict[str, str], key: str, type_=str, default=None
):
    """Typed settings access — the ``GetScalarMatch<T>`` /
    ``m_FromString<T>`` analog (MFramework.cpp:512-544): absent keys
    return ``default``; present keys must parse as ``type_`` (bool
    accepts true/false/1/0/yes/no case-insensitively)."""
    raw = settings.get(key)
    if raw is None:
        return default
    if type_ is bool:
        low = str(raw).strip().lower()
        if low in ("true", "1", "yes"):
            return True
        if low in ("false", "0", "no"):
            return False
        raise ValueError(f"setting {key}={raw!r} is not a boolean")
    try:
        return type_(raw)
    except (TypeError, ValueError) as exc:
        raise ValueError(
            f"setting {key}={raw!r} does not parse as {type_.__name__}"
        ) from exc
