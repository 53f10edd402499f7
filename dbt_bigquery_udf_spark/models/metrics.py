"""Metrics — the dbt semantic-layer surface (dbt >= 1.6 MetricFlow's
core contract, compacted): a metric is a named, versioned aggregation
over a model, queryable by any subset of its declared dimensions.

Why this exists (same argument as the reference's UDF framework): the
alternative is every dashboard hand-writing `sum(o_totalprice)` with
its own filter set — N subtly-different revenue numbers. Declaring the
measure once and COMPILING grouped queries from it is the semantic
layer; the engine's version renders to plain Spark SQL over built
relations, so Catalyst treats a metric query like any other (pushdown,
partial aggregation, broadcast dims all apply).

Scale: a metric query is exactly one aggregation over the base model —
whatever the model's own materialization does for 100 TB (partitioned
tables, incremental builds) the metric inherits for free.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from .core import Engine, EngineError

__all__ = ["Metric", "MetricRegistry"]


@dataclass(frozen=True)
class Metric:
    """A named aggregation over a model.

    ``expression`` is the SQL aggregate (e.g. ``sum(o_totalprice)``);
    ``dimensions`` are the columns consumers may group/filter by —
    requests outside that set fail at compile time, which is the
    governance point of a semantic layer.
    """

    name: str
    model: str  # model or source relation the measure aggregates
    expression: str  # SQL aggregate expression over the model's columns
    dimensions: tuple[str, ...] = ()
    time_dimension: str | None = None  # grain-able date/timestamp column
    filter: str | None = None  # metric-level WHERE, always applied
    description: str = ""


import re as _re

# Bare words allowed in an ad-hoc `where` besides declared dimensions:
# SQL connectives/predicate keywords and literals. Anything else
# identifier-shaped must be a declared dimension — the same governance
# group_by gets (function calls in filters therefore fail closed).
_WHERE_KEYWORDS = frozenset(
    "and or not in is null between like ilike true false".split()
)
_IDENT_RE = _re.compile(r"[A-Za-z_][A-Za-z0-9_]*")


_GRAIN_FN = {
    "day": "CAST({col} AS DATE)",
    "week": "date_trunc('week', {col})",
    "month": "date_trunc('month', {col})",
    "quarter": "date_trunc('quarter', {col})",
    "year": "date_trunc('year', {col})",
}


class MetricRegistry:
    """Holds metric definitions and compiles grouped queries from them."""

    def __init__(self, engine: Engine) -> None:
        self.engine = engine
        self.metrics: dict[str, Metric] = {}

    _RELATION_KINDS = (
        "table",
        "view",
        "seed",
        "incremental",
        "snapshot",
        "python",
        "copy",
    )

    def register(self, *metrics: Metric) -> "MetricRegistry":
        for m in metrics:
            spec = self.engine.models.get(m.model)
            if spec is not None:
                if spec.kind not in self._RELATION_KINDS:
                    # Functions/TVFs have no relation; ephemerals never
                    # materialize — a metric over them would compile to
                    # a name that does not exist in the catalog.
                    raise EngineError(
                        f"metric {m.name}: model {m.model!r} is kind "
                        f"{spec.kind!r}, not a queryable relation"
                    )
            elif "." not in m.model:
                raise EngineError(
                    f"metric {m.name}: model {m.model!r} is not registered"
                )
            self.metrics[m.name] = m
        return self

    def compile(
        self,
        metric_name: str,
        group_by: list[str] | None = None,
        grain: str | None = None,
        where: str | None = None,
    ) -> str:
        """Render the metric request to SQL (the dbt `compile`-level
        artifact; :meth:`query` executes it)."""
        m = self.metrics.get(metric_name)
        if m is None:
            raise EngineError(f"unknown metric {metric_name!r}")
        dims = list(group_by or [])
        for d in dims:
            if d not in m.dimensions:
                raise EngineError(
                    f"metric {m.name}: {d!r} is not a declared dimension "
                    f"(allowed: {sorted(m.dimensions)})"
                )
        if where:
            # Governance holds for filters too: every identifier in the
            # ad-hoc predicate (string literals stripped) must be a
            # declared dimension or the time dimension.
            stripped = _re.sub(r"'[^']*'", "''", where)
            # Columns feeding the measure expression are part of the
            # metric's own definition — filterable like dimensions.
            allowed = (
                set(m.dimensions)
                | ({m.time_dimension} - {None})
                | set(_IDENT_RE.findall(m.expression))
                | _WHERE_KEYWORDS
            )
            bad = sorted(
                t
                for t in set(_IDENT_RE.findall(stripped))
                if t.lower() not in _WHERE_KEYWORDS and t not in allowed
            )
            if bad:
                raise EngineError(
                    f"metric {m.name}: where references undeclared "
                    f"identifiers {bad} (allowed: {sorted(m.dimensions)})"
                )
        select, keys = [], []
        if grain:
            if not m.time_dimension:
                raise EngineError(
                    f"metric {m.name}: no time_dimension declared, "
                    "cannot apply a grain"
                )
            if grain not in _GRAIN_FN:
                raise EngineError(
                    f"unknown grain {grain!r} (one of {sorted(_GRAIN_FN)})"
                )
            expr = _GRAIN_FN[grain].format(col=m.time_dimension)
            select.append(f"{expr} AS {m.time_dimension}_{grain}")
            keys.append(f"{m.time_dimension}_{grain}")
        select += dims
        keys += dims
        if m.model in self.engine.models:
            spec = self.engine.models[m.model]
            relation = f"{self.engine.database_for(spec)}.{spec.relation_name}"
        else:
            relation = m.model  # dotted catalog relation (source)
        conds = [c for c in (m.filter, where) if c]
        where_sql = (" WHERE " + " AND ".join(f"({c})" for c in conds)) if conds else ""
        group_sql = (" GROUP BY " + ", ".join(keys)) if keys else ""
        cols = ", ".join(select + [f"{m.expression} AS {m.name}"])
        return f"SELECT {cols} FROM {relation}{where_sql}{group_sql}"

    def query(
        self,
        spark: SparkSession,
        metric_name: str,
        group_by: list[str] | None = None,
        grain: str | None = None,
        where: str | None = None,
    ) -> DataFrame:
        return spark.sql(
            self.compile(metric_name, group_by=group_by, grain=grain, where=where)
        )
