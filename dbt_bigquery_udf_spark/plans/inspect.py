"""Extract scale-relevant facts from a DataFrame's physical plan.

Built on ``explain("formatted")`` output plus the executed-plan tree —
the same evidence a human reads when checking "did the filter reach the
scan, did the small side broadcast, how many shuffles does this cost".
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

__all__ = ["plan_text", "plan_facts", "PlanFacts"]


def plan_text(df: DataFrame, mode: str = "formatted") -> str:
    """The ``explain`` output as a string."""
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


@dataclass
class PlanFacts:
    """Scale-relevant properties of a physical plan.

    exchanges counts shuffle boundaries (Exchange operators, minus
    reused ones); broadcasts counts BroadcastExchange/BroadcastHashJoin
    builds; pushed_filters are the parquet-scan PushedFilters entries;
    read_schemas the pruned per-scan column sets.
    """

    exchanges: int = 0
    broadcast_joins: int = 0
    sort_merge_joins: int = 0
    nested_loop_joins: int = 0
    codegen_spans: int = 0
    scans: int = 0
    pushed_filters: list[str] = field(default_factory=list)
    read_schemas: list[str] = field(default_factory=list)
    text: str = ""

    def scan_columns(self) -> set[str]:
        cols: set[str] = set()
        for rs in self.read_schemas:
            cols.update(re.findall(r"(\w+):", rs))
        return cols


def plan_facts(df: DataFrame, execute: bool = False) -> PlanFacts:
    """Parse ``explain("formatted")`` into :class:`PlanFacts`.

    ``execute=True`` additionally runs the query so the AQE-final
    executed plan is available — that is the only plan that carries
    WholeStageCodegen span markers (pre-execution adaptive plans always
    report zero), so ``codegen_spans`` is populated only on this path.
    """
    text = plan_text(df, "formatted")
    facts = PlanFacts(text=text)
    # Tree section: count operators once (the detail section repeats names).
    tree, _, detail = text.partition("\n\n")
    ops = re.findall(r"^\s*[:+\-|\s]*[*]?\s*\(?\d*\)?\s*([A-Za-z][A-Za-z0-9]+)", tree, re.M)
    joined = tree
    facts.exchanges = len(re.findall(r"\bExchange\b|\bShuffleExchange", joined)) + len(
        re.findall(r"\bAQEShuffleRead", "")
    )
    facts.broadcast_joins = len(re.findall(r"BroadcastHashJoin|BroadcastNestedLoopJoin", joined))
    facts.sort_merge_joins = len(re.findall(r"SortMergeJoin", joined))
    facts.nested_loop_joins = len(re.findall(r"BroadcastNestedLoopJoin|CartesianProduct", joined))
    if execute:
        df.collect()
        executed = df._jdf.queryExecution().executedPlan().toString()
        facts.codegen_spans = len(set(re.findall(r"\*\((\d+)\)", executed)))
    # Count in the tree section only — the detail section repeats each
    # operator's name, which would double-count every scan.
    facts.scans = len(re.findall(r"Scan parquet|FileScan parquet", tree))
    facts.pushed_filters = [
        m.strip() for m in re.findall(r"PushedFilters: \[([^\]]*)\]", detail or text)
    ]
    facts.read_schemas = re.findall(r"ReadSchema: struct<([^>]*)>", detail or text)
    return facts
