"""Physical-plan introspection (SURVEY.md §4).

The engine performs no query optimization itself — Catalyst does
(SURVEY.md §4 maps every optimization the reference relies on to a
built-in Catalyst rule). What the engine owns is *verifying* that the
plans it declares actually get the physical properties the 100 TB
design depends on: filters pushed into parquet scans, pruned read
schemas, broadcast joins for small dimensions, bounded shuffle counts,
wide whole-stage-codegen spans.

:mod:`.inspect` extracts those facts from a DataFrame's executed plan;
``tests/test_plans.py`` pins them per operator so a regression that
silently de-optimizes a plan (a lost pushdown, an accidental
sort-merge join, HOF expressions escaping codegen) fails CI.
"""

from .inspect import plan_facts, plan_text

__all__ = ["plan_facts", "plan_text"]
