"""dbt unit tests (dbt >= 1.8): given/expect fixtures for model logic.

The reference ships no tests (SURVEY.md §5) but its ``schema.yml``
embeds a golden I/O example (models/udf/schema.yml:10-12:
``parse_datetime('2023/01/01 12:00:00') -> 2023-01-01T12:00:00``);
dbt's unit-test feature is the built-in surface that turns such
examples into executable specs. Semantics implemented here:

- each ``given`` fixture replaces one ``{{ ref() }}`` / ``{{ source() }}``
  input of the model under test with a tiny in-memory relation;
- refs to FUNCTION-kind models are NOT data inputs — they are the logic
  under test, so they resolve (and are built) normally, exactly as dbt
  cannot mock a macro;
- the model body runs against the fixtures only — never the warehouse —
  and the result is compared to ``expect`` as an unordered multiset.

Unit tests run on fixture-sized data by construction: the 100 TB story
is that they validate model LOGIC without touching production inputs,
which is precisely why dbt added them.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field, replace

from pyspark.sql import SparkSession

from ..catalog import EngineError
from ..operators.util import local_rows_df

__all__ = ["UnitTest", "UnitTestResult", "run_unit_tests"]


@dataclass(frozen=True)
class UnitTest:
    """``given`` keys are ``'ref:<model>'`` or ``'source:<ds>.<table>'``;
    values and ``expect`` are ``(schema_ddl, rows)`` pairs as accepted by
    ``spark.createDataFrame``. ``params`` binds table-function parameters
    to SQL literals (needed because the unit under test may be a TVF
    body, which dbt itself has no analogue for)."""

    name: str
    model: str
    given: dict[str, tuple[str, list]] = field(default_factory=dict)
    expect: tuple[str, list] = ("", [])
    params: dict[str, str] = field(default_factory=dict)
    description: str = ""


@dataclass
class UnitTestResult:
    test: UnitTest
    passed: bool
    missing: list  # expected rows the model did not produce
    unexpected: list  # produced rows the expectation does not contain


def _fixture_view(spark: SparkSession, test: UnitTest, i: int, schema: str, rows) -> str:
    name = f"__unit_{re.sub(r'[^A-Za-z0-9_]', '_', test.name)}_{i}"
    local_rows_df(spark, rows, schema).createOrReplaceTempView(name)
    return name


def run_unit_tests(spark: SparkSession, engine, tests) -> list[UnitTestResult]:
    """Execute unit tests against ``engine``'s registered models."""
    from .core import _REF_RE, _SOURCE_RE

    results = []
    for t in tests:
        try:
            # _ref_key: a unit test on a versioned entry addresses the
            # bare name; dbt runs it against the latest version.
            spec = engine.models[engine._ref_key(t.model)]
        except (KeyError, EngineError):
            raise EngineError(f"unit test {t.name}: no model {t.model!r}")

        sql = spec.sql
        fixture_i = 0
        consumed = set()

        def sub_ref(m: re.Match) -> str:
            nonlocal fixture_i
            name = m.group(1)
            key = f"ref:{name}"
            if key in t.given:
                consumed.add(key)
                fixture_i += 1
                return _fixture_view(spark, t, fixture_i, *t.given[key])
            target = engine.models.get(name)
            if target is not None and target.kind in ("function", "table_function"):
                # Logic, not data: build it for real and leave the ref
                # for the engine's normal resolution below.
                engine.build(select=[name])
                return m.group(0)
            raise EngineError(
                f"unit test {t.name}: input ref('{name}') has no fixture "
                "(every data input must be given)"
            )

        def sub_source(m: re.Match) -> str:
            nonlocal fixture_i
            ds, tbl = m.groups()
            key = f"source:{ds}.{tbl}"
            if key not in t.given:
                raise EngineError(
                    f"unit test {t.name}: input source('{ds}', '{tbl}') "
                    "has no fixture (every data input must be given)"
                )
            consumed.add(key)
            fixture_i += 1
            return _fixture_view(spark, t, fixture_i, *t.given[key])

        sql = _REF_RE.sub(sub_ref, sql)
        sql = _SOURCE_RE.sub(sub_source, sql)
        unused = set(t.given) - consumed
        if unused:
            raise EngineError(
                f"unit test {t.name}: fixtures {sorted(unused)} match no model input"
            )
        # Remaining placeholders (function refs) resolve through the
        # engine's own renderer — dialect transpile included.
        body = engine.render(replace(spec, sql=sql, kind="view"))
        for pname, literal in t.params.items():
            body = re.sub(rf"\b{re.escape(pname)}\b", literal, body)

        actual = [tuple(r) for r in spark.sql(body).collect()]
        schema, rows = t.expect
        if not rows:
            # dbt's empty-output expectation: no schema needed — the
            # assertion is simply that the model produced nothing.
            expected = []
        else:
            expected = [
                tuple(r) for r in local_rows_df(spark, rows, schema).collect()
            ]

        remaining = list(expected)
        unexpected = []
        for row in actual:
            if row in remaining:
                remaining.remove(row)
            else:
                unexpected.append(row)
        results.append(
            UnitTestResult(
                test=t,
                passed=not remaining and not unexpected,
                missing=remaining,
                unexpected=unexpected,
            )
        )
    return results
