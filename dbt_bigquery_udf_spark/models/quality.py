"""Schema tests — the dbt generic-test surface (`dbt test`).

The reference configures a test path (`/root/reference/dbt_project.yml:17`
``test-paths: ["tests"]``) and its production log shows 387 tests
running (`dbt_run_result.png`), but ships none — so this module
implements dbt's four built-in generic tests, which is what those
hundreds of tests overwhelmingly are:

- ``unique``            — no key value appears twice
- ``not_null``          — no NULLs in the column
- ``accepted_values``   — column values drawn from a closed set
- ``relationships``     — referential integrity against a parent model

A test compiles to ONE aggregate query returning the number of
violating rows (dbt's convention: a test passes when it returns zero
rows; we count instead of materializing them). Each is a scan +
aggregate with partial aggregation — no test ever collects data, so the
suite parallelizes across models exactly like the build DAG (F17) and
scales with the warehouse, not the driver.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import SparkSession

from .core import Engine, EngineError

__all__ = [
    "SchemaTest",
    "unique",
    "not_null",
    "accepted_values",
    "relationships",
    "TestResult",
    "run_tests",
]


@dataclass(frozen=True)
class SchemaTest:
    """One generic test bound to a model column."""

    test_type: str  # 'unique' | 'not_null' | 'accepted_values' | 'relationships'
    model: str
    column: str
    values: tuple[str, ...] = ()  # accepted_values only
    to_model: str = ""  # relationships only: parent model
    to_column: str = ""  # relationships only: parent key

    @property
    def name(self) -> str:
        suffix = ""
        if self.test_type == "relationships":
            suffix = f"__{self.to_model}_{self.to_column}"
        return f"{self.test_type}_{self.model}_{self.column}{suffix}"

    def failures_sql(self, engine: Engine) -> str:
        rel = engine.relations.get(self.model)
        if rel is None:
            raise EngineError(f"test {self.name}: model {self.model!r} not built")
        q = rel.qualified
        c = self.column
        if self.test_type == "unique":
            # Violations = rows beyond the first per duplicated value
            # (dbt counts each duplicated value's rows; NULLs exempt —
            # that's not_null's job).
            return (
                f"SELECT coalesce(sum(n), 0) FROM (SELECT count(*) AS n "
                f"FROM {q} WHERE {c} IS NOT NULL GROUP BY {c} "
                f"HAVING count(*) > 1)"
            )
        if self.test_type == "not_null":
            return f"SELECT count(*) FROM {q} WHERE {c} IS NULL"
        if self.test_type == "accepted_values":
            quoted = ", ".join("'" + v.replace("'", "''") + "'" for v in self.values)
            return (
                f"SELECT count(*) FROM {q} "
                f"WHERE {c} IS NOT NULL AND {c} NOT IN ({quoted})"
            )
        if self.test_type == "relationships":
            parent = engine.relations.get(self.to_model)
            if parent is None and "." in self.to_model:
                # A dotted name addresses a catalog relation directly —
                # how a test points at a *source* (dbt's
                # relationships-to-source), which has no model entry.
                parent_qualified = self.to_model
            elif parent is None:
                raise EngineError(
                    f"test {self.name}: parent model {self.to_model!r} not built"
                )
            else:
                parent_qualified = parent.qualified
            # Anti-join: child keys with no parent. Catalyst plans a
            # broadcast anti join when the parent key set is small; at
            # scale both sides shuffle on the key — same story as any
            # integrity check.
            return (
                f"SELECT count(*) FROM (SELECT {c} FROM {q} "
                f"WHERE {c} IS NOT NULL) c LEFT ANTI JOIN "
                f"{parent_qualified} p ON c.{self.column} = p.{self.to_column}"
            )
        raise EngineError(f"unknown test type {self.test_type!r}")


def unique(model: str, column: str) -> SchemaTest:
    return SchemaTest("unique", model, column)


def not_null(model: str, column: str) -> SchemaTest:
    return SchemaTest("not_null", model, column)


def accepted_values(model: str, column: str, values: list[str]) -> SchemaTest:
    return SchemaTest("accepted_values", model, column, values=tuple(values))


def relationships(model: str, column: str, to_model: str, to_column: str) -> SchemaTest:
    return SchemaTest(
        "relationships", model, column, to_model=to_model, to_column=to_column
    )


@dataclass
class TestResult:
    test: SchemaTest
    n_failures: int

    @property
    def passed(self) -> bool:
        return self.n_failures == 0


def run_tests(
    spark: SparkSession, engine: Engine, tests: list[SchemaTest]
) -> list[TestResult]:
    """Execute a test suite against the engine's built relations.

    LEFT ANTI JOIN in relationships needs no database switch: relations
    are addressed fully qualified, so the current database is irrelevant
    (unlike TVF calls — F14).
    """
    results = []
    for t in tests:
        n = spark.sql(t.failures_sql(engine)).collect()[0][0]
        results.append(TestResult(t, int(n)))
    return results


@dataclass
class FreshnessResult:
    relation: str
    ts_column: str
    max_ts: object
    age_hours: float
    status: str  # 'pass' | 'warn' | 'error'


def check_source_freshness(
    spark: SparkSession,
    relation: str,
    ts_column: str,
    warn_after_hours: float = 24.0,
    error_after_hours: float = 72.0,
    as_of=None,
) -> FreshnessResult:
    """dbt `source freshness` analogue: age of the newest row in a
    source relation vs warn/error thresholds.

    ``as_of`` defaults to the current clock; tests pin it for
    determinism. One max() aggregate — scan-bound, no shuffle.
    """
    from datetime import datetime, timezone

    row = spark.sql(f"SELECT max({ts_column}) FROM {relation}").collect()[0]
    max_ts = row[0]
    if as_of is None:
        as_of = datetime.now(timezone.utc).replace(tzinfo=None)
    if max_ts is None:
        return FreshnessResult(relation, ts_column, None, float("inf"), "error")
    age = (as_of - max_ts).total_seconds() / 3600.0
    status = "pass" if age <= warn_after_hours else (
        "warn" if age <= error_after_hours else "error"
    )
    return FreshnessResult(relation, ts_column, max_ts, round(age, 2), status)
