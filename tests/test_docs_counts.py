"""Doc-count drift guard (VERDICT r8 #5): README/COVERAGE registry
counts are ASSERTED against the live registry in CI, ending the
stale-count drift class (round 7 shipped '202', round 8 shipped '203'
against a 204-query registry). Any registry growth now fails this test
until the docs are re-synced — the 'generate the number from the
registry' fix in test form.

No SparkSession needed: importing the registry module populates QUERIES
(operators register on import).
"""

from __future__ import annotations

import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _registry_size() -> int:
    from dbt_bigquery_udf_spark.queries import QUERIES

    return len(QUERIES)


def test_readme_and_coverage_counts_match_registry():
    n = _registry_size()
    claims: list[tuple[str, int, str]] = []
    for doc in ("README.md", "COVERAGE.md"):
        text = open(os.path.join(REPO, doc)).read()
        for m in re.finditer(r"(\d+)\s+registered queries", text):
            claims.append((doc, int(m.group(1)), m.group(0)))
        for m in re.finditer(r"(\d+)\s+queries total", text):
            claims.append((doc, int(m.group(1)), m.group(0)))
        # full-registry sweep claims of the form "205/205"
        for m in re.finditer(r"(\d+)/(\d+)(?=\s*[—\-)]|\s+and\b)", text):
            if m.group(1) == m.group(2) and int(m.group(1)) > 100:
                claims.append((doc, int(m.group(1)), m.group(0)))
    assert claims, "expected at least one registry-count claim in the docs"
    stale = [(d, v, ctx) for d, v, ctx in claims if v != n]
    assert not stale, (
        f"registry holds {n} queries but these doc claims disagree "
        f"(re-sync README.md/COVERAGE.md): {stale}"
    )


def test_curated_window_is_exactly_the_driver_prefix():
    """The curated window must stay exactly 50 names (the driver checks
    list(queries())[:50]) and every name must be registered — a rename
    or resize fails here before it fails in the driver."""
    from dbt_bigquery_udf_spark.queries import QUERIES, _CURATED_WINDOW

    assert len(_CURATED_WINDOW) == 50
    assert len(set(_CURATED_WINDOW)) == 50
    missing = [q for q in _CURATED_WINDOW if q not in QUERIES]
    assert not missing, missing
