"""Property-based tests for the DAG selector algebra (dbt selector
semantics over randomly generated model graphs): `name` selects the
ancestor closure, `name+` the descendant closure plus every selected
node's ancestors (buildability invariant), `--exclude` removes exactly
the excluded names.

These run without materializing anything — _subgraph is pure graph
logic — so hypothesis can afford hundreds of random DAGs.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dbt_bigquery_udf_spark.models.core import Engine, ModelSpec

N_NODES = 8


@st.composite
def dags(draw):
    """Random DAG as {node_index: set(parent_indices)} with edges only
    from lower to higher index (acyclic by construction)."""
    edges: dict[int, set[int]] = {}
    for i in range(N_NODES):
        parents = draw(
            st.sets(st.integers(min_value=0, max_value=i - 1), max_size=3)
        ) if i else set()
        edges[i] = parents
    return edges


def _engine(spark, edges) -> Engine:
    eng = Engine(spark)
    specs = []
    for i, parents in edges.items():
        if parents:
            refs = " CROSS JOIN ".join(
                f"{{{{ ref('m{p}') }}}}" for p in sorted(parents)
            )
            sql = f"SELECT 1 AS one FROM {refs}"
        else:
            sql = "SELECT 1 AS one"
        specs.append(
            ModelSpec(
                name=f"m{i}",
                kind="view",
                database="datamart",
                dialect="spark",
                sql=sql,
            )
        )
    eng.register(*specs)
    return eng


def _ancestors(edges, i):
    out, stack = set(), [i]
    while stack:
        n = stack.pop()
        if n in out:
            continue
        out.add(n)
        stack.extend(edges[n])
    return out


def _descendants(edges, i):
    out = {i}
    changed = True
    while changed:
        changed = False
        for n, parents in edges.items():
            if n not in out and out & parents:
                out.add(n)
                changed = True
    return out


@settings(
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(edges=dags(), root=st.integers(min_value=0, max_value=N_NODES - 1))
def test_selector_closures(spark, edges, root):
    eng = _engine(spark, edges)
    # bare name = ancestor closure
    got = {int(n[1:]) for n in eng._subgraph([f"m{root}"])}
    assert got == _ancestors(edges, root)
    # name+ = descendants, plus every selected node's ancestors
    # (the subgraph must always be buildable)
    got_plus = {int(n[1:]) for n in eng._subgraph([f"m{root}+"])}
    expected = set()
    for d in _descendants(edges, root):
        expected |= _ancestors(edges, d)
    assert got_plus == expected
    # exclude removes exactly the named node from the closed selection
    victim = f"m{root}"
    got_excl = set(eng._subgraph([f"m{root}"], exclude=[victim]))
    assert got_excl == {f"m{i}" for i in _ancestors(edges, root)} - {victim}


@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(edges=dags())
def test_full_selection_is_every_node(spark, edges):
    eng = _engine(spark, edges)
    assert set(eng._subgraph(None)) == {f"m{i}" for i in range(N_NODES)}
