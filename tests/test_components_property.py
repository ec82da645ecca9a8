"""Property-based test for the distributed connected-components operator
(operators/datasets.py label_propagate) against a pure-Python union-find
reference model, on random graphs plus the adversarial shapes that
break naive propagation (long paths — diameter >> round count without
pointer jumping)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from kafka_flink_streaming_pipeline_spark.operators.datasets import label_propagate


def _reference_components(n_nodes: int, edges: list[tuple[int, int]]) -> dict[int, int]:
    parent = list(range(n_nodes))

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min node id per component
    roots: dict[int, int] = {}
    for v in range(n_nodes):
        r = find(v)
        roots[r] = min(roots.get(r, r), v)
    return {v: roots[find(v)] for v in range(n_nodes)}


def _run_spark(spark, n_nodes: int, edges: list[tuple[int, int]]) -> dict[int, int]:
    nodes = spark.createDataFrame([(i,) for i in range(n_nodes)], "node long")
    if edges:
        pairs = spark.createDataFrame(edges, "d1 long, d2 long")
    else:
        pairs = spark.createDataFrame([], "d1 long, d2 long")
    return {r.node: r.label for r in label_propagate(nodes, pairs).collect()}


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    n_nodes=st.integers(min_value=1, max_value=10),
    edge_picks=st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 9)), max_size=12
    ),
)
def test_components_match_union_find(spark, n_nodes, edge_picks):
    edges = [
        (a % n_nodes, b % n_nodes)
        for a, b in edge_picks
        if a % n_nodes != b % n_nodes
    ]
    assert _run_spark(spark, n_nodes, edges) == _reference_components(n_nodes, edges)


def test_components_long_path_converges(spark):
    """A 33-node path has diameter 32 > the 20-round cap — only the
    pointer-jumping shortcut makes the fixpoint reachable. Every node
    must land in component 0."""
    n = 33
    edges = [(i, i + 1) for i in range(n - 1)]
    got = _run_spark(spark, n, edges)
    assert got == {i: 0 for i in range(n)}


def test_components_two_cliques_and_isolates(spark):
    edges = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    edges += [(a, b) for a in range(5, 8) for b in range(a + 1, 8)]
    got = _run_spark(spark, 10, edges)
    expect = {0: 0, 1: 0, 2: 0, 3: 0, 4: 4, 5: 5, 6: 5, 7: 5, 8: 8, 9: 9}
    assert got == expect
