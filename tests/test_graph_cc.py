"""Connected components (operators/graph.py) — correctness vs a pure
union-find oracle, diameter-independent round count, and the
dedup_cluster_cc query's DuckDB WITH RECURSIVE parity."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from clinical_trials_etl_spark.operators.dedup import (
    SQL_DEDUP_CLUSTER_CC,
    q_dedup_cluster_cc,
)
from clinical_trials_etl_spark.operators.graph import (
    connected_components,
    connected_components_with_rounds,
)


def _uf_components(edges):
    """Pure-Python union-find oracle: {node: min id of its component}
    for nodes incident to >=1 non-self-loop edge."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    nodes = set()
    for a, b in edges:
        if a == b:
            continue
        nodes.update((a, b))
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in nodes}


def _run_cc(spark, edges, **kw):
    if not edges:
        df = spark.createDataFrame([], "src long, dst long")
    else:
        df = spark.createDataFrame(
            [(int(a), int(b)) for a, b in edges], ["src", "dst"]
        )
    out = connected_components(df, **kw)
    return {r["node"]: r["component"] for r in out.collect()}


def test_empty(spark):
    assert _run_cc(spark, []) == {}


def test_self_loops_only(spark):
    assert _run_cc(spark, [(3, 3), (7, 7)]) == {}


def test_two_components_with_duplicates_and_reversals(spark):
    edges = [(1, 2), (2, 1), (2, 3), (10, 11), (11, 10), (3, 2), (5, 5)]
    assert _run_cc(spark, edges) == _uf_components(edges)


def test_clique_plus_bridge(spark):
    clique = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    edges = clique + [(3, 9), (9, 20), (30, 31)]
    assert _run_cc(spark, edges) == _uf_components(edges)


def test_path_converges_in_log_rounds_not_diameter(spark):
    """A 256-node path has diameter 255; min-label propagation needs
    ~255 rounds. The star alternation is diameter-independent — pin a
    log-ish bound so a future rewrite cannot silently regress to a
    propagation scheme (observed: 6 rounds; bound leaves slack for the
    O(log^2 n) worst case)."""
    n = 256
    edges = [(i, i + 1) for i in range(n - 1)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    out, rounds = connected_components_with_rounds(df)
    got = {r["node"]: r["component"] for r in out.collect()}
    assert got == {i: 0 for i in range(n)}
    assert rounds <= 16, f"diameter-bound convergence? {rounds} rounds"


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=24),
            st.integers(min_value=0, max_value=24),
        ),
        max_size=40,
    )
)
def test_property_matches_union_find(spark_module, edges):
    assert _run_cc(spark_module, edges) == _uf_components(edges)


@pytest.fixture(scope="module")
def spark_module(spark):
    return spark


def test_dedup_cluster_cc_duckdb_parity(spark, sf_dir):
    got = [
        (r["doc_id"], r["cluster_id"])
        for r in q_dedup_cluster_cc(spark, sf_dir).collect()
    ]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS "
        f"SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    want = [tuple(r) for r in con.execute(SQL_DEDUP_CLUSTER_CC).fetchall()]
    assert got == want
    # clusters are closed under the pair relation: every clustered doc
    # maps to the min doc_id of its component
    for doc, cl in got:
        assert cl <= doc
