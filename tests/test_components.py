"""Connected components: hand-verifiable graphs + convergence behavior."""
from __future__ import annotations

from py3dtilers_spark.operators.components import component_stats, connected_components


def _cc(spark, pairs):
    edges = spark.createDataFrame(pairs, "doc_a string, doc_b string")
    return {
        r.node: r.component for r in connected_components(edges).collect()
    }


def test_chain_and_islands(spark):
    # chain a-b-c-d (one component, min label 'a') + island x-y
    got = _cc(spark, [("a", "b"), ("b", "c"), ("c", "d"), ("x", "y")])
    assert got == {"a": "a", "b": "a", "c": "a", "d": "a", "x": "x", "y": "x"}


def test_long_path_converges_with_pointer_jumping(spark):
    # a path of 33 nodes: plain propagation needs 32 rounds; path halving
    # must close it well inside max_iter=30 — and inside the round budget
    # ceil(log2(33)) + 2 = 8, with convergence counts only every 3rd round
    names = [f"n{i:02d}" for i in range(33)]
    edges = spark.createDataFrame(
        list(zip(names, names[1:])), "doc_a string, doc_b string"
    )
    stats: dict = {}
    got = {
        r.node: r.component
        for r in connected_components(edges, stats=stats).collect()
    }
    assert set(got.values()) == {"n00"}
    assert stats["bound"] == 8
    assert stats["rounds"] <= stats["bound"]
    # the convergence count runs every 3rd round, not every round
    assert stats["checks"] <= stats["rounds"] // 3 + 2


def test_component_stats(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("p", "q")], "doc_a string, doc_b string"
    )
    labels = connected_components(edges)
    stats = {r.component: r.n_members for r in component_stats(labels).collect()}
    assert stats == {"a": 3, "p": 2}
    # mega-component reporting cap clamps counts, never drops components
    capped = {
        r.component: r.n_members
        for r in component_stats(labels, max_members=2).collect()
    }
    assert capped == {"a": 2, "p": 2}
