"""Large-star/small-star connected components (merlin_spark/graph.py).

Pins the properties the propagation form cannot offer: logarithmic
round count on long-diameter graphs, plus exact equivalence with the
min-label propagation qkey on the real near-dup pair graph.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from merlin_spark.graph import connected_components
from merlin_spark.queries.dedup import (
    dedup_cluster_bigstar,
    dedup_cluster_canonical,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "a long, b long")


def _labels(spark, pairs, **kw):
    labels, rounds = connected_components(_edges(spark, pairs), **kw)
    got = {r["node"]: r["label"] for r in labels.collect()}
    return got, rounds


def test_two_cliques_and_a_bridge(spark):
    pairs = (
        [(i, j) for i in range(0, 4) for j in range(i + 1, 4)]
        + [(i, j) for i in range(10, 14) for j in range(i + 1, 14)]
        + [(20, 21)]
    )
    got, _ = _labels(spark, pairs)
    assert got == {**{n: 0 for n in range(0, 4)},
                   **{n: 10 for n in range(10, 14)},
                   20: 20, 21: 20}


def test_duplicate_selfloop_and_reversed_edges_tolerated(spark):
    got, _ = _labels(spark, [(1, 2), (2, 1), (2, 2), (1, 2), (3, 2)])
    assert got == {1: 1, 2: 1, 3: 1}


def test_long_chain_converges_logarithmically(spark):
    """A 64-node path (diameter 63): min-label propagation needs ~63
    rounds (> its _CLUSTER_MAX_ITERS); the star alternation must finish
    in O(log^2 n) — well under 12 — with every node labeled 0."""
    pairs = [(i, i + 1) for i in range(63)]
    got, rounds = _labels(spark, pairs)
    assert got == {n: 0 for n in range(64)}
    assert rounds <= 12, f"star alternation took {rounds} rounds on a chain"


def test_adversarial_descending_chain(spark):
    """Same chain but labels ordered against the orientation (node 0 at
    the far end), so min information must travel the full diameter."""
    pairs = [(63 - i, 63 - i - 1) for i in range(63)]
    got, rounds = _labels(spark, pairs)
    assert got == {n: 0 for n in range(64)}
    assert rounds <= 12


def test_round_budget_enforced(spark):
    with pytest.raises(RuntimeError, match="no fixpoint"):
        connected_components(
            _edges(spark, [(i, i + 1) for i in range(63)]), max_rounds=1
        )


def test_bigstar_qkey_matches_propagation_qkey(spark, sf_dir):
    """The two CC implementations must produce identical
    (doc_id, cluster_id, is_canonical) rows on the real exact-Jaccard
    pair graph — the equivalence the shared DuckDB oracle asserts,
    checked here Spark-vs-Spark as well."""
    a = dedup_cluster_canonical(spark, sf_dir)
    b = dedup_cluster_bigstar(spark, sf_dir)
    sym_diff = a.exceptAll(b).unionByName(b.exceptAll(a))
    assert sym_diff.count() == 0
    assert a.count() == b.count() > 0


def test_degenerate_inputs(spark):
    """Empty graph and self-loop-only graph both converge round 1 with
    no labels (a self-loop node has no peers — dropped like an isolated
    node, per the docstring)."""
    empty, r1 = connected_components(_edges(spark, []))
    assert empty.count() == 0 and r1 == 1
    loops, r2 = connected_components(_edges(spark, [(5, 5), (9, 9)]))
    assert loops.count() == 0 and r2 == 1


def _union_find_labels(pairs):
    """Pure-Python oracle: min node id per component via union-find."""
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


@pytest.mark.parametrize("seed", [7, 77, 777, 7777])
def test_random_graphs_match_union_find(spark, seed):
    """Seeded random graphs (mixed density, isolated-pair tails, up to
    80 nodes) vs a driver-side union-find oracle — the repo's seeded
    randomized-property pattern (tests/test_property.py) applied to the
    star-alternation CC."""
    import random

    rng = random.Random(seed)
    n = rng.randint(10, 80)
    m = rng.randint(n // 2, 3 * n)
    pairs = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
    pairs = [(a, b) for a, b in pairs if a != b] or [(0, 1)]
    got, _ = _labels(spark, pairs)
    assert got == _union_find_labels(pairs)


def test_string_node_ids(spark):
    """Node type follows the edge columns (doc ids are strings in the
    real pair graph at some call sites) — min/least must order
    lexicographically, not fail."""
    edges = spark.createDataFrame(
        [("d2", "d9"), ("d9", "d4"), ("x1", "x2")], "a string, b string"
    )
    labels, _ = connected_components(edges)
    got = {r["node"]: r["label"] for r in labels.collect()}
    assert got == {"d2": "d2", "d9": "d2", "d4": "d2", "x1": "x1", "x2": "x1"}
