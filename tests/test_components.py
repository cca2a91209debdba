"""Connected-components (min-label propagation) unit tests."""

from pyspark.sql import Row

from syllabus_sense_spark.queries.ext_graph import connected_components


def test_components_known_topology(spark):
    # Two components: a 4-node chain {1,2,3,4} and a pair {10, 11};
    # chains force >1 propagation round.
    edges = spark.createDataFrame(
        [Row(doc_a=1, doc_b=2), Row(doc_a=2, doc_b=3), Row(doc_a=3, doc_b=4),
         Row(doc_a=10, doc_b=11)]
    )
    got = {
        (r.doc_id, r.component_id)
        for r in connected_components(edges).collect()
    }
    assert got == {(1, 1), (2, 1), (3, 1), (4, 1), (10, 10), (11, 10)}


def test_components_long_chain_converges(spark):
    # 12-node chain: diameter 11; min-label propagation must keep
    # iterating (doubling reach per round) until every node holds 0.
    edges = spark.createDataFrame(
        [Row(doc_a=i, doc_b=i + 1) for i in range(11)]
    )
    labels = connected_components(edges).collect()
    assert len(labels) == 12
    assert {r.component_id for r in labels} == {0}


def test_components_isolated_pairs(spark):
    edges = spark.createDataFrame(
        [Row(doc_a=2 * i, doc_b=2 * i + 1) for i in range(5)]
    )
    labels = connected_components(edges).collect()
    assert len(labels) == 10
    comp = {r.doc_id: r.component_id for r in labels}
    for i in range(5):
        assert comp[2 * i] == comp[2 * i + 1] == 2 * i


def test_components_pointer_jumping_beats_hop_count(spark):
    """A 64-node path has diameter 63: plain 1-hop min-label needs 63
    rounds, pointer jumping O(log) — converging within max_iter=10
    pins that the label-of-label shortcut is active (a regression to
    hop-only propagation fails this by hitting the iteration cap with
    wrong labels)."""
    from pyspark.sql import Row

    edges = spark.createDataFrame(
        [Row(doc_a=i, doc_b=i + 1) for i in range(63)]
    )
    labels = connected_components(edges, max_iter=10).collect()
    assert len(labels) == 64
    assert {r.component_id for r in labels} == {0}


def test_components_dedup_edges_false_same_fixpoint(spark):
    """dedup_edges=False (for a<b-unique pair lists) must reach the
    identical fixpoint as the deduping default."""
    from pyspark.sql import Row

    edges = spark.createDataFrame(
        [Row(doc_a=1, doc_b=2), Row(doc_a=2, doc_b=5), Row(doc_a=7, doc_b=9)]
    )
    a = {(r.doc_id, r.component_id) for r in connected_components(edges).collect()}
    b = {
        (r.doc_id, r.component_id)
        for r in connected_components(edges, dedup_edges=False).collect()
    }
    assert a == b == {(1, 1), (2, 1), (5, 1), (7, 7), (9, 7)}
