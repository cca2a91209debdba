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
