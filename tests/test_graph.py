"""Connected-components operator: cluster resolution over dup pairs."""

from __future__ import annotations

from radohydro_spark.operators.graph import connected_components, dedup_canonical


def test_components_chains_cliques_singletons(spark):
    # components: {1,2,3,4} (chain), {10,11,12} (triangle), {20,21},
    # singleton {30} via the node universe
    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (10, 11), (11, 12), (12, 10), (21, 20)],
        "src int, dst int",
    )
    nodes = spark.createDataFrame([(i,) for i in [1, 2, 3, 4, 10, 11, 12, 20, 21, 30]], "node int")
    got = {
        r["node"]: r["component"]
        for r in connected_components(edges, nodes=nodes).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20, 30: 30}


def test_components_long_chain_converges(spark):
    # worst-case diameter for hash-min: a 12-node path, min id at one end
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 12)], "src int, dst int"
    )
    got = {r["node"]: r["component"] for r in connected_components(edges).collect()}
    assert set(got.values()) == {1} and len(got) == 12


def test_dedup_canonical(spark):
    corpus = spark.createDataFrame(
        [(i, f"text {i}") for i in [1, 2, 3, 7, 9]], "doc_id int, text string"
    )
    pairs = spark.createDataFrame([(1, 3), (3, 9)], "id_a int, id_b int")
    rows = {r["doc_id"]: r for r in dedup_canonical(corpus, pairs).collect()}
    assert rows[1]["is_canonical"] and not rows[3]["is_canonical"] and not rows[9]["is_canonical"]
    assert rows[2]["is_canonical"] and rows[7]["is_canonical"]
    assert rows[3]["component"] == 1 and rows[9]["component"] == 1
