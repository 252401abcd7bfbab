"""Connected components — duplicate-group resolution over near-dup pairs.

Pair-producing dedup operators (operators/dedup.py: exact, n-gram Jaccard,
MinHash-LSH, SimHash) emit EDGES (id_a, id_b).  Canonicalizing a corpus
("keep one doc per duplicate cluster") needs the transitive closure of
those edges: connected components, an inherently iterative computation the
reference engine has no counterpart for and plain SQL only reaches through
recursive CTEs.

Algorithm: hash-min label propagation.  Every node starts labelled with its
own id; each round every node takes the min label across itself and its
neighbors; stop when no label changes.  Rounds = graph diameter, which for
duplicate clusters (dense near-cliques produced by similarity thresholds)
is small and independent of corpus size — the row count per round is
|edges|, fully shuffle-parallel on the node key.  For adversarial
long-chain graphs the published upgrade is the alternating small-star /
large-star algorithm (Kiveris et al., "Connected Components in MapReduce
and Beyond", SoCC'14) with O(log² n) rounds; the loop below is the
practical choice for dedup workloads.

Spark specifics: each round ends in ``localCheckpoint`` — without it the
logical plan doubles every iteration and Catalyst analysis time explodes
long before the data does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    nodes: DataFrame | None = None,
    max_iter: int = 50,
) -> DataFrame:
    """(src, dst) undirected edges → (node, component), component = min
    node id of the cluster.

    ``nodes`` optionally supplies the full node universe (e.g. every
    doc_id) so isolated nodes come back as their own singleton component;
    default universe = nodes appearing in edges.
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    e = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    e = e.distinct().localCheckpoint(eager=True)

    if nodes is None:
        universe = e.select(F.col("a").alias("node")).distinct()
    else:
        universe = nodes.select(F.col(nodes.columns[0]).alias("node")).distinct()
    labels = universe.select("node", F.col("node").alias("label")).localCheckpoint(
        eager=True
    )

    for _ in range(max_iter):
        nbr_min = (
            e.join(labels, e["a"] == labels["node"])
            .select(F.col("b").alias("node"), "label")
            .groupBy("node")
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(nbr_min, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
                ).alias("label"),
                (F.col("nbr_label") < F.col("label")).alias("_chg"),
            )
        ).localCheckpoint(eager=True)
        changed = new_labels.filter(F.col("_chg")).limit(1).count()
        labels = new_labels.drop("_chg")
        if changed == 0:
            break
    return labels.select("node", F.col("label").alias("component"))


def dedup_canonical(
    df: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Corpus + near-dup pairs → corpus annotated with (component,
    is_canonical): one keeper (min id) per duplicate cluster.  The
    filter ``is_canonical`` is the end-to-end dedup a training-data
    pipeline actually applies."""
    comp = connected_components(
        pairs, src=pairs.columns[0], dst=pairs.columns[1], nodes=df.select(id_col)
    )
    return df.join(
        comp.withColumnRenamed("node", id_col), id_col, "left"
    ).withColumn(
        "is_canonical", F.col(id_col) == F.coalesce("component", F.col(id_col))
    )
