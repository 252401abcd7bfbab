"""Similarity search over embedding columns (array<float>).

* ``cosine_topk``     — exact brute-force top-k: broadcast the (small) query
  set against the corpus, JVM-side dot products via zip_with/aggregate,
  per-query window top-k.  The correctness baseline.
* ``lsh_bucket``      — deterministic random-hyperplane signatures: buckets
  candidates so the scale path probes only matching buckets.  Hyperplane
  components derive from portable md5 hashing, so the DuckDB oracle can
  reproduce bucket assignments exactly.
* ``ann_topk_lsh``    — top-k within the query's bucket (approximate; recall
  grows with fewer planes / multi-probe).

At 100 TB the corpus side is hash-partitioned by bucket; queries broadcast.
No shuffle of the corpus beyond its one-time bucketing write.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from radohydro_spark.functions.text import HASH_MOD, portable_hash


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(c: Column) -> Column:
    return F.sqrt(
        F.aggregate(F.transform(c, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x)
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k by cosine for each query vector.

    ``queries(query_id, embedding)`` is broadcast (query sets are small);
    the corpus streams through one narrow stage; the only shuffle is the
    window's partition-by-query — sized by |queries| * |corpus| candidate
    rows, reduce with LSH below when that explodes."""
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("cv"))
    scored = c.crossJoin(F.broadcast(q)).withColumn(
        "cosine", F.round(cosine(F.col("qv"), F.col("cv")), 6)
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


def _hyperplane_component(plane: int, dim: int) -> Column:
    """Deterministic pseudo-random hyperplane component in [-1, 1):
    portable_hash of 'p<plane>-d<dim>' scaled.  Cross-engine reproducible."""
    h = portable_hash(F.lit(f"p{plane}-d{dim}"))
    return (h % 1000).cast("double") / 500.0 - 1.0


def lsh_bucket(
    df: DataFrame,
    vec_col: str = "embedding",
    n_planes: int = 4,
    n_dims: int | None = None,
    plane_offset: int = 0,
) -> Column:
    """Random-hyperplane LSH bucket id: bit_j = (v · plane_j) >= 0.

    ``n_dims`` is REQUIRED: the plane components become literal constants
    folded into the expression (whole-stage-codegen friendly, and the SQL
    twin embeds the identical numbers).  The former dynamic fallback that
    re-hashed plane components per row via a transform(sequence(...))
    chain was O(planes x dims) string-hash work per row — deleted; resolve
    the dimensionality once from your schema/config and pass it.
    ``plane_offset`` selects an independent plane family (band b uses
    planes [offset, offset + n_planes)) so multi-band callers get
    uncorrelated bucketings from the same deterministic hash stream."""
    if n_dims is None:
        raise ValueError(
            "lsh_bucket requires a static n_dims (embedding dimensionality); "
            "per-row dynamic plane hashing is not supported"
        )
    v = F.col(vec_col)
    bits = []
    for j_local in range(n_planes):
        j = j_local + plane_offset
        proj = None
        for d in range(n_dims):
            term = F.element_at(v, d + 1) * _hyperplane_component(j, d)
            proj = term if proj is None else proj + term
        bits.append(F.when(proj >= 0, F.lit(1)).otherwise(F.lit(0)) * (2**j_local))
    bucket = bits[0]
    for b in bits[1:]:
        bucket = bucket + b
    return bucket


def ivf_assign(
    df: DataFrame,
    centroids: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    by: str = "cosine",
) -> DataFrame:
    """Assign each vector to its nearest centroid (argmax cosine via
    ``max_by`` over a broadcast centroid cross join — one narrow stage plus
    a map-side-combinable aggregate, no corpus shuffle)."""
    c = centroids.select(
        F.col("centroid_id"), F.col(vec_col).alias("_cent")
    )
    scored = df.crossJoin(F.broadcast(c)).withColumn(
        "_sim", cosine(F.col(vec_col), F.col("_cent"))
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.max_by("centroid_id", F.struct(F.col("_sim"), -F.col("centroid_id"))).alias(
                "centroid_id"
            )
        )
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    n_centroids: int = 16,
    nprobe: int = 4,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """IVF-flat approximate top-k: coarse-quantize the corpus into
    inverted lists, probe only the query's ``nprobe`` nearest lists.

    Centroids here are the first ``n_centroids`` corpus vectors by id —
    deterministic, so the DuckDB oracle reproduces the exact same
    partitioning (swap in ``ivf_train``'s Lloyd-refined centroids for
    production recall; the plan shape is identical).

    Scale shape (100 TB): corpus is written bucketed by ``centroid_id``
    once; a query probes nprobe/n_centroids of the data, queries
    broadcast, and the only shuffle is the final per-query top-k window
    over |queries| x nprobe x avg-list candidates.
    """
    centroids = (
        corpus.orderBy(id_col)
        .limit(n_centroids)
        .select(F.col(id_col).alias("centroid_id"), F.col(vec_col))
    )
    assigned = ivf_assign(corpus, centroids, vec_col, id_col).join(
        corpus, id_col
    )

    cq = centroids.select("centroid_id", F.col(vec_col).alias("_cent"))
    qprobe = (
        queries.crossJoin(F.broadcast(cq))
        .withColumn("_sim", cosine(F.col(vec_col), F.col("_cent")))
        .withColumn(
            "_pr",
            F.row_number().over(
                W.partitionBy(query_id_col).orderBy(
                    F.desc("_sim"), F.asc("centroid_id")
                )
            ),
        )
        .filter(F.col("_pr") <= nprobe)
        .select(
            F.col(query_id_col).alias("query_id"),
            F.col(vec_col).alias("qv"),
            "centroid_id",
        )
    )
    scored = assigned.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("cv"), "centroid_id"
    ).join(F.broadcast(qprobe), "centroid_id").withColumn(
        "cosine", F.round(cosine(F.col("qv"), F.col("cv")), 6)
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


def ivf_train(
    corpus: DataFrame,
    n_centroids: int = 16,
    iterations: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Lloyd's k-means refinement of IVF centroids, expressed relationally:
    assignment = broadcast argmax-cosine; update = per-(centroid, dim) mean
    via posexplode + groupBy — both map-side combinable.  The driver loop
    only carries the (tiny) centroid table between iterations.
    """
    centroids = (
        corpus.orderBy(id_col)
        .limit(n_centroids)
        .select(F.col(id_col).alias("centroid_id"), F.col(vec_col))
    )
    for _ in range(iterations):
        assigned = ivf_assign(corpus, centroids, vec_col, id_col).join(corpus, id_col)
        centroids = (
            assigned.select("centroid_id", F.posexplode(vec_col).alias("dim", "x"))
            .groupBy("centroid_id", "dim")
            .agg(F.avg("x").alias("m"))
            .groupBy("centroid_id")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("dim", "m"))
                ).alias("_dm")
            )
            .select(
                "centroid_id",
                F.transform(F.col("_dm"), lambda s: s["m"]).alias(vec_col),
            )
        )
    return centroids


def ann_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 4,
    n_dims: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket.

    Deterministic: same planes both engines.  Misses neighbors across
    bucket boundaries by design (recall/cost trade); multi-probe = union
    over neighboring buckets."""
    c = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("cv"),
        lsh_bucket(corpus, vec_col, n_planes, n_dims).alias("bucket"),
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        lsh_bucket(queries, vec_col, n_planes, n_dims).alias("bucket"),
    )
    scored = c.join(F.broadcast(q), "bucket").withColumn(
        "cosine", F.round(cosine(F.col("qv"), F.col("cv")), 6)
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


def quantize_int8_stats(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Symmetric int8 quantization of an embedding column with per-vector
    scale, reporting reconstruction error — the storage-compression pass
    that turns a 100 TB float32 embedding store into ~25 TB.

    q_i = floor(x_i / scale + 0.5), scale = max|x| / 127 (symmetric,
    zero-point 0).  ``floor(v + 0.5)`` instead of round(): identical IEEE
    semantics in every engine, no banker's/decimal-string divergence.
    All JVM-side array expressions (zip_with/aggregate/transform) — no UDF,
    no shuffle; the operator is a pure projection that pipelines into
    whatever scan feeds it.

    Returns (id_col, dim, scale, max_abs_err, mse) — error between the
    original and the dequantized q*scale, sequential-fold sums so the
    oracle reproduces bit-exact values.
    """
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    max_abs = F.aggregate(
        v, F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x))
    )
    scale = max_abs / F.lit(127.0)
    # guard all-zero vectors: scale 0 -> quantized all zeros, zero error
    q = F.transform(
        v,
        lambda x: F.when(scale > 0, F.floor(x / scale + F.lit(0.5)))
        .otherwise(F.lit(0.0))
        .cast("double"),
    )
    err = F.zip_with(v, q, lambda x, qq: F.abs(x - qq * scale))
    max_err = F.aggregate(err, F.lit(0.0), lambda acc, e: F.greatest(acc, e))
    sq_sum = F.aggregate(err, F.lit(0.0), lambda acc, e: acc + e * e)
    return df.select(
        F.col(id_col),
        F.size(F.col(vec_col)).alias("dim"),
        F.round(scale, 9).alias("scale"),
        F.round(max_err, 9).alias("max_abs_err"),
        F.round(sq_sum / F.size(F.col(vec_col)), 12).alias("mse"),
    )
