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

from radohydro_spark.functions.text import portable_hash


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(c: Column) -> Column:
    return F.sqrt(
        F.aggregate(F.transform(c, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x)
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; a zero-norm (or empty) vector scores 0.0 — under
    Spark 4's default ANSI mode the unguarded division raised
    DIVIDE_BY_ZERO and killed every cosine-based operator on the first
    all-zero embedding (r12 review, reproduced live).

    The guard is ``try_divide`` + ``coalesce``, NOT a ``when`` on the
    denominator: the when-form names the denominator twice — 5
    ``aggregate()`` nodes in the physical plan instead of 3
    (plan-asserted in tests).  An isolated interleaved A/B on 1M×64-dim
    rows measured the rewrite ~6% faster (0.889 vs 0.941 s min-of-4) —
    smaller than the node count suggests because Spark's interpreted
    subexpression elimination already shares the norms across the
    when-branches; the r12 `similarity_cosine_topk` bench movement was
    therefore predominantly host tenancy, with this rewrite as a real
    but modest trim.  ``try_divide`` evaluates each side exactly once and
    yields NULL on /0, which coalesce maps to the 0.0 contract.  The
    leading when() preserves NULL propagation — a NULL vector OR a
    vector containing a NULL element scores NULL, exactly like the
    pre-r13 form (corrupt/partial embeddings must surface as NULL, not
    rank as "orthogonal" 0.0; r13 review) — via two cheap
    short-circuiting exists() passes, not aggregate re-evaluation.

    Oracle contract note: the NULL-ELEMENT law is engine-defined only —
    DuckDB's ``list_dot_product`` ERRORS on a NULL element rather than
    returning NULL, so a corrupt batch fails the oracle run loudly
    instead of being silently scored; the driver corpus schema carries
    non-null elements, and the ZERO-NORM law (the realizable case) is
    aligned on both engines and dual-engine-tested."""
    poisoned = (
        a.isNull()
        | b.isNull()
        | F.exists(a, lambda x: x.isNull())
        | F.exists(b, lambda x: x.isNull())
    )
    return F.when(poisoned, F.lit(None).cast("double")).otherwise(
        F.coalesce(F.try_divide(dot(a, b), norm(a) * norm(b)), F.lit(0.0))
    )


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
        # plane as ONE literal array + a zip_with/aggregate dot product:
        # same sequential fold order as an unrolled sum (bit-identical
        # result), but compact generated code — 64-dim unrolled terms
        # overflow the JVM 64KB method limit and kill whole-stage codegen
        plane = F.array(
            *[_hyperplane_component(j, d) for d in range(n_dims)]
        )
        proj = F.aggregate(
            F.zip_with(v, plane, lambda x, p: x * p),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
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
    a map-side-combinable aggregate, no corpus shuffle).

    Tie-break is smallest ``centroid_id`` via ``-centroid_id`` in the
    max_by key — centroid ids are NUMERIC by construction here (every
    builder derives them from corpus ids or row numbers); a caller
    supplying string centroid ids would need a rank column instead."""
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

    qprobe = _probe_lists(
        queries, centroids, nprobe, vec_col, query_id_col, with_vec=True
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
    only carries the (tiny) centroid table between iterations, and each
    iteration ``localCheckpoint``s it eagerly: without the truncation,
    iteration k's centroid plan nests every previous iteration's corpus
    aggregation, so evaluating the final table would replay the whole
    history — the classic iterative-lineage trap (same discipline as
    pagerank/connected_components).
    """
    centroids = (
        corpus.orderBy(id_col)
        .limit(n_centroids)
        .select(F.col(id_col).alias("centroid_id"), F.col(vec_col))
    )
    for _ in range(iterations):
        centroids = centroids.localCheckpoint(eager=True)
        assigned = ivf_assign(corpus, centroids, vec_col, id_col).join(corpus, id_col)
        means = (
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
                F.transform(F.col("_dm"), lambda s: s["m"]).alias("_new"),
            )
        )
        # a centroid that attracted ZERO vectors has no mean rows — keep
        # its previous position instead of silently dropping it (pq_train's
        # empty-codes convention; r12 review: the centroid table otherwise
        # SHRANK and the index wrote fewer inverted lists than promised)
        centroids = (
            centroids.join(means, "centroid_id", "left")
            .select(
                "centroid_id",
                F.coalesce(F.col("_new"), F.col(vec_col)).alias(vec_col),
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
        lsh_bucket(vec_col, n_planes, n_dims).alias("bucket"),
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        lsh_bucket(vec_col, n_planes, n_dims).alias("bucket"),
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


def pq_codebooks(
    corpus: DataFrame,
    m: int = 8,
    k: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Seeded product-quantization codebooks as a numpy array (m, k, dim/m):
    codeword c of subspace j = subvector j of the c-th corpus vector by id —
    deterministic, so a SQL oracle reproduces the identical codebooks.
    Codebooks are dimension-sized (m*k*sub_dim doubles); collecting them to
    the driver is the PQ equivalent of broadcasting a dim table."""
    import numpy as np

    rows = (
        corpus.orderBy(id_col)
        .limit(k)
        .select(F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"))
        .collect()
    )
    if len(rows) < k:
        raise ValueError(
            f"pq_codebooks: corpus has only {len(rows)} vectors but k={k} "
            "codewords were requested — PQ needs at least k training rows"
        )
    mat = np.array([r["v"] for r in rows], dtype=np.float64)  # (k, dim)
    dim = mat.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    ds = dim // m
    # (k, m, ds) -> (m, k, ds)
    return mat.reshape(k, m, ds).transpose(1, 0, 2).copy()


def pq_train(
    corpus: DataFrame,
    m: int = 8,
    k: int = 16,
    iterations: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Lloyd refinement of PQ codebooks, distributed: each iteration is ONE
    broadcast-join assignment over the exploded (vector, subspace) rows —
    all m subspaces train simultaneously (subspace is part of the join
    key) — and one map-side-combinable mean update.  Only the (tiny)
    codebook array rides the driver loop.  Returns (m, k, dim/m) numpy."""
    import numpy as np

    books = pq_codebooks(corpus, m, k, id_col, vec_col)
    ds = books.shape[2]
    sub = corpus.select(
        F.col(id_col),
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(m - 1)),
                lambda j: F.struct(
                    j.alias("j"),
                    F.transform(
                        F.slice(F.col(vec_col), j * ds + 1, ds),
                        lambda x: x.cast("double"),
                    ).alias("sv"),
                ),
            )
        ).alias("_s"),
    ).select(id_col, F.col("_s.j").alias("j"), F.col("_s.sv").alias("sv"))
    spark = corpus.sparkSession
    for _ in range(iterations):
        cent_rows = [
            (int(j), int(c), [float(x) for x in books[j, c]])
            for j in range(m)
            for c in range(k)
        ]
        cents = spark.createDataFrame(
            cent_rows, "j int, code int, cv array<double>"
        )
        d2 = (
            F.aggregate(F.col("sv"), F.lit(0.0), lambda a, x: a + x * x)
            + F.aggregate(F.col("cv"), F.lit(0.0), lambda a, x: a + x * x)
            - 2.0 * dot(F.col("sv"), F.col("cv"))
        )
        assigned = (
            sub.join(F.broadcast(cents), "j")
            .withColumn("_d", d2)
            .groupBy(id_col, "j", "sv")
            .agg(F.min_by("code", F.struct(F.col("_d"), F.col("code"))).alias("code"))
        )
        means = (
            assigned.select("j", "code", F.posexplode("sv").alias("dim", "x"))
            .groupBy("j", "code", "dim")
            .agg(F.avg("x").alias("mx"))
            .collect()
        )
        for r in means:  # empty codes keep their previous codeword
            books[r["j"], r["code"], r["dim"]] = r["mx"]
    return books


def pq_encode(
    corpus: DataFrame,
    books,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ-encode each vector: codes[j] = argmin_c ||subvec_j - books[j,c]||²
    (first-min tie-break, matching ORDER BY (dist, code)).

    Arrow-batched ``mapInPandas`` with the (m, k, ds) codebook array in the
    kernel closure — vectorized matmul argmin per batch, a pure narrow
    stage: at 100 TB this pipelines over the scan with NO shuffle, emitting
    m bytes per vector (the 128x compression that makes exabyte-scale ANN
    storable).  Returns (id, codes array<int>)."""
    import numpy as np

    b = np.asarray(books, dtype=np.float64)
    m, k, ds = b.shape
    cn = (b * b).sum(axis=2)  # (m, k)

    def gen(it):
        import pandas as pd

        for pdf in it:
            vecs = np.array([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            if len(vecs) == 0:
                yield pd.DataFrame({id_col: [], "codes": []})
                continue
            sub = vecs.reshape(len(vecs), m, ds)
            codes = np.empty((len(vecs), m), dtype=np.int32)
            for j in range(m):
                x = sub[:, j, :]  # (n, ds)
                # ||x-c||^2 = |x|^2 + |c|^2 - 2 x.c ; |x|^2 constant per row
                d = cn[j][None, :] - 2.0 * (x @ b[j].T)  # (n, k)
                codes[:, j] = d.argmin(axis=1)
            yield pd.DataFrame(
                {id_col: pdf[id_col], "codes": [list(map(int, c)) for c in codes]}
            )

    id_t = corpus.schema[id_col].dataType.simpleString()
    return corpus.select(id_col, vec_col).mapInPandas(
        gen, schema=f"{id_col} {id_t}, codes array<int>"
    )


def pq_adc_topk(
    corpus: DataFrame,
    queries: DataFrame,
    books,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Asymmetric-distance top-k over PQ codes: each query builds an
    (m x n_codes) lookup table of exact subspace distances to every
    codeword; a corpus row's approximate distance is m table lookups summed
    — never a full d-dim computation against raw vectors.

    The LUTs ride the kernel closure (|queries| * m * k doubles — query
    sets are small); the corpus side is ONE narrow pass over its codes plus
    the per-query top-k window.  At 100 TB the scan reads only the code
    column (m bytes/vector), the raw embedding store never enters the
    query path."""
    import numpy as np

    b = np.asarray(books, dtype=np.float64)
    m = b.shape[0]
    # shared LUT construction (_pq_query_luts — one home for the distance
    # formula, r12 review) keyed by the raw id value (any id type)
    luts = _pq_query_luts(queries, b, query_id_col, vec_col)
    q_ids = list(luts)

    codes = pq_encode(corpus, b, id_col, vec_col)

    def gen(it):
        import pandas as pd

        for pdf in it:
            if len(pdf) == 0:
                continue
            cmat = np.array([np.asarray(c) for c in pdf["codes"]])  # (n, m)
            out_q, out_v, out_d = [], [], []
            jj = np.arange(m)
            for qid in q_ids:
                adc = luts[qid][jj, cmat].sum(axis=1)  # (n,)
                out_q.extend([qid] * len(pdf))
                out_v.extend(pdf[id_col])
                out_d.extend(adc)
            yield pd.DataFrame(
                {"query_id": out_q, "vec_id": out_v, "adc": out_d}
            )

    qid_t = queries.schema[query_id_col].dataType.simpleString()
    vid_t = corpus.schema[id_col].dataType.simpleString()
    scored = codes.mapInPandas(
        gen, schema=f"query_id {qid_t}, vec_id {vid_t}, adc double"
    ).withColumn("adc_dist", F.round("adc", 6))
    # rank on the ROUNDED distance (ties -> vec_id): the raw-double order
    # was the one cross-engine float-ordering seam (see _adc_topk)
    w = W.partitionBy("query_id").orderBy(F.asc("adc_dist"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "adc_dist", "rank")
    )


def ann_topk_lsh_multiprobe(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 4,
    n_dims: int = 16,
    n_probes: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Multi-probe LSH top-k: the query probes its own bucket PLUS the
    ``n_probes - 1`` single-bit-flip neighbor buckets (the nearest
    Hamming-1 perturbations — where boundary-adjacent true neighbors
    land), recovering most of the recall lost to bucket quantization for
    ~n_probes× the candidate cost and the SAME corpus layout (one
    bucketed write serves every probe count).

    The corpus side is untouched — probes explode only the (small) query
    side before the bucket equi-join; candidate duplicates from multiple
    probes are collapsed with ``dropDuplicates`` before scoring.
    Deterministic planes ⇒ exact SQL oracle."""
    if n_probes < 1 or n_probes > n_planes + 1:
        raise ValueError(f"n_probes must be in [1, {n_planes + 1}]")
    c = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("cv"),
        lsh_bucket(vec_col, n_planes, n_dims).alias("bucket"),
    )
    base = lsh_bucket(vec_col, n_planes, n_dims)
    probes = F.array(
        base, *[base.bitwiseXOR(F.lit(1 << j)) for j in range(n_probes - 1)]
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        F.explode(probes).alias("bucket"),
    )
    cand = (
        c.join(F.broadcast(q), "bucket")
        .select("query_id", "vec_id", "qv", "cv")
        .dropDuplicates(["query_id", "vec_id"])
    )
    scored = cand.withColumn(
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


def random_projection_int(
    df: DataFrame,
    out_dims: int = 16,
    scale: int = 1000,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Johnson-Lindenstrauss sign random projection with EXACT integer
    arithmetic (r6) — the dimensionality-reduction pass in front of ANN
    indexing: project ``dim`` float dims onto ``out_dims`` ±1 hyperplanes.

    Two scale/exactness tricks:

    * The projection matrix is never materialized: the sign of cell
      ``(i, j)`` is a closed-form hash ``((i·2654435761 + j·40503) % 97)
      % 2`` — Knuth multiplicative constant, any engine reproduces it.
    * Inputs quantize to integers first (``round(x·scale)``), so every
      projection is a BIGINT dot product — exact in any summation order,
      immune to the float-reassociation divergence that makes cross-engine
      float dot products hash-unstable.

    Pure per-row JVM array expressions (``aggregate`` over an index
    sequence): no UDF, no shuffle, pipelines into the scan.  Emits
    ``(id, y0..y{out_dims-1}, l2q)`` with ``l2q = Σ y_j²`` (exact BIGINT;
    by J-L, ``l2q/(scale²·out_dims)`` concentrates around ``‖x‖²/dim``).
    """
    q = F.transform(
        F.col(vec_col),
        lambda x: F.round(x.cast("double") * F.lit(float(scale))).cast("long"),
    )
    staged = df.select(F.col(id_col), q.alias("_q"))

    def proj(j: int):
        return F.expr(
            f"aggregate(sequence(0, size(_q) - 1), 0L, (acc, i) -> acc + "
            f"element_at(_q, i + 1) * (CASE WHEN ((i * 2654435761L + "
            f"{j} * 40503L) % 97) % 2 = 0 THEN 1L ELSE -1L END))"
        )

    ys = [proj(j).alias(f"y{j}") for j in range(out_dims)]
    out = staged.select(id_col, *ys)
    l2q = sum(
        (F.col(f"y{j}") * F.col(f"y{j}") for j in range(out_dims)),
        F.lit(0).cast("long"),
    )
    return out.select(id_col, *[f"y{j}" for j in range(out_dims)], l2q.alias("l2q"))


def build_ivf_index(
    corpus: DataFrame,
    path: str,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_iterations: int = 0,
) -> None:
    """Persist an IVF index: postings written as parquet PARTITIONED BY
    centroid_id, centroids as a sibling table — the build-once/query-many
    vector-index lifecycle.  Probing then reads only the probed
    partitions (Spark partition pruning — the storage-level analog of
    FAISS's inverted lists), so a query touches nprobe/n_centroids of
    the corpus bytes instead of scanning everything.

    ``train_iterations=0`` (default) takes the first ``n_centroids``
    vectors by id as centroids — deterministic, so the DuckDB oracle can
    reproduce the index exactly.  ``train_iterations>0`` runs
    :func:`ivf_train`'s relational Lloyd refinement first (production
    recall: refined centroids track the data's density, so each query's
    true neighbors concentrate in fewer probed lists — measured
    recall@5 table in QUERIES.md under similarity_index_persist).
    Layout and read path are identical either way; only centroid
    GEOMETRY changes, so :func:`query_ivf_index` needs no flag."""
    if train_iterations > 0:
        centroids = ivf_train(
            corpus,
            n_centroids=n_centroids,
            iterations=train_iterations,
            id_col=id_col,
            vec_col=vec_col,
        )
    else:
        centroids = (
            corpus.orderBy(id_col)
            .limit(n_centroids)
            .select(F.col(id_col).alias("centroid_id"), F.col(vec_col))
        )
    assigned = ivf_assign(corpus, centroids, vec_col, id_col).join(corpus, id_col)
    (
        assigned.repartition("centroid_id")
        .write.mode("errorifexists")
        .partitionBy("centroid_id")
        .parquet(f"{path}/postings")
    )
    centroids.coalesce(1).write.mode("errorifexists").parquet(f"{path}/centroids")


def query_ivf_index(
    spark,
    path: str,
    queries: DataFrame,
    nprobe: int = 4,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Probe a persisted IVF index: pick each query's ``nprobe`` nearest
    centroids, read ONLY those posting partitions (the probed-centroid
    filter is a partition filter — asserted by tests/test_plans.py), and
    exact-rerank the candidates.  Same result contract as the in-memory
    :func:`ivf_topk` with the same deterministic centroids."""
    centroids = spark.read.parquet(f"{path}/centroids")
    qprobe = _probe_lists(
        queries, centroids, nprobe, vec_col, query_id_col, with_vec=True
    )
    probed = [
        r["centroid_id"]
        for r in qprobe.select("centroid_id").distinct().collect()
    ]  # nprobe x |queries| ids max — dimension-sized by construction
    postings = spark.read.parquet(f"{path}/postings").filter(
        F.col("centroid_id").isin(probed)  # partition-pruning predicate
    )
    scored = postings.select(
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


def _pq_query_luts(queries: DataFrame, b, query_id_col: str, vec_col: str):
    """Per-query asymmetric-distance lookup tables (|queries|·m·n_codes
    doubles — the dimension-sized artifact that rides the ADC kernel
    closure)."""
    import numpy as np

    m, _, ds = b.shape
    q_rows = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("qv"),
    ).collect()
    luts = {}
    for r in q_rows:
        qsub = np.asarray(r["qv"], dtype=np.float64).reshape(m, ds)
        # keyed by the RAW id value — any hashable id type works (numpy
        # ints hash-equal to python ints; strings are strings), r12 review
        luts[r["query_id"]] = (
            (qsub * qsub).sum(axis=1)[:, None]
            + (b * b).sum(axis=2)
            - 2.0 * np.einsum("jd,jcd->jc", qsub, b)
        )
    return luts


def _adc_topk(cand: DataFrame, luts, m: int, k: int) -> DataFrame:
    """ADC scoring + per-query top-k over (query_id, vec_id, codes)
    candidate rows: one Arrow kernel pass, then the candidates-only
    ranking window.  Output id types FOLLOW the candidate frame's
    (hardcoded BIGINT broke string-keyed layers, r12 review); the rank
    orders by the 6-dp ROUNDED distance (ties → vec_id) — ranking on the
    raw double was the one float-ordering seam the cosine paths don't
    have: numpy BLAS sums and the oracle's sequential folds may differ
    in the last ulps, and the rounded distance is what both engines
    pin."""
    import numpy as np

    jj = np.arange(m)

    def gen(it):
        import pandas as pd

        for pdf in it:
            if len(pdf) == 0:
                continue
            cmat = np.array([np.asarray(c) for c in pdf["codes"]])  # (n, m)
            lut3 = np.stack([luts[q] for q in pdf["query_id"]])
            adc = lut3[np.arange(len(pdf))[:, None], jj[None, :], cmat].sum(axis=1)
            yield pd.DataFrame(
                {"query_id": pdf["query_id"], "vec_id": pdf["vec_id"], "adc": adc}
            )

    qid_t = cand.schema["query_id"].dataType.simpleString()
    vid_t = cand.schema["vec_id"].dataType.simpleString()
    scored = cand.mapInPandas(
        gen, schema=f"query_id {qid_t}, vec_id {vid_t}, adc double"
    ).withColumn("adc_dist", F.round("adc", 6))
    w = W.partitionBy("query_id").orderBy(F.asc("adc_dist"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "adc_dist", "rank")
    )


def _probe_lists(
    queries: DataFrame,
    centroids: DataFrame,
    nprobe: int,
    vec_col: str,
    query_id_col: str,
    with_vec: bool = False,
) -> DataFrame:
    """Each query's nprobe nearest inverted lists by centroid cosine
    (ties → smaller centroid_id), as (query_id, centroid_id) rows —
    ``with_vec=True`` also carries the query vector as ``qv`` (the
    exact-rerank IVF-flat paths need it; the single home of probe
    selection, r12 review: three inline copies had accumulated)."""
    cq = centroids.select("centroid_id", F.col(vec_col).alias("_cent"))
    probed = (
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
    )
    cols = [F.col(query_id_col).alias("query_id")]
    if with_vec:
        cols.append(F.col(vec_col).alias("qv"))
    return probed.select(*cols, "centroid_id")


def ivf_pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    n_centroids: int = 16,
    nprobe: int = 4,
    m: int = 8,
    n_codes: int = 16,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    centroids: DataFrame | None = None,
    books=None,
) -> DataFrame:
    """IVF-PQ composite ANN (the FAISS ``IVFPQ`` layout, Jégou et al.
    TPAMI'11): the coarse inverted-list quantizer PRUNES (only the
    query's ``nprobe`` nearest lists are read) and product quantization
    COMPRESSES (candidates score by asymmetric distance over the m-byte
    code column, never the raw vectors) — the two orthogonal scale
    levers of :func:`ivf_topk` and :func:`pq_adc_topk` composed into the
    standard billion-vector serving layout.

    Deterministic twins of both quantizers (first-``n_centroids`` /
    first-``n_codes`` corpus vectors by id) keep the whole path
    SQL-reproducible by default; pass trained ``centroids``
    (:func:`ivf_train`) and ``books`` (:func:`pq_train`) for production
    recall — the plan is identical either way.

    Plan shape: codes + list assignment join ONCE on the id key at build
    time (amortized across queries when persisted — see
    :func:`build_ivf_index` for the partitioned-parquet lifecycle);
    query side broadcasts (query, probed-list) pairs so candidate
    selection is a broadcast hash join on ``centroid_id``; ADC scoring
    is one Arrow kernel pass over candidate code rows (LUTs ride the
    closure, |queries|·m·n_codes doubles); the only aggregation is the
    per-query top-k window over candidates.  At 100 TB: nprobe/n_lists
    of the corpus is read, at m bytes per vector.
    """
    import numpy as np

    if centroids is None:
        centroids = (
            corpus.orderBy(id_col)
            .limit(n_centroids)
            .select(F.col(id_col).alias("centroid_id"), F.col(vec_col))
        )
    if books is None:
        books = pq_codebooks(corpus, m, n_codes, id_col, vec_col)
    b = np.asarray(books, dtype=np.float64)
    assigned = ivf_assign(corpus, centroids, vec_col, id_col)
    codes = pq_encode(corpus, b, id_col, vec_col)
    inv = codes.join(assigned, id_col)

    luts = _pq_query_luts(queries, b, query_id_col, vec_col)
    qprobe = _probe_lists(queries, centroids, nprobe, vec_col, query_id_col)
    cand = inv.join(F.broadcast(qprobe), "centroid_id").select(
        "query_id", F.col(id_col).alias("vec_id"), "codes"
    )
    return _adc_topk(cand, luts, b.shape[0], k)


def build_ivfpq_index(
    corpus: DataFrame,
    path: str,
    n_centroids: int = 16,
    m: int = 8,
    n_codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_iterations: int = 0,
    pq_iterations: int = 0,
) -> None:
    """Persist an IVF-PQ index — the compressed sibling of
    :func:`build_ivf_index` and the standard billion-vector serving
    layout: CODE rows (m bytes of PQ codes per vector, never the raw
    embeddings) written as parquet PARTITIONED BY ``centroid_id``,
    centroids and flattened codebooks as sibling dimension tables.
    Probing reads nprobe/n_centroids of the code bytes — partition
    pruning gives the inverted-list seek, PQ gives the ~d·4/m
    compression; together a query touches (nprobe/n_lists)·(m/4d) of
    the raw-index bytes.

    ``train_iterations``/``pq_iterations`` = 0 (default) use the
    deterministic first-by-id quantizer twins (exactly SQL-reproducible
    — the driver oracle pins the round-trip); > 0 runs the
    :func:`ivf_train` / :func:`pq_train` Lloyd refinements for
    production recall.  Layout and read path are identical either way.
    """
    import numpy as np

    if train_iterations > 0:
        centroids = ivf_train(
            corpus, n_centroids=n_centroids, iterations=train_iterations,
            id_col=id_col, vec_col=vec_col,
        )
    else:
        centroids = (
            corpus.orderBy(id_col)
            .limit(n_centroids)
            .select(F.col(id_col).alias("centroid_id"), F.col(vec_col))
        )
    if pq_iterations > 0:
        books = pq_train(
            corpus, m=m, k=n_codes, iterations=pq_iterations,
            id_col=id_col, vec_col=vec_col,
        )
    else:
        books = pq_codebooks(corpus, m, n_codes, id_col, vec_col)
    b = np.asarray(books, dtype=np.float64)

    assigned = ivf_assign(corpus, centroids, vec_col, id_col)
    codes = pq_encode(corpus, b, id_col, vec_col).join(assigned, id_col)
    (
        codes.repartition("centroid_id")
        .write.mode("errorifexists")
        .partitionBy("centroid_id")
        .parquet(f"{path}/codes")
    )
    centroids.coalesce(1).write.mode("errorifexists").parquet(f"{path}/centroids")
    spark = corpus.sparkSession
    book_rows = [
        (int(j), int(c), [float(x) for x in b[j, c]])
        for j in range(b.shape[0])
        for c in range(b.shape[1])
    ]
    spark.createDataFrame(
        book_rows, "j int, code int, cv array<double>"
    ).coalesce(1).write.mode("errorifexists").parquet(f"{path}/codebooks")


def query_ivfpq_index(
    spark,
    path: str,
    queries: DataFrame,
    nprobe: int = 4,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Probe a persisted IVF-PQ index: pick each query's ``nprobe``
    nearest centroids, read ONLY those code partitions (the probed-
    centroid filter is a partition filter — plan-asserted in tests),
    ADC-score the candidate codes against per-query LUTs rebuilt from
    the persisted codebooks.  Same result contract as the in-memory
    :func:`ivf_pq_topk` with the same quantizers."""
    import numpy as np

    centroids = spark.read.parquet(f"{path}/centroids")
    book_rows = spark.read.parquet(f"{path}/codebooks").collect()
    m = 1 + max(r["j"] for r in book_rows)
    n_codes = 1 + max(r["code"] for r in book_rows)
    ds = len(book_rows[0]["cv"])
    b = np.empty((m, n_codes, ds), dtype=np.float64)
    for r in book_rows:
        b[r["j"], r["code"]] = r["cv"]

    luts = _pq_query_luts(queries, b, query_id_col, vec_col)
    qprobe = _probe_lists(queries, centroids, nprobe, vec_col, query_id_col)
    probed = [
        r["centroid_id"] for r in qprobe.select("centroid_id").distinct().collect()
    ]  # nprobe x |queries| ids max — dimension-sized by construction
    codes = spark.read.parquet(f"{path}/codes").filter(
        F.col("centroid_id").isin(probed)  # partition-pruning predicate
    )
    # posting id column follows the BUILD-time id_col (r12 review: the
    # hardcoded "vec_id" made an index built with id_col="doc_id"
    # unreadable); the output contract stays (query_id, vec_id, ...)
    cand = codes.join(F.broadcast(qprobe), "centroid_id").select(
        "query_id", F.col(id_col).alias("vec_id"), "codes"
    )
    return _adc_topk(cand, luts, m, k)
