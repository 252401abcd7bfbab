"""Distributed linear algebra: integer-exact Gram matrix + PCA top
component via power iteration.

The scale pattern is the classic two-phase Gram factorization: the
O(N·d²) work — accumulating X^T X over N vectors — is distributed as
per-batch NumPy outer-product partials (`mapInPandas` emitting d² partial
sums per Arrow batch, one tiny shuffle of dimension-sized rows), and the
O(d²·iters) eigensolve on the resulting d×d matrix is driver-side, the
same dimension-sized-collect contract as the PQ codebooks and Lloyd
centroids in operators/similarity.py.  At d=64 the Gram matrix is 4096
BIGINTs regardless of whether N is 2k or 2 billion.

Cross-engine exactness (the oracle reproduces every integer): vectors
quantize to integers first (``round(x·scale)``), so all Gram sums and
every power-iteration step are exact BIGINT arithmetic immune to float
reassociation; per-iteration renormalization divides by a power-of-two
floor quotient of the max magnitude (``sign(w)·(|w| // d)`` — floor ==
trunc on nonnegative operands, so Spark/Python and DuckDB agree even
though their native integer divisions differ on negatives).  Floats
appear exactly twice, in the final normalization: ``sqrt`` of an exact
integer and one division per component — both correctly-rounded IEEE
ops, deterministic across engines.

The uncentered second-moment matrix (Gram) is used rather than the
covariance — equivalent for near-zero-mean embeddings and exactly
reproducible without a second mean-subtraction pass; documented, not
hidden.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def gram_matrix_int(
    df: DataFrame,
    vec_col: str = "embedding",
    dims: int = 64,
    scale: int = 1000,
) -> DataFrame:
    """Exact integer Gram matrix: ``C[i][j] = Σ_rows q_i·q_j`` with
    ``q = round(x·scale)`` — one ``mapInPandas`` pass emitting d²
    partial sums per Arrow batch (NumPy einsum, no Python per-row work),
    then a single dimension-sized groupBy.  Returns (i, j, c) rows.

    Shuffle volume is ``n_batches × d²`` rows of three longs — at any
    corpus size the exchange moves kilobytes per task, never data."""
    import numpy as np

    def partial_gram(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc = np.zeros((dims, dims), dtype=np.int64)
        seen = False
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            # half-up away from zero via the explicit floor formula —
            # np.rint is half-EVEN; the oracle runs the IDENTICAL
            # sign·floor(|x|·scale + 0.5) double expression, so the two
            # engines execute the same IEEE sequence (no rounding-mode
            # semantics to reconcile at all)
            q = (np.sign(m) * np.floor(np.abs(m) * scale + 0.5)).astype(
                np.int64
            )
            acc += q.T @ q
            seen = True
        if seen:
            ii, jj = np.meshgrid(
                np.arange(dims, dtype=np.int64),
                np.arange(dims, dtype=np.int64),
                indexing="ij",
            )
            yield pd.DataFrame(
                {"i": ii.ravel(), "j": jj.ravel(), "c": acc.ravel()}
            )

    partials = df.select(vec_col).mapInPandas(
        partial_gram, "i long, j long, c long"
    )
    return partials.groupBy("i", "j").agg(F.sum("c").alias("c"))


def power_iterate_int(
    gram: dict[tuple[int, int], int],
    dims: int,
    iterations: int = 4,
    cap_bits: int = 20,
) -> list[int]:
    """Integer-exact power iteration on a collected Gram dict: ``w = C·v``
    in exact int arithmetic, then renormalize ``v = sign(w)·(|w| // d)``
    with ``d = max(1, max|w| // 2^cap_bits)`` so |v| stays ≤ ~2^(cap_bits+1)
    without ever touching floats.  The intermediate ``w`` is NOT bounded
    by 2^63: Gram entries grow linearly with row count (c ≈ N·scale²·E[x²]),
    so at scale=1000 the matvec product exceeds int64 around N≈10⁷ rows —
    harmless here (Python ints are unbounded) but it means any fixed-width
    twin of this loop (the DuckDB oracle) must compute ``w`` in a 128-bit
    type; ``_pca_oracle`` casts to HUGEINT before the multiply.  The
    GRAM entries themselves must still fit int64 (Spark sums them as
    longs): N·scale²·E[x²] < 2^63, i.e. ~9·10¹² unit-norm rows at
    scale=1000 — an enforced design bound, documented here.
    Deterministic by construction; the SQL oracle unrolls the identical
    steps."""
    v = [1] * dims  # deterministic all-ones start
    for _ in range(iterations):
        w = [
            sum(gram.get((i, j), 0) * v[j] for j in range(dims))
            for i in range(dims)
        ]
        wmax = max(abs(x) for x in w)
        d = max(1, wmax // (1 << cap_bits))
        v = [(1 if x >= 0 else -1) * (abs(x) // d) for x in w]
    return v


def pca_top_component(
    spark: SparkSession,
    df: DataFrame,
    vec_col: str = "embedding",
    dims: int = 64,
    scale: int = 1000,
    iterations: int = 4,
) -> DataFrame:
    """Top principal direction of the (uncentered) second-moment matrix:
    distributed integer Gram + driver-side integer power iteration +
    one exact float normalization.  Returns (dim, loading) rows with
    ``loading = round(v_dim / sqrt(Σ v²), 6)`` — Σv² is an exact BIGINT,
    so the sqrt and division are single deterministic IEEE ops.  The
    final rounding runs through Spark's ``F.round`` (HALF_UP), matching
    DuckDB's half-away-from-zero double rounding — Python's builtin
    ``round`` is banker's and must not touch the output."""
    rows = gram_matrix_int(df, vec_col, dims, scale).collect()
    gram = {(r["i"], r["j"]): r["c"] for r in rows}  # d² ints — dimension-sized
    v = power_iterate_int(gram, dims, iterations)
    norm_sq = sum(x * x for x in v)  # exact BIGINT
    if norm_sq == 0:
        # empty input, or every vector quantized to zero (|x|·scale < 0.5
        # everywhere): there is no principal direction — fail loudly
        # instead of emitting 0/0 NaN loadings
        raise ValueError(
            "pca_top_component: second-moment matrix is zero (empty input "
            "or all vectors below quantization resolution; raise `scale`)"
        )
    base = spark.createDataFrame(
        [(i, v[i]) for i in range(dims)], "dim int, v long"
    )
    return base.select(
        "dim",
        F.round(
            F.col("v") / F.sqrt(F.lit(float(norm_sq))), 6
        ).alias("loading"),
    ).orderBy("dim")


def label_centroids(
    df: DataFrame,
    vec_col: str,
    label_col: str,
    scale: int = 1_000_000,
) -> DataFrame:
    """Per-label embedding centroids, long format ``(label, dim, n_vecs,
    centroid)`` — the class-statistics pass behind centroid classifiers,
    drift monitors ("did src7's embedding mass move this week?") and the
    seed step of cluster-based curation.

    Exact cross-engine by the same quantize-then-sum discipline as the
    Gram matrix above: each component quantizes ``floor(v·scale + 0.5)``
    to BIGINT (IEEE-identical on both engines), per-(label, dim) sums are
    exact integers, and the centroid is ONE division of the same two
    exact numbers — never a float sum.

    Shape: posexplode -> ONE map-side-combinable aggregate on the
    (label, dim) key; output cardinality = |labels| x d (a dimension
    table).  At 100 TB this is the cheapest possible pass over the
    embedding column: one narrow projection, one combinable exchange.
    """
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    q = F.transform(v, lambda x: F.floor(x * scale + 0.5).cast("long"))
    exploded = df.select(
        F.col(label_col).alias("label"), F.posexplode(q).alias("dim", "_q")
    )
    return (
        exploded.groupBy("label", "dim")
        .agg(F.count("*").alias("n_vecs"), F.sum("_q").alias("_s"))
        .select(
            "label",
            "dim",
            "n_vecs",
            (
                F.col("_s").cast("double")
                / F.col("n_vecs")
                / F.lit(float(scale))
            ).alias("centroid"),
        )
    )
