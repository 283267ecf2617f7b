"""Distance metrics — the engine's only shared kernel.

Each metric exists twice, from one registry of names:

1. A **Spark Column expression** built from higher-order functions
   (``zip_with`` + ``aggregate``) — JVM-side, whole-stage-codegen'd, used by
   the relational operators (exact kNN, rescoring, near-dup joins) and
   hash-matched against DuckDB.
2. A **numpy twin** — vectorized batch kernels used inside the pandas-UDF
   graph-build/beam-search stages.

Semantics mirror the reference's ``anndists`` metrics (reference
src/lib.rs:38, 375-379; README.md:15,33-34):

- ``l2``      — Euclidean distance sqrt(sum((x-y)^2))    (DistL2)
- ``cosine``  — 1 - dot(a,b) / (|a||b|)                  (DistCosine)
- ``dot``     — 1 - dot(a,b)                             (DistDot; intended
                for pre-normalized vectors, where it equals cosine —
                reference examples/utils/annhdf5.rs:204-213)
- ``hamming`` — sum(popcount(x XOR y)) over integer words (DistHamming,
                u64 bit-pattern vectors, reference lib.rs:22-29)

Distances always return a float (reference lib.rs:713-721); ordering ties
break by id ascending everywhere (reference lib.rs:150-163).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

from rust_diskann_spark.params import SUPPORTED_METRICS


def _dot_expr(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x,
    )


def _norm_expr(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0).cast("double"),
            lambda acc, x: acc + x,
        )
    )


def distance_expr(metric: str, a: Column, b: Column) -> Column:
    """Column expression for ``metric`` between two array columns.

    Stays entirely JVM-side (no UDF): Catalyst codegens the fold, so exact
    kNN plans keep whole-stage codegen through the distance evaluation.
    """
    if metric == "l2":
        return F.sqrt(
            F.aggregate(
                F.zip_with(
                    a,
                    b,
                    lambda x, y: (x.cast("double") - y.cast("double"))
                    * (x.cast("double") - y.cast("double")),
                ),
                F.lit(0.0).cast("double"),
                lambda acc, x: acc + x,
            )
        )
    if metric == "cosine":
        # zero-norm guard: define sim(0, x) = 0 -> distance 1.0 (matches the
        # numpy twin; also keeps ANSI mode from raising DIVIDE_BY_ZERO)
        denom = _norm_expr(a) * _norm_expr(b)
        sim = F.when(denom > 0, _dot_expr(a, b) / denom).otherwise(F.lit(0.0))
        return F.lit(1.0) - sim
    if metric == "dot":
        return F.lit(1.0) - _dot_expr(a, b)
    if metric == "hamming":
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: F.bit_count(x.bitwiseXOR(y)).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).cast("double")
    raise ValueError(f"unsupported metric {metric!r}; expected one of {SUPPORTED_METRICS}")


def norm_expr(a: Column) -> Column:
    """Public alias of the L2-norm fold — lets operators hoist per-row
    norms into projected columns (see :func:`cosine_expr_with_norms`)."""
    return _norm_expr(a)


def cosine_expr_with_norms(
    a: Column, b: Column, a_norm: Column, b_norm: Column
) -> Column:
    """Cosine distance with pre-computed norms.

    ``distance_expr('cosine', ...)`` inlines both norm folds, so a kNN
    cross join evaluates them once per (query, corpus) PAIR — n*q norm
    folds instead of n+q. Hoisting the norms into projected columns on
    each side before the join leaves only the dot fold per pair (~3x on
    the measured sf0.1 cosine kNN). The arithmetic is the identical
    double-precision expression, so results (and the DuckDB oracle hash)
    are unchanged.
    """
    denom = a_norm * b_norm
    sim = F.when(denom > 0, _dot_expr(a, b) / denom).otherwise(F.lit(0.0))
    return F.lit(1.0) - sim


def l2_normalize_expr(a: Column) -> Column:
    """L2-normalize an array column (reference annhdf5.rs:204-213's
    ``do_l2_normalization``, which makes Dot equivalent to Cosine)."""
    norm = _norm_expr(a)
    return F.transform(a, lambda x: x.cast("double") / norm)


# ---------------------------------------------------------------------------
# numpy twins — batch kernels for the pandas-UDF path
# ---------------------------------------------------------------------------


def numpy_distance(metric: str, q: np.ndarray, m: np.ndarray) -> np.ndarray:
    """Distances from one query vector ``q`` (d,) to a matrix ``m`` (n, d).

    Returns float64 (n,). Must agree with :func:`distance_expr` to float
    tolerance — tests hash-match both against DuckDB.
    """
    q = np.asarray(q, dtype=np.float64)
    m = np.asarray(m, dtype=np.float64)
    if metric == "l2":
        diff = m - q
        return np.sqrt(np.einsum("ij,ij->i", diff, diff))
    if metric == "cosine":
        qn = np.linalg.norm(q)
        mn = np.linalg.norm(m, axis=1)
        denom = mn * qn
        with np.errstate(divide="ignore", invalid="ignore"):
            sim = np.where(denom > 0, (m @ q) / denom, 0.0)
        return 1.0 - sim
    if metric == "dot":
        return 1.0 - m @ q
    if metric == "hamming":
        qi = np.asarray(q, dtype=np.uint64)
        mi = np.asarray(m, dtype=np.uint64)
        x = np.bitwise_xor(mi, qi)
        return _popcount64(x).sum(axis=1).astype(np.float64)
    raise ValueError(f"unsupported metric {metric!r}; expected one of {SUPPORTED_METRICS}")


def numpy_distance_matrix(metric: str, m: np.ndarray, c: np.ndarray) -> np.ndarray:
    """All-pairs distances between rows of ``m`` (n, d) and ``c`` (k, d)
    -> float64 (n, k). Same semantics as :func:`numpy_distance`, batched
    (one BLAS matmul instead of n kernel calls)."""
    m = np.asarray(m, dtype=np.float64)
    c = np.asarray(c, dtype=np.float64)
    if metric == "l2":
        sq = (m * m).sum(axis=1)[:, None] - 2.0 * (m @ c.T) + (c * c).sum(axis=1)[None, :]
        return np.sqrt(np.maximum(sq, 0.0))
    if metric == "cosine":
        denom = np.linalg.norm(m, axis=1)[:, None] * np.linalg.norm(c, axis=1)[None, :]
        with np.errstate(divide="ignore", invalid="ignore"):
            sim = np.where(denom > 0, (m @ c.T) / denom, 0.0)
        return 1.0 - sim
    if metric == "dot":
        return 1.0 - m @ c.T
    raise ValueError(f"metric {metric!r} has no batch matrix kernel (l2/cosine/dot)")


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount (numpy<2 has no bit_count ufunc)."""
    v = x.view(np.uint8)
    lut = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)
    return lut[v].reshape(*x.shape, 8).sum(axis=-1).astype(np.int64)
