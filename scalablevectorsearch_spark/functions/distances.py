"""Distance kernels — the engine's scalar-function library.

Parity with the reference's distance functors (SURVEY.md §2.6):
 - ``l2``     squared Euclidean, minimized
               (/root/reference/include/svs/core/distance/euclidean.h:142)
 - ``ip``     inner product, maximized
               (/root/reference/include/svs/core/distance/inner_product.h:102)
 - ``cosine`` cosine similarity = ip / (|a|·|b|), maximized
               (/root/reference/include/svs/core/distance/cosine.h:102)

Two implementations with identical semantics:

1. ``distance_expr`` — pure Catalyst column expressions (``zip_with`` +
   ``aggregate`` sequential fold in float64). JVM-side, codegen'd, and
   bit-reproducible against a sequential SQL fold — used where exactness
   against the DuckDB oracle matters and inside declarative plans.

2. ``pairwise_distances`` — numpy float64 batch kernel (BLAS matmul), the
   Spark analog of the reference's AVX microkernels
   (euclidean.h:88-128 runtime SIMD dispatch). Used inside
   ``mapInPandas``/``applyInPandas`` hot paths. Accumulation order differs
   from a sequential fold by O(1e-13) relative error; consumers that feed
   the oracle gate round outputs to 4 decimals (see operators.flat).

Mixed-precision parity (euclidean.h:320-430): Spark vectors may be
ARRAY<FLOAT|DOUBLE|SHORT|TINYINT>; both paths cast elements to float64
on read, which is exact for all of those — one code path, like the
reference's mixed-type functor overloads.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

#: distance name -> maximize? (the reference's ``compare`` trait:
#: L2 minimizes, IP/cosine maximize — distance_core.h)
DISTANCES: dict[str, bool] = {"l2": False, "ip": True, "cosine": True}

#: runtime-registered custom kernels: name -> (Q, B) -> (|Q|, |B|) float64
_CUSTOM_KERNELS: dict[str, "callable"] = {}


def register_distance(name: str, kernel, maximize: bool = False) -> None:
    """Plug in a custom vectorized distance (the engine's §2.12
    extension surface — the Spark analog of the reference's compile-time
    distance concept, concepts/distance.h). ``kernel(Q, B)`` must return
    the (|Q|, |B|) float64 distance matrix; it runs inside the Arrow
    batch kernels of every index family (flat/ivf/vamana-rerank).
    Built-in names cannot be overridden."""
    if name in DISTANCES:
        raise ValueError(f"cannot override built-in distance {name!r}")
    DISTANCES[name] = maximize
    _CUSTOM_KERNELS[name] = kernel


def unregister_distance(name: str) -> None:
    _CUSTOM_KERNELS.pop(name, None)
    if name not in ("l2", "ip", "cosine"):
        DISTANCES.pop(name, None)


def resolve_kernel(distance: str):
    """Bind the distance kernel AT PLAN TIME (driver side) so custom
    registered kernels travel inside the serialized task closure —
    executor Python workers do not share the driver's registry."""
    if distance in _CUSTOM_KERNELS:
        k = _CUSTOM_KERNELS[distance]

        def custom(Q, B, q_fixed=None):
            return np.asarray(k(Q, B), dtype=np.float64)

        return custom
    if distance not in DISTANCES:
        raise ValueError(f"unknown distance {distance!r}; expected one of {sorted(DISTANCES)}")

    def builtin(Q, B, q_fixed=None, _d=distance):
        return pairwise_distances(Q, B, _d, q_fixed)

    return builtin


def is_similarity(distance: str) -> bool:
    """True if larger is better (sort descending)."""
    try:
        return DISTANCES[distance]
    except KeyError:
        raise ValueError(f"unknown distance {distance!r}; expected one of {sorted(DISTANCES)}")


def _d(col: Column) -> Column:
    return col.cast("double")


def _fold_sum(arr: Column) -> Column:
    # Sequential left-to-right fold => deterministic, matches a
    # list_reduce/list_sum sequential fold in the DuckDB oracle.
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)


def l2sq_expr(a: Column, b: Column) -> Column:
    """Squared Euclidean distance as a column expression (float64)."""
    return _fold_sum(F.zip_with(a, b, lambda x, y: (_d(x) - _d(y)) * (_d(x) - _d(y))))


def ip_expr(a: Column, b: Column) -> Column:
    """Inner product as a column expression (float64)."""
    return _fold_sum(F.zip_with(a, b, lambda x, y: _d(x) * _d(y)))


def norm_expr(a: Column) -> Column:
    """Euclidean norm (distance_core.h:46-66)."""
    return F.sqrt(_fold_sum(F.transform(a, lambda x: _d(x) * _d(x))))


def cosine_expr(a: Column, b: Column) -> Column:
    """Cosine similarity. The reference precomputes the query norm via
    ``fix_argument`` (cosine.h:102); Catalyst's common-subexpression
    handling plus the tiny per-row cost makes that unnecessary here."""
    return ip_expr(a, b) / (norm_expr(a) * norm_expr(b))


def distance_expr(a: Column, b: Column, distance: str = "l2") -> Column:
    """Distance metric as a pure Catalyst expression (JVM-side, codegen)."""
    if distance == "l2":
        return l2sq_expr(a, b)
    if distance == "ip":
        return ip_expr(a, b)
    if distance == "cosine":
        return cosine_expr(a, b)
    raise ValueError(f"unknown distance {distance!r}; expected one of {sorted(DISTANCES)}")


def fix_queries(Q: np.ndarray, distance: str = "l2") -> np.ndarray | None:
    """Precompute the per-query invariant the kernel would otherwise
    recompute per data tile — the reference's ``maybe_fix_argument``
    (concepts/distance.h; cosine.h:102 stores the query norm): squared
    norms for l2, norms for cosine, nothing for ip."""
    Q = np.asarray(Q, dtype=np.float64)
    if distance == "l2":
        return np.einsum("ij,ij->i", Q, Q)
    if distance == "cosine":
        return np.sqrt(np.einsum("ij,ij->i", Q, Q))
    return None


def pairwise_distances(
    Q: np.ndarray,
    B: np.ndarray,
    distance: str = "l2",
    q_fixed: np.ndarray | None = None,
) -> np.ndarray:
    """(Q x d) x (N x d) -> (Q x N) float64 distance matrix.

    The batch analog of the reference's ``search_patch`` cartesian
    microkernel (flat.h:421) — one BLAS matmul instead of a SIMD loop.
    ``q_fixed`` is the optional fix_queries() precompute (per-query
    norms), amortized across tiles like the reference's fix_argument.
    """
    Q = np.asarray(Q, dtype=np.float64)
    B = np.asarray(B, dtype=np.float64)
    if distance in _CUSTOM_KERNELS:
        return np.asarray(_CUSTOM_KERNELS[distance](Q, B), dtype=np.float64)
    ip = Q @ B.T
    if distance == "ip":
        return ip
    if distance == "l2":
        q2 = (q_fixed if q_fixed is not None else np.einsum("ij,ij->i", Q, Q))[:, None]
        b2 = np.einsum("ij,ij->i", B, B)[None, :]
        # clamp: cancellation can give -1e-14 for (near-)identical rows,
        # and -0.0 would round/hash differently from the oracle's 0.0
        return np.maximum(q2 + b2 - 2.0 * ip, 0.0)
    if distance == "cosine":
        qn = (q_fixed if q_fixed is not None else np.sqrt(np.einsum("ij,ij->i", Q, Q)))[:, None]
        bn = np.sqrt(np.einsum("ij,ij->i", B, B))[None, :]
        denom = qn * bn
        # zero-norm vectors: define similarity 0 (reference never divides
        # by zero because it rejects zero norms upstream)
        with np.errstate(divide="ignore", invalid="ignore"):
            out = np.where(denom > 0.0, ip / denom, 0.0)
        return out
    raise ValueError(f"unknown distance {distance!r}; expected one of {sorted(DISTANCES)}")
