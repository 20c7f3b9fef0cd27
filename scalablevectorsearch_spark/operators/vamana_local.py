"""Vamana graph construction + greedy search — the per-shard local
kernel (pure numpy, no Spark imports; runs inside applyInPandas).

Parity (semantics only — the implementation is numpy, not a translation):
 - greedy best-first search with a bounded search window:
   /root/reference/include/svs/index/vamana/greedy_search.h:124-203
 - batch-synchronous construction (search -> prune -> apply updates ->
   reverse edges -> re-prune overfull):
   /root/reference/include/svs/index/vamana/vamana_build.h:233-312
   (:328 generate_neighbors, :483 add_reverse_edges)
 - alpha-prune (MRNG rule, iterative alpha relaxation, Added-state kept
   across rounds): /root/reference/include/svs/index/vamana/prune.h:92-172
 - build parameters: include/svs/index/vamana/build_params.h:29-68

The distributed engine shards the base table and builds one independent
graph per shard (operators/vamana.py) — each shard's kernel is this
module. Distances here are float64; ordering ties break by ascending id
(neighbor.h id-ordered comparators).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass
class VamanaParams:
    """build_params.h:29-68 (+ test-scale defaults from
    data/test_dataset/reference/vamana_reference.toml: degree=32,
    alpha=1.2, window=100)."""

    alpha: float = 1.2
    graph_max_degree: int = 32
    window_size: int = 100
    max_candidate_pool_size: int = 750
    prune_to: int | None = None  # None -> graph_max_degree

    @property
    def prune_target(self) -> int:
        return self.prune_to if self.prune_to is not None else self.graph_max_degree


def _dists(X: np.ndarray, q: np.ndarray, idx: np.ndarray, distance: str) -> np.ndarray:
    V = X[idx]
    if distance == "l2":
        diff = V - q
        return np.einsum("ij,ij->i", diff, diff)
    if distance == "ip":
        return -(V @ q)  # negate: smaller = better, uniform minimize convention
    if distance == "cosine":
        qn = np.sqrt(q @ q)
        vn = np.sqrt(np.einsum("ij,ij->i", V, V))
        denom = qn * vn
        with np.errstate(divide="ignore", invalid="ignore"):
            sim = np.where(denom > 0, (V @ q) / denom, 0.0)
        return -sim
    raise ValueError(f"unknown distance {distance!r}")


def medioid(X: np.ndarray) -> int:
    """core/medioid.h:275-292 — argmin L2 to the component-wise mean."""
    m = X.mean(axis=0)
    d = np.einsum("ij,ij->i", X - m, X - m)
    return int(np.argmin(d))  # first minimum = smallest id among ties


def batch_distances(
    X: np.ndarray,
    Q: np.ndarray,
    distance: str,
    x_sq: np.ndarray | None = None,
) -> np.ndarray:
    """(nq, n) distance matrix in one GEMM — the batch analog of the
    reference keeping the fixed query in registers across a traversal,
    amortized across the whole query block. Row ``j`` is ``all_d`` for
    query ``Q[j]`` with the same IEEE op order as the per-query path
    ((x_sq + q_sq) - 2*qd, clamped at 0)."""
    QD = Q @ X.T
    if distance == "l2":
        if x_sq is None:
            x_sq = np.einsum("ij,ij->i", X, X)
        q_sq = np.einsum("ij,ij->i", Q, Q)
        return np.maximum(x_sq[None, :] + q_sq[:, None] - 2.0 * QD, 0.0)
    if distance == "ip":
        return -QD
    if distance == "cosine":
        if x_sq is None:
            x_sq = np.einsum("ij,ij->i", X, X)
        qn = np.sqrt(np.einsum("ij,ij->i", Q, Q))
        denom = qn[:, None] * np.sqrt(x_sq)[None, :]
        with np.errstate(divide="ignore", invalid="ignore"):
            return -np.where(denom > 0, QD / denom, 0.0)
    raise ValueError(f"unknown distance {distance!r}")


def greedy_search(
    X: np.ndarray,
    graph: list[np.ndarray],
    entry_points: list[int],
    q: np.ndarray,
    window_size: int,
    distance: str = "l2",
    capacity: int | None = None,
    x_sq: np.ndarray | None = None,
    all_d: np.ndarray | None = None,
    lazy: bool = False,
) -> tuple[np.ndarray, np.ndarray]:
    """Best-first traversal (greedy_search.h:124-203). Returns the final
    search-buffer contents (ids, dists) sorted best-first. ``x_sq``:
    optional precomputed per-row squared norms, amortized across queries
    by batch callers. ``all_d``: optional precomputed (n,) distances of
    every base row to ``q`` (one row of :func:`batch_distances`) —
    batch callers amortize the matmul across queries; per-expansion
    distances are pure index lookups either way.

    ``lazy=True`` skips the upfront dense distance vector and evaluates
    distances only for VISITED nodes (each node enters the buffer at
    most once, so nothing is recomputed) — O(window · degree · d) per
    query instead of O(n · d); the sublinear mode the centroid router
    depends on. Ignored when ``all_d`` is supplied.

    Split buffer (search_buffer.h:39-60): ``capacity`` >= window_size
    keeps extra sorted candidates beyond the exploration window —
    termination only consults the first window_size entries, but up to
    ``capacity`` results are returned (the SearchBufferConfig
    invariant). Default: capacity == window_size."""
    cap = max(capacity or window_size, window_size)
    n = X.shape[0]
    if all_d is None and not lazy:
        all_d = batch_distances(X, q[None, :], distance, x_sq=x_sq)[0]

    def _d_of(ids: np.ndarray) -> np.ndarray:
        if all_d is not None:
            return all_d[ids]
        return _dists(X, q, ids, distance)

    seen = np.zeros(n, dtype=bool)  # VisitedFilter analog (filter.h:31-49)
    expanded = np.zeros(n, dtype=bool)
    eps = np.unique(np.asarray(list(entry_points), dtype=np.int64))
    seen[eps] = True
    d0 = _d_of(eps)
    order = np.lexsort((eps, d0))
    buf_ids = eps[order]
    buf_d = d0[order]

    while True:
        # next(): nearest unexpanded inside the window
        w = min(len(buf_ids), window_size)
        cand = np.nonzero(~expanded[buf_ids[:w]])[0]
        if len(cand) == 0:
            break
        node = int(buf_ids[cand[0]])
        expanded[node] = True
        nb = graph[node]
        if len(nb):
            nb = nb[~seen[nb]]
        if len(nb) == 0:
            continue
        seen[nb] = True
        nd = _d_of(nb)
        # merge into buffer, keep best ``cap`` by (dist, id)
        ids = np.concatenate([buf_ids, nb])
        ds = np.concatenate([buf_d, nd])
        order = np.lexsort((ids, ds))[:cap]
        buf_ids, buf_d = ids[order], ds[order]
    return buf_ids, buf_d


def alpha_prune(
    X: np.ndarray,
    node: int,
    pool_ids: np.ndarray,
    pool_d: np.ndarray,
    alpha: float,
    max_result: int,
    distance: str = "l2",
) -> np.ndarray:
    """MRNG/alpha prune (prune.h:92-172): keep candidate c only while no
    kept neighbor r has current_alpha * d(r, c) < d(node, c); relax
    current_alpha geometrically up to alpha; Added state persists across
    rounds, Pruned state resets."""
    n = len(pool_ids)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    # one BLAS batch for all candidate-pair distances (the reference
    # computes them lazily per kept neighbor; the pool is <= the
    # candidate cap, so the dense matrix is small and far faster than
    # per-pair kernel calls)
    P = X[pool_ids]
    if distance == "l2":
        ip = P @ P.T
        sq = np.einsum("ij,ij->i", P, P)
        D = np.maximum(sq[:, None] + sq[None, :] - 2.0 * ip, 0.0)
    elif distance == "ip":
        D = -(P @ P.T)
    else:  # cosine
        nrm = np.sqrt(np.einsum("ij,ij->i", P, P))
        denom = nrm[:, None] * nrm[None, :]
        with np.errstate(divide="ignore", invalid="ignore"):
            D = -np.where(denom > 0, (P @ P.T) / denom, 0.0)
    AVAILABLE, ADDED, PRUNED = 0, 1, 2
    state = np.full(n, AVAILABLE, dtype=np.int8)
    is_self = pool_ids == node
    result: list[int] = []
    current_alpha = 1.0
    while len(result) < max_result and current_alpha <= alpha + 1e-12:
        for start in range(n):
            if len(result) >= max_result:
                break
            if state[start] != AVAILABLE or is_self[start]:
                continue
            state[start] = ADDED
            result.append(int(pool_ids[start]))
            # vectorized MRNG kill over still-available later candidates
            # (boolean masks only — no index materialization)
            kill = current_alpha * D[start] < pool_d
            kill &= state == AVAILABLE
            kill[: start + 1] = False
            state[kill] = PRUNED
        if alpha == 1.0:
            break
        state[state == PRUNED] = AVAILABLE
        current_alpha *= alpha
    return np.asarray(result, dtype=np.int64)


def build_graph(
    X: np.ndarray,
    params: VamanaParams,
    distance: str = "l2",
) -> tuple[list[np.ndarray], int]:
    """Batch-synchronous construct (vamana_build.h:233-312). Returns
    (adjacency lists indexed by local id, entry_point local id)."""
    n = X.shape[0]
    entry = medioid(X)
    graph: list[np.ndarray] = [np.empty(0, dtype=np.int64) for _ in range(n)]
    num_batches = min(n, max(40, -(-n // (64 * 64))))
    batchsize = -(-n // num_batches)
    deg = params.graph_max_degree
    x_sq = np.einsum("ij,ij->i", X, X)  # shared across every node's search

    for b in range(num_batches):
        start, stop = b * batchsize, min(n, (b + 1) * batchsize)
        if start >= stop:
            break
        # generate_neighbors: search + prune, updates applied after the
        # whole batch (batch-synchronous, vamana_build.h:469-476);
        # distances for the batch's searches come from chunked GEMMs
        # (chunk bounds the (chunk, n) f64 block at ~64 MB)
        cs = max(1, 8_000_000 // max(n, 1))
        D_cache: dict[int, np.ndarray] = {}

        def _row(node: int) -> np.ndarray:
            c0 = start + ((node - start) // cs) * cs
            blk = D_cache.get(c0)
            if blk is None:
                D_cache.clear()
                blk = batch_distances(
                    X, X[c0 : min(stop, c0 + cs)], distance, x_sq=x_sq
                )
                D_cache[c0] = blk
            return blk[node - c0]

        updates: list[tuple[int, np.ndarray]] = []
        for node in range(start, stop):
            ids, ds = greedy_search(
                X, graph, [entry], X[node], params.window_size, distance,
                all_d=_row(node),
            )
            pool_ids, pool_d = ids, ds
            # add current neighbors not already in the pool (build.h:424-441)
            extra = [int(v) for v in graph[node] if int(v) not in set(int(i) for i in ids)]
            if extra:
                ea = np.asarray(extra, dtype=np.int64)
                ed = _dists(X, X[node], ea, distance)
                pool_ids = np.concatenate([pool_ids, ea])
                pool_d = np.concatenate([pool_d, ed])
            order = np.lexsort((pool_ids, pool_d))[: params.max_candidate_pool_size]
            pool_ids, pool_d = pool_ids[order], pool_d[order]
            new_adj = alpha_prune(X, node, pool_ids, pool_d, params.alpha, deg, distance)
            updates.append((node, new_adj))
        for node, adj in updates:
            graph[node] = adj

        # add_reverse_edges (vamana_build.h:483-560)
        overfull: dict[int, list[int]] = {}
        for node in range(start, stop):
            for other in graph[node]:
                other = int(other)
                if len(graph[other]) < deg and node not in graph[other]:
                    graph[other] = np.append(graph[other], np.int64(node))
                else:
                    overfull.setdefault(other, []).append(node)
        for other, extras in overfull.items():
            cand = np.unique(np.concatenate([graph[other], np.asarray(extras, dtype=np.int64)]))
            cand = cand[cand != other]
            cd = _dists(X, X[other], cand, distance)
            order = np.lexsort((cand, cd))
            pruned = alpha_prune(
                X, other, cand[order], cd[order], params.alpha, params.prune_target, distance
            )
            graph[other] = pruned
    return graph, entry


def search_graph(
    X: np.ndarray,
    graph: list[np.ndarray],
    entry: int,
    Q: np.ndarray,
    k: int,
    window_size: int,
    distance: str = "l2",
    valid: np.ndarray | None = None,
    capacity: int | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Batch search (index.h:557-600): per query greedy_search; the
    buffer CAPACITY is raised to >= k while the exploration window stays
    window_size (index.h:583-585 split-buffer behavior), then the best k
    are sliced. Returns (ids, dists) each (nq, <=k); short rows padded
    with id -1.

    ``valid``: optional (n,) bool — tombstoned nodes (False) are
    traversed but excluded from results, matching the dynamic index's
    skip-deleted buffer (dynamic_search_buffer.h). The capacity is
    widened so deleted entries don't crowd out k live results."""
    nq = Q.shape[0]
    cap = max(capacity or window_size, window_size, k)
    if valid is not None:
        # worst case the top of the buffer is all deleted; widen by the
        # smaller of (#deleted, k) like the capacity-extended buffer
        cap = cap + int(min((~valid).sum(), k))
    out_ids = np.full((nq, k), -1, dtype=np.int64)
    out_d = np.full((nq, k), np.inf, dtype=np.float64)
    x_sq = np.einsum("ij,ij->i", X, X) if distance in ("l2", "cosine") else None
    n = X.shape[0]
    # one GEMM per query chunk (chunked to bound the (chunk, n) f64
    # distance block at ~64 MB); traversals then do index lookups only
    chunk = max(1, min(nq, 8_000_000 // max(n, 1)))
    for c0 in range(0, nq, chunk):
        c1 = min(nq, c0 + chunk)
        D = batch_distances(X, Q[c0:c1], distance, x_sq=x_sq)
        for qi in range(c0, c1):
            ids, ds = greedy_search(
                X, graph, [entry], Q[qi], window_size, distance,
                capacity=cap, all_d=D[qi - c0],
            )
            if valid is not None and len(ids):
                keep = valid[ids]
                ids, ds = ids[keep], ds[keep]
            m = min(k, len(ids))
            out_ids[qi, :m] = ids[:m]
            out_d[qi, :m] = ds[:m]
    return out_ids, out_d
