"""A/B harness for alpha_prune_batch variants (r7 task: 10M vamana
build-time cut). Runs a full single-shard build_graph with the current
kernel and with a candidate variant, asserting BIT-IDENTICAL graphs
(the gate/test contract) and reporting wall times.

Usage: python tools/profile_prune.py [n_rows] [reps]
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from scalablevectorsearch_spark.operators import vamana_local as vl  # noqa: E402


def dense_pairwise_prune(X, nodes, pools, pool_d, alpha, max_result, distance="l2"):
    """Variant B: precompute the per-row dense (P, P) candidate-pair
    distance matrix in one batched einsum, removing the per-iteration
    gemv from the kill step. Same state machine otherwise."""
    m, P = pools.shape
    if m == 0 or P == 0 or not (1.0 <= alpha + 1e-12):
        return [np.empty(0, dtype=np.int64) for _ in range(m)]
    d = X.shape[1]
    # bound the (m, P, P) f64 pairwise tensor
    cells = 8_000_000
    chunk = max(1, cells // max(P * P, 1))
    if m > chunk:
        out = []
        for c0 in range(0, m, chunk):
            out.extend(
                dense_pairwise_prune(
                    X, nodes[c0:c0 + chunk], pools[c0:c0 + chunk],
                    pool_d[c0:c0 + chunk], alpha, max_result, distance,
                )
            )
        return out
    valid = pools >= 0
    V = X[np.maximum(pools, 0)]  # (m, P, d)
    ip = np.matmul(V, V.transpose(0, 2, 1))  # batched GEMM, BLAS-backed
    if distance == "l2":
        sqP = np.einsum("mpd,mpd->mp", V, V)
        Dpair = np.maximum(sqP[:, :, None] + sqP[:, None, :] - 2.0 * ip, 0.0)
    elif distance == "ip":
        Dpair = -ip
    else:
        nrmP = np.sqrt(np.einsum("mpd,mpd->mp", V, V))
        denom = nrmP[:, :, None] * nrmP[:, None, :]
        with np.errstate(divide="ignore", invalid="ignore"):
            Dpair = -np.where(denom > 0, ip / denom, 0.0)
    AVAILABLE, ADDED, PRUNED = 0, 1, 2
    state = np.zeros((m, P), dtype=np.int8)
    addable = valid & (pools != nodes[:, None])
    counts = np.zeros(m, dtype=np.int64)
    res = np.full((m, max_result), -1, dtype=np.int64)
    alpha_row = np.ones(m, dtype=np.float64)
    active = np.ones(m, dtype=bool)
    pos_idx = np.arange(P)
    rows_all = np.arange(m)
    while active.any():
        avail = (
            (state == AVAILABLE)
            & addable
            & active[:, None]
            & (counts < max_result)[:, None]
        )
        has = avail.any(axis=1)
        done_rows = np.nonzero(active & ~has)[0]
        if len(done_rows):
            if alpha == 1.0:
                active[done_rows] = False
            else:
                na = alpha_row[done_rows] * alpha
                cont = (counts[done_rows] < max_result) & (na <= alpha + 1e-12)
                active[done_rows[~cont]] = False
                go = done_rows[cont]
                if len(go):
                    alpha_row[go] = na[cont]
                    st = state[go]
                    st[st == PRUNED] = AVAILABLE
                    state[go] = st
        if not has.any():
            continue
        rows = np.nonzero(has)[0]
        p_full = np.where(has, avail.argmax(axis=1), P)
        p = p_full[rows]
        cand = pools[rows, p]
        res[rows, counts[rows]] = cand
        counts[rows] += 1
        state[rows, p] = ADDED
        Drow = Dpair[rows_all, np.minimum(p_full, P - 1), :]
        kill = (alpha_row[:, None] * Drow < pool_d) & (state == AVAILABLE)
        kill &= pos_idx[None, :] > p_full[:, None]
        state[kill] = PRUNED
    return [res[i, : counts[i]] for i in range(m)]


def compacting_prune(X, nodes, pools, pool_d, alpha, max_result, distance="l2"):
    """Variant C: the current lazy-gemv kernel plus ROW COMPACTION —
    when fewer than half the rows are still active, shrink every
    per-row array to the active set, so late straggler iterations stop
    paying O(m_original · P) mask work and gemv flops."""
    m, P = pools.shape
    if m == 0 or P == 0 or not (1.0 <= alpha + 1e-12):
        return [np.empty(0, dtype=np.int64) for _ in range(m)]
    d = X.shape[1]
    chunk = max(1, 12_000_000 // max(P * d, 1))
    if m > chunk:
        out = []
        for c0 in range(0, m, chunk):
            out.extend(
                compacting_prune(
                    X, nodes[c0:c0 + chunk], pools[c0:c0 + chunk],
                    pool_d[c0:c0 + chunk], alpha, max_result, distance,
                )
            )
        return out
    valid = pools >= 0
    V = X[np.maximum(pools, 0)]
    if distance == "l2":
        sqP = np.einsum("mpd,mpd->mp", V, V)
    elif distance == "cosine":
        nrmP = np.sqrt(np.einsum("mpd,mpd->mp", V, V))
    AVAILABLE, ADDED, PRUNED = 0, 1, 2
    state = np.zeros((m, P), dtype=np.int8)
    addable = valid & (pools != nodes[:, None])
    counts = np.zeros(m, dtype=np.int64)
    res_g = np.full((m, max_result), -1, dtype=np.int64)
    counts_g = np.zeros(m, dtype=np.int64)
    alpha_row = np.ones(m, dtype=np.float64)
    active = np.ones(m, dtype=bool)
    idx_g = np.arange(m)  # live-row -> original-row map
    pos_idx = np.arange(P)
    while active.any():
        if active.sum() * 2 < len(active):
            keep = np.nonzero(active)[0]
            idx_g = idx_g[keep]
            pools, pool_d = pools[keep], pool_d[keep]
            addable, state = addable[keep], state[keep]
            counts, alpha_row = counts[keep], alpha_row[keep]
            V = V[keep]
            if distance == "l2":
                sqP = sqP[keep]
            elif distance == "cosine":
                nrmP = nrmP[keep]
            active = np.ones(len(keep), dtype=bool)
        mm = len(idx_g)
        avail = (
            (state == AVAILABLE)
            & addable
            & active[:, None]
            & (counts < max_result)[:, None]
        )
        has = avail.any(axis=1)
        done_rows = np.nonzero(active & ~has)[0]
        if len(done_rows):
            if alpha == 1.0:
                active[done_rows] = False
            else:
                na = alpha_row[done_rows] * alpha
                cont = (counts[done_rows] < max_result) & (na <= alpha + 1e-12)
                active[done_rows[~cont]] = False
                go = done_rows[cont]
                if len(go):
                    alpha_row[go] = na[cont]
                    st = state[go]
                    st[st == PRUNED] = AVAILABLE
                    state[go] = st
        if not has.any():
            continue
        rows = np.nonzero(has)[0]
        p_full = np.where(has, avail.argmax(axis=1), P)
        p = p_full[rows]
        cand = pools[rows, p]
        res_g[idx_g[rows], counts[rows]] = cand
        counts_g[idx_g[rows]] = counts[rows] + 1
        counts[rows] += 1
        state[rows, p] = ADDED
        cand_full = np.zeros(mm, dtype=np.int64)
        cand_full[rows] = cand
        Vr = X[cand_full]
        ip = np.matmul(V, Vr[:, :, None])[:, :, 0]
        if distance == "l2":
            sq_r = np.einsum("md,md->m", Vr, Vr)
            Drow = np.maximum(sqP + sq_r[:, None] - 2.0 * ip, 0.0)
        elif distance == "ip":
            Drow = -ip
        else:
            nr = np.sqrt(np.einsum("md,md->m", Vr, Vr))
            denom = nr[:, None] * nrmP
            with np.errstate(divide="ignore", invalid="ignore"):
                Drow = -np.where(denom > 0, ip / denom, 0.0)
        kill = (alpha_row[:, None] * Drow < pool_d) & (state == AVAILABLE)
        kill &= pos_idx[None, :] > p_full[:, None]
        state[kill] = PRUNED
    return [res_g[i, : counts_g[i]] for i in range(m)]


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    rng = np.random.default_rng(7)
    X = rng.random((n, 64)).astype(np.float64)
    P = vl.VamanaParams(alpha=1.2, graph_max_degree=32, window_size=100)

    orig = vl.alpha_prune_batch
    t_a = []
    for _ in range(reps):
        t0 = time.perf_counter()
        g_a, e_a = vl.build_graph(X, P)
        t_a.append(time.perf_counter() - t0)
    for label, variant in (("dense", dense_pairwise_prune),
                           ("compact", compacting_prune)):
        vl.alpha_prune_batch = variant
        try:
            t_b = []
            for _ in range(reps):
                t0 = time.perf_counter()
                g_b, e_b = vl.build_graph(X, P)
                t_b.append(time.perf_counter() - t0)
        finally:
            vl.alpha_prune_batch = orig
        assert e_a == e_b
        same = all(np.array_equal(a, b) for a, b in zip(g_a, g_b))
        print(f"n={n} current={min(t_a):.2f}s {label}={min(t_b):.2f}s "
              f"speedup={min(t_a)/min(t_b):.2f}x bit_identical={same}")
        if not same:
            diff = sum(1 for a, b in zip(g_a, g_b) if not np.array_equal(a, b))
            print(f"  {diff}/{n} adjacencies differ")


if __name__ == "__main__":
    main()
