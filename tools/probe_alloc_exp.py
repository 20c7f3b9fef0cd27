"""Probe-allocation experiment: on uniform data, does budget-fitted
epsilon probing allocate WORSE than fixed-m probing at equal mean
probes, and does clamping the per-query probe count fix it?

Measures COVERAGE (fraction of true top-k whose home shard is probed)
— the pure allocation quantity, independent of the per-shard search.

Pure numpy; no Spark. Usage: python tools/probe_alloc_exp.py [N].
"""
import sys

import numpy as np

N = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
D, NQ, K = 64, 500, 10
N_SHARDS = max(8, N // 8192)
BUDGET = max(4, N_SHARDS // 4)

rng = np.random.default_rng(7)
X = rng.random((N, D), dtype=np.float32)
Q = rng.random((NQ, D), dtype=np.float32)

# quick numpy Lloyd on a sample for centroids
samp = X[rng.choice(N, min(N, 100_000), replace=False)]
C = samp[rng.choice(len(samp), N_SHARDS, replace=False)].copy()
for _ in range(8):
    d2 = ((samp[:, None, :] - C[None, :, :]) ** 2).sum(-1) if N_SHARDS <= 64 else None
    if d2 is None:
        # chunked assign
        a = np.empty(len(samp), dtype=np.int64)
        for i in range(0, len(samp), 20_000):
            ch = samp[i : i + 20_000]
            dd = ((ch**2).sum(1)[:, None] - 2 * ch @ C.T + (C**2).sum(1)[None, :])
            a[i : i + 20_000] = dd.argmin(1)
    else:
        a = d2.argmin(1)
    for c in range(N_SHARDS):
        m = a == c
        if m.any():
            C[c] = samp[m].mean(0)

# assign all points, chunked
assign = np.empty(N, dtype=np.int64)
cn = (C**2).sum(1)[None, :]
for i in range(0, N, 50_000):
    ch = X[i : i + 50_000]
    dd = (ch**2).sum(1)[:, None] - 2 * ch @ C.T + cn
    assign[i : i + 50_000] = dd.argmin(1)

# true top-k, chunked brute force
qn = (Q**2).sum(1)[:, None]
best_d = np.full((NQ, K), np.inf)
best_i = np.full((NQ, K), -1, dtype=np.int64)
for i in range(0, N, 100_000):
    ch = X[i : i + 100_000]
    dd = qn - 2 * Q @ ch.T + (ch**2).sum(1)[None, :]
    ids = np.argpartition(dd, K, axis=1)[:, :K]
    dv = np.take_along_axis(dd, ids, 1)
    allv = np.concatenate([best_d, dv], 1)
    alli = np.concatenate([best_i, ids + i], 1)
    sel = np.argpartition(allv, K, axis=1)[:, :K]
    best_d = np.take_along_axis(allv, sel, 1)
    best_i = np.take_along_axis(alli, sel, 1)
gt_shard = assign[best_i]  # (NQ, K) home shard of each true neighbor

# centroid keys per query (same e4 integer contract as the library)
Dq = qn - 2 * Q @ C.T + cn
key = np.floor(np.sqrt(np.maximum(Dq, 0)) * 1e4 + 0.5).astype(np.int64)


def coverage(probes_per_q):
    hits = 0
    for qi in range(NQ):
        hits += np.isin(gt_shard[qi], probes_per_q[qi]).sum()
    return hits / (NQ * K)


def eps_sel(bp, lo_clamp=None, hi_clamp=None):
    out = []
    order = np.argsort(key, axis=1, kind="stable")
    skey = np.take_along_axis(key, order, 1)
    for qi in range(NQ):
        kb = int(skey[qi, 0])
        cut = kb * 10000 + abs(kb) * bp
        m = int((skey[qi] * 10000 <= cut).sum())
        if lo_clamp is not None:
            m = max(m, lo_clamp)
        if hi_clamp is not None:
            m = min(m, hi_clamp)
        out.append(order[qi, :m])
    return out


def fit_bp(target, lo_clamp=None, hi_clamp=None):
    lo, hi = 0, 10_000_000
    while lo < hi:
        mid = (lo + hi) // 2
        mean = np.mean([len(s) for s in eps_sel(mid, lo_clamp, hi_clamp)])
        if mean < target:
            lo = mid + 1
        else:
            hi = mid
    return lo


order = np.argsort(key, axis=1, kind="stable")
fixed = [order[qi, :BUDGET] for qi in range(NQ)]
print(f"N={N} shards={N_SHARDS} budget={BUDGET}")
print(f"fixed-{BUDGET}: cov={coverage(fixed):.4f} mean={BUDGET}")

for name, lo_c, hi_c in [
    ("eps-nolamp", None, None),
    ("eps-floor-half", BUDGET // 2, None),
    ("eps-clamp-half-2x", BUDGET // 2, 2 * BUDGET),
    ("eps-clamp-3q-2x", (3 * BUDGET) // 4, 2 * BUDGET),
]:
    bp = fit_bp(BUDGET, lo_c, hi_c)
    sel = eps_sel(bp, lo_c, hi_c)
    mean = np.mean([len(s) for s in sel])
    p10, p90 = np.percentile([len(s) for s in sel], [10, 90])
    print(
        f"{name}: bp={bp} cov={coverage(sel):.4f} mean={mean:.1f} "
        f"p10={p10:.0f} p90={p90:.0f}"
    )
