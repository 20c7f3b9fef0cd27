"""A/B the construction's semantic-batch schedule on the example_vamana
golden fixture (r12 optimization round).

The batch-synchronous build (vamana_local.build_graph) splits each pass
into frozen-graph rounds. The pre-r12 schedule was a FIXED 40 rounds
(ceil(n/4096) above 164k rows): at bench/cell sizes (250-500 rows per
shard) that means 7-13-node rounds whose lockstep kernels are pure
numpy-dispatch overhead — measured 2x the build wall vs a geometric
ramp at n<=500 — while at n>=8k both schedules land on ~200-250-node
steady rounds and are within noise of each other.

Candidate: geometric ramp — rounds double from BUILD_BATCH_MIN until
BUILD_BATCH_CAP (the cache-friendly lockstep size; the INSERT_BATCH
superlinearity measurement showed 4096-node rounds cost 2.1x 205-node
rounds at 16k). Early rounds stay small (closer to the reference's
sequential insert than fixed-40 was), steady-state matches fixed-40's
250-node rounds.

Gate: the published example_vamana curve (10k x 128d, degree 64,
window 128, full history) must stay inside the example's own +-0.05 at
every sws — the same gate the r11 two-pass and r12 fractional re-link
work held themselves to.

Usage: python tools/batch_schedule_ab.py [--quick]
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import scalablevectorsearch_spark.operators.vamana_local as vl
from scalablevectorsearch_spark.operators.vamana_local import (
    VamanaParams,
    batch_greedy_search,
)

EXPECTED = {10: 0.5664, 20: 0.7397, 30: 0.8288, 40: 0.8837}
EPSILON = 0.05


def build_with_bounds(X, params, bounds_fn, distance="l2"):
    n = X.shape[0]
    entry = vl.medioid(X)
    graph = [np.empty(0, dtype=np.int64) for _ in range(n)]
    x_sq = np.einsum("ij,ij->i", X, X)
    passes = max(1, int(getattr(params, "build_passes", 2)))
    pass_alphas = [1.0] * (passes - 1) + [params.alpha]
    frac = float(getattr(params, "build_pass2_fraction", 1.0))
    if frac < 1.0:
        pass_alphas = [params.alpha] * passes
    for pass_no, pass_alpha in enumerate(pass_alphas):
        limit = n
        if pass_no > 0 and frac < 1.0:
            limit = min(n, max(1, int(np.ceil(n * frac))))
        for i, start in enumerate(bounds := bounds_fn(n)):
            stop = min(limit, bounds[i + 1] if i + 1 < len(bounds) else n)
            if start >= stop:
                break
            vl._link_nodes(
                X, graph, [entry], np.arange(start, stop, dtype=np.int64),
                params, distance, x_sq, reverse_alpha=pass_alpha,
            )
    return graph, entry


def fixed40(n):
    num_batches = min(n, max(40, -(-n // 4096)))
    bs = -(-n // num_batches)
    return list(range(0, n, bs))


def geom(n):
    # the adopted schedule (vamana_local._build_batch_bounds)
    return vl._build_batch_bounds(n)


def curve(X, Q, gt, graph, entry, k=10):
    out = {}
    for sws in EXPECTED:
        ids, _ = batch_greedy_search(X, graph, [entry], Q, sws)
        hit = sum(
            len(set(ids[q][:k].tolist()) & set(gt[q].tolist()))
            for q in range(len(Q))
        )
        out[sws] = round(hit / (len(Q) * k), 4)
    return out


def main():
    quick = "--quick" in sys.argv
    N, NQ, D, K = (2000, 300, 64, 10) if quick else (10000, 1000, 128, 10)
    X = np.random.RandomState(1234).normal(size=(N, D)).astype(np.float32).astype(np.float64)
    Q = np.random.RandomState(5678).normal(size=(NQ, D)).astype(np.float32).astype(np.float64)
    d2 = (
        np.einsum("ij,ij->i", Q, Q)[:, None]
        + np.einsum("ij,ij->i", X, X)[None, :]
        - 2.0 * (Q @ X.T)
    )
    gt = np.argsort(d2, axis=1, kind="stable")[:, :K]
    params = VamanaParams(
        graph_max_degree=64, alpha=1.2, window_size=128,
        max_candidate_pool_size=384, prune_to=60,
        use_full_search_history=True,
    )
    results = {}
    for name, fn in (("fixed40", fixed40), ("geom32_256", geom)):
        t0 = time.perf_counter()
        graph, entry = build_with_bounds(X, params, fn)
        bt = round(time.perf_counter() - t0, 1)
        c = curve(X, Q, gt, graph, entry, K)
        ok = all(abs(c[s] - EXPECTED[s]) <= EPSILON for s in EXPECTED) or quick
        results[name] = {"build_sec": bt, "curve": c, "in_epsilon": ok}
        print(json.dumps({name: results[name]}), flush=True)
    print(json.dumps(results))
    return 0 if all(r["in_epsilon"] for r in results.values()) else 1


if __name__ == "__main__":
    raise SystemExit(main())
