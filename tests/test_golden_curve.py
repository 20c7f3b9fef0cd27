"""Golden recall-curve parity with the reference's published example
numbers (VERDICT r10 task 3) — the one in-tree real ground truth the
reference ships.

Fixture: examples/python/example_vamana.py generates its dataset with
numpy.random.RandomState(1234/5678).normal (bindings/python/src/svs/
common.py:203-212 — RandomState picked there for its backward-compat
bit-reproducibility), builds with VamanaBuildParameters(
graph_max_degree=64, window_size=128) → library defaults alpha=1.2,
max_candidate_pool_size=3*window=384, prune_to=degree-4=60,
use_full_search_history=true (lib/preprocessor.h:179-183,
index.h:1060-1072), and asserts recall@10 at sws 10/20/30/40 equals
{0.5664, 0.7397, 0.8288, 0.8837} within +-0.05
(example_vamana.py:33-45 assert_equal epsilon).

The full-size (10000x128, 1000 queries) reproduction runs driver-side
through the same vamana_local kernels the distributed build executes
per shard (slow-marked; the gate-shaped evidence row lives in
BENCH_HISTORY via tools/golden_curve.py — measured r11:
{10: 0.5355, 20: 0.7129, 30: 0.8068, 40: 0.8652}, every point inside
the reference's own epsilon)."""

import numpy as np
import pytest

from scalablevectorsearch_spark.operators.vamana_local import (
    VamanaParams,
    batch_greedy_search,
    build_graph,
)

EXPECTED = {10: 0.5664, 20: 0.7397, 30: 0.8288, 40: 0.8837}
EPSILON = 0.05


@pytest.mark.slow
def test_example_vamana_golden_curve():
    N, NQ, D, K = 10000, 1000, 128, 10
    X = np.random.RandomState(1234).normal(size=(N, D)).astype(np.float32)
    Q = np.random.RandomState(5678).normal(size=(NQ, D)).astype(np.float32)
    X = X.astype(np.float64)
    Q = Q.astype(np.float64)
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
    graph, entry = build_graph(X, params)
    for sws, expected in EXPECTED.items():
        ids, _ = batch_greedy_search(X, graph, [entry], Q, sws)
        hit = sum(
            len(set(ids[q][:K].tolist()) & set(gt[q].tolist())) for q in range(NQ)
        )
        recall = hit / (NQ * K)
        assert abs(recall - expected) < EPSILON, (
            f"sws={sws}: recall {recall:.4f} outside the reference's "
            f"epsilon of {expected}"
        )


def test_two_pass_build_improves_small_window_recall():
    """The two-pass construct (index.h:428-429) must beat a single pass
    at small windows on the same data — the property that closes the
    golden-curve gap. Small fixture so the fast suite covers the pass
    schedule itself."""
    N, NQ, D, K = 2000, 200, 32, 10
    X = np.random.RandomState(11).normal(size=(N, D))
    Q = np.random.RandomState(12).normal(size=(NQ, D))
    d2 = (
        np.einsum("ij,ij->i", Q, Q)[:, None]
        + np.einsum("ij,ij->i", X, X)[None, :]
        - 2.0 * (Q @ X.T)
    )
    gt = np.argsort(d2, axis=1, kind="stable")[:, :K]

    def curve(passes, frac=None):
        kw = dict(
            graph_max_degree=24, window_size=60, use_full_search_history=True,
            build_passes=passes,
        )
        if frac is not None:
            kw["build_pass2_fraction"] = frac
        params = VamanaParams(**kw)
        graph, entry = build_graph(X, params)
        ids, _ = batch_greedy_search(X, graph, [entry], Q, 10)
        return sum(
            len(set(ids[q][:K].tolist()) & set(gt[q].tolist())) for q in range(NQ)
        ) / (NQ * K)

    # the reference property (index.h:428-429) is about the FULL
    # re-link schedule: construct(1.0); construct(alpha) can only buy
    # quality. The fractional default (build_pass2_fraction=0.3)
    # guarantees golden-curve epsilon, not strict dominance — at this
    # small fixture it sits within ±0.01 of single-pass either side
    # depending on the batch schedule, so the strict assert pins the
    # full schedule and the default schedule keeps a floor.
    r1, r2_full = curve(1), curve(2, 1.0)
    assert r2_full >= r1  # the full second pass can only have bought quality
    r2_default = curve(2)
    assert r2_default >= r1 - 0.02  # fractional re-link stays at single-pass quality
    assert r2_default >= 0.5  # sanity floor at these parameters (measured ~0.7+)
