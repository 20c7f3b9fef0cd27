"""Round-12 regressions (VERDICT r11 task 2): the worker GEMM budget.

Every transient per-chunk block in the graph kernels (dense distance
GEMMs, lazy visit masks, the prune gather tensor) is sized from one
``SVS_GEMM_BUDGET_MB`` byte budget instead of hard-coded cell counts —
so an oversized deliberate run degrades to smaller chunks instead of a
host-OOM SIGKILL ("Python worker exited unexpectedly", the r11 crash
class that killed both scale runs). Chunking is a memory/wall tradeoff
only: results must be bit-identical at any budget.
"""

import importlib
import os

import numpy as np
import pytest

from scalablevectorsearch_spark.operators import vamana_local as vl


@pytest.fixture
def small_budget():
    """Reload the kernel module with an 8 MB budget, restore after."""
    old = os.environ.get("SVS_GEMM_BUDGET_MB")
    os.environ["SVS_GEMM_BUDGET_MB"] = "8"
    importlib.reload(vl)
    yield vl
    if old is None:
        os.environ.pop("SVS_GEMM_BUDGET_MB", None)
    else:
        os.environ["SVS_GEMM_BUDGET_MB"] = old
    importlib.reload(vl)


def test_default_budget_matches_r11_constants():
    # the 64 MB default must reproduce the pre-r12 chunk sizes exactly
    # (the golden-curve evidence and every gate ran on those)
    assert vl._GEMM_BUDGET_MB == 64 or "SVS_GEMM_BUDGET_MB" in os.environ
    if vl._GEMM_BUDGET_MB == 64:
        assert vl._PRUNE_BATCH_CELLS == 12_000_000


def test_build_and_search_invariant_under_budget(small_budget):
    rng = np.random.default_rng(7)
    X = rng.standard_normal((600, 24)).astype(np.float64)
    Q = rng.standard_normal((20, 24)).astype(np.float64)
    p = vl.VamanaParams(graph_max_degree=16, window_size=40)

    assert small_budget._GEMM_BUDGET_MB == 8
    assert small_budget._PRUNE_BATCH_CELLS == 8 * 187_500
    g_small, e_small = small_budget.build_graph(X, p)
    ids_small, d_small = small_budget.search_graph(X, g_small, e_small, Q, 5, 30)

    os.environ["SVS_GEMM_BUDGET_MB"] = "64"
    importlib.reload(vl)
    g_big, e_big = vl.build_graph(X, p)
    ids_big, d_big = vl.search_graph(X, g_big, e_big, Q, 5, 30)

    assert e_small == e_big
    assert all(np.array_equal(a, b) for a, b in zip(g_small, g_big))
    assert np.array_equal(ids_small, ids_big)
    assert np.allclose(d_small, d_big)


def test_budget_floor():
    # budgets below 8 MB clamp (a 0/negative budget would deadlock the
    # chunk loop at chunk=1 per row — legal but pathological)
    old = os.environ.get("SVS_GEMM_BUDGET_MB")
    os.environ["SVS_GEMM_BUDGET_MB"] = "1"
    importlib.reload(vl)
    try:
        assert vl._GEMM_BUDGET_MB == 8
    finally:
        if old is None:
            os.environ.pop("SVS_GEMM_BUDGET_MB", None)
        else:
            os.environ["SVS_GEMM_BUDGET_MB"] = old
        importlib.reload(vl)
