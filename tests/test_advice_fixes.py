"""Regression tests for the round-2 ADVICE findings (ADVICE.md):

1. ivf.py probe_clusters_epsilon — sign bug: negative best similarity
   key made the multiplicative cutoff exclude EVERY cluster.
2. vamana_local.py search_graph — a fixed tombstone widening could
   return < k live results when deleted nodes crowd the buffer top.
3. kmeans.py assign_hierarchical — KeyError on parents that were empty
   at training time (no child model trained).
4. precision.py pack_bf16 — the rounding add wrapped NaN bit patterns
   into +0.0 / +Inf instead of preserving NaN.
5. ivf.py ivf_search — the default n_probes=8 silently capped epsilon
   probing to 8 clusters.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from scalablevectorsearch_spark.operators.ivf import (
    ivf_build,
    ivf_search,
    probe_clusters_epsilon,
)


def test_epsilon_probe_negative_similarity_keeps_argmin():
    """Similarity metric where every centroid similarity is NEGATIVE:
    the old multiplicative cutoff excluded all clusters (zero probes);
    the sign-aware additive cutoff must always include the argmin."""
    Q = np.array([[1.0, 0.0]])
    centroids = np.array([[-1.0, 0.0], [-2.0, 0.0], [-5.0, 0.0]])
    sel = probe_clusters_epsilon(Q, centroids, epsilon_bp=1000, distance="ip")
    assert len(sel) == 1 and len(sel[0]) >= 1
    assert 0 in sel[0]  # ip = -1 is the best (largest) similarity
    # generous epsilon widens the set, still anchored at the argmin
    wide = probe_clusters_epsilon(Q, centroids, epsilon_bp=10_000_000, distance="ip")
    assert 0 in wide[0] and len(wide[0]) == 3


def test_epsilon_probe_l2_rule_unchanged():
    """For non-negative L2 keys the additive rule is the reference
    multiplicative (1 + epsilon) rule — the oracle-gated case."""
    Q = np.array([[0.0, 0.0]])
    centroids = np.array([[1.0, 0.0], [1.04, 0.0], [2.0, 0.0]])
    # d^2 keys: 10000, 10816, 40000; eps=10% -> cutoff 11000
    sel = probe_clusters_epsilon(Q, centroids, epsilon_bp=1000, distance="l2")
    assert sel[0].tolist() == [0, 1]


def test_search_graph_tombstones_crowding_buffer():
    """Delete every nearest neighbor of the query so the buffer top is
    all tombstones: the retry loop must still return k LIVE results."""
    from scalablevectorsearch_spark.operators.vamana_local import (
        VamanaParams,
        build_graph,
        search_graph,
    )

    rng = np.random.default_rng(7)
    # 30 points clustered at the origin (deleted) + 10 live far away
    near = rng.normal(0.0, 0.05, (30, 4))
    far = rng.normal(5.0, 0.5, (10, 4))
    X = np.vstack([near, far])
    graph, entry = build_graph(X, VamanaParams(graph_max_degree=8, window_size=12))
    valid = np.ones(len(X), dtype=bool)
    valid[:30] = False  # all 30 near points tombstoned
    Q = np.zeros((1, 4))
    ids, ds = search_graph(X, graph, entry, Q, k=5, window_size=6, valid=valid)
    assert (ids[0] >= 0).all(), f"expected 5 live results, got {ids[0]}"
    assert (ids[0] >= 30).all()  # only live nodes


def test_assign_hierarchical_empty_parent_fallback(spark, embeddings):
    """A parent with no trained children (empty at training time) must
    fall back to child 0, not raise KeyError."""
    from scalablevectorsearch_spark.operators.kmeans import (
        KMeansModel,
        assign_hierarchical,
    )

    base = embeddings.limit(50).selectExpr("vec_id as id", "embedding as vector")
    d = len(base.select("vector").first()[0])
    # parent 1 is unreachable-at-training: children exist only for parent 0
    parents = KMeansModel(
        centroids=np.vstack([np.zeros(d), np.full(d, 1e6)]), n_iters=0
    )
    children = spark.createDataFrame(
        [(0, 0, [0.0] * d), (0, 1, [1.0] * d)],
        "parent_cid int, child_cid int, centroid array<double>",
    )
    # force rows onto parent 1 by flipping the parent centroids
    parents_flipped = KMeansModel(
        centroids=np.vstack([np.full(d, 1e6), np.zeros(d)]), n_iters=0
    )
    out = assign_hierarchical(base, parents_flipped, children).collect()
    assert len(out) == 50
    assert all(r["parent_cid"] == 1 for r in out)
    assert all(r["child_cid"] == 0 for r in out)  # fallback cell


def test_pack_bf16_preserves_nan_and_inf():
    from scalablevectorsearch_spark.functions.precision import pack_bf16, unpack_bf16

    neg_nan = np.uint32(0xFFFFFFFF).view(np.float32)  # -NaN, wrapped to +0.0 before
    payload_nan = np.uint32(0x7F800001).view(np.float32)  # became +Inf before
    X = np.array([[float(neg_nan), float(payload_nan), np.nan, np.inf, -np.inf, 1.5]],
                 dtype=np.float32)
    out = unpack_bf16(pack_bf16(X)[0])
    assert np.isnan(out[0]) and np.isnan(out[1]) and np.isnan(out[2])
    assert out[3] == np.inf and out[4] == -np.inf
    assert out[5] == 1.5  # exact in bf16


def test_ivf_epsilon_uncapped_by_default(embeddings):
    """epsilon_bp with the DEFAULT n_probes must probe every qualifying
    cluster (16 > the old silent cap of 8): a huge epsilon == flat."""
    from scalablevectorsearch_spark.operators.flat import flat_knn

    base = embeddings.selectExpr("vec_id as id", "embedding as vector")
    queries = base.filter(F.col("id") < 10).selectExpr("id as qid", "vector")
    index = ivf_build(base, 16, 2)
    flat = flat_knn(base, queries, k=5, distance="l2")
    eps = ivf_search(index, queries, k=5, epsilon_bp=100_000_000, distance="l2")
    assert (
        flat.select("qid", "rank", "neighbor_id")
        .exceptAll(eps.select("qid", "rank", "neighbor_id"))
        .count()
        == 0
    )
