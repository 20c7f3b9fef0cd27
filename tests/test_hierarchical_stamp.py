"""Hierarchical (grouped triangle-pruned) nearest-centroid stamp.

The flat build-time stamp is O(N*S) — measured memory-bound at ~1.9
ms/row at S=6103, the wall that capped the r8 routed-Vamana build at
5e7 rows. kmeans.group_centroids is the build-time analog of the
reference's two-level clustering
(/root/reference/include/svs/index/ivf/hierarchical_kmeans.h:61-68),
but EXACT: triangle-inequality lower bounds prune groups that provably
contain no nearer centroid, so assignments and closure replica sets are
identical to the flat pass — verified here at the numpy kernel level,
through the Spark stamp surfaces, and end-to-end on graph builds.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from scalablevectorsearch_spark.functions.distances import pairwise_distances
from scalablevectorsearch_spark.operators.ivf import ivf_build, ivf_search
from scalablevectorsearch_spark.operators.kmeans import (
    HIERARCHICAL_STAMP_THRESHOLD,
    _nearest_centroid,
    _resolve_stamp_via,
    assign_clusters,
    centroids_within_grouped,
    group_centroids,
    nearest_centroid_grouped,
    stamp_clusters,
    train_kmeans,
)
from scalablevectorsearch_spark.operators.vamana import (
    VamanaParams,
    vamana_build,
    vamana_search,
)

PARAMS = VamanaParams(graph_max_degree=24, window_size=24)


def _make(rng, S, n, kind):
    d = 16
    if kind == "clustered":
        anchors = rng.normal(size=(max(8, S // 16), d))
        C = anchors[rng.integers(0, len(anchors), S)] + 0.15 * rng.normal(size=(S, d))
    elif kind == "dup":
        C = np.repeat(rng.normal(size=(S // 2 + 1, d)), 2, axis=0)[:S]
    else:
        C = rng.normal(size=(S, d))
    V = C[rng.integers(0, len(C), n)] + 0.3 * rng.normal(size=(n, d))
    return C, V


@pytest.mark.parametrize("kind", ["clustered", "uniform"])
@pytest.mark.parametrize("S", [3, 61, 700])
def test_grouped_assign_equals_flat(kind, S):
    rng = np.random.default_rng(S)
    C, V = _make(rng, S, 5000, kind)
    gc = group_centroids(C)
    assert gc.n_centroids == S
    assert sum(len(m) for m in gc.member_cids) == S
    a_flat = _nearest_centroid(V, C)
    a_grp = nearest_centroid_grouped(V, gc)
    assert (a_flat == a_grp).all()


@pytest.mark.parametrize("S", [3, 61, 700])
def test_grouped_assign_duplicate_centroids(S):
    """EXACT-duplicate centroids: a single batched gemm can place the
    two identical columns a last-ulp apart (measured), so the tie
    winner among duplicates is BLAS-noise-bound in the FLAT path too —
    the contract is that the pick is *a* true nearest centroid."""
    rng = np.random.default_rng(S)
    C, V = _make(rng, S, 5000, "dup")
    gc = group_centroids(C)
    a_flat = _nearest_centroid(V, C)
    a_grp = nearest_centroid_grouped(V, gc)
    diff = (V - C[a_grp]) if S else None
    d_grp = np.einsum("ij,ij->i", diff, diff)
    diff_f = V - C[a_flat]
    d_flat = np.einsum("ij,ij->i", diff_f, diff_f)
    assert np.allclose(d_grp, d_flat, rtol=1e-9, atol=1e-9)
    # modulo duplicate-sibling identity the picks agree exactly
    # (np.repeat pairs rows (0,1),(2,3),... — canonical = even sibling)
    assert ((a_flat - a_flat % 2) == (a_grp - a_grp % 2)).all()


@pytest.mark.parametrize("kind", ["clustered", "uniform", "dup"])
@pytest.mark.parametrize("bp", [200, 2000])
def test_grouped_closure_pairs_equal_flat(kind, bp):
    rng = np.random.default_rng(bp)
    C, V = _make(rng, 300, 2000, kind)
    gc = group_centroids(C)
    key = np.floor(pairwise_distances(V, C, "l2") * 1e4 + 0.5).astype(np.int64)
    best = key.min(axis=1)
    cut = best * 10000 + np.abs(best) * bp
    fr, fc = np.nonzero(key * 10000 <= cut[:, None])
    gr, gcid = centroids_within_grouped(V, gc, bp)
    assert len(fr) == len(gr)
    assert (fr == gr).all() and (fc == gcid).all()
    # nearest centroid always replicates (cut >= its own key)
    nearest = _nearest_centroid(V, C)
    own = set(zip(range(len(V)), nearest.tolist()))
    assert own <= set(zip(gr.tolist(), gcid.tolist()))


def test_grouped_empty_batch():
    rng = np.random.default_rng(0)
    C, _ = _make(rng, 10, 1, "uniform")
    gc = group_centroids(C)
    assert nearest_centroid_grouped(np.empty((0, 16)), gc).shape == (0,)
    r, c = centroids_within_grouped(np.empty((0, 16)), gc, 100)
    assert len(r) == 0 and len(c) == 0


def test_resolve_stamp_via():
    assert not _resolve_stamp_via("auto", HIERARCHICAL_STAMP_THRESHOLD - 1)
    assert _resolve_stamp_via("auto", HIERARCHICAL_STAMP_THRESHOLD)
    assert _resolve_stamp_via("hierarchical", 2)
    assert not _resolve_stamp_via("flat", 10**6)
    with pytest.raises(ValueError):
        _resolve_stamp_via("fast", 10)


@pytest.fixture(scope="module")
def hbase(spark, embeddings):
    base = embeddings.selectExpr("vec_id as id", "embedding as vector").limit(
        600
    ).cache()
    base.count()
    yield base
    base.unpersist()


def test_spark_assign_and_stamp_hierarchical(hbase):
    model = train_kmeans(hbase, 12, 2)
    flat = {
        r["id"]: r["cluster_id"]
        for r in assign_clusters(hbase, model, stamp_via="flat").collect()
    }
    hier = {
        r["id"]: r["cluster_id"]
        for r in assign_clusters(hbase, model, stamp_via="hierarchical").collect()
    }
    assert flat == hier
    stamped = {
        r["id"]: r["cluster_id"]
        for r in stamp_clusters(hbase, model, stamp_via="hierarchical")
        .select("id", "cluster_id")
        .collect()
    }
    assert stamped == flat


def test_ivf_build_hierarchical_same_results(hbase, embeddings):
    q = embeddings.selectExpr("vec_id as qid", "embedding as vector").limit(8)
    i_flat = ivf_build(hbase, 12, 2, stamp_via="flat")
    i_hier = ivf_build(hbase, 12, 2, stamp_via="hierarchical")
    a = {
        (r["id"], r["cluster_id"])
        for r in i_flat.clustered.select("id", "cluster_id").collect()
    }
    b = {
        (r["id"], r["cluster_id"])
        for r in i_hier.clustered.select("id", "cluster_id").collect()
    }
    assert a == b
    ra = ivf_search(i_flat, q, k=5, n_probes=3, round_to=4).collect()
    rb = ivf_search(i_hier, q, k=5, n_probes=3, round_to=4).collect()
    assert sorted(map(tuple, ra)) == sorted(map(tuple, rb))


def test_train_kmeans_hierarchical_bit_identical(hbase):
    """Lloyd training through the grouped per-iteration assign produces
    BIT-identical centroids (same assignments -> same partial sums ->
    same rounded means). C=300 >= the auto threshold, so 'auto' takes
    the grouped path here too."""
    m_flat = train_kmeans(hbase, 300, 2, stamp_via="flat")
    m_hier = train_kmeans(hbase, 300, 2, stamp_via="hierarchical")
    m_auto = train_kmeans(hbase, 300, 2)
    assert (m_flat.centroids == m_hier.centroids).all()
    assert (m_flat.centroids == m_auto.centroids).all()


def test_ivf_build_pretrained_model(hbase):
    model = train_kmeans(hbase, 12, 2)
    idx = ivf_build(hbase, 12, model=model, stamp_via="hierarchical")
    assert idx.model is model
    with pytest.raises(ValueError):
        ivf_build(hbase, 13, model=model)


def test_vamana_closure_build_hierarchical_identical_graph(hbase):
    """Same layout rows AND bit-identical per-shard graphs: the grouped
    stamp assigns identically, so the deterministic per-shard build
    sees the same rows in the same (ascending-id) order."""
    kw = dict(n_shards=4, shard_by="kmeans", closure_bp=1500)
    i_flat = vamana_build(hbase, PARAMS, stamp_via="flat", **kw)
    i_hier = vamana_build(hbase, PARAMS, stamp_via="hierarchical", **kw)
    assert i_flat.stamp_hierarchical is False
    assert i_hier.stamp_hierarchical is True
    lay_a = {
        (r["shard_id"], r["__id"])
        for r in i_flat.layout.select("shard_id", "__id").collect()
    }
    lay_b = {
        (r["shard_id"], r["__id"])
        for r in i_hier.layout.select("shard_id", "__id").collect()
    }
    assert lay_a == lay_b
    g_a = {
        (r["shard_id"], r["src"]): (tuple(r["neighbors"]), r["is_entry"])
        for r in i_flat.graph.collect()
    }
    g_b = {
        (r["shard_id"], r["src"]): (tuple(r["neighbors"]), r["is_entry"])
        for r in i_hier.graph.collect()
    }
    assert g_a == g_b
    for idx in (i_flat, i_hier):
        idx.layout.unpersist()


def test_vamana_search_filtered_hier_stamp(hbase, embeddings, spark):
    """A filtered search on a hierarchical-stamp index re-stamps the
    base through the SAME grouped path (index.stamp_hierarchical) —
    exhaustive-window results equal the filtered flat oracle."""
    from scalablevectorsearch_spark.operators.flat import flat_knn

    base = hbase.withColumn("label", (F.col("id") % 4).cast("int"))
    q = embeddings.selectExpr("vec_id as qid", "embedding as vector").limit(6)
    idx = vamana_build(
        base, PARAMS, n_shards=4, shard_by="kmeans", stamp_via="hierarchical"
    )
    got = vamana_search(
        idx, q, k=5, search_window_size=4096, where="label = 1"
    ).collect()
    want = flat_knn(
        base, q, k=5, distance="l2", round_to=4, where="label = 1"
    ).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
    idx.layout.unpersist()
