"""LeanVec tests (reference parity: LeanVec4x4/4x8/8x8 storage kinds,
api_defs.h:98-109; LeanVecTrainingData::build / external matrices,
training.h:28-71). DuckDB hash gates in __spark_entry__ (leanvec_*)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from scalablevectorsearch_spark.operators.flat import flat_knn
from scalablevectorsearch_spark.operators.leanvec import (
    LeanVecModel,
    dataset_mean,
    leanvec_knn,
    leanvec_project,
    leanvec_train,
    leanvec_vamana_build,
    leanvec_vamana_search,
)


@pytest.fixture(scope="module")
def base(embeddings):
    return embeddings.selectExpr("vec_id as id", "embedding as vector").cache()


@pytest.fixture(scope="module")
def queries(base):
    return base.filter(F.col("id") < 20).selectExpr("id as qid", "vector")


def test_model_validation():
    with pytest.raises(ValueError):
        LeanVecModel(np.eye(4)[:, :2], np.eye(4)[:, :3], mean=(0.0,) * 4)
    with pytest.raises(ValueError):
        LeanVecModel(np.eye(4)[:, :2], np.eye(4)[:, :2], mean=(0.0,) * 3)
    with pytest.raises(ValueError):
        LeanVecModel.truncation(4, 0)


def test_train_deterministic(base):
    m1 = leanvec_train(base, 8)
    m2 = leanvec_train(base, 8)
    assert np.array_equal(m1.data_matrix, m2.data_matrix)
    assert m1.mean == m2.mean


def test_train_high_partition_tree_merge(base):
    """VERDICT r5: the moment merge used to collect one d x d partial
    per partition to the driver (~470 GB at d=768, P=100k). Past 64
    partitions a sqrt(P)-way tree re-sum now bounds the driver fetch;
    the high-P path must produce the same model as the low-P path (the
    canonical 1e-9 moment rounding absorbs summation-order jitter) and
    be deterministic across reruns."""
    lo = leanvec_train(base, 8)
    hi_base = base.repartition(512)
    hi1 = leanvec_train(hi_base, 8)
    hi2 = leanvec_train(hi_base, 8)
    assert np.array_equal(hi1.data_matrix, hi2.data_matrix)  # canonical order
    assert hi1.mean == lo.mean
    assert np.allclose(hi1.data_matrix, lo.data_matrix, atol=1e-6)


def test_train_orthonormal(base):
    P = leanvec_train(base, 16).data_matrix
    assert np.allclose(P.T @ P, np.eye(16), atol=1e-10)


def test_full_rank_projection_is_lossless(base, queries):
    """m = d: the projection is orthogonal, L2 is preserved — the
    two-stage pipeline must reproduce exact flat k-NN ids."""
    model = leanvec_train(base, 64)
    gt = flat_knn(base, queries, k=10, distance="l2").select("qid", "neighbor_id")
    res = leanvec_knn(base, queries, model, k=10, k_reorder=20).select(
        "qid", "neighbor_id"
    )
    assert res.join(gt, ["qid", "neighbor_id"]).count() == gt.count()


def test_truncation_projection_exact(base):
    mu = dataset_mean(base, "vector")
    model = LeanVecModel.truncation(64, 16, mean=mu)
    got = leanvec_project(base, model, "data", out_col="pv").select("id", "pv")
    pdf = got.orderBy("id").toPandas()
    X = np.stack(pdf["pv"].to_numpy())
    raw = base.orderBy("id").toPandas()
    R = np.stack(raw["vector"].to_numpy()).astype(np.float64) - np.asarray(mu)
    assert np.array_equal(X, R[:, :16])


def test_pca_recall_with_rerank(base, queries):
    """Uniform data is PCA's worst case; re-rank still recovers >= 0.8
    at m=32 / k_reorder=50 (the gate's floor)."""
    model = leanvec_train(base, 32)
    gt = flat_knn(base, queries, k=10, distance="l2").select("qid", "neighbor_id")
    res = leanvec_knn(base, queries, model, k=10, k_reorder=50).select(
        "qid", "neighbor_id"
    )
    assert res.join(gt, ["qid", "neighbor_id"]).count() / gt.count() >= 0.8


def test_ip_distance_path(base, queries):
    """ip primary leaves the query uncentered (q . mu is a per-query
    rank-invariant constant); with re-rank recall vs exact ip >= 0.8."""
    model = leanvec_train(base, 32)
    gt = flat_knn(base, queries, k=10, distance="ip").select("qid", "neighbor_id")
    res = leanvec_knn(
        base, queries, model, k=10, k_reorder=50, distance="ip"
    ).select("qid", "neighbor_id")
    assert res.join(gt, ["qid", "neighbor_id"]).count() / gt.count() >= 0.8


def test_cosine_distance_path(base, queries):
    """cosine primary = IP over the normalized projection; re-rank with
    exact cosine recovers >= 0.8 at m=32 / k_reorder=50 (same floor as
    the l2/ip paths)."""
    from scalablevectorsearch_spark.operators.leanvec import _normalized

    model = leanvec_train(_normalized(base, "vector"), 32)
    gt = flat_knn(base, queries, k=10, distance="cosine").select("qid", "neighbor_id")
    res = leanvec_knn(
        base, queries, model, k=10, k_reorder=50, distance="cosine"
    ).select("qid", "neighbor_id")
    assert res.join(gt, ["qid", "neighbor_id"]).count() / gt.count() >= 0.8


def test_cosine_vamana_saveload(spark, base, queries, tmp_path):
    """cosine LeanVec-Vamana: exhaustive window == flat cosine LeanVec;
    the re-rank metric survives a save/load cycle."""
    from scalablevectorsearch_spark.operators.leanvec import _normalized
    from scalablevectorsearch_spark.sources.index_store import (
        load_vamana,
        save_vamana,
    )

    model = leanvec_train(_normalized(base, "vector"), 32)
    idx = leanvec_vamana_build(base, model, n_shards=2, distance="cosine")
    assert idx.distance == "ip" and idx.leanvec_distance == "cosine"
    direct = leanvec_vamana_search(
        idx, queries, base, k=10, k_reorder=50, search_window_size=4096
    )
    flat = leanvec_knn(base, queries, model, k=10, k_reorder=50, distance="cosine")
    key = ["qid", "rank", "neighbor_id"]
    assert sorted(map(tuple, direct.select(*key).collect())) == sorted(
        map(tuple, flat.select(*key).collect())
    )
    save_vamana(idx, str(tmp_path / "lv_cos"))
    loaded = load_vamana(spark, str(tmp_path / "lv_cos"))
    assert loaded.leanvec_distance == "cosine"
    reloaded = leanvec_vamana_search(
        loaded, queries, base, k=10, k_reorder=50, search_window_size=4096
    )
    assert sorted(map(tuple, direct.select(*key).collect())) == sorted(
        map(tuple, reloaded.select(*key).collect())
    )


def test_lvq_primary_composition(base, queries):
    """LeanVec4x8-style: LVQ4 on the projected primary + full-dim
    re-rank (the primary_lvq hook) stays close to the fp primary."""
    from scalablevectorsearch_spark.operators.lvq import lvq_train

    model = leanvec_train(base, 32)
    pb = leanvec_project(base, model, "data", out_col="pv").select(
        "id", F.col("pv").alias("vector")
    )
    p4 = lvq_train(pb, primary_bits=4)
    gt = flat_knn(base, queries, k=10, distance="l2").select("qid", "neighbor_id")
    res = leanvec_knn(
        base, queries, model, k=10, k_reorder=50, primary_lvq=p4
    ).select("qid", "neighbor_id")
    assert res.join(gt, ["qid", "neighbor_id"]).count() / gt.count() >= 0.75


def test_leanvec_vamana_production_window(base, queries):
    model = leanvec_train(base, 32)
    idx = leanvec_vamana_build(base, model, n_shards=2)
    res = leanvec_vamana_search(
        idx, queries, base, k=10, k_reorder=50, search_window_size=60
    ).select("qid", "neighbor_id")
    gt = flat_knn(base, queries, k=10, distance="l2").select("qid", "neighbor_id")
    assert res.join(gt, ["qid", "neighbor_id"]).count() / gt.count() >= 0.8


def test_arg_validation(base, queries):
    model = leanvec_train(base, 8)
    with pytest.raises(ValueError):
        leanvec_knn(base, queries, model, k=10, k_reorder=5)
    with pytest.raises(ValueError):
        leanvec_knn(base, queries, model, k=5, k_reorder=10, distance="hamming")
    from scalablevectorsearch_spark.operators.vamana import vamana_build

    idx = vamana_build(base, n_shards=2)
    with pytest.raises(ValueError):
        leanvec_vamana_search(idx, queries, base, k=5, k_reorder=10)
