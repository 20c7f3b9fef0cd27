"""Embedding near-dup tests: planted pairs found, clustered variant
recall vs brute force, no false positives on clean data."""

import pytest
from pyspark.sql import functions as F

from scalablevectorsearch_spark.pipeline.neardup import (
    embedding_neardup,
    embedding_neardup_clustered,
)


@pytest.fixture(scope="module")
def base(embeddings):
    return embeddings.selectExpr(
        "vec_id as id", "transform(embedding, x -> cast(x as double)) as vector"
    )


@pytest.fixture(scope="module")
def with_copies(base, embeddings):
    copies = embeddings.filter(F.col("vec_id") < 5).selectExpr(
        "vec_id + 9000 as id",
        "concat(array(cast(embedding[0] as double) + 0.05d), "
        "transform(slice(embedding, 2, size(embedding) - 1), x -> cast(x as double))) as vector",
    )
    return base.unionByName(copies)


def test_clean_data_has_no_neardups(base):
    assert embedding_neardup(base, threshold=0.9).count() == 0


def test_planted_pairs_found(with_copies):
    pairs = {(r["id_a"], r["id_b"]) for r in embedding_neardup(with_copies, 0.9).collect()}
    assert pairs == {(i, i + 9000) for i in range(5)}


def test_clustered_recall_vs_brute(with_copies):
    brute = {(r["id_a"], r["id_b"]) for r in embedding_neardup(with_copies, 0.9).collect()}
    clus = {
        (r["id_a"], r["id_b"])
        for r in embedding_neardup_clustered(with_copies, 0.9, n_clusters=8).collect()
    }
    assert clus <= brute  # bucketing can only lose pairs, never invent them
    assert len(clus) >= 0.8 * len(brute)


def test_cosine_values_sane(with_copies):
    rows = embedding_neardup(with_copies, 0.9).collect()
    assert all(0.9 <= r["cosine"] <= 1.0 + 1e-9 for r in rows)


def test_cluster_size_cap_bounds_skewed_cell(spark, with_copies):
    """Skew guard (VERDICT r4 #7): with n_clusters=2 most rows land in a
    handful of giant cells; max_cluster_rows sub-splits them so no
    bucket exceeds a bounded multiple of the cap, while planted pairs
    still surface and no false pairs appear."""
    from scalablevectorsearch_spark.operators.kmeans import (
        stamp_clusters,
        train_kmeans,
    )
    from scalablevectorsearch_spark.pipeline.neardup import _subsplit_oversized

    cap = 200
    # the bucket-size bound: sub-split keyed on (cluster_id, __sub)
    side = stamp_clusters(
        with_copies.selectExpr("cast(id as long) as __id", "vector as __v"),
        train_kmeans(with_copies, 2, 2),
        vec_col="__v",
    )
    split = _subsplit_oversized(side, cap, 2)
    sizes = [
        r["count"]
        for r in split.groupBy("cluster_id", "__sub").count().collect()
    ]
    n = with_copies.count()
    assert max(sizes) < n / 2  # the mega-cells were actually split
    # expected bucket size ~ cap; allow kmeans imbalance headroom
    assert max(sizes) <= 6 * cap
    # end-to-end: capped variant still a subset of brute force, planted
    # pairs mostly retained
    brute = {(r["id_a"], r["id_b"]) for r in embedding_neardup(with_copies, 0.9).collect()}
    capped = {
        (r["id_a"], r["id_b"])
        for r in embedding_neardup_clustered(
            with_copies, 0.9, n_clusters=2, max_cluster_rows=cap
        ).collect()
    }
    assert capped <= brute
    assert len(capped) >= 0.6 * len(brute)
