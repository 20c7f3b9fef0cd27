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
