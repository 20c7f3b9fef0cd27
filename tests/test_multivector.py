"""Multi-vector (label-deduped) search tests — adaptive k_inner
iteration per MultiBatchIterator semantics (multi.h:22-47)."""

import pytest
from pyspark.sql import functions as F

from scalablevectorsearch_spark.operators.multivector import multivector_knn


@pytest.fixture(scope="module")
def skewed(embeddings):
    # every label owns many vectors: label = id div 8 -> a naive small
    # k_inner sees few distinct labels and must iterate
    return embeddings.selectExpr(
        "vec_id as id", "embedding as vector", "cast(vec_id div 8 as int) as label"
    )


@pytest.fixture(scope="module")
def tiny_labels(embeddings):
    # only 3 distinct labels exist in the whole base
    return embeddings.selectExpr(
        "vec_id as id", "embedding as vector", "cast(vec_id % 3 as int) as label"
    )


@pytest.fixture(scope="module")
def queries(embeddings):
    return embeddings.filter(F.col("vec_id") < 5).selectExpr("vec_id as qid", "embedding as vector")


def test_adaptive_fills_k_labels(skewed, queries):
    out = multivector_knn(skewed, queries, k=6, k_inner=8)
    per = out.groupBy("qid").agg(
        F.count("*").alias("n"), F.countDistinct("label").alias("nl")
    ).collect()
    assert all(r["n"] == 6 and r["nl"] == 6 for r in per)


def test_caps_at_available_labels(tiny_labels, queries):
    out = multivector_knn(tiny_labels, queries, k=5)
    per = {r["qid"]: r["n"] for r in out.groupBy("qid").agg(F.count("*").alias("n")).collect()}
    assert all(v == 3 for v in per.values())  # only 3 labels exist


def test_nearest_representative_per_label(skewed, queries):
    out = multivector_knn(skewed, queries, k=3)
    # each (qid,label) appears once, ranked 1..3
    dup = out.groupBy("qid", "label").count().filter("count > 1").count()
    assert dup == 0
    ranks = {r["qid"]: sorted([]) for r in out.collect()}
    for r in out.collect():
        ranks.setdefault(r["qid"], []).append(r["rank"])
