"""Flat exact k-NN vs a numpy brute-force oracle (SURVEY.md §5 layer a)."""

import numpy as np
import pytest

from scalablevectorsearch_spark.functions.distances import pairwise_distances
from scalablevectorsearch_spark.operators.flat import flat_knn

K = 10


def _load_np(embeddings):
    pdf = embeddings.select("vec_id", "embedding").toPandas().sort_values("vec_id")
    ids = pdf["vec_id"].to_numpy(np.int64)
    X = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    return ids, X


def _oracle(ids, X, qids, Q, distance, k):
    D = pairwise_distances(Q, X, distance)
    key = -D if distance in ("ip", "cosine") else D
    out = {}
    for r, qid in enumerate(qids):
        order = np.lexsort((ids, key[r]))[:k]
        out[qid] = [(int(ids[j]), float(D[r, j])) for j in order]
    return out


@pytest.mark.parametrize("distance", ["l2", "ip", "cosine"])
def test_flat_knn_matches_bruteforce(spark, embeddings, distance):
    ids, X = _load_np(embeddings)
    queries = embeddings.filter("vec_id < 20").selectExpr(
        "vec_id as qid", "embedding as vector"
    )
    res = flat_knn(
        embeddings.selectExpr("vec_id as id", "embedding as vector"),
        queries,
        k=K,
        distance=distance,
        round_to=None,
    ).toPandas()

    qids = ids[:20]
    expected = _oracle(ids, X, qids, X[:20], distance, K)
    assert len(res) == 20 * K
    for qid, grp in res.groupby("qid"):
        grp = grp.sort_values("rank")
        got = list(zip(grp["neighbor_id"], grp["distance"]))
        exp = expected[qid]
        assert [g[0] for g in got] == [e[0] for e in exp], f"qid={qid}"
        np.testing.assert_allclose(
            [g[1] for g in got], [e[1] for e in exp], rtol=1e-9, atol=1e-12
        )


def test_flat_knn_self_is_nearest(spark, embeddings):
    queries = embeddings.filter("vec_id < 10").selectExpr(
        "vec_id as qid", "embedding as vector"
    )
    res = (
        flat_knn(
            embeddings.selectExpr("vec_id as id", "embedding as vector"),
            queries,
            k=1,
            distance="l2",
        )
        .toPandas()
        .set_index("qid")
    )
    for qid in range(10):
        assert res.loc[qid, "neighbor_id"] == qid
        assert res.loc[qid, "distance"] == 0.0


def test_flat_knn_filtered(spark, embeddings):
    """Predicate-filtered scan (flat.h:290-295): excluded ids never appear."""
    queries = embeddings.filter("vec_id < 5").selectExpr(
        "vec_id as qid", "embedding as vector"
    )
    res = flat_knn(
        embeddings.selectExpr("vec_id as id", "embedding as vector", "label"),
        queries,
        k=K,
        distance="l2",
        where="label = 3",
    ).toPandas()
    allowed = set(
        r["vec_id"] for r in embeddings.filter("label = 3").select("vec_id").collect()
    )
    assert set(res["neighbor_id"]).issubset(allowed)
    assert (res.groupby("qid").size() == K).all()
