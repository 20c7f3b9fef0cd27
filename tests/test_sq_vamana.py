"""SQ-compressed Vamana index (reference parity: the SQDataset plugged
into the Vamana index via extension CPOs, include/svs/extensions/vamana/
scalar.h — graph build + greedy search over compressed storage with
corrected distances).

The load-bearing check is metamorphic: with an exhaustive exploration
window, sq_vamana_search must EQUAL sq_knn (the flat SQ scan), which is
itself hash-gated against the DuckDB oracle."""

import pytest
from pyspark.sql import functions as F

from scalablevectorsearch_spark.operators.sq import (
    sq_knn,
    sq_train,
    sq_vamana_build,
    sq_vamana_search,
)
from scalablevectorsearch_spark.operators.vamana import VamanaParams

PARAMS = VamanaParams(alpha=1.2, graph_max_degree=16, window_size=50)


@pytest.fixture(scope="module")
def base(embeddings):
    return embeddings.selectExpr("vec_id as id", "embedding as vector")


@pytest.fixture(scope="module")
def queries(base):
    return base.filter(F.col("id") < 20).selectExpr("id as qid", "vector")


def _rows(df):
    return sorted(
        (r["qid"], r["rank"], r["neighbor_id"], round(r["distance"], 4))
        for r in df.collect()
    )


@pytest.mark.parametrize("distance", ["l2", "ip", "cosine"])
def test_sq_vamana_exhaustive_equals_sq_flat(base, queries, distance):
    p = sq_train(base)
    idx = sq_vamana_build(base, p, PARAMS, n_shards=2, distance=distance)
    assert idx.sq_params is p
    got = sq_vamana_search(idx, queries, k=10, search_window_size=4096)
    want = sq_knn(base, queries, p, k=10, distance=distance)
    assert _rows(got) == _rows(want)


def test_sq_vamana_production_window_recall(base, queries):
    """Approximate-window search over compressed storage stays close to
    the flat SQ answer (the compressed-domain analog of vamana_recall)."""
    p = sq_train(base)
    idx = sq_vamana_build(base, p, PARAMS, n_shards=2, distance="l2")
    got = sq_vamana_search(idx, queries, k=10, search_window_size=30)
    want = sq_knn(base, queries, p, k=10, distance="l2")
    inter = got.select("qid", "neighbor_id").join(
        want.select("qid", "neighbor_id"), ["qid", "neighbor_id"]
    )
    nq = queries.count()
    recall = inter.count() / (10 * nq)
    assert recall >= 0.95


def test_sq_vamana_requires_sq_index(base, queries):
    from scalablevectorsearch_spark.operators.vamana import vamana_build

    idx = vamana_build(base, PARAMS, n_shards=2)
    with pytest.raises(ValueError, match="sq_vamana_build"):
        sq_vamana_search(idx, queries, k=10)


def test_sq_vamana_kmeans_routing_composes(base, queries):
    """SQ storage composes with cluster sharding: probing EVERY shard
    with an exhaustive window still reproduces the flat SQ scan."""
    p = sq_train(base)
    idx = sq_vamana_build(
        base, p, PARAMS, n_shards=4, distance="l2", shard_by="kmeans"
    )
    got = sq_vamana_search(
        idx, queries, k=10, search_window_size=4096, n_probes=4
    )
    want = sq_knn(base, queries, p, k=10, distance="l2")
    assert _rows(got) == _rows(want)


def test_sq_vamana_reconstruct_decompresses(base, spark):
    """reconstruct_accessor parity (extensions/vamana/scalar.h:25-31):
    ids -> stored compressed vectors -> decompress, error <= scale/2."""
    from scalablevectorsearch_spark.operators.reconstruct import reconstruct
    from scalablevectorsearch_spark.operators.sq import sq_decompress

    p = sq_train(base)
    idx = sq_vamana_build(base, p, PARAMS, n_shards=2, distance="l2")
    ids = base.select("id").filter(F.col("id") < 10)
    rec = reconstruct(idx.base, ids)
    dec = sq_decompress(rec, p, "vector", "dv").select("id", "dv")
    orig = base.filter(F.col("id") < 10).select("id", "vector")
    err = (
        dec.join(orig, "id")
        .select(
            F.aggregate(
                F.zip_with("vector", "dv", lambda a, d: F.abs(a.cast("double") - d)),
                F.lit(0.0),
                lambda acc, x: F.greatest(acc, x),
            ).alias("e")
        )
        .agg(F.max("e"))
        .collect()[0][0]
    )
    assert err <= p.scale / 2 + 1e-12


def test_sq_vamana_save_load_roundtrip(base, queries, tmp_path, spark):
    """save -> load preserves SQ params; loaded search == direct search."""
    from scalablevectorsearch_spark.sources.index_store import (
        load_vamana,
        save_vamana,
    )

    p = sq_train(base)
    idx = sq_vamana_build(base, p, PARAMS, n_shards=2, distance="l2")
    path = str(tmp_path / "sqvam")
    save_vamana(idx, path)
    loaded = load_vamana(spark, path)
    assert loaded.sq_params is not None
    assert loaded.sq_params.gmin == p.gmin and loaded.sq_params.gmax == p.gmax
    got = sq_vamana_search(loaded, queries, k=10, search_window_size=4096)
    want = sq_vamana_search(idx, queries, k=10, search_window_size=4096)
    assert _rows(got) == _rows(want)


def test_sq_vamana_build_from_stored_compressed(base, queries, tmp_path, spark):
    """Building from the persisted TINYINT table (save_sq) gives the
    same exhaustive-window answer as building from the float base."""
    from scalablevectorsearch_spark.sources.index_store import load_sq, save_sq

    p = sq_train(base)
    path = str(tmp_path / "sqstore")
    save_sq(base, p, path)
    packed, p2 = load_sq(spark, path)
    idx = sq_vamana_build(
        packed, p2, PARAMS, n_shards=2, distance="l2",
        vec_col="qvector", base_compressed=True,
    )
    got = sq_vamana_search(idx, queries, k=10, search_window_size=4096)
    want = sq_knn(base, queries, p, k=10, distance="l2")
    assert _rows(got) == _rows(want)
