"""Scalar quantization tests (reference parity: scalar.h compress/
decompress/corrected distances; B7 = recall drop <= 0.05 vs exact)."""

import pytest
from pyspark.sql import functions as F

from scalablevectorsearch_spark.operators.flat import flat_knn
from scalablevectorsearch_spark.operators.sq import (
    SQParams,
    sq_compress,
    sq_decompress,
    sq_knn,
    sq_train,
)


@pytest.fixture(scope="module")
def base(embeddings):
    return embeddings.selectExpr("vec_id as id", "embedding as vector", "label")


@pytest.fixture(scope="module")
def queries(base):
    return base.filter(F.col("id") < 20).selectExpr("id as qid", "vector")


def test_sq_train_bounds(base):
    p = sq_train(base)
    assert p.gmin < p.gmax
    assert p.scale > 0
    # compress(gmin) == -128, compress(gmax) == 127 by construction
    assert abs((p.gmin - p.bias) / p.scale + 128.0) < 1e-9
    assert abs((p.gmax - p.bias) / p.scale - 127.0) < 1e-9


def test_sq_roundtrip_error_bounded(base):
    """|decompress(compress(x)) - x| <= scale/2 per element."""
    p = sq_train(base)
    dec = sq_decompress(sq_compress(base, p, "vector", "qv"), p, "qv", "dv")
    err = dec.select(
        F.max(
            F.aggregate(
                F.zip_with("vector", "dv", lambda a, b: F.abs(a.cast("double") - b)),
                F.lit(0.0),
                lambda acc, x: F.greatest(acc, x),
            )
        ).alias("max_err")
    ).collect()[0]["max_err"]
    assert err <= p.scale / 2 + 1e-12


def test_sq_storage_is_tinyint(base):
    p = sq_train(base)
    st = sq_compress(base, p, "vector", "qv", storage=True)
    assert dict(st.dtypes)["qv"] == "array<tinyint>"


def test_sq_recall_delta_l2(base, queries):
    """B7: int8 search recall within 0.05 of exact."""
    p = sq_train(base)
    gt = flat_knn(base, queries, k=10, distance="l2").select("qid", "neighbor_id")
    res = sq_knn(base, queries, p, k=10, distance="l2").select("qid", "neighbor_id")
    matched = res.join(gt, ["qid", "neighbor_id"], "left_semi").count()
    recall = matched / gt.count()
    assert recall >= 0.95, f"sq recall {recall}"


def test_sq_corrected_l2_close_to_exact(base, queries):
    """Corrected distances approximate exact distances within the
    quantization error envelope."""
    p = sq_train(base)
    exact = flat_knn(base, queries, k=5, distance="l2").withColumnRenamed("distance", "d_exact")
    sq = sq_knn(base, queries, p, k=5, distance="l2").withColumnRenamed("distance", "d_sq")
    j = exact.join(sq, ["qid", "neighbor_id"]).select(
        F.max(F.abs(F.col("d_exact") - F.col("d_sq"))).alias("max_abs_err")
    ).collect()[0]
    # per-dim error <= scale/2; squared-L2 error bound ~ 2*sqrt(d)*scale*|x| + d*scale^2/4
    assert j["max_abs_err"] < 0.05


def test_sq_ip_and_cosine_run(base, queries):
    p = sq_train(base)
    for dist in ("ip", "cosine"):
        rows = sq_knn(base, queries, p, k=5, distance=dist).collect()
        assert len(rows) == 20 * 5


def test_sq_knn_from_stored_compressed(base, queries, tmp_path, spark):
    """The persisted TINYINT table (save_sq) is directly searchable via
    base_compressed=True and gives the SAME answer as compressing the
    float base in-plan — the 4x-bandwidth scan path at 100 TB."""
    from scalablevectorsearch_spark.sources.index_store import load_sq, save_sq

    p = sq_train(base)
    path = str(tmp_path / "sqstore")
    save_sq(base, p, path)
    packed, p2 = load_sq(spark, path)
    assert (p2.gmin, p2.gmax) == (p.gmin, p.gmax)
    got = sq_knn(
        packed, queries, p2, k=10, distance="l2",
        vec_col="qvector", qvec_col="vector", base_compressed=True,
    )
    want = sq_knn(base, queries, p, k=10, distance="l2")
    key = lambda df: sorted(
        (r["qid"], r["rank"], r["neighbor_id"], round(r["distance"], 4))
        for r in df.collect()
    )
    assert key(got) == key(want)
