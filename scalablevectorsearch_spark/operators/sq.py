"""Scalar quantization (SQ) — global min/max int8 compression with
distance-corrected search.

Parity: /root/reference/include/svs/quantization/scalar/scalar.h —
:38-45 (compress = clamp(round((v-bias)/scale)), decompress =
scale*q + bias), :454-464 (scale = (gmax-gmin)/(MAX-MIN), bias =
gmin - MIN*scale over the dataset extrema), :59-104 (EuclideanCompressed:
compress the query, distance = scale^2 * L2int), :106-152
(InnerProductCompressed: keep the query fp32, distance =
scale*ip + bias*sum(q)), :155-195 (Cosine: decompress the datum).

Spark shape:
 - TRAIN is one built-in aggregate: min(array_min(v)) / max(array_max(v))
   — full map-side combine, one scan (the quantization min/max aggregate
   of SURVEY §2.4).
 - COMPRESS is a pure Catalyst `transform` expression over the vector
   column — JVM codegen, no Python. The compressed table is the one that
   persists (4x bandwidth saving at 100 TB vs float32, matching the
   reference's memory-bandwidth motivation).
 - SEARCH reuses the flat/IVF kernels on the compressed arrays: for L2
   the integer-domain distance is computed exactly in float64 and the
   scale^2 correction is applied after ranking (a positive constant
   factor — ranking on the integer distance IS ranking on the corrected
   distance); for IP the per-query offset bias*sum(q) never changes
   ranking either (constant per query, scale > 0).

Determinism: all rounding is floor(x + 0.5) (round-half-up — identical
in Spark, numpy, and DuckDB; the reference's std::round differs only on
exact .5 negatives, a measure-zero set for real data); scale/bias are
derived with the same IEEE double operation order in both engines.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

INT8_MIN, INT8_MAX = -128.0, 127.0


@dataclass
class SQParams:
    """Global quantization parameters (scalar.h:454-464)."""

    gmin: float
    gmax: float

    @property
    def scale(self) -> float:
        return (self.gmax - self.gmin) / 255.0

    @property
    def bias(self) -> float:
        # gmin - INT8_MIN * scale, i.e. compress(gmin) == -128
        return self.gmin + 128.0 * self.scale


def sq_train(df: DataFrame, vec_col: str = "vector") -> SQParams:
    """Dataset extrema -> scale/bias. One scan, built-in min/max agg."""
    row = df.agg(
        F.min(F.array_min(vec_col)).cast("double").alias("gmin"),
        F.max(F.array_max(vec_col)).cast("double").alias("gmax"),
    ).collect()[0]
    if row["gmin"] is None:
        raise ValueError("empty dataset")
    return SQParams(gmin=float(row["gmin"]), gmax=float(row["gmax"]))


def compress_element(x: Column, params: SQParams) -> Column:
    """clamp(floor((x - bias)/scale + 0.5), -128, 127) as DOUBLE
    (integral values; cast to TINYINT at the storage boundary)."""
    t = (x.cast("double") - F.lit(params.bias)) / F.lit(params.scale)
    return F.greatest(F.lit(INT8_MIN), F.least(F.lit(INT8_MAX), F.floor(t + F.lit(0.5)).cast("double")))


def sq_compress(
    df: DataFrame, params: SQParams, vec_col: str = "vector", out_col: str = "qvector",
    storage: bool = False,
) -> DataFrame:
    """Add a compressed vector column. ``storage=True`` casts to
    ARRAY<TINYINT> (the persisted form); the default keeps DOUBLE for
    exact in-plan arithmetic."""
    comp = F.transform(F.col(vec_col), lambda x: compress_element(x, params))
    if storage:
        comp = F.transform(comp, lambda x: x.cast("tinyint"))
    return df.withColumn(out_col, comp)


def sq_decompress(
    df: DataFrame, params: SQParams, qvec_col: str = "qvector", out_col: str = "vector",
) -> DataFrame:
    """scale*q + bias per element (scalar.h:44-45)."""
    return df.withColumn(
        out_col,
        F.transform(
            F.col(qvec_col),
            lambda x: F.lit(params.scale) * x.cast("double") + F.lit(params.bias),
        ),
    )


def sq_knn(
    base: DataFrame,
    queries: DataFrame,
    params: SQParams,
    k: int,
    distance: str = "l2",
    id_col: str = "id",
    vec_col: str = "vector",
    qid_col: str = "qid",
    qvec_col: str | None = None,
    round_to: int | None = 4,
    base_compressed: bool = False,
) -> DataFrame:
    """k-NN over scalar-quantized storage with corrected distances.

    Returns (qid, rank, neighbor_id, distance) where distance is the
    CORRECTED value (scalar.h compute()): scale^2 * L2int for l2;
    scale*ip + bias*sum(q) for ip; full-precision cosine on decompressed
    data for cosine. Rankings equal the corrected-ranking in all cases.

    ``base_compressed=True``: ``base[vec_col]`` already holds
    compressed-domain values (e.g. the TINYINT table persisted by
    ``index_store.save_sq``) — the scan reads the 4x-smaller table
    directly instead of compressing floats in-plan, which is the point
    of SQ storage at 100 TB (scan bandwidth, not CPU).
    """
    from scalablevectorsearch_spark.operators.flat import flat_knn

    qvec_col = qvec_col or vec_col
    if base_compressed:
        cbase = base.select(
            F.col(id_col).alias("id"),
            F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("vector"),
        )
    else:
        cbase = sq_compress(base, params, vec_col, "__qv").select(
            F.col(id_col).alias("id"), F.col("__qv").alias("vector")
        )

    if distance == "l2":
        # compress the query too (EuclideanCompressed.fix_argument)
        cq = sq_compress(queries, params, qvec_col, "__qv").select(
            F.col(qid_col).alias("qid"), F.col("__qv").alias("vector")
        )
        res = flat_knn(cbase, cq, k=k, distance="l2", round_to=round_to)
        s = params.scale
        # integer-domain distance -> corrected; same left-assoc order as
        # the oracle: (d * scale) * scale
        return res.withColumn(
            "distance", F.col("distance") * F.lit(s) * F.lit(s)
        )
    if distance == "ip":
        # query stays full precision (InnerProductCompressed)
        q = queries.select(F.col(qid_col).alias("qid"), F.col(qvec_col).alias("vector"))
        res = flat_knn(cbase, q, k=k, distance="ip", round_to=round_to)
        qsum = q.select(
            "qid",
            F.aggregate(
                "vector", F.lit(0.0), lambda acc, x: acc + x.cast("double")
            ).alias("__qsum"),
        )
        return (
            res.join(F.broadcast(qsum), "qid")
            .withColumn(
                "distance",
                F.lit(params.scale) * F.col("distance") + F.lit(params.bias) * F.col("__qsum"),
            )
            .drop("__qsum")
        )
    if distance == "cosine":
        # decompress the datum, full-precision cosine (CosineCompressed)
        dbase = sq_decompress(cbase, params, "vector", "vector").select("id", "vector")
        q = queries.select(F.col(qid_col).alias("qid"), F.col(qvec_col).alias("vector"))
        return flat_knn(dbase, q, k=k, distance="cosine", round_to=round_to)
    raise ValueError(f"unknown distance {distance!r}")


# ------------------------------------------------- SQ inside Vamana
# The reference plugs the SQDataset into each index family via
# extension CPOs (include/svs/extensions/vamana/scalar.h — graph build
# and greedy search run the compressed distance kernels over SQ
# storage; include/svs/extensions/flat/scalar.h is our sq_knn,
# include/svs/extensions/ivf/scalar.h our SQ-domain ivf k_reorder
# path). Spark shape: compress once, build/search the SAME sharded
# Vamana operator over the compressed table — the index's persisted
# layout holds int8-domain vectors (4x scan bandwidth saved at 100 TB,
# the reference's stated SQ motivation), and the distance correction is
# a pure post-ranking column expression because ranking is invariant:
# l2's correction is a positive constant factor (scale^2), ip's a
# per-query constant offset (bias * sum(q)), cosine decompresses.


def sq_vamana_build(
    base: DataFrame,
    params: SQParams,
    vamana_params=None,
    n_shards: int = 8,
    distance: str = "l2",
    id_col: str = "id",
    vec_col: str = "vector",
    base_compressed: bool = False,
    **build_kw,
):
    """Build a Vamana graph over scalar-quantized storage.

    For ``l2``/``ip`` the graph is constructed IN the compressed domain
    (EuclideanCompressed / InnerProductCompressed semantics — the
    int-domain ranking equals the corrected ranking); for ``cosine``
    the datum is decompressed on the fly (CosineCompressed,
    scalar.h:155-195), so the graph sees the lossy reconstruction the
    search will see. Extra kwargs (shard_by/closure_bp/...) pass through
    to :func:`~scalablevectorsearch_spark.operators.vamana.vamana_build`
    — SQ composes with cluster sharding and closure replication.

    ``base_compressed=True``: ``base[vec_col]`` already holds
    compressed-domain values (the TINYINT table persisted by
    ``index_store.save_sq``) — build reads the 4x-smaller table
    directly, as :func:`sq_knn` does.
    """
    from scalablevectorsearch_spark.operators.vamana import vamana_build

    if distance not in ("l2", "ip", "cosine"):
        raise ValueError(f"unknown distance {distance!r}")
    if base_compressed:
        cbase = base.withColumn(
            "__sqv", F.transform(F.col(vec_col), lambda x: x.cast("double"))
        )
        if distance == "cosine":
            cbase = sq_decompress(cbase, params, "__sqv", "__sqv")
    elif distance in ("l2", "ip"):
        cbase = sq_compress(base, params, vec_col, "__sqv")
    elif distance == "cosine":
        cbase = sq_decompress(
            sq_compress(base, params, vec_col, "__cq"), params, "__cq", "__sqv"
        )
    else:
        raise ValueError(f"unknown distance {distance!r}")
    cbase = cbase.select(F.col(id_col), F.col("__sqv").alias(vec_col))
    idx = vamana_build(
        cbase, vamana_params, n_shards=n_shards, distance=distance,
        id_col=id_col, vec_col=vec_col, **build_kw,
    )
    idx.sq_params = params
    return idx


def sq_vamana_search(
    index,
    queries: DataFrame,
    k: int,
    qid_col: str = "qid",
    qvec_col: str = "vector",
    round_to: int | None = 4,
    **search_kw,
) -> DataFrame:
    """Graph search over an SQ-compressed Vamana index with corrected
    distance emission (identical to :func:`sq_knn`'s contract: with an
    exhaustive window the result EQUALS sq_knn's, which is the
    metamorphic gate). Routing kwargs (n_probes/epsilon_bp/router/...)
    pass through to ``vamana_search``."""
    from scalablevectorsearch_spark.operators.vamana import vamana_search

    params = index.sq_params
    if params is None:
        raise ValueError("index was not built with sq_vamana_build")
    distance = index.distance
    if distance == "l2":
        cq = sq_compress(queries, params, qvec_col, "__sqv").select(
            F.col(qid_col).alias("qid"), F.col("__sqv").alias(index.vec_col)
        )
        res = vamana_search(
            index, cq, k, qid_col="qid", qvec_col=index.vec_col,
            round_to=round_to, **search_kw,
        )
        s = params.scale
        # same left-assoc order as sq_knn and the oracle: (d*scale)*scale
        return res.withColumn("distance", F.col("distance") * F.lit(s) * F.lit(s))
    if distance == "ip":
        q = queries.select(
            F.col(qid_col).alias("qid"), F.col(qvec_col).alias(index.vec_col)
        )
        res = vamana_search(
            index, q, k, qid_col="qid", qvec_col=index.vec_col,
            round_to=round_to, **search_kw,
        )
        qsum = q.select(
            "qid",
            F.aggregate(
                index.vec_col, F.lit(0.0), lambda acc, x: acc + x.cast("double")
            ).alias("__qsum"),
        )
        return (
            res.join(F.broadcast(qsum), "qid")
            .withColumn(
                "distance",
                F.lit(params.scale) * F.col("distance")
                + F.lit(params.bias) * F.col("__qsum"),
            )
            .drop("__qsum")
        )
    if distance == "cosine":
        # layout already holds the decompressed (lossy) vectors
        q = queries.select(
            F.col(qid_col).alias("qid"), F.col(qvec_col).alias(index.vec_col)
        )
        return vamana_search(
            index, q, k, qid_col="qid", qvec_col=index.vec_col,
            round_to=round_to, **search_kw,
        )
    raise ValueError(f"unknown distance {distance!r}")
