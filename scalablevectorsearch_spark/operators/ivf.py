"""IVF (inverted-file) index — k-means clustered layout + n_probes search.

Parity: /root/reference/include/svs/index/ivf/index.h:77-111 (two-level
search), /root/reference/include/svs/index/ivf/common.h:151-166
(IVFSearchParameters: n_probes_, k_reorder_),
/root/reference/include/svs/index/ivf/kmeans.h:47-123 (build).

Spark plan (scale-first):
 - BUILD: k-means (operators.kmeans, one scan per Lloyd iteration) then
   ONE more scan stamping every base row with its cluster_id — the base
   is never shuffled. For persistent layouts, ``save_clustered`` writes
   the stamped table partitioned by a bounded ``cluster_bucket`` so a
   search's probed-cluster filter becomes Parquet partition pruning.
 - SEARCH: centroid argmin runs driver-side on the broadcast-small
   centroid table (Q x k_clusters), exactly the reference's outer level;
   the probed (cluster -> queries) map ships with the query matrix in one
   broadcast. A single ``mapInPandas`` pass scans only rows whose
   cluster_id was probed by someone (`isin` filter -> pushdown/pruning),
   computes distances cluster-by-cluster against just the probing
   queries, and keeps per-partition running top-k — the same
   O(Q·k·P)-row merge shuffle as the flat operator. n_probes bounds the
   scanned fraction to ~n_probes/n_clusters of the base.
 - k_reorder (common.h:156): optional second stage re-ranking the top
   k_reorder approximate candidates with exact full-precision distances
   (meaningful over quantized storage — see operators.sq).

Determinism: clusters from operators.kmeans's oracle protocol; probe
ranking and result ranking both on the e4 key floor(d*1e4+0.5) with
cluster-id / neighbor-id tie-breaks — reproduced verbatim by the DuckDB
oracle (oracles.ivf_knn_sql).
"""

from __future__ import annotations

import math
from collections.abc import Iterator
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, StructField, StructType

from scalablevectorsearch_spark.functions.distances import is_similarity, pairwise_distances
from scalablevectorsearch_spark.operators.flat import RESULT_SCHEMA, _ID_SENTINEL, _merge_topk
from scalablevectorsearch_spark.operators.kmeans import KMeansModel, train_kmeans
from scalablevectorsearch_spark.operators.topk import topk_per_group


@dataclass
class IVFIndex:
    """clustered = base columns + cluster_id INT; model = trained k-means."""

    clustered: DataFrame
    model: KMeansModel
    id_col: str = "id"
    vec_col: str = "vector"

    @property
    def n_clusters(self) -> int:
        return self.model.centroids.shape[0]


def ivf_build(
    base: DataFrame,
    n_clusters: int,
    n_iters: int = 2,
    id_col: str = "id",
    vec_col: str = "vector",
) -> IVFIndex:
    """Train k-means and stamp each row with its cluster id (one extra
    scan, no shuffle — the stamp is computed in the map side)."""
    model = train_kmeans(base, n_clusters, n_iters, id_col, vec_col)
    sc = base.sparkSession.sparkContext
    bc = sc.broadcast(model.centroids)

    def stamp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from scalablevectorsearch_spark.operators.kmeans import _nearest_centroid

        C = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            pdf = pdf.copy()
            pdf["cluster_id"] = _nearest_centroid(V, C)
            yield pdf

    # StructType.add mutates in place — never mutate df.schema (it is the
    # DataFrame's cached schema object); build a fresh copy instead
    schema = StructType(list(base.schema.fields) + [StructField("cluster_id", IntegerType())])
    clustered = base.mapInPandas(stamp, schema)
    return IVFIndex(clustered=clustered, model=model, id_col=id_col, vec_col=vec_col)


def probe_clusters(
    Q: np.ndarray, centroids: np.ndarray, n_probes: int, distance: str = "l2"
) -> np.ndarray:
    """(nq, n_probes) probed cluster ids, ranked by e4-rounded centroid
    distance with ascending-cluster-id tie-break (the oracle's ORDER BY).

    Driver-side: centroids are the small side. For very large Q this same
    kernel runs distributed (map the queries table with broadcast
    centroids); the gate contract keeps queries driver-resident like the
    reference's numpy query batches."""
    D = pairwise_distances(Q, centroids, distance)
    key = np.floor(D * 1e4 + 0.5).astype(np.int64)
    if is_similarity(distance):
        key = -key
    cids = np.broadcast_to(np.arange(centroids.shape[0], dtype=np.int64), key.shape)
    order = np.lexsort((cids, key), axis=1)[:, :n_probes]
    return order.astype(np.int32)


def _ivf_kernel(bc, distance: str, k: int, round_to: int | None):
    scale = None if round_to is None else float(10**round_to)
    maximize = is_similarity(distance)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        qids, Q, probe_of = bc.value  # probe_of: dict cluster_id -> query positions
        nqt = Q.shape[0]
        if scale is None:
            best_key = np.full((nqt, k), np.inf, dtype=np.float64)
        else:
            best_key = np.full((nqt, k), np.iinfo(np.int64).max, dtype=np.int64)
        best_id = np.full((nqt, k), _ID_SENTINEL, dtype=np.int64)
        seen = False
        for pdf in batches:
            if len(pdf) == 0:
                continue
            seen = True
            ids = pdf["__id"].to_numpy(dtype=np.int64)
            cl = pdf["__cid"].to_numpy(dtype=np.int64)
            V = np.stack(pdf["__vec"].to_numpy())
            for cid in np.unique(cl):
                qidx = probe_of.get(int(cid))
                if qidx is None:
                    continue
                rows = cl == cid
                B = V[rows]
                bid = ids[rows]
                D = pairwise_distances(Q[qidx], B, distance)
                if scale is not None:
                    key = np.floor(D * scale + 0.5).astype(np.int64)
                else:
                    key = D
                if maximize:
                    key = -key
                idmat = np.broadcast_to(bid, key.shape).astype(np.int64, copy=False)
                bk, bi = _merge_topk(best_key[qidx], best_id[qidx], key, idmat, k)
                best_key[qidx], best_id[qidx] = bk, bi
        if not seen:
            return
        mask = best_id.reshape(-1) != _ID_SENTINEL
        key_flat = best_key.reshape(-1).astype(np.float64)
        if maximize:
            key_flat = -key_flat
        dist = key_flat if scale is None else key_flat / scale
        yield pd.DataFrame(
            {
                "qid": np.repeat(qids, k)[mask],
                "neighbor_id": best_id.reshape(-1)[mask],
                "distance": dist[mask],
            }
        )

    return fn


def ivf_search(
    index: IVFIndex,
    queries: DataFrame,
    k: int,
    n_probes: int = 8,
    distance: str = "l2",
    qid_col: str = "qid",
    qvec_col: str | None = None,
    round_to: int | None = 4,
) -> DataFrame:
    """Approximate k-NN probing the n_probes nearest clusters per query.

    Returns (qid, rank, neighbor_id, distance) like flat_knn; recall < 1
    exactly when true neighbors live outside probed clusters."""
    qvec_col = qvec_col or index.vec_col
    qp = queries.select(
        F.col(qid_col).cast("long").alias("qid"), F.col(qvec_col).alias("qv")
    ).toPandas()
    if len(qp) == 0:
        raise ValueError("empty query batch")
    qids = qp["qid"].to_numpy(dtype=np.int64)
    Q = np.stack(qp["qv"].to_numpy()).astype(np.float64)

    n_probes = min(n_probes, index.n_clusters)
    probes = probe_clusters(Q, index.model.centroids, n_probes, distance)
    probe_of: dict[int, np.ndarray] = {}
    for c in np.unique(probes):
        probe_of[int(c)] = np.nonzero((probes == c).any(axis=1))[0]

    probed_union = [int(c) for c in sorted(probe_of)]
    scan = (
        index.clustered
        # probed-cluster filter FIRST: becomes partition pruning on a
        # cluster-partitioned layout, row-group skipping otherwise
        .filter(F.col("cluster_id").isin(probed_union))
        .select(
            F.col(index.id_col).cast("long").alias("__id"),
            F.col(index.vec_col).alias("__vec"),
            F.col("cluster_id").alias("__cid"),
        )
    )

    sc = queries.sparkSession.sparkContext
    bc = sc.broadcast((qids, Q, probe_of))
    cand = scan.mapInPandas(_ivf_kernel(bc, distance, k, round_to), RESULT_SCHEMA)
    out = topk_per_group(
        cand,
        group_col="qid",
        order_col="distance",
        k=k,
        ascending=not is_similarity(distance),
        tie_col="neighbor_id",
    )
    return out.select("qid", "rank", "neighbor_id", "distance")


def save_clustered(index: IVFIndex, path: str, n_buckets: int = 256) -> None:
    """Persist the clustered layout partitioned by a bounded bucket of
    cluster_id, so probed-cluster filters prune whole partitions at scale
    (32k clusters -> 256 dirs, not 32k)."""
    (
        index.clustered.withColumn(
            "cluster_bucket", F.pmod(F.col("cluster_id"), F.lit(n_buckets))
        )
        .repartition("cluster_bucket")
        .write.mode("overwrite")
        .partitionBy("cluster_bucket")
        .parquet(path)
    )
