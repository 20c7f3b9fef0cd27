"""Flat exact k-NN — the exhaustive scan operator and the oracle for
every approximate index.

Parity: FlatIndex search (/root/reference/include/svs/index/flat/flat.h:159,
:322 tiled scan, :421 cartesian distance microkernel, :209 tile sizing).

Spark plan (scale-first):
 - The query batch is driver-resident (Q x d), exactly as in the reference
   (queries arrive as one numpy array through the Python bindings,
   bindings/python/include/svs/python/manager.h:34-47). It is broadcast to
   executors; the BASE table — the 100 TB side — is never shuffled.
 - ``mapInPandas`` streams each base partition through a numpy float64
   distance kernel keeping a running per-query top-k (the reference's
   per-tile partial top-k, i.e. map-side partial aggregation). Each
   partition emits only Q x k candidate rows.
 - A final window top-k over Q x k x n_partitions rows merges partials —
   the shuffle moves O(Q·k·P) rows regardless of base size.
 - Large query sets are processed in driver-side chunks of
   ``query_chunk_size`` (bounded executor memory per chunk); chunk results
   union lazily into one plan.

Predicate-filtered search (flat.h:290-295): pass ``where`` — the filter is
applied to the base scan *before* the kernel, so Catalyst pushes it into
the Parquet scan (the reference evaluates its predicate per-row inside the
scan loop; pushdown is strictly better).

Determinism: float64 kernel, ties broken by ascending id (neighbor.h
id-ordered comparators); distances rounded to ``round_to`` decimals at the
output boundary so results hash-match a sequential-fold SQL oracle.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from scalablevectorsearch_spark.functions.distances import is_similarity, pairwise_distances
from scalablevectorsearch_spark.operators.topk import topk_per_group

RESULT_SCHEMA = "qid long, neighbor_id long, distance double"


def _partition_topk(
    qids: np.ndarray, Q: np.ndarray, distance: str, k: int
) -> "callable":
    """Build the mapInPandas function: per-partition streaming top-k."""
    maximize = is_similarity(distance)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        best_d: np.ndarray | None = None  # (Q, <=k) raw metric values
        best_i: np.ndarray | None = None
        nq = Q.shape[0]
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf["__id"].to_numpy(dtype=np.int64)
            B = np.stack(pdf["__vec"].to_numpy())
            D = pairwise_distances(Q, B, distance)  # (nq, n)
            idmat = np.broadcast_to(ids, D.shape)
            if best_d is not None:
                D = np.concatenate([best_d, D], axis=1)
                idmat = np.concatenate([best_i, np.broadcast_to(ids, (nq, len(ids)))], axis=1)
            # keep k plus a tie pad: argpartition's boundary selection is
            # arbitrary among exactly-equal distances; the pad lets the
            # final global window apply the id tie-break exactly (only
            # degenerate data has >16 duplicates at the k-th distance)
            kk = min(k + 16, D.shape[1])
            key = -D if maximize else D
            # partial select then exact (key, id) sort of the survivors
            if D.shape[1] > kk:
                part = np.argpartition(key, kk - 1, axis=1)[:, :kk]
                sel_key = np.take_along_axis(key, part, axis=1)
                sel_ids = np.take_along_axis(np.ascontiguousarray(idmat), part, axis=1)
            else:
                sel_key = key
                sel_ids = np.ascontiguousarray(idmat)
            order = np.lexsort((sel_ids, sel_key), axis=1)
            sel_key = np.take_along_axis(sel_key, order, axis=1)
            sel_ids = np.take_along_axis(sel_ids, order, axis=1)
            best_d = -sel_key if maximize else sel_key
            best_i = sel_ids
        if best_d is None:
            return
        nq, kk = best_d.shape
        yield pd.DataFrame(
            {
                "qid": np.repeat(qids, kk),
                "neighbor_id": best_i.reshape(-1),
                "distance": best_d.reshape(-1),
            }
        )

    return fn


def flat_knn(
    base: DataFrame,
    queries: DataFrame,
    k: int,
    distance: str = "l2",
    id_col: str = "id",
    vec_col: str = "vector",
    qid_col: str = "qid",
    qvec_col: str | None = None,
    where: Column | str | None = None,
    round_to: int | None = 4,
    query_chunk_size: int = 8192,
) -> DataFrame:
    """Exact k-NN of every query against the base table.

    Returns ``(qid BIGINT, rank BIGINT, neighbor_id BIGINT,
    distance DOUBLE)`` with rank 1 = best (nearest for l2, highest for
    ip/cosine), ties broken by ascending neighbor id.
    """
    qvec_col = qvec_col or vec_col
    if where is not None:
        base = base.filter(where)
    scan = base.select(F.col(id_col).cast("long").alias("__id"), F.col(vec_col).alias("__vec"))

    qp = queries.select(
        F.col(qid_col).cast("long").alias("qid"), F.col(qvec_col).alias("qv")
    ).toPandas()
    if len(qp) == 0:
        raise ValueError("empty query batch")
    all_qids = qp["qid"].to_numpy(dtype=np.int64)
    all_Q = np.stack(qp["qv"].to_numpy()).astype(np.float64)

    n_chunks = max(1, math.ceil(len(all_qids) / query_chunk_size))
    partials: list[DataFrame] = []
    for c in range(n_chunks):
        sl = slice(c * query_chunk_size, (c + 1) * query_chunk_size)
        fn = _partition_topk(all_qids[sl], all_Q[sl], distance, k)
        partials.append(scan.mapInPandas(fn, RESULT_SCHEMA))
    cand = partials[0]
    for p in partials[1:]:
        cand = cand.unionAll(p)

    out = topk_per_group(
        cand,
        group_col="qid",
        order_col="distance",
        k=k,
        ascending=not is_similarity(distance),
        tie_col="neighbor_id",
    )
    dist = F.round(F.col("distance"), round_to) if round_to is not None else F.col("distance")
    return out.select("qid", "rank", "neighbor_id", dist.alias("distance"))
