"""Recall evaluation — k_recall_at_n.

Parity: /root/reference/include/svs/core/recall.h:48-97 (implementation),
:181 (public API), bindings/python/src/svs/common.py:266. Semantics:
``mean over queries of |top-k(result) ∩ top-n(groundtruth)| / k``.

Both inputs use the engine's exploded result layout
``(qid, rank, neighbor_id, ...)``. Pure built-in aggregation — one
shuffle on qid (broadcast if one side is small), then a scalar mean.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def k_recall_at(
    groundtruth: DataFrame,
    results: DataFrame,
    k: int,
    n: int | None = None,
    qid_col: str = "qid",
    id_col: str = "neighbor_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Returns a 1-row DataFrame ``(recall DOUBLE, n_queries BIGINT)``.

    Semantics match ``k_recall_at_n_impl_nocheck`` (recall.h:48-58):
    intersect the top-**k** of GROUNDTRUTH with the top-**n** of RESULTS,
    divided by k. Queries missing from either side are dropped by the
    inner join (the reference raises, recall.h:62-70); the drop is
    visible in the returned ``n_queries`` — callers needing the strict
    behavior should assert ``n_queries`` equals their query count.
    """
    n = n if n is not None else k
    gt = (
        groundtruth.filter(F.col(rank_col) <= k)
        .groupBy(F.col(qid_col).alias("qid"))
        .agg(F.collect_set(F.col(id_col)).alias("gt_ids"))
    )
    res = (
        results.filter(F.col(rank_col) <= n)
        .groupBy(F.col(qid_col).alias("qid"))
        .agg(F.collect_set(F.col(id_col)).alias("res_ids"))
    )
    per_query = gt.join(res, "qid", "inner").select(
        "qid",
        (F.size(F.array_intersect("gt_ids", "res_ids")) / F.lit(float(k))).alias("q_recall"),
    )
    return per_query.agg(
        F.avg("q_recall").alias("recall"), F.count("*").alias("n_queries")
    )
