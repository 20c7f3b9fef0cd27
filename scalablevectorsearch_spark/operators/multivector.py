"""Multi-vector search — many vectors per external label, results deduped
by label keeping the nearest representative.

Parity: /root/reference/include/svs/index/vamana/multi.h:22-47
(MultiBatchIterator dedupes by label, nearest-first).

Spark plan: run any inner k-NN with an inflated candidate k, then one
window per (qid, label) keeps the best vector per label, then re-rank to
the top-k labels. Both windows partition on qid — a single shuffle
reused across the two rankings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from scalablevectorsearch_spark.functions.distances import is_similarity


def dedupe_by_label(
    results: DataFrame,
    labels: DataFrame,
    k: int,
    distance: str = "l2",
    id_col: str = "id",
    label_col: str = "label",
) -> DataFrame:
    """results: (qid, rank, neighbor_id, distance) from an inner search with
    k_inner >= k * max_vectors_per_label; labels: (id, label).
    Returns (qid, rank, label, neighbor_id, distance) — top-k labels."""
    asc = not is_similarity(distance)
    order = [
        F.col("distance").asc() if asc else F.col("distance").desc(),
        F.col("neighbor_id").asc(),
    ]
    joined = results.join(
        F.broadcast(labels.select(F.col(id_col).alias("neighbor_id"), F.col(label_col).alias("label"))),
        "neighbor_id",
    )
    per_label = Window.partitionBy("qid", "label").orderBy(*order)
    best = (
        joined.withColumn("__r", F.row_number().over(per_label))
        .filter(F.col("__r") == 1)
        .drop("__r", "rank")
    )
    final = Window.partitionBy("qid").orderBy(*order)
    return (
        best.withColumn("rank", F.row_number().over(final).cast("long"))
        .filter(F.col("rank") <= k)
        .select("qid", "rank", "label", "neighbor_id", "distance")
    )
