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


def multivector_knn(
    base: DataFrame,
    queries: DataFrame,
    k: int,
    distance: str = "l2",
    id_col: str = "id",
    vec_col: str = "vector",
    label_col: str = "label",
    qid_col: str = "qid",
    k_inner: int | None = None,
    round_to: int | None = 4,
    search_fn=None,
) -> DataFrame:
    """Top-k distinct LABELS per query, like the reference's
    MultiBatchIterator (multi.h:22-47): it keeps iterating until k
    distinct labels are found — here the inner candidate k doubles until
    every query has >= k labels or the whole base has been considered.
    ``dedupe_by_label`` alone is the single-pass kernel whose
    completeness depends on the caller's k_inner bound; this wrapper
    removes that contract from the caller.

    ``search_fn``: optional inner-candidate engine — a callable
    ``(queries_df, k_inner) -> (qid, rank, neighbor_id, distance)``
    closing over a prebuilt index (the reference's multi-vector search
    runs INSIDE the Vamana index, multi.h); default = exact flat scan
    of ``base``."""
    from scalablevectorsearch_spark.operators.flat import flat_knn

    labels = base.select(F.col(id_col).alias("id"), F.col(label_col).alias("label"))
    n_base = base.count()
    n_queries = queries.count()
    if k_inner is None:
        # pre-size from the label multiplicity (one agg over the small
        # (id, label) projection): among any k * max_multiplicity inner
        # candidates each label contributes at most max_multiplicity
        # rows, so >= k DISTINCT labels are guaranteed — the adaptive
        # loop below then converges in ONE search on any distribution,
        # including the skewed ones that previously forced log(n)
        # full-search retries (each retry = a complete scan + 2 driver
        # actions). The loop stays as a belt-and-braces fallback only.
        max_mult = labels.groupBy("label").agg(
            F.count("*").alias("c")
        ).agg(F.max("c")).collect()[0][0] or 1
        ki = max(4 * k, k * int(max_mult))
    else:
        ki = k_inner
    while True:
        ki = min(ki, n_base)
        if search_fn is not None:
            inner = search_fn(queries, ki)
        else:
            inner = flat_knn(
                base, queries, k=ki, distance=distance, id_col=id_col,
                vec_col=vec_col, qid_col=qid_col, round_to=round_to,
            )
        out = dedupe_by_label(inner, labels, k=k, distance=distance)
        if ki >= n_base:
            return out
        short = (
            out.groupBy("qid").count().filter(F.col("count") < k).limit(1).count()
        )
        if short == 0 and out.select(F.countDistinct("qid")).collect()[0][0] == n_queries:
            return out
        ki *= 2


def multivector_batch_iterator(
    base: DataFrame,
    queries: DataFrame,
    schedule,
    distance: str = "l2",
    id_col: str = "id",
    vec_col: str = "vector",
    label_col: str = "label",
    qid_col: str = "qid",
    round_to: int | None = 4,
):
    """MultiBatchIterator (multi.h:22-47): paged retrieval of DISTINCT
    labels, nearest-first — the composition of the multi-vector dedup
    with the batch iterator. Each page's search re-runs the
    label-deduped ranking with the cumulative label count (the inner
    candidate k self-inflates inside :func:`multivector_knn` until
    every query holds enough distinct labels), and the page slices the
    deterministic label-rank range — so pages are label-disjoint per
    query and their concatenation equals the one-shot top-k ranking.
    ``update()`` restarts paging (iterator.h:174-178)."""
    from scalablevectorsearch_spark.operators.iterator import BatchIterator

    def search_fn(k: int, window: int) -> DataFrame:
        return multivector_knn(
            base, queries, k=k, distance=distance, id_col=id_col,
            vec_col=vec_col, label_col=label_col, qid_col=qid_col,
            k_inner=max(window, 4 * k), round_to=round_to,
        )

    return BatchIterator(search_fn=search_fn, schedule=schedule)


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
