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


def _presize_k_inner(labels: DataFrame, k: int, quantile: float = 0.99) -> int:
    """Inner-candidate k from a HIGH QUANTILE of per-label multiplicity,
    not the max: ``k * p99`` covers every query whose near field is made
    of typical labels, while one mega-label (a crawl with 1M
    near-identical vectors under one label) can no longer inflate every
    query's inner k toward n_base and degenerate the ANN search into an
    exhaustive scan. Labels above the quantile are exactly what the
    adaptive-doubling fallback in the callers is for — it only pays on
    the queries whose near field actually hits such a label.

    EXACT percentile (sort-based, deterministic — approx_percentile's
    result can vary with partition merge order and would leak
    nondeterminism into hash-compared gates) over the tiny per-label
    count table: one shuffle on #labels rows."""
    q = (
        labels.groupBy("label")
        .agg(F.count("*").alias("c"))
        .agg(F.expr(f"percentile(c, {quantile})").alias("q"))
        .collect()[0][0]
    )
    import math

    return max(4 * k, k * int(math.ceil(q or 1.0)))


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
        # pre-size from the p99 label multiplicity (one agg over the
        # small (id, label) projection): among k * p99 inner candidates
        # a typical near field yields >= k DISTINCT labels in ONE
        # search; the adaptive loop below remains the completeness
        # fallback for queries whose near field hits an above-quantile
        # mega-label (pre-sizing from the MAX would let one such label
        # inflate EVERY query's inner k toward n_base — see
        # _presize_k_inner).
        ki = _presize_k_inner(labels, k)
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


# ------------------------------------------------- dynamic multi-vector
# Parity: MultiMutableVamanaIndex (multi.h:155-260) — a mutable Vamana
# with a label <-> external-id translation layer: add_points() registers
# each new vector under its label, delete_entries(labels) removes EVERY
# vector carrying those labels, search dedupes by label. Spark shape:
# the translation table is a (id, label) DataFrame beside the
# DynamicVamana; mutations compose the gated add/delete operators.


from dataclasses import dataclass


@dataclass
class MultiDynamicVamana:
    """DynamicVamana + label translation (multi.h:173-175
    label_to_external_/external_to_label_ as one DataFrame)."""

    dyn: object            # operators.dynamic.DynamicVamana
    labels: DataFrame      # (id LONG, label LONG) — one row per vector


def multi_dynamic_vamana(index, labels: DataFrame,
                         id_col: str = "id", label_col: str = "label"
                         ) -> MultiDynamicVamana:
    """Wrap a built VamanaIndex with its label table. ``labels`` must
    cover every base id (the reference constructor takes point-aligned
    labels, multi.h:199-216)."""
    from scalablevectorsearch_spark.operators.dynamic import dynamic_vamana

    lab = labels.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(label_col).cast("long").alias("label"),
    )
    return MultiDynamicVamana(dyn=dynamic_vamana(index), labels=lab)


def multi_add_points(m: MultiDynamicVamana, points: DataFrame,
                     id_col: str = "id", vec_col: str = "vector",
                     label_col: str = "label") -> MultiDynamicVamana:
    """Add vectors under labels (multi.h:262-289 add_points + the
    id-by-label registration): new rows enter the graph via the gated
    incremental link and their (id, label) rows join the translation
    table. Ids must be fresh (validated by add_points); labels may be
    new or existing — an existing label gains another vector."""
    from scalablevectorsearch_spark.operators.dynamic import add_points

    dyn = add_points(m.dyn, points.select(id_col, vec_col))
    lab = m.labels.unionByName(
        points.select(
            F.col(id_col).cast("long").alias("id"),
            F.col(label_col).cast("long").alias("label"),
        )
    )
    return MultiDynamicVamana(dyn=dyn, labels=lab)


def multi_delete_labels(m: MultiDynamicVamana, labels) -> MultiDynamicVamana:
    """Delete EVERY vector carrying the given labels (multi.h:291-313
    delete_entries(labels) — erases each label's whole external-id
    vector). ``labels``: iterable of ints or a 1-column DataFrame.
    Raises if any requested label has no live vectors (the reference
    throws on unknown labels)."""
    from scalablevectorsearch_spark.operators.dynamic import delete_entries

    spark = m.labels.sparkSession
    if isinstance(labels, DataFrame):
        ldf = labels.select(F.col(labels.columns[0]).cast("long").alias("label"))
    else:
        ldf = spark.createDataFrame([(int(l),) for l in labels], "label long")
    ldf = ldf.distinct()
    n_req = ldf.count()
    present = m.labels.join(ldf, "label", "left_semi")
    n_labels = present.select(F.countDistinct("label")).collect()[0][0]
    if n_labels < n_req:
        raise ValueError(f"{n_req - n_labels} labels are unknown")
    ids = present.select("id")
    dyn = delete_entries(m.dyn, ids)
    lab = m.labels.join(ldf, "label", "left_anti")
    return MultiDynamicVamana(dyn=dyn, labels=lab)


def multi_dynamic_search(m: MultiDynamicVamana, queries: DataFrame, k: int,
                         k_inner: int | None = None,
                         qid_col: str = "qid", qvec_col: str = "vector",
                         round_to: int | None = 4, **search_kw) -> DataFrame:
    """Top-k distinct labels over the live (non-tombstoned) vectors —
    the MultiBatchIterator dedup running over the mutable index
    (multi.h:22-47 over :155). ``k_inner=None`` pre-sizes from the p99
    live label multiplicity like :func:`multivector_knn`, with the same
    adaptive doubling as the completeness fallback when a query's near
    field hits an above-quantile mega-label."""
    from scalablevectorsearch_spark.operators.dynamic import dynamic_search

    live_labels = m.labels
    n_live = live_labels.count()
    n_queries = queries.count()
    adaptive = k_inner is None
    if adaptive:
        k_inner = _presize_k_inner(live_labels, k)
    dist = m.dyn.index.distance
    while True:
        k_inner = min(k_inner, n_live)
        inner = dynamic_search(
            m.dyn, queries, k=k_inner,
            qid_col=qid_col, qvec_col=qvec_col, round_to=round_to, **search_kw,
        )
        out = dedupe_by_label(inner, live_labels, k=k, distance=dist)
        if not adaptive or k_inner >= n_live:
            return out
        short = (
            out.groupBy("qid").count().filter(F.col("count") < k).limit(1).count()
        )
        if short == 0 and out.select(F.countDistinct("qid")).collect()[0][0] == n_queries:
            return out
        k_inner *= 2


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
