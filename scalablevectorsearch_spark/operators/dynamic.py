"""Dynamic index operators — add_points, lazy tombstone deletes,
consolidate, compact.

Parity: /root/reference/include/svs/index/vamana/dynamic_index.h —
:631-700 (add_points: id validation, slot assignment, search+prune link),
:617-630/:747 (delete_entries = lazy tombstone; deleted ids excluded
from results immediately, physically removed at consolidate),
:950-970 + consolidate.h:357 (consolidate: remove deleted vertices,
repair adjacency), :791-810 + core/compact.h (compact: id defrag);
include/svs/index/flat/dynamic_flat.h:65 (Dynamic Flat is the same
mutation surface with no graph).

Spark shape (bulk-synchronous, scale-first):
 - The mutation log is DATA: ``tombstones`` is a tiny id DataFrame,
   additions are ordinary rows. Search-time filtering is an anti-join
   (Flat) or a broadcast skip-set (Vamana) — the 100 TB base is never
   rewritten per mutation, exactly the reference's lazy-delete design.
 - ``add_points`` re-links only the touched shards: the reference
   inserts one point by searching+pruning within the whole single-node
   graph; sharded, the unit of incremental work is the shard, so an
   insert batch triggers an applyInPandas rebuild of just the shards
   that received rows (untouched shards' adjacency is reused verbatim).
 - ``consolidate`` = filter tombstoned rows + rebuild the shards that
   contained them (graph repair-through-deleted-neighborhoods collapses
   to a shard-local rebuild in the bulk model); ``compact`` = dense id
   remap via ``row_number`` + adjacency remap join.
"""

from __future__ import annotations

from dataclasses import dataclass, replace

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from scalablevectorsearch_spark.operators.flat import flat_knn
from scalablevectorsearch_spark.operators.vamana import (
    VamanaIndex,
    vamana_build,
    vamana_search,
)


# ------------------------------------------------------------ dynamic flat


def dynamic_flat_knn(
    base: DataFrame,
    queries: DataFrame,
    k: int,
    added: DataFrame | None = None,
    deleted_ids: DataFrame | None = None,
    distance: str = "l2",
    id_col: str = "id",
    **kwargs,
) -> DataFrame:
    """Exact k-NN over (base + added - deleted) — dynamic_flat.h:65.
    Deletes are an anti-join (never a base rewrite); additions union in."""
    cur = base
    if added is not None:
        cur = cur.unionByName(added.select(*base.columns))
    if deleted_ids is not None:
        cur = cur.join(
            F.broadcast(deleted_ids.select(F.col(id_col).cast("long").alias(id_col))),
            id_col,
            "left_anti",
        )
    return flat_knn(cur, queries, k=k, distance=distance, id_col=id_col, **kwargs)


# ------------------------------------------------------------ dynamic ivf


@dataclass
class DynamicIVF:
    """An IVF index + mutation state (dynamic_ivf.h / dynamic_ivf.cpp
    parity): additions are stamped into their nearest existing cluster
    (append — no retrain), deletes are tombstones, and ``recluster``
    is the full-retrain maintenance job for when the clustering has
    drifted."""

    index: "IVFIndex"
    tombstones: DataFrame


def dynamic_ivf(index) -> DynamicIVF:
    spark = index.clustered.sparkSession
    return DynamicIVF(index=index, tombstones=spark.createDataFrame([], "id long"))


def ivf_add_points(dyn: DynamicIVF, new_rows: DataFrame) -> DynamicIVF:
    """Stamp new rows with their nearest EXISTING centroid and append —
    the cluster layout absorbs inserts without retraining (the
    reference's dynamic IVF append path). Raises on live-id collision."""
    from dataclasses import replace as _replace

    from scalablevectorsearch_spark.operators.ivf import IVFIndex  # noqa: F401

    idx = dyn.index
    id_col, vec_col = idx.id_col, idx.vec_col
    live = idx.clustered.select(id_col).join(
        dyn.tombstones.select(F.col("id").alias(id_col)), id_col, "left_anti"
    )
    n_dup = new_rows.join(live, id_col, "left_semi").count()
    if n_dup:
        raise ValueError(f"{n_dup} ids already exist in the index")

    sc = new_rows.sparkSession.sparkContext
    bc = sc.broadcast(idx.model.centroids)
    cols = [c for c in idx.clustered.columns if c != "cluster_id"]

    def stamp(batches):
        import numpy as np
        import pandas as pd

        from scalablevectorsearch_spark.operators.kmeans import _nearest_centroid

        C = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            pdf = pdf.copy()
            pdf["cluster_id"] = _nearest_centroid(V, C)
            yield pdf

    stamped = new_rows.select(*cols).mapInPandas(
        stamp, idx.clustered.schema
    )
    return DynamicIVF(
        index=_replace(idx, clustered=idx.clustered.unionByName(stamped)),
        tombstones=dyn.tombstones,
    )


def ivf_delete_entries(dyn: DynamicIVF, ids: DataFrame) -> DynamicIVF:
    idx = dyn.index
    ids = ids.select(F.col(idx.id_col).cast("long").alias("id")).distinct()
    live = idx.clustered.select(F.col(idx.id_col).cast("long").alias("id")).join(
        dyn.tombstones, "id", "left_anti"
    )
    unknown = ids.join(live, "id", "left_anti").count()
    if unknown:
        raise ValueError(f"{unknown} ids are unknown or already deleted")
    return DynamicIVF(index=idx, tombstones=dyn.tombstones.unionByName(ids).distinct())


def ivf_dynamic_search(dyn: DynamicIVF, queries: DataFrame, k: int, **kw) -> DataFrame:
    """Search over (clustered + appended - tombstoned)."""
    from dataclasses import replace as _replace

    from scalablevectorsearch_spark.operators.ivf import ivf_search

    idx = dyn.index
    tomb = dyn.tombstones.select(F.col("id").alias(idx.id_col))
    cur = idx.clustered.join(F.broadcast(tomb), idx.id_col, "left_anti")
    return ivf_search(_replace(idx, clustered=cur), queries, k=k, **kw)


def ivf_recluster(dyn: DynamicIVF, n_clusters: int | None = None, n_iters: int = 2) -> DynamicIVF:
    """Full retrain over the live rows — the maintenance job for drifted
    clusterings (skew from appends)."""
    from scalablevectorsearch_spark.operators.ivf import ivf_build

    idx = dyn.index
    tomb = dyn.tombstones.select(F.col("id").alias(idx.id_col))
    live = idx.clustered.drop("cluster_id").join(F.broadcast(tomb), idx.id_col, "left_anti")
    k = n_clusters or idx.n_clusters
    rebuilt = ivf_build(live, k, n_iters, idx.id_col, idx.vec_col)
    rebuilt.clustered.cache().count()
    spark = live.sparkSession
    return DynamicIVF(index=rebuilt, tombstones=spark.createDataFrame([], "id long"))


# ------------------------------------------------------------ dynamic vamana


@dataclass
class DynamicVamana:
    """A Vamana index + a tombstone set (lazy deletes)."""

    index: VamanaIndex
    tombstones: DataFrame  # (id BIGINT)

    @property
    def spark(self):
        return self.index.base.sparkSession

    def n_tombstones(self) -> int:
        return self.tombstones.count()


def dynamic_vamana(index: VamanaIndex) -> DynamicVamana:
    if index.shard_model is not None:
        raise ValueError(
            "dynamic mutations require a hash-sharded index (shard_by='hash'); "
            "cluster-sharded layouts re-cluster via a rebuild job instead"
        )
    spark = index.base.sparkSession
    empty = spark.createDataFrame([], "id long")
    return DynamicVamana(index=index, tombstones=empty)


def _touched_shards(ids_df: DataFrame, id_col: str, n_shards: int) -> list[int]:
    rows = (
        ids_df.select(
            F.pmod(F.col(id_col).cast("long"), F.lit(n_shards)).cast("int").alias("s")
        )
        .distinct()
        .collect()
    )
    return sorted(r["s"] for r in rows)


def add_points(dyn: DynamicVamana, new_rows: DataFrame) -> DynamicVamana:
    """Insert rows; raises on id collision with live rows
    (dynamic_index.h:640-656 id validation). Rebuilds only the shards
    that received new points."""
    idx = dyn.index
    id_col, vec_col = idx.id_col, idx.vec_col
    new_rows = new_rows.select(
        F.col(id_col).cast("long").alias(id_col), F.col(vec_col).alias(vec_col)
    )
    live = idx.base.select(id_col).join(dyn.tombstones, id_col, "left_anti")
    n_dup = new_rows.join(live, id_col, "left_semi").count()
    if n_dup:
        raise ValueError(f"{n_dup} ids already exist in the index")
    # reinserting a tombstoned id revives the slot: drop its tombstone
    # and its stale base row (reuse_empty semantics, dynamic_index.h:631)
    revived = new_rows.join(dyn.tombstones, id_col, "left_semi").select(id_col)
    base = idx.base.select(id_col, vec_col).join(revived, id_col, "left_anti").unionByName(
        new_rows
    )
    tomb = dyn.tombstones.join(revived, "id", "left_anti")

    touched = _touched_shards(new_rows, id_col, idx.n_shards)
    rebuilt = vamana_build(
        base.withColumn(
            "__s", F.pmod(F.col(id_col).cast("long"), F.lit(idx.n_shards)).cast("int")
        )
        .filter(F.col("__s").isin(touched))
        .drop("__s"),
        idx.params,
        n_shards=idx.n_shards,
        distance=idx.distance,
        id_col=id_col,
        vec_col=vec_col,
    ).graph
    graph = idx.graph.filter(~F.col("shard_id").isin(touched)).unionByName(rebuilt)
    # materialize: the reference applies adjacency updates in place
    # (graph_.replace_node); caching is the Spark analog — without it the
    # shard rebuild re-executes inside every downstream search DAG
    graph = graph.cache()
    graph.count()
    return DynamicVamana(index=replace(idx, base=base, graph=graph), tombstones=tomb)


def delete_entries(dyn: DynamicVamana, ids: DataFrame) -> DynamicVamana:
    """Lazy tombstone (dynamic_index.h:747): ids vanish from results
    immediately, stay in the graph until consolidate. Raises on unknown
    or already-deleted ids (:617-630)."""
    idx = dyn.index
    ids = ids.select(F.col(idx.id_col).cast("long").alias("id")).distinct()
    live = idx.base.select(F.col(idx.id_col).cast("long").alias("id")).join(
        dyn.tombstones, "id", "left_anti"
    )
    unknown = ids.join(live, "id", "left_anti").count()  # one validation job
    if unknown:
        raise ValueError(f"{unknown} ids are unknown or already deleted")
    return DynamicVamana(index=idx, tombstones=dyn.tombstones.unionByName(ids).distinct())


def dynamic_search(
    dyn: DynamicVamana, queries: DataFrame, k: int, search_window_size: int | None = None, **kw
) -> DataFrame:
    """Search skipping tombstoned ids (traversed, never returned)."""
    excl = [r["id"] for r in dyn.tombstones.collect()]
    return vamana_search(
        dyn.index, queries, k=k, search_window_size=search_window_size,
        exclude_ids=excl or None, **kw,
    )


def consolidate(dyn: DynamicVamana) -> DynamicVamana:
    """Physically remove tombstones and repair the affected shards'
    graphs (consolidate.h:357; shard rebuild = repair in the bulk
    model). Untouched shards are reused verbatim."""
    idx = dyn.index
    if dyn.tombstones.limit(1).count() == 0:
        return dyn
    touched = _touched_shards(dyn.tombstones, "id", idx.n_shards)
    tomb = dyn.tombstones.select(F.col("id").alias(idx.id_col))
    base = idx.base.join(F.broadcast(tomb), idx.id_col, "left_anti")
    rebuilt = vamana_build(
        base.withColumn(
            "__s", F.pmod(F.col(idx.id_col).cast("long"), F.lit(idx.n_shards)).cast("int")
        )
        .filter(F.col("__s").isin(touched))
        .drop("__s"),
        idx.params,
        n_shards=idx.n_shards,
        distance=idx.distance,
        id_col=idx.id_col,
        vec_col=idx.vec_col,
    ).graph
    graph = idx.graph.filter(~F.col("shard_id").isin(touched)).unionByName(rebuilt)
    graph = graph.cache()  # in-place-update analog, see add_points
    graph.count()
    spark = idx.base.sparkSession
    empty = spark.createDataFrame([], "id long")
    return DynamicVamana(index=replace(idx, base=base, graph=graph), tombstones=empty)


def compact(base: DataFrame, graph: DataFrame, id_col: str = "id") -> tuple[DataFrame, DataFrame, DataFrame]:
    """Dense id remap (compact.h / dynamic_index.h:791-810): new ids are
    row_number over ascending old id. Returns (base', graph', mapping)
    where mapping = (old_id, new_id)."""
    w = Window.orderBy(F.col("old_id").asc())
    mapping = base.select(F.col(id_col).cast("long").alias("old_id")).withColumn(
        "new_id", F.row_number().over(w).cast("long") - 1
    )
    new_base = (
        base.join(mapping, base[id_col] == mapping["old_id"])
        .drop(id_col, "old_id")
        .withColumnRenamed("new_id", id_col)
    )
    m = F.broadcast(mapping)
    exploded = graph.select(
        "shard_id", "src", "is_entry", F.explode_outer("neighbors").alias("nbr")
    )
    remapped = (
        exploded.join(m, exploded["nbr"] == mapping["old_id"], "left")
        .groupBy("shard_id", "src", "is_entry")
        .agg(F.sort_array(F.collect_list("new_id")).alias("neighbors"))
    )
    new_graph = (
        remapped.join(m.withColumnRenamed("new_id", "src_new"), remapped["src"] == F.col("old_id"))
        .select(
            "shard_id",
            F.col("src_new").alias("src"),
            "neighbors",
            "is_entry",
        )
    )
    return new_base, new_graph, mapping
