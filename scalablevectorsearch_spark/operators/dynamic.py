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
 - The Vamana tombstone set is DRIVER-RESIDENT (exact parity: the
   reference keeps deleted slots in an in-memory set,
   dynamic_index.h:617-630 ``status_ == SlotMetadata::Deleted``) —
   between consolidations it is bounded and small by design, so
   membership checks are pure driver work and search-time exclusion is
   a broadcast skip-set. The 100 TB base is NEVER shuffled by a
   mutation: validations are pushed-down ``isin`` filters or broadcast
   semi-joins, additions are a union, deletes are a filter.
 - ``add_points`` links new points INCREMENTALLY into the touched
   shards' existing graphs (greedy search + alpha-prune + reverse
   edges, dynamic_index.h:631-700) via a cogroup of the persisted
   layout with the adjacency — per-batch cost O(batch), independent of
   shard size; untouched shards' adjacency is reused verbatim.
 - ``consolidate`` = filter tombstoned rows + rebuild the shards that
   contained them (graph repair-through-deleted-neighborhoods collapses
   to a shard-local rebuild in the bulk model); ``compact`` = dense id
   remap via ``row_number`` + adjacency remap join.
"""

from __future__ import annotations

import threading
from dataclasses import dataclass, field, replace

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from scalablevectorsearch_spark.operators.flat import flat_knn
from scalablevectorsearch_spark.operators.vamana import (
    VamanaIndex,
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
        F.broadcast(dyn.tombstones.select(F.col("id").alias(id_col))),
        id_col,
        "left_anti",
    )
    # broadcast the (small) insert batch so the clustered base never
    # shuffles for the collision check
    n_dup = live.join(
        F.broadcast(new_rows.select(id_col)), id_col, "left_semi"
    ).count()
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
        # fresh cal_cache: cached calibration groundtruth belongs to the
        # pre-insert clustered base
        index=_replace(
            idx, clustered=idx.clustered.unionByName(stamped), cal_cache={}
        ),
        tombstones=dyn.tombstones,
    )


def ivf_delete_entries(dyn: DynamicIVF, ids: DataFrame) -> DynamicIVF:
    idx = dyn.index
    ids = ids.select(F.col(idx.id_col).cast("long").alias("id")).distinct()
    live = idx.clustered.select(F.col(idx.id_col).cast("long").alias("id")).join(
        F.broadcast(dyn.tombstones), "id", "left_anti"
    )
    # flip the membership check so the big side probes a broadcast of
    # the (small) delete batch: unknown = |ids| - |ids ∩ live|
    n_ids = ids.count()
    matched = live.join(F.broadcast(ids), "id", "left_semi").count()
    if matched < n_ids:
        raise ValueError(f"{n_ids - matched} ids are unknown or already deleted")
    return DynamicIVF(index=idx, tombstones=dyn.tombstones.unionByName(ids).distinct())


def ivf_dynamic_search(dyn: DynamicIVF, queries: DataFrame, k: int, **kw) -> DataFrame:
    """Search over (clustered + appended - tombstoned)."""
    from dataclasses import replace as _replace

    from scalablevectorsearch_spark.operators.ivf import ivf_search

    idx = dyn.index
    tomb = dyn.tombstones.select(F.col("id").alias(idx.id_col))
    cur = idx.clustered.join(F.broadcast(tomb), idx.id_col, "left_anti")
    # fresh cal_cache: the ephemeral tombstone-filtered view must not
    # read (or write) calibration groundtruth keyed to the unfiltered
    # clustered base
    return ivf_search(_replace(idx, clustered=cur, cal_cache={}), queries, k=k, **kw)


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


#: above this size an ``isin`` literal list would bloat the plan; use a
#: broadcast-join DataFrame instead (the set is still executor-memory
#: sized — consolidate() is the pressure valve, as in the reference)
_ISIN_MAX = 10_000


def _without_ids(df: DataFrame, col: str, ids: tuple, keep: bool = False) -> DataFrame:
    """Filter ``df`` by membership of ``col`` in a driver-side id set,
    without ever shuffling ``df``: small sets become a pushed-down
    ``isin`` predicate (partition-prunable at the scan), larger ones a
    broadcast semi/anti join."""
    if not ids:
        return df if not keep else df.limit(0)
    if len(ids) <= _ISIN_MAX:
        cond = F.col(col).cast("long").isin(list(ids))
        return df.filter(cond if keep else ~cond)
    ids_df = df.sparkSession.createDataFrame([(int(i),) for i in ids], f"{col} long")
    return df.join(F.broadcast(ids_df), col, "left_semi" if keep else "left_anti")


#: delete waves up to this size stay driver-resident (the reference's
#: in-memory status-vector parity — fast isin/broadcast paths); larger
#: waves switch to a tombstone DataFrame that only ever lives
#: executor-side (anti-joins + broadcast flag stamps)
_TOMB_DRIVER_MAX = 100_000


@dataclass
class _CkptCell:
    """Shared mutable ownership cell for ONE lineage cut's checkpoint
    RDDs (r12, ADVICE r11): handles created between cuts (non-checkpoint
    mutations, delete waves) all recompute through the same checkpoint,
    so they SHARE this cell; ``gen`` counts ownership transfers and only
    the handle holding the LATEST generation may destroy the data. A
    stale handle's close() — e.g. ``d2 = delete_entries(d); d.close()``
    — becomes a checkpoint no-op instead of unpersisting the RDDs the
    live generation's lineage still recomputes through (previously a
    latent job failure on any later cache eviction)."""

    rdd_ids: tuple = ()
    gen: int = 0

    def transfer(self) -> int:
        """Pass ownership to a newer handle; returns its generation."""
        self.gen += 1
        return self.gen

    def release(self, spark) -> None:
        _release_ckpt_rdds(spark, self.rdd_ids)
        self.rdd_ids = ()


@dataclass
class DynamicVamana:
    """A Vamana index + a tombstone set (lazy deletes).

    Small delete sets are DRIVER-RESIDENT (``tomb_ids`` — exact parity
    with the reference, which tracks deleted slots in an in-memory
    status vector, dynamic_index.h:617-630): membership is driver work,
    search exclusion ships in the query broadcast, and no Spark job
    ever shuffles the base because of a delete. A delete wave larger
    than the driver threshold flips the representation to ``tomb_df``,
    an id DataFrame that is anti-joined / flag-stamped executor-side —
    the wave is never collect()ed. Exactly one representation is active
    (``tomb_df is not None`` wins)."""

    index: VamanaIndex
    tomb_ids: tuple = ()  # sorted tombstoned ids (small path)
    tomb_df: DataFrame | None = None  # authoritative when not None
    #: persisted frames THIS generation's mutation created and owns
    #: (graph/layout). The CacheManager holds strong references to
    #: persisted plans until explicit unpersist — the ContextCleaner
    #: does NOT reclaim them on Python GC — so each mutation releases
    #: its predecessor's pins once the new generation is materialized
    #: (see add_points/consolidate), and ``close()`` releases the last
    #: generation when a maintenance loop retires the index.
    pins: tuple = ()
    #: the LAST lineage cut's checkpoint RDD ids (r11): a
    #: localCheckpoint registers its own RDD-level persist, which
    #: DataFrame.unpersist does NOT release (CacheManager no-op on a
    #: LogicalRDD frame), so an untracked chain grows by one
    #: fully-materialized graph+layout copy per _CKPT_EVERY mutations.
    #: A checkpoint must outlive its dependents (every generation up
    #: to the NEXT cut recomputes through it), so it is released
    #: exactly when a newer cut supersedes it — and by close() when
    #: the index retires. Releasing DESTROYS the checkpoint data, so
    #: handles older than the previous cut become invalid (not merely
    #: recompute-slow) once a newer cut lands. Ownership is refcounted
    #: through a shared :class:`_CkptCell` (r12): only the handle whose
    #: ``ckpt_gen`` matches the cell's current generation may destroy.
    ckpt_cell: _CkptCell = field(default_factory=_CkptCell)
    ckpt_gen: int = 0
    #: mutations since the last lineage cut: every mutation embeds the
    #: previous graph's plan at least twice, so the logical plan doubles
    #: per generation; a localCheckpoint every _CKPT_EVERY mutations
    #: bounds growth to 2^_CKPT_EVERY leaf-plan copies (measured
    #: blowup point without any cut: ~15 generations) while paying the
    #: checkpoint write only every K-th mutation (per-mutation eager
    #: checkpoints cost +27-36% on the mutation cycle).
    gens_since_ckpt: int = 0

    def close(self) -> None:
        """Release this generation's persisted graph/layout blocks.
        Call when retiring the index (e.g. at the end of a streaming
        maintenance loop); searches on this handle afterwards recompute
        from the last checkpoint instead of the cache.

        OWNERSHIP (r12): checkpoint destruction is generation-guarded.
        Handles between lineage cuts share one :class:`_CkptCell`; each
        mutation/delete transfers ownership to the handle it returns, so
        a close() on a SUPERSEDED handle releases only that handle's
        cached graph/layout blocks (searches on it — and on any handle
        sharing its pins, e.g. the post-delete handle — degrade to
        recompute through the live checkpoint) and leaves the checkpoint
        itself intact for the live generation. Only the latest handle's
        close() destroys the checkpoint data. close() is idempotent."""
        self._release_pins()
        if self.ckpt_gen == self.ckpt_cell.gen:
            self.ckpt_cell.release(self.spark)

    def _release_pins(self) -> None:
        """Release only the persisted graph/layout (NOT the lineage
        checkpoint): what a superseding mutation drops — its new
        generation still recomputes through the last checkpoint until
        it cuts a new one."""
        for df in self.pins:
            df.unpersist(blocking=False)

    @property
    def spark(self):
        return self.index.base.sparkSession

    @property
    def tombstones(self) -> DataFrame:
        """The tombstone set as an id DataFrame (joinable API surface)."""
        if self.tomb_df is not None:
            return self.tomb_df
        return self.spark.createDataFrame([(int(i),) for i in self.tomb_ids], "id long")

    def n_tombstones(self) -> int:
        if self.tomb_df is not None:
            return self.tomb_df.count()
        return len(self.tomb_ids)


def dynamic_vamana(index: VamanaIndex) -> DynamicVamana:
    """Wrap an index for mutation. Hash-sharded AND kmeans-routed
    (cluster-sharded) indexes are supported (r11): routed inserts stamp
    to their nearest cell through the SAME deterministic ``_sharded``
    assignment the build and every search use — closure replicas
    included — so post-mutation routed searches (n_probes /
    probe_budget / target_recall) keep pruning unprobed shards
    correctly. One routed-only contract: reinserting a TOMBSTONED id
    requires ``consolidate()`` first (see add_points)."""
    if getattr(index, "vec_decode", None) is not None:
        raise ValueError(
            "dynamic mutations are not supported on packed-storage indexes; "
            "build the LVQ index over the reconstruction (vec_decode=None) "
            "for mutation workloads"
        )
    return DynamicVamana(index=index, tomb_ids=())


#: mutations between lineage cuts. Every mutation embeds the previous
#: graph's plan at least twice, so plan size doubles per generation; a
#: cut every 4th mutation bounds the plan at 2^4 = 16 leaf-plan copies
#: — far under the measured ~15-generation Catalyst blowup — while
#: skipping 3 of 4 checkpoint writes (per-mutation eager checkpoints
#: measured +27-36% on dynamic_cycle in r9).
_CKPT_EVERY = 4


def _pin_by_shard(
    df: DataFrame, checkpoint: bool = True, n_keys: int | None = None
) -> tuple[DataFrame, DataFrame | None]:
    """Materialize a mutated graph/layout hash-partitioned on shard_id
    — the Spark analog of the reference's in-place
    ``graph_.replace_node``: without it every downstream search re-runs
    the shard rebuild, and partitioning by shard keeps the materialized
    layout aligned with the search cogroup (no partition-count creep
    across mutation cycles).

    With ``checkpoint``, an eager localCheckpoint first cuts the
    lineage to a leaf: every mutation embeds the PREVIOUS graph's plan
    at least twice (untouched-shards filter + the cogroup side), so an
    uncut chain doubles the logical plan per mutation — measured
    blowing past Catalyst's 2^31-char plan-string cap (and minutes of
    analysis) ~15 batches into a streaming maintenance loop. The cut
    runs every ``_CKPT_EVERY``-th mutation, not every mutation — the
    checkpoint write is the dominant per-mutation constant, and plan
    growth between cuts is bounded at 2^_CKPT_EVERY leaf copies.

    A checkpoint leaf alone is NOT enough: Spark's LogicalRDD
    (measured on 4.1.2) reports unknown partitioning to Catalyst, so
    every post-mutation search would re-shuffle the checkpointed frame
    under the cogroup — a full graph+layout exchange per SEARCH, the
    hot path (explain_audit's "post-mutation search still reads a
    persisted layout" check caught exactly this). So: checkpoint
    (lineage cut) THEN _by_shard + persist (one shuffle per MUTATION;
    the InMemoryRelation carries hashpartitioning(shard_id) and
    searches cogroup exchange-free off it). The previous generation's
    persisted blocks are released by the mutation that supersedes them
    (see DynamicVamana.pins). On a real cluster, executor loss
    invalidates local checkpoints — a maintenance service there should
    periodically persist the graph to storage (index save/load)
    instead of chaining forever."""
    from scalablevectorsearch_spark.operators.vamana import _by_shard

    ckpt_ids: tuple = ()
    if checkpoint:
        df, ckpt_ids = _local_ckpt(df)
    pinned = _by_shard(df, n_keys=n_keys).persist()
    pinned.count()
    # the localCheckpoint registers its OWN persisted RDD, which
    # unpersisting `pinned` does not release — the caller tracks the
    # RDD ids (DynamicVamana.ckpt_cell) and frees them when a newer
    # cut supersedes them
    return pinned, ckpt_ids


def _pin_pair(
    graph_df: DataFrame, layout_df: DataFrame, checkpoint: bool,
    n_keys: int | None = None,
) -> tuple[tuple, tuple]:
    """Materialize a mutation's graph AND layout pins CONCURRENTLY —
    the two persist+count jobs are independent, and Spark's scheduler
    happily back-fills one job's straggler tail with the other's tasks
    (r12 optimization round, guide §2.6 "overlap independent jobs");
    sequential pins paid two full job latencies per mutation. The
    lineage-cut path stays correct under concurrency: _local_ckpt is
    lock-guarded, so the two eager checkpoint cuts serialize while the
    (dominant) shuffle+persist+count work overlaps."""
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as pool:
        fg = pool.submit(_pin_by_shard, graph_df, checkpoint, n_keys)
        fl = pool.submit(_pin_by_shard, layout_df, checkpoint, n_keys)
        return fg.result(), fl.result()


def _persistent_rdd_ids(spark) -> set:
    jsc = spark.sparkContext._jsc.sc()
    out, it = set(), jsc.getPersistentRDDs().iterator()
    while it.hasNext():
        out.add(int(it.next()._1()))
    return out


#: guards the before/after FALLBACK diff in _local_ckpt — without it a
#: concurrent persist from another driver thread (parallel tests on one
#: session, streaming jobs) would land in the diff and later be
#: force-unpersisted, silently destroying an unrelated cache
_ckpt_lock = threading.Lock()


def _local_ckpt(df: DataFrame):
    """localCheckpoint(eager) + the ids of the RDD blocks it pinned.

    A checkpoint's persist happens at the RDD level — invisible to
    DataFrame.unpersist (which goes through the CacheManager and is a
    no-op on a LogicalRDD-backed frame) — so without tracking, every
    lineage cut leaks one fully-materialized block set (measured:
    +2 persistent RDDs per cut, each a whole graph/layout copy).

    r12 (ADVICE r11): the ids are derived from the checkpointed frame
    ITSELF — ``Dataset.localCheckpoint`` persists exactly the internal
    RDD its returned LogicalRDD plan wraps, so reading that plan's
    ``rdd.id`` attributes the pin precisely even when another driver
    thread persists concurrently. The pre-r12 global before/after diff
    of getPersistentRDDs remains as a lock-guarded fallback for plan
    shapes where the accessor is unavailable."""
    spark = df.sparkSession
    with _ckpt_lock:
        before = _persistent_rdd_ids(spark)
        ck = df.localCheckpoint(eager=True)
        try:
            rid = int(ck._jdf.queryExecution().analyzed().rdd().id())
            if rid in _persistent_rdd_ids(spark):
                return ck, (rid,)
        except Exception:
            pass
        return ck, tuple(sorted(_persistent_rdd_ids(spark) - before))


def _release_ckpt_rdds(spark, rdd_ids: tuple) -> None:
    """Unpersist checkpoint RDDs by id. Destroys the checkpoint's data
    — only called when a NEWER lineage cut exists (nothing live
    recomputes through the old one) or when the index retires."""
    if not rdd_ids:
        return
    m = spark.sparkContext._jsc.sc().getPersistentRDDs()
    for rid in rdd_ids:
        opt = m.get(int(rid))
        if opt.isDefined():
            opt.get().unpersist(False)


def add_points(dyn: DynamicVamana, new_rows: DataFrame) -> DynamicVamana:
    """Insert rows; raises on id collision with live rows
    (dynamic_index.h:640-656 id validation). New points are linked
    INCREMENTALLY into the touched shards' existing graphs — greedy
    search + alpha-prune + reverse edges, the reference's insert path
    (dynamic_index.h:631-700) — so per-batch cost is O(batch · window ·
    degree · d), not O(shard size); untouched shards' rows are reused
    verbatim and the base table is never shuffled (insert batches are
    broadcast-sized by contract — bulk loads go through
    ``vamana_build``). Reinserting a tombstoned id revives the slot with
    the new vector (reuse_empty semantics): its old adjacency row is
    dropped and it re-links as a new point; edges INTO the slot remain
    until consolidate, now pointing at the new vector — the reference's
    lazy repair contract."""
    import numpy as np

    from scalablevectorsearch_spark.operators.vamana import (
        GRAPH_SCHEMA,
        _by_shard,
        _decode_adjacency,
    )
    from scalablevectorsearch_spark.operators.vamana_local import (
        build_graph,
        insert_points,
        medioid,
    )

    idx = dyn.index
    id_col, vec_col = idx.id_col, idx.vec_col
    params, distance = idx.params, idx.distance
    new_rows = new_rows.select(
        F.col(id_col).cast("long").alias(id_col), F.col(vec_col).alias(vec_col)
    )
    routed = idx.shard_model is not None
    if routed:
        # cluster-routed insert (r11): stamp each new row to its nearest
        # cell — plus closure replicas — through the SAME deterministic
        # _sharded assignment the build used, so routed searches keep
        # pruning unprobed shards correctly after the mutation. The
        # stamp re-runs per downstream job (3 jobs x a broadcast-sized
        # batch — negligible) rather than localCheckpoint-ing: a
        # checkpoint pins an RDD outside the CacheManager that nothing
        # would ever release (the ckpt_pins lesson), and the stamp is
        # deterministic, so every job sees the same assignment.
        from scalablevectorsearch_spark.operators.vamana import _sharded

        new_layout = _sharded(
            new_rows, idx.n_shards, id_col, idx.shard_model, vec_col,
            idx.closure_bp, None, stamp_hierarchical=idx.stamp_hierarchical,
        ).select(
            "shard_id",
            F.col(id_col).cast("long").alias("__id"),
            F.col(vec_col).alias("__vec"),
        )
        stats = new_layout.select(
            F.collect_set("shard_id").alias("shards"),
            F.collect_set("__id").alias("ids"),
        ).first()
    else:
        new_layout = new_rows.select(
            F.pmod(F.col(id_col).cast("long"), F.lit(idx.n_shards))
            .cast("int")
            .alias("shard_id"),
            F.col(id_col).cast("long").alias("__id"),
            F.col(vec_col).alias("__vec"),
        )
        # one job over the (small) insert batch: touched shards + new ids
        stats = new_layout.select(
            F.collect_set("shard_id").alias("shards"),
            F.collect_set("__id").alias("ids"),
        ).first()
    touched = sorted(stats["shards"])
    new_ids = set(stats["ids"])
    tomb_df_after = None
    if dyn.tomb_df is not None:
        # large-wave tombstones: revived = tomb ∩ batch (bounded by the
        # broadcast-sized batch, so the collect is small even though the
        # tombstone set is not), collision check is join-only. The two
        # validation actions are independent reads — run them
        # concurrently (guide §2.6) instead of paying two sequential
        # job latencies per mutation.
        from concurrent.futures import ThreadPoolExecutor

        spark = new_rows.sparkSession
        batch_ids = spark.createDataFrame(
            [(int(i),) for i in sorted(new_ids)], "id long"
        )
        revived_df = dyn.tomb_df.join(F.broadcast(batch_ids), "id", "left_semi")
        dup_df = (
            idx.base.select(F.col(id_col).cast("long").alias("id"))
            .join(F.broadcast(batch_ids), "id", "left_semi")
            .join(dyn.tomb_df, "id", "left_anti")
        )
        with ThreadPoolExecutor(max_workers=2) as pool:
            f_rev = pool.submit(revived_df.collect)
            f_dup = pool.submit(dup_df.count)
            revived = tuple(sorted(r[0] for r in f_rev.result()))
            n_dup = f_dup.result()
        if n_dup:
            raise ValueError(f"{n_dup} ids already exist in the index")
        dup_check_df = None  # validated above (the concurrent pair)
        tomb = ()
        tomb_df_after = dyn.tomb_df
        if revived:
            tomb_df_after = dyn.tomb_df.join(
                F.broadcast(batch_ids), "id", "left_anti"
            )
    else:
        # reinserting a tombstoned id revives the slot (reuse_empty
        # semantics, dynamic_index.h:631) — pure driver set work
        revived = tuple(sorted(new_ids & set(dyn.tomb_ids)))
        tomb = tuple(i for i in dyn.tomb_ids if i not in new_ids)
        # collision check: one pushed-down isin count, base stays put.
        # r13 (guide §2.6): the count is DEFERRED and runs concurrently
        # with the pin materialization below — it reads only
        # pre-mutation state, so its result is independent of the pins;
        # on a detected collision the just-built pins are released
        # before raising, and the mutation still never returns a handle.
        dup_check_df = _without_ids(
            _without_ids(idx.base.select(id_col), id_col, dyn.tomb_ids),
            id_col,
            tuple(new_ids),
            keep=True,
        )
    if routed and revived:
        # a tombstoned id's OLD replicas sit wherever its old vector
        # routed; the new vector may route elsewhere, so an in-place
        # slot revive would leave in-edges in the old shards dangling
        # (hash sharding never moves a slot, so revive is safe there).
        # Routed contract: consolidate() physically removes the
        # tombstoned rows (repairing in-edges), then the id is free.
        raise ValueError(
            f"{len(revived)} ids are tombstoned on a cluster-routed index; "
            "run consolidate() before reinserting them (routed slot "
            "placement follows the vector, so revive-in-place would "
            "dangle the old replicas' in-edges)"
        )
    base = _without_ids(
        idx.base.select(id_col, vec_col), id_col, revived
    ).unionByName(new_rows)

    # vector side of the link cogroup: the touched shards' PERSISTED
    # layout rows (minus revived slots, whose vectors are replaced)
    # plus the new rows, flagged — only touched shards ever reach the
    # kernel, and the old layout is read from cache, not the base
    old_touched = _without_ids(
        idx.layout.filter(F.col("shard_id").isin(touched)), "__id", revived
    )
    vside = old_touched.withColumn("__new", F.lit(False)).unionByName(
        new_layout.withColumn("__new", F.lit(True))
    )
    # graph side: touched shards' adjacency; revived slots re-link as
    # new points, so their outgoing rows are dropped
    gside = _without_ids(
        idx.graph.filter(F.col("shard_id").isin(touched)), "src", revived
    )

    def link_fn(key, vdf, gdf):
        import pandas as pd

        if len(vdf) == 0:
            return pd.DataFrame(
                {"shard_id": [], "src": [], "neighbors": [], "is_entry": []}
            )
        vdf = vdf.sort_values("__id").reset_index(drop=True)
        gids = vdf["__id"].to_numpy(dtype=np.int64)
        # construction kernel: honor params.build_dtype (search stays f64)
        X = np.stack(vdf["__vec"].to_numpy()).astype(params.build_dtype)
        new_mask = vdf["__new"].to_numpy(dtype=bool)
        if len(gdf) == 0 or new_mask.all():
            # shard had no prior graph — fresh build
            graph, entry = build_graph(X, params, distance)
        else:
            graph, entry = _decode_adjacency(gids, gdf)
            if entry is None or new_mask[entry]:
                # the old entry point was revived — fall back to the
                # medioid of the surviving old nodes
                old_pos = np.nonzero(~new_mask)[0]
                entry = int(old_pos[medioid(X[old_pos])])
            insert_points(
                X, graph, entry, np.nonzero(new_mask)[0], params, distance
            )
        return pd.DataFrame(
            {
                "shard_id": int(key[0]),
                "src": gids,
                "neighbors": [gids[adj].tolist() for adj in graph],
                "is_entry": [i == entry for i in range(len(gids))],
            }
        )

    linked = (
        _by_shard(vside, n_keys=idx.n_shards)
        .groupBy("shard_id")
        .cogroup(_by_shard(gside, n_keys=idx.n_shards).groupBy("shard_id"))
        .applyInPandas(link_fn, GRAPH_SCHEMA)
    )
    # plan-growth guard: cut lineage only every _CKPT_EVERY-th mutation
    ckpt = dyn.gens_since_ckpt + 1 >= _CKPT_EVERY
    pin_args = (
        idx.graph.filter(~F.col("shard_id").isin(touched)).unionByName(linked),
        _without_ids(idx.layout, "__id", revived).unionByName(
            new_layout.select("shard_id", "__id", "__vec")
        ),
    )
    if dup_check_df is not None:
        # overlap the collision-count read with the pin jobs (§2.6)
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=1) as vpool:
            f_dup = vpool.submit(dup_check_df.count)
            (graph, g_ckpt), (layout, l_ckpt) = _pin_pair(
                *pin_args, checkpoint=ckpt, n_keys=idx.n_shards
            )
            n_dup = f_dup.result()
        if n_dup:
            graph.unpersist(blocking=False)
            layout.unpersist(blocking=False)
            _release_ckpt_rdds(
                new_rows.sparkSession, tuple(g_ckpt) + tuple(l_ckpt)
            )
            raise ValueError(f"{n_dup} ids already exist in the index")
    else:
        (graph, g_ckpt), (layout, l_ckpt) = _pin_pair(
            *pin_args, checkpoint=ckpt, n_keys=idx.n_shards
        )
    # the new generation is materialized — release the superseded
    # generation's persisted blocks (the CacheManager never reclaims
    # them on its own; recompute of this generation, if ever evicted,
    # goes back through lineage to the last checkpoint). When this
    # mutation cut a NEW checkpoint, the previous cut is no longer on
    # any live lineage — release it too; otherwise inherit it (this
    # generation still recomputes through it).
    if ckpt:
        dyn._release_pins()
        dyn.ckpt_cell.release(dyn.spark)
        cell, gen = _CkptCell(rdd_ids=tuple(g_ckpt) + tuple(l_ckpt)), 0
    else:
        dyn._release_pins()
        # same cut, new owner: a close() on the superseded handle must
        # not destroy the checkpoint this generation recomputes through
        cell = dyn.ckpt_cell
        gen = cell.transfer()
    # fresh cal_cache: the cached groundtruth / pool / base counts were
    # computed against the PRE-mutation base — sharing the dict across
    # replace() would hand the auto-fallback and calibration stale
    # counts after the base changes
    return DynamicVamana(
        index=replace(idx, base=base, graph=graph, layout=layout, cal_cache={}),
        tomb_ids=tomb,
        tomb_df=tomb_df_after,
        pins=(graph, layout),
        ckpt_cell=cell,
        ckpt_gen=gen,
        gens_since_ckpt=0 if ckpt else dyn.gens_since_ckpt + 1,
    )


def delete_entries(
    dyn: DynamicVamana, ids: DataFrame, max_driver_ids: int = _TOMB_DRIVER_MAX
) -> DynamicVamana:
    """Lazy tombstone (dynamic_index.h:747): ids vanish from results
    immediately, stay in the graph until consolidate. Raises on unknown
    or already-deleted ids (:617-630).

    Waves that keep the total tombstone count <= ``max_driver_ids``
    stay driver-resident; beyond that the set becomes a DataFrame and
    every membership/validation below is a join — the ids are never
    materialized on the driver.

    CONTRACT: ``max_driver_ids`` must stay <= _TOMB_DRIVER_MAX (100k
    ids = ~800 KB broadcast) — the driver-resident set ships inside the
    query broadcast and its isin filters, so letting the threshold grow
    silently would reintroduce the driver bottleneck the DataFrame path
    exists to avoid. Enforced here, not just documented."""
    if max_driver_ids > _TOMB_DRIVER_MAX:
        raise ValueError(
            f"max_driver_ids={max_driver_ids} exceeds the broadcast-safe "
            f"contract _TOMB_DRIVER_MAX={_TOMB_DRIVER_MAX}"
        )
    idx = dyn.index
    ids = ids.select(F.col(idx.id_col).cast("long").alias("id")).distinct()
    # probe-collect instead of count-then-collect (one job, not two):
    # pull at most one row past the driver budget — enough to decide
    # the path, and the driver never holds more than budget+1 ids.
    # r13 (guide §2.6): the existence check is INDEPENDENT of the probe
    # (it is a semi-join count of the whole wave against the base, the
    # same expression both paths need), so it runs concurrently with
    # the probe instead of as a second sequential job latency.
    present_df = (
        idx.base.select(F.col(idx.id_col).cast("long").alias("id"))
        .join(ids, "id", "left_semi")
    )
    probe = None
    present_f = None
    pool = None
    if dyn.tomb_df is None:
        from concurrent.futures import ThreadPoolExecutor

        budget = max(0, max_driver_ids - len(dyn.tomb_ids))
        pool = ThreadPoolExecutor(max_workers=1)
        present_f = pool.submit(present_df.count)
        try:
            probe = ids.limit(budget + 1).collect()
        except BaseException:
            pool.shutdown(wait=True)
            raise
    try:
        if probe is not None and len(dyn.tomb_ids) + len(probe) <= max_driver_ids:
            id_list = sorted({r[0] for r in probe})
            already = [i for i in id_list if i in set(dyn.tomb_ids)]
            if already:
                raise ValueError(
                    f"{len(already)} ids are unknown or already deleted"
                )
            present = present_f.result()
            if present < len(id_list):
                raise ValueError(
                    f"{len(id_list) - present} ids are unknown or already deleted"
                )
            return DynamicVamana(
                index=idx, tomb_ids=tuple(sorted(set(dyn.tomb_ids) | set(id_list))),
                pins=dyn.pins, ckpt_cell=dyn.ckpt_cell,
                ckpt_gen=dyn.ckpt_cell.transfer(),
                gens_since_ckpt=dyn.gens_since_ckpt,
            )
        # large-wave path: all joins, zero driver materialization. The
        # existence check shuffles only the id column of the (pruned)
        # base scan — unavoidable when the wave exceeds broadcast size.
        n_new = ids.count()
        tomb = dyn.tombstones
        already = ids.join(tomb, "id", "left_semi").count()
        if already:
            raise ValueError(f"{already} ids are unknown or already deleted")
        present = present_f.result() if present_f is not None else present_df.count()
        if present < n_new:
            raise ValueError(f"{n_new - present} ids are unknown or already deleted")
    finally:
        if pool is not None:
            pool.shutdown(wait=True)
    # localCheckpoint, not cache: tombstone waves chain (each wave
    # unions the previous set), so a cache-only chain both grows the
    # plan per wave and leaks every prior wave's cached union; the
    # eager cut materializes a leaf and lets prior waves' blocks be
    # reclaimed when their Python refs drop
    new_tomb = tomb.unionByName(ids).localCheckpoint(eager=True)
    return DynamicVamana(
        index=idx, tomb_ids=(), tomb_df=new_tomb,
        pins=dyn.pins, ckpt_cell=dyn.ckpt_cell,
        ckpt_gen=dyn.ckpt_cell.transfer(),
        gens_since_ckpt=dyn.gens_since_ckpt,
    )


def dynamic_search(
    dyn: DynamicVamana, queries: DataFrame, k: int, search_window_size: int | None = None, **kw
) -> DataFrame:
    """Search skipping tombstoned ids (traversed, never returned) —
    zero extra jobs: a small skip-set ships inside the query broadcast;
    a large one is flag-stamped onto the scan via broadcast join."""
    if dyn.tomb_df is not None:
        return vamana_search(
            dyn.index, queries, k=k, search_window_size=search_window_size,
            exclude_df=dyn.tomb_df, **kw,
        )
    return vamana_search(
        dyn.index, queries, k=k, search_window_size=search_window_size,
        exclude_ids=list(dyn.tomb_ids) or None, **kw,
    )


def consolidate(dyn: DynamicVamana) -> DynamicVamana:
    """Physically remove tombstones by REPAIRING the affected shards'
    adjacency through the deleted neighborhoods (consolidate.h:357):
    each live node with deleted neighbors inherits their live neighbors
    and re-prunes — O(affected nodes), independent of shard size, via
    the same layout×graph cogroup as the insert path. Untouched shards
    are reused verbatim. Touched shards: hash-sharded indexes derive
    them driver-side (shard = id mod n_shards); ROUTED (kmeans-sharded)
    indexes read them from the persisted layout — placement followed
    the vector and closure replicas put one id in several shards, so
    the layout is the authority and every replica's shard is repaired
    (see the routed branch below)."""
    import numpy as np

    from scalablevectorsearch_spark.operators.vamana import (
        GRAPH_SCHEMA,
        _by_shard,
        _decode_adjacency,
    )
    from scalablevectorsearch_spark.operators.vamana_local import consolidate_graph

    idx = dyn.index
    if not dyn.tomb_ids and dyn.tomb_df is None:
        return dyn
    params, distance = idx.params, idx.distance
    large = dyn.tomb_df is not None
    routed = idx.shard_model is not None
    if large:
        base = idx.base.join(
            dyn.tomb_df.withColumnRenamed("id", idx.id_col), idx.id_col, "left_anti"
        )
        bc = None
    else:
        base = _without_ids(idx.base, idx.id_col, dyn.tomb_ids)
        tomb_arr = np.asarray(sorted(dyn.tomb_ids), dtype=np.int64)
        bc = idx.base.sparkSession.sparkContext.broadcast(tomb_arr)
    # touched-shard list is bounded by n_shards — safe to collect.
    # Routed indexes can't derive it from id arithmetic (placement
    # followed the vector; closure replicas put one id in SEVERAL
    # shards), so the persisted layout is the authority there — every
    # replica's shard is repaired, preserving routing + closure across
    # the consolidate.
    if routed:
        if large:
            hit = idx.layout.join(
                dyn.tomb_df.withColumnRenamed("id", "__id"), "__id", "left_semi"
            )
        else:
            hit = _without_ids(idx.layout, "__id", dyn.tomb_ids, keep=True)
        touched = sorted(r[0] for r in hit.select("shard_id").distinct().collect())
    elif large:
        touched = sorted(
            r[0]
            for r in dyn.tomb_df.select(
                F.pmod(F.col("id"), F.lit(idx.n_shards)).cast("int")
            )
            .distinct()
            .collect()
        )
    else:
        touched = sorted({int(i) % idx.n_shards for i in dyn.tomb_ids})

    def repair_fn(key, vdf, gdf):
        import pandas as pd

        empty = pd.DataFrame(
            {"shard_id": [], "src": [], "neighbors": [], "is_entry": []}
        )
        if len(vdf) == 0 or len(gdf) == 0:
            return empty
        vdf = vdf.sort_values("__id").reset_index(drop=True)
        gids = vdf["__id"].to_numpy(dtype=np.int64)
        # repair kernel: honor params.build_dtype (search stays f64)
        X = np.stack(vdf["__vec"].to_numpy()).astype(params.build_dtype)
        graph, entry = _decode_adjacency(gids, gdf)
        if "__del" in vdf.columns:
            deleted = vdf["__del"].to_numpy(dtype=bool)
        else:
            deleted = np.isin(gids, bc.value)
        entry = consolidate_graph(
            X, graph, deleted, 0 if entry is None else entry, params, distance
        )
        live = np.nonzero(~deleted)[0]
        if len(live) == 0:
            return empty
        return pd.DataFrame(
            {
                "shard_id": int(key[0]),
                "src": gids[live],
                "neighbors": [gids[graph[i]].tolist() for i in live],
                "is_entry": [int(i) == entry for i in live],
            }
        )

    vside = idx.layout.filter(F.col("shard_id").isin(touched))
    if large:
        # the deleted mask reaches the kernel as a joined flag column —
        # the wave never lands on the driver ( _by_shard repartitions
        # vside next, so the join shape doesn't disturb the cogroup)
        vside = vside.join(
            dyn.tomb_df.select(
                F.col("id").alias("__id"), F.lit(True).alias("__del")
            ),
            "__id",
            "left",
        ).withColumn("__del", F.coalesce(F.col("__del"), F.lit(False)))
    gside = idx.graph.filter(F.col("shard_id").isin(touched))
    repaired = (
        _by_shard(vside, n_keys=idx.n_shards)
        .groupBy("shard_id")
        .cogroup(_by_shard(gside, n_keys=idx.n_shards).groupBy("shard_id"))
        .applyInPandas(repair_fn, GRAPH_SCHEMA)
    )
    ckpt = dyn.gens_since_ckpt + 1 >= _CKPT_EVERY
    if large:
        new_layout = idx.layout.join(
            dyn.tomb_df.withColumnRenamed("id", "__id"), "__id", "left_anti"
        )
    else:
        new_layout = _without_ids(idx.layout, "__id", dyn.tomb_ids)
    (graph, g_ckpt), (layout, l_ckpt) = _pin_pair(
        idx.graph.filter(~F.col("shard_id").isin(touched)).unionByName(repaired),
        new_layout,
        checkpoint=ckpt,
        n_keys=idx.n_shards,
    )
    # release the superseded generation's pins; a new lineage cut also
    # retires the previous cut (see add_points)
    if ckpt:
        dyn._release_pins()
        dyn.ckpt_cell.release(dyn.spark)
        cell, gen = _CkptCell(rdd_ids=tuple(g_ckpt) + tuple(l_ckpt)), 0
    else:
        dyn._release_pins()
        cell = dyn.ckpt_cell
        gen = cell.transfer()
    # fresh cal_cache (see add_points): cached counts/groundtruth
    # belong to the pre-consolidate base
    return DynamicVamana(
        index=replace(idx, base=base, graph=graph, layout=layout, cal_cache={}),
        tomb_ids=(),
        pins=(graph, layout), ckpt_cell=cell, ckpt_gen=gen,
        gens_since_ckpt=0 if ckpt else dyn.gens_since_ckpt + 1,
    )


def _dense_ids(base: DataFrame, id_col: str) -> DataFrame:
    """Distributed dense rank over ascending id: range-partition the id
    column, sort within partitions, broadcast per-partition cumulative
    offsets, and stamp ``offset + local position`` per batch — the
    zipWithIndex shape. A global ``Window.orderBy`` would funnel the
    ENTIRE base through one WindowExec partition (the textbook
    single-partition sort); this plan's widest stage is the range
    exchange, which scales with the cluster. Returns (old_id, new_id)."""
    import numpy as np

    spark = base.sparkSession
    sp = int(spark.conf.get("spark.sql.shuffle.partitions"))
    ids = (
        base.select(F.col(id_col).cast("long").alias("old_id"))
        .repartitionByRange(sp, F.col("old_id").asc())
        .sortWithinPartitions("old_id")
        .withColumn("__pid", F.spark_partition_id())
        # pin the (sampled) range partitioning so the count pass and the
        # numbering pass see identical partitions
        .persist()
    )
    counts = {
        int(r["__pid"]): int(r["n"])
        for r in ids.groupBy("__pid").agg(F.count("*").alias("n")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(counts):  # range partitions are ordered by id range
        offsets[pid] = acc
        acc += counts[pid]
    bc = spark.sparkContext.broadcast(offsets)

    def number(batches):
        seen, off = 0, None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if off is None:
                off = bc.value[int(pdf["__pid"].iloc[0])]
            out = pdf[["old_id"]].copy()
            out["new_id"] = np.arange(off + seen, off + seen + len(pdf), dtype=np.int64)
            seen += len(pdf)
            yield out

    return ids.mapInPandas(number, "old_id long, new_id long")


def compact(base: DataFrame, graph: DataFrame, id_col: str = "id") -> tuple[DataFrame, DataFrame, DataFrame]:
    """Dense id remap (compact.h / dynamic_index.h:791-810): new ids are
    the rank of the old id in ascending order, computed DISTRIBUTED (see
    _dense_ids — no single-partition window). Returns (base', graph',
    mapping) where mapping = (old_id, new_id)."""
    mapping = _dense_ids(base, id_col)
    new_base = (
        base.join(mapping, base[id_col] == mapping["old_id"])
        .drop(id_col, "old_id")
        .withColumnRenamed("new_id", id_col)
    )
    # mapping is base-sized — no broadcast hint; these are plain
    # shuffle joins on ids (AQE still picks broadcast when it fits)
    m = mapping
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


def compact_index(index: VamanaIndex) -> tuple[VamanaIndex, DataFrame]:
    """Compact a WHOLE Vamana index to a dense id space and keep it
    searchable (dynamic_index.h:791-810 — the reference's compact leaves
    the index servable, not just the tables): base, graph, AND the
    persisted shard layout are remapped with the same dense mapping, so
    the compacted index's graph shard stamps still agree with its
    layout and a search needs no re-sharding. The dense rank itself is
    the distributed _dense_ids plan (no single-partition window); the
    layout remap is one shuffle join on ids. Returns
    (compacted_index, mapping) with mapping = (old_id, new_id)."""
    from pyspark.storagelevel import StorageLevel

    from scalablevectorsearch_spark.operators.vamana import _by_shard

    new_base, new_graph, mapping = compact(index.base, index.graph, index.id_col)
    new_layout = None
    if index.layout is not None:
        new_layout = _by_shard(
            index.layout.join(mapping, index.layout["__id"] == mapping["old_id"])
            .select("shard_id", F.col("new_id").alias("__id"), "__vec"),
            n_keys=index.n_shards,
        ).persist(StorageLevel.MEMORY_AND_DISK)
    return (
        replace(
            index, base=new_base, graph=new_graph, layout=new_layout,
            cal_cache={},
        ),
        mapping,
    )
