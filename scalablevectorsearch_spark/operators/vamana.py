"""Vamana proximity-graph index — distributed sharded build + search.

Parity: the Vamana index family (/root/reference/include/svs/index/
vamana/index.h:557 batch search, vamana_build.h:233-312 construct,
orchestrators/vamana.h) with the per-shard kernel in
operators/vamana_local.py (greedy_search.h / prune.h semantics).

Spark architecture (scale-first — this is deliberately NOT a
pointer-chasing port):
 - The base table is hash-sharded by id into ``n_shards`` independent
   sub-indexes. BUILD is one ``applyInPandas`` over the shard groups —
   embarrassingly parallel, one shuffle to co-locate each shard, and
   each shard's graph build fits executor memory by construction
   (shards are sized like the reference's single-node datasets). At
   100 TB this is the SPANN/DiskANN-cluster pattern: thousands of
   shards, each built independently; optionally route queries to a
   subset of shards with the IVF centroids (operators/ivf) instead of
   searching all shards.
 - SEARCH cogroups (vectors, graph) by shard and runs the greedy
   traversal per shard against the broadcast query batch, emitting each
   shard's top-k; a final window merge keeps the global top-k — the
   same O(Q·k·S)-row shuffle bound as the flat/IVF operators. The
   vector side reads the index's PERSISTED shard-partitioned ``layout``
   (built once at build time, like the reference index's materialized
   ``data_`` copy), so a search batch never re-shuffles the base: the
   only search-time exchanges are the tiny graph repartition and the
   bounded merge. A search
   over S shards with window w has the recall of single-graph searches
   with effective window S·w ≥ w, at S× the compute — the
   scale/recall trade is explicit and tunable via n_shards.
 - The graph is a plain DataFrame ``(shard_id, src, neighbors)`` with
   global ids — persistable as Parquet (index_store), joinable for
   degree stats, consolidatable for dynamic ops.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from scalablevectorsearch_spark.functions.distances import is_similarity
from scalablevectorsearch_spark.operators.topk import merge_partitions, topk_per_group
from scalablevectorsearch_spark.operators.vamana_local import (
    VamanaParams,
    build_graph,
    search_graph,
)

GRAPH_SCHEMA = "shard_id int, src long, neighbors array<long>, is_entry boolean"

#: selectivity at/below which vamana_search(where=..., fallback_below=
#: "auto") serves the exact filtered flat scan instead of traversing
#: the graph. Measured crossover (tools/stress_filtered.py, 10M rows):
#: at 1% selectivity the exact pool scan is 245x faster than the
#: waypoint traversal AND exact; at 50% the graph path wins. 2% keeps
#: the auto default safely on the winning side of that span — and
#: selectivity (not an absolute row count) is the scale-free criterion:
#: both path costs grow linearly in N at fixed selectivity, so the
#: crossover does not move with data size.
AUTO_FALLBACK_SELECTIVITY = 0.02
RESULT_SCHEMA = "qid long, neighbor_id long, distance double"


def _decode_adjacency(
    gids: np.ndarray, gdf: pd.DataFrame
) -> tuple[list[np.ndarray], int | None]:
    """Vectorized global->local adjacency decode shared by the search
    and incremental-insert kernels: ``gids`` is the shard's sorted
    global-id vector, ``gdf`` its (src, neighbors, is_entry) rows. A
    single searchsorted over the flattened adjacency replaces
    per-element dict lookups (the decode was the search hot spot, not
    BLAS). Edges or sources referencing ids absent from ``gids`` are
    dropped (stale rows). Returns (local adjacency lists, entry local id
    or None if no is_entry row survived)."""
    n_local = len(gids)
    src = gdf["src"].to_numpy(dtype=np.int64)
    nbr_lists = gdf["neighbors"].to_numpy()
    lens = np.fromiter((len(v) for v in nbr_lists), dtype=np.int64, count=len(src))
    flat = (
        np.concatenate([np.asarray(v, dtype=np.int64) for v in nbr_lists])
        if lens.sum()
        else np.empty(0, dtype=np.int64)
    )
    pos = np.searchsorted(gids, flat)
    posc = np.minimum(pos, n_local - 1)
    ok = gids[posc] == flat
    spos = np.searchsorted(gids, src)
    sposc = np.minimum(spos, n_local - 1)
    sok = gids[sposc] == src
    offs = np.zeros(len(src) + 1, dtype=np.int64)
    np.cumsum(lens, out=offs[1:])
    is_ep = gdf["is_entry"].to_numpy(dtype=bool)
    graph = [np.empty(0, dtype=np.int64) for _ in range(n_local)]
    entry: int | None = None
    for i in range(len(src)):
        if not sok[i]:
            continue
        s = int(sposc[i])
        sl = slice(offs[i], offs[i + 1])
        graph[s] = posc[sl][ok[sl]]
        if is_ep[i]:
            entry = s
    return graph, entry


def _murmur3_fmix(h: int, length: int) -> int:
    h ^= length
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & 0xFFFFFFFF
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & 0xFFFFFFFF
    return h ^ (h >> 16)


def _murmur3_mixk1(k: int) -> int:
    k = (k * 0xCC9E2D51) & 0xFFFFFFFF
    k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
    return (k * 0x1B873593) & 0xFFFFFFFF


def _murmur3_mixh1(h: int, k: int) -> int:
    h ^= k
    h = ((h << 13) | (h >> 19)) & 0xFFFFFFFF
    return (h * 5 + 0xE6546B64) & 0xFFFFFFFF


def _spark_hash(x: int, is_long: bool, seed: int = 42) -> int:
    """Spark's Murmur3Hash of an INT/BIGINT value (seed 42) — verified
    equal to ``F.hash`` for both types. Driver-side replica so the
    shard partition count can be chosen WITHOUT running a job."""
    if is_long:
        h = _murmur3_mixh1(seed, _murmur3_mixk1(x & 0xFFFFFFFF))
        h = _murmur3_mixh1(h, _murmur3_mixk1((x >> 32) & 0xFFFFFFFF))
        h = _murmur3_fmix(h, 8)
    else:
        h = _murmur3_fmix(_murmur3_mixh1(seed, _murmur3_mixk1(x & 0xFFFFFFFF)), 4)
    return h - (1 << 32) if h >= (1 << 31) else h


def _collision_free_partitions(n_keys: int, sp: int, is_long: bool) -> int:
    """Smallest N in [sp, 4*sp] for which hashpartitioning maps the
    dense shard-id range 0..n_keys-1 injectively (pmod(murmur3(id), N)
    all distinct); falls back to sp when none exists or n_keys > sp.

    Why (r12 optimization round, guide §2.5 skew): with K shard groups
    hashed into sp partitions, two groups share a reduce partition with
    probability 1 - prod(1 - i/sp) — ~60% at K=8/sp=32 — and the two
    per-shard kernels then run SEQUENTIALLY in one task, doubling the
    stage wall. The shard ids are dense ints, so a driver-side scan of
    the exact hash function finds a nearby N with zero collisions (e.g.
    33 for K=8). Identical results either way — only task placement
    changes."""
    if n_keys > sp:
        return sp
    for n in range(sp, 4 * sp + 1):
        bins: set[int] = set()
        ok = True
        for i in range(n_keys):
            b = _spark_hash(i, is_long) % n
            if b in bins:
                ok = False
                break
            bins.add(b)
        if ok:
            return n
    return sp


def _by_shard(df: DataFrame, n_keys: int | None = None) -> DataFrame:
    """Explicit hash repartition on shard_id ahead of a per-shard
    kernel. AQE coalesces shuffles by BYTES, and a shard's graph
    build/search is compute-heavy but byte-light — left to AQE, every
    shard group lands in one reduce partition and the kernels run
    sequentially. REPARTITION_BY_NUM shuffles are exempt from AQE
    coalescing, and the downstream groupBy/cogroup reuses the exchange
    (hashpartitioning(shard_id, N) satisfies its distribution), so the
    per-shard tasks actually run in parallel. N = shuffle.partitions,
    the cluster-sized knob — nudged to the nearest collision-free count
    when the caller passes the (small) shard-id key count
    (see _collision_free_partitions)."""
    sp = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    n = sp
    if n_keys is not None and n_keys > 0:
        is_long = dict(df.dtypes).get("shard_id") == "bigint"
        n = _collision_free_partitions(int(n_keys), sp, is_long)
    return df.repartition(n, "shard_id")


@dataclass
class VamanaIndex:
    graph: DataFrame  # (shard_id, src, neighbors, is_entry), global ids
    base: DataFrame
    params: VamanaParams
    distance: str
    n_shards: int
    id_col: str = "id"
    vec_col: str = "vector"
    #: set for cluster-sharded (SPANN-style) indexes: shards are k-means
    #: cells, searches can route to the n_probes nearest shards
    shard_model: object | None = None
    #: SPANN closure assignment (basis points): rows replicate into
    #: every cell within (1 + closure_bp/1e4) of their nearest centroid;
    #: searches dedup by (qid, neighbor_id) before the merge
    closure_bp: int | None = None
    #: the index's OWN data layout: (shard_id, __id, __vec), persisted
    #: hash-partitioned on shard_id. The reference's index materializes
    #: a reordered copy of the data (vamana/index.h data_ member); the
    #: Spark analog is this persisted shard-partitioned table — without
    #: it every search batch would re-shuffle the full base to co-locate
    #: shards, a per-query-batch full-base shuffle at 100 TB.
    layout: DataFrame | None = None
    #: set when the index stores scalar-quantized vectors (the SQDataset
    #: plugged into Vamana, extensions/vamana/scalar.h): the SQParams
    #: whose scale/bias correct the compressed-domain distances. Build
    #: and search with operators.sq.sq_vamana_build / sq_vamana_search.
    sq_params: object | None = None
    #: optional vectorized storage decoder: the layout's ``__vec`` rows
    #: are PACKED storage (e.g. LVQ codes at 0.5-1 byte/component) and
    #: every kernel decodes (n, w) -> (n, d) at entry — the reference's
    #: compressed dataset plugged into the graph index
    #: (extensions/vamana/*.h). Ships in task closures; persisted
    #: indexes rebuild it from their compression params at load.
    vec_decode: object | None = None
    #: True when the build stamped shards via the grouped
    #: (triangle-pruned) nearest-centroid pass — recorded so every later
    #: re-stamp of the base (filtered scans, layout rebuilds) runs the
    #: SAME code path and stays deterministic wrt the build's assignment
    stamp_hierarchical: bool = False
    #: calibration-sample groundtruth cache (see IVFIndex.cal_cache):
    #: re-calibration on the same index skips the exact flat scan
    cal_cache: dict = field(default_factory=dict)


def _sharded(
    base: DataFrame,
    n_shards: int,
    id_col: str,
    shard_model=None,
    vec_col: str = "vector",
    closure_bp: int | None = None,
    vec_decode=None,
    stamp_hierarchical: bool = False,
) -> DataFrame:
    if shard_model is None:
        return base.withColumn(
            "shard_id", F.pmod(F.col(id_col).cast("long"), F.lit(n_shards)).cast("int")
        )
    # cluster sharding: shard = nearest k-means centroid, stamped
    # map-side. With ``closure_bp`` (SPANN closure assignment), a row is
    # ADDITIONALLY replicated into every cell whose e4 centroid key is
    # within (1 + closure_bp/1e4) of its nearest — boundary vectors
    # become reachable from each nearby cell's graph, trading bounded
    # storage amplification for routed recall at a fixed probe count
    # (the same sign-aware additive cutoff as probe_clusters_epsilon).
    from scalablevectorsearch_spark.functions.arrowio import (
        map_stamp,
        map_stamp_replicate,
    )

    sc = base.sparkSession.sparkContext
    if stamp_hierarchical:
        # grouped triangle-pruned stamp: same assignments / replica sets
        # as the flat pass (kmeans.GroupedCentroids invariant), at
        # ~2*sqrt(S) distance rows per input row instead of S — the
        # O(N*S) flat stamp is the measured ≥5e7 build wall (r8:
        # 7105.8s at 5e7 rows / 6103 shards, ~1.9 ms/row)
        from scalablevectorsearch_spark.operators.kmeans import (
            centroids_within_grouped,
            group_centroids,
            nearest_centroid_grouped,
        )

        bcg = sc.broadcast(group_centroids(shard_model.centroids))

        def stamp(V: np.ndarray) -> np.ndarray:
            return nearest_centroid_grouped(V, bcg.value)

        def stamp_closure(V: np.ndarray):
            return centroids_within_grouped(V, bcg.value, closure_bp)

    else:
        bc = sc.broadcast(shard_model.centroids)

        def stamp(V: np.ndarray) -> np.ndarray:
            from scalablevectorsearch_spark.operators.kmeans import _nearest_centroid

            return _nearest_centroid(V, bc.value)

        def stamp_closure(V: np.ndarray):
            from scalablevectorsearch_spark.functions.distances import (
                pairwise_distances,
            )

            key = np.floor(
                pairwise_distances(V, bc.value, "l2") * 1e4 + 0.5
            ).astype(np.int64)
            best = key.min(axis=1)
            cut = best * 10000 + np.abs(best) * closure_bp
            return np.nonzero(key * 10000 <= cut[:, None])

    # dispatch on 'is not None' (the same test the search path uses) so a
    # zero/None mix can never pick different code paths; vamana_build
    # validates closure_bp > 0 before it gets here
    if closure_bp is not None:
        return map_stamp_replicate(
            base, vec_col, "shard_id", stamp_closure, vec_decode=vec_decode
        )
    return map_stamp(base, vec_col, "shard_id", stamp, vec_decode=vec_decode)


def vamana_build(
    base: DataFrame,
    params: VamanaParams | None = None,
    n_shards: int = 8,
    distance: str = "l2",
    id_col: str = "id",
    vec_col: str = "vector",
    shard_by: str = "hash",
    kmeans_iters: int = 2,
    closure_bp: int | None = None,
    shard_model=None,
    vec_decode=None,
    stamp_via: str = "auto",
    layout_storage=None,
) -> VamanaIndex:
    """Build one Vamana graph per shard (deterministic: per-shard rows
    processed in ascending id order).

    ``shard_by="hash"``: shard = id mod n_shards — uniform, supports the
    dynamic mutation ops, searches fan to every shard.
    ``shard_by="kmeans"``: SPANN-style cluster shards — a k-means model
    partitions the space, one graph per cell, and ``vamana_search`` can
    route each query to its ``n_probes`` nearest cells (compute scales
    with probed fraction, not shard count — the 100 TB search path).
    ``closure_bp`` (kmeans sharding only): SPANN closure assignment —
    replicate each row into every cell whose centroid is within
    (1 + closure_bp/1e4) of its nearest, so boundary vectors are
    findable from neighboring cells' graphs; raises routed recall at a
    fixed probe count for bounded storage amplification. Pick
    ``closure_bp`` with :func:`~scalablevectorsearch_spark.operators.
    ivf.fit_closure_bp` (storage budget -> basis points) rather than a
    constant — safe constants don't transfer across geometries.
    ``shard_model``: pass a pre-trained KMeansModel to skip the
    (deterministic) retrain — e.g. when the centroids were already
    trained to FIT closure/epsilon parameters against budgets.
    ``vec_decode``: vectorized storage decoder — ``base[vec_col]``
    rows are packed storage and every kernel (shard stamp, graph
    build, search) decodes (n, w) -> (n, d) at entry; the persisted
    layout then holds the COMPRESSED rows (the point of a compressed
    index at 100 TB). kmeans sharding requires an explicit
    ``shard_model`` in this mode (centroids live in the decoded
    geometry).
    ``stamp_via`` (kmeans sharding): how rows are assigned to their
    nearest shard centroid — ``"flat"`` = one BLAS argmin over all S
    centroids (O(N*S), the measured wall when S grows with N: 7105.8s
    at 5e7 rows/6103 shards), ``"hierarchical"`` = grouped
    triangle-inequality-pruned stamp (~O(N*sqrt(S)), EXACT — same
    assignments and closure replica sets, see kmeans.group_centroids),
    ``"auto"`` = hierarchical at >= kmeans.HIERARCHICAL_STAMP_THRESHOLD
    centroids, flat below (small-S builds byte-identical to pre-r9).
    The decision is recorded on the index so filtered scans re-stamp
    through the same code path.
    ``layout_storage``: StorageLevel for the persisted shard layout
    (default MEMORY_AND_DISK). At >=5e7 rows pass
    ``StorageLevel.DISK_ONLY``: the serialized blocks are ~data-sized
    on disk with no heap pressure, where a deserialized in-memory
    layout (2-3x the data) evicts into spill alongside the build
    shuffle — the r8 50M search died on exactly that disk peak."""
    params = params or VamanaParams()
    if shard_by == "kmeans":
        if shard_model is None:
            if vec_decode is not None:
                raise ValueError(
                    "vec_decode with shard_by='kmeans' requires a pre-trained "
                    "shard_model over the DECODED vectors"
                )
            from scalablevectorsearch_spark.operators.kmeans import train_kmeans

            shard_model = train_kmeans(base, n_shards, kmeans_iters, id_col, vec_col)
        if shard_model.centroids.shape[0] != n_shards:
            raise ValueError(
                f"shard_model has {shard_model.centroids.shape[0]} centroids, "
                f"expected n_shards={n_shards}"
            )
    elif shard_by != "hash":
        raise ValueError(f"shard_by must be 'hash' or 'kmeans', got {shard_by!r}")
    elif shard_model is not None:
        raise ValueError("shard_model requires shard_by='kmeans'")
    if closure_bp is not None:
        if shard_model is None:
            raise ValueError("closure_bp requires shard_by='kmeans'")
        if closure_bp <= 0:
            # closure_bp <= 0 would make the stamp_closure cutoff
            # cut < best*10000 for every row — the layout silently builds
            # (nearly) empty. Fail loudly instead.
            raise ValueError(f"closure_bp must be positive, got {closure_bp}")

    def build_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("__id").reset_index(drop=True)
        gids = pdf["__id"].to_numpy(dtype=np.int64)
        X = np.stack(pdf["__vec"].to_numpy()).astype(np.float64)
        if vec_decode is not None:
            X = vec_decode(X)
        X = X.astype(params.build_dtype, copy=False)
        shard = int(pdf["shard_id"].iloc[0])
        graph, entry = build_graph(X, params, distance)
        return pd.DataFrame(
            {
                "shard_id": shard,
                "src": gids,
                "neighbors": [gids[adj].tolist() for adj in graph],
                "is_entry": [i == entry for i in range(len(gids))],
            }
        )

    from pyspark.storagelevel import StorageLevel

    from scalablevectorsearch_spark.operators.kmeans import _resolve_stamp_via

    stamp_hier = shard_model is not None and _resolve_stamp_via(
        stamp_via, shard_model.centroids.shape[0]
    )
    # the index's data layout: stamp + one co-locating shuffle, persisted
    # so build AND every later search read the shard-partitioned copy
    # instead of re-shuffling the base (index.h's materialized data_)
    layout = _by_shard(
        _sharded(
            base, n_shards, id_col, shard_model, vec_col, closure_bp,
            vec_decode, stamp_hierarchical=stamp_hier,
        ).select(
            "shard_id",
            F.col(id_col).cast("long").alias("__id"),
            F.col(vec_col).alias("__vec"),
        ),
        n_keys=n_shards,
    ).persist(layout_storage or StorageLevel.MEMORY_AND_DISK)
    graph = layout.groupBy("shard_id").applyInPandas(build_fn, GRAPH_SCHEMA)
    return VamanaIndex(
        graph=graph, base=base, params=params, distance=distance,
        n_shards=n_shards, id_col=id_col, vec_col=vec_col, shard_model=shard_model,
        closure_bp=closure_bp, layout=layout, vec_decode=vec_decode,
        stamp_hierarchical=stamp_hier,
    )


def closure_link_replicas(index: VamanaIndex, closure_bp: int) -> VamanaIndex:
    """Incremental closure build: upgrade a plain kmeans-sharded index
    to a SPANN-closure index by INSERT-LINKING each shard's replica
    rows into its existing graph instead of rebuilding the shard's
    graph over base+replicas from scratch.

    ``vamana_build(closure_bp=...)`` re-links every row of the
    base+replica union (at amplification A, that is A·n link
    operations). The plain shard graphs already linked the n primary
    rows — this path keeps them (including their entry points) and runs
    only the (A-1)·n replica insertions through the reference's
    incremental insert (dynamic_index.h:631-700: greedy search on the
    frozen graph + alpha-prune + reverse edges, the same kernel as
    add_points), bounding new work to the replica fraction of the union
    build. Insert-linked graphs prune in a different order than
    batch-built ones (vamana_build.h:280 reverse-edge timing), so the
    resulting graph is NOT bit-identical to the batch closure build —
    searched at an exhaustive window it is still exact, and recall
    floors are A/B-gated in tests and the 10M stress.

    The plain index's per-shard rows are exactly the closure layout's
    primary rows (same shard_model, same deterministic nearest-centroid
    stamp), so every plain graph row re-appears in its shard's closure
    rows; shards that gained only replicas keep their plain entry
    point. A closure shard with NO plain graph (possible only when the
    plain shard was empty) falls back to a scratch build of its rows.

    Cites: /root/reference/include/svs/index/vamana/dynamic_index.h:631
    (insert path), SPANN closure assignment (vamana_build closure_bp
    docstring)."""
    if index.shard_model is None:
        raise ValueError("closure_link_replicas requires a kmeans-sharded index")
    if index.closure_bp is not None:
        raise ValueError("index already has closure replication")
    if closure_bp <= 0:
        raise ValueError(f"closure_bp must be positive, got {closure_bp}")
    from pyspark.storagelevel import StorageLevel

    from scalablevectorsearch_spark.operators.vamana_local import (
        build_graph,
        insert_points,
    )

    params, distance, vec_decode = index.params, index.distance, index.vec_decode

    def link_fn(key, vdf: pd.DataFrame, gdf: pd.DataFrame) -> pd.DataFrame:
        if len(vdf) == 0:
            return pd.DataFrame(
                {"shard_id": [], "src": [], "neighbors": [], "is_entry": []}
            )
        vdf = vdf.sort_values("__id").reset_index(drop=True)
        gids = vdf["__id"].to_numpy(dtype=np.int64)
        X = np.stack(vdf["__vec"].to_numpy()).astype(np.float64)
        if vec_decode is not None:
            X = vec_decode(X)
        X = X.astype(params.build_dtype, copy=False)
        shard = int(vdf["shard_id"].iloc[0])
        if len(gdf) == 0:
            graph, entry = build_graph(X, params, distance)
        else:
            graph, entry = _decode_adjacency(gids, gdf)
            src = gdf["src"].to_numpy(dtype=np.int64)
            spos = np.searchsorted(gids, src)
            sposc = np.minimum(spos, len(gids) - 1)
            old = np.zeros(len(gids), dtype=bool)
            old[sposc[gids[sposc] == src]] = True
            if entry is None:
                # defensive: a graph frame without a surviving entry row
                from scalablevectorsearch_spark.operators.vamana_local import (
                    medioid,
                )

                entry = int(np.nonzero(old)[0][medioid(X[old])]) if old.any() else 0
            new_nodes = np.nonzero(~old)[0].astype(np.int64)
            if len(new_nodes):
                # ascending-id insertion order: deterministic graphs.
                # Build-sized rounds (vamana_build.h:241's
                # max(40, ceil(n/4096)) batching): the lockstep search
                # cost is superlinear in round size (see insert_points),
                # and 4096-node rounds measured 2.1x slower
                nb = max(40, -(-len(new_nodes) // 4096))
                insert_points(
                    X, graph, entry, new_nodes, params, distance,
                    batch_size=-(-len(new_nodes) // nb),
                )
        return pd.DataFrame(
            {
                "shard_id": shard,
                "src": gids,
                "neighbors": [gids[adj].tolist() for adj in graph],
                "is_entry": [i == entry for i in range(len(gids))],
            }
        )

    layout = _by_shard(
        _sharded(
            index.base, index.n_shards, index.id_col, index.shard_model,
            index.vec_col, closure_bp, vec_decode,
            stamp_hierarchical=index.stamp_hierarchical,
        ).select(
            "shard_id",
            F.col(index.id_col).cast("long").alias("__id"),
            F.col(index.vec_col).alias("__vec"),
        ),
        n_keys=index.n_shards,
    ).persist(StorageLevel.MEMORY_AND_DISK)
    graph = (
        layout.groupBy("shard_id")
        .cogroup(
            _by_shard(index.graph, n_keys=index.n_shards).groupBy("shard_id")
        )
        .applyInPandas(link_fn, GRAPH_SCHEMA)
    )
    return VamanaIndex(
        graph=graph, base=index.base, params=params, distance=distance,
        n_shards=index.n_shards, id_col=index.id_col, vec_col=index.vec_col,
        shard_model=index.shard_model, closure_bp=closure_bp, layout=layout,
        vec_decode=vec_decode, stamp_hierarchical=index.stamp_hierarchical,
    )


def vamana_search(
    index: VamanaIndex,
    queries: DataFrame,
    k: int,
    search_window_size: int | None = None,
    qid_col: str = "qid",
    qvec_col: str | None = None,
    round_to: int | None = 4,
    exclude_ids: list[int] | None = None,
    exclude_df: DataFrame | None = None,
    buffer_capacity: int | None = None,
    n_probes: int | None = None,
    epsilon_bp: int | None = None,
    max_probes: int | None = None,
    probe_budget: float | None = None,
    router=None,
    max_query_block: int | None = None,
    deadline: float | None = None,
    target_recall: float | None = None,
    calibration_queries: int | str = 32,
    calibration_groundtruth: DataFrame | None = None,
    where=None,
    scan_override: DataFrame | None = None,
    calibration_stats: dict | None = None,
    fallback_below: int | str | None = "auto",
    calibration_margin: float | str | None = "ci",
    calibration_validation_queries: int = 0,
    calibration_budget_hint: float | None = None,
) -> DataFrame:
    """Greedy graph search per shard + global top-k merge. Returns
    (qid, rank, neighbor_id, distance) like flat_knn.

    ``where``: hybrid filtered graph search — the predicate (a Column
    or SQL string over ``index.base``'s columns, flat.h:290-295
    semantics like flat_knn/ivf_search's ``where=``) restricts which
    nodes may be RETURNED; the graph is still traversed through
    non-matching nodes (they remain waypoints — dropping them would
    disconnect the graph), exactly the tombstone mechanism. The
    predicate is evaluated on ``index.base`` where the metadata columns
    live (so it pushes down to the parquet scan) and shard-stamped
    map-side through the same deterministic ``_sharded`` assignment the
    build used — no id join, one exchange by shard_id (the exchange the
    per-shard kernels need anyway; the persisted metadata-free layout
    is bypassed for the filtered scan). Recall under a selective filter
    needs a wider exploration window: with selectivity s, size
    ``search_window_size`` toward ~window/s so the buffer still holds k
    matching candidates (at an exhaustive window the result is EXACTLY
    the filtered k-NN, same as flat_knn(where=)).
    ``scan_override``: a pre-built (usually persisted) filtered scan
    (from ``_filtered_scan``) to reuse instead of re-stamping the base —
    callers that search the same ``where=`` repeatedly (the calibration
    fit loop, block iteration) share one; the caller owns its lifecycle.
    ``calibration_stats``: with ``target_recall``, pass a dict to
    receive the cost split {gt_sec, gt_cached, fit_sec, fit_evals,
    fitted_budget, fit_recall}; the sample groundtruth is cached on
    ``index.cal_cache`` so re-calibration skips the exact scan.
    ``calibration_margin``: sampling-aware fit target ("ci", the
    default = one-sided 95% upper confidence bound of the sample
    recall, float = fixed margin, None = exact fit; see
    calibrate.margined_target — an exact sample fit is measured to
    under-deliver on the population).
    ``calibration_validation_queries``: > 0 holds out that many
    additional disjoint qids and grades the fitted budget on them
    before serving (calibrate.validate_budget widens until the
    held-out recall clears the target).
    ``calibration_queries="auto"`` sizes the fit/validation split from
    the CI half-width at (target, k) (calibrate.calibration_sample_size)
    instead of hand-picked constants.
    ``calibration_budget_hint``: warm-start for the budget grid search
    (e.g. a smaller tier's fitted budget scaled by sqrt(N ratio)) — a
    good hint replaces the opening full-fan-out calibration probe with
    evals near the true operating point; a bad one costs only the
    gallop steps (calibrate_probe_budget(hint=)).
    ``fallback_below``: with ``where``, count the matching pool once
    (a pushed-down parquet count) and, when it holds at most this many
    rows, serve the EXACT filtered flat k-NN over the pool instead of
    traversing the graph. At ~1% selectivity the waypoint traversal
    must expand ~window/s nodes per probed shard to keep k matching
    candidates, while the exact scan touches only the pool — measured
    at 10M rows/1% the flat path wins by 245x AND is exact (see
    tools/stress_filtered.py). Exact results satisfy every recall
    floor, so this composes with target_recall (the calibration is
    skipped). Not applied when exclusions are set. Default ``"auto"``:
    fall back when the pool's SELECTIVITY is at most
    ``AUTO_FALLBACK_SELECTIVITY`` (2% — safely inside the measured
    crossover; both counts are pushed-down scans, cached on the
    index). Pass an int for an absolute row threshold, or None to
    never fall back.

    ``exclude_ids``: tombstoned ids — traversed but never returned
    (dynamic_search_buffer.h skip-deleted semantics). ``exclude_df``:
    the same skip-set as an id DataFrame for delete waves too large to
    ship on the driver — stamped onto the scan as a ``__del`` flag via
    a broadcast join, so the set reaches the kernels without ever being
    collected (mutually exclusive with ``exclude_ids``).
    ``buffer_capacity``: split-buffer capacity >= the exploration window
    (search_buffer.h:39-60); defaults to max(window, k).
    ``n_probes``: for kmeans-sharded indexes, route each query to its
    n_probes nearest shard centroids only — unprobed shards are filtered
    out of the scan entirely (partition pruning on a persisted layout),
    so search compute scales with n_probes/n_shards of the base.
    ``epsilon_bp``: ADAPTIVE shard probing (the two-level Inverted
    index's refinement_epsilon, memory_based.h:407-460, :508): probe
    every shard whose centroid distance is within (1 + epsilon_bp/1e4)
    of the query's best centroid — queries near a cell center probe few
    shards, boundary queries probe many, so recall no longer degrades
    with shard count the way a FIXED n_probes does. Cap the fan-out with
    ``max_probes``. Mutually exclusive with ``n_probes``; COMPOSES with
    ``router`` (the full two-level design: the centroid router proposes
    candidate shards sublinearly, epsilon refines among them —
    memory_based.h:577-586 + :508).
    ``probe_budget``: adaptive probing with the BUDGET as the invariant
    — fits ``epsilon_bp`` per query block on the actual geometry
    (fit_epsilon_bp) so the mean probes/query is ~probe_budget; the
    right default when the data distribution isn't known in advance
    (a hand-picked epsilon that is safe on clustered data degrades to
    full fan-out on uniform data and vice versa). The per-query probe
    count is clamped to [~3/4·budget (strictly < budget), 2·budget]
    (fit accounts for
    the clamp): recall is concave in probes, so the unclamped fit's
    under-probing tail loses more recall than its over-probing tail
    gains — measured in tools/probe_alloc_exp.py, where the clamped
    fit matches fixed fan-out on uniform data and beats both fixed and
    unclamped epsilon on mixed-difficulty clustered data. Mutually
    exclusive with ``n_probes`` and ``epsilon_bp``.
    DEFAULT ROUTING: when ``router`` is given with none of n_probes/
    epsilon_bp/probe_budget, the search uses probe_budget = n_shards/2
    — the epsilon-cutoff default of the reference's two-level Inverted
    index (memory_based.h:508, refinement_epsilon_ = 10.0): at equal
    mean probe cost, adaptive cutoff recalls strictly better than a
    fixed per-query n_probes because boundary queries take the extra
    probes that center queries release.
    ``target_recall``: recall-TARGETED probing — fits ``probe_budget``
    internally with calibrate_probe_budget (calibrate.h:249's
    binary-search-to-target applied to probe cost) against exact
    groundtruth on the ``calibration_queries`` smallest qids (pass
    ``calibration_groundtruth`` to skip the internal flat scan), then
    runs the full search at the fitted budget; the user asks for
    recall, the probe cost adapts to the data geometry. Requires a
    kmeans-sharded index; mutually exclusive with
    ``n_probes``/``epsilon_bp``/``probe_budget``. Same contract as
    ivf_search(target_recall=).
    ``router``: optional CentroidRouter (operators.router) over this
    index's shard centroids — replaces the exact O(S·d)-per-query
    centroid argmin with a sublinear graph traversal for very large
    shard counts (the two-level Inverted primary-index design,
    clustering.h:786-809).
    ``max_query_block``: for query tables too large for the driver —
    iterate hash-partitioned blocks (one shard pass per block, each
    block's result materialized before the next block is fetched), as
    in :func:`flat_knn`."""
    params, distance = index.params, index.distance
    sws = search_window_size or params.window_size
    qvec_col = qvec_col or index.vec_col
    sc = queries.sparkSession.sparkContext
    excl = np.asarray(sorted(set(exclude_ids)), dtype=np.int64) if exclude_ids else None
    maximize = is_similarity(distance)
    scale = None if round_to is None else float(10**round_to)
    if (
        fallback_below is not None
        and where is not None
        and exclude_ids is None
        and exclude_df is None
    ):
        # tiny-pool exact fallback: pushed-down counts decide; see the
        # fallback_below docstring for the measured rationale
        w = F.expr(where) if isinstance(where, str) else where
        if fallback_below == "auto":
            pool_key = ("__pool", str(where))
            pool = index.cal_cache.get(pool_key)
            if pool is None:
                pool = index.base.filter(w).count()
                index.cal_cache[pool_key] = pool
            n_base = index.cal_cache.get("__n_base")
            if n_base is None:
                n_base = index.base.count()
                index.cal_cache["__n_base"] = n_base
            do_fallback = pool <= AUTO_FALLBACK_SELECTIVITY * n_base
        else:
            do_fallback = (
                index.base.filter(w).limit(fallback_below + 1).count()
                <= fallback_below
            )
        if do_fallback:
            from scalablevectorsearch_spark.operators.flat import flat_knn

            return flat_knn(
                index.base, queries, k=k, distance=index.distance,
                id_col=index.id_col, vec_col=index.vec_col, qid_col=qid_col,
                qvec_col=qvec_col, where=where, round_to=round_to,
                max_query_block=max_query_block, deadline=deadline,
                decode=index.vec_decode,
            )
    if target_recall is not None:
        # recall-targeted probing (same contract as ivf_search's
        # target_recall=, see operators/calibrate.calibrate_probe_budget):
        # fit the probe budget against exact groundtruth on the
        # calibration_queries smallest qids, then run at the fitted
        # budget. Requires a kmeans-sharded index (budget probing needs
        # shard centroids). Sample-fitted: full-population recall can
        # sit slightly below the target.
        if n_probes is not None or epsilon_bp is not None or probe_budget is not None:
            raise ValueError(
                "target_recall is mutually exclusive with "
                "n_probes/epsilon_bp/probe_budget"
            )
        if not 0.0 < target_recall <= 1.0:
            raise ValueError("target_recall must be in (0, 1]")
        if index.shard_model is None:
            raise ValueError("target_recall requires a kmeans-sharded index")
        budget = _fit_vamana_budget(
            index, queries, k, sws, target_recall, qid_col, qvec_col,
            calibration_queries, calibration_groundtruth, router,
            max_probes=max_probes, buffer_capacity=buffer_capacity,
            exclude_ids=exclude_ids, exclude_df=exclude_df, where=where,
            stats=calibration_stats, calibration_margin=calibration_margin,
            calibration_validation_queries=calibration_validation_queries,
            budget_hint=calibration_budget_hint,
        )
        return vamana_search(
            index, queries, k, search_window_size=sws, qid_col=qid_col,
            qvec_col=qvec_col, round_to=round_to, exclude_ids=exclude_ids,
            exclude_df=exclude_df, buffer_capacity=buffer_capacity,
            max_probes=max_probes, probe_budget=budget, router=router,
            max_query_block=max_query_block, deadline=deadline, where=where,
        )
    if probe_budget is not None:
        if n_probes is not None or epsilon_bp is not None:
            raise ValueError(
                "probe_budget is mutually exclusive with n_probes/epsilon_bp"
            )
        if index.shard_model is None:
            raise ValueError("probe_budget routing requires a kmeans-sharded index")
        if probe_budget < 1:
            raise ValueError("probe_budget must be >= 1")
    elif (
        router is not None
        and n_probes is None
        and epsilon_bp is None
        and index.shard_model is not None
    ):
        # routed default: adaptive epsilon probing at a half-fan-out
        # budget (see docstring) instead of a fixed n_probes. Only when
        # the index is kmeans-sharded — budget probing needs shard
        # centroids; on a hash-sharded index (shard_by="hash") a router
        # keeps the pre-r6 behavior of full fan-out.
        probe_budget = max(1.0, index.n_shards / 2)

    if max_query_block is None:
        blocks = iter(
            [
                queries.select(
                    F.col(qid_col).cast("long").alias("qid"),
                    F.col(qvec_col).alias("qv"),
                ).toPandas()
            ]
        )
    else:
        from scalablevectorsearch_spark.operators.flat import query_blocks

        blocks = query_blocks(queries, qid_col, qvec_col, max_query_block)

    filtered_scan = scan_override
    own_scan = False
    if filtered_scan is None and where is not None and max_query_block is not None:
        # the filtered scan re-stamps the base (the metadata-free
        # persisted layout is bypassed, see _vamana_search_block);
        # under query-block iteration each block's job would otherwise
        # re-run that full stamp pass — build it ONCE, persist for the
        # duration of the block loop, release at the end
        from pyspark.storagelevel import StorageLevel

        filtered_scan = _filtered_scan(index, where).persist(
            StorageLevel.MEMORY_AND_DISK
        )
        own_scan = True
    parts: list[DataFrame] = []
    try:
        for qp in blocks:
            if len(qp) == 0:
                continue
            part, bc = _vamana_search_block(
                index, qp, k, sws, excl, exclude_df, buffer_capacity,
                n_probes, router, maximize, scale, sc, deadline,
                epsilon_bp=epsilon_bp, max_probes=max_probes,
                probe_budget=probe_budget, where=where,
                scan_override=filtered_scan,
            )
            if max_query_block is not None:
                part = part.persist()
                part.count()
                bc.unpersist()
            parts.append(part)
        if not parts:
            raise ValueError("empty query batch")
    finally:
        # release even when the loop raises (a caller-owned override is
        # the caller's to release); blocks are materialized eagerly
        # under max_query_block, so nothing downstream re-reads it
        if own_scan:
            filtered_scan.unpersist()
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select("qid", "rank", "neighbor_id", "distance")


def _fit_vamana_budget(
    index: VamanaIndex,
    queries: DataFrame,
    k: int,
    sws: int,
    target_recall: float,
    qid_col: str,
    qvec_col: str,
    calibration_queries: int,
    groundtruth: DataFrame | None,
    router,
    max_probes: int | None = None,
    buffer_capacity: int | None = None,
    exclude_ids: list[int] | None = None,
    exclude_df: DataFrame | None = None,
    where=None,
    stats: dict | None = None,
    calibration_margin: float | str | None = "ci",
    calibration_validation_queries: int = 0,
    budget_hint: float | None = None,
) -> float:
    """Fit a shard probe budget hitting ``target_recall`` on a
    deterministic query sample (vamana_search's target_recall= path;
    the ivf_search._fit_budget_for_target analog). Groundtruth defaults
    to one exact flat scan of the index's base (decoded when the index
    stores packed vectors), with excluded (tombstoned) ids removed —
    they can never be returned, so grading against them would misstate
    the achievable recall and over-widen the fitted budget.

    The calibration searches run with the caller's ``max_probes`` /
    ``buffer_capacity`` / exclusions so the fitted budget reflects the
    operating point the final search actually runs at — a user
    ``max_probes`` below the budget clamp's cap lowers calibration
    recall too, and the fit widens the budget (or honestly reports
    best-effort at max fan-out) instead of silently missing the
    target.

    The CI margin is sized from the ACTUAL effective sample (fitted
    qid count, bounded by a supplied groundtruth's distinct qids).
    ``calibration_validation_queries`` > 0 holds out that many
    additional disjoint qids and grades the fitted budget on them
    before serving (calibrate.validate_budget), widening until the
    held-out recall clears the target — see
    ivf._fit_budget_for_target for the rationale."""
    import time as _time

    from scalablevectorsearch_spark.operators.calibrate import (
        calibrate_probe_budget,
        calibration_sample_size,
        margined_target,
        validate_budget,
    )
    from scalablevectorsearch_spark.operators.flat import flat_knn

    if stats is None:
        stats = {}
    if calibration_queries == "auto":
        auto_fit, auto_val = calibration_sample_size(target_recall, k)
        calibration_queries = auto_fit
        if int(calibration_validation_queries) == 0:
            calibration_validation_queries = auto_val
        stats["auto_sized"] = (auto_fit, auto_val)
    calibration_queries = int(calibration_queries)
    qlong = F.col(qid_col).cast("long")
    n_val = max(0, int(calibration_validation_queries))
    all_qids = [
        int(r[0])
        for r in queries.select(qlong.alias("q"))
        .orderBy("q")
        .limit(int(calibration_queries) + n_val)
        .collect()
    ]
    fit_qids = all_qids[:calibration_queries]
    val_qids = all_qids[calibration_queries:]
    sample_q = queries.filter(qlong.isin(fit_qids))

    def exact_gt(sq, qids_key):
        """Exact groundtruth for one qid sample, cached on the index
        (gt-beside-the-manifest analog: the one-time exact scan is
        keyed by everything it depends on, so re-calibration skips it)
        — except under exclude_df, whose identity cannot be keyed.
        Returns (gt, was_cached)."""
        gt_key = None
        if exclude_df is None:
            gt_key = (
                "gt", k, index.distance, tuple(qids_key), str(where),
                tuple(sorted(int(x) for x in exclude_ids)) if exclude_ids else (),
            )
            cached = index.cal_cache.get(gt_key)
            if cached is not None:
                return index.base.sparkSession.createDataFrame(cached), True
        base = index.base
        if where is not None:
            base = base.filter(where)
        if exclude_ids:
            base = base.filter(
                ~F.col(index.id_col).cast("long").isin(
                    [int(x) for x in exclude_ids]
                )
            )
        if exclude_df is not None:
            base = base.join(
                exclude_df.select(
                    F.col(exclude_df.columns[0]).cast("long").alias(index.id_col)
                ),
                on=index.id_col,
                how="anti",
            )
        gt = flat_knn(
            base, sq, k=k, distance=index.distance,
            id_col=index.id_col, vec_col=index.vec_col, qid_col=qid_col,
            qvec_col=qvec_col, round_to=4, decode=index.vec_decode,
        )
        if gt_key is not None:
            pdf = gt.toPandas()
            index.cal_cache[gt_key] = pdf
            return index.base.sparkSession.createDataFrame(pdf), False
        return gt, False

    t_gt = _time.perf_counter()
    n_fit = max(1, len(fit_qids))
    supplied_gt = groundtruth
    if groundtruth is not None:
        n_fit = min(
            n_fit, max(1, groundtruth.select(qid_col).distinct().count())
        )
        stats["gt_cached"] = False
    else:
        groundtruth, stats["gt_cached"] = exact_gt(sample_q, fit_qids)
    stats["gt_sec"] = _time.perf_counter() - t_gt

    def gt_for_validation(vq, vqids):
        # reuse a supplied groundtruth that already covers the held-out
        # qids; pay the internal exact scan only when it must be
        if supplied_gt is not None:
            vgt = supplied_gt.filter(
                F.col(qid_col).cast("long").isin(vqids)
            )
            if vgt.select(qid_col).distinct().count() == len(vqids):
                return vgt
        return exact_gt(vq, vqids)[0]
    stats["n_fit_qids"] = n_fit
    fit_target = margined_target(target_recall, calibration_margin, k, n_fit)
    stats["fit_target"] = fit_target
    # one persisted filtered scan shared across EVERY probe-budget
    # evaluation of the fit loop AND the validation evals — without it
    # each calibration step re-stamps the full base (O(log n_shards)
    # extra full-base passes), the same sharing vamana_search's block
    # loop does
    scan_override = None
    if where is not None:
        from pyspark.storagelevel import StorageLevel

        scan_override = _filtered_scan(index, where).persist(
            StorageLevel.MEMORY_AND_DISK
        )

    def search_at(b, q):
        return vamana_search(
            index, q, k, search_window_size=sws, qid_col=qid_col,
            qvec_col=qvec_col, round_to=4, probe_budget=b, router=router,
            max_probes=max_probes, buffer_capacity=buffer_capacity,
            exclude_ids=exclude_ids, exclude_df=exclude_df, where=where,
            scan_override=scan_override,
        )

    t_fit = _time.perf_counter()
    if budget_hint is not None:
        stats["budget_hint"] = float(budget_hint)
    try:
        cal = calibrate_probe_budget(
            lambda b: search_at(b, sample_q),
            groundtruth, k, target_recall=fit_target,
            max_budget=float(index.n_shards), hint=budget_hint,
        )
        stats["fit_sec"] = _time.perf_counter() - t_fit
        stats["fit_evals"] = len(cal.probes)
        stats["fitted_budget"] = cal.probe_budget
        stats["fit_recall"] = cal.recall
        budget = cal.probe_budget
        if val_qids:
            t_val = _time.perf_counter()
            val_q = queries.filter(qlong.isin(val_qids))
            val_gt = gt_for_validation(val_q, val_qids)
            stats["n_val_qids"] = len(val_qids)
            budget = validate_budget(
                lambda b: search_at(b, val_q),
                val_gt, k, target_recall, budget,
                max_budget=float(index.n_shards), stats=stats,
            )
            stats["val_sec"] = _time.perf_counter() - t_val
            stats["validated_budget"] = budget
    finally:
        if scan_override is not None:
            scan_override.unpersist()
    return budget


def _filtered_scan(index: VamanaIndex, where) -> DataFrame:
    """The where= scan: base re-sharded map-side (same deterministic
    assignment the build used, no id join) with the predicate evaluated
    as a __keep flag at the parquet scan — the metadata-free persisted
    layout cannot carry the predicate's columns."""
    w = F.expr(where) if isinstance(where, str) else where
    return _by_shard(
        _sharded(
            index.base, index.n_shards, index.id_col, index.shard_model,
            index.vec_col, index.closure_bp, index.vec_decode,
            stamp_hierarchical=index.stamp_hierarchical,
        ).select(
            "shard_id",
            F.col(index.id_col).cast("long").alias("__id"),
            F.col(index.vec_col).alias("__vec"),
            w.cast("boolean").alias("__keep"),
        ),
        n_keys=index.n_shards,
    )


def _vamana_search_block(
    index: VamanaIndex,
    qp: pd.DataFrame,
    k: int,
    sws: int,
    excl,
    exclude_df: DataFrame | None,
    buffer_capacity: int | None,
    n_probes: int | None,
    router,
    maximize: bool,
    scale: float | None,
    sc,
    deadline: float | None = None,
    epsilon_bp: int | None = None,
    max_probes: int | None = None,
    probe_budget: float | None = None,
    where=None,
    scan_override: DataFrame | None = None,
) -> tuple[DataFrame, object]:
    """One query block's shard-cogroup search + merge; returns the
    ranked result and the block's broadcast (caller frees it when
    iterating blocks eagerly). ``scan_override``: a pre-built (usually
    persisted) filtered scan shared across query blocks."""
    params, distance = index.params, index.distance
    vec_decode = index.vec_decode
    qids = qp["qid"].to_numpy(dtype=np.int64)
    Q = np.stack(qp["qv"].to_numpy()).astype(np.float64)
    probe_of = None
    min_probes = None
    if probe_budget is not None:
        # budget-invariant adaptive probing: fit the epsilon cutoff on
        # THIS block's query geometry (fit_epsilon_bp binary-searches
        # integer basis points — deterministic given the block).
        # The per-query probe count is CLAMPED to [~3/4 budget,
        # 2x budget] and the fit accounts for the clamp: an unclamped
        # budget-fitted epsilon has a long-tailed probe distribution
        # whose under-probing tail costs more recall than the
        # over-probing tail buys (recall is concave in probes) — on
        # signal-free uniform data it measurably UNDERPERFORMS a fixed
        # fan-out at equal mean probes, while the clamped fit matches
        # fixed there and beats both fixed and unclamped on
        # mixed-difficulty clustered data (tools/probe_alloc_exp.py).
        from scalablevectorsearch_spark.operators.ivf import (
            budget_probe_clamp,
            fit_epsilon_bp,
        )

        n_sh = index.shard_model.centroids.shape[0]
        # floor strictly below the budget so small budgets keep
        # adaptivity (budget_probe_clamp docstring); user cap wins
        min_probes, max_probes = budget_probe_clamp(probe_budget, n_sh, max_probes)
        epsilon_bp = fit_epsilon_bp(
            Q, index.shard_model.centroids, float(probe_budget), distance,
            min_probes=min_probes, max_probes=max_probes,
        )
    if epsilon_bp is not None:
        if index.shard_model is None:
            raise ValueError("epsilon_bp routing requires a kmeans-sharded index")
        if n_probes is not None:
            raise ValueError("epsilon_bp is mutually exclusive with n_probes")
        if router is not None:
            # two-level composition (memory_based.h:577-586 + :508):
            # the centroid router proposes candidates sublinearly,
            # epsilon refines among them
            from scalablevectorsearch_spark.operators.ivf import (
                probe_clusters_epsilon_routed,
            )

            sel = probe_clusters_epsilon_routed(
                Q, index.shard_model.centroids, router, epsilon_bp,
                max_probes=max_probes, distance=distance,
                min_probes=min_probes,
            )
        else:
            from scalablevectorsearch_spark.operators.ivf import probe_clusters_epsilon

            sel = probe_clusters_epsilon(
                Q, index.shard_model.centroids, epsilon_bp, max_probes=max_probes,
                distance=distance, min_probes=min_probes,
            )
        acc: dict[int, list[int]] = {}
        for qi, cids in enumerate(sel):
            for c in cids:
                acc.setdefault(int(c), []).append(qi)
        probe_of = {c: np.asarray(v, dtype=np.int64) for c, v in acc.items()}
    elif n_probes is not None:
        if index.shard_model is None:
            raise ValueError("n_probes routing requires a kmeans-sharded index")
        if router is not None:
            from scalablevectorsearch_spark.operators.router import route

            probes = route(router, Q, min(n_probes, index.n_shards))
        else:
            from scalablevectorsearch_spark.operators.ivf import probe_clusters

            probes = probe_clusters(
                Q, index.shard_model.centroids, min(n_probes, index.n_shards), distance
            )
        probe_of = {
            int(c): np.nonzero((probes == c).any(axis=1))[0]
            for c in np.unique(probes)
            if c >= 0
        }

    bc = sc.broadcast((qids, Q, excl, probe_of))

    def search_fn(key, vdf: pd.DataFrame, gdf: pd.DataFrame) -> pd.DataFrame:
        if len(vdf) == 0 or len(gdf) == 0:
            return pd.DataFrame({"qid": [], "neighbor_id": [], "distance": []})
        vdf = vdf.sort_values("__id").reset_index(drop=True)
        gids = vdf["__id"].to_numpy(dtype=np.int64)
        X = np.stack(vdf["__vec"].to_numpy()).astype(np.float64)
        if vec_decode is not None:
            X = vec_decode(X)
        del_flag = (
            vdf["__del"].to_numpy(dtype=bool) if "__del" in vdf.columns else None
        )
        graph, entry = _decode_adjacency(gids, gdf)
        if entry is None:
            entry = 0
        mqids, mQ, mexcl, mprobe = bc.value
        if mprobe is not None:
            qsel = mprobe.get(int(key[0]))
            if qsel is None or len(qsel) == 0:
                return pd.DataFrame({"qid": [], "neighbor_id": [], "distance": []})
            mqids, mQ = mqids[qsel], mQ[qsel]
        valid = None
        if "__keep" in vdf.columns:
            # where= predicate flag: non-matching nodes stay traversable
            # waypoints but are never emitted (tombstone mechanism);
            # a NULL predicate result is NOT a match (SQL semantics)
            keep = vdf["__keep"].to_numpy()
            valid = np.where(pd.isna(keep), False, keep).astype(bool)
        if mexcl is not None and len(mexcl):
            m = ~np.isin(gids, mexcl)
            valid = m if valid is None else (valid & m)
        if del_flag is not None and del_flag.any():
            m = ~del_flag
            valid = m if valid is None else (valid & m)
        ids, ds = search_graph(
            X, graph, entry, mQ, k, sws, distance, valid=valid,
            capacity=buffer_capacity, deadline=deadline,
        )
        nq, kk = ids.shape
        mask = ids.reshape(-1) >= 0
        dist = ds.reshape(-1)
        if maximize:
            dist = -dist  # local kernel minimizes; restore similarity sign
        if scale is not None:
            dist = np.floor(dist * scale + 0.5) / scale
        return pd.DataFrame(
            {
                "qid": np.repeat(mqids, kk)[mask],
                "neighbor_id": gids[ids.reshape(-1)[mask]],
                "distance": dist[mask],
            }
        )

    if scan_override is not None:
        scan = scan_override
    elif where is not None:
        # filtered search: the predicate needs the base's metadata
        # columns, which the persisted (id, vec)-only layout dropped —
        # re-shard the base map-side with a __keep flag (_filtered_scan;
        # one exchange by shard_id, which the per-shard kernels need
        # anyway)
        scan = _filtered_scan(index, where)
    elif index.layout is not None:
        # persisted shard-partitioned layout: no base shuffle at search
        scan = index.layout
    else:
        scan = _by_shard(
            _sharded(
                index.base, index.n_shards, index.id_col, index.shard_model,
                index.vec_col, index.closure_bp, index.vec_decode,
                stamp_hierarchical=index.stamp_hierarchical,
            ).select(
                "shard_id",
                F.col(index.id_col).cast("long").alias("__id"),
                F.col(index.vec_col).alias("__vec"),
            ),
            n_keys=index.n_shards,
        )
    if exclude_df is not None:
        if excl is not None:
            raise ValueError("pass exclude_ids or exclude_df, not both")
        # broadcast-join flag stamp: narrow op, the scan's shard
        # partitioning survives and the skip-set never touches the driver
        flags = exclude_df.select(
            F.col(exclude_df.columns[0]).cast("long").alias("__id"),
            F.lit(True).alias("__del"),
        )
        scan = scan.join(F.broadcast(flags), "__id", "left").withColumn(
            "__del", F.coalesce(F.col("__del"), F.lit(False))
        )
    graph = index.graph
    if probe_of is not None:
        # unprobed shards never reach the kernel (pruning on a persisted
        # shard-partitioned layout)
        probed = sorted(probe_of)
        scan = scan.filter(F.col("shard_id").isin(probed))
        graph = graph.filter(F.col("shard_id").isin(probed))
    cand = (
        scan.groupBy("shard_id")
        .cogroup(_by_shard(graph, n_keys=index.n_shards).groupBy("shard_id"))
        .applyInPandas(search_fn, RESULT_SCHEMA)
    )
    if index.closure_bp is not None:
        # closure replicas: the same neighbor can surface from several
        # cells; distances come from BLAS over differently-shaped shard
        # matrices, so last-ulp jitter is possible — keep the BEST
        # distance per (qid, neighbor_id) so the survivor is
        # deterministic regardless of float jitter
        keep = F.max("distance") if maximize else F.min("distance")
        cand = cand.groupBy("qid", "neighbor_id").agg(keep.alias("distance"))
    out = topk_per_group(
        cand,
        group_col="qid",
        order_col="distance",
        k=k,
        ascending=not maximize,
        tie_col="neighbor_id",
        num_partitions=merge_partitions(len(Q), k, index.graph.sparkSession),
    )
    return out, bc


def graph_degree_stats(graph: DataFrame) -> DataFrame:
    """Degree histogram (utils/graph_stat.cpp parity)."""
    return (
        graph.select(F.size("neighbors").alias("degree"))
        .groupBy("degree")
        .agg(F.count("*").alias("n_nodes"))
        .orderBy("degree")
    )
