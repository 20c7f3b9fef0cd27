"""Flat exact k-NN — the exhaustive scan operator and the oracle for
every approximate index.

Parity: FlatIndex search (/root/reference/include/svs/index/flat/flat.h:159,
:322 tiled scan, :421 cartesian distance microkernel, :209 tile sizing).

Spark plan (scale-first):
 - The query batch is driver-resident (Q x d), exactly as in the reference
   (queries arrive as one numpy array through the Python bindings,
   bindings/python/include/svs/python/manager.h:34-47). It is shipped once
   per executor via ``SparkContext.broadcast`` (the reference's
   BroadcastDistance spirit, flat.h:379-410); the BASE table — the 100 TB
   side — is never shuffled and is scanned exactly ONCE regardless of the
   query count: query chunks are iterated *inside* the per-partition
   kernel, so each Arrow batch is read once and fed to every chunk.
 - ``mapInArrow`` streams each base partition through a numpy float64
   distance kernel keeping a running per-query top-k (the reference's
   per-tile partial top-k, i.e. map-side partial aggregation). The
   vector column decodes straight from the Arrow values buffer into the
   (n, d) kernel matrix — no per-row object conversion. Each partition
   emits only Q x k candidate rows.
 - A final window top-k over Q x k x n_partitions rows merges partials —
   the shuffle moves O(Q·k·P) rows regardless of base size.

Predicate-filtered search (flat.h:290-295): pass ``where`` — the filter is
applied to the base scan *before* the kernel, so Catalyst pushes it into
the Parquet scan (the reference evaluates its predicate per-row inside the
scan loop; pushdown is strictly better).

Determinism: float64 kernel; when ``round_to`` is set, selection happens
on the integer key ``floor(d * 10^round_to + 0.5)`` with ties broken by
ascending id — a total order identical in numpy, Spark SQL, and a DuckDB
oracle (round-half-up, no banker's rounding), so partial top-k, the merge
window, and the oracle all pick the same rows (neighbor.h id-ordered
comparators). With ``round_to=None`` raw float64 keys are used; exact
float ties are still broken by id.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from scalablevectorsearch_spark.functions.distances import (
    fix_queries,
    is_similarity,
    resolve_kernel,
)
from scalablevectorsearch_spark.operators.topk import merge_partitions, topk_per_group

RESULT_SCHEMA = "qid long, neighbor_id long, distance double"

_ID_SENTINEL = np.iinfo(np.int64).max


def _merge_topk(
    best_key: np.ndarray,
    best_id: np.ndarray,
    new_key: np.ndarray,
    new_id: np.ndarray,
    k: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Exact per-row top-k under the total order (key asc, id asc).

    Concatenates the running buffer with the new candidates, selects with
    argpartition + a tie pad, then verifies no equal-key candidate was
    dropped at the boundary (argpartition picks arbitrarily among equal
    keys); flagged rows fall back to a full sort. Exact for any tie
    multiplicity — fixes the bounded k+16 pad of the previous revision.
    """
    key = np.concatenate([best_key, new_key], axis=1)
    ids = np.concatenate([best_id, new_id], axis=1)
    nq, width = key.shape
    if width <= k:
        order = np.lexsort((ids, key), axis=1)
        return np.take_along_axis(key, order, axis=1), np.take_along_axis(ids, order, axis=1)

    kk = min(k + 64, width)
    if kk < width:
        part = np.argpartition(key, kk - 1, axis=1)[:, :kk]
        sel_key = np.take_along_axis(key, part, axis=1)
        sel_id = np.take_along_axis(ids, part, axis=1)
    else:
        sel_key, sel_id = key, ids
    order = np.lexsort((sel_id, sel_key), axis=1)[:, :k]
    out_key = np.take_along_axis(sel_key, order, axis=1)
    out_id = np.take_along_axis(sel_id, order, axis=1)

    if kk < width:
        # boundary-tie audit: if more than kk entries are <= the kept k-th
        # key, equal-key/lower-id entries may have been dropped — redo
        # those rows exactly.
        boundary = out_key[:, -1:]
        n_le = (key <= boundary).sum(axis=1)
        bad = np.nonzero(n_le > kk)[0]
        for r in bad:
            o = np.lexsort((ids[r], key[r]))[:k]
            out_key[r] = key[r, o]
            out_id[r] = ids[r, o]
    return out_key, out_id


def _scan_kernel(
    bc,
    distance: str,
    k: int,
    chunk_size: int,
    round_to: int | None,
    deadline: float | None = None,
    decode=None,
):
    """Build the mapInArrow function: one pass over the partition's
    Arrow batches, updating a running top-k for every query chunk.
    ``deadline`` (epoch seconds): checked before each Arrow batch — the
    reference's per-tile cancel() predicate (flat.h:344-346); an
    expired deadline fails the task immediately instead of finishing
    the partition."""
    maximize = is_similarity(distance)
    scale = None if round_to is None else float(10**round_to)
    kernel = resolve_kernel(distance)  # bound driver-side (custom kernels ship in closure)
    builtin = distance in ("l2", "ip", "cosine")

    def fn(batches):
        import time as _time

        import pyarrow as pa

        qids, Q = bc.value
        nqt, d = Q.shape
        q_fixed = fix_queries(Q, distance) if builtin else None  # amortized across tiles
        if scale is None:
            best_key = np.full((nqt, k), np.inf, dtype=np.float64)
        else:
            best_key = np.full((nqt, k), np.iinfo(np.int64).max, dtype=np.int64)
        best_id = np.full((nqt, k), _ID_SENTINEL, dtype=np.int64)
        n_chunks = max(1, math.ceil(nqt / chunk_size))
        seen = False
        for rb in batches:
            if deadline is not None and _time.time() > deadline:
                raise TimeoutError(
                    f"search deadline exceeded mid-partition (deadline={deadline})"
                )
            n = rb.num_rows
            if n == 0:
                continue
            seen = True
            ids = rb.column(0).to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
            vec = rb.column(1)
            # Arrow-native decode: the list array's flattened values
            # buffer IS the (n, d) matrix — no per-row object stacking
            flat = vec.flatten().to_numpy(zero_copy_only=False)
            if decode is None:
                if vec.null_count or len(flat) != n * d:
                    raise ValueError(
                        f"vector column must be non-null uniform dim {d}; "
                        f"got {len(flat)} values for {n} rows"
                    )
                B = flat.reshape(n, d)
            else:
                # compressed storage row (e.g. LVQ packed codes):
                # reshape to the storage width, decode to (n, d) in one
                # vectorized numpy pass — the in-register decompression
                # of the reference's compressed scan kernels
                import pyarrow.compute as pc

                lens = pc.list_value_length(vec).to_numpy(zero_copy_only=False)
                if vec.null_count or not len(lens) or (lens != lens[0]).any():
                    raise ValueError(
                        "packed vector column must be non-null with a uniform "
                        "storage width (ragged packed rows cannot be reshaped)"
                    )
                B = decode(flat.reshape(n, int(lens[0])))
                if B.shape != (n, d):
                    raise ValueError(
                        f"decode returned {B.shape}, expected {(n, d)}"
                    )
            for c in range(n_chunks):
                sl = slice(c * chunk_size, (c + 1) * chunk_size)
                qf = None if q_fixed is None else q_fixed[sl]
                D = kernel(Q[sl], B, q_fixed=qf)  # (nq_c, n)
                if scale is not None:
                    key = np.floor(D * scale + 0.5).astype(np.int64)
                else:
                    key = D
                if maximize:
                    key = -key
                idmat = np.broadcast_to(ids, key.shape).astype(np.int64, copy=False)
                bk, bi = _merge_topk(best_key[sl], best_id[sl], key, idmat, k)
                best_key[sl], best_id[sl] = bk, bi
        if not seen:
            return
        mask = best_id.reshape(-1) != _ID_SENTINEL
        key_flat = best_key.reshape(-1).astype(np.float64)
        if maximize:
            key_flat = -key_flat
        dist = key_flat if scale is None else key_flat / scale
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(np.repeat(qids, k)[mask], type=pa.int64()),
                pa.array(best_id.reshape(-1)[mask], type=pa.int64()),
                pa.array(dist[mask], type=pa.float64()),
            ],
            names=["qid", "neighbor_id", "distance"],
        )

    return fn


def query_blocks(queries: DataFrame, qid_col: str, qvec_col: str, max_block: int):
    """Yield driver-side pandas blocks of at most ~``max_block`` queries
    without ever materializing the full query table: blocks are
    xxhash64-partitioned on qid (uniform regardless of qid layout) and
    collected one at a time — the caller runs one distributed pass per
    block and frees the block before fetching the next, so driver
    memory is bounded by a single block for arbitrarily large query
    tables."""
    sel = queries.select(
        F.col(qid_col).cast("long").alias("qid"), F.col(qvec_col).alias("qv")
    )
    n_q = sel.count()
    n_blocks = max(1, math.ceil(n_q / max_block))
    if n_blocks == 1:
        pdf = sel.toPandas()
        if len(pdf):
            yield pdf
        return
    h = F.pmod(F.xxhash64(F.col("qid")), F.lit(n_blocks))
    for b in range(n_blocks):
        pdf = sel.filter(h == F.lit(b)).toPandas()
        if len(pdf):
            yield pdf


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
    max_query_block: int | None = None,
    deadline: float | None = None,
    decode=None,
    query_batch: tuple | None = None,
) -> DataFrame:
    """Exact k-NN of every query against the base table.

    Returns ``(qid BIGINT, rank BIGINT, neighbor_id BIGINT,
    distance DOUBLE)`` with rank 1 = best (nearest for l2, highest for
    ip/cosine), ties broken by ascending neighbor id. With ``round_to``
    set (default 4), ranking happens on ``floor(d*10^round_to + 0.5)``
    and the emitted distance is that rounded value — bit-stable against
    a SQL oracle using the same formula.

    ``max_query_block``: for query TABLES too large for the driver —
    iterate hash-partitioned blocks of at most this many queries, one
    base scan per block, materializing each block's Q_b×k top-k before
    freeing its broadcast (driver memory bounded by one block; total
    cost n_blocks base scans instead of one). Default None = single
    batch, one scan total — the right plan whenever the batch fits.

    ``deadline``: absolute epoch-seconds budget checked inside the scan
    kernel per Arrow batch (flat.h:344-346 cancel parity) — combine
    with operators.cancel.run_with_timeout for mid-stage interruption
    of long single-stage scans.

    ``decode``: optional vectorized storage decoder — called on each
    Arrow batch's (n, storage_width) float64 matrix and returning the
    (n, d) vector matrix (the reference's compressed-scan extension
    point, extensions/flat/*.h). Used by operators.lvq to scan packed
    codes directly; ships in the task closure like custom distance
    kernels.

    ``query_batch``: optional pre-collected ``(qids int64 array,
    Q float64 matrix)`` for the SAME query table — a caller that
    already collected the batch (e.g. a two-phase search whose re-rank
    needs it too) skips this function's own collect job (r13, VERDICT
    item 3: reuse one collected batch across the chain). Mutually
    exclusive with ``max_query_block``."""
    qvec_col = qvec_col or vec_col
    if where is not None:
        base = base.filter(where)
    scan = base.select(F.col(id_col).cast("long").alias("__id"), F.col(vec_col).alias("__vec"))
    sc = base.sparkSession.sparkContext

    if query_batch is not None:
        if max_query_block is not None:
            raise ValueError("query_batch and max_query_block are exclusive")
        blocks = iter([query_batch])
    elif max_query_block is None:
        blocks = iter(
            [
                queries.select(
                    F.col(qid_col).cast("long").alias("qid"),
                    F.col(qvec_col).alias("qv"),
                ).toPandas()
            ]
        )
    else:
        blocks = query_blocks(queries, qid_col, qvec_col, max_query_block)

    parts: list[DataFrame] = []
    for qp in blocks:
        if isinstance(qp, tuple):
            qids = np.asarray(qp[0], dtype=np.int64)
            Q = np.asarray(qp[1], dtype=np.float64)
        elif len(qp) == 0:
            continue
        else:
            qids = qp["qid"].to_numpy(dtype=np.int64)
            Q = np.stack(qp["qv"].to_numpy()).astype(np.float64)
        if len(qids) == 0:
            continue
        bc = sc.broadcast((qids, Q))
        fn = _scan_kernel(bc, distance, k, query_chunk_size, round_to, deadline, decode)
        cand = scan.mapInArrow(fn, RESULT_SCHEMA)
        part = topk_per_group(
            cand,
            group_col="qid",
            order_col="distance",
            k=k,
            ascending=not is_similarity(distance),
            tie_col="neighbor_id",
            num_partitions=merge_partitions(len(qids), k, base.sparkSession),
        )
        if max_query_block is not None:
            # eager: materialize this block's Q_b×k result, then drop
            # the block's broadcast before the next block is fetched
            part = part.persist()
            part.count()
            bc.unpersist()
        parts.append(part)
    if not parts:
        raise ValueError("empty query batch")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select("qid", "rank", "neighbor_id", "distance")
