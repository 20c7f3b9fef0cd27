"""LeanVec — linear dimensionality reduction for vector search:
search in a projected low-dimensional space, re-rank the survivors at
full precision.

Parity: the reference's LeanVec dataset family — storage kinds
LeanVec4x4 / LeanVec4x8 / LeanVec8x8 (/root/reference/bindings/cpp/
include/svs/runtime/api_defs.h:98-109), the persisted
leanvec_dims / primary_kind / secondary_kind config
(/root/reference/include/svs/index/ivf/data_traits.h:49-54), and the
training surface that either LEARNS the projection matrices from data
or accepts EXTERNAL ones (/root/reference/bindings/cpp/include/svs/
runtime/training.h:28-71 — ``LeanVecTrainingData::build`` from data,
``leanvec_matrices_`` external pair in
dynamic_vamana_index_leanvec_impl.h:60-76). The method itself is
published (Tepper et al., "LeanVec: Searching vectors faster by
making them fit", 2023): project data with A and queries with a
possibly different matrix B (OOD variant), run the index in the
reduced space, then re-rank candidate ids against the full-dimension
(secondary) representation.

Spark shape (scale-first):
 - TRAIN: PCA via the distributed second-moment matrix — one
   ``mapInArrow`` pass emits per-batch partial sums of the d x d
   centered outer product (d^2 doubles per batch, trivially small),
   the driver sums, rounds canonically (1e-9 half-up), and runs a
   dense symmetric eigendecomposition (d x d — driver-sized at any
   data scale; this is the standard distributed-PCA shape). Sign
   convention: each eigenvector's largest-|.| component is made
   positive, so the model is reproducible across runs.
 - PROJECT: one Arrow-batched numpy matmul (BLAS) — (X - mu) @ P for
   the data side; queries center for l2 but NOT for ip (q . mu is a
   per-query constant for ip, so leaving the query uncentered
   preserves ranking while keeping the projection a pure linear map).
 - SEARCH: primary k-NN in the m-dim space over the gated
   flat/Vamana engines (distances over m dims — the bandwidth and
   compute win), then the top ``k_reorder`` candidates re-rank with
   exact full-dimension distances (the k_reorder pattern of
   operators/ivf.py). The primary side COMPOSES with operators/lvq
   (LeanVec4x8 = LVQ4 primary on projected data + LVQ8 secondary).
"""

from __future__ import annotations

from collections.abc import Iterator
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from scalablevectorsearch_spark.functions.distances import is_similarity


def _normalized(df: DataFrame, vec_col: str) -> DataFrame:
    """Unit-normalize the vector column (Catalyst, float64 — identical
    left-to-right summation in the DuckDB oracles). Cosine ranking over
    x equals IP ranking over x/|x| for any fixed query, which is how the
    cosine LeanVec primary reduces to the ip machinery (the generic
    distance dispatch of the reference: include/svs/core/distance/
    cosine.h:102, selector include/svs/core/distance.h:41).

    Zero-norm guard: an all-zero vector would divide 0/0 into NaN
    components that poison the projected ranking silently; clamping the
    norm to the smallest normal double maps it to the zero vector
    instead (same outcome as flat_knn's cosine, where 0-similarity is
    deterministic), and leaves every nonzero norm bit-identical — so
    the DuckDB oracles (which carry no guard) still match."""
    nrm = F.sqrt(
        F.aggregate(
            F.col(vec_col), F.lit(0.0), lambda a, x: a + x.cast("double") * x.cast("double")
        )
    )
    nrm = F.greatest(nrm, F.lit(2.2250738585072014e-308))
    return df.withColumn(
        vec_col, F.transform(F.col(vec_col), lambda x: x.cast("double") / nrm)
    )


@dataclass
class LeanVecModel:
    """Projection pair + centering vector (training.h's
    LeanVecTrainingData / the external-matrices constructor)."""

    data_matrix: np.ndarray   # (dims, leanvec_dims)
    query_matrix: np.ndarray  # (dims, leanvec_dims)
    mean: tuple               # canonical 1e-6-rounded dataset mean
    dims: int = field(init=False)
    leanvec_dims: int = field(init=False)

    def __post_init__(self):
        self.data_matrix = np.ascontiguousarray(self.data_matrix, dtype=np.float64)
        self.query_matrix = np.ascontiguousarray(self.query_matrix, dtype=np.float64)
        self.dims, self.leanvec_dims = self.data_matrix.shape
        if self.query_matrix.shape != self.data_matrix.shape:
            raise ValueError(
                f"query_matrix shape {self.query_matrix.shape} != "
                f"data_matrix shape {self.data_matrix.shape}"
            )
        if not 0 < self.leanvec_dims <= self.dims:
            raise ValueError(
                f"leanvec_dims must be in (0, {self.dims}], got {self.leanvec_dims}"
            )
        if len(self.mean) != self.dims:
            raise ValueError(f"mean has {len(self.mean)} dims, expected {self.dims}")

    @classmethod
    def truncation(cls, dims: int, leanvec_dims: int, mean=None) -> "LeanVecModel":
        """Deterministic coordinate-truncation projection (the
        external-matrices path with P = I[:, :m]) — keeps the first
        ``leanvec_dims`` centered coordinates. Exactly reproducible in
        SQL, so the full LeanVec machinery hash-gates through it."""
        P = np.eye(dims, dtype=np.float64)[:, :leanvec_dims]
        mu = tuple(0.0 for _ in range(dims)) if mean is None else tuple(mean)
        return cls(data_matrix=P, query_matrix=P, mean=mu)


def dataset_mean(df: DataFrame, vec_col: str, round_decimals: int = 6) -> tuple:
    import math

    rows = (
        df.select(F.posexplode(vec_col).alias("pos", "x"))
        .groupBy("pos")
        .agg(F.avg(F.col("x").cast("double")).alias("m"))
        .collect()
    )
    if not rows:
        raise ValueError("empty dataset")
    s = float(10**round_decimals)
    mean = [0.0] * len(rows)
    for r in rows:
        mean[r["pos"]] = math.floor(r["m"] * s + 0.5) / s
    return tuple(mean)


def leanvec_train(
    df: DataFrame,
    leanvec_dims: int,
    vec_col: str = "vector",
) -> LeanVecModel:
    """PCA projection: top-``leanvec_dims`` eigenvectors of the
    centered second-moment matrix. The d x d partial sums travel as one
    flattened array per Arrow batch; the driver-side eigh is O(d^3) on
    a d x d matrix — independent of row count, the distributed-PCA
    standard. Both matrices equal (the in-distribution variant;
    pass external matrices to LeanVecModel for OOD)."""
    mean = dataset_mean(df, vec_col)
    mu = np.asarray(mean, dtype=np.float64)
    d = len(mean)
    if not 0 < leanvec_dims <= d:
        raise ValueError(f"leanvec_dims must be in (0, {d}], got {leanvec_dims}")

    def partials(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        acc = np.zeros((d, d), dtype=np.float64)
        n = 0
        for b in batches:
            col = b.column(0)
            nb = len(col)
            if nb == 0:
                continue
            # zero-copy Arrow decode (the flat.py:154 pattern): the
            # list array's flattened values buffer IS the (n, d) matrix
            flat = col.flatten().to_numpy(zero_copy_only=False)
            if col.null_count or len(flat) != nb * d:
                raise ValueError(
                    f"vector column must be non-null uniform dim {d}; "
                    f"got {len(flat)} values for {nb} rows"
                )
            X = flat.reshape(nb, d).astype(np.float64, copy=False) - mu
            acc += X.T @ X
            n += nb
        yield pa.RecordBatch.from_arrays(
            [pa.array([acc.reshape(-1).tolist()]), pa.array([n])],
            names=["mm", "n"],
        )

    src = df.select(F.col(vec_col).alias("v"))
    parts_df = src.mapInArrow(partials, "mm array<double>, n long")
    n_part = src.rdd.getNumPartitions()
    if n_part > 64:
        # tree-merge: collecting one d x d partial PER PARTITION ships
        # ~P * 8d^2 bytes to the driver (d=768, P=100k -> ~470 GB). A
        # min(sqrt(P), 64)-way intermediate re-sum bounds the driver
        # fetch at 64 partials while each reducer streams its group in
        # ascending stage-1 partition order (hash assignment by
        # pid % k + sortWithinPartitions) — a canonical summation
        # order, so reruns are bit-identical.
        k = max(1, min(int(np.sqrt(n_part)), 64))
        staged = (
            parts_df.withColumn("pid", F.spark_partition_id())
            .repartition(k, F.pmod(F.col("pid"), F.lit(k)))
            .sortWithinPartitions("pid")
            .select("pid", "mm", "n")
        )

        def resum(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
            acc = np.zeros((d, d), dtype=np.float64)
            cnt = 0
            grp = None
            for b in batches:
                if b.num_rows == 0:
                    continue
                # zero-copy batch decode (the flat.py:154 pattern —
                # never per-row as_py in a scale path): the list
                # array's values buffer IS a (rows, d, d) stack
                mm = b.column(1)
                flat = mm.flatten().to_numpy(zero_copy_only=False)
                if mm.null_count or len(flat) != b.num_rows * d * d:
                    raise ValueError("ragged moment partial")
                acc += (
                    flat.reshape(b.num_rows, d, d)
                    .astype(np.float64, copy=False)
                    .sum(axis=0)
                )
                cnt += int(b.column(2).to_numpy(zero_copy_only=False).sum())
                if grp is None:
                    # rows arrive pid-ascending, so this is the
                    # group's min pid — a unique, deterministic
                    # driver-merge sort key
                    grp = int(b.column(0)[0].as_py())
            if grp is None:
                return
            yield pa.RecordBatch.from_arrays(
                [pa.array([acc.reshape(-1).tolist()]), pa.array([cnt]),
                 pa.array([grp])],
                names=["mm", "n", "g"],
            )

        parts = sorted(
            staged.mapInArrow(resum, "mm array<double>, n long, g long").collect(),
            key=lambda r: r["g"],
        )
    else:
        parts = parts_df.collect()
    M = np.zeros((d, d), dtype=np.float64)
    n = 0
    for r in parts:
        M += np.asarray(r["mm"], dtype=np.float64).reshape(d, d)
        n += r["n"]
    if n == 0:
        raise ValueError("empty dataset")
    M /= n
    # canonical rounding so partition-order float jitter cannot flip
    # the eigendecomposition between runs
    M = np.floor(M * 1e9 + 0.5) / 1e9
    w, V = np.linalg.eigh(M)
    P = V[:, np.argsort(w)[::-1][:leanvec_dims]]
    # sign convention: largest-|component| positive per eigenvector
    flip = P[np.abs(P).argmax(axis=0), np.arange(P.shape[1])] < 0
    P[:, flip] *= -1.0
    return LeanVecModel(data_matrix=P, query_matrix=P, mean=mean)


def leanvec_project(
    df: DataFrame,
    model: LeanVecModel,
    side: str = "data",
    vec_col: str = "vector",
    out_col: str = "leanvec",
    center: bool = True,
) -> DataFrame:
    """Append the projected column: (x - mu) @ P (or x @ P with
    ``center=False`` — the ip query convention). One Arrow-batched
    BLAS matmul; all other columns pass through."""
    if side not in ("data", "query"):
        raise ValueError(f"side must be 'data' or 'query', got {side!r}")
    P = model.data_matrix if side == "data" else model.query_matrix
    mu = np.asarray(model.mean, dtype=np.float64) if center else None
    cols = df.columns
    if vec_col not in cols:
        raise ValueError(f"missing column {vec_col!r}")
    schema = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields]
        + [f"`{out_col}` array<double>"]
    )

    d_in = model.dims

    def project(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            n = b.num_rows
            if n == 0:
                continue
            vi = b.schema.names.index(vec_col)
            col = b.column(vi)
            # zero-copy decode + zero-copy encode: values buffer in,
            # BLAS matmul, values buffer out (flat.py:154 pattern) — no
            # per-row Python objects in the projection hot path
            flat = col.flatten().to_numpy(zero_copy_only=False)
            if col.null_count or len(flat) != n * d_in:
                raise ValueError(
                    f"vector column must be non-null uniform dim {d_in}; "
                    f"got {len(flat)} values for {n} rows"
                )
            X = flat.reshape(n, d_in).astype(np.float64, copy=False)
            if mu is not None:
                X = X - mu
            Y = np.ascontiguousarray(X @ P)
            m = Y.shape[1]
            new = pa.ListArray.from_arrays(
                pa.array(np.arange(0, (n + 1) * m, m, dtype=np.int32)),
                pa.array(Y.reshape(-1), type=pa.float64()),
            )
            yield pa.RecordBatch.from_arrays(
                [b.column(i) for i in range(b.num_columns)] + [new],
                names=list(b.schema.names) + [out_col],
            )

    return df.mapInArrow(project, schema)


def leanvec_knn(
    base: DataFrame,
    queries: DataFrame,
    model: LeanVecModel,
    k: int,
    k_reorder: int,
    distance: str = "l2",
    id_col: str = "id",
    vec_col: str = "vector",
    qid_col: str = "qid",
    qvec_col: str | None = None,
    round_to: int | None = 4,
    primary_lvq=None,
    base_projected: DataFrame | None = None,
) -> DataFrame:
    """Two-stage LeanVec k-NN: primary candidate generation in the
    projected space (top ``k_reorder``), exact full-dimension re-rank
    (the paper's pipeline; emitted distances are the exact stage's).
    ``primary_lvq``: optional LVQParams TRAINED ON THE PROJECTED
    data — the primary then runs over LVQ codes (LeanVec4x* storage
    kinds).
    ``base_projected``: the PERSISTED (id, vector[m]) projection of
    ``base`` (from :func:`leanvec_project`) — the reference stores the
    LeanVec dataset projected once at construction; without it every
    search re-projects the full base (fine for one-shots, wasteful for
    serving)."""
    from scalablevectorsearch_spark.operators.flat import flat_knn
    from scalablevectorsearch_spark.operators.lvq import lvq_knn

    if distance not in ("l2", "ip", "cosine"):
        raise ValueError(f"leanvec primary supports l2/ip/cosine, got {distance!r}")
    if k_reorder < k:
        raise ValueError(f"k_reorder={k_reorder} must be >= k={k}")
    qvec_col = qvec_col or vec_col
    # cosine reduces to IP over the unit-normalized data side (query
    # scale is rank-invariant); the exact stage restores true cosine
    primary_distance = "ip" if distance == "cosine" else distance
    center_q = distance == "l2"
    if base_projected is not None:
        # for cosine, the persisted projection must be of the
        # NORMALIZED base (leanvec_project(_normalized(base), ...))
        pb = base_projected.select(
            F.col(id_col).cast("long").alias("id"), F.col(vec_col).alias("vector")
        )
    else:
        data_side = _normalized(base, vec_col) if distance == "cosine" else base
        pb = leanvec_project(data_side, model, "data", vec_col, "__pv").select(
            F.col(id_col).cast("long").alias("id"), F.col("__pv").alias("vector")
        )
    pq = leanvec_project(
        queries, model, "query", qvec_col, "__pv", center=center_q
    ).select(F.col(qid_col).cast("long").alias("qid"), F.col("__pv").alias("vector"))
    if primary_lvq is not None:
        cands = lvq_knn(
            pb, pq, primary_lvq, k=k_reorder, distance=primary_distance,
            round_to=round_to,
        )
    else:
        cands = flat_knn(
            pb, pq, k=k_reorder, distance=primary_distance, round_to=round_to
        )
    return _full_dim_rerank(
        cands, base, queries, k, distance, round_to, id_col, vec_col, qid_col, qvec_col
    )


def _full_dim_rerank(
    cands: DataFrame,
    base: DataFrame,
    queries: DataFrame,
    k: int,
    distance: str,
    round_to: int | None,
    id_col: str,
    vec_col: str,
    qid_col: str,
    qvec_col: str,
) -> DataFrame:
    """Exact secondary stage: re-rank (qid, neighbor_id) candidates on
    the ORIGINAL full-dimension vectors (secondary_kind=float32; swap
    the base for an LVQ8 reconstruction for LeanVec*x8 storage)."""
    from scalablevectorsearch_spark.operators.lvq import _rerank_reconstruction

    recon = base.select(
        F.col(id_col).cast("long").alias("neighbor_id"), F.col(vec_col).alias("__bv")
    )
    q = queries.select(
        F.col(qid_col).cast("long").alias("qid"), F.col(qvec_col).alias("vector")
    )
    return _rerank_reconstruction(cands, recon, q, k, distance, round_to)


def leanvec_vamana_build(
    base: DataFrame,
    model: LeanVecModel,
    vamana_params=None,
    n_shards: int = 8,
    distance: str = "l2",
    id_col: str = "id",
    vec_col: str = "vector",
    primary_lvq=None,
    **build_kw,
):
    """Build a Vamana graph IN the projected space (the reference's
    LeanVec-Vamana: traversal distances are m-dimensional — the
    compute win; re-rank restores full-dimension accuracy at search).
    ``primary_lvq``: LVQParams trained on the PROJECTED data — the
    graph is then built over the LVQ reconstruction of the projection
    (LeanVec4x* / LeanVec8x* primary kinds). Composes with
    shard_by/closure_bp/... like every storage kind."""
    from scalablevectorsearch_spark.operators.vamana import vamana_build

    if distance not in ("l2", "ip", "cosine"):
        raise ValueError(f"leanvec primary supports l2/ip/cosine, got {distance!r}")
    # cosine: graph lives in IP geometry over the normalized projection
    # (cosine.h's normalize-then-IP reduction); the search's exact stage
    # re-ranks with true cosine on the full-dimension secondary
    rerank_distance = distance
    data_side = base
    if distance == "cosine":
        data_side = _normalized(base, vec_col)
        distance = "ip"
    pb = leanvec_project(data_side, model, "data", vec_col, "__pv").select(
        F.col(id_col).alias(id_col), F.col("__pv").alias(vec_col)
    )
    decode = None
    if primary_lvq is not None:
        # LeanVec4x*/8x* primary: the projected rows are LVQ-packed in
        # the layout (m/2-1m bytes per vector) and kernels decode at
        # entry — compression ON TOP of the dimensionality reduction
        from scalablevectorsearch_spark.operators.lvq import (
            lvq_compress,
            lvq_decoder,
            lvq_packed_col,
        )

        if build_kw.get("shard_by") == "kmeans" and build_kw.get("shard_model") is None:
            # centroids live in the projected (decoded) geometry —
            # train before packing, like lvq_vamana_build
            from scalablevectorsearch_spark.operators.kmeans import train_kmeans

            build_kw["shard_model"] = train_kmeans(
                pb, n_shards, build_kw.pop("kmeans_iters", 2), id_col, vec_col
            )
        pb = lvq_compress(pb, primary_lvq, vec_col).select(
            F.col(id_col), lvq_packed_col(primary_lvq).alias(vec_col)
        )
        decode = lvq_decoder(primary_lvq)
    idx = vamana_build(
        pb, vamana_params, n_shards=n_shards, distance=distance,
        id_col=id_col, vec_col=vec_col, vec_decode=decode, **build_kw,
    )
    idx.leanvec_model = model
    # the re-rank metric (persisted): differs from index.distance only
    # for cosine, whose primary runs in IP geometry
    idx.leanvec_distance = rerank_distance
    if primary_lvq is not None:
        # the primary-LVQ params (projected-space mean + bit widths)
        # are part of the index identity: save_vamana persists them and
        # load_vamana rebuilds vec_decode from them — without this the
        # loaded packed index cannot decode its own layout
        idx.lvq_params = primary_lvq
    return idx


def leanvec_vamana_search(
    index,
    queries: DataFrame,
    base: DataFrame,
    k: int,
    k_reorder: int,
    qid_col: str = "qid",
    qvec_col: str = "vector",
    vec_col: str = "vector",
    round_to: int | None = 4,
    **search_kw,
) -> DataFrame:
    """Graph search in the projected space + exact full-dimension
    re-rank against ``base`` (the secondary representation). With an
    exhaustive window the candidate stage equals the flat projected
    scan, so the result EQUALS leanvec_knn's — the metamorphic gate."""
    from scalablevectorsearch_spark.operators.vamana import vamana_search

    model = getattr(index, "leanvec_model", None)
    if model is None:
        raise ValueError("index was not built with leanvec_vamana_build")
    if k_reorder < k:
        raise ValueError(f"k_reorder={k_reorder} must be >= k={k}")
    # cosine indexes traverse in IP geometry (index.distance == "ip")
    # but re-rank with true cosine (leanvec_distance)
    rerank_distance = getattr(index, "leanvec_distance", None) or index.distance
    center_q = index.distance == "l2"
    pq = leanvec_project(
        queries, model, "query", qvec_col, "__pv", center=center_q
    ).select(F.col(qid_col).cast("long").alias("qid"), F.col("__pv").alias(index.vec_col))
    cands = vamana_search(
        index, pq, k_reorder, qid_col="qid", qvec_col=index.vec_col,
        round_to=round_to, **search_kw,
    )
    return _full_dim_rerank(
        cands, base, queries, k, rerank_distance, round_to,
        index.id_col, vec_col, qid_col, qvec_col,
    )
