"""`*vecs` file formats (fvecs/ivecs/bvecs/hvecs), npy ingestion, and
the seeded test-dataset generator.

Parity: /root/reference/include/svs/core/io/vecs.h — :137 reader
(per-vector records ``[int32 dim][dim x elem]``), :103-129 (uniform-dim
validation), :195 writer; bindings/python/src/svs/common.py:62
(read_npy), :214-265 (generate_test_dataset: uniform random data +
queries + brute-force groundtruth); format converters
bindings/python/src/python_bindings.cpp:126-239.

Spark shape: these legacy single-node formats are INGESTION formats —
the engine's native storage is Parquet. Readers parse driver-side with
numpy (the files that exist in the wild fit one machine; a 100 TB
corpus would already be Parquet) and land in a DataFrame immediately;
``vecs_to_parquet`` is the one-time conversion job. Writers exist for
round-trip/export parity."""

from __future__ import annotations

import json
import os

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_KINDS = {
    "fvecs": np.float32,
    "ivecs": np.int32,
    "bvecs": np.uint8,
    "hvecs": np.float16,
}


def _kind_of(path: str, kind: str | None) -> str:
    k = kind or os.path.splitext(path)[1].lstrip(".")
    if k not in _KINDS:
        raise ValueError(f"unknown vecs kind {k!r}; expected one of {sorted(_KINDS)}")
    return k


def read_vecs(path: str, kind: str | None = None) -> np.ndarray:
    """Parse a *vecs file into an (n, d) array. Raises on inconsistent
    per-record dimensions (vecs.h:103-129) or trailing bytes."""
    k = _kind_of(path, kind)
    dtype = _KINDS[k]
    raw = np.fromfile(path, dtype=np.uint8)
    if len(raw) == 0:
        return np.empty((0, 0), dtype=dtype)
    dim = int(raw[:4].view(np.int32)[0])
    if dim <= 0:
        raise ValueError(f"{path}: bad leading dimension {dim}")
    rec_bytes = 4 + dim * np.dtype(dtype).itemsize
    if len(raw) % rec_bytes != 0:
        raise ValueError(f"{path}: size {len(raw)} not a multiple of record size {rec_bytes}")
    n = len(raw) // rec_bytes
    recs = raw.reshape(n, rec_bytes)
    dims = recs[:, :4].copy().view(np.int32).reshape(n)
    if not (dims == dim).all():
        raise ValueError(f"{path}: inconsistent dimensions {set(dims.tolist())}")
    return recs[:, 4:].copy().view(dtype).reshape(n, dim)


def write_vecs(path: str, X: np.ndarray, kind: str | None = None) -> None:
    """Write (n, d) -> *vecs records (vecs.h:195)."""
    k = _kind_of(path, kind)
    dtype = _KINDS[k]
    X = np.ascontiguousarray(X, dtype=dtype)
    n, d = X.shape
    dims = np.full((n, 1), d, dtype=np.int32)
    with open(path, "wb") as f:
        for i in range(n):
            f.write(dims[i].tobytes())
            f.write(X[i].tobytes())


def vecs_to_df(
    spark: SparkSession, path: str, kind: str | None = None, id_offset: int = 0
) -> DataFrame:
    """*vecs file -> DataFrame(id BIGINT, vector ARRAY<FLOAT|INT>)."""
    X = read_vecs(path, kind)
    elem = "int" if X.dtype in (np.int32, np.uint8) else "float"
    rows = [(id_offset + i, X[i].astype(np.float64 if elem == "float" else np.int64).tolist()) for i in range(len(X))]
    return spark.createDataFrame(rows, f"id bigint, vector array<{elem}>")


def vecs_to_parquet(
    spark: SparkSession, src: str, dst: str, kind: str | None = None
) -> None:
    """One-time conversion job: legacy format -> the engine's Parquet
    layout (the f16/bf16 'converters' of §2.1 collapse to a cast here —
    Spark stores FLOAT; low-precision is a storage codec concern)."""
    vecs_to_df(spark, src, kind).write.mode("overwrite").parquet(dst)


def read_binary_matrix(path: str, dtype=np.float32) -> np.ndarray:
    """Binary matrix file (io/binary.h:84-169 parity): header
    ``[uint64 n][uint64 d]`` then n*d row-major elements."""
    with open(path, "rb") as f:
        header = np.fromfile(f, dtype=np.uint64, count=2)
        if len(header) != 2:
            raise ValueError(f"{path}: truncated header")
        n, d = int(header[0]), int(header[1])
        data = np.fromfile(f, dtype=dtype)
    if len(data) != n * d:
        raise ValueError(f"{path}: expected {n * d} elements, found {len(data)}")
    return data.reshape(n, d)


def write_binary_matrix(path: str, X: np.ndarray) -> None:
    """io/binary.h writer parity."""
    X = np.ascontiguousarray(X)
    with open(path, "wb") as f:
        np.asarray(X.shape, dtype=np.uint64).tofile(f)
        X.tofile(f)


#: V1 native-file magic (core/io/native.h:320) — 1024-byte header:
#: [u64 magic][16-byte uuid][u64 num_vectors][u64 dims][zero padding],
#: then row-major data (native.h:310-344)
SVS_MAGIC = 0xCAD4A6B2579980FE
SVS_HEADER_SIZE = 1024


def read_svs(path: str, dtype=np.float32) -> np.ndarray:
    """Read a reference native data file (common.py:120 read_svs parity;
    header layout native.h:310-344). The element dtype is caller-declared
    exactly as in the reference binding ('no type checking is performed')
    but the magic number IS validated here."""
    with open(path, "rb") as f:
        head = f.read(8 + 16 + 8 + 8)
    if len(head) < 40:
        raise ValueError(f"{path}: truncated header")
    magic = int(np.frombuffer(head, dtype=np.uint64, count=1)[0])
    if magic != SVS_MAGIC:
        raise ValueError(
            f"{path}: bad magic {magic:#x} (expected {SVS_MAGIC:#x}) — not a V1 native file"
        )
    n, d = (int(v) for v in np.frombuffer(head[24:40], dtype=np.uint64, count=2))
    X = np.fromfile(path, dtype=dtype, offset=SVS_HEADER_SIZE)
    if len(X) != n * d:
        raise ValueError(f"{path}: expected {n}x{d} elements, found {len(X)}")
    return np.ascontiguousarray(X.reshape(n, d))


def write_svs(path: str, X: np.ndarray) -> None:
    """Write a V1 native data file readable by the reference (zero UUID,
    like lib::UUID(ZeroInitializer) — native.h:326)."""
    X = np.ascontiguousarray(X)
    if X.ndim != 2:
        raise ValueError(f"expected a 2D matrix, got shape {X.shape}")
    header = np.zeros(SVS_HEADER_SIZE, dtype=np.uint8)
    header[0:8] = np.frombuffer(np.uint64(SVS_MAGIC).tobytes(), dtype=np.uint8)
    header[24:32] = np.frombuffer(np.uint64(X.shape[0]).tobytes(), dtype=np.uint8)
    header[32:40] = np.frombuffer(np.uint64(X.shape[1]).tobytes(), dtype=np.uint8)
    with open(path, "wb") as f:
        header.tofile(f)
        X.tofile(f)


def svs_to_df(
    spark: SparkSession, path: str, dtype=np.float32, id_offset: int = 0
) -> DataFrame:
    """Native file -> DataFrame(id BIGINT, vector ARRAY<FLOAT>)."""
    X = read_svs(path, dtype)
    rows = [(id_offset + i, X[i].astype(np.float64).tolist()) for i in range(len(X))]
    return spark.createDataFrame(rows, "id bigint, vector array<float>")


def random_dataset(
    nvectors: int, ndims: int, dtype=np.float32, seed: int | None = None
) -> np.ndarray:
    """Seeded uniform random matrix (common.py:203 random_dataset
    parity)."""
    rng = np.random.default_rng(seed)
    return rng.random((nvectors, ndims)).astype(dtype)


def read_npy(path: str) -> np.ndarray:
    """common.py:62 parity."""
    return np.load(path)


def npy_to_df(spark: SparkSession, path: str, id_offset: int = 0) -> DataFrame:
    X = read_npy(path)
    rows = [(id_offset + i, X[i].astype(np.float64).tolist()) for i in range(len(X))]
    return spark.createDataFrame(rows, "id bigint, vector array<float>")


def generate_test_dataset(
    spark: SparkSession,
    n_vectors: int,
    n_queries: int,
    n_dims: int,
    out_dir: str,
    seed: int = 42,
    k: int = 10,
    distance: str = "l2",
) -> dict:
    """Seeded uniform-random dataset + queries + brute-force groundtruth
    (common.py:214-265 parity). Writes data/queries/groundtruth parquet
    + a manifest; returns the manifest."""
    from scalablevectorsearch_spark.functions.distances import is_similarity, pairwise_distances

    rng = np.random.default_rng(seed)
    X = rng.uniform(-1.0, 1.0, size=(n_vectors, n_dims)).astype(np.float32)
    Q = rng.uniform(-1.0, 1.0, size=(n_queries, n_dims)).astype(np.float32)
    D = pairwise_distances(Q.astype(np.float64), X.astype(np.float64), distance)
    key = -D if is_similarity(distance) else D
    ids = np.broadcast_to(np.arange(n_vectors, dtype=np.int64), key.shape)
    order = np.lexsort((ids, key), axis=1)[:, :k]

    os.makedirs(out_dir, exist_ok=True)
    spark.createDataFrame(
        [(int(i), X[i].tolist()) for i in range(n_vectors)], "id bigint, vector array<float>"
    ).write.mode("overwrite").parquet(f"{out_dir}/data")
    spark.createDataFrame(
        [(int(i), Q[i].tolist()) for i in range(n_queries)], "qid bigint, vector array<float>"
    ).write.mode("overwrite").parquet(f"{out_dir}/queries")
    gt_rows = [
        (int(qi), int(r + 1), int(order[qi, r]))
        for qi in range(n_queries)
        for r in range(k)
    ]
    spark.createDataFrame(
        gt_rows, "qid bigint, rank bigint, neighbor_id bigint"
    ).write.mode("overwrite").parquet(f"{out_dir}/groundtruth")
    manifest = {
        "__schema__": "test_dataset",
        "__version__": [0, 1, 0],
        "n_vectors": n_vectors,
        "n_queries": n_queries,
        "n_dims": n_dims,
        "seed": seed,
        "k": k,
        "distance": distance,
    }
    with open(f"{out_dir}/manifest.json", "w") as f:
        json.dump(manifest, f, indent=2, sort_keys=True)
    return manifest


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — a counter-based bit mixer (vectorized).
    Deterministic per input, partition-layout independent."""
    x = x.astype(np.uint64)
    x = (x + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    x ^= x >> np.uint64(30)
    x = (x * np.uint64(0xBF58476D1CE4E5B9)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    x ^= x >> np.uint64(27)
    x = (x * np.uint64(0x94D049BB133111EB)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    x ^= x >> np.uint64(31)
    return x


def _uniform_rows(ids: np.ndarray, n_dims: int, seed: int, stream: int) -> np.ndarray:
    """float32 uniform[-1,1) matrix keyed by (seed, stream, id, dim) via
    the counter-based mixer — every executor can generate ITS rows
    without coordination, and the value of row i is independent of how
    rows are partitioned."""
    base = (
        np.uint64(seed) * np.uint64(0x100000001B3)
        + np.uint64(stream) * np.uint64(0x1000193)
    )
    ctr = (
        ids.astype(np.uint64)[:, None] * np.uint64(n_dims)
        + np.arange(n_dims, dtype=np.uint64)[None, :]
    )
    bits = _mix64(ctr + base)
    # top 53 bits -> [0,1) double -> [-1,1) float32
    u = (bits >> np.uint64(11)).astype(np.float64) * (2.0**-53)
    return (u * 2.0 - 1.0).astype(np.float32)


def _clustered_rows(
    ids: np.ndarray,
    n_dims: int,
    seed: int,
    stream: int,
    mu: np.ndarray,
    std: float,
) -> np.ndarray:
    """Mixture-of-Gaussians rows keyed by (seed, stream, id, dim):
    component = mix64(id) mod len(mu); noise = Box-Muller over two
    counter-based uniforms. Same contract as :func:`_uniform_rows` —
    any executor generates ITS rows with no coordination, and a row's
    value is independent of partitioning. Real ANN corpora (bigann,
    deep, dpr — the reference's regression workloads) are clustered;
    uniform data is the no-structure adversarial bound for routing, so
    scale evidence needs both."""
    # python-int modular product (numpy scalar u64*u64 warns on the
    # intentional wraparound)
    salt = np.uint64((int(seed) * 0x9E3779B97F4A7C15) % (1 << 64))
    comp = _mix64(ids.astype(np.uint64) + salt) % np.uint64(len(mu))
    # two independent uniform fields -> standard normals (Box-Muller)
    u1 = (_uniform_rows(ids, n_dims, seed, stream + 17) + 1.0) * 0.5
    u2 = (_uniform_rows(ids, n_dims, seed, stream + 23) + 1.0) * 0.5
    u1 = np.maximum(u1.astype(np.float64), 1e-12)
    z = np.sqrt(-2.0 * np.log(u1)) * np.cos(2.0 * np.pi * u2.astype(np.float64))
    return (mu[comp.astype(np.int64)] + std * z).astype(np.float32)


def mixture_centers(n_clusters: int, n_dims: int, seed: int) -> np.ndarray:
    """Deterministic component centers in [-1,1)^d (driver-small:
    n_clusters x d), shared by data and query streams."""
    return _uniform_rows(
        np.arange(n_clusters, dtype=np.int64), n_dims, seed, 9
    ).astype(np.float64)


def generate_test_dataset_distributed(
    spark: SparkSession,
    n_vectors: int,
    n_queries: int,
    n_dims: int,
    out_dir: str,
    seed: int = 42,
    k: int = 10,
    distance: str = "l2",
    clusters: int | None = None,
    cluster_std: float = 0.1,
) -> dict:
    """Cluster-scale test-data generator: the data NEVER exists on the
    driver. Rows are generated inside ``mapInPandas`` from a
    counter-based keyed stream (splitmix64 over (seed, id, dim) — the
    distributed analog of common.py:214-265's seeded uniform), so a
    1000-executor cluster writes a 100 TB dataset with zero driver
    memory; groundtruth is the engine's exact flat k-NN (itself
    hash-gated vs DuckDB). Complements :func:`generate_test_dataset`,
    whose driver-side numpy stream + independent brute force is kept as
    the reference-parity path (and the `testdata_generator` gate).

    ``clusters``: mixture-of-Gaussians mode — rows (and queries) draw a
    deterministic component and scatter ``cluster_std`` around its
    center (see :func:`_clustered_rows`). Default None keeps the
    uniform stream."""
    from collections.abc import Iterator

    import pandas as pd

    from scalablevectorsearch_spark.operators.flat import flat_knn

    mu = mixture_centers(clusters, n_dims, seed) if clusters else None

    def gen(stream: int):
        def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                ids = pdf["id"].to_numpy(dtype=np.int64)
                if mu is not None:
                    X = _clustered_rows(ids, n_dims, seed, stream, mu, cluster_std)
                else:
                    X = _uniform_rows(ids, n_dims, seed, stream)
                yield pd.DataFrame({"id": ids, "vector": list(X)})

        return fn

    os.makedirs(out_dir, exist_ok=True)
    # partitions scale with N (~250k rows -> ~60 MB of f32 per task at
    # 64d), floored at the cluster's parallelism knob — a fixed count
    # would make per-task row blocks grow unboundedly with N
    sp = max(
        int(spark.conf.get("spark.sql.shuffle.partitions")),
        n_vectors // 250_000,
    )
    data = spark.range(n_vectors, numPartitions=sp).select(
        F.col("id").cast("long").alias("id")
    ).mapInPandas(gen(0), "id long, vector array<float>")
    data.write.mode("overwrite").parquet(f"{out_dir}/data")
    queries = spark.range(n_queries).select(
        F.col("id").cast("long").alias("id")
    ).mapInPandas(gen(1), "id long, vector array<float>")
    queries.selectExpr("id as qid", "vector").write.mode("overwrite").parquet(
        f"{out_dir}/queries"
    )
    dataq = spark.read.parquet(f"{out_dir}/data")
    qdf = spark.read.parquet(f"{out_dir}/queries")
    gt = flat_knn(dataq, qdf, k=k, distance=distance, round_to=None)
    gt.select("qid", "rank", "neighbor_id").write.mode("overwrite").parquet(
        f"{out_dir}/groundtruth"
    )
    manifest = {
        "__schema__": "test_dataset",
        "__version__": [0, 1, 0],
        "n_vectors": n_vectors,
        "n_queries": n_queries,
        "n_dims": n_dims,
        "seed": seed,
        "k": k,
        "distance": distance,
        "generator": "distributed-counter",
        "clusters": clusters,
        "cluster_std": cluster_std if clusters else None,
    }
    with open(f"{out_dir}/manifest.json", "w") as f:
        json.dump(manifest, f, indent=2, sort_keys=True)
    return manifest
