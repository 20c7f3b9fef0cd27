"""LVQ — Locally-adaptive Vector Quantization (per-vector scalar
quantization with an optional residual level).

Parity: the reference's LVQ dataset family — storage kinds LVQ4x0 /
LVQ8x0 / LVQ4x4 / LVQ4x8 (/root/reference/bindings/cpp/include/svs/
runtime/api_defs.h:98-109), the `svs.LVQLoader(primary=, residual=)`
user surface (/root/reference/examples/python/
vamana_with_compression_lvq.py:63-71), and the persisted
primary_bits/residual_bits/strategy config (/root/reference/include/
svs/index/ivf/data_traits.h:36-56). The compression scheme itself is
published (Aguerrebere et al., "Similarity search in the blink of an
eye with compressed indices", VLDB 2023): remove the dataset mean,
then quantize each vector with its OWN min/max range —
per-vector adaptivity is what lets 4-8 bits/component work where a
global scalar quantizer (operators/sq.py) needs the full dataset
range. The reference's "sequential"/"turbo" strategies are SIMD
register layouts with no DataFrame analog — dropped, as documented
in COVERAGE.md.

Scheme (all arithmetic float64, round-half-up, identical in Spark and
the DuckDB oracles):

  mu        = dataset mean (canonical: rounded 1e-6, the kmeans
              determinism protocol)
  x'        = x - mu                        (centered)
  lo, hi    = min(x'), max(x')              (PER VECTOR)
  step      = (hi - lo) / (2^B1 - 1)
  code c    = clamp(floor((x' - lo)/step + 0.5), 0, 2^B1 - 1)
  recon1    = (mu + lo) + step * c          (primary reconstruction)

  residual level (LVQ B1 x B2): the primary rounding error lies in
  [-step/2, step/2]; quantize it uniformly with B2 bits:
  r         = x' - (lo + step * c)
  step2     = step / (2^B2 - 1)
  rcode c2  = clamp(floor((r + step/2)/step2 + 0.5), 0, 2^B2 - 1)
  recon2    = recon1 + (step2 * c2 - step/2)

Spark shape (scale-first):
 - TRAIN is one scan (posexplode + avg) for the mean.
 - COMPRESS is pure Catalyst: zip_with/transform expressions, JVM
   codegen, no Python. Storage is ARRAY<TINYINT> codes — 1 byte per
   component at B=8, HALF a byte at B=4 (two codes nibble-packed per
   byte) — plus two per-row doubles (lo, step). That is the 4-8x scan
   bandwidth reduction that motivates LVQ at 100 TB.
 - SEARCH decompresses IN-PLAN (Catalyst transform over the code
   arrays — whole-stage codegen) and reuses the gated flat/Vamana
   engines; the query stays full precision (the reference's
   asymmetric LVQ distances). Two-level search is
   candidate-generation on the primary + exact re-rank on the
   two-level reconstruction (the k_reorder pattern of
   operators/ivf.py; the reference reranks LVQ results the same way —
   vamana/extensions.h:456-457 notes cancel "skips reranking" for
   lvq).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from scalablevectorsearch_spark.functions.distances import is_similarity


@dataclass(frozen=True)
class LVQParams:
    """Persisted LVQ configuration (data_traits.h DataTypeConfig:
    primary_bits / residual_bits + the centering vector)."""

    mean: tuple  # canonical (1e-6-rounded) dataset mean, length dims
    dims: int
    primary_bits: int
    residual_bits: int = 0

    def __post_init__(self):
        if self.primary_bits not in (4, 8):
            raise ValueError(f"primary_bits must be 4 or 8, got {self.primary_bits}")
        if self.residual_bits not in (0, 4, 8):
            raise ValueError(f"residual_bits must be 0, 4 or 8, got {self.residual_bits}")
        if len(self.mean) != self.dims:
            raise ValueError(f"mean has {len(self.mean)} dims, expected {self.dims}")

    @property
    def levels1(self) -> int:
        return (1 << self.primary_bits) - 1

    @property
    def levels2(self) -> int:
        return (1 << self.residual_bits) - 1


def lvq_train(
    df: DataFrame,
    vec_col: str = "vector",
    primary_bits: int = 8,
    residual_bits: int = 0,
    round_decimals: int = 6,
) -> LVQParams:
    """Dataset mean -> LVQParams. One scan, built-in aggregates; the
    mean is rounded half-up at 1e-6 so Spark and the DuckDB oracle
    share one canonical value (the kmeans.py determinism protocol —
    per-vector lo/step/codes then derive exactly on both engines)."""
    rows = (
        df.select(F.posexplode(vec_col).alias("pos", "x"))
        .groupBy("pos")
        .agg(F.avg(F.col("x").cast("double")).alias("m"))
        .collect()
    )
    if not rows:
        raise ValueError("empty dataset")
    s = float(10**round_decimals)
    import math

    mean = [0.0] * len(rows)
    for r in rows:
        mean[r["pos"]] = math.floor(r["m"] * s + 0.5) / s
    return LVQParams(
        mean=tuple(mean), dims=len(mean),
        primary_bits=primary_bits, residual_bits=residual_bits,
    )


def _dlit(v: float) -> str:
    """Exact SQL double literal: repr() is the shortest round-trip
    decimal and both Python and the SQL parser are correctly-rounded,
    so the parsed double is bit-identical to ``v``. Raises (not assert
    — asserts vanish under ``python -O``) on non-finite values, which
    have no SQL double literal and would otherwise parse as a column
    reference or wrong value silently."""
    v = float(v)
    s = repr(v)
    if s in ("inf", "-inf", "nan") or float(s) != v:
        raise ValueError(f"value has no exact SQL double literal: {v!r}")
    return f"{s}D"


def _mu_sql(params: LVQParams) -> str:
    return "array(" + ", ".join(_dlit(m) for m in params.mean) + ")"


def _mu_col(params: LVQParams) -> Column:
    return F.array(*[F.lit(float(m)) for m in params.mean])


# r12 (guide §4, the driver's py4j boundary): the Catalyst builders
# below assemble their expressions as single SQL strings parsed
# JVM-side in one round trip, instead of Column algebra whose every
# F.* / lambda call is its own round trip. Node-for-node the same
# expressions (ZipWith/Transform/CaseWhen/Floor/Cast with identical
# double literals via _dlit), so compressed storage, reconstructions
# and every gated result are bit-identical; measured lvq_compress
# construction 174ms -> ~25ms at 64 dims.


def _clamp_sql(x: str, levels: int) -> str:
    return f"greatest(0.0D, least({_dlit(levels)}, {x}))"


def _pack_sql(codes: str, bits: int) -> str:
    """Integral double codes -> ARRAY<TINYINT> storage. B=8: one code
    per byte, centered (c - 128). B=4: two codes per byte
    (hi nibble = even index, lo nibble = odd; odd dims zero-pad),
    centered. Centering keeps the full 0..255 byte range inside the
    signed TINYINT domain."""
    if bits == 8:
        return f"transform({codes}, c -> cast(c - 128.0D as tinyint))"
    return (
        f"transform(sequence(0, cast(ceil(size({codes}) / 2) as int) - 1), "
        f"i -> cast(element_at({codes}, i * 2 + 1) * 16.0D"
        f" + coalesce(try_element_at({codes}, i * 2 + 2), 0.0D)"
        f" - 128.0D as tinyint))"
    )


def _unpack_sql(stored: str, bits: int, dims: int) -> str:
    """ARRAY<TINYINT> storage -> integral double codes (0..2^B-1)."""
    if bits == 8:
        return f"transform({stored}, b -> cast(b as double) + 128.0D)"
    nibbles = (
        f"flatten(transform({stored}, "
        f"b -> array(cast(floor((cast(b as double) + 128.0D) / 16.0D) as double), "
        f"pmod(cast(b as double) + 128.0D, 16.0D))))"
    )
    return f"slice({nibbles}, 1, {dims})"


def lvq_compress(
    df: DataFrame,
    params: LVQParams,
    vec_col: str = "vector",
    prefix: str = "lvq_",
) -> DataFrame:
    """Add LVQ storage columns: ``{prefix}codes`` ARRAY<TINYINT>
    (nibble-packed at B1=4), ``{prefix}lo`` / ``{prefix}step`` DOUBLE,
    and ``{prefix}rcodes`` when the params carry a residual level.
    Pure Catalyst — no Python row path."""
    mu = _mu_sql(params)
    lo, stepc = f"`{prefix}lo`", f"`{prefix}step`"
    df = df.withColumn(
        "__xp", F.expr(f"zip_with(`{vec_col}`, {mu}, (x, m) -> cast(x as double) - m)")
    )
    df = df.withColumn(f"{prefix}lo", F.expr("array_min(__xp)")).withColumn(
        f"{prefix}step",
        F.expr(f"(array_max(__xp) - array_min(__xp)) / {_dlit(params.levels1)}"),
    )
    codes = (
        f"transform(__xp, x -> CASE WHEN {stepc} = 0.0D THEN 0.0D ELSE "
        + _clamp_sql(
            f"cast(floor((x - {lo}) / {stepc} + 0.5D) as double)", params.levels1
        )
        + " END)"
    )
    df = df.withColumn("__c1", F.expr(codes))
    if params.residual_bits:
        step2 = f"{stepc} / {_dlit(params.levels2)}"
        r = f"zip_with(__xp, __c1, (x, c) -> x - ({lo} + {stepc} * c))"
        rcodes = (
            f"transform({r}, ri -> CASE WHEN {stepc} = 0.0D THEN 0.0D ELSE "
            + _clamp_sql(
                f"cast(floor((ri + {stepc} / 2.0D) / ({step2}) + 0.5D) as double)",
                params.levels2,
            )
            + " END)"
        )
        df = df.withColumn(
            f"{prefix}rcodes", F.expr(_pack_sql(rcodes, params.residual_bits))
        )
    df = df.withColumn(
        f"{prefix}codes", F.expr(_pack_sql("__c1", params.primary_bits))
    )
    return df.drop("__xp", "__c1")


def lvq_decompress(
    df: DataFrame,
    params: LVQParams,
    prefix: str = "lvq_",
    out_col: str = "vector",
    level: int = 1,
) -> DataFrame:
    """Reconstruct from LVQ storage. ``level=1``: primary only
    (recon1 = (mu + lo) + step*c). ``level=2``: adds the residual
    correction (recon2 = recon1 + (step2*c2 - step/2)). Catalyst
    expressions; identical formulas in the DuckDB oracles."""
    if level not in (1, 2):
        raise ValueError(f"level must be 1 or 2, got {level}")
    if level == 2 and not params.residual_bits:
        raise ValueError("level=2 requires residual_bits > 0")
    mu = _mu_sql(params)
    lo, step = f"`{prefix}lo`", f"`{prefix}step`"
    c1 = _unpack_sql(f"`{prefix}codes`", params.primary_bits, params.dims)
    recon = f"zip_with({c1}, {mu}, (c, m) -> (m + {lo}) + {step} * c)"
    if level == 2:
        step2 = f"{step} / {_dlit(params.levels2)}"
        c2 = _unpack_sql(f"`{prefix}rcodes`", params.residual_bits, params.dims)
        recon = (
            f"zip_with({recon}, {c2}, "
            f"(v, c) -> v + (({step2}) * c - {step} / 2.0D))"
        )
    return df.withColumn(out_col, F.expr(recon))


def lvq_packed_col(params: LVQParams, prefix: str = "lvq_") -> Column:
    """One flat DOUBLE array per row — ``[lo, step, byte_0 .. byte_w]``
    with the code bytes still packed (nibbles at B1=4). A single cheap
    Catalyst ``transform`` (cast only); the real decompression happens
    vectorized inside the scan kernel (:func:`lvq_decoder`), which is
    ~10x the per-element Catalyst expression chain while remaining
    bit-identical (same IEEE ops elementwise)."""
    return F.expr(
        f"concat(array(`{prefix}lo`, `{prefix}step`), "
        f"transform(`{prefix}codes`, b -> cast(b as double)))"
    )


def lvq_decoder(params: LVQParams):
    """Vectorized numpy decoder for :func:`lvq_packed_col` rows — the
    ``decode`` hook of ``flat_knn`` (the reference's compressed-scan
    extension point, extensions/flat/*.h). Elementwise-identical to
    :func:`lvq_decompress` level 1: x = (mu + lo) + step * c."""
    mu = np.asarray(params.mean, dtype=np.float64)
    bits, dims = params.primary_bits, params.dims

    def decode(M: np.ndarray) -> np.ndarray:
        lo, step = M[:, 0], M[:, 1]
        body = M[:, 2:]
        if bits == 8:
            C = body + 128.0
        else:
            ub = body + 128.0
            hi = np.floor(ub / 16.0)
            lo_nib = ub - 16.0 * hi
            C = np.empty((M.shape[0], body.shape[1] * 2), dtype=np.float64)
            C[:, 0::2] = hi
            C[:, 1::2] = lo_nib
            C = C[:, :dims]
        return (mu + lo[:, None]) + step[:, None] * C

    return decode


def _packed_width(params: LVQParams, bits: int) -> int:
    """Stored bytes per vector at ``bits`` (4-bit packs two per byte)."""
    return params.dims if bits == 8 else -(-params.dims // 2)


def lvq_packed2_col(params: LVQParams, prefix: str = "lvq_") -> Column:
    """Two-level analog of :func:`lvq_packed_col`: one flat DOUBLE array
    ``[lo, step, byte_0..byte_w1, rbyte_0..rbyte_w2]`` carrying primary
    AND residual codes still packed — the re-rank scan then reads raw
    storage and :func:`lvq_decoder2` reconstructs vectorized inside the
    kernel instead of Catalyst evaluating the nested unpack/zip_with
    expression chain per joined row (r12: the level-2 chain was both
    the rerank stage's per-row cost and, freshly planned, a visible
    analysis/codegen cost)."""
    return F.expr(
        f"concat(array(`{prefix}lo`, `{prefix}step`), "
        f"transform(`{prefix}codes`, b -> cast(b as double)), "
        f"transform(`{prefix}rcodes`, b -> cast(b as double)))"
    )


def _unpack_np(body: np.ndarray, bits: int, dims: int) -> np.ndarray:
    """Vectorized :func:`_unpack` (elementwise-identical): packed bytes
    (still centered at -128) -> integral double codes 0..2^bits-1."""
    if bits == 8:
        return body + 128.0
    ub = body + 128.0
    hi = np.floor(ub / 16.0)
    lo_nib = ub - 16.0 * hi  # == pmod(ub, 16) exactly for ub >= 0
    C = np.empty((body.shape[0], body.shape[1] * 2), dtype=np.float64)
    C[:, 0::2] = hi
    C[:, 1::2] = lo_nib
    return C[:, :dims]


def lvq_decoder2(params: LVQParams):
    """Vectorized two-level decoder for :func:`lvq_packed2_col` rows —
    elementwise-identical to :func:`lvq_decompress` level 2:
    recon1 = (mu + lo) + step*c1; recon2 = recon1 + (step2*c2 - step/2)
    with step2 = step/levels2, every op in the same order."""
    if not params.residual_bits:
        raise ValueError("lvq_decoder2 requires residual_bits > 0")
    mu = np.asarray(params.mean, dtype=np.float64)
    w1 = _packed_width(params, params.primary_bits)
    levels2 = float(params.levels2)

    def decode(M: np.ndarray) -> np.ndarray:
        lo, step = M[:, 0], M[:, 1]
        c1 = _unpack_np(M[:, 2 : 2 + w1], params.primary_bits, params.dims)
        c2 = _unpack_np(M[:, 2 + w1 :], params.residual_bits, params.dims)
        recon = (mu + lo[:, None]) + step[:, None] * c1
        step2 = step / levels2
        return recon + (step2[:, None] * c2 - step[:, None] / 2.0)

    return decode


def lvq_knn(
    base: DataFrame,
    queries: DataFrame,
    params: LVQParams,
    k: int,
    distance: str = "l2",
    id_col: str = "id",
    vec_col: str = "vector",
    qid_col: str = "qid",
    qvec_col: str | None = None,
    round_to: int | None = 4,
    k_reorder: int | None = None,
    base_compressed: bool = False,
) -> DataFrame:
    """k-NN over LVQ storage (asymmetric: full-precision query vs the
    reconstruction — the reference's LVQ distance semantics).

    One-level (residual_bits=0 or k_reorder=None): rank on primary
    reconstruction distances. Two-level with ``k_reorder``: the top
    k_reorder primary candidates re-rank on the two-level
    reconstruction (data_traits.h primary/residual; the k_reorder
    pattern of common.h:156) and the emitted distance is the refined
    value.

    ``base_compressed=True``: ``base`` already carries the
    ``lvq_*`` storage columns (the persisted compressed table — the
    scan reads codes at 1 or 0.5 bytes/component instead of float32,
    which is the point at 100 TB).
    """
    from scalablevectorsearch_spark.operators.flat import flat_knn

    qvec_col = qvec_col or vec_col
    comp = base if base_compressed else lvq_compress(base, params, vec_col)
    # primary scan reads the PACKED codes (1 or 0.5 bytes/component on
    # disk) and decompresses inside the Arrow kernel — bandwidth of the
    # compressed table, decode at BLAS speed, values bit-identical to
    # the Catalyst lvq_decompress chain
    packed = comp.select(
        F.col(id_col).cast("long").alias("id"),
        lvq_packed_col(params).alias("vector"),
    )
    dec = lvq_decoder(params)
    q = queries.select(F.col(qid_col).alias("qid"), F.col(qvec_col).alias("vector"))
    if k_reorder is None or not params.residual_bits:
        return flat_knn(packed, q, k=k, distance=distance, round_to=round_to, decode=dec)
    if k_reorder < k:
        raise ValueError(f"k_reorder={k_reorder} must be >= k={k}")
    # collect the query batch ONCE and share it between the primary
    # scan and the re-rank (r13, VERDICT item 3: both phases broadcast
    # the same batch — previously each ran its own collect job)
    qp = q.select(
        F.col("qid").cast("long").alias("qid"), F.col("vector").alias("qv")
    ).toPandas()
    if len(qp) == 0:
        raise ValueError("empty query batch")
    qids = qp["qid"].to_numpy(dtype=np.int64)
    Q = np.stack(qp["qv"].to_numpy()).astype(np.float64)
    cands = flat_knn(
        packed, q, k=k_reorder, distance=distance, round_to=round_to, decode=dec,
        query_batch=(qids, Q),
    )
    recon2 = comp.select(
        F.col(id_col).cast("long").alias("neighbor_id"),
        lvq_packed2_col(params).alias("__bv"),
    )
    return _rerank_reconstruction(
        cands, recon2, q, k, distance, round_to, decode=lvq_decoder2(params),
        query_batch=(qids, Q),
    )


def _fold_distances(
    Q: np.ndarray, B: np.ndarray, distance: str
) -> tuple[np.ndarray, np.ndarray | None]:
    """Row-wise distance of ``Q[i]`` to ``B[i]`` with the EXACT
    accumulation order of the Catalyst/DuckDB sequential fold
    (distances.distance_expr: acc = 0.0; acc = acc + f(x_i, y_i) over
    dims in order): vectorized across ROWS, sequential across DIMS, so
    every emitted double is bit-identical to the expression fold the
    oracles replay — the rerank could not be moved off Catalyst
    otherwise (a GEMM-shaped kernel differs in last-ulp accumulation).

    Returns ``(values, null_mask)``: null_mask is currently always None
    (kept in the signature so a distance whose SQL semantics demand SQL
    NULLs can flag rows); cosine maps zero-norm rows to similarity 0.0,
    the engine-wide pairwise_distances convention — the pre-r13 kernel
    divided through to inf/nan there, silently changing degenerate
    top-k order (ADVICE r12)."""
    n, d = Q.shape
    if distance == "l2":
        acc = np.zeros(n, dtype=np.float64)
        for i in range(d):
            diff = Q[:, i] - B[:, i]
            acc = acc + diff * diff
        return acc, None
    if distance == "ip":
        acc = np.zeros(n, dtype=np.float64)
        for i in range(d):
            acc = acc + Q[:, i] * B[:, i]
        return acc, None
    if distance == "cosine":
        num = np.zeros(n, dtype=np.float64)
        qq = np.zeros(n, dtype=np.float64)
        bb = np.zeros(n, dtype=np.float64)
        for i in range(d):
            x, y = Q[:, i], B[:, i]
            num = num + x * y
            qq = qq + x * x
            bb = bb + y * y
        denom = np.sqrt(qq) * np.sqrt(bb)
        # zero-norm vectors: similarity 0 — the engine-wide convention
        # (functions.distances.pairwise_distances; the reference rejects
        # zero norms upstream). The pre-r13 kernel divided through and
        # produced inf/nan here, silently perturbing degenerate top-k
        # order; the Catalyst ANSI fold it replaced would error instead.
        zero = denom == 0.0
        with np.errstate(divide="ignore", invalid="ignore"):
            out = np.where(zero, 0.0, num / denom)
        return out, None
    raise ValueError(f"unknown distance {distance!r}")


def _rerank_reconstruction(
    cands: DataFrame,
    recon: DataFrame,
    q: DataFrame,
    k: int,
    distance: str,
    round_to: int | None,
    decode=None,
    query_batch: tuple | None = None,
) -> DataFrame:
    """Re-rank a (qid, neighbor_id) candidate set against a
    reconstruction table: broadcast the Q x k_reorder pair set against
    the reconstruction scan (the base is scanned once, filtered by the
    broadcast side — the 100 TB shape), then recompute distances in a
    vectorized Arrow kernel whose fold order is bit-identical to the
    Catalyst/DuckDB expression fold (:func:`_fold_distances`), and take
    the final per-query top-k.

    r12 optimization round (guide §4.2): the previous implementation
    evaluated the distance as a Catalyst zip_with+aggregate fold after
    a SECOND broadcast join shipping the query vectors — measured 0.88s
    in ONE task for 50k pairs x 64 dims (higher-order-function eval is
    ~per-element interpreted). The kernel path ships the query batch
    via sc.broadcast like every scan kernel (flat/ivf), drops the
    second join, and pays numpy-vector cost instead; emitted doubles
    are unchanged.

    ``decode``: optional vectorized storage decoder applied to the
    recon rows ((n, w) storage -> (n, d) vectors, elementwise-identical
    to the Catalyst reconstruction it replaces) — lets the scan read
    PACKED codes instead of evaluating the decompress expression chain
    per joined row."""
    import pyarrow as pa

    from scalablevectorsearch_spark.operators.topk import topk_per_group

    pairs = cands.select("qid", "neighbor_id")
    joined = recon.join(F.broadcast(pairs), "neighbor_id").select(
        "qid", "neighbor_id", "__bv"
    )
    if query_batch is not None:
        # caller-collected batch (shared with the primary scan — one
        # collect job for the whole two-phase search, r13)
        qids = np.asarray(query_batch[0], dtype=np.int64)
        Q = np.asarray(query_batch[1], dtype=np.float64)
    else:
        qp = q.select(
            F.col("qid").cast("long").alias("qid"), F.col("vector").alias("qv")
        ).toPandas()
        if len(qp) == 0:
            # np.stack raises on an empty sequence; the old Catalyst
            # join path returned an empty frame here — preserve that
            spark = recon.sparkSession
            return spark.createDataFrame(
                [], "qid long, neighbor_id long, distance double, rank long"
            )
        qids = qp["qid"].to_numpy(dtype=np.int64)
        Q = np.stack(qp["qv"].to_numpy()).astype(np.float64)
    if len(qids) == 0:
        spark = recon.sparkSession
        return spark.createDataFrame(
            [], "qid long, neighbor_id long, distance double, rank long"
        )
    sc = recon.sparkSession.sparkContext
    bc = sc.broadcast((qids, Q))
    scale = None if round_to is None else float(10**round_to)
    maximize = is_similarity(distance)

    def fn(batches):
        bqids, bQ = bc.value
        pos = {int(x): i for i, x in enumerate(bqids)}
        d_dim = bQ.shape[1]
        for rb in batches:
            n = rb.num_rows
            if n == 0:
                continue
            names = rb.schema.names
            rqid = rb.column(names.index("qid")).to_numpy(zero_copy_only=False)
            rnid = rb.column(names.index("neighbor_id")).to_numpy(
                zero_copy_only=False
            )
            vec = rb.column(names.index("__bv"))
            import pyarrow.compute as pc

            lens = pc.list_value_length(vec).to_numpy(zero_copy_only=False)
            if vec.null_count or not len(lens) or (lens != lens[0]).any():
                # a ragged or NULL reconstruction row would either crash
                # the reshape or, if the total happens to divide evenly,
                # silently misalign every following row
                raise ValueError(
                    "reconstruction column must be non-null with a "
                    "uniform storage width (ragged rows cannot be reshaped)"
                )
            flat = vec.flatten().to_numpy(zero_copy_only=False)
            B = flat.reshape(n, int(lens[0])).astype(np.float64, copy=False)
            if decode is not None:
                B = decode(B)
            if B.shape[1] != d_dim:
                raise ValueError(
                    f"reconstruction width {B.shape[1]} != query dim {d_dim}"
                )
            qi = np.asarray([pos[int(x)] for x in rqid], dtype=np.int64)
            dist, nulls = _fold_distances(bQ[qi], B, distance)
            if scale is not None:
                dist = np.floor(dist * scale + 0.5) / scale
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(rqid.astype(np.int64), type=pa.int64()),
                    pa.array(rnid.astype(np.int64), type=pa.int64()),
                    pa.array(dist, type=pa.float64(),
                             mask=nulls if nulls is not None else None),
                ],
                names=["qid", "neighbor_id", "distance"],
            )

    exact = joined.mapInArrow(fn, "qid long, neighbor_id long, distance double")
    from scalablevectorsearch_spark.operators.topk import merge_partitions

    return topk_per_group(
        exact,
        group_col="qid",
        order_col="distance",
        k=k,
        ascending=not maximize,
        tie_col="neighbor_id",
        num_partitions=merge_partitions(len(qids), k, recon.sparkSession),
    )


# ----------------------------------------------- LVQ inside Vamana
# The reference builds Vamana directly over an LVQ dataset
# (svs.Vamana.build(parameters, LVQLoader(...), ...) in
# vamana_with_compression_lvq.py:80-87). Spark shape: compress once,
# build the SAME sharded Vamana operator over the primary
# reconstruction (per-vector scales make code-domain ranking differ
# from corrected ranking, so — like the SQ cosine path — the graph
# sees exactly the lossy values the search will see). The durable
# compressed table (ARRAY<TINYINT> codes) is the storage artifact;
# the index layout caches the reconstruction like index.h's
# materialized data_ copy.


def lvq_vamana_build(
    base: DataFrame,
    params: LVQParams,
    vamana_params=None,
    n_shards: int = 8,
    distance: str = "l2",
    id_col: str = "id",
    vec_col: str = "vector",
    base_compressed: bool = False,
    packed: bool = True,
    **build_kw,
):
    """Build a Vamana graph over LVQ storage.

    ``packed=True`` (default): the index's persisted layout holds the
    PACKED rows ([lo, step, code bytes] — 0.5-1 byte/component of
    payload) and every kernel decodes at entry via ``vec_decode`` —
    the reference's compressed dataset inside the graph index
    (vamana_with_compression_lvq.py), and the storage shape that
    matters at 100 TB. ``packed=False`` materializes the primary
    reconstruction instead (required for dynamic mutation workloads).
    Distances are identical either way (the decode is bit-exact).
    Extra kwargs (shard_by/closure_bp/...) pass through to
    ``vamana_build``; kmeans sharding with ``packed=True`` trains the
    shard model on the reconstruction automatically."""
    from scalablevectorsearch_spark.operators.vamana import vamana_build

    comp = base if base_compressed else lvq_compress(base, params, vec_col)
    if not packed:
        recon1 = lvq_decompress(comp, params, out_col="__rv", level=1).select(
            F.col(id_col).alias(id_col), F.col("__rv").alias(vec_col)
        )
        idx = vamana_build(
            recon1, vamana_params, n_shards=n_shards, distance=distance,
            id_col=id_col, vec_col=vec_col, **build_kw,
        )
        idx.lvq_params = params
        return idx
    if build_kw.get("shard_by") == "kmeans" and build_kw.get("shard_model") is None:
        # centroids live in the decoded geometry — train on the
        # reconstruction, then stamp the packed rows via the decoder
        from scalablevectorsearch_spark.operators.kmeans import train_kmeans

        recon1 = lvq_decompress(comp, params, out_col="__rv", level=1).select(
            F.col(id_col).alias(id_col), F.col("__rv").alias(vec_col)
        )
        build_kw["shard_model"] = train_kmeans(
            recon1, n_shards, build_kw.pop("kmeans_iters", 2), id_col, vec_col
        )
    packed_df = comp.select(
        F.col(id_col).alias(id_col), lvq_packed_col(params).alias(vec_col)
    )
    idx = vamana_build(
        packed_df, vamana_params, n_shards=n_shards, distance=distance,
        id_col=id_col, vec_col=vec_col, vec_decode=lvq_decoder(params), **build_kw,
    )
    idx.lvq_params = params
    return idx


def lvq_vamana_search(
    index,
    queries: DataFrame,
    k: int,
    qid_col: str = "qid",
    qvec_col: str = "vector",
    round_to: int | None = 4,
    k_reorder: int | None = None,
    compressed: DataFrame | None = None,
    **search_kw,
) -> DataFrame:
    """Graph search over an LVQ Vamana index (query full precision —
    the layout already holds the primary reconstruction). With
    ``k_reorder`` + ``compressed`` (the lvq_* storage table), the top
    k_reorder graph candidates re-rank on the two-level
    reconstruction. With an exhaustive window the one-level result
    EQUALS lvq_knn's, which is the metamorphic gate."""
    from scalablevectorsearch_spark.operators.vamana import vamana_search

    params = getattr(index, "lvq_params", None)
    if params is None:
        raise ValueError("index was not built with lvq_vamana_build")
    q = queries.select(F.col(qid_col).alias("qid"), F.col(qvec_col).alias(index.vec_col))
    k_cand = k if k_reorder is None else max(k, k_reorder)
    res = vamana_search(
        index, q, k_cand, qid_col="qid", qvec_col=index.vec_col,
        round_to=round_to, **search_kw,
    )
    if k_reorder is None:
        return res
    if not params.residual_bits:
        raise ValueError("k_reorder requires residual_bits > 0")
    if compressed is None:
        raise ValueError("k_reorder requires the compressed storage table")
    recon2 = compressed.select(
        F.col(index.id_col).cast("long").alias("neighbor_id"),
        lvq_packed2_col(params).alias("__bv"),
    )
    qv = q.select("qid", F.col(index.vec_col).alias("vector"))
    return _rerank_reconstruction(
        res, recon2, qv, k, index.distance, round_to, decode=lvq_decoder2(params)
    )
