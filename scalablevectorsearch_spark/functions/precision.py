"""Low-precision vector storage — float16 / bfloat16 packed as BINARY
columns, with mixed-precision distance support.

Parity: include/svs/lib/float16.h, bfloat16.h (storage-only low
precision: vectors are stored narrow, distances computed after widening
— euclidean.h:320-430 mixed-type functor overloads). Spark has no
16-bit float type (SURVEY §1.2), so the canonical mapping is a packed
``BINARY`` column + the dtype recorded in column metadata / manifest —
a 2x footprint cut for the 100 TB table, decoded per Arrow batch inside
the numpy kernels (never per-row).

bfloat16 is float32 with the mantissa truncated to 7 bits: packing
keeps the high 2 bytes (round-to-nearest-even on the dropped half), so
no special dtype is needed to decode — widen by zero-padding.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DTYPES = ("float16", "bfloat16")


def pack_f16(X: np.ndarray) -> np.ndarray:
    """(n, d) float -> per-row little-endian float16 byte strings."""
    H = X.astype(np.float16)
    return np.asarray([h.tobytes() for h in H], dtype=object)


def unpack_f16(buf: bytes) -> np.ndarray:
    return np.frombuffer(buf, dtype=np.float16).astype(np.float64)


def pack_bf16(X: np.ndarray) -> np.ndarray:
    """float32 -> bfloat16 bytes (keep high 16 bits, round-to-nearest-even
    on the dropped mantissa half — the standard truncation rule).

    NaN inputs bypass the rounding add (whose uint32 wrap would turn
    e.g. 0xFFFFFFFF into +0.0 and 0x7F800001 into +Inf): they truncate
    with a forced mantissa bit so the result stays NaN — the TF/torch
    bf16 rule."""
    F32 = np.ascontiguousarray(X, dtype=np.float32)
    U = F32.view(np.uint32)
    rounded = (U + 0x7FFF + ((U >> 16) & 1)) >> 16
    rounded = np.where(np.isnan(F32), (U >> 16) | 0x0040, rounded)
    H = rounded.astype(np.uint16)
    return np.asarray([h.tobytes() for h in H], dtype=object)


def unpack_bf16(buf: bytes) -> np.ndarray:
    H = np.frombuffer(buf, dtype=np.uint16).astype(np.uint32) << 16
    return H.view(np.float32).astype(np.float64)


_PACK = {"float16": pack_f16, "bfloat16": pack_bf16}
_UNPACK = {"float16": unpack_f16, "bfloat16": unpack_bf16}


def _pack_matrix(X: np.ndarray, dtype: str) -> np.ndarray:
    """(n, d) float64 -> contiguous packed uint8 buffer (2 bytes/comp)."""
    if dtype == "float16":
        return np.ascontiguousarray(X.astype("<f2")).view(np.uint8).reshape(-1)
    F32 = np.ascontiguousarray(X, dtype=np.float32)
    U = F32.view(np.uint32)
    rounded = (U + 0x7FFF + ((U >> 16) & 1)) >> 16
    rounded = np.where(np.isnan(F32), (U >> 16) | 0x0040, rounded)
    return np.ascontiguousarray(rounded.astype("<u2")).view(np.uint8).reshape(-1)


def _unpack_matrix(data: np.ndarray, n: int, d: int, dtype: str) -> np.ndarray:
    """Contiguous packed uint8 buffer -> (n, d) float64."""
    if dtype == "float16":
        return data.view("<f2").astype(np.float64).reshape(n, d)
    H = data.view("<u2").astype(np.uint32) << 16
    return H.view(np.float32).astype(np.float64).reshape(n, d)


def compress_vectors(
    df: DataFrame, dtype: str = "float16", vec_col: str = "vector", out_col: str = "packed"
) -> DataFrame:
    """Add a packed BINARY column (2 bytes/component). mapInArrow —
    one columnar pass, zero per-row Python objects in or out."""
    from scalablevectorsearch_spark.functions.arrowio import (
        batch_matrix,
        binary_rows,
    )

    if dtype not in DTYPES:
        raise ValueError(f"dtype must be one of {DTYPES}")
    vi = df.columns.index(vec_col)
    names = df.columns + [out_col]

    def fn(batches):
        import pyarrow as pa

        for rb in batches:
            n = rb.num_rows
            if n == 0:
                continue
            X = batch_matrix(rb.column(vi))
            packed = binary_rows(_pack_matrix(X, dtype), n, 2 * X.shape[1])
            yield pa.RecordBatch.from_arrays(
                list(rb.columns) + [packed], names=names
            )

    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    return df.mapInArrow(fn, f"{schema}, {out_col} binary")


def decompress_vectors(
    df: DataFrame, dtype: str = "float16", packed_col: str = "packed", out_col: str = "vector"
) -> DataFrame:
    """BINARY -> ARRAY<DOUBLE> (widened; exact for both 16-bit formats).
    Columnar both ways: the binary values buffer is viewed as the packed
    matrix, widened in one vectorized pass, and re-emitted as a single
    flat list column."""
    from scalablevectorsearch_spark.functions.arrowio import (
        binary_matrix,
        list_rows,
    )

    if dtype not in DTYPES:
        raise ValueError(f"dtype must be one of {DTYPES}")
    src = df.drop(out_col) if out_col in df.columns else df
    pi = src.columns.index(packed_col)
    names = src.columns + [out_col]

    def fn(batches):
        import pyarrow as pa

        for rb in batches:
            n = rb.num_rows
            if n == 0:
                continue
            data, w = binary_matrix(rb.column(pi))
            if w % 2:
                raise ValueError(f"packed width {w} is not 2 bytes/component")
            d = w // 2
            V = _unpack_matrix(data, n, d, dtype)
            yield pa.RecordBatch.from_arrays(
                list(rb.columns) + [list_rows(V, n, d)], names=names
            )

    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in src.schema.fields
    )
    return src.mapInArrow(fn, f"{schema}, {out_col} array<double>")


def f16_knn(
    base_packed: DataFrame,
    queries: DataFrame,
    k: int,
    dtype: str = "float16",
    distance: str = "l2",
    id_col: str = "id",
    packed_col: str = "packed",
    **kwargs,
):
    """Mixed-precision k-NN: float32/64 queries against 16-bit packed
    storage — decode per batch, then the standard flat kernel
    (euclidean.h:320-430 mixed-pair semantics: widen, then compute)."""
    from scalablevectorsearch_spark.operators.flat import flat_knn

    dec = decompress_vectors(
        base_packed.select(id_col, packed_col), dtype, packed_col, "vector"
    ).select(id_col, "vector")
    return flat_knn(dec, queries, k=k, distance=distance, id_col=id_col, **kwargs)
