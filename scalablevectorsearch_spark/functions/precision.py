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


def compress_vectors(
    df: DataFrame, dtype: str = "float16", vec_col: str = "vector", out_col: str = "packed"
) -> DataFrame:
    """Add a packed BINARY column (2 bytes/component). mapInPandas —
    one Arrow pass, no per-row Python."""
    if dtype not in DTYPES:
        raise ValueError(f"dtype must be one of {DTYPES}")
    pack = _PACK[dtype]
    cols = df.columns

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            pdf = pdf.copy()
            pdf[out_col] = pack(X)
            yield pdf

    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    return df.mapInPandas(fn, f"{schema}, {out_col} binary")


def decompress_vectors(
    df: DataFrame, dtype: str = "float16", packed_col: str = "packed", out_col: str = "vector"
) -> DataFrame:
    """BINARY -> ARRAY<DOUBLE> (widened; exact for both 16-bit formats)."""
    if dtype not in DTYPES:
        raise ValueError(f"dtype must be one of {DTYPES}")
    unpack = _UNPACK[dtype]
    keep = [c for c in df.columns if c != out_col]

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            pdf = pdf.copy()
            pdf[out_col] = [unpack(bytes(b)).tolist() for b in pdf[packed_col]]
            yield pdf

    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields if f.name != out_col
    )
    return df.mapInPandas(fn, f"{schema}, {out_col} array<double>")


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
