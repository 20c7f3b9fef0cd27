"""Arrow-native full-table map kernels — the zero-copy decode path.

Every whole-table pass (k-means partial sums, cluster/shard stamping)
used to go through ``mapInPandas``, where Arrow -> pandas conversion
materializes one ``np.ndarray`` *object per row* for the vector column
before the kernel re-stacks them. ``mapInArrow`` hands the kernel the
raw ``pa.RecordBatch``: the list column's flattened values buffer IS the
``(n, d)`` matrix (``flat.py`` pioneered this for the scan kernel). This
module shares that decode with the stamping kernels so no full-table
pass pays per-row CPython costs.

Parity: the reference's scan/assign kernels read SIMD-contiguous data
slabs (``include/svs/core/data/simple.h``); the Arrow values buffer is
the Spark-native equivalent of that contiguous layout.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql.types import IntegerType, StructField, StructType


def batch_matrix(vec, dtype=np.float64) -> np.ndarray:
    """Decode an Arrow list / fixed-size-list column into an ``(n, w)``
    matrix straight off the flattened values buffer — no per-row Python
    objects. Rows must be non-null and of uniform width ``w`` (raises on
    ragged input, like ``flat.py``'s scan decode)."""
    import pyarrow.compute as pc

    n = len(vec)
    flat = vec.flatten().to_numpy(zero_copy_only=False)
    if n == 0:
        return np.empty((0, 0), dtype=dtype)
    if vec.null_count or len(flat) % n:
        raise ValueError(
            f"vector column must be non-null uniform width; "
            f"got {len(flat)} values for {n} rows"
        )
    w = len(flat) // n
    lens = pc.list_value_length(vec).to_numpy(zero_copy_only=False)
    if (lens != w).any():
        raise ValueError("ragged vector column cannot be reshaped")
    return flat.reshape(n, w).astype(dtype, copy=False)


def map_stamp(
    base: DataFrame,
    vec_col: str,
    out_col: str,
    stamp_fn: Callable[[np.ndarray], np.ndarray],
    vec_decode=None,
) -> DataFrame:
    """``base`` + an int32 ``out_col`` computed batch-wise from the
    decoded vector matrix: ``stamp_fn(V) -> (n,) int array``. One
    mapInArrow pass, zero shuffles, zero per-row objects."""
    import pyarrow as pa

    vi = base.columns.index(vec_col)
    names = base.columns + [out_col]

    def fn(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        for rb in batches:
            if rb.num_rows == 0:
                continue
            V = batch_matrix(rb.column(vi))
            if vec_decode is not None:
                V = vec_decode(V)
            stamped = pa.array(
                np.asarray(stamp_fn(V), dtype=np.int32), type=pa.int32()
            )
            yield pa.RecordBatch.from_arrays(
                list(rb.columns) + [stamped], names=names
            )

    schema = StructType(
        list(base.schema.fields) + [StructField(out_col, IntegerType())]
    )
    return base.mapInArrow(fn, schema)


def map_stamp_replicate(
    base: DataFrame,
    vec_col: str,
    out_col: str,
    expand_fn: Callable[[np.ndarray], tuple[np.ndarray, np.ndarray]],
    vec_decode=None,
) -> DataFrame:
    """Replicating variant (SPANN closure assignment): ``expand_fn(V) ->
    (row_idx, values)`` emits each input row once per assignment —
    output rows are ``rb.take(row_idx)`` plus ``out_col=values``."""
    import pyarrow as pa

    vi = base.columns.index(vec_col)
    names = base.columns + [out_col]

    def fn(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        for rb in batches:
            if rb.num_rows == 0:
                continue
            V = batch_matrix(rb.column(vi))
            if vec_decode is not None:
                V = vec_decode(V)
            rows, vals = expand_fn(V)
            out = rb.take(pa.array(np.asarray(rows, dtype=np.int64)))
            stamped = pa.array(
                np.asarray(vals, dtype=np.int32), type=pa.int32()
            )
            yield pa.RecordBatch.from_arrays(
                list(out.columns) + [stamped], names=names
            )

    schema = StructType(
        list(base.schema.fields) + [StructField(out_col, IntegerType())]
    )
    return base.mapInArrow(fn, schema)
