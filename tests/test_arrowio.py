"""Unit tests for the zero-copy Arrow decode/encode helpers — including
the sliced-array offset cases that a naive buffer read gets wrong."""

import numpy as np
import pyarrow as pa
import pytest

from scalablevectorsearch_spark.functions.arrowio import (
    batch_matrix,
    binary_matrix,
    binary_rows,
    list_rows,
)


def test_batch_matrix_roundtrip():
    X = np.arange(12, dtype=np.float64).reshape(4, 3)
    col = pa.array(X.tolist(), type=pa.list_(pa.float64()))
    out = batch_matrix(col)
    assert np.array_equal(out, X)


def test_batch_matrix_sliced_view():
    X = np.arange(20, dtype=np.float64).reshape(5, 4)
    col = pa.array(X.tolist(), type=pa.list_(pa.float64())).slice(1, 3)
    out = batch_matrix(col)
    assert np.array_equal(out, X[1:4])


def test_batch_matrix_rejects_ragged():
    col = pa.array([[1.0, 2.0], [3.0]], type=pa.list_(pa.float64()))
    with pytest.raises(ValueError, match="ragged|uniform"):
        batch_matrix(col)


def test_batch_matrix_rejects_nulls():
    col = pa.array([[1.0, 2.0], None], type=pa.list_(pa.float64()))
    with pytest.raises(ValueError, match="non-null"):
        batch_matrix(col)


def test_binary_matrix_roundtrip():
    rows = [bytes(range(i, i + 4)) for i in range(0, 24, 4)]
    col = pa.array(rows, type=pa.binary())
    data, w = binary_matrix(col)
    assert w == 4
    assert bytes(data) == b"".join(rows)


def test_binary_matrix_sliced_view():
    rows = [bytes([i] * 3) for i in range(6)]
    col = pa.array(rows, type=pa.binary()).slice(2, 3)
    data, w = binary_matrix(col)
    assert w == 3
    assert bytes(data) == b"".join(rows[2:5])


def test_binary_matrix_rejects_ragged():
    col = pa.array([b"ab", b"abc"], type=pa.binary())
    with pytest.raises(ValueError, match="ragged"):
        binary_matrix(col)


def test_binary_rows_builds_column():
    data = np.frombuffer(b"abcdefgh", dtype=np.uint8)
    col = binary_rows(data, 4, 2)
    assert col.to_pylist() == [b"ab", b"cd", b"ef", b"gh"]
    # and decodes back through the reader
    back, w = binary_matrix(col)
    assert w == 2 and bytes(back) == b"abcdefgh"


def test_binary_rows_size_mismatch():
    with pytest.raises(ValueError, match="expected"):
        binary_rows(np.zeros(7, dtype=np.uint8), 4, 2)


def test_list_rows_builds_column():
    flat = np.arange(6, dtype=np.float64)
    col = list_rows(flat, 3, 2)
    assert col.to_pylist() == [[0.0, 1.0], [2.0, 3.0], [4.0, 5.0]]
    assert np.array_equal(batch_matrix(col), flat.reshape(3, 2))


def test_f16_matrix_pack_unpack_parity():
    """The vectorized pack/unpack must agree with the per-row helpers."""
    from scalablevectorsearch_spark.functions.precision import (
        _pack_matrix,
        _unpack_matrix,
        pack_bf16,
        pack_f16,
        unpack_bf16,
        unpack_f16,
    )

    rng = np.random.default_rng(7)
    X = rng.normal(size=(16, 8)) * 100
    for dtype, pack, unpack in (
        ("float16", pack_f16, unpack_f16),
        ("bfloat16", pack_bf16, unpack_bf16),
    ):
        flat = _pack_matrix(X, dtype)
        per_row = pack(X)
        assert bytes(flat) == b"".join(bytes(b) for b in per_row)
        V = _unpack_matrix(flat, 16, 8, dtype)
        want = np.stack([unpack(bytes(b)) for b in per_row])
        assert np.array_equal(V, want)
