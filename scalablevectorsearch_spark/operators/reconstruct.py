"""Vector reconstruction — ids -> (possibly dequantized) vectors.

Parity: /root/reference/include/svs/index/vamana/index.h:631,
dynamic_index.h:1126-1155, bindings/python tests/test_reconstruction.py.

Spark plan: a join of the id set against the vectors table; Catalyst
broadcasts the id side when small and prunes the scan to (id, vector).
For quantized storage, pass the SQ params to decode inline (scalar.h
decompress semantics) — see operators.quantization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def reconstruct(
    vectors: DataFrame,
    ids: DataFrame,
    id_col: str = "id",
    vec_col: str = "vector",
) -> DataFrame:
    """Return (id, vector) for each requested id, preserving request ids.

    Unknown ids surface as null vectors (the reference throws on unknown
    ids for static indexes — callers can assert on null count).
    """
    req = ids.select(F.col(id_col).cast("long").alias("id"))
    src = vectors.select(F.col(id_col).cast("long").alias("id"), F.col(vec_col).alias("vector"))
    return req.join(src, "id", "left")
