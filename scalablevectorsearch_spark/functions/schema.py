"""Vector-table schema validation — the engine's `check_dims` analog.

Parity: include/svs/core/data/simple.h:44-51 (check_dims — datasets have
a fixed dimensionality, enforced at construction/load), core.cpp:48-88
(VectorDataLoader validates dtype + dims at assemble time).

Spark shape: schema checks are static (column exists, element type is
numeric); the dimensionality check is one aggregate over the table
(min(size) == max(size) [== expected]) — run it at load/assemble
boundaries, not per operator."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, NumericType


class SchemaError(ValueError):
    pass


def validate_vector_table(
    df: DataFrame,
    id_col: str = "id",
    vec_col: str = "vector",
    expected_dims: int | None = None,
    check_ids_unique: bool = False,
) -> int:
    """Validate (id, vector) conventions; returns the dimensionality.

    Raises SchemaError on: missing columns, non-array / non-numeric
    vector element type, ragged or null vectors, dims != expected_dims,
    or (optionally) duplicate ids."""
    fields = {f.name: f.dataType for f in df.schema.fields}
    if id_col not in fields:
        raise SchemaError(f"missing id column {id_col!r}")
    if vec_col not in fields:
        raise SchemaError(f"missing vector column {vec_col!r}")
    vt = fields[vec_col]
    if not isinstance(vt, ArrayType) or not isinstance(vt.elementType, NumericType):
        raise SchemaError(
            f"{vec_col!r} must be ARRAY<numeric>, found {vt.simpleString()}"
        )
    agg = [
        F.min(F.size(vec_col)).alias("dmin"),
        F.max(F.size(vec_col)).alias("dmax"),
        F.sum(F.when(F.col(vec_col).isNull(), 1).otherwise(0)).alias("nulls"),
        F.count("*").alias("n"),
    ]
    if check_ids_unique:
        agg.append(F.countDistinct(id_col).alias("nid"))
    row = df.agg(*agg).collect()[0]
    if row["n"] == 0:
        raise SchemaError("empty vector table")
    if row["nulls"]:
        raise SchemaError(f"{row['nulls']} null vectors")
    if row["dmin"] != row["dmax"]:
        raise SchemaError(f"ragged dimensions: {row['dmin']}..{row['dmax']}")
    if expected_dims is not None and row["dmin"] != expected_dims:
        raise SchemaError(f"dims {row['dmin']} != expected {expected_dims}")
    if check_ids_unique and row["nid"] != row["n"]:
        raise SchemaError(f"{row['n'] - row['nid']} duplicate ids")
    return int(row["dmin"])
