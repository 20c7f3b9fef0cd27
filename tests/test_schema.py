"""Vector-table validation tests (check_dims parity)."""

import pytest
from pyspark.sql import functions as F

from scalablevectorsearch_spark.functions.schema import SchemaError, validate_vector_table


@pytest.fixture(scope="module")
def base(embeddings):
    return embeddings.selectExpr("vec_id as id", "embedding as vector")


def test_valid_table_returns_dims(base):
    assert validate_vector_table(base, check_ids_unique=True) == 64
    assert validate_vector_table(base, expected_dims=64) == 64


def test_wrong_dims_raises(base):
    with pytest.raises(SchemaError, match="!= expected"):
        validate_vector_table(base, expected_dims=128)


def test_missing_column_raises(base):
    with pytest.raises(SchemaError, match="missing vector column"):
        validate_vector_table(base.select("id"))


def test_non_array_raises(base):
    with pytest.raises(SchemaError, match="ARRAY<numeric>"):
        validate_vector_table(base.withColumn("vector", F.lit("oops")))


def test_ragged_raises(base, spark):
    ragged = base.limit(3).select(
        "id", F.expr("slice(vector, 1, cast(id + 1 as int))").alias("vector")
    )
    with pytest.raises(SchemaError, match="ragged"):
        validate_vector_table(ragged)


def test_duplicate_ids_raise(base):
    dup = base.limit(5).unionByName(base.limit(2))
    with pytest.raises(SchemaError, match="duplicate ids"):
        validate_vector_table(dup, check_ids_unique=True)
