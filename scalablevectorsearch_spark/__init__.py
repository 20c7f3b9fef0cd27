"""scalablevectorsearch_spark — a PySpark-native vector-search and
LLM-data-pipeline engine with the query capabilities of
intel/ScalableVectorSearch (SVS), re-expressed Spark-first.

Data model (SURVEY.md §1): vectors are ``ARRAY<FLOAT>`` columns keyed by a
BIGINT id; graphs are ``(src BIGINT, neighbors ARRAY<BIGINT>)``; query
results are exploded ``(qid, rank, neighbor_id, distance)`` rows.

Everything here is a function ``DataFrame -> DataFrame`` (or a small index
object holding DataFrames + params), planned declaratively so Catalyst
handles pushdown/pruning/join strategy; heavy math runs in Arrow-batched
numpy inside ``mapInPandas``/``applyInPandas`` (the Spark analog of the
reference's SIMD kernels).
"""

from scalablevectorsearch_spark.session import get_spark
from scalablevectorsearch_spark.functions.distances import (
    DISTANCES,
    distance_expr,
    is_similarity,
    norm_expr,
    pairwise_distances,
)
from scalablevectorsearch_spark.operators.flat import flat_knn
from scalablevectorsearch_spark.operators.topk import topk_per_group
from scalablevectorsearch_spark.operators.recall import k_recall_at

__version__ = "0.1.0"
