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
    register_distance,
)
from scalablevectorsearch_spark.functions.schema import validate_vector_table
from scalablevectorsearch_spark.operators.flat import flat_knn
from scalablevectorsearch_spark.operators.topk import topk_per_group
from scalablevectorsearch_spark.operators.recall import k_recall_at
from scalablevectorsearch_spark.operators.kmeans import (
    assign_clusters,
    group_centroids,
    nearest_centroid_grouped,
    stamp_clusters,
    train_hierarchical_kmeans,
    train_kmeans,
)
from scalablevectorsearch_spark.operators.ivf import ivf_build, ivf_search
from scalablevectorsearch_spark.operators.router import (
    CentroidRouter,
    build_centroid_router,
)
from scalablevectorsearch_spark.operators.vamana import (
    VamanaParams,
    closure_link_replicas,
    vamana_build,
    vamana_search,
)
from scalablevectorsearch_spark.operators.sq import sq_compress, sq_decompress, sq_knn, sq_train
from scalablevectorsearch_spark.operators.dynamic import (
    add_points,
    consolidate,
    delete_entries,
    dynamic_flat_knn,
    dynamic_search,
    dynamic_vamana,
)
from scalablevectorsearch_spark.operators.multivector import (
    multi_add_points,
    multi_delete_labels,
    multi_dynamic_search,
    multi_dynamic_vamana,
    multivector_knn,
)
from scalablevectorsearch_spark.pipeline.dedup import (
    decontaminate,
    dedup_components,
    decontaminate_exact,
    dedup_exact,
    dedup_lines,
    dedup_minhash,
    duplicate_spans,
    ngram_jaccard_neardup,
    remove_spans,
    simhash,
    simhash_neardup,
)
from scalablevectorsearch_spark.pipeline.curate import (
    dataset_split,
    pii_redact,
    quality_filter,
    repetition_stats,
    stratified_sample,
)
from scalablevectorsearch_spark.pipeline.pack import pack_sequences
from scalablevectorsearch_spark.pipeline.text import (
    doc_fingerprints,
    lang_id,
    normalize_text,
    text_stats,
    token_vocabulary,
)
from scalablevectorsearch_spark.operators.calibrate import calibrate_window
from scalablevectorsearch_spark.operators.iterator import BatchIterator, DefaultSchedule
from scalablevectorsearch_spark.operators.reconstruct import reconstruct
from scalablevectorsearch_spark.sources.index_store import (
    load_ivf,
    load_vamana,
    save_ivf,
    save_vamana,
    upgrade_index,
)
from scalablevectorsearch_spark.sources.vecs import (
    generate_test_dataset,
    random_dataset,
    read_svs,
    read_vecs,
    svs_to_df,
    vecs_to_df,
    write_svs,
    write_vecs,
)

__version__ = "0.2.0"
