from scalablevectorsearch_spark.functions.distances import (
    DISTANCES,
    distance_expr,
    is_similarity,
    norm_expr,
    pairwise_distances,
)
