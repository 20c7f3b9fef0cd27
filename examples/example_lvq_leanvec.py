"""Port of the reference's examples/python/vamana_with_compression_lvq.py
onto the Spark engine, plus the equivalent LeanVec flow. As with
example_reference_api.py, the only change a reference user makes is
the import line.

Run: python examples/example_lvq_leanvec.py
"""

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scalablevectorsearch_spark import api as svs  # was: import svs


def run() -> None:
    test_data_dir = tempfile.mkdtemp(prefix="example_data_lvq_")
    try:
        # [generate-dataset]
        svs.generate_test_dataset(
            1000,
            100,
            32,
            test_data_dir,
            data_seed=1234,
            query_seed=5678,
            num_threads=4,
            distance=svs.DistanceType.L2,
        )

        # [create-loader] — uncompressed loader, wrapped with LVQ 4x8
        uncompressed_loader = svs.VectorDataLoader(
            os.path.join(test_data_dir, "data"), svs.DataType.float32
        )
        B1 = 4   # primary quantization bits
        B2 = 8   # residual quantization bits
        compressed_loader = svs.LVQLoader(
            uncompressed_loader, primary=B1, residual=B2
        )

        # [build-index]
        parameters = svs.VamanaBuildParameters(
            graph_max_degree=32,
            window_size=64,
        )
        index = svs.Vamana.build(
            parameters, compressed_loader, svs.DistanceType.L2, num_threads=4,
            n_shards=2,
        )

        # [perform-queries]
        n_neighbors = 10
        index.search_window_size = 30
        from scalablevectorsearch_spark.session import get_spark

        spark = get_spark()
        queries = (
            spark.read.parquet(os.path.join(test_data_dir, "queries"))
            .orderBy("qid")
            .toPandas()
        )
        import numpy as np

        Q = np.stack(queries["vector"].to_numpy())
        I, D = index.search(Q, n_neighbors)

        # [recall]
        gt = (
            spark.read.parquet(os.path.join(test_data_dir, "groundtruth"))
            .orderBy("qid", "rank")
            .toPandas()
        )
        nq = gt["qid"].nunique()
        G = gt["neighbor_id"].to_numpy().reshape(nq, -1)
        recall = svs.k_recall_at(G[:, :n_neighbors], I, n_neighbors, n_neighbors)
        print(f"LVQ4x8 recall = {recall:.3f}")
        assert recall >= 0.8

        # [leanvec] — dimensionality-reduced index with full-dim
        # re-rank. Uniform random data is PCA's worst case (isotropic
        # spectrum), so keep 24 of 32 dims here; real embedding
        # corpora reduce much more aggressively.
        leanvec_loader = svs.LeanVecLoader(
            uncompressed_loader,
            leanvec_dims=24,
            primary_kind="lvq8",
            secondary_kind="float32",
        )
        lv_index = svs.Vamana.build(
            parameters, leanvec_loader, svs.DistanceType.L2, n_shards=2
        )
        lv_index.search_window_size = 100
        I2, _ = lv_index.search(Q, n_neighbors)
        recall2 = svs.k_recall_at(G[:, :n_neighbors], I2, n_neighbors, n_neighbors)
        print(f"LeanVec(24, lvq8 primary) recall = {recall2:.3f}")
        assert recall2 >= 0.9
    finally:
        shutil.rmtree(test_data_dir, ignore_errors=True)
    print("example_lvq_leanvec: OK")


if __name__ == "__main__":
    run()
