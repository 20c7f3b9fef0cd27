"""Line-by-line port of the reference's examples/python/example_vamana.py
+ example_vamana_dynamic.py flows onto the Spark engine: the only change
a reference user makes is the import line.

Run: python examples/example_reference_api.py
"""

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scalablevectorsearch_spark import api as svs  # was: import svs


def run() -> None:
    test_data_dir = tempfile.mkdtemp(prefix="example_data_vamana_")
    try:
        # [generate-dataset]
        svs.generate_test_dataset(
            2000,                     # vectors in the dataset
            100,                      # query vectors
            32,                       # dimensionality
            test_data_dir,
            data_seed=1234,
            query_seed=5678,
            num_threads=4,            # accepted; parallelism is the Spark session's
            distance=svs.DistanceType.L2,
            k=10,
        )

        # [build-parameters]
        parameters = svs.VamanaBuildParameters(
            graph_max_degree=24,
            window_size=64,
        )

        # [build-index] — from the written dataset via a loader
        index = svs.Vamana.build(
            parameters,
            svs.VectorDataLoader(
                os.path.join(test_data_dir, "data"), svs.DataType.float32
            ),
            svs.DistanceType.L2,
            num_threads=4,
        )

        # [perform-queries]
        import numpy as np

        spark = index.spark
        queries = np.stack(
            [r["vector"] for r in spark.read.parquet(
                os.path.join(test_data_dir, "queries")).orderBy("qid").collect()]
        )
        gt_rows = spark.read.parquet(
            os.path.join(test_data_dir, "groundtruth")
        ).orderBy("qid", "rank").collect()
        groundtruth = np.full((len(queries), 10), -1, dtype=np.int64)
        for r in gt_rows:
            groundtruth[int(r["qid"]), int(r["rank"]) - 1] = r["neighbor_id"]
        index.search_window_size = 30
        I, D = index.search(queries, 10)
        recall = svs.k_recall_at(groundtruth, I, 10, 10)
        print(f"static recall@10 (window 30): {recall:.3f}")
        assert recall > 0.8

        # [saving-loading]
        save_root = tempfile.mkdtemp(prefix="example_vamana_save_")
        index.save(
            os.path.join(save_root, "example_config"),
            os.path.join(save_root, "example_graph"),
            os.path.join(save_root, "example_data"),
        )
        index = svs.Vamana(
            os.path.join(save_root, "example_config"),
            svs.GraphLoader(os.path.join(save_root, "example_graph")),
            svs.VectorDataLoader(
                os.path.join(save_root, "example_data"), svs.DataType.float32
            ),
            svs.DistanceType.L2,
        )
        index.search_window_size = 30
        I2, _ = index.search(queries, 10)
        assert (I2 == I).all(), "loaded index must answer identically"
        shutil.rmtree(save_root, ignore_errors=True)

        # [dynamic] — build, mutate, consolidate().compact(), search
        data = np.stack(
            [r["vector"] for r in spark.read.parquet(
                os.path.join(test_data_dir, "data")).orderBy("id").collect()]
        )
        n = 1500
        dyn = svs.DynamicVamana.build(
            parameters, data[:n], np.arange(n), svs.DistanceType.L2
        )
        dyn.add(data[n:], np.arange(n, len(data)))
        dyn.delete(np.arange(100))
        dyn.consolidate().compact(1000)
        dyn.search_window_size = 40
        I3, _ = dyn.search(queries, 10)
        live = dyn.all_ids()
        print(f"dynamic index live ids: {len(live)}")
        assert len(live) == len(data) - 100
    finally:
        shutil.rmtree(test_data_dir, ignore_errors=True)
    print("example_reference_api: OK")


if __name__ == "__main__":
    run()
