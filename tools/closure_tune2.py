"""Follow-up tune: one amp-2.0 closure build, vary probe budget and
search window to find the >=0.80 routed-recall operating point."""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

from scalablevectorsearch_spark.session import get_spark
from scalablevectorsearch_spark.operators.ivf import (
    fit_closure_bp,
    fit_epsilon_bp,
    probe_clusters_epsilon,
)
from scalablevectorsearch_spark.operators.kmeans import train_kmeans
from scalablevectorsearch_spark.operators.vamana import (
    VamanaParams,
    vamana_build,
    vamana_search,
)

N, N_QUERIES, DIM, K = 500_000, 500, 64, 10
N_SHARDS = max(8, N // 8192)

spark = get_spark("closure-tune2")
out = f"/root/repo/_artifacts/stress{N}"
data = spark.read.parquet(f"{out}/data")
data.cache().count()
queries = spark.read.parquet(f"{out}/queries")
gt = spark.read.parquet(f"{out}/groundtruth").select("qid", "neighbor_id")
gt.cache()
n_gt = gt.count()
Q = np.stack(queries.orderBy("qid").toPandas()["vector"].to_numpy()).astype(np.float64)

model = train_kmeans(data, N_SHARDS, 2)
sample = np.stack(
    data.sample(0.01, seed=11).limit(5000).toPandas()["vector"].to_numpy()
).astype(np.float64)
cbp = fit_closure_bp(sample, model.centroids, 2.0)
P = VamanaParams(graph_max_degree=32, window_size=100)
t0 = time.time()
vi = vamana_build(
    data, P, n_shards=N_SHARDS, shard_by="kmeans", closure_bp=cbp, shard_model=model
)
n_layout = vi.layout.count()
vi.graph.cache().count()
print(f"build {round(time.time()-t0,1)}s amp={n_layout/N:.3f} cbp={cbp}", flush=True)

for target_probes, sws in ((0.5, 30), (0.4, 50), (0.5, 50), (0.6, 50)):
    ebp = fit_epsilon_bp(Q, model.centroids, target_probes * N_SHARDS)
    sel = probe_clusters_epsilon(Q, model.centroids, ebp)
    mp = float(np.mean([len(s) for s in sel]))
    t0 = time.time()
    res = vamana_search(vi, queries, k=K, search_window_size=sws, epsilon_bp=ebp)
    m = (
        res.select("qid", "neighbor_id")
        .join(gt, ["qid", "neighbor_id"], "left_semi")
        .count()
    )
    print(
        f"probe_target={target_probes} sws={sws} ebp={ebp} "
        f"mean_probes={mp:.1f}/{N_SHARDS} recall={m/n_gt:.4f} "
        f"search={round(time.time()-t0,1)}s",
        flush=True,
    )
print("TUNE2 DONE", flush=True)
