"""One-off tuning run on the 500k uniform stress dataset: fit
closure_bp / epsilon_bp from STORAGE and PROBE budgets (fit_closure_bp
/ fit_epsilon_bp), then measure routed recall per budget pair — picks
the stress-run budgets for the composed closure+epsilon path.

Uniform data is the worst case for cluster routing (concentrated
centroid distances): hand-picked basis points either degrade to full
fan-out or probe nothing, which is exactly why the budgets, not the
bps, are the knobs."""

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
from scalablevectorsearch_spark.sources.vecs import generate_test_dataset

N, N_QUERIES, DIM, K = 500_000, 500, 64, 10
N_SHARDS = max(8, N // 8192)  # ~61

spark = get_spark("closure-tune")
out = f"/root/repo/_artifacts/stress{N}"
if not os.path.exists(f"{out}/data"):
    generate_test_dataset(spark, N, N_QUERIES, DIM, out, seed=7, k=K)
data = spark.read.parquet(f"{out}/data")
data.cache().count()
queries = spark.read.parquet(f"{out}/queries")
gt = spark.read.parquet(f"{out}/groundtruth").select("qid", "neighbor_id")
gt.cache()
n_gt = gt.count()
Q = np.stack(queries.orderBy("qid").toPandas()["vector"].to_numpy()).astype(np.float64)

t0 = time.time()
model = train_kmeans(data, N_SHARDS, 2)
print(f"kmeans train: {round(time.time()-t0,1)}s", flush=True)
sample = np.stack(
    data.sample(0.01, seed=11).limit(5000).toPandas()["vector"].to_numpy()
).astype(np.float64)

P = VamanaParams(graph_max_degree=32, window_size=100)

for target_amp in (1.5, 2.0):
    cbp = fit_closure_bp(sample, model.centroids, target_amp)
    t0 = time.time()
    vi = vamana_build(
        data, P, n_shards=N_SHARDS, shard_by="kmeans",
        closure_bp=cbp, shard_model=model,
    )
    n_layout = vi.layout.count()
    vi.graph.cache().count()
    t_build = round(time.time() - t0, 1)
    for target_probes in (0.25, 0.4):
        ebp = fit_epsilon_bp(Q, model.centroids, target_probes * N_SHARDS)
        sel = probe_clusters_epsilon(Q, model.centroids, ebp)
        mp = float(np.mean([len(s) for s in sel]))
        t0 = time.time()
        res = vamana_search(vi, queries, k=K, search_window_size=30, epsilon_bp=ebp)
        m = (
            res.select("qid", "neighbor_id")
            .join(gt, ["qid", "neighbor_id"], "left_semi")
            .count()
        )
        print(
            f"amp_target={target_amp} cbp={cbp} amp={n_layout/N:.3f} "
            f"build={t_build}s probe_target={target_probes} ebp={ebp} "
            f"mean_probes={mp:.1f}/{N_SHARDS} recall={m/n_gt:.4f} "
            f"search={round(time.time()-t0,1)}s",
            flush=True,
        )
    vi.graph.unpersist()
    vi.layout.unpersist()
print("TUNE DONE", flush=True)
