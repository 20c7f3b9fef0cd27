"""Large-scale stress run — proves the sharded architecture's scaling
claims on this host, beyond the sf0.1 gate data.

Usage: python tools/stress.py [n_rows]   (default 500_000)

Builds a synthetic (n x 64) dataset with generator groundtruth, then
times: exact flat scan, IVF build + probed search, hash-sharded Vamana
build + fan-out search, kmeans-sharded Vamana build + routed search
(the SPANN-style 100 TB path: compute scales with probed fraction).
Appends one line to BENCH_HISTORY.jsonl tagged {"stress": n} and
asserts recall floors so a silent quality regression fails the run.
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from scalablevectorsearch_spark.session import get_spark
from scalablevectorsearch_spark.operators.flat import flat_knn
from scalablevectorsearch_spark.operators.ivf import ivf_build, ivf_search
from scalablevectorsearch_spark.operators.vamana import (
    VamanaParams,
    vamana_build,
    vamana_search,
)
from scalablevectorsearch_spark.sources.vecs import generate_test_dataset

N = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
N_QUERIES, DIM, K = 500, 64, 10
N_SHARDS = 64          # ~N/64 rows per independent graph kernel
IVF_CLUSTERS, IVF_PROBES = 128, 16
ROUTED_PROBES = 16     # probe 16/64 cells -> ~25% of the base scanned

spark = get_spark("stress")
out = f"/root/repo/_artifacts/stress{N}"
timings: dict[str, float] = {}
recalls: dict[str, float] = {}


def timed(name, fn):
    t0 = time.time()
    r = fn()
    timings[name] = round(time.time() - t0, 1)
    print(f"{name}: {timings[name]}s", flush=True)
    return r


if not os.path.exists(f"{out}/data"):
    timed("generate", lambda: generate_test_dataset(spark, N, N_QUERIES, DIM, out, seed=7, k=K))
data = spark.read.parquet(f"{out}/data")
data.cache()
print("rows:", data.count(), flush=True)
queries = spark.read.parquet(f"{out}/queries")
gt = spark.read.parquet(f"{out}/groundtruth").select("qid", "neighbor_id")
gt.cache()
n_gt = gt.count()


def recall(name, res):
    m = res.select("qid", "neighbor_id").join(gt, ["qid", "neighbor_id"], "left_semi").count()
    recalls[name] = round(m / n_gt, 4)
    print(f"{name} recall: {recalls[name]}", flush=True)


recall("flat", timed("flat_knn", lambda: flat_knn(data, queries, k=K)))

idx = timed("ivf_build", lambda: ivf_build(data, IVF_CLUSTERS, 2))
idx.clustered.cache().count()
recall(
    "ivf",
    timed("ivf_search", lambda: ivf_search(idx, queries, k=K, n_probes=IVF_PROBES)),
)

P = VamanaParams(graph_max_degree=32, window_size=100)


def vam_build():
    vi = vamana_build(data, P, n_shards=N_SHARDS)
    vi.graph.cache().count()
    return vi


vi = timed("vamana_build", vam_build)
recall(
    "vamana",
    timed("vamana_search", lambda: vamana_search(vi, queries, k=K, search_window_size=30)),
)


def routed_build():
    vr = vamana_build(data, P, n_shards=N_SHARDS, shard_by="kmeans")
    vr.graph.cache().count()
    return vr


vr = timed("vamana_routed_build", routed_build)
recall(
    "vamana_routed",
    timed(
        "vamana_routed_search",
        lambda: vamana_search(
            vr, queries, k=K, search_window_size=30, n_probes=ROUTED_PROBES
        ),
    ),
)

line = {
    "ts": __import__("datetime").datetime.now(
        __import__("datetime").timezone.utc
    ).isoformat(timespec="seconds"),
    "stress": N,
    "timings": timings,
    "recalls": recalls,
}
with open("/root/repo/BENCH_HISTORY.jsonl", "a") as f:
    f.write(json.dumps(line) + "\n")
print(json.dumps(line), flush=True)

# floors = observed-minus-margin REGRESSION guards for this synthetic
# UNIFORM dataset (no cluster structure, so probing 12-25% of cells
# caps cell-local recall well below clustered real-world data): at
# n=500k observed flat 1.0, ivf@16/128 0.561, vamana@sws30 0.894,
# routed@16/64 0.612
FLOORS = {"flat": 0.999, "ivf": 0.50, "vamana": 0.85, "vamana_routed": 0.55}
bad = {k: (recalls[k], v) for k, v in FLOORS.items() if recalls[k] < v}
assert not bad, f"recall floors violated: {bad}"
print("STRESS DONE", flush=True)
