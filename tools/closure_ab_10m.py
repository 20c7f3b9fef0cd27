"""Focused 10M incremental-closure A/B (VERDICT r7 task 2).

Reads the existing 10M stress dataset (tools/stress.py artifacts) and
measures ONLY the closure question: given the plain kmeans-sharded
graphs, is insert-linking the replica rows (closure_link_replicas,
dynamic_index.h:631-700 insert kernel at build-sized rounds) cheaper
than the batch closure rebuild, at unchanged recall?

The full batch baseline is NOT re-run here (it is the 1913s/1911s/1955s
vamana_closure_build row of the three recorded 10M stress runs —
BENCH_HISTORY, r6/r7); this run times the plain build + the incremental
link and searches both the epsilon operating point and the plain graphs
for the recall comparison. Kernel-level A/B context: on a 16k-row shard
at amplification 2, insert-linking the 8k replicas costs 0.50x the
16k-row rebuild (13.5s vs 27.1s, batch-size sweep in the r8 session),
so the expected incremental closure step is ~0.5x the batch build.

Usage: python tools/closure_ab_10m.py [n_rows] (default 10_000_000 —
reads _artifacts/stress{N}; run tools/stress.py first at a new N).
Appends one BENCH_HISTORY.jsonl line tagged {"closure_ab": N}.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from scalablevectorsearch_spark.session import get_spark
from scalablevectorsearch_spark.operators.ivf import fit_closure_bp, fit_epsilon_bp
from scalablevectorsearch_spark.operators.kmeans import train_kmeans
from scalablevectorsearch_spark.operators.vamana import (
    VamanaParams,
    closure_link_replicas,
    vamana_build,
    vamana_search,
)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
N_SHARDS = max(8, N // 8192)
CLOSURE_AMP, PROBE_FRACTION, CLOSURE_SWS, K = 2.0, 0.40, 50, 10
P = VamanaParams(graph_max_degree=32, window_size=100, build_dtype="float32")

spark = get_spark("closure-ab")
out = f"/root/repo/_artifacts/stress{N}"
data = spark.read.parquet(f"{out}/data")
queries = spark.read.parquet(f"{out}/queries")
gt = spark.read.parquet(f"{out}/groundtruth").select("qid", "neighbor_id")
gt.cache()
n_gt = gt.count()
timings: dict[str, float] = {}
recalls: dict[str, float] = {}
loads: dict[str, float] = {}


def timed(name, fn):
    loads[name] = round(os.getloadavg()[0], 1)
    t0 = time.time()
    r = fn()
    timings[name] = round(time.time() - t0, 1)
    print(f"{name}: {timings[name]}s (load {loads[name]})", flush=True)
    return r


def recall(name, df):
    m = df.select("qid", "neighbor_id").join(
        gt, ["qid", "neighbor_id"], "left_semi"
    ).count()
    recalls[name] = round(m / n_gt, 4)
    print(f"{name} recall: {recalls[name]}", flush=True)


# same fit flow as tools/stress.py's closure section
model = timed("closure_kmeans", lambda: train_kmeans(data, N_SHARDS, 2))
sample = np.stack(
    data.sample(min(1.0, 5000 / N * 4), seed=11)
    .limit(5000)
    .toPandas()["vector"]
    .to_numpy()
).astype(np.float64)
CLOSURE_BP = fit_closure_bp(sample, model.centroids, CLOSURE_AMP)
Q = np.stack(
    queries.orderBy("qid").toPandas()["vector"].to_numpy()
).astype(np.float64)
EPS_BP = fit_epsilon_bp(Q, model.centroids, PROBE_FRACTION * N_SHARDS)
meta = {
    "n_shards": N_SHARDS, "closure_bp_fitted": CLOSURE_BP,
    "eps_bp_fitted": EPS_BP,
    "batch_closure_baseline_sec": "1913.3/1911.2/1954.7 (r7/r6 10M stress rows)",
}


def plain_build():
    vp = vamana_build(
        data, P, n_shards=N_SHARDS, shard_by="kmeans", shard_model=model
    )
    vp.graph.cache().count()
    return vp


vp = timed("closure_plain_build", plain_build)


def incr():
    vci = closure_link_replicas(vp, CLOSURE_BP)
    n_layout = vci.layout.count()
    meta["closure_amplification"] = round(n_layout / N, 3)
    vci.graph.cache().count()
    return vci


vci = timed("closure_incr_link", incr)
timings["closure_incr_total"] = round(
    timings["closure_plain_build"] + timings["closure_incr_link"], 1
)
print(
    f"incremental closure: plain {timings['closure_plain_build']}s + link "
    f"{timings['closure_incr_link']}s = {timings['closure_incr_total']}s "
    f"(batch baseline ~1913s)",
    flush=True,
)

res = timed(
    "vamana_closure_incr_search",
    lambda: vamana_search(
        vci, queries, k=K, search_window_size=CLOSURE_SWS, epsilon_bp=EPS_BP
    ).persist(),
)
res.count()
recall("vamana_closure_incr", res)

line = {
    "ts": __import__("datetime")
    .datetime.now(__import__("datetime").timezone.utc)
    .isoformat(timespec="seconds"),
    "closure_ab": N,
    "timings": timings,
    "recalls": recalls,
    "meta": meta,
    "load_avg": loads,
}
with open("/root/repo/BENCH_HISTORY.jsonl", "a") as f:
    f.write(json.dumps(line) + "\n")
print(json.dumps(line), flush=True)
if N >= 10_000_000:
    assert recalls["vamana_closure_incr"] >= 0.90, recalls
print("CLOSURE-AB DONE", flush=True)
