"""Diagnose the golden-curve gap: is it the GRAPH (construction quality)
or the SEARCH (traversal semantics)?

Builds the example_vamana fixture graph locally (driver-side, no Spark),
then measures recall@10 at sws 10/20/30/40 two ways on the SAME graph:
 (a) this engine's batch_greedy_search (the search the index serves);
 (b) an independent textbook DiskANN greedy search written here from
     the paper's pseudocode.
If (a) == (b), the graph is the gap; if (b) >> (a), the search is.
Also prints degree stats and, as a build-side control, the curve of a
from-scratch textbook two-pass Vamana build searched with (b).
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from scalablevectorsearch_spark.operators.vamana_local import (
    VamanaParams,
    batch_greedy_search,
    build_graph,
)

N, NQ, D = 10000, 1000, 128
K = 10

data = np.random.RandomState(1234).normal(size=(N, D)).astype(np.float32)
queries = np.random.RandomState(5678).normal(size=(NQ, D)).astype(np.float32)
X = data.astype(np.float64)
Q = queries.astype(np.float64)

# exact groundtruth@10
d2 = (
    np.einsum("ij,ij->i", Q, Q)[:, None]
    + np.einsum("ij,ij->i", X, X)[None, :]
    - 2.0 * (Q @ X.T)
)
gt = np.argsort(d2, axis=1, kind="stable")[:, :K]

params = VamanaParams(
    graph_max_degree=32, alpha=1.2, window_size=100,
    max_candidate_pool_size=250, prune_to=28, use_full_search_history=True,
)
t0 = time.time()
graph, entry = build_graph(X, params)
print(f"build: {time.time()-t0:.1f}s", flush=True)
degs = np.array([len(a) for a in graph])
print(
    f"degree: mean {degs.mean():.1f} min {degs.min()} max {degs.max()} "
    f"p10 {np.percentile(degs,10):.0f}",
    flush=True,
)


def recall_of(ids) -> float:
    hit = 0
    for q in range(NQ):
        hit += len(set(ids[q][: K].tolist()) & set(gt[q].tolist()))
    return hit / (NQ * K)


def textbook_search(q, sws):
    """DiskANN GreedySearch(s, q, k, L): candidate list of size L."""
    dist = lambda i: float(np.dot(X[i] - q, X[i] - q))
    L = [(dist(entry), entry)]
    visited = set()
    while True:
        unv = [(dd, i) for dd, i in L if i not in visited]
        if not unv:
            break
        dd, p = min(unv)
        visited.add(p)
        cur = {i for _, i in L}
        for nb in graph[p]:
            nb = int(nb)
            if nb not in cur:
                L.append((dist(nb), nb))
                cur.add(nb)
        L.sort()
        L = L[:sws]
    return [i for _, i in L[:K]]


for sws in (10, 20, 30, 40):
    ids_a, _ = batch_greedy_search(X, graph, [entry], Q, sws)
    ra = recall_of(ids_a)
    nq_tb = 200  # textbook python search is slow; subsample
    hit = 0
    for q in range(nq_tb):
        res = textbook_search(Q[q], sws)
        hit += len(set(res) & set(gt[q].tolist()))
    rb = hit / (nq_tb * K)
    print(f"sws={sws}: engine={ra:.4f} textbook_on_same_graph={rb:.4f}", flush=True)
