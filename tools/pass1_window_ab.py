"""Pass-1 window A/B on the example_vamana golden fixture (VERDICT r11
task 5: claw back part of the two-pass build cost).

The reference's construct schedule runs BOTH passes at the full window
(index.h:428-429). Our batch-synchronous kernel pays the same 2x — this
experiment asks whether pass 1 (whose only job is a reasonable initial
graph for pass 2's re-link) can run at a reduced window without moving
the published recall curve.

Gate (from the verdict): every golden point inside the example's own
+-0.05 (examples/python/example_vamana.py:33-45), build time
meaningfully below the full two-pass wall. Negative results get
recorded in COVERAGE.md either way (profile_prune.py convention).

Pure numpy — runs the vamana_local kernel directly (single process, no
Spark session), so it can execute alongside a distributed stress run.
"""

import json
import os
import sys
import time

os.environ.setdefault("OPENBLAS_NUM_THREADS", "4")
os.environ.setdefault("OMP_NUM_THREADS", "4")

import numpy as np

sys.path.insert(0, "/root/repo")

from scalablevectorsearch_spark.operators.vamana_local import (
    VamanaParams,
    build_graph,
    search_graph,
)

EXPECTED = {10: 0.5664, 20: 0.7397, 30: 0.8288, 40: 0.8837}
EPSILON = 0.05
N, NQ, D, K = 10000, 1000, 128, 10

X = np.random.RandomState(1234).normal(size=(N, D)).astype(np.float32)
Q = np.random.RandomState(5678).normal(size=(NQ, D)).astype(np.float32)

# brute-force L2 groundtruth
Xd = X.astype(np.float64)
Qd = Q.astype(np.float64)
x_sq = np.einsum("ij,ij->i", Xd, Xd)
GT = np.empty((NQ, K), dtype=np.int64)
for c0 in range(0, NQ, 100):
    block = Qd[c0 : c0 + 100]
    Dm = x_sq[None, :] - 2.0 * (block @ Xd.T)
    GT[c0 : c0 + 100] = np.argsort(Dm, axis=1, kind="stable")[:, :K]

BASE = dict(
    graph_max_degree=64, alpha=1.2, window_size=128,
    max_candidate_pool_size=384, prune_to=60, use_full_search_history=True,
    build_dtype="float32",
)

VARIANTS = [
    ("two_pass_full", dict(build_passes=2)),
    ("two_pass_p1w64", dict(build_passes=2, build_pass1_window=64)),
    ("two_pass_p1w32", dict(build_passes=2, build_pass1_window=32)),
    # fractional pass 2: re-link only the earliest-linked nodes (the
    # ones pass 1 linked against a mostly-empty graph)
    ("two_pass_frac50", dict(build_passes=2, build_pass2_fraction=0.5)),
    ("two_pass_frac30", dict(build_passes=2, build_pass2_fraction=0.3)),
    ("single_pass", dict(build_passes=1)),
]
if os.environ.get("AB_VARIANTS"):
    keep = set(os.environ["AB_VARIANTS"].split(","))
    VARIANTS = [v for v in VARIANTS if v[0] in keep or v[0] == "two_pass_full"]

results = {}
for name, extra in VARIANTS:
    params = VamanaParams(**BASE, **extra)
    t0 = time.time()
    graph, entry = build_graph(Xd.astype(np.float64), params)
    build_sec = round(time.time() - t0, 1)
    curve = {}
    for sws in sorted(EXPECTED):
        ids, _ = search_graph(Xd, graph, entry, Qd, K, max(sws, K))
        hits = sum(
            len(np.intersect1d(ids[i], GT[i])) for i in range(NQ)
        )
        curve[sws] = round(hits / (NQ * K), 4)
    ok = all(abs(curve[s] - EXPECTED[s]) <= EPSILON for s in EXPECTED)
    results[name] = {"build_sec": build_sec, "curve": curve, "in_epsilon": ok}
    print(json.dumps({name: results[name]}), flush=True)

base_t = results["two_pass_full"]["build_sec"]
for name, r in results.items():
    r["speedup_vs_two_pass"] = round(base_t / max(r["build_sec"], 0.1), 2)
print(json.dumps(results, indent=2))
