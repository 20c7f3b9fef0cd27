"""Per-query bench profile: wall seconds PLUS Spark job/stage/task
counts and executor-side time, attributed per bench query via the UI
REST API (guide §1: find WHERE the time goes before touching anything).

At the driver's bench scale (sf0.1 = 2000 vectors x 64d, 5000 docs) the
data is tiny, so per-query wall is dominated by FIXED costs: number of
driver actions (jobs), shuffle/AQE stage boundaries, Python-worker round
trips, and planning. Counting them per query tells us which queries pay
for scheduling rather than compute.

Usage: python tools/profile_bench.py [out.json]
  env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, "/root/repo")

import bench
from pyspark.sql import functions as F

from scalablevectorsearch_spark.operators.flat import flat_knn
from scalablevectorsearch_spark.session import get_spark


class RestSnap:
    def __init__(self, port: int = 4040):
        self.root = f"http://127.0.0.1:{port}/api/v1"
        apps = json.load(urllib.request.urlopen(f"{self.root}/applications"))
        self.app = apps[0]["id"]

    def jobs(self):
        return json.load(
            urllib.request.urlopen(f"{self.root}/applications/{self.app}/jobs")
        )

    def stages(self):
        return json.load(
            urllib.request.urlopen(
                f"{self.root}/applications/{self.app}/stages?status=complete"
            )
        )


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/bench_profile.json"
    spark = get_spark(
        "svs-bench-profile", extra_conf={"spark.ui.enabled": "true"}
    )
    sf_dir = bench.SF_DIR
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    base = emb.selectExpr("vec_id as id", "embedding as vector", "label")
    base.cache()
    n = base.count()
    n_q = min(1000, n)
    queries = base.filter(F.col("id") < n_q).selectExpr("id as qid", "vector")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    docs.cache()
    docs.count()
    flat_knn(base, queries.limit(2), k=2).count()  # warm-up, untimed

    rest = RestSnap()
    profile: dict[str, dict] = {}

    def hook(name):
        j0 = rest.jobs()
        s0 = rest.stages()
        t0 = time.perf_counter()

        def after():
            wall = time.perf_counter() - t0
            j1 = rest.jobs()
            s1 = rest.stages()
            seen = {j["jobId"] for j in j0}
            new_jobs = [j for j in j1 if j["jobId"] not in seen]
            sseen = {s["stageId"] for s in s0}
            new_stages = [s for s in s1 if s["stageId"] not in sseen]
            profile[name] = {
                "wall_sec": round(wall, 3),
                "n_jobs": len(new_jobs),
                "n_stages": sum(1 + j.get("numSkippedStages", 0) for j in new_jobs),
                "n_stages_run": len(new_stages),
                "n_tasks": sum(j.get("numTasks", 0) for j in new_jobs),
                "executor_run_ms": sum(
                    s.get("executorRunTime", 0) for s in new_stages
                ),
                "executor_cpu_ms": sum(
                    int(s.get("executorCpuTime", 0) / 1e6) for s in new_stages
                ),
                "shuffle_write_bytes": sum(
                    s.get("shuffleWriteBytes", 0) for s in new_stages
                ),
                "python_boundary_ms": None,
            }

        return after

    timings = bench.run_suite(spark, base, docs, queries, n, query_hook=hook)
    for name, t in timings.items():
        profile.setdefault(name, {})["timed_sec"] = t
    total = round(sum(timings.values()), 3)
    with open(out_path, "w") as f:
        json.dump({"total_sec": total, "sf_dir": sf_dir, "profile": profile}, f, indent=1)
    print(json.dumps({"total_sec": total, "out": out_path}))
    for name, p in profile.items():
        print(
            f"{name:32s} wall={p.get('wall_sec', 0):7.3f}s jobs={p.get('n_jobs', 0):3d} "
            f"stages_run={p.get('n_stages_run', 0):4d} tasks={p.get('n_tasks', 0):5d} "
            f"exec_run={p.get('executor_run_ms', 0) / 1000:7.2f}s "
            f"exec_cpu={p.get('executor_cpu_ms', 0) / 1000:7.2f}s "
            f"shuf_w={p.get('shuffle_write_bytes', 0) // 1024:6d}KiB"
        )


if __name__ == "__main__":
    main()
