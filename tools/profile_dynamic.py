"""Warm job-by-job timeline of the dynamic_cycle bench row — same idea
as tools/profile_composite.py: run the row `reps` times over a fresh
vamana build each rep (the bench's shape), then print the LAST run's
jobs with durations, inter-job gaps and call sites, attributing the
row's wall to named jobs vs driver time.

Usage: python tools/profile_dynamic.py [reps]
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request
from datetime import datetime, timezone

sys.path.insert(0, "/root/repo")

import bench
from pyspark.sql import functions as F

from scalablevectorsearch_spark.operators.flat import flat_knn
from scalablevectorsearch_spark.session import get_spark


def _ts(s: str) -> float:
    return (
        datetime.strptime(s.replace("GMT", ""), "%Y-%m-%dT%H:%M:%S.%f")
        .replace(tzinfo=timezone.utc)
        .timestamp()
    )


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark("svs-dyn-profile", extra_conf={"spark.ui.enabled": "true"})
    sf_dir = bench.SF_DIR
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    base = emb.selectExpr("vec_id as id", "embedding as vector", "label")
    base.cache()
    n = base.count()
    queries = base.filter(F.col("id") < min(1000, n)).selectExpr("id as qid", "vector")
    flat_knn(base, queries.limit(2), k=2).count()

    from scalablevectorsearch_spark.operators.dynamic import (
        add_points,
        consolidate,
        delete_entries,
        dynamic_search,
        dynamic_vamana,
    )
    from scalablevectorsearch_spark.operators.vamana import vamana_build

    root = "http://127.0.0.1:4040/api/v1"
    app = json.load(urllib.request.urlopen(f"{root}/applications"))[0]["id"]

    K, SWS, SHARDS = bench.K, bench.VAMANA_SWS, bench.VAMANA_SHARDS
    n_mod = max(1, n // 100)
    seen: set[int] = set()
    wall = None
    for r in range(reps):
        idx = vamana_build(base.select("id", "vector"), bench.VAMANA, n_shards=SHARDS)
        idx.graph.cache().count()
        added = base.filter(F.col("id") < n_mod).selectExpr(
            f"id * {SHARDS} + 1000000 as id", "vector"
        )
        deleted = base.filter(F.col("id") % SHARDS == 1).limit(n_mod).select("id")
        seen = {
            j["jobId"]
            for j in json.load(urllib.request.urlopen(f"{root}/applications/{app}/jobs"))
        }
        t0 = time.perf_counter()
        marks = [("start", t0)]
        d = dynamic_vamana(idx)
        d = add_points(d, added)
        marks.append(("add_points", time.perf_counter()))
        d = delete_entries(d, deleted)
        marks.append(("delete_entries", time.perf_counter()))
        d = consolidate(d)
        marks.append(("consolidate", time.perf_counter()))
        dynamic_search(d, queries, k=K, search_window_size=SWS).count()
        marks.append(("search", time.perf_counter()))
        wall = time.perf_counter() - t0
        phases = ", ".join(
            f"{name}={t1 - t0_:.3f}s"
            for (_, t0_), (name, t1) in zip(marks, marks[1:])
        )
        print(f"rep {r}: {wall:.3f}s  [{phases}]")
        idx.graph.unpersist()
        if idx.layout is not None:
            idx.layout.unpersist()

    jobs = [
        j
        for j in json.load(urllib.request.urlopen(f"{root}/applications/{app}/jobs"))
        if j["jobId"] not in seen
    ]
    jobs.sort(key=lambda j: j["jobId"])
    print(f"\nlast rep wall {wall:.3f}s, {len(jobs)} jobs")
    prev_end = None
    tot_dur = tot_gap = 0.0
    for j in jobs:
        sub = _ts(j["submissionTime"])
        end = _ts(j["completionTime"])
        dur = end - sub
        gap = (sub - prev_end) if prev_end is not None else 0.0
        prev_end = max(prev_end or end, end)
        tot_dur += dur
        tot_gap += max(gap, 0)
        desc = (j.get("description") or j.get("name") or "")[:85]
        print(
            f"job {j['jobId']:5d} dur={dur * 1000:7.1f}ms gap={gap * 1000:7.1f}ms "
            f"tasks={j.get('numTasks', 0):4d} {desc}"
        )
    print(f"\nsum job dur {tot_dur:.3f}s, sum positive inter-job gap {tot_gap:.3f}s")


if __name__ == "__main__":
    main()
