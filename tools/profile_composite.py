"""Warm job-by-job timeline of the pipeline_composite bench row: run the
row `reps` times (same construction as bench.py), then list every Spark
job of the LAST (warm) run with its duration, the gap to the previous
job's end (driver-side planning/AQE time), and its job group/description
— attributing the row's wall to named jobs vs inter-job driver time
(guide §1: find WHERE the time goes; at sf0.1 the suspects are job-count
floor vs driver-side planning).

Usage: python tools/profile_composite.py [reps]
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
    # REST timestamps look like 2026-08-17T19:20:01.123GMT
    return (
        datetime.strptime(s.replace("GMT", ""), "%Y-%m-%dT%H:%M:%S.%f")
        .replace(tzinfo=timezone.utc)
        .timestamp()
    )


def composite(docs):
    from scalablevectorsearch_spark.pipeline.curate import (
        quality_filter,
        repetition_stats,
    )
    from scalablevectorsearch_spark.pipeline.dedup import (
        decontaminate,
        dedup_exact,
        dedup_minhash,
    )
    from scalablevectorsearch_spark.pipeline.pack import pack_sequences
    from scalablevectorsearch_spark.pipeline.text import lang_id, text_stats

    decisions = quality_filter(
        text_stats(docs), repetition_stats(docs, n=2), lang_id(docs)
    )
    kept = docs.join(decisions.filter("keep").select("doc_id"), "doc_id")
    kept = kept.join(
        dedup_exact(kept).filter("is_dup").select("doc_id"),
        "doc_id", "left_anti",
    )
    near = dedup_minhash(kept, n_shingle=3, n_perm=16, n_bands=4,
                         threshold=0.5).select(F.col("doc_b").alias("doc_id"))
    kept = kept.join(near.distinct(), "doc_id", "left_anti")
    probes = docs.filter(F.col("doc_id") % 29 == 0).select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"), "text"
    )
    contaminated = decontaminate(
        kept, probes, n_shingle=3, n_perm=16, n_bands=4, threshold=0.5
    ).select("doc_id")
    kept = kept.join(contaminated.distinct(), "doc_id", "left_anti")
    pack_sequences(kept, token_budget=4096).agg(
        F.max("bin_id"), F.sum("n_tokens")
    ).collect()


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark("svs-composite-profile", extra_conf={"spark.ui.enabled": "true"})
    sf_dir = bench.SF_DIR
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    base = emb.selectExpr("vec_id as id", "embedding as vector", "label")
    base.cache()
    base.count()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    docs.cache()
    docs.count()
    n_q = 2
    flat_knn(base, base.limit(n_q).selectExpr("id as qid", "vector"), k=2).count()

    root = "http://127.0.0.1:4040/api/v1"
    app = json.load(urllib.request.urlopen(f"{root}/applications"))[0]["id"]

    wall = None
    seen: set[int] = set()
    for r in range(reps):
        seen = {
            j["jobId"]
            for j in json.load(urllib.request.urlopen(f"{root}/applications/{app}/jobs"))
        }
        t0 = time.perf_counter()
        composite(docs)
        wall = time.perf_counter() - t0
        print(f"rep {r}: {wall:.3f}s")

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
        prev_end = end
        tot_dur += dur
        tot_gap += max(gap, 0)
        desc = (j.get("description") or j.get("name") or "")[:90]
        print(
            f"job {j['jobId']:5d} dur={dur * 1000:7.1f}ms gap={gap * 1000:7.1f}ms "
            f"tasks={j.get('numTasks', 0):4d} stages={len(j.get('stageIds', [])):2d} {desc}"
        )
    print(f"\nsum job dur {tot_dur:.3f}s, sum inter-job gap {tot_gap:.3f}s")


if __name__ == "__main__":
    main()
