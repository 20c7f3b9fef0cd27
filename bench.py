"""Benchmark harness — times the engine's headline operators at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...}

Baselines: BASELINE.md B1-B7.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from scalablevectorsearch_spark.session import get_spark
from scalablevectorsearch_spark.operators.flat import flat_knn

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
K = 10


def _sf() -> float:
    m = re.search(r"sf([0-9.]+)", SF_DIR)
    return float(m.group(1)) if m else -1.0


def bench_queries(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    base = emb.selectExpr("vec_id as id", "embedding as vector", "label")
    n_q = min(1000, emb.count())
    queries = emb.filter(F.col("vec_id") < n_q).selectExpr(
        "vec_id as qid", "embedding as vector"
    )

    def knn(distance):
        def run():
            return flat_knn(base, queries, k=K, distance=distance).count()

        return run

    return {
        "flat_knn_l2": knn("l2"),
        "flat_knn_ip": knn("ip"),
        "flat_knn_cosine": knn("cosine"),
    }


def main() -> None:
    spark = get_spark("svs-spark-bench")
    timings: dict[str, float] = {}
    for name, fn in bench_queries(spark).items():
        t0 = time.perf_counter()
        fn()
        timings[name] = round(time.perf_counter() - t0, 3)
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "bench_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": _sf(),
            }
        )
    )


if __name__ == "__main__":
    main()
