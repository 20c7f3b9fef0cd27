"""Streaming throughput stress (VERDICT r7 task 5).

The streaming gates (streaming_knn / streaming_dedup / upsert_log /
window_agg) prove correctness at toy scale; this run records SUSTAINED
RATES at 1M+ rows and proves drained-vs-batch equality by hash:

 1. ingest/upsert: 1.25M upsert records (1M initial load + 200k
    re-upserts + 50k tombstones) drained through ingest_vectors in
    multiple availableNow micro-batches (maxFilesPerTrigger bounds the
    batch size) -> latest_view, hash-compared against the same
    resolution computed in batch over the identical inputs.
 2. stream_knn: 2000 queries drained in micro-batches against the 1M
    live base, results hash-compared against batch flat_knn.

Usage: python tools/stress_streaming.py [n_rows] (default 1_000_000)
Appends one BENCH_HISTORY.jsonl line tagged {"stress_streaming": N}
with rows/sec for each leg. Not a latency benchmark — availableNow
drain wall-time is the honest bulk-rate number a backfill/catch-up
run would see; continuous-trigger latency is a different measurement.
"""

import json
import os
import shutil
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F
from pyspark.sql import Window

from scalablevectorsearch_spark.session import get_spark
from scalablevectorsearch_spark.operators.flat import flat_knn
from scalablevectorsearch_spark.sources.vecs import _uniform_rows
from scalablevectorsearch_spark.streaming.ingest import (
    ingest_vectors,
    latest_view,
    stream_vectors,
)
from scalablevectorsearch_spark.streaming.search import stream_knn, stream_queries

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
N_UPSERT, N_DELETE, N_QUERIES, DIM, K = N // 5, N // 20, 2000, 64, 10
SEED = 23

spark = get_spark("stress-streaming")
out = f"/root/repo/_artifacts/stress_streaming_{N}"
shutil.rmtree(out, ignore_errors=True)
os.makedirs(out)
timings: dict[str, float] = {}
rates: dict[str, float] = {}


def gen_df(ids_df, stream, extra):
    def fn(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf["id"].to_numpy(dtype=np.int64)
            X = _uniform_rows(ids, DIM, SEED, stream)
            out_pdf = pd.DataFrame({"id": ids, "vector": list(X)})
            for k, v in extra(ids).items():
                out_pdf[k] = v
            yield out_pdf

    return ids_df.mapInPandas(
        fn, "id long, vector array<float>, is_delete boolean, seq long"
    )


# ---- build the upsert stream: 3 waves, written as many small files so
# maxFilesPerTrigger yields genuine multi-batch drains ----
load = gen_df(
    spark.range(N).select(F.col("id").cast("long")),
    0,
    lambda ids: {"is_delete": False, "seq": np.zeros(len(ids), dtype=np.int64)},
)
upserts = gen_df(
    spark.range(N_UPSERT).select((F.col("id") * 5 % N).cast("long").alias("id")),
    2,
    lambda ids: {"is_delete": False, "seq": np.full(len(ids), 1, dtype=np.int64)},
)
deletes = gen_df(
    spark.range(N_DELETE).select((F.col("id") * 7 % N).cast("long").alias("id")),
    0,
    lambda ids: {"is_delete": True, "seq": np.full(len(ids), 2, dtype=np.int64)},
)
src = f"{out}/upsert_src"
load.repartition(16).write.mode("append").parquet(src)
upserts.repartition(4).write.mode("append").parquet(src)
deletes.repartition(2).write.mode("append").parquet(src)
n_src = spark.read.parquet(src).count()

# ---- leg 1: drain the upsert log ----
t0 = time.time()
stream = (
    spark.readStream.schema("id long, vector array<float>, is_delete boolean, seq long")
    .option("maxFilesPerTrigger", 4)
    .parquet(src)
)
ingest_vectors(stream, f"{out}/upsert_log", f"{out}/ckpt_ingest")
timings["ingest_drain"] = round(time.time() - t0, 1)
n_batches = len(
    [f for f in os.listdir(f"{out}/ckpt_ingest/commits") if not f.startswith(".")]
)
rates["ingest_rows_per_sec"] = round(n_src / timings["ingest_drain"])
live = latest_view(spark, f"{out}/upsert_log")

# batch-computed expectation over the SAME inputs (no __batch tie-break
# needed: seq is unique per id by construction)
batch_log = spark.read.parquet(src)
w = Window.partitionBy("id").orderBy(F.col("seq").desc())
expected = (
    batch_log.withColumn("__rn", F.row_number().over(w))
    .filter((F.col("__rn") == 1) & (~F.col("is_delete")))
    .select("id", "vector")
)


def table_hash(df):
    return (
        df.select(
            F.xxhash64(
                F.col("id"), F.concat_ws(",", F.col("vector").cast("array<string>"))
            ).alias("h")
        )
        .agg(F.expr("bit_xor(h)").alias("s"), F.count("*").alias("n"))
        .collect()[0]
    )


h_live, h_exp = table_hash(live), table_hash(expected)
assert (h_live["s"], h_live["n"]) == (h_exp["s"], h_exp["n"]), (
    "drained upsert view != batch resolution",
    h_live,
    h_exp,
)
print(
    f"ingest: {n_src} rows in {timings['ingest_drain']}s "
    f"({rates['ingest_rows_per_sec']}/s, {n_batches} micro-batches), "
    f"live view {h_live['n']} rows == batch",
    flush=True,
)

# ---- leg 2: stream_knn over the live base ----
base = live.persist()
base.count()
qsrc = f"{out}/query_src"
queries = (
    spark.range(N_QUERIES)
    .select(F.col("id").cast("long"))
    .mapInPandas(
        lambda batches: (
            __import__("pandas").DataFrame(
                {
                    "qid": pdf["id"].to_numpy(dtype=np.int64),
                    "vector": list(
                        _uniform_rows(pdf["id"].to_numpy(dtype=np.int64), DIM, SEED, 9)
                    ),
                }
            )
            for pdf in batches
            if len(pdf)
        ),
        "qid long, vector array<float>",
    )
)
queries.repartition(8).write.mode("overwrite").parquet(qsrc)

t0 = time.time()
qstream = (
    spark.readStream.schema("qid long, vector array<float>")
    .option("maxFilesPerTrigger", 2)
    .parquet(qsrc)
)
stream_knn(base, qstream, f"{out}/knn_out", f"{out}/ckpt_knn", k=K)
timings["knn_drain"] = round(time.time() - t0, 1)
knn_batches = len(
    [f for f in os.listdir(f"{out}/ckpt_knn/commits") if not f.startswith(".")]
)
rates["knn_queries_per_sec"] = round(N_QUERIES / timings["knn_drain"], 1)

drained = spark.read.parquet(f"{out}/knn_out")
want = flat_knn(base, spark.read.parquet(qsrc), k=K)


def knn_hash(df):
    return (
        df.select(
            F.xxhash64(
                "qid", "rank", "neighbor_id", F.col("distance").cast("string")
            ).alias("h")
        )
        .agg(F.expr("bit_xor(h)").alias("s"), F.count("*").alias("n"))
        .collect()[0]
    )


h_got, h_want = knn_hash(drained), knn_hash(want)
assert (h_got["s"], h_got["n"]) == (h_want["s"], h_want["n"]), (
    "drained stream_knn != batch flat_knn",
    h_got,
    h_want,
)
print(
    f"stream_knn: {N_QUERIES} queries over {h_live['n']} base rows in "
    f"{timings['knn_drain']}s ({rates['knn_queries_per_sec']} q/s, "
    f"{knn_batches} micro-batches), drained hash == batch flat_knn",
    flush=True,
)

line = {
    "ts": __import__("datetime")
    .datetime.now(__import__("datetime").timezone.utc)
    .isoformat(timespec="seconds"),
    "stress_streaming": N,
    "timings": timings,
    "rates": rates,
    "micro_batches": {"ingest": n_batches, "knn": knn_batches},
    "drained_hash_equal": True,
    "load_avg": round(os.getloadavg()[0], 1),
}
with open("/root/repo/BENCH_HISTORY.jsonl", "a") as f:
    f.write(json.dumps(line) + "\n")
print(json.dumps(line), flush=True)
shutil.rmtree(out, ignore_errors=True)
print("STRESS-STREAMING DONE", flush=True)
