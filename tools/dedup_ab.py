"""Dedup zero-miss operating-point A/B (VERDICT r7 task 6).

Chain-critical dedup (pair tables feeding dedup_components) needs the
banding miss probability to be ~0 at corpus scale, or split chains
produce bad canonicals. Three configs with their per-pair miss at
shingle-Jaccard 0.97 (miss = (1 - s^r)^bands, r = n_perm/n_bands):

  passes2  n_perm=16 n_bands=4 n_passes=2  -> 32 perms, 8 bands, r=4
           miss ~ 3.0e-8 (the r7 recommendation; pass-1 bands stay
           bit-identical to the single-pass default)
  perm32   n_perm=32 n_bands=8 n_passes=1  -> 32 perms, 8 bands, r=4
           miss ~ 3.0e-8 (same math as passes2 in ONE banding pass —
           structurally the same signature/band volume, so any timing
           gap is implementation, not math)
  r3       n_perm=18 n_bands=6 n_passes=1  -> 18 perms, 6 bands, r=3
           miss ~ 4.4e-7 (0.09 expected misses per 200k chain pairs:
           still zero-ish, with 44% less minhash compute and 25% less
           band-shuffle volume; r=3 admits more low-Jaccard candidates,
           so the exact-verify stage is the cost to watch)

Each config runs the stress_pipeline chain scenario (planted A~B~C
chains at ~0.97 Jaccard): timed pair mining + connected components,
asserting planted recall and counting bad canonicals (a bad canonical
IS a banding miss). The cheapest config with zero bad canonicals wins
and is recorded in dedup_minhash's docstring.

Usage: python tools/dedup_ab.py [n_docs] (default 2_000_000)
Appends one BENCH_HISTORY.jsonl line tagged {"dedup_ab": N}.
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from scalablevectorsearch_spark.session import get_spark
from scalablevectorsearch_spark.pipeline.dedup import dedup_components, dedup_minhash

N = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
VOCAB, MIN_LEN, LEN_SPREAD = 1000, 60, 80

spark = get_spark("dedup-ab")
out = f"/root/repo/_artifacts/stress_docs{N}"
if not os.path.exists(out):
    spark.range(N).select(
        F.col("id").alias("doc_id"),
        F.expr(
            f"array_join(transform(sequence(1, {MIN_LEN} + pmod(hash(id), {LEN_SPREAD})),"
            f" i -> concat('w', pmod(hash(id * 131071 + i), {VOCAB}))), ' ')"
        ).alias("text"),
    ).write.parquet(out)
docs = spark.read.parquet(out)
docs.cache()
n = docs.count()

near_src = docs.filter(F.col("doc_id") % 101 == 0)
n_near = near_src.count()
near = near_src.select(
    (F.col("doc_id") + 2 * N).alias("doc_id"),
    F.concat(F.col("text"), F.lit(" zzz")).alias("text"),
)
chain2 = near_src.select(
    (F.col("doc_id") + 4 * N).alias("doc_id"),
    F.concat(F.col("text"), F.lit(" zzz yyy")).alias("text"),
)
corpus = docs.unionByName(near).unionByName(chain2)
corpus = corpus.persist()
corpus.count()

CONFIGS = {
    "passes2": dict(n_perm=16, n_bands=4, n_passes=2),
    "perm32": dict(n_perm=32, n_bands=8, n_passes=1),
    "r3": dict(n_perm=18, n_bands=6, n_passes=1),
}
results: dict[str, dict] = {}
for name, cfg in CONFIGS.items():
    t0 = time.time()
    pairs = dedup_minhash(
        corpus, n_shingle=3, threshold=0.5, **cfg
    ).persist()
    n_pairs = pairs.count()
    t_pairs = round(time.time() - t0, 1)
    t0 = time.time()
    comp = dedup_components(pairs).persist()
    comp.count()
    t_comp = round(time.time() - t0, 1)
    bad = comp.filter(
        (F.col("doc_id") >= 2 * N) & (F.col("canonical_id") >= N)
    ).count()
    members = comp.filter(F.col("doc_id") >= 2 * N).count()
    planted = pairs.filter(
        (F.col("doc_b") >= 2 * N)
        & (F.col("doc_b") < 3 * N)
        & (F.col("doc_a") == F.col("doc_b") - 2 * N)
    ).count()
    results[name] = {
        "pairs_sec": t_pairs, "components_sec": t_comp,
        "total_sec": round(t_pairs + t_comp, 1), "n_pairs": n_pairs,
        "bad_canonicals": int(bad), "chain_members": int(members),
        "planted_recall": round(planted / n_near, 4),
        "load_avg": round(os.getloadavg()[0], 1),
    }
    pairs.unpersist()
    comp.unpersist()
    print(f"{name}: {json.dumps(results[name])}", flush=True)

zero_miss = {k: v for k, v in results.items() if v["bad_canonicals"] == 0}
pick = min(zero_miss, key=lambda k: zero_miss[k]["total_sec"]) if zero_miss else None
line = {
    "ts": __import__("datetime")
    .datetime.now(__import__("datetime").timezone.utc)
    .isoformat(timespec="seconds"),
    "dedup_ab": N,
    "results": results,
    "pick": pick,
}
with open("/root/repo/BENCH_HISTORY.jsonl", "a") as f:
    f.write(json.dumps(line) + "\n")
print(json.dumps(line), flush=True)
print(f"PICK: {pick}", flush=True)
