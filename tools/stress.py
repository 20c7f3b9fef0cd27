import sys, time; sys.path.insert(0,'/root/repo')
from scalablevectorsearch_spark.session import get_spark
from pyspark.sql import functions as F
from scalablevectorsearch_spark.sources.vecs import generate_test_dataset
from scalablevectorsearch_spark.operators.flat import flat_knn
from scalablevectorsearch_spark.operators.ivf import ivf_build, ivf_search
from scalablevectorsearch_spark.operators.vamana import VamanaParams, vamana_build, vamana_search

spark = get_spark("stress")
out = "/root/repo/_artifacts/stress50k"
t0=time.time(); generate_test_dataset(spark, 50000, 500, 64, out, seed=7, k=10)
print(f"GEN {time.time()-t0:.1f}s", flush=True)
data = spark.read.parquet(f"{out}/data"); data.cache(); data.count()
queries = spark.read.parquet(f"{out}/queries").withColumnRenamed("qid","qid")
gt = spark.read.parquet(f"{out}/groundtruth")

t0=time.time(); res = flat_knn(data, queries, k=10); n=res.count()
print(f"FLAT 500q x 50k: {time.time()-t0:.1f}s rows={n}", flush=True)
m = res.select("qid","neighbor_id").join(gt.select("qid","neighbor_id"), ["qid","neighbor_id"], "left_semi").count()
print(f"FLAT recall vs generator gt: {m/gt.count():.4f}", flush=True)

t0=time.time(); idx = ivf_build(data, 128, 2); idx.clustered.cache().count()
print(f"IVF build k=128: {time.time()-t0:.1f}s", flush=True)
t0=time.time(); r = ivf_search(idx, queries, k=10, n_probes=16).select("qid","neighbor_id")
m = r.join(gt.select("qid","neighbor_id"), ["qid","neighbor_id"], "left_semi").count()
print(f"IVF search probes=16/128 ({16/128:.0%} scanned): {time.time()-t0:.1f}s recall={m/gt.count():.4f}", flush=True)

t0=time.time(); vi = vamana_build(data, VamanaParams(graph_max_degree=32, window_size=100), n_shards=32); vi.graph.cache().count()
print(f"VAMANA build 32 shards x ~1560: {time.time()-t0:.1f}s", flush=True)
t0=time.time(); r = vamana_search(vi, queries, k=10, search_window_size=30).select("qid","neighbor_id")
m = r.join(gt.select("qid","neighbor_id"), ["qid","neighbor_id"], "left_semi").count()
print(f"VAMANA search sws=30: {time.time()-t0:.1f}s recall={m/gt.count():.4f}", flush=True)
print("STRESS DONE", flush=True)
