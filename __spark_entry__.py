"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship flat k-NN on sf0.001.
``queries()`` — one entry per implemented operator (SURVEY.md §2).
``oracle_sql()`` — matching DuckDB SQL per query.

Convention (see scalablevectorsearch_spark/oracles.py): computed floats
are emitted as scaled BIGINTs (``*_e4`` = round(x*10000)) in both engines
so value hashes are float-format independent.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from scalablevectorsearch_spark import oracles
from scalablevectorsearch_spark.operators.flat import flat_knn
from scalablevectorsearch_spark.operators.ivf import ivf_build, ivf_search
from scalablevectorsearch_spark.operators.kmeans import (
    assign_clusters,
    assign_hierarchical,
    train_hierarchical_kmeans,
    train_kmeans,
)
from scalablevectorsearch_spark.operators.multivector import dedupe_by_label
from scalablevectorsearch_spark.operators.reconstruct import reconstruct
from scalablevectorsearch_spark.operators.dynamic import (
    add_points,
    consolidate,
    delete_entries,
    dynamic_flat_knn,
    dynamic_search,
    dynamic_vamana,
)
from scalablevectorsearch_spark.operators.sq import sq_compress, sq_decompress, sq_knn, sq_train
from scalablevectorsearch_spark.operators.vamana import VamanaParams, vamana_build, vamana_search
from scalablevectorsearch_spark.pipeline.dedup import dedup_exact, dedup_minhash, simhash
from scalablevectorsearch_spark.pipeline.multimodal import (
    extract_features,
    media_from_documents,
    media_stats,
)
from scalablevectorsearch_spark.pipeline.neardup import (
    embedding_neardup,
    embedding_neardup_clustered,
)
from scalablevectorsearch_spark.pipeline.text import doc_fingerprints, lang_id, text_stats
from scalablevectorsearch_spark.functions.distances import distance_expr

K = 10
N_QUERIES = 100
N_CLUSTERS = 16
KM_ITERS = 2
# 12/16 probes -> recall@10 = 0.943 vs the flat oracle at sf0.01; the
# synthetic embeddings are near-uniform, where IVF inherently needs a
# high probed fraction — real clustered corpora need far fewer probes
N_PROBES = 12
# round-half-up; identical formula in the numpy kernels and DuckDB oracles
E4 = lambda c: F.floor(F.col(c).cast("double") * 10000 + F.lit(0.5)).cast("long")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _base(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _emb(spark, sf_dir).selectExpr("vec_id as id", "embedding as vector", "label")


def _queries_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _emb(spark, sf_dir)
        .filter(F.col("vec_id") < N_QUERIES)
        .selectExpr("vec_id as qid", "embedding as vector")
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: exact cosine top-10 similarity join on sf0.001."""
    sf_dir = "/root/testdata/sf0.001"
    return _knn_query("cosine")(spark, sf_dir)


def _knn_query(distance: str, where=None):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        res = flat_knn(
            _base(spark, sf_dir),
            _queries_df(spark, sf_dir),
            k=K,
            distance=distance,
            where=where,
            round_to=4,
        )
        return res.select(
            "qid", "rank", "neighbor_id", E4("distance").alias("distance_e4")
        )

    return run


def _multivector_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = _base(spark, sf_dir)
    inner = flat_knn(base, _queries_df(spark, sf_dir), k=40, distance="l2", round_to=4)
    out = dedupe_by_label(inner, base.select("id", "label"), k=5, distance="l2")
    return out.select(
        "qid", "rank", F.col("label").cast("int"), "neighbor_id",
        E4("distance").alias("distance_e4"),
    )


def _multivector_graph_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-vector search served from INSIDE the graph index (multi.h:
    22-47 — the reference's MultiBatchIterator runs over the Vamana
    index, not a flat scan): inner candidates come from an
    exhaustive-window vamana_search over a prebuilt index, then the
    label dedupe + re-rank. Exhaustive window makes the inner stage
    exact, so the flat multivector SQL oracle applies unchanged —
    hash-gating the index-backed composition end to end."""
    base = _base(spark, sf_dir)
    idx = vamana_build(base.select("id", "vector"), VAMANA_PARAMS, n_shards=VAMANA_SHARDS)
    inner = vamana_search(
        idx, _queries_df(spark, sf_dir), k=40, search_window_size=4096
    )
    out = dedupe_by_label(inner, base.select("id", "label"), k=5, distance="l2")
    return out.select(
        "qid", "rank", F.col("label").cast("int"), "neighbor_id",
        E4("distance").alias("distance_e4"),
    )


def _recall_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = _base(spark, sf_dir)
    q = _queries_df(spark, sf_dir)
    gt = flat_knn(base, q, k=K, distance="l2", round_to=4).select("qid", "neighbor_id")
    res = flat_knn(base, q, k=K, distance="ip", round_to=4).select("qid", "neighbor_id")
    matched = res.join(gt, ["qid", "neighbor_id"], "left_semi").agg(
        F.count("*").alias("matched")
    )
    nq = res.agg(F.countDistinct("qid").alias("n_queries"))
    return matched.crossJoin(nq)


def _recall_at_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k_recall_at with k != n (k=5 groundtruth vs n=10 results) — the
    §2.4 recall aggregate as a gate-visible operator entry."""
    from scalablevectorsearch_spark.operators.recall import k_recall_at

    base = _base(spark, sf_dir)
    q = _queries_df(spark, sf_dir)
    gt = flat_knn(base, q, k=5, distance="l2", round_to=4)
    res = flat_knn(base, q, k=10, distance="ip", round_to=4)
    out = k_recall_at(gt, res, k=5, n=10)
    return out.select(E4("recall").alias("recall_e4"), "n_queries")


def _medioid_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _base(spark, sf_dir)
    comp = (
        df.select(F.posexplode("vector").alias("pos", "x"))
        .groupBy("pos")
        .agg(F.avg("x").alias("m"))
    )
    mean = (
        comp.agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
        .select(F.transform("pm", lambda s: s["m"]).alias("mv"))
    )
    d = df.crossJoin(F.broadcast(mean)).select(
        "id", distance_expr(F.col("vector"), F.col("mv"), "l2").alias("dist")
    )
    return (
        d.orderBy(F.col("dist").asc(), F.col("id").asc())
        .limit(1)
        .select(F.col("id").alias("entry_id"))
    )


def _reconstruct_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    # exploded (id, pos, val_e4): the driver's canonicalizer can't hash
    # array cells, so the gate compares one row per vector component
    base = _base(spark, sf_dir)
    ids = base.filter(F.col("id") < 50).select("id")
    rec = reconstruct(base, ids)
    return rec.select(
        "id", F.posexplode("vector").alias("pos", "__x")
    ).select("id", "pos", E4("__x").alias("val_e4"))


def _kmeans_assign_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = _base(spark, sf_dir)
    model = train_kmeans(base, N_CLUSTERS, KM_ITERS)
    return assign_clusters(base, model)


def _hier_stamp_assign_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The grouped triangle-inequality-pruned nearest-centroid stamp
    (kmeans.group_centroids — the r9 replacement for the O(N*C) flat
    stamp that walled the ≥5e7 builds) forced on via
    stamp_via="hierarchical": assignments hash-match the SAME exact
    argmin DuckDB oracle as kmeans_assign, proving the pruned stamp is
    exact, not approximate."""
    base = _base(spark, sf_dir)
    model = train_kmeans(base, N_CLUSTERS, KM_ITERS)
    return assign_clusters(base, model, stamp_via="hierarchical")


def _ivf_knn_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = _base(spark, sf_dir)
    index = ivf_build(base, N_CLUSTERS, KM_ITERS)
    res = ivf_search(
        index, _queries_df(spark, sf_dir), k=K, n_probes=N_PROBES, distance="l2", round_to=4
    )
    return res.select("qid", "rank", "neighbor_id", E4("distance").alias("distance_e4"))


def _ivf_knn_filtered_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid filtered ANN: predicate + probed clusters, both pushed
    into the member scan."""
    base = _base(spark, sf_dir)
    index = ivf_build(base, N_CLUSTERS, KM_ITERS)
    res = ivf_search(
        index, _queries_df(spark, sf_dir), k=K, n_probes=N_PROBES,
        distance="l2", round_to=4, where="label = 3",
    )
    return res.select("qid", "rank", "neighbor_id", E4("distance").alias("distance_e4"))


def _ivf_recall_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = _base(spark, sf_dir)
    q = _queries_df(spark, sf_dir)
    gt = flat_knn(base, q, k=K, distance="l2", round_to=4).select("qid", "neighbor_id")
    index = ivf_build(base, N_CLUSTERS, KM_ITERS)
    res = ivf_search(index, q, k=K, n_probes=N_PROBES, distance="l2", round_to=4).select(
        "qid", "neighbor_id"
    )
    matched = res.join(gt, ["qid", "neighbor_id"], "left_semi").agg(
        F.count("*").alias("matched")
    )
    nq = res.agg(F.countDistinct("qid").alias("n_queries"))
    return matched.crossJoin(nq)


HIER_PARENTS, HIER_CHILDREN = 4, 4


def _hier_kmeans_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = _base(spark, sf_dir)
    parent, children = train_hierarchical_kmeans(
        base, HIER_PARENTS, HIER_CHILDREN, KM_ITERS
    )
    return assign_hierarchical(base, parent, children)


INV_EPS_BP = 2000  # two-level Inverted: probe clusters within 1.2x of best


def _inverted_knn_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = _base(spark, sf_dir)
    index = ivf_build(base, N_CLUSTERS, KM_ITERS)
    res = ivf_search(
        index, _queries_df(spark, sf_dir), k=K, n_probes=0, distance="l2",
        round_to=4, epsilon_bp=INV_EPS_BP,
    )
    return res.select("qid", "rank", "neighbor_id", E4("distance").alias("distance_e4"))


def _inverted_routed_knn_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FULL two-level Inverted composition (memory_based.h:577-586
    route through the primary centroid index, :508 epsilon refinement)
    — the reference's default search design and this engine's default
    routed path at scale. Metamorphic hash gate: with
    ``router_candidates == n_clusters`` the router's candidate set is
    complete (route() pads to all cells), so routed epsilon probing
    EQUALS plain epsilon probing and the same SQL oracle gates the
    composition end to end."""
    from scalablevectorsearch_spark.operators.router import build_centroid_router

    base = _base(spark, sf_dir)
    index = ivf_build(base, N_CLUSTERS, KM_ITERS)
    router = build_centroid_router(index.model, distance="l2")
    res = ivf_search(
        index, _queries_df(spark, sf_dir), k=K, n_probes=0, distance="l2",
        round_to=4, epsilon_bp=INV_EPS_BP, router=router,
        router_candidates=N_CLUSTERS,
    )
    return res.select("qid", "rank", "neighbor_id", E4("distance").alias("distance_e4"))


def _sq_minmax_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    p = sq_train(_base(spark, sf_dir))
    e4 = lambda x: int(math.floor(x * 10000 + 0.5))
    e9 = lambda x: int(math.floor(x * 1000000000 + 0.5))
    return spark.createDataFrame(
        [(e4(p.gmin), e4(p.gmax), e9(p.scale), e9(p.bias))],
        "gmin_e4 long, gmax_e4 long, scale_e9 long, bias_e9 long",
    )


def _sq_roundtrip_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = _base(spark, sf_dir)
    p = sq_train(base)
    sub = base.filter(F.col("id") < 50)
    dec = sq_decompress(sq_compress(sub, p, "vector", "qv"), p, "qv", "dv")
    return dec.select("id", F.posexplode("dv").alias("pos", "__x")).select(
        "id", "pos", E4("__x").alias("val_e4")
    )


def _sq_knn_query(distance: str):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        base = _base(spark, sf_dir)
        p = sq_train(base)
        res = sq_knn(base, _queries_df(spark, sf_dir), p, k=K, distance=distance, round_to=4)
        return res.select("qid", "rank", "neighbor_id", E4("distance").alias("distance_e4"))

    return run


def _sq_vamana_knn_query(distance: str):
    """Metamorphic hash gate for the SQ-compressed Vamana index
    (extensions/vamana/scalar.h): graph build + greedy search over
    int8-domain storage with an exhaustive window must reproduce the
    flat SQ scan exactly — whose corrected-distance DuckDB oracle
    (sq_knn_sql) is already exact."""

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        from scalablevectorsearch_spark.operators.sq import (
            sq_vamana_build,
            sq_vamana_search,
        )

        base = _base(spark, sf_dir).select("id", "vector")
        p = sq_train(base)
        idx = sq_vamana_build(base, p, VAMANA_PARAMS, n_shards=VAMANA_SHARDS, distance=distance)
        res = sq_vamana_search(idx, _queries_df(spark, sf_dir), k=K, search_window_size=4096)
        return res.select("qid", "rank", "neighbor_id", E4("distance").alias("distance_e4"))

    return run


def _vamana_saveload_knn_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash gate for index save/load/assemble + the format upgrader
    (§2.1): build -> persist via the manifest store -> downgrade the
    manifest to the v0.1 layout (tables as a name list) -> the version
    gate must REFUSE it (load.h:810-825) -> upgrade_index migrates it
    (svs.upgrader parity) -> load -> exhaustive-window search must still
    equal exact flat k-NN. Any drift in the persisted
    graph/data/params/migration surfaces as a hash break."""
    import json
    import os
    import tempfile

    from scalablevectorsearch_spark.sources.index_store import (
        ManifestError,
        load_vamana,
        save_vamana,
        upgrade_index,
    )

    base = _base(spark, sf_dir).select("id", "vector")
    index = vamana_build(base, VAMANA_PARAMS, n_shards=VAMANA_SHARDS)
    path = tempfile.mkdtemp(prefix="svs_saveload_gate_")
    save_vamana(index, path)
    mpath = os.path.join(path, "manifest.json")
    with open(mpath) as f:
        m = json.load(f)
    m["tables"] = sorted(m["tables"])
    m["__version__"] = [0, 1, 0]
    with open(mpath, "w") as f:
        json.dump(m, f)
    try:
        load_vamana(spark, path)
        raise AssertionError("v0.1 manifest must be refused before upgrade")
    except ManifestError:
        pass
    upgrade_index(path)
    loaded = load_vamana(spark, path, validate=True)
    res = vamana_search(
        loaded, _queries_df(spark, sf_dir), k=K, search_window_size=4096
    )
    return res.select("qid", "rank", "neighbor_id", E4("distance").alias("distance_e4"))


GEN_N, GEN_NQ, GEN_D, GEN_K = 400, 20, 16, 5


def _testdata_generator_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Verdict gate for the seeded test-data generator
    (bindings/python/src/svs/common.py:214-265 parity): the written
    groundtruth (driver-side numpy brute force with (distance, id)
    lexsort) must EXACTLY equal the engine's distributed flat k-NN over
    the same written data — the generator and the gated scan agree on
    every (qid, rank, neighbor_id) triple."""
    import tempfile

    from scalablevectorsearch_spark.sources.vecs import generate_test_dataset

    out = tempfile.mkdtemp(prefix="svs_gen_gate_")
    generate_test_dataset(spark, GEN_N, GEN_NQ, GEN_D, out, seed=3, k=GEN_K)
    data = spark.read.parquet(f"{out}/data")
    qdf = spark.read.parquet(f"{out}/queries")
    gt = spark.read.parquet(f"{out}/groundtruth")
    res = flat_knn(data, qdf, k=GEN_K, distance="l2", round_to=None).select(
        "qid", "rank", "neighbor_id"
    )
    agree = gt.join(res, ["qid", "rank", "neighbor_id"]).agg(
        F.count("*").alias("n_agree")
    )
    return agree.crossJoin(gt.agg(F.count("*").alias("n_gt"))).select(
        (
            (F.col("n_agree") == F.col("n_gt"))
            & (F.col("n_gt") == F.lit(GEN_NQ * GEN_K))
        )
        .cast("long")
        .alias("ok_groundtruth"),
        F.lit(GEN_NQ * GEN_K).cast("long").alias("n_pairs"),
    )


F16_RECALL_FLOOR_E4 = 9000


def _mixed_precision_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Verdict gate for 16-bit packed storage (float16.h / bfloat16.h;
    mixed-pair distances euclidean.h:320-430). The 16-bit rounding
    functions aren't SQL-expressible, so the gate checks the properties
    that pin them: representable-error bounds on the round-trip,
    pack∘unpack idempotence, and mixed-precision k-NN recall vs exact."""
    from scalablevectorsearch_spark.functions.precision import (
        compress_vectors,
        decompress_vectors,
        f16_knn,
    )

    base = _base(spark, sf_dir).select("id", "vector")
    b = compress_vectors(base, "float16", "vector", "p16")
    b = compress_vectors(b, "bfloat16", "vector", "pb16")
    b = decompress_vectors(b, "float16", "p16", "d16")
    b = decompress_vectors(b, "bfloat16", "pb16", "db16")
    # second round-trip of the f16 path must be the identity (16-bit
    # values are exactly representable in the widened domain)
    b = compress_vectors(b, "float16", "d16", "p16b")

    def bound_ok(orig: str, dec: str, rel: float, eps: float):
        return F.forall(
            F.zip_with(
                orig, dec,
                lambda a, d: F.abs(a.cast("double") - d)
                <= F.greatest(F.abs(a.cast("double")) * F.lit(rel), F.lit(eps)),
            ),
            lambda x: x,
        )

    checks = b.agg(
        # f16: 10 mantissa bits -> rel 2^-11 (normals), abs 2^-24 (subnormals)
        F.min(bound_ok("vector", "d16", 2.0**-11, 2.0**-24).cast("long")).alias(
            "ok_f16_bound"
        ),
        # bf16: 7 mantissa bits -> rel 2^-8
        F.min(bound_ok("vector", "db16", 2.0**-8, 1e-30).cast("long")).alias(
            "ok_bf16_bound"
        ),
        F.min((F.col("p16") == F.col("p16b")).cast("long")).alias("ok_idempotent"),
        F.count("*").alias("n_rows"),
    )
    queries_df = _queries_df(spark, sf_dir)
    res = f16_knn(
        b.select("id", "p16"), queries_df, k=K, dtype="float16", packed_col="p16"
    )
    exact = flat_knn(base, queries_df, k=K, distance="l2")
    matched = res.select("qid", "neighbor_id").join(
        exact.select("qid", "neighbor_id"), ["qid", "neighbor_id"]
    )
    rec = matched.agg(F.count("*").alias("matched")).crossJoin(
        queries_df.agg(F.count("*").alias("n_queries"))
    )
    rec_ok = rec.select(
        (F.col("matched") * 10000 >= F.lit(F16_RECALL_FLOOR_E4) * K * F.col("n_queries"))
        .cast("long")
        .alias("ok_recall")
    )
    return checks.crossJoin(rec_ok).select(
        "ok_f16_bound", "ok_bf16_bound", "ok_idempotent", "ok_recall",
        F.lit(F16_RECALL_FLOOR_E4).cast("long").alias("floor_e4"),
        F.col("n_rows").cast("long").alias("n_rows"),
    )


VAMANA_PARAMS = VamanaParams(alpha=1.2, graph_max_degree=16, window_size=50)
VAMANA_SHARDS = 2
VAMANA_SWS = 30


def _vamana_knn_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Invariant-verdict hash gate for the approximate search at its
    PRODUCTION window size (the exact values aren't SQL-expressible;
    vamana_exhaustive_knn hash-gates the machinery, vamana_recall the
    quality): one row per (qid, rank) verifying rank completeness,
    distance monotonicity, per-query neighbor distinctness, and base
    membership — the oracle is the constant all-true verdict table, so
    any violated invariant (or missing/extra row) breaks the hash."""
    from pyspark.sql import Window

    base = _base(spark, sf_dir).select("id", "vector")
    index = vamana_build(base, VAMANA_PARAMS, n_shards=VAMANA_SHARDS)
    res = vamana_search(index, _queries_df(spark, sf_dir), k=K, search_window_size=VAMANA_SWS)
    res = res.withColumn("d_e4", E4("distance"))
    members = base.select(F.col("id").alias("neighbor_id"), F.lit(1).alias("__in_base"))
    res = res.join(F.broadcast(members), "neighbor_id", "left")
    prev = F.lag("d_e4").over(Window.partitionBy("qid").orderBy("rank"))
    dup = F.count("*").over(Window.partitionBy("qid", "neighbor_id"))
    ok = (
        (F.col("__in_base") == 1)
        & (prev.isNull() | (F.col("d_e4") >= prev))
        & (dup == 1)
    )
    return res.select("qid", "rank", ok.cast("long").alias("ok"))


def _vamana_exhaustive_knn_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metamorphic hash gate for the WHOLE Vamana path: with an
    exploration window >= every shard's size, the greedy traversal
    expands each shard's entire (connected) graph, so build + search +
    merge must reproduce exact flat k-NN — which has a SQL oracle. This
    turns the non-SQL-expressible graph machinery into a hash-gated
    correctness check (graph connectivity, local remap, buffer, merge)."""
    base = _base(spark, sf_dir).select("id", "vector")
    index = vamana_build(base, VAMANA_PARAMS, n_shards=VAMANA_SHARDS)
    res = vamana_search(
        index, _queries_df(spark, sf_dir), k=K, search_window_size=4096
    )
    return res.select("qid", "rank", "neighbor_id", E4("distance").alias("distance_e4"))


def _vamana_hier_stamp_knn_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build-time hierarchical stamp end-to-end: a kmeans-sharded
    CLOSURE index whose shard assignment AND replica expansion run the
    grouped triangle-pruned pass (stamp_via="hierarchical", the r9
    answer to the O(N*S) stamp wall), searched at an exhaustive window
    with full fan-out — results hash-match the exact flat k-NN oracle,
    so the grouped stamp provably changes neither assignments nor the
    closure replica sets."""
    base = _base(spark, sf_dir).select("id", "vector")
    index = vamana_build(
        base, VAMANA_PARAMS, n_shards=4, shard_by="kmeans",
        closure_bp=VAMANA_CLOSURE_BP, stamp_via="hierarchical",
    )
    res = vamana_search(
        index, _queries_df(spark, sf_dir), k=K, search_window_size=4096
    )
    return res.select("qid", "rank", "neighbor_id", E4("distance").alias("distance_e4"))


def _vamana_knn_filtered_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid filtered graph search (vamana_search(where=), the graph
    composition of flat.h:290-295's predicate semantics): at an
    exhaustive exploration window the predicate-filtered traversal must
    reproduce exact filtered flat k-NN — same SQL oracle as
    flat_knn_filtered. Non-matching nodes stay traversable waypoints
    (tombstone mechanism), so graph connectivity through filtered-out
    regions is part of what this gate checks — therefore
    ``fallback_below=None`` is PINNED: the default auto exact-fallback
    (engaging at <=2% selectivity) must never reroute this gate to the
    flat path, or it would pass without traversing the graph at all.
    (The testdata label column is ~uniform over 10 values, so
    "label = 3" sits near 10% selectivity — above the 2% auto
    threshold — but the pin keeps the gate honest under any future
    data or threshold change. The auto fallback has its own gate:
    vamana_auto_fallback_knn.)"""
    base = _base(spark, sf_dir).select("id", "vector", "label")
    index = vamana_build(base, VAMANA_PARAMS, n_shards=VAMANA_SHARDS)
    res = vamana_search(
        index, _queries_df(spark, sf_dir), k=K, search_window_size=4096,
        where="label = 3", fallback_below=None,
    )
    return res.select("qid", "rank", "neighbor_id", E4("distance").alias("distance_e4"))


# Recall floors for the verdict gates: observed recalls are 0.992-0.996
# (vamana), 0.896-0.904 (routed/router), 0.994-0.999 (dynamic) at
# sf0.001/sf0.01 — floors sit a safety margin below while still
# catching any real quality regression.
VAMANA_RECALL_FLOOR_E4 = 9500
ROUTED_RECALL_FLOOR_E4 = 8500
DYNAMIC_RECALL_FLOOR_E4 = 9500


def _recall_verdict(matched_nq: DataFrame, floor_e4: int) -> DataFrame:
    """(ok, floor_e4, n_queries) — ok = recall >= floor in exact integer
    arithmetic (matched * 10000 >= floor_e4 * k * n_queries)."""
    return matched_nq.select(
        (F.col("matched") * 10000 >= F.lit(floor_e4) * K * F.col("n_queries"))
        .cast("long")
        .alias("ok"),
        F.lit(floor_e4).cast("long").alias("floor_e4"),
        F.col("n_queries").cast("long").alias("n_queries"),
    )


def _vamana_recall_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall-floor verdict (hash-gated): matched count vs the exact
    flat oracle, asserted >= VAMANA_RECALL_FLOOR_E4."""
    base = _base(spark, sf_dir).select("id", "vector")
    q = _queries_df(spark, sf_dir)
    gt = flat_knn(base, q, k=K, distance="l2", round_to=4).select("qid", "neighbor_id")
    index = vamana_build(base, VAMANA_PARAMS, n_shards=VAMANA_SHARDS)
    res = vamana_search(index, q, k=K, search_window_size=VAMANA_SWS).select(
        "qid", "neighbor_id"
    )
    matched = res.join(gt, ["qid", "neighbor_id"], "left_semi").agg(
        F.count("*").alias("matched")
    )
    nq = res.agg(F.countDistinct("qid").alias("n_queries"))
    return _recall_verdict(matched.crossJoin(nq), VAMANA_RECALL_FLOOR_E4)


DYN_ADDED = 5
DYN_OFFSET = 100000
DYN_DEL_LO, DYN_DEL_HI = 5, 15


def _vamana_routed_recall_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPANN-style: kmeans-sharded Vamana with n_probes routing; recall
    vs exact flat, emitted as a hash-gated floor verdict."""
    base = _base(spark, sf_dir).select("id", "vector")
    q = _queries_df(spark, sf_dir)
    gt = flat_knn(base, q, k=K, distance="l2", round_to=4).select("qid", "neighbor_id")
    index = vamana_build(base, VAMANA_PARAMS, n_shards=4, shard_by="kmeans")
    res = vamana_search(
        index, q, k=K, search_window_size=VAMANA_SWS, n_probes=3
    ).select("qid", "neighbor_id")
    matched = res.join(gt, ["qid", "neighbor_id"], "left_semi").agg(
        F.count("*").alias("matched")
    )
    nq = res.agg(F.countDistinct("qid").alias("n_queries"))
    return _recall_verdict(matched.crossJoin(nq), ROUTED_RECALL_FLOOR_E4)


VAMANA_CLOSURE_BP = 2000  # replicate boundary rows into cells within 1.2x
VAMANA_EPS_BP = 2000      # probe every cell within 1.2x of the best centroid
CLOSURE_RECALL_FLOOR_E4 = 9500


def _vamana_closure_recall_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed 100 TB routed path (SPANN closure assignment +
    adaptive epsilon-cutoff shard probing, memory_based.h:407-460,:508):
    boundary vectors are replicated into neighboring cells at build
    time, and each query probes every cell within (1 + eps) of its best
    centroid instead of a fixed n_probes. Observed recall 0.993-0.998
    at sf0.001/sf0.01 — vs 0.896-0.904 for fixed-probe routing — gated
    as a hash-matched floor verdict."""
    base = _base(spark, sf_dir).select("id", "vector")
    q = _queries_df(spark, sf_dir)
    gt = flat_knn(base, q, k=K, distance="l2", round_to=4).select("qid", "neighbor_id")
    index = vamana_build(
        base, VAMANA_PARAMS, n_shards=4, shard_by="kmeans",
        closure_bp=VAMANA_CLOSURE_BP,
    )
    res = vamana_search(
        index, q, k=K, search_window_size=VAMANA_SWS, epsilon_bp=VAMANA_EPS_BP
    ).select("qid", "neighbor_id")
    matched = res.join(gt, ["qid", "neighbor_id"], "left_semi").agg(
        F.count("*").alias("matched")
    )
    nq = res.agg(F.countDistinct("qid").alias("n_queries"))
    return _recall_verdict(matched.crossJoin(nq), CLOSURE_RECALL_FLOOR_E4)


def _vamana_router_recall_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sublinear probe selection: a Vamana graph over the shard
    centroids (the two-level Inverted primary-index design,
    clustering.h:786-809) routes each query to its n_probes cells
    without the exact O(C*d) centroid argmin. Recall vs exact flat,
    emitted as a hash-gated floor verdict (probe-overlap floors in
    tests/test_router.py)."""
    from scalablevectorsearch_spark.operators.router import build_centroid_router

    base = _base(spark, sf_dir).select("id", "vector")
    q = _queries_df(spark, sf_dir)
    gt = flat_knn(base, q, k=K, distance="l2", round_to=4).select("qid", "neighbor_id")
    index = vamana_build(base, VAMANA_PARAMS, n_shards=4, shard_by="kmeans")
    router = build_centroid_router(index.shard_model, distance="l2")
    res = vamana_search(
        index, q, k=K, search_window_size=VAMANA_SWS, n_probes=3, router=router
    ).select("qid", "neighbor_id")
    matched = res.join(gt, ["qid", "neighbor_id"], "left_semi").agg(
        F.count("*").alias("matched")
    )
    nq = res.agg(F.countDistinct("qid").alias("n_queries"))
    return _recall_verdict(matched.crossJoin(nq), ROUTED_RECALL_FLOOR_E4)


def _vamana_routed_default_recall_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The r6 routed-default MACHINERY: probe_budget fits an epsilon
    cutoff per query block (fit_epsilon_bp — the reference two-level
    Inverted default, memory_based.h:508) so mean probes/query ~=
    budget. Gated at the SAME mean probes as vamana_routed_recall's
    fixed n_probes=3 so the two verdicts compare adaptive vs fixed at
    equal probe cost; the bare default (router= with no probe argument)
    resolves to probe_budget=n_shards/2 through this exact code path
    (pinned by tests/test_vamana.py). Hash-gated floor verdict."""
    from scalablevectorsearch_spark.operators.router import build_centroid_router

    base = _base(spark, sf_dir).select("id", "vector")
    q = _queries_df(spark, sf_dir)
    gt = flat_knn(base, q, k=K, distance="l2", round_to=4).select("qid", "neighbor_id")
    index = vamana_build(base, VAMANA_PARAMS, n_shards=4, shard_by="kmeans")
    router = build_centroid_router(index.shard_model, distance="l2")
    res = vamana_search(
        index, q, k=K, search_window_size=VAMANA_SWS, router=router,
        probe_budget=3.0,
    ).select("qid", "neighbor_id")
    matched = res.join(gt, ["qid", "neighbor_id"], "left_semi").agg(
        F.count("*").alias("matched")
    )
    nq = res.agg(F.countDistinct("qid").alias("n_queries"))
    return _recall_verdict(matched.crossJoin(nq), ROUTED_RECALL_FLOOR_E4)


def _ivf_budget_recall_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ivf_search(probe_budget=...): budget-invariant adaptive probing
    with the clamped fit (per-query probes in [~3/4·budget,
    2·budget]; fit_epsilon_bp accounts for the clamp — see
    operators/ivf.py probe_clusters_epsilon for the measured
    rationale). Hash-gated floor verdict at a constrained budget so the
    clamp actually binds (budget 3 of 4 clusters -> floor 2, cap 4;
    the floor stays strictly below the budget — budget_probe_clamp —
    so the fitted cutoff keeps room to adapt)."""
    base = _base(spark, sf_dir).select("id", "vector")
    q = _queries_df(spark, sf_dir)
    gt = flat_knn(base, q, k=K, distance="l2", round_to=4).select("qid", "neighbor_id")
    index = ivf_build(base, n_clusters=4, n_iters=2)
    res = ivf_search(index, q, k=K, probe_budget=3.0).select("qid", "neighbor_id")
    matched = res.join(gt, ["qid", "neighbor_id"], "left_semi").agg(
        F.count("*").alias("matched")
    )
    nq = res.agg(F.countDistinct("qid").alias("n_queries"))
    return _recall_verdict(matched.crossJoin(nq), ROUTED_RECALL_FLOOR_E4)


CALIBRATED_RECALL_FLOOR_E4 = 9000


def _routed_calibrated_recall_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r7: recall-TARGETED probe-budget calibration
    (operators/calibrate.py calibrate_probe_budget — the reference's
    calibrate.h:249 binary search against groundtruth + target recall,
    applied to the probe-cost axis). Replaces the hand-picked
    n_shards/2 routed default with a budget fitted to hit 0.90 on this
    data's geometry; the verdict asserts the CALIBRATED operating
    point actually delivers the target (floor == target, exact because
    calibration and verdict share the query set)."""
    from scalablevectorsearch_spark.operators.calibrate import calibrate_probe_budget
    from scalablevectorsearch_spark.operators.router import build_centroid_router

    base = _base(spark, sf_dir).select("id", "vector")
    q = _queries_df(spark, sf_dir)
    gt = flat_knn(base, q, k=K, distance="l2", round_to=4)
    index = vamana_build(base, VAMANA_PARAMS, n_shards=4, shard_by="kmeans")
    router = build_centroid_router(index.shard_model, distance="l2")
    cal = calibrate_probe_budget(
        lambda b: vamana_search(
            index, q, k=K, search_window_size=VAMANA_SWS, router=router,
            probe_budget=b, round_to=4,
        ),
        gt, k=K, target_recall=CALIBRATED_RECALL_FLOOR_E4 / 10000.0,
        max_budget=float(index.n_shards),
    )
    res = vamana_search(
        index, q, k=K, search_window_size=VAMANA_SWS, router=router,
        probe_budget=cal.probe_budget, round_to=4,
    ).select("qid", "neighbor_id")
    matched = res.join(
        gt.select("qid", "neighbor_id"), ["qid", "neighbor_id"], "left_semi"
    ).agg(F.count("*").alias("matched"))
    nq = res.agg(F.countDistinct("qid").alias("n_queries"))
    return _recall_verdict(matched.crossJoin(nq), CALIBRATED_RECALL_FLOOR_E4)


def _vamana_target_recall_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r7: vamana_search(target_recall=...) — the one-argument form of
    the routed calibration (same machinery as routed_calibrated_recall,
    but fitted INTERNALLY like ivf_search's target_recall; calibration
    covers the gate's whole query set so the floor equals the target)."""
    base = _base(spark, sf_dir).select("id", "vector")
    q = _queries_df(spark, sf_dir)
    gt = flat_knn(base, q, k=K, distance="l2", round_to=4).select("qid", "neighbor_id")
    index = vamana_build(base, VAMANA_PARAMS, n_shards=4, shard_by="kmeans")
    res = vamana_search(
        index, q, k=K, search_window_size=VAMANA_SWS,
        target_recall=CALIBRATED_RECALL_FLOOR_E4 / 10000.0,
        calibration_queries=N_QUERIES,
    ).select("qid", "neighbor_id")
    matched = res.join(gt, ["qid", "neighbor_id"], "left_semi").agg(
        F.count("*").alias("matched")
    )
    nq = res.agg(F.countDistinct("qid").alias("n_queries"))
    return _recall_verdict(matched.crossJoin(nq), CALIBRATED_RECALL_FLOOR_E4)


def _ivf_target_recall_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r7: ivf_search(target_recall=...) — the probe budget is fitted
    INTERNALLY (calibrate_probe_budget against an exact flat-scan
    groundtruth on a deterministic qid sample; here the sample covers
    the gate's whole query set so the floor equals the target exactly).
    The user asks for recall, not probes — fixed n_probes=8 is
    reference parity (common.h:151-166) but its realized recall
    silently tracks the data distribution."""
    base = _base(spark, sf_dir).select("id", "vector")
    q = _queries_df(spark, sf_dir)
    gt = flat_knn(base, q, k=K, distance="l2", round_to=4).select("qid", "neighbor_id")
    index = ivf_build(base, n_clusters=8, n_iters=2)
    res = ivf_search(
        index, q, k=K,
        target_recall=CALIBRATED_RECALL_FLOOR_E4 / 10000.0,
        calibration_queries=N_QUERIES,
    ).select("qid", "neighbor_id")
    matched = res.join(gt, ["qid", "neighbor_id"], "left_semi").agg(
        F.count("*").alias("matched")
    )
    nq = res.agg(F.countDistinct("qid").alias("n_queries"))
    return _recall_verdict(matched.crossJoin(nq), CALIBRATED_RECALL_FLOOR_E4)


def _vamana_auto_fallback_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r10: the AUTO exact-fallback default for filtered graph search
    (vamana_search fallback_below="auto", AUTO_FALLBACK_SELECTIVITY).
    The predicate keeps 1% of rows — below the 2% selectivity
    threshold — so the default serves the EXACT filtered flat k-NN over
    the pool instead of traversing the graph (measured 245x faster AND
    exact at 10M/1%, tools/stress_filtered.py). The deliberately tiny
    exploration window makes the gate sharp: the graph path at window 8
    under a 1% filter would miss neighbors and hash-mismatch, so only
    the engaged fallback reproduces the exact oracle."""
    base = _base(spark, sf_dir)
    index = vamana_build(
        base, VAMANA_PARAMS, n_shards=VAMANA_SHARDS
    )
    res = vamana_search(
        index, _queries_df(spark, sf_dir), k=K, search_window_size=8,
        where="id % 100 = 0",
    )
    return res.select(
        "qid", "rank", "neighbor_id", E4("distance").alias("distance_e4")
    )


def _ivf_validated_recall_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r10: held-out calibration validation + the CI-margin default.
    ivf_search(target_recall=...) fits the probe budget on the 16
    smallest qids at the (default) CI-margined target, then grades it
    on the NEXT 8 disjoint qids (calibrate.validate_budget), widening
    until the held-out recall clears the target. The verdict asserts
    (a) the full-query-set recall clears the floor, and (b) the
    calibration actually split/validated: n_fit/n_val as requested,
    the default margin widened the fit target above the user target,
    and validation never narrowed the budget."""
    base = _base(spark, sf_dir).select("id", "vector")
    q = _queries_df(spark, sf_dir)
    gt = flat_knn(base, q, k=K, distance="l2", round_to=4).select("qid", "neighbor_id")
    index = ivf_build(base, n_clusters=8, n_iters=2)
    target = CALIBRATED_RECALL_FLOOR_E4 / 10000.0
    stats: dict = {}
    res = ivf_search(
        index, q, k=K, target_recall=target,
        calibration_queries=16, calibration_validation_queries=8,
        calibration_stats=stats,
    ).select("qid", "neighbor_id")
    ok_cal = int(
        stats.get("n_fit_qids") == 16
        and stats.get("n_val_qids") == 8
        and stats.get("fit_target", 0.0) > target
        and stats.get("validated_budget", 0.0) >= stats.get("fitted_budget", 1e18)
        and len(stats.get("validation", [])) >= 1
        # r11 (ADVICE): the validation must have actually PASSED — a
        # max_rounds/max_budget exhaustion returns a best-effort budget
        # with validated=False, which a delivered-recall gate must not
        # accept silently
        and stats.get("validated") is True
    )
    matched = res.join(gt, ["qid", "neighbor_id"], "left_semi").agg(
        F.count("*").alias("matched")
    )
    nq = res.agg(F.countDistinct("qid").alias("n_queries"))
    return _recall_verdict(matched.crossJoin(nq), CALIBRATED_RECALL_FLOOR_E4).select(
        "ok", F.lit(ok_cal).cast("long").alias("ok_validated"), "floor_e4", "n_queries"
    )


CALIBRATE_TARGET_E4 = 9000
CALIBRATE_MAX_WINDOW = 64


def _calibrate_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall-targeted calibration (§2.13), hash-gated as a verdict:
    the calibrated window must achieve the target recall within bounds,
    and the split-buffer optimization (calibrate.h:171) must return a
    configuration that still holds the target with capacity >=
    max(window, k)."""
    from scalablevectorsearch_spark.operators.calibrate import (
        calibrate_split_buffer,
        calibrate_window,
    )

    base = _base(spark, sf_dir).select("id", "vector")
    q = _queries_df(spark, sf_dir)
    index = vamana_build(base, VAMANA_PARAMS, n_shards=VAMANA_SHARDS)
    gt = flat_knn(base, q, k=K, distance="l2", round_to=4)
    res = calibrate_window(
        lambda w: vamana_search(index, q, k=K, search_window_size=w),
        gt, k=K, target_recall=CALIBRATE_TARGET_E4 / 10000, max_window=CALIBRATE_MAX_WINDOW,
    )
    split = calibrate_split_buffer(
        lambda w, cap: vamana_search(
            index, q, k=K, search_window_size=w, buffer_capacity=cap
        ),
        gt, k=K, target_recall=CALIBRATE_TARGET_E4 / 10000,
        window=res.search_window_size, capacity_upper=CALIBRATE_MAX_WINDOW,
        cost_fn=lambda w, cap: 10.0 * w + cap,  # deterministic cost model
    )
    import math

    ok_recall = int(math.floor(res.recall * 10000 + 0.5) >= CALIBRATE_TARGET_E4)
    ok_window = int(1 <= res.search_window_size <= CALIBRATE_MAX_WINDOW)
    ok_split = int(
        math.floor(split.recall * 10000 + 0.5) >= CALIBRATE_TARGET_E4
        and split.buffer_capacity >= max(split.search_window_size, K)
        and split.search_window_size <= res.search_window_size
    )
    return spark.createDataFrame(
        [(ok_recall, ok_window, ok_split, CALIBRATE_TARGET_E4, CALIBRATE_MAX_WINDOW)],
        "ok_recall long, ok_window long, ok_split long, target_e4 long, max_window long",
    )


def _graph_degree_stats_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree-stat verdicts over the deterministic Vamana graph,
    hash-gated against real data: n_nodes must equal count(*) of the
    base table (the graph covers every row — the oracle computes the
    count from the embeddings table itself), max degree must respect
    the build bound, min degree >= 1 (no isolated nodes)."""
    from scalablevectorsearch_spark.operators.vamana import graph_degree_stats

    base = _base(spark, sf_dir).select("id", "vector")
    index = vamana_build(base, VAMANA_PARAMS, n_shards=VAMANA_SHARDS)
    stats = graph_degree_stats(index.graph)
    return stats.agg(
        F.sum("n_nodes").cast("long").alias("n_nodes"),
        (F.max("degree") <= VAMANA_PARAMS.graph_max_degree)
        .cast("long")
        .alias("ok_max_degree"),
        (F.min("degree") >= 1).cast("long").alias("ok_min_degree"),
    )


def _dynamic_flat_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = _base(spark, sf_dir).select("id", "vector")
    added = base.filter(F.col("id") < DYN_ADDED).select(
        (F.col("id") + DYN_OFFSET).alias("id"), "vector"
    )
    deleted = base.filter(
        (F.col("id") >= DYN_DEL_LO) & (F.col("id") < DYN_DEL_HI)
    ).select("id")
    res = dynamic_flat_knn(
        base, _queries_df(spark, sf_dir), k=K, added=added, deleted_ids=deleted,
        distance="l2", round_to=4,
    )
    return res.select("qid", "rank", "neighbor_id", E4("distance").alias("distance_e4"))


def _dynamic_ivf_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic IVF cycle gate (dynamic_ivf.h parity): append rows
    (nearest-existing-cluster stamp) -> tombstone a range -> RECLUSTER
    (full deterministic retrain over the live rows) -> search. Post
    recluster the index equals a fresh build over the mutated base, so
    the DuckDB oracle is the unrolled-Lloyd IVF search with the base
    CTE swapped for (base - deletes + shifted adds)."""
    from scalablevectorsearch_spark.operators.dynamic import (
        dynamic_ivf,
        ivf_add_points,
        ivf_delete_entries,
        ivf_dynamic_search,
        ivf_recluster,
    )

    base = _base(spark, sf_dir).select("id", "vector")
    d = dynamic_ivf(ivf_build(base, N_CLUSTERS, KM_ITERS))
    added = base.filter(F.col("id") < DYN_ADDED).select(
        (F.col("id") + DYN_OFFSET).alias("id"), "vector"
    )
    d = ivf_add_points(d, added)
    deleted = base.filter(
        (F.col("id") >= DYN_DEL_LO) & (F.col("id") < DYN_DEL_HI)
    ).select("id")
    d = ivf_delete_entries(d, deleted)
    d = ivf_recluster(d, n_iters=KM_ITERS)
    res = ivf_dynamic_search(
        d, _queries_df(spark, sf_dir), k=K, n_probes=N_PROBES,
        distance="l2", round_to=4,
    )
    return res.select("qid", "rank", "neighbor_id", E4("distance").alias("distance_e4"))


def _dynamic_vamana_exhaustive_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metamorphic hash gate for the DYNAMIC Vamana path: after a full
    add -> delete -> consolidate cycle, an exhaustive-window search must
    equal exact flat k-NN over the mutated base — the dynamic-flat SQL
    oracle. Gates the incremental shard rebuilds, tombstone physical
    removal, and layout merge by value hash."""
    from scalablevectorsearch_spark.operators.dynamic import (
        add_points,
        consolidate,
        delete_entries,
        dynamic_search,
        dynamic_vamana,
    )

    base = _base(spark, sf_dir).select("id", "vector")
    added = base.filter(F.col("id") < DYN_ADDED).select(
        (F.col("id") + DYN_OFFSET).alias("id"), "vector"
    )
    deleted = base.filter(
        (F.col("id") >= DYN_DEL_LO) & (F.col("id") < DYN_DEL_HI)
    ).select("id")
    dyn = dynamic_vamana(vamana_build(base, VAMANA_PARAMS, n_shards=VAMANA_SHARDS))
    dyn = add_points(dyn, added)
    dyn = delete_entries(dyn, deleted)
    dyn = consolidate(dyn)
    res = dynamic_search(dyn, _queries_df(spark, sf_dir), k=K, search_window_size=4096)
    return res.select("qid", "rank", "neighbor_id", E4("distance").alias("distance_e4"))


DYN_ROUTED_SHARDS = 4
DYN_ROUTED_CLOSURE_BP = 2000


def _dynamic_routed_vamana_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r11 (VERDICT r10 task 4): the SAME add -> delete -> consolidate
    cycle as dynamic_vamana_exhaustive_knn, on a KMEANS-ROUTED index
    with closure replication — inserts stamp to their nearest cell
    (plus closure replicas) through the build's own _sharded
    assignment, consolidate repairs every replica shard the layout
    names, and the exhaustive full-fan-out search over the mutated base
    must hash-equal the dynamic-flat SQL oracle. Composes the
    reference's dynamic insert path (dynamic_index.h:631-700) with the
    SPANN routed layout — the 100 TB maintenance shape."""
    from scalablevectorsearch_spark.operators.dynamic import (
        add_points,
        consolidate,
        delete_entries,
        dynamic_search,
        dynamic_vamana,
    )

    base = _base(spark, sf_dir).select("id", "vector")
    added = base.filter(F.col("id") < DYN_ADDED).select(
        (F.col("id") + DYN_OFFSET).alias("id"), "vector"
    )
    deleted = base.filter(
        (F.col("id") >= DYN_DEL_LO) & (F.col("id") < DYN_DEL_HI)
    ).select("id")
    dyn = dynamic_vamana(
        vamana_build(
            base, VAMANA_PARAMS, n_shards=DYN_ROUTED_SHARDS,
            shard_by="kmeans", closure_bp=DYN_ROUTED_CLOSURE_BP,
        )
    )
    dyn = add_points(dyn, added)
    dyn = delete_entries(dyn, deleted)
    dyn = consolidate(dyn)
    res = dynamic_search(
        dyn, _queries_df(spark, sf_dir), k=K, search_window_size=4096,
        n_probes=DYN_ROUTED_SHARDS,
    )
    return res.select("qid", "rank", "neighbor_id", E4("distance").alias("distance_e4"))


MV_LABEL_OFFSET = 100
MV_DEL_LABELS = (8, 9)


def _dynamic_multivector_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic multi-vector gate (MultiMutableVamanaIndex,
    multi.h:155): add vectors under NEW labels through the incremental
    link, delete two labels WHOLESALE (every vector they carry — the
    label -> external-id translation), then an exhaustive-window
    label-deduped search must hash-equal the flat multivector SQL over
    the mutated table."""
    from scalablevectorsearch_spark.operators.multivector import (
        multi_add_points,
        multi_delete_labels,
        multi_dynamic_search,
        multi_dynamic_vamana,
    )

    base = _base(spark, sf_dir)
    idx = vamana_build(
        base.select("id", "vector"), VAMANA_PARAMS, n_shards=VAMANA_SHARDS
    )
    m = multi_dynamic_vamana(idx, base.select("id", "label"))
    added = base.filter(F.col("id") < DYN_ADDED).select(
        (F.col("id") + DYN_OFFSET).alias("id"),
        "vector",
        (F.col("label") + MV_LABEL_OFFSET).alias("label"),
    )
    m = multi_add_points(m, added)
    m = multi_delete_labels(m, MV_DEL_LABELS)
    res = multi_dynamic_search(
        m, _queries_df(spark, sf_dir), k=5, k_inner=40, search_window_size=4096
    )
    return res.select(
        "qid", "rank", F.col("label").cast("int").alias("label"), "neighbor_id",
        E4("distance").alias("distance_e4"),
    )


def _dynamic_vamana_recall_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B6 cycle: build -> add 1% -> delete 1% -> consolidate -> search;
    recall vs exact flat over the mutated base, emitted as a hash-gated
    floor verdict."""
    base = _base(spark, sf_dir).select("id", "vector")
    q = _queries_df(spark, sf_dir)
    n = base.count()
    n_mod = max(1, n // 100)
    added = base.filter(F.col("id") < n_mod).select(
        (F.col("id") + DYN_OFFSET).alias("id"), "vector"
    )
    deleted = base.filter(
        (F.col("id") >= DYN_DEL_LO) & (F.col("id") < DYN_DEL_LO + n_mod)
    ).select("id")

    dyn = dynamic_vamana(vamana_build(base, VAMANA_PARAMS, n_shards=VAMANA_SHARDS))
    dyn = add_points(dyn, added)
    dyn = delete_entries(dyn, deleted)
    dyn = consolidate(dyn)
    res = dynamic_search(dyn, q, k=K, search_window_size=VAMANA_SWS).select(
        "qid", "neighbor_id"
    )
    gt = dynamic_flat_knn(
        base, q, k=K, added=added, deleted_ids=deleted, distance="l2", round_to=4
    ).select("qid", "neighbor_id")
    matched = res.join(gt, ["qid", "neighbor_id"], "left_semi").agg(
        F.count("*").alias("matched")
    )
    nq = res.agg(F.countDistinct("qid").alias("n_queries"))
    return _recall_verdict(matched.crossJoin(nq), DYNAMIC_RECALL_FLOOR_E4)


def _compact_remap_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compact gate (dynamic_index.h:791-810 + core/compact.h): delete a
    range -> consolidate (physical removal) -> compact_index (dense id
    remap of base + graph + persisted layout, all via the DISTRIBUTED
    dense rank — no single-partition window) -> exhaustive-window search
    over the COMPACTED index. Every returned neighbor id must be exactly
    the dense rank of the surviving old id, and the search must still be
    exact — one hash gates the remap arithmetic, the graph/layout remap
    joins, and post-compact searchability."""
    from scalablevectorsearch_spark.operators.dynamic import compact_index

    base = _base(spark, sf_dir).select("id", "vector")
    deleted = base.filter(
        (F.col("id") >= DYN_DEL_LO) & (F.col("id") < DYN_DEL_HI)
    ).select("id")
    dyn = dynamic_vamana(vamana_build(base, VAMANA_PARAMS, n_shards=VAMANA_SHARDS))
    dyn = delete_entries(dyn, deleted)
    dyn = consolidate(dyn)
    cidx, _mapping = compact_index(dyn.index)
    res = vamana_search(cidx, _queries_df(spark, sf_dir), k=K, search_window_size=4096)
    return res.select("qid", "rank", "neighbor_id", E4("distance").alias("distance_e4"))


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _text_stats_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = text_stats(_docs(spark, sf_dir))
    return s.select(
        "doc_id", "n_chars", "n_tokens", "n_uniq_tokens", "n_punct", "n_bpe_tokens",
        E4("stopword_ratio").alias("stopword_ratio_e4"),
        E4("avg_token_len").alias("avg_token_len_e4"),
        E4("quality_score").alias("quality_score_e4"),
    )


def _lang_id_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return lang_id(_docs(spark, sf_dir))


def _doc_fingerprints_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return doc_fingerprints(_docs(spark, sf_dir), k=16, w=8)


def _dedup_exact_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    dups = docs.filter(F.col("doc_id") < 10).select(
        (F.col("doc_id") + 10000).alias("doc_id"), "text"
    )
    return dedup_exact(docs.unionByName(dups))


def _dedup_minhash_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    res = dedup_minhash(_docs(spark, sf_dir), n_shingle=3, n_perm=16, n_bands=4, threshold=0.5)
    return res.select("doc_a", "doc_b", E4("jaccard").alias("jaccard_e4"))


DECON_MOD = 7
DECON_OFFSET = 500000
SH_COPIES = 20
SH_OFFSET = 600000


def _token_vocabulary_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-training vocabulary gate: top-200 token counts with a
    deterministic (count desc, token asc) cut, hash-equal to SQL."""
    from scalablevectorsearch_spark.pipeline.text import token_vocabulary

    res = token_vocabulary(_docs(spark, sf_dir), top_n=200)
    return res.select(
        "token",
        F.col("n_occurrences").cast("long").alias("n_occurrences"),
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("rank").cast("int").alias("rank"),
    )


def _pack_sequences_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget sharding gate: the distributed-prefix-sum packing
    must hash-equal the single-window SQL cumsum."""
    from scalablevectorsearch_spark.pipeline.pack import pack_sequences

    return pack_sequences(_docs(spark, sf_dir), token_budget=500)


SPLIT_NAMES = ["train", "val", "test"]
SPLIT_WEIGHTS = [0.9, 0.05, 0.05]


def _repetition_stats_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-repetition gate: the scan-only sorted-array run-length
    fold must hash-equal the SQL unnest/groupBy replica, short docs
    kept at zero."""
    from scalablevectorsearch_spark.pipeline.curate import repetition_stats

    s = repetition_stats(_docs(spark, sf_dir), n=2)
    return s.select(
        "doc_id",
        "n_ngrams",
        E4("top_ngram_frac").alias("top_ngram_frac_e4"),
        E4("dup_ngram_frac").alias("dup_ngram_frac_e4"),
    )


def _dataset_split_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic-split gate: per-doc md5 assignment must hash-equal
    the SQL replica (identical boundary literals both sides)."""
    from scalablevectorsearch_spark.pipeline.curate import dataset_split

    return dataset_split(_docs(spark, sf_dir), SPLIT_NAMES, SPLIT_WEIGHTS).select(
        "doc_id", "split"
    )


def _pii_redact_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII-scrub gate: the corpus is clean word-salad, so synthetic PII
    is injected deterministically (same expression in the oracle SQL);
    per-kind counts and the scrubbed text must match byte-exactly."""
    from scalablevectorsearch_spark.pipeline.curate import pii_redact

    d = F.col("doc_id")
    injected = _docs(spark, sf_dir).select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                d % 2 == 0,
                F.concat(F.lit(" mail bob"), (d % 100).cast("string"), F.lit("@mail.com")),
            ).otherwise(F.lit("")),
            F.when(
                d % 3 == 0,
                F.concat(F.lit(" from 10.0."), (d % 256).cast("string"), F.lit(".7")),
            ).otherwise(F.lit("")),
            F.when(d % 5 == 0, F.lit(" ssn 123-45-6789")).otherwise(F.lit("")),
            F.when(
                d % 7 == 0,
                F.concat(
                    F.lit(" call 555-"),
                    F.lpad((d % 1000).cast("string"), 3, "0"),
                    F.lit("-0199"),
                ),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    return pii_redact(injected)


#: Domain-mixing weights for the stratified_sample gate: exercises the
#: keep-all / drop-all / interior-boundary / default-fallback branches.
#: Shared verbatim with the oracle SQL builder.
SAMPLE_FRACTIONS = {
    "src0": 1.0,
    "src1": 0.75,
    "src2": 0.5,
    "src3": 0.25,
    "src4": 0.1,
    "src5": 0.0,
}
SAMPLE_DEFAULT = 0.3


def _stratified_sample_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixing gate: the per-stratum md5 keep decision must
    hash-equal the SQL replica (identical hex boundary literals,
    sorted-key CASE order on both sides)."""
    from scalablevectorsearch_spark.pipeline.curate import stratified_sample

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source"
    )
    out = stratified_sample(
        docs, SAMPLE_FRACTIONS, default_fraction=SAMPLE_DEFAULT
    )
    return out.select("doc_id", "source", F.col("kept").cast("long").alias("kept"))


def _ngram_jaccard_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard dedup gate: winnowing-fingerprint blocking
    + exact verify must hash-equal the SQL replica's pair set."""
    from scalablevectorsearch_spark.pipeline.dedup import ngram_jaccard_neardup

    res = ngram_jaccard_neardup(
        _docs(spark, sf_dir), n_shingle=3, threshold=0.5
    )
    return res.select("doc_a", "doc_b", E4("jaccard").alias("jaccard_e4"))


def _duplicate_spans_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-dedup gate: maximal duplicated-gram spans must
    hash-equal the SQL window/cumsum replica."""
    from scalablevectorsearch_spark.pipeline.dedup import duplicate_spans

    res = duplicate_spans(_docs(spark, sf_dir), span_len=40, stride=1, min_count=2)
    return res.select(
        "doc_id",
        F.col("span_start").cast("long").alias("span_start"),
        F.col("span_end").cast("long").alias("span_end"),
        F.col("n_dup_grams").cast("long").alias("n_dup_grams"),
    )


def _spans_removal_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-dedup application gate: keep-first duplicate_spans
    composed with remove_spans over planted boilerplate — the cleaned
    TEXT itself must hash-equal the SQL replica."""
    from scalablevectorsearch_spark.pipeline.dedup import (
        duplicate_spans,
        remove_spans,
    )

    docs = _docs(spark, sf_dir).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(F.col("text"), F.lit(" " + oracles.SPAN_BOILER)),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    spans = duplicate_spans(
        docs, span_len=40, stride=1, min_count=2, keep_first=True
    )
    res = remove_spans(docs, spans)
    return res.select("doc_id", "text", F.col("n_removed_chars").cast("long").alias("n_removed_chars"))


def _decontaminate_exact_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 13-word-gram decontamination gate: planted probe copies
    must flag their source docs with exact distinct-gram counts."""
    from scalablevectorsearch_spark.pipeline.dedup import decontaminate_exact

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    probes = docs.filter(F.col("doc_id") % 20 == 0).select(
        (F.col("doc_id") + 50000).alias("doc_id"), "text"
    )
    res = decontaminate_exact(docs, probes, n=13, min_hits=1)
    return res.select(
        "probe_id", "doc_id", F.col("n_shared_grams").cast("long").alias("n_shared_grams")
    )


def _dedup_lines_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 line-dedup gate: re-lined docs + planted whole-doc copies;
    the rebuilt text and removal counts must hash-equal the replica."""
    from scalablevectorsearch_spark.pipeline.dedup import dedup_lines

    chunk = 60
    base = _docs(spark, sf_dir).select("doc_id", "text")
    dups = base.filter(F.col("doc_id") < 15).select(
        (F.col("doc_id") + 10000).alias("doc_id"), "text"
    )
    relined = base.unionByName(dups).select(
        "doc_id",
        F.expr(
            f"array_join(transform("
            f"sequence(1, greatest(cast(ceil(length(text) / {chunk}.0) as bigint), 1)),"
            f" i -> substring(text, {chunk} * (i - 1) + 1, {chunk})), chr(10))"
        ).alias("text"),
    )
    res = dedup_lines(relined, min_len=1)
    return res.select(
        "doc_id",
        "text",
        F.col("n_lines").cast("long").alias("n_lines"),
        F.col("n_removed").cast("long").alias("n_removed"),
    )


def _quality_filter_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/C4 filter gate: the three-way metadata join + first-fail
    rule chain must hash-equal the nested-CTE SQL replica (thresholds
    compared at e4 fixed point on both sides)."""
    from scalablevectorsearch_spark.pipeline.curate import (
        quality_filter,
        repetition_stats,
    )

    docs = _docs(spark, sf_dir)
    out = quality_filter(
        text_stats(docs), repetition_stats(docs, n=2), lang_id(docs)
    )
    return out.select(
        "doc_id", "reason", F.col("keep").cast("long").alias("keep")
    )


def _simhash_neardup_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded SimHash near-dup join gate: plant near-copies (one token
    appended) of doc_id < SH_COPIES; every (original, copy) pair within
    the hamming budget must hash-equal the SQL replica's pair set."""
    from scalablevectorsearch_spark.pipeline.dedup import simhash_neardup

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    copies = docs.filter(F.col("doc_id") < SH_COPIES).select(
        (F.col("doc_id") + SH_OFFSET).alias("doc_id"),
        F.concat(F.trim(F.col("text")), F.lit(" zzz")).alias("text"),
    )
    both = docs.select("doc_id", F.trim("text").alias("text")).unionByName(copies)
    return simhash_neardup(both, n_bits=32, n_bands=4, max_hamming=3)


def _decontaminate_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-corpus decontamination gate: probes = shifted copies of
    every doc with doc_id % DECON_MOD = 0 (planted contamination), the
    banded cross-MinHash join must surface each probe's source doc (and
    any near-dups) — hash-equal to the two-table SQL replica."""
    from scalablevectorsearch_spark.pipeline.dedup import decontaminate

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    probes = docs.filter(F.col("doc_id") % DECON_MOD == 0).select(
        (F.col("doc_id") + DECON_OFFSET).alias("doc_id"), "text"
    )
    res = decontaminate(
        docs, probes, n_shingle=3, n_perm=16, n_bands=4, threshold=0.5
    )
    return res.select("probe_id", "doc_id", E4("jaccard").alias("jaccard_e4"))


def _dedup_components_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from scalablevectorsearch_spark.pipeline.dedup import dedup_components

    pairs = dedup_minhash(
        _docs(spark, sf_dir), n_shingle=3, n_perm=16, n_bands=4, threshold=0.5
    )
    return dedup_components(pairs)


def _normalize_text_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from scalablevectorsearch_spark.pipeline.text import normalize_text

    clean = normalize_text(_docs(spark, sf_dir))
    return clean.select(
        "doc_id",
        F.length("clean_text").alias("clean_n_chars"),
        F.conv(F.substring(F.md5("clean_text"), 1, 15), 16, 10)
        .cast("long")
        .alias("clean_hash"),
    )


def _simhash_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return simhash(_docs(spark, sf_dir), n_bits=32)


ND_COPIES = 10
ND_OFFSET = 10000
ND_THRESHOLD = 0.9


def _neardup_base(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    base = emb.selectExpr(
        "vec_id as id", "transform(embedding, x -> cast(x as double)) as vector"
    )
    copies = emb.filter(F.col("vec_id") < ND_COPIES).selectExpr(
        f"vec_id + {ND_OFFSET} as id",
        "concat(array(cast(embedding[0] as double) + 0.05d), "
        "transform(slice(embedding, 2, size(embedding) - 1), x -> cast(x as double))) as vector",
    )
    return base.unionByName(copies)


def _neardup_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    res = embedding_neardup(_neardup_base(spark, sf_dir), threshold=ND_THRESHOLD)
    return res.select("id_a", "id_b", E4("cosine").alias("cosine_e4"))


def _neardup_clustered_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    res = embedding_neardup_clustered(
        _neardup_base(spark, sf_dir), threshold=ND_THRESHOLD,
        n_clusters=N_CLUSTERS, n_iters=KM_ITERS,
    )
    return res.select("id_a", "id_b", E4("cosine").alias("cosine_e4"))


def _media_stats_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return media_stats(media_from_documents(_docs(spark, sf_dir).select("doc_id", "text")))


def _media_features_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    # hash-gated: the mapInPandas feature kernel is byte arithmetic
    # (tile + mean), replicated exactly by oracles.media_features_sql
    media = media_from_documents(_docs(spark, sf_dir).select("doc_id", "text"))
    feats = extract_features(media, n_features=8)
    return feats.select(
        "media_id", "n_bytes", F.posexplode("features").alias("pos", "__x")
    ).select("media_id", "n_bytes", "pos", E4("__x").alias("feature_e4"))


VECS_RT_IDS = 100  # vectors round-tripped through fvecs + native V1
ITER_PAGES, ITER_PAGE_SIZE = 3, 4
RE_K = 30  # k_reorder candidate depth
STREAM_BATCHES = 3


def _vecs_roundtrip_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.1 io gate: embeddings -> fvecs AND native V1 file -> read
    back -> exploded components. Both formats store exact float32, so
    the round-trip must hash-equal the original table (identity
    oracle). Reference formats: vecs.h:103-137, native.h:310-344."""
    import os
    import shutil
    import tempfile

    import numpy as np

    from scalablevectorsearch_spark.sources.vecs import (
        read_binary_matrix,
        read_npy,
        read_svs,
        read_vecs,
        write_binary_matrix,
        write_svs,
        write_vecs,
    )

    src = (
        _emb(spark, sf_dir)
        .filter(F.col("vec_id") < VECS_RT_IDS)
        .select("vec_id", "embedding")
        .orderBy("vec_id")
        .collect()
    )
    ids = np.array([r["vec_id"] for r in src], dtype=np.int64)
    X = np.array([r["embedding"] for r in src], dtype=np.float32)
    root = tempfile.mkdtemp(prefix="svs_vecs_rt_")
    try:
        fpath = os.path.join(root, "rt.fvecs")
        write_vecs(fpath, X, "fvecs")
        Xf = read_vecs(fpath, "fvecs")
        spath = os.path.join(root, "rt.svs")
        write_svs(spath, X)
        Xs = read_svs(spath, np.float32)
        bpath = os.path.join(root, "rt.bin")
        write_binary_matrix(bpath, X)
        Xb = read_binary_matrix(bpath, np.float32)
        npath = os.path.join(root, "rt.npy")
        np.save(npath, X)
        Xn = read_npy(npath)
    finally:
        shutil.rmtree(root, ignore_errors=True)
    rows = []
    for fmt, M in (("fvecs", Xf), ("svs", Xs), ("binary", Xb), ("npy", Xn)):
        for i in range(len(ids)):
            for pos in range(M.shape[1]):
                v = float(M[i, pos])
                import math

                rows.append(
                    (fmt, int(ids[i]), pos, int(math.floor(v * 10000 + 0.5)))
                )
    return spark.createDataFrame(
        rows, "fmt string, id long, pos int, val_e4 long"
    )


def _batch_iterator_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.11 paging gate (iterator.h:77-134): three consecutive pages
    of size 4 concatenated must hash-equal the one-shot top-12 — pages
    are disjoint rank slices and their union is complete, or the hash
    breaks."""
    from scalablevectorsearch_spark.operators.iterator import (
        BatchIterator,
        DefaultSchedule,
    )

    base = _base(spark, sf_dir).select("id", "vector")
    q = _queries_df(spark, sf_dir)
    it = BatchIterator(
        search_fn=lambda kk, w: flat_knn(base, q, k=kk, distance="l2", round_to=4),
        schedule=DefaultSchedule(batch_size=ITER_PAGE_SIZE),
    )
    pages = [it.next_batch() for _ in range(ITER_PAGES)]
    out = pages[0]
    for pg in pages[1:]:
        out = out.unionByName(pg)
    return out.select(
        "qid", "rank", "neighbor_id", E4("distance").alias("distance_e4")
    )


def _batch_iterator_ivf_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-backed BatchIterator (ivf/iterator.h:53 + orchestrators/
    ivf_iterator.h): the generic paging machinery composed with
    ivf_search at fixed n_probes. Three pages of size 4 concatenated
    must hash-equal the one-shot top-12 IVF result — deterministic
    probe selection makes the re-searched pages disjoint and complete."""
    from scalablevectorsearch_spark.operators.iterator import (
        BatchIterator,
        DefaultSchedule,
    )

    base = _base(spark, sf_dir)
    q = _queries_df(spark, sf_dir)
    index = ivf_build(base, N_CLUSTERS, KM_ITERS)
    it = BatchIterator(
        search_fn=lambda kk, w: ivf_search(
            index, q, k=kk, n_probes=N_PROBES, distance="l2", round_to=4
        ),
        schedule=DefaultSchedule(batch_size=ITER_PAGE_SIZE),
    )
    pages = [it.next_batch() for _ in range(ITER_PAGES)]
    out = pages[0]
    for pg in pages[1:]:
        out = out.unionByName(pg)
    return out.select(
        "qid", "rank", "neighbor_id", E4("distance").alias("distance_e4")
    )


def _batch_iterator_linear_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LinearSchedule paging gate (iterator_schedule.h:123): page sizes
    grow 4, 8, 12 (slope 4); the three concatenated pages must
    hash-equal the one-shot top-24 — growing pages stay disjoint rank
    slices with a complete union, or the hash breaks."""
    from scalablevectorsearch_spark.operators.iterator import (
        BatchIterator,
        LinearSchedule,
    )

    base = _base(spark, sf_dir).select("id", "vector")
    q = _queries_df(spark, sf_dir)
    it = BatchIterator(
        search_fn=lambda kk, w: flat_knn(base, q, k=kk, distance="l2", round_to=4),
        schedule=LinearSchedule(batch_size=ITER_PAGE_SIZE, slope=ITER_PAGE_SIZE),
    )
    pages = [it.next_batch() for _ in range(ITER_PAGES)]
    out = pages[0]
    for pg in pages[1:]:
        out = out.unionByName(pg)
    return out.select(
        "qid", "rank", "neighbor_id", E4("distance").alias("distance_e4")
    )


def _ivf_reorder_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF + k_reorder gate (ivf/common.h:156): index storage is the SQ
    round-tripped (int8-domain) vectors — clustering, probing, and the
    k_reorder candidate stage all run on quantized values — then the
    top-30 candidates per query re-rank EXACTLY against full-precision
    base and queries. Emitted distances are from the exact stage."""
    base = _base(spark, sf_dir).select("id", "vector")
    p = sq_train(base)
    deq = sq_decompress(sq_compress(base, p, "vector", "qv"), p, "qv", "dv").select(
        "id", F.col("dv").alias("vector")
    )
    index = ivf_build(deq, N_CLUSTERS, KM_ITERS)
    orig_q = _queries_df(spark, sf_dir)
    deq_q = sq_decompress(
        sq_compress(orig_q, p, "vector", "qv"), p, "qv", "dv"
    ).select("qid", F.col("dv").alias("vector"))
    res = ivf_search(
        index, deq_q, k=K, n_probes=N_PROBES, distance="l2", round_to=4,
        k_reorder=RE_K, rerank_base=base, rerank_queries=orig_q,
    )
    return res.select(
        "qid", "rank", "neighbor_id", E4("distance").alias("distance_e4")
    )


def _streaming_knn_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming ≡ batch equivalence gate: the query table is drained
    through stream_knn (one flat_knn job per micro-batch, 3 file-source
    batches) and the appended results must hash-equal the one-shot
    batch flat k-NN — the streaming surface's correctness contract."""
    import shutil
    import tempfile

    from scalablevectorsearch_spark.streaming.search import stream_knn

    base = _base(spark, sf_dir).select("id", "vector")
    q = _queries_df(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="svs_stream_knn_")
    src, outd, ck = f"{root}/src", f"{root}/out", f"{root}/ck"
    step = (N_QUERIES + STREAM_BATCHES - 1) // STREAM_BATCHES
    for b in range(STREAM_BATCHES):
        (
            q.filter((F.col("qid") >= b * step) & (F.col("qid") < (b + 1) * step))
            .coalesce(1)
            .write.mode("append")
            .parquet(src)
        )
    stream = (
        spark.readStream.schema("qid long, vector array<float>")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    stream_knn(base, stream, outd, ck, k=K, distance="l2", round_to=4)
    res = spark.read.parquet(outd)
    rows = res.collect()
    out = spark.createDataFrame(rows, res.schema)
    shutil.rmtree(root, ignore_errors=True)
    return out.select(
        "qid", "rank", "neighbor_id", E4("distance").alias("distance_e4")
    )


def _streaming_dedup_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful streaming dedup gate (applyInPandasWithState): drain
    documents + 10 shifted duplicates through the keyed-state dedup in
    2 ordered micro-batches; the result must hash-equal the batch
    answer (canonical = min doc_id per content hash)."""
    import shutil
    import tempfile

    from scalablevectorsearch_spark.streaming.stateful import streaming_dedup

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    dups = docs.filter(F.col("doc_id") < 10).select(
        (F.col("doc_id") + 10000).alias("doc_id"), "text"
    )
    root = tempfile.mkdtemp(prefix="svs_stream_dedup_")
    src, outd, ck = f"{root}/src", f"{root}/out", f"{root}/ck"
    docs.coalesce(1).write.mode("append").parquet(src)
    dups.coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out_stream = streaming_dedup(stream)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("append").parquet(outd)

    (
        out_stream.writeStream.outputMode("append")
        .foreachBatch(write_batch)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    res = spark.read.parquet(outd)
    rows = res.collect()
    out = spark.createDataFrame(rows, res.schema)
    shutil.rmtree(root, ignore_errors=True)
    return out.select(
        "content_hash", "doc_id", "canonical_id", F.col("is_dup").cast("long").alias("is_dup")
    )


def _sq_knn_cosine_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CosineCompressed gate: k-NN over int8-quantized storage with the
    decompress-then-cosine semantics (distance.h CosineCompressed —
    datum decompressed, query full precision)."""
    base = _base(spark, sf_dir)
    p = sq_train(base)
    res = sq_knn(base, _queries_df(spark, sf_dir), p, k=K, distance="cosine", round_to=4)
    return res.select("qid", "rank", "neighbor_id", E4("distance").alias("distance_e4"))


def _cancel_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Search cancellation gate (§2.2, flat.h:344-346 cancel predicate):
    three verdicts — a generous deadline completes; an already-expired
    deadline raises TimeoutError from inside the scan kernel; the
    job-group wrapper cancels an over-budget action with
    SearchTimeout."""
    import time

    from scalablevectorsearch_spark.operators.cancel import (
        SearchTimeout,
        run_with_timeout,
    )

    base = _base(spark, sf_dir).select("id", "vector")
    q = _queries_df(spark, sf_dir).filter(F.col("qid") < 10)
    ok_completes = int(
        flat_knn(base, q, k=K, deadline=time.time() + 600).count() == 10 * K
    )
    try:
        flat_knn(base, q, k=K, deadline=time.time() - 1).count()
        ok_deadline = 0
    except Exception:  # noqa: BLE001 — TimeoutError surfaces via Py4J wrapping
        ok_deadline = 1
    try:
        run_with_timeout(
            spark,
            lambda: flat_knn(base, q, k=K).count() and time.sleep(30),
            timeout_s=0.05,
        )
        ok_group = 0
    except SearchTimeout:
        ok_group = 1
    return spark.createDataFrame(
        [(ok_completes, ok_deadline, ok_group)],
        "ok_completes long, ok_deadline_raises long, ok_group_cancels long",
    )


def _custom_distance_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.12 extension-surface gate: a runtime-registered Manhattan (L1)
    kernel runs through the SAME distributed flat scan as the built-ins
    (registered driver-side, shipped in the task closure), hash-matched
    against a plain SQL L1 oracle — proving the plug-in path is not a
    separate code path but the engine's own kernel slot."""
    import numpy as np

    from scalablevectorsearch_spark.functions.distances import (
        register_distance,
        unregister_distance,
    )

    def l1_kernel(Q, B, q_fixed=None):
        return np.abs(Q[:, None, :] - B[None, :, :]).sum(axis=2)

    register_distance("l1_gate", l1_kernel, maximize=False)
    try:
        res = flat_knn(
            _base(spark, sf_dir), _queries_df(spark, sf_dir), k=K,
            distance="l1_gate", round_to=4,
        )
        out = res.select(
            "qid", "rank", "neighbor_id", E4("distance").alias("distance_e4")
        )
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        unregister_distance("l1_gate")


UPS_IDS, UPS_UPD, UPS_DEL_LO, UPS_DEL_HI, UPS_SRC_OFF = 200, 20, 20, 30, 100


def _streaming_window_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time windowed streaming aggregation gate (ingest.py
    windowed_event_counts): the events table drained through the
    1-minute-window / 2-minute-watermark streaming aggregation must
    equal the batch GROUP BY (a full drain emits every window)."""
    import shutil
    import tempfile

    from scalablevectorsearch_spark.streaming.ingest import windowed_event_counts

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    root = tempfile.mkdtemp(prefix="svs_stream_win_")
    src, outd, ck = f"{root}/src", f"{root}/out", f"{root}/ck"
    events.coalesce(1).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    ).parquet(src)
    agg = windowed_event_counts(stream, "1 minute", "2 minutes")

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(outd)

    (
        agg.writeStream.outputMode("complete")
        .foreachBatch(write_batch)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    res = spark.read.parquet(outd)
    rows = res.collect()
    out = spark.createDataFrame(rows, res.schema)
    shutil.rmtree(root, ignore_errors=True)
    return out.select(
        F.col("window_start").cast("long").alias("window_epoch"),
        "event_type",
        F.col("n_events").cast("long").alias("n_events"),
        E4("sum_value").alias("sum_value_e4"),
    )


def _streaming_upsert_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upsert-log gate (ingest.py ingest_vectors + latest_view): stream
    originals (seq 0) then a wave of updates + tombstones (seq 1) in 2
    ordered micro-batches; the compacted newest-wins view must equal
    the mutated table (exploded identity oracle)."""
    import shutil
    import tempfile

    from scalablevectorsearch_spark.streaming.ingest import (
        ingest_vectors,
        latest_view,
        stream_vectors,
    )

    emb = _emb(spark, sf_dir)
    orig = emb.filter(F.col("vec_id") < UPS_IDS).select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vector"),
        F.lit(False).alias("is_delete"), F.lit(0).cast("long").alias("seq"),
    )
    upd_src = emb.filter(
        (F.col("vec_id") >= UPS_SRC_OFF) & (F.col("vec_id") < UPS_SRC_OFF + UPS_UPD)
    ).select(
        (F.col("vec_id") - UPS_SRC_OFF).alias("id"),
        F.col("embedding").alias("vector"),
        F.lit(False).alias("is_delete"), F.lit(1).cast("long").alias("seq"),
    )
    dels = emb.filter(
        (F.col("vec_id") >= UPS_DEL_LO) & (F.col("vec_id") < UPS_DEL_HI)
    ).select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vector"),
        F.lit(True).alias("is_delete"), F.lit(1).cast("long").alias("seq"),
    )
    root = tempfile.mkdtemp(prefix="svs_stream_ups_")
    src, outd, ck = f"{root}/src", f"{root}/out", f"{root}/ck"
    orig.coalesce(1).write.mode("append").parquet(src)
    upd_src.unionByName(dels).coalesce(1).write.mode("append").parquet(src)
    stream = stream_vectors(spark, src)
    ingest_vectors(stream, outd, ck)
    view = latest_view(spark, outd)
    res = view.select("id", F.posexplode("vector").alias("pos", "__x")).select(
        "id", "pos", E4("__x").alias("val_e4")
    )
    rows = res.collect()
    out = spark.createDataFrame(rows, res.schema)
    shutil.rmtree(root, ignore_errors=True)
    return out


def _schema_validation_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VectorDataLoader / check_dims gate (simple.h:44-51 — datasets
    carry a fixed dimensionality enforced at construction; core.cpp:
    48-88 — the loader validates dtype + dims at assemble time). The
    accepted table's dims and row count are data-derived values the
    oracle recomputes; each malformed variant (ragged, null vector,
    duplicate id, missing column, non-numeric elements) must raise
    SchemaError for its verdict to emit 1."""
    from scalablevectorsearch_spark.functions.schema import (
        SchemaError,
        validate_vector_table,
    )

    base = _base(spark, sf_dir).select("id", "vector")
    dims = validate_vector_table(base, check_ids_unique=True)
    n_rows = base.count()

    def rejects(df, **kw) -> int:
        try:
            validate_vector_table(df, **kw)
            return 0
        except SchemaError:
            return 1

    ragged = base.withColumn(
        "vector",
        F.when(F.col("id") == 3, F.slice("vector", 1, dims - 1)).otherwise(
            F.col("vector")
        ),
    )
    nulled = base.withColumn(
        "vector", F.when(F.col("id") == 3, F.lit(None)).otherwise(F.col("vector"))
    )
    dup = base.unionAll(base.filter(F.col("id") == 3))
    missing = base.select("id")
    bad_dtype = base.withColumn("vector", F.col("vector").cast("array<string>"))
    row = [
        (
            dims,
            n_rows,
            rejects(ragged),
            rejects(nulled),
            rejects(dup, check_ids_unique=True),
            rejects(missing),
            rejects(bad_dtype),
        )
    ]
    return spark.createDataFrame(
        row,
        "dims long, n_rows long, ok_rejects_ragged long, ok_rejects_null long, "
        "ok_rejects_dup long, ok_rejects_missing long, ok_rejects_dtype long",
    )


GL_PARAMS = VamanaParams(alpha=1.2, graph_max_degree=12, window_size=40)
GL_SHARDS = 4


def _graph_loader_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GraphLoader gate (graph/simple.h save/load; vamana/index.h
    persists VamanaBuildParameters alongside the adjacency): build →
    save → load, then verify the loaded graph table structurally —
    node coverage (n_nodes ≡ count(*), data-derived), every adjacency
    edge inside the node set, max degree ≤ graph_max_degree, ≥1 entry
    point per shard, and the manifest round-trips params + distance +
    shard count unchanged."""
    import shutil
    import tempfile

    from scalablevectorsearch_spark.sources.index_store import (
        load_vamana,
        save_vamana,
    )

    base = _base(spark, sf_dir).select("id", "vector")
    idx = vamana_build(base, GL_PARAMS, n_shards=GL_SHARDS)
    path = tempfile.mkdtemp(prefix="svs_graph_loader_")
    try:
        save_vamana(idx, path)
        loaded = load_vamana(spark, path, validate=True)
        g = loaded.graph
        stats = (
            g.select(
                "shard_id",
                "src",
                F.size("neighbors").alias("deg"),
                F.col("is_entry").cast("int").alias("ent"),
                F.explode_outer("neighbors").alias("nbr"),
            )
            .join(
                base.select(F.col("id").alias("nbr")).withColumn(
                    "in_base", F.lit(1)
                ),
                "nbr",
                "left",
            )
            .agg(
                F.countDistinct("src").alias("n_nodes"),
                F.min(F.coalesce("in_base", F.lit(0))).alias("edges_ok"),
                F.max("deg").alias("max_deg"),
                F.countDistinct(
                    F.when(F.col("ent") == 1, F.col("shard_id"))
                ).alias("entry_shards"),
            )
            .collect()[0]
        )
        params_ok = int(
            loaded.params == idx.params
            and loaded.distance == idx.distance
            and loaded.n_shards == idx.n_shards
        )
    finally:
        shutil.rmtree(path, ignore_errors=True)
    row = [
        (
            stats["n_nodes"],
            int(stats["edges_ok"] == 1),
            int(stats["max_deg"] <= GL_PARAMS.graph_max_degree),
            int(stats["entry_shards"] == GL_SHARDS),
            params_ok,
        )
    ]
    return spark.createDataFrame(
        row,
        "n_nodes long, ok_edges_in_base long, ok_degree_bound long, "
        "ok_entry_per_shard long, ok_params_roundtrip long",
    )


def _query_norm_fix_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """maybe_fix_argument gate (concepts/distance.h fix_argument;
    cosine.h:102 caches the query norm so the kernel never recomputes
    it per data tile). The precomputed invariants themselves are the
    oracle-checked values — per-query squared norm (l2 fix) and norm
    (cosine fix), e4-scaled — and ok_fix_identical asserts the fixed
    and unfixed kernels return bit-identical distance matrices on a
    real data block."""
    import numpy as np

    from scalablevectorsearch_spark.functions.distances import (
        fix_queries,
        pairwise_distances,
    )

    qpd = (
        _queries_df(spark, sf_dir)
        .orderBy("qid")
        .toPandas()
    )
    Q = np.stack(qpd["vector"].to_numpy()).astype(np.float64)
    normsq = fix_queries(Q, "l2")
    norm = fix_queries(Q, "cosine")
    assert fix_queries(Q, "ip") is None  # ip needs no fix (distance.h)
    B = Q  # any block works; queries double as data
    identical = all(
        np.array_equal(
            pairwise_distances(Q, B, d, q_fixed=fix_queries(Q, d)),
            pairwise_distances(Q, B, d),
        )
        for d in ("l2", "cosine", "ip")
    )
    e4 = lambda x: int(np.floor(x * 10000 + 0.5))
    rows = [
        (int(q), e4(s), e4(n), int(identical))
        for q, s, n in zip(qpd["qid"], normsq, norm)
    ]
    return spark.createDataFrame(
        rows, "qid long, normsq_e4 long, norm_e4 long, ok_fix_identical long"
    )


AP_NODES, AP_POOL, AP_ALPHA, AP_DEG = 4, 120, 1.2, 16


def _alpha_prune_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """heuristic_prune_neighbors gate (prune.h:92-172). Runs the MRNG
    α-prune kernel on real candidate pools (the AP_POOL nearest rows to
    each of AP_NODES probe nodes) and verifies its defining invariants:
    result ⊆ pool, no self-edge, no duplicates, ≤ max_degree kept, the
    nearest candidate is always kept, every discarded candidate has a
    kept neighbor strictly closer to it than the probe node is (the
    relaxed-α state machine only prunes c when current_α·d(r,c) <
    d(node,c) with current_α ≥ 1) unless the result hit capacity, and
    two runs are identical."""
    import numpy as np

    from scalablevectorsearch_spark.operators.vamana_local import alpha_prune

    pdf = _base(spark, sf_dir).select("id", "vector").orderBy("id").toPandas()
    X = np.stack(pdf["vector"].to_numpy()).astype(np.float64)
    rows = []
    for node in range(AP_NODES):
        d = np.einsum("ij,ij->i", X - X[node], X - X[node])
        order = np.lexsort((np.arange(len(X)), d))
        pool = order[order != node][:AP_POOL].astype(np.int64)
        pool_d = d[pool]
        kept = alpha_prune(X, node, pool, pool_d, AP_ALPHA, AP_DEG)
        kept2 = alpha_prune(X, node, pool, pool_d, AP_ALPHA, AP_DEG)
        kept_set = set(kept.tolist())
        ok_subset = int(
            kept_set <= set(pool.tolist())
            and node not in kept_set
            and len(kept_set) == len(kept)
        )
        ok_degree = int(0 < len(kept) <= AP_DEG)
        ok_nearest = int(len(kept) > 0 and int(pool[0]) in kept_set)
        at_capacity = len(kept) == AP_DEG
        dominated = True
        if not at_capacity:
            for c in pool:
                if int(c) in kept_set:
                    continue
                d_node_c = d[c]
                if not any(
                    np.einsum("i,i->", X[r] - X[c], X[r] - X[c]) < d_node_c
                    for r in kept
                ):
                    dominated = False
                    break
        rows.append(
            (
                node,
                ok_subset,
                ok_degree,
                ok_nearest,
                int(dominated),
                int(np.array_equal(kept, kept2)),
                int(AP_ALPHA * 10000),
                AP_DEG,
            )
        )
    return spark.createDataFrame(
        rows,
        "node long, ok_subset long, ok_degree long, ok_keeps_nearest long, "
        "ok_dominated long, ok_deterministic long, alpha_e4 long, "
        "max_degree long",
    )


LVQ_RT_IDS = 50
LVQ_RE_K = 30


def _lvq_params(spark: SparkSession, sf_dir: str, pb: int, rb: int):
    from scalablevectorsearch_spark.operators.lvq import lvq_train

    return lvq_train(
        _base(spark, sf_dir).select("id", "vector"),
        primary_bits=pb, residual_bits=rb,
    )


def _lvq_roundtrip_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LVQ compress -> decompress gate (LVQ4x8: nibble-packed primary
    + byte residual, api_defs.h:98-109 storage kinds): both
    reconstruction levels exploded per component, hash-matched against
    the DuckDB replica of the published per-vector scheme
    (operators/lvq.py module docstring)."""
    from scalablevectorsearch_spark.operators.lvq import lvq_compress, lvq_decompress

    base = _base(spark, sf_dir).select("id", "vector")
    p = _lvq_params(spark, sf_dir, 4, 8)
    comp = lvq_compress(base.filter(F.col("id") < LVQ_RT_IDS), p)
    dec = lvq_decompress(comp, p, out_col="__r1", level=1)
    dec = lvq_decompress(dec, p, out_col="__r2", level=2)
    return dec.select(
        "id",
        F.posexplode(F.arrays_zip("__r1", "__r2")).alias("pos", "__z"),
    ).select(
        "id", "pos",
        E4("__z.__r1").alias("r1_e4"),
        E4("__z.__r2").alias("r2_e4"),
    )


def _lvq_knn_query(distance: str):
    """One-level LVQ8 flat k-NN (asymmetric: fp query vs primary
    reconstruction), full SQL oracle."""

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        from scalablevectorsearch_spark.operators.lvq import lvq_knn

        base = _base(spark, sf_dir).select("id", "vector")
        p = _lvq_params(spark, sf_dir, 8, 0)
        res = lvq_knn(base, _queries_df(spark, sf_dir), p, k=K, distance=distance, round_to=4)
        return res.select("qid", "rank", "neighbor_id", E4("distance").alias("distance_e4"))

    return run


def _lvq4x8_knn_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level LVQ4x8 k-NN with re-rank: candidates from the packed
    4-bit primary, refined on the +8-bit-residual reconstruction
    (the reference's LVQ rerank stage); the persisted storage table
    (ARRAY<TINYINT> nibble codes) feeds the scan directly."""
    from scalablevectorsearch_spark.operators.lvq import lvq_compress, lvq_knn

    base = _base(spark, sf_dir).select("id", "vector")
    p = _lvq_params(spark, sf_dir, 4, 8)
    storage = lvq_compress(base, p).select(
        "id", "lvq_codes", "lvq_lo", "lvq_step", "lvq_rcodes"
    )
    res = lvq_knn(
        storage, _queries_df(spark, sf_dir), p, k=K, distance="l2",
        round_to=4, k_reorder=LVQ_RE_K, base_compressed=True,
    )
    return res.select("qid", "rank", "neighbor_id", E4("distance").alias("distance_e4"))


def _lvq_vamana_knn_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metamorphic gate for LVQ inside Vamana (svs.Vamana.build over
    an LVQLoader, vamana_with_compression_lvq.py:80-87): graph build +
    exhaustive-window greedy search over the LVQ8 reconstruction must
    reproduce the flat LVQ scan — whose DuckDB oracle is exact."""
    from scalablevectorsearch_spark.operators.lvq import (
        lvq_vamana_build,
        lvq_vamana_search,
    )

    base = _base(spark, sf_dir).select("id", "vector")
    p = _lvq_params(spark, sf_dir, 8, 0)
    idx = lvq_vamana_build(base, p, VAMANA_PARAMS, n_shards=VAMANA_SHARDS)
    res = lvq_vamana_search(idx, _queries_df(spark, sf_dir), k=K, search_window_size=4096)
    return res.select("qid", "rank", "neighbor_id", E4("distance").alias("distance_e4"))


LV_TRUNC_M = 16
LV_TRUNC_RE_K = 30
LV_PCA_M = 32
LV_PCA_RE_K = 50
LEANVEC_RECALL_FLOOR_E4 = 8000


def _leanvec_knn_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LeanVec two-stage gate with the DETERMINISTIC truncation
    projection (the external-matrices path, training.h:28-71): primary
    candidates on the first m centered coordinates (exact under
    P = I[:, :m] — zero-product terms are float-exact), top k_reorder
    re-ranked full-dimension. Hash-gates projection apply, reduced-dim
    primary search, and the exact re-rank end to end."""
    from scalablevectorsearch_spark.operators.leanvec import (
        LeanVecModel,
        dataset_mean,
        leanvec_knn,
    )

    base = _base(spark, sf_dir).select("id", "vector")
    model = LeanVecModel.truncation(64, LV_TRUNC_M, mean=dataset_mean(base, "vector"))
    res = leanvec_knn(
        base, _queries_df(spark, sf_dir), model, k=K, k_reorder=LV_TRUNC_RE_K,
        distance="l2", round_to=4,
    )
    return res.select("qid", "rank", "neighbor_id", E4("distance").alias("distance_e4"))


def _leanvec_knn_cosine_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LeanVec cosine gate (truncation projection): primary = IP over
    the first m centered coordinates of the unit-normalized base (query
    uncentered — the ip convention), exact full-dim cosine re-rank.
    Exercises the normalize-then-IP reduction of the reference's
    generic distance dispatch (distance/cosine.h:102)."""
    from scalablevectorsearch_spark.operators.leanvec import (
        LeanVecModel,
        _normalized,
        dataset_mean,
        leanvec_knn,
    )

    base = _base(spark, sf_dir).select("id", "vector")
    model = LeanVecModel.truncation(
        64, LV_TRUNC_M, mean=dataset_mean(_normalized(base, "vector"), "vector")
    )
    res = leanvec_knn(
        base, _queries_df(spark, sf_dir), model, k=K, k_reorder=LV_TRUNC_RE_K,
        distance="cosine", round_to=4,
    )
    return res.select("qid", "rank", "neighbor_id", E4("distance").alias("distance_e4"))


def _leanvec_vamana_knn_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metamorphic gate for LeanVec inside Vamana: graph built in the
    projected space, exhaustive-window search + full-dim re-rank must
    equal the flat LeanVec pipeline — same SQL oracle."""
    from scalablevectorsearch_spark.operators.leanvec import (
        LeanVecModel,
        dataset_mean,
        leanvec_vamana_build,
        leanvec_vamana_search,
    )

    base = _base(spark, sf_dir).select("id", "vector")
    model = LeanVecModel.truncation(64, LV_TRUNC_M, mean=dataset_mean(base, "vector"))
    idx = leanvec_vamana_build(base, model, VAMANA_PARAMS, n_shards=VAMANA_SHARDS)
    res = leanvec_vamana_search(
        idx, _queries_df(spark, sf_dir), base, k=K, k_reorder=LV_TRUNC_RE_K,
        search_window_size=4096,
    )
    return res.select("qid", "rank", "neighbor_id", E4("distance").alias("distance_e4"))


def _leanvec_recall_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCA-trained LeanVec recall-floor verdict (the learned-matrices
    path). The synthetic embeddings are near-uniform — PCA's WORST
    case (isotropic spectrum, no low-dim structure to keep) — so the
    floor is 0.80 at m=32/k_reorder=50 where the observed recall is
    0.89; real embedding corpora with decaying spectra sit far
    higher."""
    from scalablevectorsearch_spark.operators.leanvec import leanvec_knn, leanvec_train

    base = _base(spark, sf_dir).select("id", "vector")
    q = _queries_df(spark, sf_dir)
    gt = flat_knn(base, q, k=K, distance="l2", round_to=4).select("qid", "neighbor_id")
    model = leanvec_train(base, LV_PCA_M)
    res = leanvec_knn(base, q, model, k=K, k_reorder=LV_PCA_RE_K).select(
        "qid", "neighbor_id"
    )
    matched = res.join(gt, ["qid", "neighbor_id"], "left_semi").agg(
        F.count("*").alias("matched")
    )
    nq = res.agg(F.countDistinct("qid").alias("n_queries"))
    return _recall_verdict(matched.crossJoin(nq), LEANVEC_RECALL_FLOOR_E4)


def _api_facade_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orchestrator-façade gate (api.py — the reference's svs.* user
    surface, orchestrators/exhaustive.h + manager.h py_search): a
    search routed through svs.Flat must hash-match the plain flat SQL
    oracle — proving the façade is a naming shim over the gated engine,
    not a second code path."""
    from scalablevectorsearch_spark import api as svs

    index = svs.Flat(_base(spark, sf_dir).select("id", "vector"),
                     distance=svs.DistanceType.L2)
    res = index.search(_queries_df(spark, sf_dir), k=K, round_to=4)
    return res.select(
        "qid", "rank", "neighbor_id", E4("distance").alias("distance_e4")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # Registry ORDER is part of the verification contract: the round
    # driver samples the FIRST ~50 entries for CORRECTNESS_r{N}.json.
    # Gates that have never had (or lost) a driver-green row lead;
    # long-green gates from earlier rounds trail. Rotate when adding.
    return {
        # --- r12 rotation (VERDICT r11 task 6): the 54 gates whose last
        # driver-green rows predate r11 (judge-verified on r11 code via
        # check_oracles, zero overlap with the r11 driver sample) lead
        # this round's window, headed by the brand-new r11 gate ---
        "dynamic_routed_vamana_knn": _dynamic_routed_vamana_query,
        "pack_sequences": _pack_sequences_query,
        "vamana_routed_default_recall": _vamana_routed_default_recall_query,
        "ivf_budget_recall": _ivf_budget_recall_query,
        "hierarchical_stamp_assign": _hier_stamp_assign_query,
        "vamana_hier_stamp_knn": _vamana_hier_stamp_knn_query,
        "ivf_target_recall": _ivf_target_recall_query,
        "vamana_target_recall": _vamana_target_recall_query,
        "vamana_auto_fallback_knn": _vamana_auto_fallback_query,
        "ivf_validated_recall": _ivf_validated_recall_query,
        "flat_knn_ip": _knn_query("ip"),
        "flat_knn_cosine": _knn_query("cosine"),
        "stratified_sample": _stratified_sample_query,
        "ngram_jaccard": _ngram_jaccard_query,
        "duplicate_spans": _duplicate_spans_query,
        "spans_removal": _spans_removal_query,
        "decontaminate_exact": _decontaminate_exact_query,
        "dedup_lines": _dedup_lines_query,
        "repetition_stats": _repetition_stats_query,
        "dataset_split": _dataset_split_query,
        "pii_redact": _pii_redact_query,
        "quality_filter": _quality_filter_query,
        "lvq_roundtrip": _lvq_roundtrip_query,
        "lvq_knn_l2": _lvq_knn_query("l2"),
        "lvq_knn_cosine": _lvq_knn_query("cosine"),
        "lvq4x8_knn": _lvq4x8_knn_query,
        "lvq_vamana_knn": _lvq_vamana_knn_query,
        "leanvec_knn": _leanvec_knn_query,
        "leanvec_vamana_knn": _leanvec_vamana_knn_query,
        "leanvec_recall": _leanvec_recall_query,
        "batch_iterator_pages": _batch_iterator_query,
        "batch_iterator_linear": _batch_iterator_linear_query,
        "ivf_knn_reordered": _ivf_reorder_query,
        "streaming_knn": _streaming_knn_query,
        "streaming_dedup": _streaming_dedup_query,
        "streaming_window_agg": _streaming_window_query,
        "streaming_upsert_log": _streaming_upsert_query,
        "sq_knn_cosine": _sq_knn_cosine_query,
        "mixed_precision_knn": _mixed_precision_query,
        "testdata_generator": _testdata_generator_query,
        "search_cancel": _cancel_query,
        "custom_distance_knn": _custom_distance_query,
        "schema_validation": _schema_validation_query,
        "graph_loader": _graph_loader_query,
        "query_norm_fix": _query_norm_fix_query,
        "alpha_prune_invariants": _alpha_prune_query,
        "api_facade_knn": _api_facade_query,
        "leanvec_knn_cosine": _leanvec_knn_cosine_query,
        "inverted_routed_knn": _inverted_routed_knn_query,
        "batch_iterator_ivf": _batch_iterator_ivf_query,
        "dynamic_multivector_knn": _dynamic_multivector_query,
        "decontaminate": _decontaminate_query,
        "simhash_neardup": _simhash_neardup_query,
        "token_vocabulary": _token_vocabulary_query,
        # --- driver-green in CORRECTNESS_r11 (trail this round) ---
        "vamana_knn_filtered": _vamana_knn_filtered_query,
        "flat_knn_l2": _knn_query("l2"),
        "flat_knn_filtered": _knn_query("l2", where="label = 3"),
        "multivector_knn": _multivector_query,
        "multivector_graph_knn": _multivector_graph_query,
        "knn_recall_ip_vs_l2": _recall_query,
        "recall_at_k": _recall_at_query,
        "medioid": _medioid_query,
        "reconstruct": _reconstruct_query,
        "kmeans_assign": _kmeans_assign_query,
        "hierarchical_kmeans_assign": _hier_kmeans_query,
        "ivf_knn": _ivf_knn_query,
        "ivf_knn_filtered": _ivf_knn_filtered_query,
        "ivf_recall": _ivf_recall_query,
        "inverted_knn": _inverted_knn_query,
        "sq_minmax": _sq_minmax_query,
        "sq_roundtrip": _sq_roundtrip_query,
        "sq_knn_l2": _sq_knn_query("l2"),
        "sq_knn_ip": _sq_knn_query("ip"),
        "sq_vamana_knn_l2": _sq_vamana_knn_query("l2"),
        "sq_vamana_knn_ip": _sq_vamana_knn_query("ip"),
        "sq_vamana_knn_cosine": _sq_vamana_knn_query("cosine"),
        "vamana_saveload_knn": _vamana_saveload_knn_query,
        "vamana_knn": _vamana_knn_query,
        "vamana_exhaustive_knn": _vamana_exhaustive_knn_query,
        "vamana_recall": _vamana_recall_query,
        "vamana_routed_recall": _vamana_routed_recall_query,
        "vamana_router_recall": _vamana_router_recall_query,
        "vamana_closure_recall": _vamana_closure_recall_query,
        "calibrate_window": _calibrate_query,
        "graph_degree_stats": _graph_degree_stats_query,
        "dynamic_flat_knn": _dynamic_flat_query,
        "dynamic_ivf_knn": _dynamic_ivf_query,
        "dynamic_vamana_exhaustive_knn": _dynamic_vamana_exhaustive_query,
        "dynamic_vamana_recall": _dynamic_vamana_recall_query,
        "compact_remap_knn": _compact_remap_query,
        "text_stats": _text_stats_query,
        "normalize_text": _normalize_text_query,
        "lang_id": _lang_id_query,
        "doc_fingerprints": _doc_fingerprints_query,
        "dedup_exact": _dedup_exact_query,
        "dedup_minhash": _dedup_minhash_query,
        "dedup_components": _dedup_components_query,
        "simhash": _simhash_query,
        "embedding_neardup": _neardup_query,
        "embedding_neardup_clustered": _neardup_clustered_query,
        "media_stats": _media_stats_query,
        "media_features": _media_features_query,
        "vecs_roundtrip": _vecs_roundtrip_query,
        "routed_calibrated_recall": _routed_calibrated_recall_query,
    }


def oracle_sql() -> dict[str, str]:
    from scalablevectorsearch_spark.pipeline.curate import split_boundaries

    return {
        "stratified_sample": oracles.stratified_sample_sql(
            SAMPLE_FRACTIONS, default_fraction=SAMPLE_DEFAULT
        ),
        "ngram_jaccard": oracles.ngram_jaccard_sql(3, 0.5),
        "duplicate_spans": oracles.duplicate_spans_sql(40, 1, 2),
        "spans_removal": oracles.spans_removal_sql(40, 1, 2, boiler_mod=7),
        "decontaminate_exact": oracles.decontaminate_exact_sql(20, 50000, n=13),
        "dedup_lines": oracles.dedup_lines_sql(60, 15, 10000, min_len=1),
        "repetition_stats": oracles.repetition_stats_sql(2),
        "dataset_split": oracles.dataset_split_sql(
            SPLIT_NAMES, split_boundaries(SPLIT_WEIGHTS)
        ),
        "pii_redact": oracles.pii_redact_sql(),
        "quality_filter": oracles.quality_filter_sql(),
        "flat_knn_l2": oracles.flat_knn_sql("l2", K, N_QUERIES),
        # exhaustive-window graph search degenerates to exact k-NN
        "vamana_exhaustive_knn": oracles.flat_knn_sql("l2", K, N_QUERIES),
        "flat_knn_ip": oracles.flat_knn_sql("ip", K, N_QUERIES),
        "flat_knn_cosine": oracles.flat_knn_sql("cosine", K, N_QUERIES),
        "flat_knn_filtered": oracles.flat_knn_sql("l2", K, N_QUERIES, where="label = 3"),
        # exhaustive-window filtered graph search == exact filtered k-NN
        "vamana_knn_filtered": oracles.flat_knn_sql("l2", K, N_QUERIES, where="label = 3"),
        "multivector_knn": oracles.multivector_knn_sql("l2", 5, 40, N_QUERIES),
        # exhaustive-window inner stage == flat scan -> same oracle
        "multivector_graph_knn": oracles.multivector_knn_sql("l2", 5, 40, N_QUERIES),
        "knn_recall_ip_vs_l2": oracles.recall_sql(K, N_QUERIES),
        "recall_at_k": oracles.recall_at_sql(5, 10, N_QUERIES),
        "medioid": oracles.medioid_sql(),
        "reconstruct": oracles.reconstruct_sql(50),
        # the hierarchical stamp is EXACT: same oracles as the flat paths
        "hierarchical_stamp_assign": oracles.kmeans_assign_sql(N_CLUSTERS, KM_ITERS),
        "vamana_hier_stamp_knn": oracles.flat_knn_sql("l2", K, N_QUERIES),
        "kmeans_assign": oracles.kmeans_assign_sql(N_CLUSTERS, KM_ITERS),
        "hierarchical_kmeans_assign": oracles.hierarchical_kmeans_assign_sql(
            HIER_PARENTS, HIER_CHILDREN, KM_ITERS
        ),
        "ivf_knn": oracles.ivf_knn_sql(K, N_CLUSTERS, KM_ITERS, N_PROBES, N_QUERIES),
        "ivf_knn_filtered": oracles.ivf_knn_sql(
            K, N_CLUSTERS, KM_ITERS, N_PROBES, N_QUERIES, member_where="emf.label = 3"
        ),
        "ivf_recall": oracles.ivf_recall_sql(K, N_CLUSTERS, KM_ITERS, N_PROBES, N_QUERIES),
        "inverted_knn": oracles.ivf_knn_sql(
            K, N_CLUSTERS, KM_ITERS, 0, N_QUERIES, epsilon_bp=INV_EPS_BP
        ),
        # router-proposed candidates cover every cell at
        # router_candidates == n_clusters -> equals plain epsilon probing
        "inverted_routed_knn": oracles.ivf_knn_sql(
            K, N_CLUSTERS, KM_ITERS, 0, N_QUERIES, epsilon_bp=INV_EPS_BP
        ),
        "sq_minmax": oracles.sq_minmax_sql(),
        "sq_roundtrip": oracles.sq_roundtrip_sql(50),
        "sq_knn_l2": oracles.sq_knn_sql("l2", K, N_QUERIES),
        "sq_knn_ip": oracles.sq_knn_sql("ip", K, N_QUERIES),
        # exhaustive-window SQ-graph search degenerates to the flat SQ scan
        "sq_vamana_knn_l2": oracles.sq_knn_sql("l2", K, N_QUERIES),
        "sq_vamana_knn_ip": oracles.sq_knn_sql("ip", K, N_QUERIES),
        "sq_vamana_knn_cosine": oracles.sq_knn_sql("cosine", K, N_QUERIES),
        # save -> load -> exhaustive-window search == exact flat k-NN
        "vamana_saveload_knn": oracles.flat_knn_sql("l2", K, N_QUERIES),
        # invariant-verdict gates (oracles.py tail): constant-truth /
        # data-dependent verdict tables for the non-SQL-expressible ops
        "vamana_knn": oracles.knn_invariant_verdict_sql(K, N_QUERIES),
        "vamana_recall": oracles.recall_verdict_sql(VAMANA_RECALL_FLOOR_E4, N_QUERIES),
        "vamana_routed_recall": oracles.recall_verdict_sql(
            ROUTED_RECALL_FLOOR_E4, N_QUERIES
        ),
        "vamana_router_recall": oracles.recall_verdict_sql(
            ROUTED_RECALL_FLOOR_E4, N_QUERIES
        ),
        "vamana_routed_default_recall": oracles.recall_verdict_sql(
            ROUTED_RECALL_FLOOR_E4, N_QUERIES
        ),
        "ivf_budget_recall": oracles.recall_verdict_sql(
            ROUTED_RECALL_FLOOR_E4, N_QUERIES
        ),
        "routed_calibrated_recall": oracles.recall_verdict_sql(
            CALIBRATED_RECALL_FLOOR_E4, N_QUERIES
        ),
        "ivf_target_recall": oracles.recall_verdict_sql(
            CALIBRATED_RECALL_FLOOR_E4, N_QUERIES
        ),
        "vamana_target_recall": oracles.recall_verdict_sql(
            CALIBRATED_RECALL_FLOOR_E4, N_QUERIES
        ),
        # auto fallback default: the engaged exact-pool path must equal
        # the exact filtered flat oracle even at an 8-wide window
        "vamana_auto_fallback_knn": oracles.flat_knn_sql(
            "l2", K, N_QUERIES, where="vec_id % 100 = 0"
        ),
        # held-out validation verdict: recall floor + the split/margin/
        # widen-only invariants pinned as constants
        "ivf_validated_recall": (
            f"SELECT CAST(1 AS BIGINT) AS ok, CAST(1 AS BIGINT) AS ok_validated, "
            f"CAST({CALIBRATED_RECALL_FLOOR_E4} AS BIGINT) AS floor_e4, "
            f"CAST({N_QUERIES} AS BIGINT) AS n_queries"
        ),
        "vamana_closure_recall": oracles.recall_verdict_sql(
            CLOSURE_RECALL_FLOOR_E4, N_QUERIES
        ),
        "calibrate_window": oracles.calibrate_verdict_sql(
            CALIBRATE_TARGET_E4, CALIBRATE_MAX_WINDOW
        ),
        "graph_degree_stats": oracles.degree_stats_verdict_sql(),
        "dynamic_vamana_recall": oracles.recall_verdict_sql(
            DYNAMIC_RECALL_FLOOR_E4, N_QUERIES
        ),
        "dynamic_ivf_knn": oracles.dynamic_ivf_knn_sql(
            K, N_CLUSTERS, KM_ITERS, N_PROBES, N_QUERIES,
            DYN_ADDED, DYN_OFFSET, DYN_DEL_LO, DYN_DEL_HI,
        ),
        "dynamic_flat_knn": oracles.dynamic_flat_knn_sql(
            K, N_QUERIES, DYN_ADDED, DYN_OFFSET, DYN_DEL_LO, DYN_DEL_HI
        ),
        # post-cycle exhaustive-window graph search == flat over the
        # mutated base (same mutation constants)
        "dynamic_vamana_exhaustive_knn": oracles.dynamic_flat_knn_sql(
            K, N_QUERIES, DYN_ADDED, DYN_OFFSET, DYN_DEL_LO, DYN_DEL_HI
        ),
        # r11: the same cycle on a kmeans-routed + closure-replicated
        # index — full-fan-out exhaustive search over the mutated base
        # is the same exact flat semantics (replicas dedup in the merge)
        "dynamic_routed_vamana_knn": oracles.dynamic_flat_knn_sql(
            K, N_QUERIES, DYN_ADDED, DYN_OFFSET, DYN_DEL_LO, DYN_DEL_HI
        ),
        # post-compact exhaustive search == flat over the survivors with
        # neighbor ids remapped to their dense rank
        "compact_remap_knn": oracles.compact_knn_sql(
            K, N_QUERIES, DYN_DEL_LO, DYN_DEL_HI
        ),
        "text_stats": oracles.text_stats_sql(),
        "normalize_text": oracles.normalize_text_sql(),
        "lang_id": oracles.lang_id_sql(),
        "doc_fingerprints": oracles.doc_fingerprints_sql(16, 8),
        "dedup_exact": oracles.dedup_exact_sql(10, 10000),
        "dedup_minhash": oracles.dedup_minhash_sql(3, 16, 4, 0.5),
        "decontaminate": oracles.decontaminate_sql(
            DECON_MOD, DECON_OFFSET, 3, 16, 4, 0.5
        ),
        "simhash_neardup": oracles.simhash_neardup_sql(SH_COPIES, SH_OFFSET, 32, 4, 3),
        "token_vocabulary": oracles.token_vocabulary_sql(200),
        "pack_sequences": oracles.pack_sequences_sql(500),
        "dedup_components": oracles.dedup_components_sql(3, 16, 4, 0.5),
        "simhash": oracles.simhash_sql(32),
        "embedding_neardup": oracles.embedding_neardup_sql(
            ND_THRESHOLD, ND_COPIES, ND_OFFSET
        ),
        "embedding_neardup_clustered": oracles.embedding_neardup_clustered_sql(
            ND_THRESHOLD, N_CLUSTERS, KM_ITERS, ND_COPIES, ND_OFFSET
        ),
        "media_stats": oracles.media_stats_sql(),
        "media_features": oracles.media_features_sql(),
        "vecs_roundtrip": oracles.vecs_roundtrip_sql(VECS_RT_IDS),
        # concatenated pages == one-shot top-(pages*size) flat k-NN
        "batch_iterator_pages": oracles.flat_knn_sql(
            "l2", ITER_PAGES * ITER_PAGE_SIZE, N_QUERIES
        ),
        # linear pages 4+8+12 == one-shot top-24
        "batch_iterator_linear": oracles.flat_knn_sql(
            "l2", ITER_PAGE_SIZE * (1 + 2 + 3), N_QUERIES
        ),
        # IVF pages concatenated == one-shot top-(pages*size) IVF search
        "batch_iterator_ivf": oracles.ivf_knn_sql(
            ITER_PAGES * ITER_PAGE_SIZE, N_CLUSTERS, KM_ITERS, N_PROBES, N_QUERIES
        ),
        # exhaustive-window label-deduped search over the mutated
        # multi-vector table (adds under new labels, label-wholesale
        # deletes)
        "dynamic_multivector_knn": oracles.dynamic_multivector_knn_sql(
            5, 40, N_QUERIES, DYN_ADDED, DYN_OFFSET, MV_LABEL_OFFSET, MV_DEL_LABELS
        ),
        "ivf_knn_reordered": oracles.ivf_reorder_sql(
            K, RE_K, N_CLUSTERS, KM_ITERS, N_PROBES, N_QUERIES
        ),
        # streaming drains to exactly the batch flat answer
        "streaming_knn": oracles.flat_knn_sql("l2", K, N_QUERIES),
        "streaming_dedup": oracles.streaming_dedup_sql(10, 10000),
        "streaming_window_agg": oracles.streaming_window_sql(),
        "streaming_upsert_log": oracles.streaming_upsert_sql(
            UPS_IDS, UPS_UPD, UPS_DEL_LO, UPS_DEL_HI, UPS_SRC_OFF
        ),
        "sq_knn_cosine": oracles.sq_knn_sql("cosine", K, N_QUERIES),
        "mixed_precision_knn": oracles.mixed_precision_verdict_sql(F16_RECALL_FLOOR_E4),
        "testdata_generator": oracles.testdata_generator_verdict_sql(GEN_NQ * GEN_K),
        "search_cancel": oracles.cancel_verdict_sql(),
        "custom_distance_knn": oracles.custom_distance_sql(K, N_QUERIES),
        "schema_validation": oracles.schema_validation_sql(),
        "graph_loader": oracles.graph_loader_verdict_sql(),
        "query_norm_fix": oracles.query_norm_fix_sql(N_QUERIES),
        "alpha_prune_invariants": oracles.alpha_prune_verdict_sql(
            AP_NODES, int(AP_ALPHA * 10000), AP_DEG
        ),
        "api_facade_knn": oracles.flat_knn_sql("l2", K, N_QUERIES),
        "lvq_roundtrip": oracles.lvq_roundtrip_sql(LVQ_RT_IDS, 4, 8),
        "lvq_knn_l2": oracles.lvq_knn_sql("l2", K, N_QUERIES, 8),
        "lvq_knn_cosine": oracles.lvq_knn_sql("cosine", K, N_QUERIES, 8),
        "lvq4x8_knn": oracles.lvq_knn_sql("l2", K, N_QUERIES, 4, 8, LVQ_RE_K),
        # exhaustive-window LVQ-graph search degenerates to the flat LVQ scan
        "lvq_vamana_knn": oracles.lvq_knn_sql("l2", K, N_QUERIES, 8),
        "leanvec_knn": oracles.leanvec_knn_sql(K, LV_TRUNC_RE_K, LV_TRUNC_M, N_QUERIES),
        "leanvec_knn_cosine": oracles.leanvec_knn_cosine_sql(
            K, LV_TRUNC_RE_K, LV_TRUNC_M, N_QUERIES
        ),
        # exhaustive-window projected graph == flat projected scan
        "leanvec_vamana_knn": oracles.leanvec_knn_sql(
            K, LV_TRUNC_RE_K, LV_TRUNC_M, N_QUERIES
        ),
        "leanvec_recall": oracles.recall_verdict_sql(
            LEANVEC_RECALL_FLOOR_E4, N_QUERIES
        ),
    }
