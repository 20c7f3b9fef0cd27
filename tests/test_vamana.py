"""Vamana tests (reference parity: tests/svs/index/vamana/,
examples/python/example_vamana.py recall-curve gates)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from scalablevectorsearch_spark.operators.flat import flat_knn
from scalablevectorsearch_spark.operators.vamana import (
    VamanaParams,
    graph_degree_stats,
    vamana_build,
    vamana_search,
)
from scalablevectorsearch_spark.operators.vamana_local import (
    alpha_prune,
    build_graph,
    greedy_search,
    medioid,
)


@pytest.fixture(scope="module")
def base(embeddings):
    return embeddings.selectExpr("vec_id as id", "embedding as vector")


@pytest.fixture(scope="module")
def queries(base):
    return base.filter(F.col("id") < 20).selectExpr("id as qid", "vector")


@pytest.fixture(scope="module")
def index(base):
    return vamana_build(
        base, VamanaParams(alpha=1.2, graph_max_degree=16, window_size=50), n_shards=2
    )


def test_local_medioid_ties_to_smallest():
    X = np.zeros((4, 3))
    assert medioid(X) == 0


def test_local_alpha_prune_keeps_nearest():
    rng = np.random.default_rng(0)
    X = rng.normal(size=(50, 8))
    d = ((X - X[0]) ** 2).sum(axis=1)
    order = np.lexsort((np.arange(50), d))
    pool = order[order != 0]
    kept = alpha_prune(X, 0, pool, d[pool], alpha=1.2, max_result=8)
    assert len(kept) <= 8
    assert kept[0] == pool[0]  # nearest always kept first


def test_local_greedy_search_finds_nn():
    rng = np.random.default_rng(1)
    X = rng.normal(size=(300, 16))
    graph, entry = build_graph(X, VamanaParams(graph_max_degree=16, window_size=40))
    d = ((X - X[7]) ** 2).sum(axis=1)
    true_nn = np.argsort(d)[:5]
    ids, _ = greedy_search(X, graph, [entry], X[7], 40)
    assert len(set(ids[:5]) & set(true_nn)) >= 4


def test_graph_respects_max_degree(index):
    params_deg = index.params.graph_max_degree
    max_deg = index.graph.select(F.max(F.size("neighbors"))).collect()[0][0]
    assert max_deg <= params_deg
    # one entry point per shard
    entries = index.graph.filter("is_entry").groupBy("shard_id").count().collect()
    assert all(r["count"] == 1 for r in entries)
    assert len(entries) == index.n_shards


def test_vamana_recall_floor(base, queries, index):
    gt = flat_knn(base, queries, k=10, distance="l2").select("qid", "neighbor_id")
    res = vamana_search(index, queries, k=10, search_window_size=30).select(
        "qid", "neighbor_id"
    )
    matched = res.join(gt, ["qid", "neighbor_id"], "left_semi").count()
    recall = matched / gt.count()
    assert recall >= 0.80, f"vamana recall {recall}"


def test_vamana_recall_monotone_in_window(base, queries, index):
    gt = flat_knn(base, queries, k=10, distance="l2").select("qid", "neighbor_id")
    gt.cache()
    recalls = []
    for sws in (10, 40):
        res = vamana_search(index, queries, k=10, search_window_size=sws).select(
            "qid", "neighbor_id"
        )
        matched = res.join(gt, ["qid", "neighbor_id"], "left_semi").count()
        recalls.append(matched / gt.count())
    assert recalls[-1] >= recalls[0] - 0.02, f"recall curve {recalls}"


def test_routed_clustered_shards(base, queries):
    """SPANN-style: kmeans shards + n_probes routing. Probing all shards
    matches the recall of the unrouted search; probing fewer trades
    recall for compute but stays above a floor."""
    idx = vamana_build(
        base, VamanaParams(graph_max_degree=16, window_size=50),
        n_shards=4, shard_by="kmeans",
    )
    gt = flat_knn(base, queries, k=10, distance="l2").select("qid", "neighbor_id")
    gt.cache()

    full = vamana_search(idx, queries, k=10, search_window_size=30).select(
        "qid", "neighbor_id"
    )
    r_full = full.join(gt, ["qid", "neighbor_id"], "left_semi").count() / gt.count()

    routed_all = vamana_search(
        idx, queries, k=10, search_window_size=30, n_probes=4
    ).select("qid", "neighbor_id")
    r_all = routed_all.join(gt, ["qid", "neighbor_id"], "left_semi").count() / gt.count()
    assert abs(r_all - r_full) < 1e-9  # probing every shard == no routing

    routed_2 = vamana_search(
        idx, queries, k=10, search_window_size=30, n_probes=2
    ).select("qid", "neighbor_id")
    r2 = routed_2.join(gt, ["qid", "neighbor_id"], "left_semi").count() / gt.count()
    assert r2 >= 0.6, f"routed recall {r2}"


def test_routing_requires_kmeans_shards(base, queries, index):
    import pytest as _pytest

    with _pytest.raises(ValueError, match="kmeans-sharded"):
        vamana_search(index, queries, k=5, n_probes=2).collect()


def test_routed_default_is_half_budget_epsilon(base, queries):
    """vamana_search(router=...) with no probe argument must resolve to
    budget-fitted epsilon probing at probe_budget = n_shards/2 — the r6
    routed default (reference two-level Inverted: memory_based.h:508).
    Pinned by result identity with the explicit call (fit_epsilon_bp is
    deterministic given the query block)."""
    from scalablevectorsearch_spark.operators.router import build_centroid_router

    idx = vamana_build(
        base, VamanaParams(graph_max_degree=16, window_size=50),
        n_shards=4, shard_by="kmeans",
    )
    router = build_centroid_router(idx.shard_model, distance="l2")
    default = vamana_search(
        idx, queries, k=10, search_window_size=30, router=router
    ).collect()
    explicit = vamana_search(
        idx, queries, k=10, search_window_size=30, router=router,
        probe_budget=idx.n_shards / 2,
    ).collect()
    assert sorted(map(tuple, default)) == sorted(map(tuple, explicit))


def test_probe_budget_validation(base, queries):
    import pytest as _pytest

    idx = vamana_build(
        base, VamanaParams(graph_max_degree=16, window_size=50),
        n_shards=4, shard_by="kmeans",
    )
    with _pytest.raises(ValueError, match="mutually exclusive"):
        vamana_search(idx, queries, k=5, probe_budget=2.0, n_probes=2)
    with _pytest.raises(ValueError, match="mutually exclusive"):
        vamana_search(idx, queries, k=5, probe_budget=2.0, epsilon_bp=100)
    with _pytest.raises(ValueError, match=">= 1"):
        vamana_search(idx, queries, k=5, probe_budget=0.5)


def test_probe_budget_full_fanout_matches_unrouted(base, queries):
    """probe_budget = n_shards must degrade to the full fan-out result
    (epsilon grows until every shard is probed)."""
    idx = vamana_build(
        base, VamanaParams(graph_max_degree=16, window_size=50),
        n_shards=4, shard_by="kmeans",
    )
    full = vamana_search(idx, queries, k=10, search_window_size=30).collect()
    budget = vamana_search(
        idx, queries, k=10, search_window_size=30, probe_budget=4.0
    ).collect()
    assert sorted(map(tuple, full)) == sorted(map(tuple, budget))


def test_vamana_build_deterministic(base):
    p = VamanaParams(graph_max_degree=8, window_size=20)
    g1 = vamana_build(base, p, n_shards=2).graph.orderBy("src").collect()
    g2 = vamana_build(base, p, n_shards=2).graph.orderBy("src").collect()
    assert [(r["src"], r["neighbors"]) for r in g1] == [
        (r["src"], r["neighbors"]) for r in g2
    ]


def test_degree_stats(index):
    stats = graph_degree_stats(index.graph)
    total = stats.agg(F.sum("n_nodes")).collect()[0][0]
    assert total == index.base.count()


def test_exhaustive_window_equals_flat(spark, embeddings):
    """Metamorphic: window >= shard size => greedy expands every
    (connected) shard graph, so vamana_search must reproduce exact flat
    k-NN including rank order and tie-breaks."""
    from scalablevectorsearch_spark.operators.flat import flat_knn

    base = embeddings.selectExpr("vec_id as id", "embedding as vector")
    q = base.filter(F.col("id") < 30).selectExpr("id as qid", "vector")
    idx = vamana_build(
        base, VamanaParams(graph_max_degree=16, window_size=50), n_shards=4
    )
    via_graph = sorted(
        (r["qid"], r["rank"], r["neighbor_id"])
        for r in vamana_search(idx, q, k=7, search_window_size=4096).collect()
    )
    exact = sorted(
        (r["qid"], r["rank"], r["neighbor_id"])
        for r in flat_knn(base, q, k=7).collect()
    )
    assert via_graph == exact


def test_full_search_history_build(spark, embeddings):
    """use_full_search_history=True (the reference default,
    preprocessor.h:181) prunes against every visited node; the build
    stays deterministic and searches stay sane."""
    import numpy as np

    from scalablevectorsearch_spark.operators.vamana_local import (
        batch_greedy_search,
        build_graph,
    )

    pdf = embeddings.orderBy("vec_id").toPandas()
    X = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    P = VamanaParams(
        graph_max_degree=8, window_size=20, use_full_search_history=True
    )
    g1, e1 = build_graph(X, P, "l2")
    g2, e2 = build_graph(X, P, "l2")
    assert e1 == e2 and all(np.array_equal(a, b) for a, b in zip(g1, g2))
    assert max(len(a) for a in g1) <= 8
    # tracked history is a sorted superset of the returned buffer
    bids, _, (offs, vids, vds) = batch_greedy_search(
        X, g1, [e1], X[:10], 15, "l2", track=True
    )
    for qi in range(10):
        seg = vids[offs[qi]:offs[qi + 1]]
        assert set(bids[qi][bids[qi] >= 0]) <= set(seg.tolist())
        assert np.all(np.diff(vds[offs[qi]:offs[qi + 1]]) >= 0)


def test_vamana_chunked_query_blocks_match(embeddings):
    from scalablevectorsearch_spark.operators.vamana import (
        VamanaParams,
        vamana_build,
        vamana_search,
    )

    base = embeddings.selectExpr("vec_id as id", "embedding as vector").filter(
        "id < 1000"
    )
    queries = base.filter("id < 60").selectExpr("id as qid", "vector")
    idx = vamana_build(
        base, VamanaParams(graph_max_degree=8, window_size=20), n_shards=2
    )
    idx.graph.cache().count()
    s = vamana_search(idx, queries, k=5, search_window_size=30).collect()
    c = vamana_search(
        idx, queries, k=5, search_window_size=30, max_query_block=13
    ).collect()
    assert sorted(map(tuple, c)) == sorted(map(tuple, s))


def test_closure_assignment_lifts_routed_recall(embeddings):
    """SPANN closure assignment: replicating boundary vectors into every
    cell within (1+eps) of their nearest centroid must (a) never emit
    duplicate neighbors after the merge dedup, (b) at a fixed probe
    count reach at least the recall of the non-closure index, and (c)
    strictly enlarge the layout (replicas exist)."""
    from scalablevectorsearch_spark.operators.flat import flat_knn
    from scalablevectorsearch_spark.operators.vamana import (
        VamanaParams,
        vamana_build,
        vamana_search,
    )

    base = embeddings.selectExpr("vec_id as id", "embedding as vector")
    queries = base.filter("id < 20").selectExpr("id as qid", "vector")
    p = VamanaParams(graph_max_degree=8, window_size=20)
    gt = flat_knn(base, queries, k=5).select("qid", "neighbor_id")
    gt.cache()
    n_gt = gt.count()

    plain = vamana_build(base, p, n_shards=8, shard_by="kmeans")
    closure = vamana_build(base, p, n_shards=8, shard_by="kmeans", closure_bp=3000)
    assert closure.layout.count() > plain.layout.count(), "no replicas created"

    def rec(idx):
        r = vamana_search(idx, queries, k=5, search_window_size=20, n_probes=2)
        dup = r.groupBy("qid", "neighbor_id").count().filter("count > 1").count()
        assert dup == 0, "duplicate neighbors leaked through the merge"
        return (
            r.select("qid", "neighbor_id").join(gt, ["qid", "neighbor_id"], "left_semi").count()
            / n_gt
        )

    r_plain, r_closure = rec(plain), rec(closure)
    assert r_closure >= r_plain, (r_plain, r_closure)


def test_closure_survives_save_load(embeddings, tmp_path):
    from scalablevectorsearch_spark.operators.vamana import (
        VamanaParams,
        vamana_build,
        vamana_search,
    )
    from scalablevectorsearch_spark.sources.index_store import (
        load_vamana,
        save_vamana,
    )

    base = embeddings.selectExpr("vec_id as id", "embedding as vector").filter(
        "id < 300"
    )
    queries = base.filter("id < 10").selectExpr("id as qid", "vector")
    idx = vamana_build(
        base, VamanaParams(graph_max_degree=8, window_size=20), n_shards=4,
        shard_by="kmeans", closure_bp=3000,
    )
    want = sorted(
        map(tuple, vamana_search(idx, queries, k=5, search_window_size=20).collect())
    )
    path = str(tmp_path / "closure_idx")
    save_vamana(idx, path)
    spark = base.sparkSession
    loaded = load_vamana(spark, path)
    assert loaded.closure_bp == 3000
    got = sorted(
        map(tuple, vamana_search(loaded, queries, k=5, search_window_size=20).collect())
    )
    assert got == want
