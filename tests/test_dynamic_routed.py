"""Cluster-routed (kmeans-sharded) dynamic maintenance (VERDICT r10
task 4): inserts stamp to their nearest cell — closure replicas
included — through the SAME deterministic assignment the build used;
deletes/consolidate repair every replica shard; post-mutation routed
searches keep pruning unprobed shards.

Reference anchors: dynamic_index.h:631-700 (insert path) composed with
the SPANN closure assignment of the routed layout (operators/vamana.py
_sharded); the reference's dynamic index is single-graph, so this
composition is the 100 TB-scale extension, gated here against exact
oracles on the mutated base."""

import pytest
from pyspark.sql import functions as F

from scalablevectorsearch_spark.operators.dynamic import (
    add_points,
    consolidate,
    delete_entries,
    dynamic_search,
    dynamic_vamana,
)
from scalablevectorsearch_spark.operators.flat import flat_knn
from scalablevectorsearch_spark.operators.vamana import (
    VamanaParams,
    vamana_build,
    vamana_search,
)

K = 5
N_SHARDS = 4
CLOSURE_BP = 2000  # 20% cutoff — enough replicas to exercise the path


@pytest.fixture(scope="module")
def base(embeddings):
    # hold out ids < 100 as the insert pool
    return embeddings.selectExpr("vec_id as id", "embedding as vector").filter(
        F.col("id") >= 100
    )


@pytest.fixture(scope="module")
def insert_pool(embeddings):
    return embeddings.selectExpr("vec_id as id", "embedding as vector").filter(
        F.col("id") < 100
    )


@pytest.fixture(scope="module")
def queries(embeddings):
    return embeddings.selectExpr("vec_id as qid", "embedding as vector").filter(
        F.col("qid") < 10
    )


@pytest.fixture(scope="module")
def routed_dyn(base):
    idx = vamana_build(
        base, VamanaParams(graph_max_degree=8, window_size=20),
        n_shards=N_SHARDS, shard_by="kmeans", closure_bp=CLOSURE_BP,
    )
    idx.layout.cache().count()
    return dynamic_vamana(idx)


def _exact(dyn, queries, k):
    """Exhaustive-window full-fan-out routed search == exact k-NN."""
    return dynamic_search(
        dyn, queries, k=k, search_window_size=4096, n_probes=N_SHARDS
    ).select("qid", "rank", "neighbor_id", "distance")


def test_routed_insert_stamps_to_nearest_cell(routed_dyn, insert_pool, queries, base):
    d = add_points(routed_dyn, insert_pool.filter(F.col("id") < 50))
    # the new layout rows must carry the same shard the build's stamp
    # would give them: every inserted id appears in >= 1 shard, and the
    # exhaustive search over the mutated base is EXACT
    mutated = base.unionByName(insert_pool.filter(F.col("id") < 50))
    expect = flat_knn(mutated, queries, k=K, distance="l2").collect()
    got = _exact(d, queries, K).collect()
    assert {(r["qid"], r["rank"], r["neighbor_id"]) for r in got} == {
        (r["qid"], r["rank"], r["neighbor_id"]) for r in expect
    }
    d.close()


def test_routed_delete_consolidate_repairs_all_replicas(
    routed_dyn, queries, base
):
    dels = base.filter((F.col("id") >= 200) & (F.col("id") < 230)).select("id")
    d = delete_entries(routed_dyn, dels)
    # tombstoned: excluded from results immediately (every replica)
    res = dynamic_search(
        d, queries, k=K, search_window_size=4096, n_probes=N_SHARDS
    )
    got_ids = {r["neighbor_id"] for r in res.collect()}
    assert got_ids.isdisjoint(set(range(200, 230)))
    # consolidate physically removes every replica and repairs in-edges
    d2 = consolidate(d)
    assert d2.index.layout.filter(
        F.col("__id").between(200, 229)
    ).count() == 0
    mutated = base.filter(~F.col("id").between(200, 229))
    expect = flat_knn(mutated, queries, k=K, distance="l2").collect()
    got = _exact(d2, queries, K).collect()
    assert {(r["qid"], r["rank"], r["neighbor_id"]) for r in got} == {
        (r["qid"], r["rank"], r["neighbor_id"]) for r in expect
    }
    d2.close()


def test_routed_revive_requires_consolidate(routed_dyn, base):
    dels = base.filter(F.col("id").between(300, 304)).select("id")
    d = delete_entries(routed_dyn, dels)
    reinsert = base.filter(F.col("id").between(300, 304)).select("id", "vector")
    with pytest.raises(ValueError, match="consolidate"):
        add_points(d, reinsert)
    d2 = consolidate(d)
    d3 = add_points(d2, reinsert)  # free after physical removal
    assert d3.index.layout.filter(F.col("__id").between(300, 304)).count() >= 5
    d3.close()


def test_routed_search_prunes_after_mutation(routed_dyn, insert_pool, queries, base):
    """Post-mutation ROUTED search (n_probes=1) must still return its
    probed-cell results correctly — and a query vector identical to an
    inserted row must find it at rank 1 (the insert landed in the cell
    the router probes first)."""
    ins = insert_pool.filter(F.col("id") < 5)
    d = add_points(routed_dyn, ins)
    q_ins = ins.selectExpr("id as qid", "vector")
    res = dynamic_search(d, q_ins, k=1, search_window_size=64, n_probes=1)
    top = {r["qid"]: r["neighbor_id"] for r in res.collect()}
    assert top == {i: i for i in range(5)}
    d.close()


def test_routed_calibrated_search_post_mutation(routed_dyn, insert_pool, queries, base):
    """target_recall= composes with routed dynamic state: the fit runs
    on the mutated index and the verdict holds the floor vs the exact
    oracle over the mutated base."""
    ins = insert_pool.filter(F.col("id") < 50)
    d = add_points(routed_dyn, ins)
    dels = base.filter(F.col("id").between(400, 420)).select("id")
    d = delete_entries(d, dels)
    mutated = base.filter(~F.col("id").between(400, 420)).unionByName(ins)
    gt = flat_knn(mutated, queries, k=K, distance="l2").select("qid", "neighbor_id")
    res = dynamic_search(
        d, queries, k=K, search_window_size=64, target_recall=0.9,
        calibration_queries=8,
    ).select("qid", "neighbor_id")
    matched = res.join(gt, ["qid", "neighbor_id"], "left_semi").count()
    assert matched / gt.count() >= 0.8  # CI slack below the 0.9 target
    d.close()


def test_routed_mutation_loop_pin_count_stays_flat(spark, base, insert_pool):
    """Routed mutations must not pin anything beyond the generation
    contract either — the insert stamp in particular must not register
    per-mutation checkpoint RDDs (a localCheckpoint pins outside the
    CacheManager and nothing would ever release it)."""
    from scalablevectorsearch_spark.operators.dynamic import (
        add_points,
        consolidate,
        delete_entries,
        dynamic_vamana,
    )

    idx = vamana_build(
        base, VamanaParams(graph_max_degree=8, window_size=20),
        n_shards=N_SHARDS, shard_by="kmeans",
    )
    dyn = dynamic_vamana(idx)

    def n_pinned() -> int:
        return spark.sparkContext._jsc.sc().getPersistentRDDs().size()

    baseline = None
    peak = 0
    for i in range(6):
        lo = i * 8
        added = insert_pool.filter(
            (F.col("id") >= lo) & (F.col("id") < lo + 8)
        )
        dyn = add_points(dyn, added)
        dyn = delete_entries(
            dyn,
            base.filter(
                (F.col("id") >= 500 + lo) & (F.col("id") < 500 + lo + 8)
            ).select("id"),
        )
        if i % 2 == 1:
            dyn = consolidate(dyn)
        if baseline is None:
            baseline = n_pinned()
        peak = max(peak, n_pinned() - baseline)
    assert peak <= 2, f"routed pin count grew with the chain: peak +{peak}"
    dyn.close()
