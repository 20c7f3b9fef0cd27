"""Dynamic index tests (reference parity: dynamic_index.h add/delete/
consolidate, bindings/python/tests/dynamic.py metamorphic cycles)."""

import pytest
from pyspark.sql import functions as F

from scalablevectorsearch_spark.operators.dynamic import (
    add_points,
    compact,
    consolidate,
    delete_entries,
    dynamic_flat_knn,
    dynamic_search,
    dynamic_vamana,
)
from scalablevectorsearch_spark.operators.flat import flat_knn
from scalablevectorsearch_spark.operators.vamana import VamanaParams, vamana_build


@pytest.fixture(scope="module")
def base(embeddings):
    return embeddings.selectExpr("vec_id as id", "embedding as vector")


@pytest.fixture(scope="module")
def queries(base):
    return base.filter(F.col("id") < 10).selectExpr("id as qid", "vector")


@pytest.fixture(scope="module")
def dyn(base):
    idx = vamana_build(base, VamanaParams(graph_max_degree=8, window_size=20), n_shards=2)
    return dynamic_vamana(idx)


def test_dynamic_flat_delete_excludes(base, queries):
    deleted = base.filter(F.col("id") < 5).select("id")
    res = dynamic_flat_knn(base, queries, k=5, deleted_ids=deleted)
    got_ids = {r["neighbor_id"] for r in res.collect()}
    assert got_ids.isdisjoint(set(range(5)))


def test_dynamic_flat_add_appears(base, queries):
    # add an exact copy of query 0's vector under a new id: it must be
    # that query's nearest (or tied-nearest) neighbor
    added = base.filter(F.col("id") == 0).select(
        (F.col("id") + 50000).alias("id"), "vector"
    )
    res = dynamic_flat_knn(base, queries, k=3, added=added)
    top = {(r["qid"], r["rank"]): r["neighbor_id"] for r in res.collect()}
    assert top[(0, 1)] == 0 and top[(0, 2)] == 50000  # id tie-break: 0 first


def test_delete_unknown_id_raises(dyn):
    spark = dyn.spark
    bogus = spark.createDataFrame([(999999,)], "id long")
    with pytest.raises(ValueError, match="unknown"):
        delete_entries(dyn, bogus)


def test_add_duplicate_id_raises(dyn, base):
    dup = base.filter(F.col("id") == 1).select("id", "vector")
    with pytest.raises(ValueError, match="already exist"):
        add_points(dyn, dup)


def test_dynamic_cycle_recall(base, queries, dyn):
    """B6: add 1% + delete 1% + consolidate; recall vs exact flat over
    the mutated base stays high."""
    n = base.count()
    n_mod = max(1, n // 100)
    added = base.filter(F.col("id") < n_mod).select(
        (F.col("id") + 50000).alias("id"), "vector"
    )
    deleted = base.filter((F.col("id") >= 20) & (F.col("id") < 20 + n_mod)).select("id")

    d = add_points(dyn, added)
    d = delete_entries(d, deleted)
    # tombstoned ids excluded pre-consolidate
    res0 = dynamic_search(d, queries, k=5, search_window_size=20)
    del_set = {r["id"] for r in deleted.collect()}
    assert {r["neighbor_id"] for r in res0.collect()}.isdisjoint(del_set)

    d = consolidate(d)
    assert d.n_tombstones() == 0
    res = dynamic_search(d, queries, k=10, search_window_size=30).select(
        "qid", "neighbor_id"
    )
    gt = dynamic_flat_knn(
        base, queries, k=10, added=added, deleted_ids=deleted
    ).select("qid", "neighbor_id")
    matched = res.join(gt, ["qid", "neighbor_id"], "left_semi").count()
    recall = matched / gt.count()
    assert recall >= 0.80, f"post-cycle recall {recall}"


def test_dynamic_ivf_cycle(base, queries):
    from scalablevectorsearch_spark.operators.dynamic import (
        dynamic_ivf,
        ivf_add_points,
        ivf_delete_entries,
        ivf_dynamic_search,
        ivf_recluster,
    )
    from scalablevectorsearch_spark.operators.ivf import ivf_build

    idx = ivf_build(base.withColumn("label", F.lit(0)), 8, 2)
    d = dynamic_ivf(idx)
    added = base.filter(F.col("id") < 5).select(
        (F.col("id") + 70000).alias("id"), "vector", F.lit(0).alias("label")
    )
    d = ivf_add_points(d, added)
    deleted = base.filter((F.col("id") >= 30) & (F.col("id") < 35)).select("id")
    d = ivf_delete_entries(d, deleted)

    res = ivf_dynamic_search(d, queries, k=3, n_probes=8)
    got = {r["neighbor_id"] for r in res.collect()}
    assert got.isdisjoint(set(range(30, 35)))  # tombstoned gone
    # an added exact copy of query 0 surfaces as its neighbor
    top = {(r["qid"], r["rank"]): r["neighbor_id"] for r in res.collect()}
    assert top[(0, 2)] == 70000  # copy right after the original (id tiebreak)

    d2 = ivf_recluster(d)
    assert d2.tombstones.count() == 0
    assert d2.index.clustered.count() == base.count()  # +5 added -5 deleted


def test_lsh_bucket_cap_guards_hot_buckets(documents):
    from scalablevectorsearch_spark.pipeline.dedup import (
        lsh_candidate_pairs,
        minhash_signature,
        shingle_hashes,
    )

    docs = documents.select("doc_id", "text").limit(30)
    # 10 identical docs -> one hot bucket in every band
    clones = docs.limit(1).select(F.lit(999).alias("doc_id"), "text")
    for i in range(9):
        clones = clones.unionByName(
            docs.limit(1).select(F.lit(1000 + i).alias("doc_id"), "text")
        )
    sig = minhash_signature(shingle_hashes(docs.unionByName(clones)), 16)
    uncapped = lsh_candidate_pairs(sig, 4).count()
    capped = lsh_candidate_pairs(sig, 4, max_bucket_size=5).count()
    assert capped < uncapped  # the 11-clone bucket's ~55 pairs are excluded


def test_compact_remaps_dense(base):
    idx = vamana_build(
        base.filter(F.col("id") % 3 == 0),
        VamanaParams(graph_max_degree=8, window_size=20),
        n_shards=2,
    )
    nb, ng, mapping = compact(idx.base, idx.graph)
    n = nb.count()
    ids = sorted(r["id"] for r in nb.select("id").collect())
    assert ids == list(range(n))  # dense 0..n-1
    # every graph src/neighbor is a valid new id
    max_nbr = ng.select(F.max(F.array_max("neighbors"))).collect()[0][0]
    assert max_nbr is None or max_nbr < n


def test_compact_index_stays_searchable(base, queries):
    """compact_index remaps base + graph + layout consistently: an
    exhaustive-window search over the COMPACTED index equals exact flat
    k-NN over the survivors with neighbor ids remapped to their dense
    rank (dynamic_index.h:791-810 — compact leaves the index servable)."""
    from scalablevectorsearch_spark.operators.dynamic import compact_index
    from scalablevectorsearch_spark.operators.vamana import vamana_search

    sub = base.filter(F.col("id") < 1000)
    idx = vamana_build(
        sub, VamanaParams(graph_max_degree=8, window_size=20), n_shards=2
    )
    deleted = sub.filter((F.col("id") >= 5) & (F.col("id") < 15)).select("id")
    d = consolidate(delete_entries(dynamic_vamana(idx), deleted))
    cidx, mapping = compact_index(d.index)
    res = vamana_search(cidx, queries, k=5, search_window_size=2000)
    gt = flat_knn(
        sub.join(deleted.withColumnRenamed("id", "del_id"),
                 F.col("id") == F.col("del_id"), "left_anti"),
        queries, k=5,
    )
    remap = {r["old_id"]: r["new_id"] for r in mapping.collect()}
    want = sorted(
        (r["qid"], r["rank"], remap[r["neighbor_id"]])
        for r in gt.select("qid", "rank", "neighbor_id").collect()
    )
    got = sorted(
        map(tuple, res.select("qid", "rank", "neighbor_id").collect())
    )
    assert got == want
    # layout remap preserved the shard stamps' row counts
    assert cidx.layout.count() == sub.count() - deleted.count()


def test_incremental_add_degree_and_exactness(base, queries):
    """add_points links new points incrementally (dynamic_index.h:631-700):
    the degree bound survives reverse-edge insertion, and an
    exhaustive-window search over the mutated index equals the exact
    flat result over (base + added) — i.e. every inserted node is
    reachable and correctly linked."""
    sub = base.filter(F.col("id") < 1000)
    idx = vamana_build(
        sub, VamanaParams(graph_max_degree=8, window_size=20), n_shards=2
    )
    added = base.filter((F.col("id") >= 1000) & (F.col("id") < 1050)).select(
        (F.col("id") + 60000).alias("id"), "vector"
    )
    d = add_points(dynamic_vamana(idx), added)
    assert (
        d.index.graph.select(F.max(F.size("neighbors"))).first()[0] <= 8
    ), "degree bound violated after incremental insert"
    res = dynamic_search(d, queries, k=5, search_window_size=2000)
    gt = flat_knn(sub.unionByName(added), queries, k=5)
    assert sorted(map(tuple, res.select("qid", "rank", "neighbor_id").collect())) == sorted(
        map(tuple, gt.select("qid", "rank", "neighbor_id").collect())
    )


def test_revive_entry_point(base, queries):
    """Deleting every entry point and reinserting those ids exercises
    the revived-entry fallback (medioid of surviving old nodes) in the
    incremental link kernel; exhaustive search stays exact."""
    sub = base.filter(F.col("id") < 500)
    idx = vamana_build(
        sub, VamanaParams(graph_max_degree=8, window_size=20), n_shards=2
    )
    d = dynamic_vamana(idx)
    entries = idx.graph.filter("is_entry").select(F.col("src").alias("id"))
    d = delete_entries(d, entries)
    revived = sub.join(F.broadcast(entries), "id", "left_semi").select("id", "vector")
    d = add_points(d, revived)
    assert d.n_tombstones() == 0
    res = dynamic_search(d, queries, k=5, search_window_size=1000)
    gt = flat_knn(sub, queries, k=5)
    assert sorted(map(tuple, res.select("qid", "rank", "neighbor_id").collect())) == sorted(
        map(tuple, gt.select("qid", "rank", "neighbor_id").collect())
    )


def test_large_delete_wave_dataframe_tombstones(base, queries):
    """A delete wave above the driver threshold flips to DataFrame
    tombstones: exclusion, consolidate, and the post-consolidate result
    all behave identically to the driver-resident path, with no
    driver-side id materialization (max_driver_ids forces the flip)."""
    sub = base.filter(F.col("id") < 1000)
    idx = vamana_build(
        sub, VamanaParams(graph_max_degree=8, window_size=20), n_shards=2
    )
    wave = sub.filter((F.col("id") % 7 == 0) & (F.col("id") >= 50)).select("id")
    d = delete_entries(dynamic_vamana(idx), wave, max_driver_ids=10)
    assert d.tomb_df is not None and d.tomb_ids == ()
    live = sub.join(F.broadcast(wave), "id", "left_anti")
    gt = sorted(
        map(
            tuple,
            flat_knn(live, queries, k=5)
            .select("qid", "rank", "neighbor_id")
            .collect(),
        )
    )
    # pre-consolidate: tombstones excluded from results (exhaustive
    # window -> exact equality with flat over the live rows)
    res = dynamic_search(d, queries, k=5, search_window_size=1200)
    assert sorted(map(tuple, res.select("qid", "rank", "neighbor_id").collect())) == gt
    # consolidate drains the wave via repair, not rebuild
    d = consolidate(d)
    assert d.n_tombstones() == 0 and d.tomb_df is None
    res2 = dynamic_search(d, queries, k=5, search_window_size=1200)
    assert sorted(map(tuple, res2.select("qid", "rank", "neighbor_id").collect())) == gt


def test_add_points_with_dataframe_tombstones(base, queries):
    """add_points against an active DataFrame tombstone set: revived ids
    leave the set (join-only), fresh ids collide correctly."""
    import pytest as _pytest

    sub = base.filter(F.col("id") < 500)
    idx = vamana_build(
        sub, VamanaParams(graph_max_degree=8, window_size=20), n_shards=2
    )
    wave = sub.filter((F.col("id") >= 100) & (F.col("id") < 200)).select("id")
    d = delete_entries(dynamic_vamana(idx), wave, max_driver_ids=10)
    assert d.tomb_df is not None
    # reviving 5 tombstoned ids shrinks the set to 95
    revive = sub.filter((F.col("id") >= 100) & (F.col("id") < 105)).select(
        "id", "vector"
    )
    d = add_points(d, revive)
    assert d.tomb_df is not None and d.n_tombstones() == 95
    # adding a live id still raises
    with _pytest.raises(ValueError, match="already exist"):
        add_points(d, sub.filter(F.col("id") == 0).select("id", "vector"))
    live = sub.filter((F.col("id") < 105) | (F.col("id") >= 200))
    gt = sorted(
        map(
            tuple,
            flat_knn(live, queries, k=5)
            .select("qid", "rank", "neighbor_id")
            .collect(),
        )
    )
    res = dynamic_search(d, queries, k=5, search_window_size=600)
    assert sorted(map(tuple, res.select("qid", "rank", "neighbor_id").collect())) == gt


def test_compact_dense_ids_distributed(base):
    """The dense remap must (a) exactly reproduce rank-by-ascending-id
    and (b) plan with no single-partition exchange / WindowExec (the
    100 TB constraint: tools/explain_audit.py section 6)."""
    import io
    from contextlib import redirect_stdout

    from scalablevectorsearch_spark.operators.dynamic import _dense_ids

    sub = base.filter((F.col("id") % 7 == 0) | (F.col("id") % 11 == 0))
    mapping = _dense_ids(sub, "id")
    got = {r["old_id"]: r["new_id"] for r in mapping.collect()}
    want = {oid: i for i, oid in enumerate(sorted(got))}
    assert got == want
    buf = io.StringIO()
    with redirect_stdout(buf):
        mapping.explain("formatted")
    plan = buf.getvalue()
    assert "SinglePartition" not in plan
    assert "Window" not in plan.replace("WindowGroupLimit", "")


def test_delete_entries_threshold_crossover(base, queries):
    """The exact driver->DataFrame representation crossover: wave 1
    stays driver-resident (tomb_ids), wave 2 pushes the total past
    max_driver_ids so the set flips to tomb_df — search exclusion and
    consolidate must behave identically across the flip, and the
    already-deleted validation must keep working against the OTHER
    representation."""
    sub = base.filter(F.col("id") < 1000)
    idx = vamana_build(
        sub, VamanaParams(graph_max_degree=8, window_size=20), n_shards=2
    )
    dyn = dynamic_vamana(idx)
    w1 = sub.filter(F.col("id") < 6).select("id")
    w2 = sub.filter((F.col("id") >= 6) & (F.col("id") < 14)).select("id")
    dyn = delete_entries(dyn, w1, max_driver_ids=10)
    assert dyn.tomb_df is None and len(dyn.tomb_ids) == 6
    dyn = delete_entries(dyn, w2, max_driver_ids=10)  # 6+8 > 10 -> flips
    assert dyn.tomb_df is not None and dyn.tomb_ids == ()
    assert dyn.n_tombstones() == 14
    # re-deleting across the flip must raise (validated via tomb_df now)
    with pytest.raises(ValueError, match="already deleted"):
        delete_entries(dyn, w1, max_driver_ids=10)
    got = {r["neighbor_id"] for r in
           dynamic_search(dyn, queries, k=5, search_window_size=4096).collect()}
    assert got.isdisjoint(set(range(14)))
    dyn2 = consolidate(dyn)
    assert dyn2.n_tombstones() == 0
    assert dyn2.index.layout.filter(F.col("__id") < 14).count() == 0
    exact = flat_knn(
        sub.filter(F.col("id") >= 14), queries, k=5, round_to=4
    ).select("qid", "neighbor_id")
    post = dynamic_search(dyn2, queries, k=5, search_window_size=4096).select(
        "qid", "neighbor_id"
    )
    assert post.exceptAll(exact).count() == 0 and exact.exceptAll(post).count() == 0


def test_delete_entries_threshold_contract(base):
    sub = base.filter(F.col("id") < 100)
    idx = vamana_build(
        sub, VamanaParams(graph_max_degree=8, window_size=20), n_shards=2
    )
    dyn = dynamic_vamana(idx)
    with pytest.raises(ValueError, match="broadcast-safe"):
        delete_entries(dyn, sub.select("id"), max_driver_ids=1_000_000)
