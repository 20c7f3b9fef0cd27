"""Multi-vector (label-deduped) search tests — adaptive k_inner
iteration per MultiBatchIterator semantics (multi.h:22-47)."""

import pytest
from pyspark.sql import functions as F

from scalablevectorsearch_spark.operators.multivector import multivector_knn


@pytest.fixture(scope="module")
def skewed(embeddings):
    # every label owns many vectors: label = id div 8 -> a naive small
    # k_inner sees few distinct labels and must iterate
    return embeddings.selectExpr(
        "vec_id as id", "embedding as vector", "cast(vec_id div 8 as int) as label"
    )


@pytest.fixture(scope="module")
def tiny_labels(embeddings):
    # only 3 distinct labels exist in the whole base
    return embeddings.selectExpr(
        "vec_id as id", "embedding as vector", "cast(vec_id % 3 as int) as label"
    )


@pytest.fixture(scope="module")
def queries(embeddings):
    return embeddings.filter(F.col("vec_id") < 5).selectExpr("vec_id as qid", "embedding as vector")


def test_adaptive_fills_k_labels(skewed, queries):
    out = multivector_knn(skewed, queries, k=6, k_inner=8)
    per = out.groupBy("qid").agg(
        F.count("*").alias("n"), F.countDistinct("label").alias("nl")
    ).collect()
    assert all(r["n"] == 6 and r["nl"] == 6 for r in per)


def test_caps_at_available_labels(tiny_labels, queries):
    out = multivector_knn(tiny_labels, queries, k=5)
    per = {r["qid"]: r["n"] for r in out.groupBy("qid").agg(F.count("*").alias("n")).collect()}
    assert all(v == 3 for v in per.values())  # only 3 labels exist


def test_presized_k_inner_single_iteration(skewed, queries):
    """VERDICT r4 #8: with k_inner unset, the label-multiplicity
    pre-size must make the adaptive loop converge in ONE inner search
    on skewed labels (every label here has multiplicity 8, so the old
    4*k default was too small and retried)."""
    from scalablevectorsearch_spark.operators.flat import flat_knn

    calls = []

    def counting_search(qdf, ki):
        calls.append(ki)
        return flat_knn(skewed, qdf, k=ki, distance="l2", round_to=4)

    out = multivector_knn(skewed, queries, k=6, search_fn=counting_search)
    per = out.groupBy("qid").agg(F.countDistinct("label").alias("nl")).collect()
    assert all(r["nl"] == 6 for r in per)
    assert len(calls) == 1, f"expected 1 inner search, ran {len(calls)}: {calls}"
    assert calls[0] >= 6 * 8  # k * max_multiplicity


def test_megalabel_presize_stays_small(embeddings, queries):
    """VERDICT r5 caveat: pre-sizing from the MAX label multiplicity
    lets one mega-label inflate every query's inner k toward n_base,
    degenerating the ANN search into an exhaustive scan. The p99
    pre-size must stay small (the mega-label is above-quantile) and the
    adaptive loop must still converge in ONE pass here, with identical
    results to an exhaustive k_inner."""
    from scalablevectorsearch_spark.operators.flat import flat_knn
    from scalablevectorsearch_spark.operators.multivector import _presize_k_inner

    # one label owns ~20% of all rows; the rest carry 4 rows each
    mega = embeddings.selectExpr(
        "vec_id as id", "embedding as vector",
        "cast(case when vec_id % 5 = 0 then 0 else 1 + (vec_id div 4) end as int)"
        " as label",
    )
    n_base = mega.count()
    mega_mult = mega.filter("label = 0").count()
    assert mega_mult >= n_base // 6  # fixture sanity: a real mega-label

    k = 5
    ki = _presize_k_inner(mega.select("id", "label"), k)
    assert ki < k * mega_mult  # the max would have blown this up
    assert ki <= max(4 * k, 8 * k)  # p99 of the 4-row tail, not the max
    assert ki < n_base // 4  # k_inner << n_base

    calls = []

    def counting_search(qdf, kk):
        calls.append(kk)
        return flat_knn(mega, qdf, k=kk, distance="l2", round_to=4)

    out = multivector_knn(mega, queries, k=k, search_fn=counting_search)
    assert len(calls) == 1, f"expected 1 inner search, ran {len(calls)}: {calls}"
    exact = multivector_knn(mega, queries, k=k, k_inner=n_base)
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, exact.collect()))


def test_nearest_representative_per_label(skewed, queries):
    out = multivector_knn(skewed, queries, k=3)
    # each (qid,label) appears once, ranked 1..3
    dup = out.groupBy("qid", "label").count().filter("count > 1").count()
    assert dup == 0


def test_dynamic_multivector_label_cycle(spark, skewed, queries):
    """MultiMutableVamanaIndex semantics (multi.h:155): deleting a
    label removes EVERY vector it carries; adding under a new label
    makes it searchable; unknown labels raise."""
    from scalablevectorsearch_spark.operators.multivector import (
        multi_add_points,
        multi_delete_labels,
        multi_dynamic_search,
        multi_dynamic_vamana,
    )
    from scalablevectorsearch_spark.operators.vamana import vamana_build

    idx = vamana_build(skewed.select("id", "vector"), n_shards=2)
    m = multi_dynamic_vamana(idx, skewed.select("id", "label"))
    # add 3 vectors under one brand-new label
    added = skewed.filter(F.col("id") < 3).selectExpr(
        "id + 500000 as id", "vector", "cast(777 as int) as label"
    )
    m = multi_add_points(m, added)
    # delete label 0 wholesale (8 vectors)
    m = multi_delete_labels(m, [0])
    assert m.labels.filter("label = 0").count() == 0
    assert m.labels.filter("label = 777").count() == 3
    out = multi_dynamic_search(m, queries, k=5, search_window_size=4096)
    got_labels = {r["label"] for r in out.select("label").distinct().collect()}
    assert 0 not in got_labels  # deleted label never returned
    # queries 0..4 ARE vectors of labels 0 and 777-adjacent; the new
    # label's nearest vector (an exact copy of id<3) must surface at
    # rank 1 for its own query
    r1 = {r["qid"]: r["label"] for r in out.filter("rank = 1").collect()}
    assert r1[0] == 777 and r1[1] == 777 and r1[2] == 777
    with pytest.raises(ValueError, match="unknown"):
        multi_delete_labels(m, [999999])


def test_multivector_batch_iterator_pages(skewed, queries):
    """MultiBatchIterator composition (multi.h:22-47): pages are
    label-disjoint per query, nearest-first, and their concatenation
    equals the one-shot top-k label ranking; update() restarts."""
    from scalablevectorsearch_spark.operators.iterator import DefaultSchedule
    from scalablevectorsearch_spark.operators.multivector import (
        multivector_batch_iterator,
    )

    it = multivector_batch_iterator(
        skewed, queries, DefaultSchedule(batch_size=3)
    )
    p1 = it.next_batch().collect()
    p2 = it.next_batch().collect()
    seen1 = {(r["qid"], r["label"]) for r in p1}
    seen2 = {(r["qid"], r["label"]) for r in p2}
    assert seen1.isdisjoint(seen2), "pages must be label-disjoint"
    assert {r["rank"] for r in p1} == {1, 2, 3}
    assert {r["rank"] for r in p2} == {4, 5, 6}
    # concatenated pages == one-shot top-6 labels
    direct = multivector_knn(skewed, queries, k=6)
    got = sorted((r["qid"], r["rank"], r["label"]) for r in p1 + p2)
    want = sorted(
        (r["qid"], r["rank"], r["label"])
        for r in direct.select("qid", "rank", "label").collect()
    )
    assert got == want
    # restart yields page 1 again
    it.update()
    p1b = it.next_batch().collect()
    assert sorted((r["qid"], r["rank"], r["label"]) for r in p1b) == sorted(
        (r["qid"], r["rank"], r["label"]) for r in p1
    )


def test_multivector_vamana_backend(spark, embeddings):
    """multivector_knn's search_fn override serves inner candidates from
    a Vamana index (multi.h runs inside the graph index); with an
    exhaustive window the label ranking equals the flat-backed answer."""
    from scalablevectorsearch_spark.operators.multivector import multivector_knn
    from scalablevectorsearch_spark.operators.vamana import (
        VamanaParams,
        vamana_build,
        vamana_search,
    )

    base = embeddings.selectExpr(
        "vec_id as id", "embedding as vector", "cast(vec_id % 40 as long) as label"
    )
    queries = base.filter(F.col("id") < 10).selectExpr("id as qid", "vector")
    idx = vamana_build(
        base.select("id", "vector"),
        VamanaParams(graph_max_degree=16, window_size=50),
        n_shards=2,
    )
    idx.graph.persist().count()
    got = multivector_knn(
        base, queries, k=5,
        search_fn=lambda q, ki: vamana_search(idx, q, ki, search_window_size=4096),
    )
    want = multivector_knn(base, queries, k=5)
    key = lambda df: sorted(
        (r["qid"], r["rank"], r["label"]) for r in df.collect()
    )
    assert key(got) == key(want)
