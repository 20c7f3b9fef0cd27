"""vamana_search(where=) — hybrid filtered graph search.

The reference exposes predicate-filtered search on the flat index
(/root/reference/include/svs/index/flat/flat.h:290-295); composed with
the graph index it is the filtered-RAG query (flat_knn and ivf_search
already take where=). Semantics here: the predicate restricts which
nodes may be RETURNED; non-matching nodes remain traversable waypoints
(tombstone mechanism), so at an exhaustive exploration window the
result is EXACTLY the filtered k-NN.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from scalablevectorsearch_spark.operators import flat as flat_mod
from scalablevectorsearch_spark.operators.flat import flat_knn
from scalablevectorsearch_spark.operators.recall import k_recall_at
from scalablevectorsearch_spark.operators.vamana import (
    VamanaParams,
    vamana_build,
    vamana_search,
)

PARAMS = VamanaParams(graph_max_degree=24, window_size=24)


@pytest.fixture(scope="module")
def fbase(spark, embeddings):
    base = embeddings.selectExpr(
        "vec_id as id", "embedding as vector", "label"
    ).limit(800).cache()
    base.count()
    yield base
    base.unpersist()


@pytest.fixture(scope="module")
def fqueries(embeddings):
    return embeddings.selectExpr("vec_id as qid", "embedding as vector").limit(10)


def _exact(df):
    return sorted(
        (r["qid"], r["rank"], r["neighbor_id"], round(r["distance"], 4))
        for r in df.collect()
    )


class TestExhaustiveWindowIsExactFiltered:
    def test_hash_sharded(self, spark, fbase, fqueries):
        index = vamana_build(fbase, PARAMS, n_shards=4)
        got = vamana_search(
            index, fqueries, k=5, search_window_size=4096, where="label = 3"
        )
        want = flat_knn(
            fbase, fqueries, k=5, where="label = 3", round_to=4
        )
        assert _exact(got) == _exact(want)

    def test_kmeans_sharded_full_fanout(self, spark, fbase, fqueries):
        index = vamana_build(fbase, PARAMS, n_shards=4, shard_by="kmeans")
        got = vamana_search(
            index, fqueries, k=5, search_window_size=4096,
            where=F.col("label") == 3,
        )
        want = flat_knn(
            fbase, fqueries, k=5, where="label = 3", round_to=4
        )
        assert _exact(got) == _exact(want)

    def test_closure_replicated(self, spark, fbase, fqueries):
        index = vamana_build(
            fbase, PARAMS, n_shards=4, shard_by="kmeans", closure_bp=5000
        )
        got = vamana_search(
            index, fqueries, k=5, search_window_size=4096, where="label = 3"
        )
        want = flat_knn(fbase, fqueries, k=5, where="label = 3", round_to=4)
        assert _exact(got) == _exact(want)


class TestFilteredRecallAndComposition:
    def test_recall_under_half_selective_filter(self, spark, fbase, fqueries):
        """~50%-selective predicate at a widened window: the gate the
        verdict asked for — recall must hold up, not just not-crash."""
        index = vamana_build(fbase, PARAMS, n_shards=4)
        where = "label < 5"  # labels are 0..9-ish: ~half the rows
        got = vamana_search(
            index, fqueries, k=5, search_window_size=64, where=where
        )
        gt = flat_knn(fbase, fqueries, k=5, where=where, round_to=4)
        r = k_recall_at(gt, got, 5).collect()[0]["recall"]
        assert r >= 0.9, r

    def test_filter_only_returns_matching(self, spark, fbase, fqueries):
        index = vamana_build(fbase, PARAMS, n_shards=4)
        got = vamana_search(
            index, fqueries, k=5, search_window_size=64, where="label = 3"
        )
        ok = fbase.filter("label = 3").select(F.col("id").alias("neighbor_id"))
        assert got.join(ok, "neighbor_id", "left_anti").count() == 0

    def test_where_composes_with_exclude_ids(self, spark, fbase, fqueries):
        index = vamana_build(fbase, PARAMS, n_shards=4)
        matching = [
            r["id"] for r in fbase.filter("label = 3").limit(3).collect()
        ]
        got = vamana_search(
            index, fqueries, k=5, search_window_size=4096,
            where="label = 3", exclude_ids=matching,
        )
        ids = {r["neighbor_id"] for r in got.collect()}
        assert ids.isdisjoint(set(matching))
        # and it is exactly the flat result on the filtered-minus-excluded set
        want = flat_knn(
            fbase.filter(~F.col("id").isin(matching)), fqueries, k=5,
            where="label = 3", round_to=4,
        )
        assert _exact(got) == _exact(want)

    def test_where_composes_with_probe_budget(self, spark, fbase, fqueries):
        index = vamana_build(fbase, PARAMS, n_shards=4, shard_by="kmeans")
        got = vamana_search(
            index, fqueries, k=5, search_window_size=64,
            where="label = 3", probe_budget=2.0,
        )
        assert got.count() > 0
        ok = fbase.filter("label = 3").select(F.col("id").alias("neighbor_id"))
        assert got.join(ok, "neighbor_id", "left_anti").count() == 0

    def test_where_composes_with_target_recall(self, spark, fbase, fqueries):
        index = vamana_build(fbase, PARAMS, n_shards=4, shard_by="kmeans")
        got = vamana_search(
            index, fqueries, k=5, search_window_size=64,
            where="label < 5", target_recall=0.9, calibration_queries=10,
        )
        gt = flat_knn(fbase, fqueries, k=5, where="label < 5", round_to=4)
        r = k_recall_at(gt, got, 5).collect()[0]["recall"]
        # sample-fitted on the full 10-query set here, so the target binds
        assert r >= 0.9, r

    def test_where_with_query_blocks_matches_single_batch(
        self, spark, fbase, fqueries
    ):
        """where= + max_query_block: blocks share ONE persisted filtered
        scan (each block's job must not re-stamp the base) and the
        blocked result equals the single-batch result exactly."""
        index = vamana_build(fbase, PARAMS, n_shards=4)
        got = vamana_search(
            index, fqueries, k=5, search_window_size=4096,
            where="label = 3", max_query_block=4,
        )
        want = vamana_search(
            index, fqueries, k=5, search_window_size=4096, where="label = 3"
        )
        assert _exact(got) == _exact(want)

    def test_null_predicate_rows_not_matched(self, spark, fbase, fqueries):
        """SQL semantics: NULL predicate result is not a match."""
        withnull = fbase.withColumn(
            "label", F.when(F.col("label") == 3, None).otherwise(F.col("label"))
        )
        index = vamana_build(withnull, PARAMS, n_shards=2)
        got = vamana_search(
            index, fqueries, k=5, search_window_size=4096, where="label >= 0"
        )
        bad = withnull.filter(F.col("label").isNull()).select(
            F.col("id").alias("neighbor_id")
        )
        assert got.join(bad, "neighbor_id", "semi").count() == 0


class TestFallbackBelow:
    """fallback_below: tiny filtered pools serve the exact flat scan
    instead of traversing the graph (measured an order of magnitude
    cheaper at ~1% selectivity, tools/stress_filtered.py)."""

    def _count_flat(self, monkeypatch):
        calls = {"n": 0}
        orig = flat_mod.flat_knn

        def wrapper(*a, **kw):
            calls["n"] += 1
            return orig(*a, **kw)

        monkeypatch.setattr(flat_mod, "flat_knn", wrapper)
        return calls

    def test_fallback_triggers_and_is_exact(self, fbase, fqueries, monkeypatch):
        calls = self._count_flat(monkeypatch)
        index = vamana_build(fbase, PARAMS, n_shards=4)
        got = vamana_search(
            index, fqueries, k=5, search_window_size=8,
            where="label = 3", fallback_below=10_000,
        )
        want = flat_mod.flat_knn(
            fbase, fqueries, k=5, distance="l2", round_to=4, where="label = 3"
        )
        assert calls["n"] >= 1
        # exact even at the tiny window the graph path was given
        assert _exact(got) == _exact(want)

    def test_no_fallback_above_threshold(self, fbase, fqueries, monkeypatch):
        calls = self._count_flat(monkeypatch)
        index = vamana_build(fbase, PARAMS, n_shards=4)
        got = vamana_search(
            index, fqueries, k=5, search_window_size=4096,
            where="label = 3", fallback_below=1,
        )
        assert calls["n"] == 0  # pool > 1 -> graph path
        want = flat_mod.flat_knn(
            fbase, fqueries, k=5, distance="l2", round_to=4, where="label = 3"
        )
        assert _exact(got) == _exact(want)  # exhaustive window == exact

    def test_no_fallback_with_exclusions(self, fbase, fqueries, monkeypatch):
        calls = self._count_flat(monkeypatch)
        index = vamana_build(fbase, PARAMS, n_shards=4)
        excl = [int(r["id"]) for r in fbase.filter("label = 3").limit(2).collect()]
        got = vamana_search(
            index, fqueries, k=5, search_window_size=4096,
            where="label = 3", fallback_below=10_000, exclude_ids=excl,
        )
        assert calls["n"] == 0  # exclusions -> graph path only
        assert got.filter(F.col("neighbor_id").isin(excl)).count() == 0

    def test_fallback_with_target_recall_skips_calibration(
        self, fbase, fqueries, monkeypatch
    ):
        index = vamana_build(fbase, PARAMS, n_shards=4, shard_by="kmeans")
        stats: dict = {}
        got = vamana_search(
            index, fqueries, k=5, search_window_size=8, where="label = 3",
            fallback_below=10_000, target_recall=0.95, calibration_stats=stats,
        )
        assert stats == {}  # exact fallback served before any fit
        want = flat_mod.flat_knn(
            fbase, fqueries, k=5, distance="l2", round_to=4, where="label = 3"
        )
        assert _exact(got) == _exact(want)
        index.layout.unpersist()
