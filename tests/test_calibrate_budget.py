"""Recall-targeted probe-budget / closure-amplification calibration
(r7) — the reference's calibrate.h:249 binary-search-to-target-recall
applied to the probe-cost axis (operators/calibrate.py), plus the
ivf_search(target_recall=...) convenience that fits the budget
internally on a deterministic qid sample.
"""

import pytest
from pyspark.sql import Row

from scalablevectorsearch_spark.operators.calibrate import (
    calibrate_closure_amplification,
    calibrate_probe_budget,
)
from scalablevectorsearch_spark.operators.flat import flat_knn
from scalablevectorsearch_spark.operators.ivf import ivf_build, ivf_search
from scalablevectorsearch_spark.operators.recall import k_recall_at

K = 10


@pytest.fixture(scope="module")
def gt(spark):
    return spark.createDataFrame(
        [Row(qid=0, rank=r, neighbor_id=r) for r in range(1, K + 1)]
    )


def _search_model(spark, hits_of):
    """search_fn whose recall at budget b is hits_of(b)/K — a
    deterministic monotone recall model."""

    def fn(budget):
        h = hits_of(budget)
        return spark.createDataFrame(
            [Row(qid=0, rank=r, neighbor_id=r if r <= h else 1000 + r)
             for r in range(1, K + 1)]
        )

    return fn


class TestCalibrateProbeBudget:
    def test_finds_smallest_passing_budget(self, spark, gt):
        # recall(b) = min(10, floor(2b)) / 10 -> first b with recall >= 0.9
        # on the 0.25 grid is 4.5
        fn = _search_model(spark, lambda b: min(K, int(2 * b)))
        res = calibrate_probe_budget(fn, gt, K, target_recall=0.9, max_budget=8.0)
        assert res.probe_budget == 4.5
        assert res.recall >= 0.9
        # every evaluated point is on the resolution grid
        assert all(abs(b / 0.25 - round(b / 0.25)) < 1e-9 for b, _ in res.probes)

    def test_best_effort_when_target_unreachable(self, spark, gt):
        fn = _search_model(spark, lambda b: min(K, int(2 * b)))
        res = calibrate_probe_budget(fn, gt, K, target_recall=0.9, max_budget=2.0)
        assert res.probe_budget == 2.0
        assert res.recall == pytest.approx(0.4)
        assert len(res.probes) == 1  # one probe proves max misses

    def test_log_probe_count(self, spark, gt):
        calls = []
        base = _search_model(spark, lambda b: min(K, int(2 * b)))

        def fn(b):
            calls.append(b)
            return base(b)

        calibrate_probe_budget(fn, gt, K, target_recall=0.9, max_budget=16.0)
        # grid of 64 steps -> 1 + ceil(log2(~61)) <= 8 evaluations
        assert len(calls) <= 8

    def test_requires_max_budget(self, spark, gt):
        with pytest.raises(ValueError):
            calibrate_probe_budget(lambda b: None, gt, K, max_budget=None)


class TestCalibrateClosure:
    def test_picks_smallest_passing_rung(self, spark, gt):
        # recall 0.5 at amp 1.0, 0.8 at 1.25, 0.95 at >= 1.5
        table = {1.0: 5, 1.25: 8, 1.5: 10, 2.0: 10, 3.0: 10}
        builds = []

        def build_search(amp):
            builds.append(amp)
            return _search_model(spark, lambda b: table[amp])(0)

        res = calibrate_closure_amplification(
            build_search, gt, K, target_recall=0.9
        )
        assert res.amplification == 1.5
        assert res.recall >= 0.9
        assert len(builds) <= 4  # binary search over 5 rungs, not a sweep

    def test_rejects_unsorted_ladder(self, spark, gt):
        with pytest.raises(ValueError):
            calibrate_closure_amplification(
                lambda a: None, gt, K, ladder=(2.0, 1.0)
            )


class TestIvfTargetRecall:
    @pytest.fixture(scope="class")
    def fixture(self, spark, embeddings):
        base = embeddings.selectExpr("vec_id as id", "embedding as vector")
        q = embeddings.selectExpr("vec_id as qid", "embedding as vector").limit(32)
        index = ivf_build(base, n_clusters=6, n_iters=2)
        return base, q, index

    def test_hits_target_on_calibration_sample(self, fixture):
        base, q, index = fixture
        res = ivf_search(index, q, k=K, target_recall=0.9, calibration_queries=32)
        gt = flat_knn(base, q, k=K, round_to=4)
        row = k_recall_at(gt, res, K).collect()[0]
        # calibration covered all 32 queries -> target holds exactly
        assert row["recall"] >= 0.9

    def test_deterministic(self, fixture):
        _, q, index = fixture
        a = ivf_search(index, q, k=K, target_recall=0.9).toPandas()
        b = ivf_search(index, q, k=K, target_recall=0.9).toPandas()
        cols = ["qid", "rank", "neighbor_id"]
        assert a[cols].sort_values(cols).values.tolist() == \
            b[cols].sort_values(cols).values.tolist()

    def test_mutually_exclusive(self, fixture):
        _, q, index = fixture
        with pytest.raises(ValueError):
            ivf_search(index, q, k=K, target_recall=0.9, probe_budget=2.0)
        with pytest.raises(ValueError):
            ivf_search(index, q, k=K, target_recall=0.9, epsilon_bp=100)
        with pytest.raises(ValueError):
            ivf_search(index, q, k=K, target_recall=1.5)


class TestVamanaTargetRecall:
    @pytest.fixture(scope="class")
    def fixture(self, spark, embeddings):
        from scalablevectorsearch_spark.operators.vamana import (
            VamanaParams,
            vamana_build,
        )

        base = embeddings.selectExpr("vec_id as id", "embedding as vector")
        q = embeddings.selectExpr("vec_id as qid", "embedding as vector").limit(24)
        index = vamana_build(
            base, VamanaParams(graph_max_degree=16, window_size=32),
            n_shards=4, shard_by="kmeans",
        )
        return base, q, index

    def test_hits_target_on_calibration_sample(self, fixture):
        from scalablevectorsearch_spark.operators.vamana import vamana_search

        base, q, index = fixture
        res = vamana_search(
            index, q, k=K, search_window_size=32, target_recall=0.9,
            calibration_queries=24,
        )
        gt = flat_knn(base, q, k=K, round_to=4)
        row = k_recall_at(gt, res, K).collect()[0]
        assert row["recall"] >= 0.9

    def test_requires_kmeans_sharding(self, spark, embeddings):
        from scalablevectorsearch_spark.operators.vamana import (
            VamanaParams,
            vamana_build,
            vamana_search,
        )

        base = embeddings.selectExpr("vec_id as id", "embedding as vector").limit(300)
        q = embeddings.selectExpr("vec_id as qid", "embedding as vector").limit(4)
        hashed = vamana_build(
            base, VamanaParams(graph_max_degree=16, window_size=16), n_shards=2
        )
        with pytest.raises(ValueError):
            vamana_search(hashed, q, k=3, target_recall=0.9)

    def test_mutually_exclusive(self, fixture):
        from scalablevectorsearch_spark.operators.vamana import vamana_search

        _, q, index = fixture
        with pytest.raises(ValueError):
            vamana_search(index, q, k=K, target_recall=0.9, n_probes=2)
        with pytest.raises(ValueError):
            vamana_search(index, q, k=K, target_recall=0.9, probe_budget=2.0)
