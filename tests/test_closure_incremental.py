"""closure_link_replicas — incremental closure build.

Upgrades a plain kmeans-sharded Vamana index to a SPANN-closure index
by insert-linking only the replica rows (dynamic_index.h:631-700 insert
path) instead of rebuilding each shard over base+replicas. The graph is
NOT bit-identical to the batch closure build (reverse-edge timing
differs), so the contracts tested are: identical layout, exactness at
an exhaustive window, and routed recall parity with the batch build.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from scalablevectorsearch_spark.operators.flat import flat_knn
from scalablevectorsearch_spark.operators.recall import k_recall_at
from scalablevectorsearch_spark.operators.vamana import (
    VamanaParams,
    closure_link_replicas,
    vamana_build,
    vamana_search,
)

PARAMS = VamanaParams(graph_max_degree=24, window_size=24)
CLOSURE_BP = 5000


@pytest.fixture(scope="module")
def cbase(spark, embeddings):
    base = embeddings.selectExpr("vec_id as id", "embedding as vector").limit(
        1200
    ).cache()
    base.count()
    yield base
    base.unpersist()


@pytest.fixture(scope="module")
def cqueries(embeddings):
    return embeddings.selectExpr("vec_id as qid", "embedding as vector").limit(20)


@pytest.fixture(scope="module")
def plain_index(cbase):
    return vamana_build(cbase, PARAMS, n_shards=6, shard_by="kmeans")


@pytest.fixture(scope="module")
def incr_index(plain_index):
    return closure_link_replicas(plain_index, CLOSURE_BP)


@pytest.fixture(scope="module")
def batch_index(cbase, plain_index):
    # same shard_model so the two closure layouts are identical
    return vamana_build(
        cbase, PARAMS, n_shards=6, shard_by="kmeans",
        closure_bp=CLOSURE_BP, shard_model=plain_index.shard_model,
    )


class TestLayoutParity:
    def test_same_replication(self, incr_index, batch_index):
        """Same shard_model + closure_bp => byte-identical layouts."""
        a = incr_index.layout.groupBy("shard_id").count().orderBy("shard_id")
        b = batch_index.layout.groupBy("shard_id").count().orderBy("shard_id")
        assert [tuple(r) for r in a.collect()] == [tuple(r) for r in b.collect()]

    def test_amplification_positive(self, incr_index, cbase):
        n = cbase.count()
        assert incr_index.layout.count() > n  # replicas actually exist

    def test_graph_covers_every_layout_row(self, incr_index):
        g = incr_index.graph.select("shard_id", F.col("src").alias("__id"))
        missing = incr_index.layout.select("shard_id", "__id").join(
            g, ["shard_id", "__id"], "left_anti"
        )
        assert missing.count() == 0

    def test_one_entry_per_shard(self, incr_index):
        per = (
            incr_index.graph.groupBy("shard_id")
            .agg(F.sum(F.col("is_entry").cast("int")).alias("n"))
            .collect()
        )
        assert per and all(r["n"] == 1 for r in per)


class TestSearchContracts:
    def test_exhaustive_window_is_exact(self, incr_index, cbase, cqueries):
        got = vamana_search(incr_index, cqueries, k=5, search_window_size=4096)
        want = flat_knn(cbase, cqueries, k=5, round_to=4)
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, want.collect())
        )

    def test_routed_recall_parity_with_batch(
        self, incr_index, batch_index, cbase, cqueries
    ):
        """At the same routed budget, the insert-linked closure graph
        must recall within a small delta of the batch-built one."""
        gt = flat_knn(cbase, cqueries, k=5, round_to=4)
        kw = dict(k=5, search_window_size=32, probe_budget=2.0)
        r_incr = k_recall_at(
            gt, vamana_search(incr_index, cqueries, **kw), 5
        ).collect()[0]["recall"]
        r_batch = k_recall_at(
            gt, vamana_search(batch_index, cqueries, **kw), 5
        ).collect()[0]["recall"]
        assert r_incr >= r_batch - 0.05, (r_incr, r_batch)
        assert r_incr >= 0.8, r_incr

    def test_deterministic(self, plain_index, cqueries):
        a = closure_link_replicas(plain_index, CLOSURE_BP)
        b = closure_link_replicas(plain_index, CLOSURE_BP)
        ga = sorted(
            (r["shard_id"], r["src"], tuple(r["neighbors"]), r["is_entry"])
            for r in a.graph.collect()
        )
        gb = sorted(
            (r["shard_id"], r["src"], tuple(r["neighbors"]), r["is_entry"])
            for r in b.graph.collect()
        )
        assert ga == gb


class TestValidation:
    def test_requires_kmeans(self, cbase):
        idx = vamana_build(cbase, PARAMS, n_shards=4)  # hash-sharded
        with pytest.raises(ValueError, match="kmeans"):
            closure_link_replicas(idx, CLOSURE_BP)

    def test_rejects_double_closure(self, incr_index):
        with pytest.raises(ValueError, match="already"):
            closure_link_replicas(incr_index, CLOSURE_BP)

    def test_rejects_nonpositive_bp(self, plain_index):
        with pytest.raises(ValueError, match="positive"):
            closure_link_replicas(plain_index, 0)
