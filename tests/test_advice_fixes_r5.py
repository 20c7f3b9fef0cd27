"""Regression tests for the round-5 ADVICE findings.

1 (medium, pipeline/dedup.py duplicate_spans): positional stride
   sampling misses phase-misaligned duplicates; the docstring used to
   claim completeness for any region >= span_len + stride - 1. Fixed by
   documenting the true (phase-aligned-only) guarantee AND adding
   ``sample="content"`` — hash-mod gram sampling whose keep decision
   depends only on gram content, so every occurrence of a duplicated
   region is caught or none is (no phase condition).
2 (medium, pipeline/curate.py): the PII email pattern was
   lowercase-only, so Bob@Gmail.com leaked through pii_redact. Character
   classes now carry A-Z (explicit ranges — Java regex ∩ RE2 subset).
3 (low, pipeline/dedup.py simhash_neardup): n_bands=1 emitted the
   2^64-1 mask as an unparseable BIGINT literal; a single band is also
   semantically useless (exact-fingerprint equality). Now rejected.
4 (low, operators/leanvec.py _normalized): zero-norm vectors divided
   0/0 into NaN components that silently poisoned the cosine primary
   ranking; the norm is now clamped to the smallest normal double so a
   zero vector stays the zero vector (similarity 0, flat_knn's rule).
5 (low, pipeline/pack.py pack_sequences): NULL text gave size()=-1 and
   a NULL precomputed count decayed to garbage in the Arrow pass —
   either silently shifted every later document's bin_id. NULL text now
   counts like empty text; NULL tokens_col raises.
"""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from scalablevectorsearch_spark.operators.leanvec import _normalized
from scalablevectorsearch_spark.pipeline.curate import pii_redact
from scalablevectorsearch_spark.pipeline.dedup import duplicate_spans, simhash_neardup
from scalablevectorsearch_spark.pipeline.pack import pack_sequences

BOILER = (
    "SUBSCRIBE TO OUR NEWSLETTER TODAY FOR EXCLUSIVE DAILY UPDATES AND "
    "NEVER MISS A SINGLE BREAKING STORY FROM OUR AWARD WINNING NEWSROOM TEAM"
)


@pytest.fixture(scope="module")
def misaligned(spark):
    """Two docs sharing BOILER at offsets that differ by 1 — the
    phase-misaligned case positional stride sampling cannot see."""
    import random

    rng = random.Random(7)

    def junk(n):
        return "".join(rng.choice("abcdefghijklmnopqrstuvwxyz") for _ in range(n))

    return spark.createDataFrame(
        [
            Row(doc_id=1, text=junk(50) + BOILER + junk(50)),
            Row(doc_id=2, text=junk(51) + BOILER + junk(49)),
        ]
    )


class TestDuplicateSpansSampling:
    def test_positional_stride_misses_misaligned(self, misaligned):
        # offsets 51 vs 52 are incongruent mod 3: every sampled gram
        # content differs between the two copies -> no hot hash. This
        # pins the failure mode the old docstring denied.
        res = duplicate_spans(misaligned, span_len=40, stride=3, min_count=2)
        assert res.count() == 0

    def test_content_sampling_catches_misaligned(self, misaligned):
        res = duplicate_spans(
            misaligned, span_len=40, stride=3, min_count=2, sample="content"
        ).collect()
        by_doc = {r["doc_id"]: r for r in res}
        assert set(by_doc) == {1, 2}
        # both spans must land inside the planted boilerplate region
        for doc_id, start in ((1, 51), (2, 52)):
            r = by_doc[doc_id]
            assert r["span_start"] >= start
            assert r["span_end"] <= start + len(BOILER) - 1

    def test_content_equals_positional_at_stride_1(self, misaligned):
        a = duplicate_spans(misaligned, span_len=40, stride=1, min_count=2)
        b = duplicate_spans(
            misaligned, span_len=40, stride=1, min_count=2, sample="content"
        )
        assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))

    def test_bad_sample_mode_rejected(self, misaligned):
        with pytest.raises(ValueError, match="sample"):
            duplicate_spans(misaligned, sample="winnow")


class TestPiiEmailCase:
    def test_mixed_case_email_redacted(self, spark):
        df = spark.createDataFrame(
            [
                Row(doc_id=1, text="contact Bob@Gmail.com or ALICE@EXAMPLE.ORG now"),
                Row(doc_id=2, text="plain bob@gmail.com still works"),
            ]
        )
        rows = {r["doc_id"]: r for r in pii_redact(df).collect()}
        assert rows[1]["clean_text"] == "contact <EMAIL> or <EMAIL> now"
        assert rows[1]["n_email"] == 2
        assert rows[2]["clean_text"] == "plain <EMAIL> still works"
        assert rows[2]["n_email"] == 1


class TestSimhashBands:
    def test_single_band_rejected(self, spark):
        df = spark.createDataFrame([Row(doc_id=1, text="a b c")])
        with pytest.raises(ValueError, match="n_bands"):
            simhash_neardup(df, n_bits=64, n_bands=1)


class TestLeanvecZeroNorm:
    def test_zero_vector_normalizes_to_zero_not_nan(self, spark):
        df = spark.createDataFrame(
            [Row(id=1, vector=[0.0, 0.0, 0.0]), Row(id=2, vector=[3.0, 0.0, 4.0])]
        )
        rows = {r["id"]: r["vector"] for r in _normalized(df, "vector").collect()}
        assert rows[1] == [0.0, 0.0, 0.0]  # not NaN
        assert rows[2] == pytest.approx([0.6, 0.0, 0.8])  # nonzero untouched


class TestPackSequencesNulls:
    def test_null_text_counts_like_empty(self, spark):
        df = spark.createDataFrame(
            [
                Row(doc_id=1, text="a b c"),
                Row(doc_id=2, text=None),
                Row(doc_id=3, text=""),
                Row(doc_id=4, text="d e"),
            ],
            "doc_id long, text string",
        )
        rows = {r["doc_id"]: r for r in pack_sequences(df, token_budget=4).collect()}
        assert rows[2]["n_tokens"] == rows[3]["n_tokens"]  # NULL == empty
        # downstream prefix is exactly replayable from the counts
        run = 0
        for i in (1, 2, 3, 4):
            assert rows[i]["tokens_before"] == run
            assert rows[i]["bin_id"] == run // 4
            run += rows[i]["n_tokens"]

    def test_null_token_count_raises(self, spark):
        df = spark.createDataFrame(
            [Row(doc_id=1, n=5), Row(doc_id=2, n=None), Row(doc_id=3, n=2)],
            "doc_id long, n long",
        )
        with pytest.raises(Exception, match="NULL token count"):
            pack_sequences(df, token_budget=4, tokens_col="n").collect()
