"""Profiling record for the r6 n-gram build optimization.

Finding (measured at 1M synthetic 100-token docs, local[32]):
 - A Catalyst lambda that captures a NON-ATTRIBUTE subexpression
   re-evaluates it per element: the old word_ngrams built grams with
   ``transform(idx, i -> array_join(slice(split(text), i, n)))`` where
   ``split(text)`` was inline — every gram re-tokenized the whole
   document (~100 splits/doc). Tokenize-only costs 1.4s; the old gram
   build cost ~58s.
 - Projecting tokens to a real column first (``__toks``) and building
   grams with an unrolled ``concat(element_at(i), ' ',
   element_at(i+1))`` drops the gram build to ~3s; the full
   repetition_stats operator drops ~2.3x first-query like-for-like
   (59.9s -> 26s at 1M; host-warm kernels measure down to ~5s).
 - ``array_join(slice(...))`` over a projected attribute is still ~6x
   slower than the unrolled concat (17.9s vs 2.8s): the slice
   materializes a throwaway sub-array per gram.

Consequences in the codebase: curate.word_ngrams_over (attribute-based,
unrolled concat — replaces the trap-prone word_ngrams), dedup.gram_expr
(same unrolling for the SQL-string builders used by shingle_hashes and
decontaminate_exact, slice-fallback for short docs so hashes are
bit-identical).

Usage: python tools/profile_repetition.py [N]  — re-measures the
current operator plus the tokenize-only floor.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from scalablevectorsearch_spark.pipeline.curate import repetition_stats
from scalablevectorsearch_spark.pipeline.dedup import shingle_hashes
from scalablevectorsearch_spark.session import get_spark

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
spark = get_spark("profile-repetition")

docs = spark.range(N).select(
    F.col("id").alias("doc_id"),
    F.array_join(
        F.transform(
            F.sequence(F.lit(0), F.lit(99)),
            lambda p: F.concat(
                F.lit("w"), F.pmod(F.xxhash64(F.col("id") * 1000 + p), F.lit(1000))
            ),
        ),
        " ",
    ).alias("text"),
).persist()
docs.count()


def timed(name, thunk):
    t0 = time.time()
    thunk()
    print(f"{name}: {time.time() - t0:.1f}s", flush=True)


timed(
    "tokenize_only_floor",
    lambda: docs.select(
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long").alias("probe")
    ).agg(F.sum("probe")).collect(),
)
timed(
    "repetition_stats",
    lambda: repetition_stats(docs).agg(F.sum("dup_ngram_frac")).collect(),
)
timed(
    "shingle_hashes",
    lambda: shingle_hashes(docs)
    .select(F.size("shingles").alias("s"))
    .agg(F.sum("s"))
    .collect(),
)
