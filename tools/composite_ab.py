"""A/B equivalence check for the r13 shared-signature composite: the
old composite body (independent signature derivations inside
dedup_minhash / decontaminate) vs the new one (one shared signature
table) must produce the IDENTICAL final kept set and pack aggregate.

Usage: python tools/composite_ab.py [sf_dir ...]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from scalablevectorsearch_spark.pipeline.curate import (
    quality_filter,
    repetition_stats,
)
from scalablevectorsearch_spark.pipeline.dedup import (
    decontaminate,
    dedup_exact,
    dedup_minhash,
    minhash_signature,
    shingle_hashes,
)
from scalablevectorsearch_spark.pipeline.pack import pack_sequences
from scalablevectorsearch_spark.pipeline.text import lang_id, text_stats
from scalablevectorsearch_spark.session import get_spark


def composite_kept(docs, shared: bool):
    decisions = quality_filter(
        text_stats(docs), repetition_stats(docs, n=2), lang_id(docs)
    )
    kept = docs.join(decisions.filter("keep").select("doc_id"), "doc_id")
    kept = kept.join(
        dedup_exact(kept).filter("is_dup").select("doc_id"), "doc_id", "left_anti"
    )
    if shared:
        signed = minhash_signature(shingle_hashes(kept, 3), 16).persist(
            StorageLevel.MEMORY_AND_DISK
        )
        near = dedup_minhash(
            kept, n_shingle=3, n_perm=16, n_bands=4, threshold=0.5,
            signatures=signed,
        ).select(F.col("doc_b").alias("doc_id"))
    else:
        signed = None
        near = dedup_minhash(
            kept, n_shingle=3, n_perm=16, n_bands=4, threshold=0.5
        ).select(F.col("doc_b").alias("doc_id"))
    kept = kept.join(near.distinct(), "doc_id", "left_anti")
    probes = docs.filter(F.col("doc_id") % 29 == 0).select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"), "text"
    )
    if shared:
        # the signature table of the PRE-near-dedup survivors defines
        # the screened corpus: extra flagged ids are exactly the
        # near-dups the following anti-join already removed
        contaminated = decontaminate(
            kept, probes, n_shingle=3, n_perm=16, n_bands=4, threshold=0.5,
            corpus_signatures=signed,
        ).select("doc_id")
    else:
        contaminated = decontaminate(
            kept, probes, n_shingle=3, n_perm=16, n_bands=4, threshold=0.5
        ).select("doc_id")
    kept = kept.join(contaminated.distinct(), "doc_id", "left_anti")
    return kept


def main() -> None:
    sf_dirs = sys.argv[1:] or ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]
    spark = get_spark("composite-ab")
    for sf in sf_dirs:
        docs = spark.read.parquet(f"{sf}/documents.parquet").select("doc_id", "text")
        docs.cache()
        docs.count()
        results = {}
        for shared in (False, True):
            spark.catalog.clearCache()
            docs.cache().count()
            kept = composite_kept(docs, shared)
            ids = sorted(r["doc_id"] for r in kept.select("doc_id").collect())
            agg = pack_sequences(kept, token_budget=4096).agg(
                F.max("bin_id"), F.sum("n_tokens")
            ).collect()
            results[shared] = (ids, [tuple(r) for r in agg])
        same_ids = results[False][0] == results[True][0]
        same_agg = results[False][1] == results[True][1]
        print(
            f"{sf}: kept_ids_equal={same_ids} ({len(results[False][0])} docs) "
            f"agg_equal={same_agg} agg={results[True][1]}"
        )
        assert same_ids and same_agg, f"MISMATCH at {sf}"
    print("COMPOSITE A/B: identical")


if __name__ == "__main__":
    main()
