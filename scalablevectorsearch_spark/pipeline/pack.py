"""Sequence packing — token-budget sharding for training pipelines.

A trainer consuming a 100 TB corpus wants fixed-token-budget shards
("bins") with a deterministic document -> bin assignment. The greedy
SEQUENTIAL packing used here: walk documents in ascending id order and
assign ``bin_id = floor(tokens_before / token_budget)`` where
``tokens_before`` is the total token count of all lower-id documents.
Every bin carries ~``token_budget`` tokens (a document may straddle its
bin boundary — the standard streaming-shard semantics, documented), and
the assignment depends only on (id order, token counts), never on
partitioning.

Scale shape — the distributed prefix sum (no global-ordered window,
which Spark would execute as ONE partition):
 1. range-partition by id, sort within partitions;
 2. one pass computes per-partition token totals (tiny: P rows to the
    driver);
 3. exclusive per-partition offsets broadcast; a second Arrow pass
    stamps ``offset[pid] + local_exclusive_cumsum`` and the bin id.
Extension surface beyond the reference (BASELINE.json north star), same
class as pipeline/text.py.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    token_budget: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokens_col: str | None = None,
) -> DataFrame:
    """(doc_id, n_tokens, tokens_before, bin_id): deterministic greedy
    sequential packing in ascending id order. ``tokens_col`` supplies
    precomputed counts; otherwise whitespace-token counts are derived
    from ``text_col`` (the same tokenization as text_stats)."""
    if token_budget <= 0:
        raise ValueError("token_budget must be positive")
    # NULL guards: size(split(NULL)) is -1 and a NULL count would decay
    # to NaN in the Arrow pass — either silently skews tokens_before for
    # every later document. NULL text counts like empty text (the
    # text_stats convention); a NULL precomputed count is a caller bug
    # and fails loudly in the stamping pass below.
    if tokens_col is None:
        sel = df.select(
            F.col(id_col).cast("long").alias("doc_id"),
            F.size(F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+"))
            .cast("long")
            .alias("n_tokens"),
        )
    else:
        sel = df.select(
            F.col(id_col).cast("long").alias("doc_id"),
            F.col(tokens_col).cast("long").alias("n_tokens"),
        )
    spark = df.sparkSession
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    parts = (
        sel.repartitionByRange(n_part, F.col("doc_id"))
        .sortWithinPartitions("doc_id")
        .withColumn("__pid", F.spark_partition_id())
    )
    from pyspark.storagelevel import StorageLevel

    parts = parts.persist(StorageLevel.MEMORY_AND_DISK)
    # pass 1: per-partition totals — P tiny rows; offsets are exclusive
    # prefix sums over partitions ordered by their id range
    stats = sorted(
        parts.groupBy("__pid")
        .agg(
            F.sum("n_tokens").alias("tot"),
            F.min("doc_id").alias("mn"),
            F.sum(F.col("n_tokens").isNull().cast("long")).alias("nn"),
        )
        .collect(),
        key=lambda r: r["mn"],
    )
    if any(r["nn"] for r in stats):
        raise ValueError(
            "pack_sequences: NULL token count — a NULL would silently "
            "corrupt the running prefix and shift every later document's "
            "bin_id; clean tokens_col first"
        )
    offsets: dict[int, int] = {}
    run = 0
    for r in stats:
        offsets[int(r["__pid"])] = run
        run += int(r["tot"])
    bc = spark.sparkContext.broadcast(offsets)

    def fn(batches):
        import pyarrow as pa

        local = 0
        for rb in batches:
            if rb.num_rows == 0:
                continue
            if rb.column(1).null_count:
                raise ValueError(
                    "pack_sequences: NULL token count — a NULL would "
                    "silently corrupt the running prefix and shift every "
                    "later document's bin_id; clean tokens_col first"
                )
            ids = rb.column(0).to_numpy(zero_copy_only=False)
            toks = rb.column(1).to_numpy(zero_copy_only=False).astype(np.int64)
            pid = int(rb.column(2)[0].as_py())
            cum = np.cumsum(toks) - toks  # exclusive local prefix
            before = bc.value[pid] + local + cum
            local += int(toks.sum())
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids.astype(np.int64, copy=False), type=pa.int64()),
                    pa.array(toks, type=pa.int64()),
                    pa.array(before, type=pa.int64()),
                    pa.array(before // token_budget, type=pa.int64()),
                ],
                names=["doc_id", "n_tokens", "tokens_before", "bin_id"],
            )

    return parts.mapInArrow(
        fn, "doc_id long, n_tokens long, tokens_before long, bin_id long"
    )
