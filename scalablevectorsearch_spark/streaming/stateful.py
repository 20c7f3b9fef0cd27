"""Custom stateful streaming operators — cross-batch exact dedup via
``applyInPandasWithState``.

The LLM-pipeline continuation of pipeline/dedup.py for CONTINUOUS
ingest: a document stream is deduplicated against everything seen so
far, not just the current micro-batch. State is keyed by content hash;
each key stores the first-seen doc id, so the operator emits exactly
one row per distinct content with ``is_dup`` marking later arrivals.

Scale shape: state lives in the state store partitioned by the hash key
(the same key the batch dedup shuffles on); per-key state is O(1)
(canonical id + count), so total state is bounded by the number of
DISTINCT documents, never the stream length."""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "content_hash string, doc_id long, canonical_id long, is_dup boolean"
STATE_SCHEMA = "canonical_id long, n_seen long"


def _dedup_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        canonical, n_seen = state.get
    else:
        canonical, n_seen = None, 0
    rows: list[dict[str, Any]] = []
    for pdf in pdfs:
        for _, r in pdf.sort_values("doc_id").iterrows():
            doc_id = int(r["doc_id"])
            if canonical is None:
                canonical = doc_id
            rows.append(
                {
                    "content_hash": key[0],
                    "doc_id": doc_id,
                    "canonical_id": canonical,
                    "is_dup": doc_id != canonical,
                }
            )
            n_seen += 1
    state.update((canonical, n_seen))
    yield pd.DataFrame(rows, columns=["content_hash", "doc_id", "canonical_id", "is_dup"])


def streaming_dedup(stream: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Continuous exact dedup: (content_hash, doc_id, canonical_id,
    is_dup) where canonical is the first doc ever seen with that
    content — across micro-batches, via keyed state."""
    hashed = stream.select(
        F.md5(F.col(text_col)).alias("content_hash"),
        F.col(id_col).cast("long").alias("doc_id"),
    )
    return hashed.groupBy("content_hash").applyInPandasWithState(
        _dedup_fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_streaming_dedup(
    spark, src_dir: str, out_dir: str, checkpoint_dir: str
) -> None:
    """Drain a parquet doc stream (doc_id, text) through the stateful
    dedup into an output sink."""
    stream = spark.readStream.schema("doc_id long, text string").parquet(src_dir)
    out = streaming_dedup(stream)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("append").parquet(out_dir)

    q = (
        out.writeStream.outputMode("append")
        .foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
