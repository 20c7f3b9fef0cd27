"""Structured Streaming k-NN — continuous query batches against a
static (or upsert-log-backed) vector table.

Parity note: the reference is batch-only; its closest analog is the
BatchIterator re-entering ``search`` per page (iterator.h:77-134).
This is the Spark-native continuation: a stream of query vectors is
answered micro-batch by micro-batch with the SAME flat_knn operator
the batch path uses (one base scan per micro-batch, broadcast query
chunk, bounded merge), so streaming results are definitionally
consistent with batch results.

Scale shape: ``foreachBatch`` turns each micro-batch into one ordinary
batch k-NN job — the base side stays a cached/bucketed table across
batches, the query side is the (small) micro-batch. Watermarking and
late-data policy belong to the SOURCE (event-time filtering before the
search); the search itself is stateless, so there is no streaming
state store to size."""

from __future__ import annotations

from pyspark.sql import DataFrame

QUERY_STREAM_SCHEMA = "qid long, vector array<float>"


def stream_queries(spark, src_dir: str) -> DataFrame:
    """File-source stream of query vectors: (qid, vector)."""
    return spark.readStream.schema(QUERY_STREAM_SCHEMA).parquet(src_dir)


def stream_knn(
    base: DataFrame,
    query_stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    k: int = 10,
    distance: str = "l2",
    await_done: bool = True,
    search_fn=None,
    **search_kwargs,
):
    """Answer a query stream against ``base``: every micro-batch runs
    flat_knn(base, micro_batch) and appends (qid, rank, neighbor_id,
    distance) to ``out_dir``. Returns the streaming query handle.

    ``search_fn``: optional engine override — a callable
    ``(queries_df, k) -> result DataFrame`` closing over a prebuilt
    index (e.g. ``lambda q, k: vamana_search(idx, q, k, ...)`` or an
    ``ivf_search`` partial), so ANY index family serves the stream
    with the identical operator it serves batch queries; default =
    flat scan against ``base``.

    ``availableNow`` semantics when ``await_done`` — drain what exists
    and stop (the testable mode); drop ``await_done`` for a continuous
    trigger in production."""
    from scalablevectorsearch_spark.operators.flat import flat_knn

    def answer(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if search_fn is not None:
            res = search_fn(batch_df, k)
        else:
            res = flat_knn(
                base, batch_df, k=k, distance=distance, qid_col="qid",
                qvec_col="vector", **search_kwargs,
            )
        res.write.mode("append").parquet(out_dir)

    q = (
        query_stream.writeStream.foreachBatch(answer)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    if await_done:
        q.awaitTermination()
    return q
