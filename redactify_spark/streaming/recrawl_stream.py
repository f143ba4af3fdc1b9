"""Online recrawl-delta classification: the batch crawl diff
(operators/urls.crawl_delta) as an exactly-once stream.

A continuous crawler emits recrawled pages as they land; the KG
pipeline wants each page classified against the LAST ACCEPTED snapshot
(unchanged / touched / modified / added) the moment it arrives, so
downstream detection consumes only the changed slice without waiting
for a full-crawl barrier.

Shape: foreachBatch through streaming/bucket_sink.stream_into_bucketed
_table -- the batch transform signatures the micro-batch (Arrow numpy
fold), full-outer-joins it against the STATIC signature ledger
(re-read per batch from the path, so a ledger refresh between batches
is picked up), and keeps only urls PRESENT in the batch: a stream is a
partial crawl, so absence means "not recrawled yet", never "removed"
(removal verdicts need a full-snapshot barrier -- that is the batch
plan's job, plans/recrawl.append_snapshot(full_snapshot=True)).

Exactly-once: inherited from the bucketed sink (batch_id partition =
idempotency key; a replayed micro-batch dynamically overwrites its own
partition byte-identically).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def recrawl_delta_stream(pages_stream: DataFrame, ledger_sig_path: str,
                         table: str, checkpoint_dir: str,
                         url_col: str = "url", text_col: str = "text",
                         near_hamming: int = 3, n_buckets: int = 8):
    """pages stream -> bucketed table of (url, status, hamming) deltas
    vs the signature ledger at `ledger_sig_path`.  Returns the
    StreamingQuery."""
    from redactify_spark.operators.urls import (delta_from_signatures,
                                                snapshot_signature)
    from redactify_spark.streaming.bucket_sink import \
        stream_into_bucketed_table

    def classify(batch_df: DataFrame) -> DataFrame:
        spark = batch_df.sparkSession
        old_sig = spark.read.parquet(ledger_sig_path)
        new_sig = snapshot_signature(batch_df, url_col, text_col)
        return (delta_from_signatures(old_sig, new_sig,
                                      near_hamming=near_hamming)
                .where(F.col("status") != "removed"))

    return stream_into_bucketed_table(
        pages_stream, table, key="url", checkpoint_dir=checkpoint_dir,
        n_buckets=n_buckets, transform=classify)
