"""Streaming sink into the bucketed warehouse (VERDICT r3 #7).

`stream_triples` (detect_stream.py) appends plain parquet -- at-least-
once on mid-batch crashes.  The production sink is the bucketed managed
warehouse (tools/submit_job.py --bucketed-warehouse), so this module
unifies the two: each micro-batch lands in a managed table that is

  - PARTITIONED by batch_id: the foreachBatch writer uses dynamic
    partition OVERWRITE, so a replayed batch (Spark re-runs the last
    uncommitted batch with the SAME batch_id after a crash -- the
    foreachBatch contract) replaces its own partition instead of
    appending duplicates.  That upgrades the sink to exactly-once
    without a transaction log: the partition IS the idempotency key,
    the poor-man's MERGE.  (With an Iceberg runtime the same shape is
    `MERGE INTO` keyed on batch_id, or Iceberg's own idempotent
    overwritePartitions.)
  - BUCKETED by the join key: downstream equi-joins on the key read
    co-partitioned buckets with NO Exchange -- the bucketed scan groups
    each bucket's files ACROSS batch partitions into one task, so the
    shuffle is paid once per micro-batch at write time and never again.

pytest pins: replaying a batch leaves the table byte-identical;
restart-with-new-files processes only the new batch; a join on the
bucket key plans SortMergeJoin with zero Exchange.

Reader note: a replayed batch rewrites its partition with fresh file
names; a session holding a cached file listing for the table must
`REFRESH TABLE` (spark.catalog.refreshTable) before reading across a
replay -- fresh sessions and new scans list files anew and need
nothing.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_log = logging.getLogger(__name__)


def ensure_bucketed_sink_table(spark: SparkSession, like_df: DataFrame,
                               table: str, key: str,
                               n_buckets: int = 8) -> None:
    """Create the partitioned+bucketed sink table if absent (resume
    keeps the existing one -- the streaming checkpoint, not the table,
    decides which batches still need to run)."""
    if spark.catalog.tableExists(table):
        return
    empty = (like_df.limit(0)
             .withColumn("batch_id", F.lit(0).cast("long")))
    (empty.write.partitionBy("batch_id")
     .bucketBy(n_buckets, key).sortBy(key)
     .format("parquet").saveAsTable(table))


def stream_into_bucketed_table(stream_df: DataFrame, table: str, key: str,
                               checkpoint_dir: str,
                               n_buckets: int = 8,
                               transform=None):
    """writeStream -> idempotent bucketed-table sink.

    `transform(batch_df) -> DataFrame` runs inside each micro-batch
    (e.g. triple extraction); its output schema defines the table."""
    # Eager table creation (ADVICE r4): derive the sink schema by
    # running the transform over an EMPTY batch of the stream's schema,
    # so `spark.table(table)` works even when the source has no data on
    # first start (availableNow over an empty dir never invokes
    # foreachBatch).  A transform that cannot evaluate an empty batch
    # falls back to the old lazy first-batch creation -- but the
    # swallowed exception is LOGGED (ADVICE r5): a transform that is
    # genuinely broken (not merely empty-batch-intolerant) should be
    # diagnosable before the first real micro-batch arrives.
    session = stream_df.sparkSession
    try:
        probe = session.createDataFrame([], stream_df.schema)
        out0 = transform(probe) if transform is not None else probe
        ensure_bucketed_sink_table(session, out0, table, key, n_buckets)
    except Exception as exc:
        _log.warning(
            "bucketed sink %s: eager schema probe failed (%s: %s); "
            "falling back to lazy first-batch table creation -- if the "
            "transform is broken this surfaces again at batch 0",
            table, type(exc).__name__, exc)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        # foreachBatch executes on a CLONED session with an isolated
        # SQLConf -- confs and catalog ops must go through the batch
        # frame's own session or the dynamic-overwrite setting is
        # silently ignored (static overwrite then wipes prior batches)
        spark = batch_df.sparkSession
        out = transform(batch_df) if transform is not None else batch_df
        ensure_bucketed_sink_table(spark, out, table, key, n_buckets)
        # dynamic mode: OVERWRITE touches only the batch_id partitions
        # present in this write -- i.e. exactly this batch's partition
        spark.conf.set("spark.sql.sources.partitionOverwriteMode",
                       "dynamic")
        data_cols = [c for c in spark.table(table).columns
                     if c != "batch_id"]
        (out.select(*data_cols)
         .withColumn("batch_id", F.lit(int(batch_id)).cast("long"))
         .write.mode("overwrite").insertInto(table))

    return (stream_df.writeStream.foreachBatch(write_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())


def stream_triples_bucketed(spark: SparkSession, src_dir: str, table: str,
                            checkpoint_dir: str, id_col: str = "url",
                            key: str = "subj", n_buckets: int = 8):
    """Continuous-crawl KG ingestion, production sink shape: pages
    stream -> detection -> per-batch triple extraction -> exactly-once
    append into a subj-bucketed managed table (entity-keyed downstream
    joins read it Exchange-free)."""
    from redactify_spark.operators.triples import all_triples
    from redactify_spark.streaming.detect_stream import (stream_mentions,
                                                         stream_pages)

    mentions = stream_mentions(stream_pages(spark, src_dir),
                               id_col=id_col).drop("warc_ts")
    return stream_into_bucketed_table(
        mentions, table, key, checkpoint_dir, n_buckets=n_buckets,
        transform=lambda b: all_triples(b, id_col=id_col))
