"""Structured Streaming detection: pages stream -> mentions/triples stream.

The reference is strictly request/response (no streaming semantics,
SURVEY.md §2.5), so this stage is an ADDITION for continuous-crawl
ingestion: readStream over a pages directory (or Kafka on a real
deployment) -> the same mapInPandas detection kernel -> watermarked
tumbling-window mention counts and an append-mode triples sink.

The detection stage is stateless per row, so it composes with streaming
untouched; state lives only in the windowed aggregation (late data
bounded by the watermark).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from redactify_spark.operators.detection import detect_mentions


def stream_pages(spark: SparkSession, path: str,
                 schema=None) -> DataFrame:
    """File-source stream of page rows (one parquet file per micro-batch
    in tests; Kafka/Kinesis source on a real crawl)."""
    from redactify_spark.sources.pages import PAGES_SCHEMA
    return (spark.readStream.schema(schema or PAGES_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(path))


def stream_mentions(pages_stream: DataFrame,
                    id_col: str = "url") -> DataFrame:
    """Streaming mentions: the batch detection stage applied to a
    streaming DataFrame (mapInPandas is streaming-compatible); the
    event-time column rides through as a passthrough column, so no
    stream-stream join is needed downstream."""
    return detect_mentions(pages_stream, id_col=id_col, text_col="text",
                           passthrough=("warc_ts",))


def windowed_mention_counts(pages_stream: DataFrame,
                            window: str = "1 minute",
                            watermark: str = "2 minutes",
                            id_col: str = "url") -> DataFrame:
    """Watermarked tumbling-window counts of mentions per entity type.

    Late pages beyond the watermark are dropped (state bounded)."""
    mentions = stream_mentions(pages_stream, id_col=id_col)
    return (mentions
            .withWatermark("warc_ts", watermark)
            .groupBy(F.window("warc_ts", window).alias("w"),
                     "entity_group")
            .agg(F.count("*").alias("n_mentions"))
            .select(F.col("w.start").alias("window_start"),
                    "entity_group", "n_mentions"))


def stream_triples(spark: SparkSession, src_dir: str, out_dir: str,
                   checkpoint_dir: str, id_col: str = "url"):
    """Continuous-crawl KG ingestion: pages stream -> detection ->
    per-micro-batch triple extraction -> append-mode parquet (Iceberg
    append on a real deployment) via foreachBatch.

    Semantics: a page's mentions all arrive in the page's own batch
    (file source delivers whole files; a page is one row), and triple
    extraction is per-document, so batch-by-batch all_triples equals
    the batch job's output over the union of inputs -- asserted by
    tests/test_streaming.py::test_stream_triples_matches_batch.  Source
    progress rides the checkpoint, so restarts process only new files;
    foreachBatch file appends are at-least-once on mid-batch crashes
    (Iceberg's transactional append, or dedup on (subj,pred,obj,
    prov_doc), restores exactly-once downstream)."""
    from redactify_spark.operators.triples import all_triples

    mentions = stream_mentions(stream_pages(spark, src_dir),
                               id_col=id_col).drop("warc_ts")

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        (all_triples(batch_df, id_col=id_col)
         .write.mode("append").parquet(out_dir))

    return (mentions.writeStream.foreachBatch(write_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())


def run_to_memory_sink(stream_df: DataFrame, name: str,
                       output_mode: str = "append"):
    """Drive a stream into an in-memory table (tests); production sinks
    are Iceberg append / Kafka."""
    return (stream_df.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start())
