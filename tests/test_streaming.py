"""Structured Streaming detection stage (availableNow trigger, memory
sink) -- beyond-reference addition; batch/stream parity asserted."""

import pytest

from redactify_spark.operators.detection import detect_mentions
from redactify_spark.sources.pages import synth_pages
from redactify_spark.streaming import detect_stream as DS


@pytest.fixture(scope="module")
def pages_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("pages_stream"))
    # several files -> several micro-batches (maxFilesPerTrigger=1)
    synth_pages(spark, 60, partitions=3).write.mode("overwrite").parquet(d)
    return d


def test_stream_mentions_matches_batch(spark, pages_dir):
    stream = DS.stream_pages(spark, pages_dir)
    assert stream.isStreaming
    q = DS.run_to_memory_sink(DS.stream_mentions(stream), "m_stream")
    q.awaitTermination(120)
    got = {(r.url, r.entity_group, r.start, r.end)
           for r in spark.sql("select * from m_stream").collect()}
    batch = detect_mentions(spark.read.parquet(pages_dir),
                            id_col="url", text_col="text",
                            passthrough=("warc_ts",))
    want = {(r.url, r.entity_group, r.start, r.end)
            for r in batch.collect()}
    assert got == want and got


def test_windowed_counts_with_watermark(spark, pages_dir):
    stream = DS.stream_pages(spark, pages_dir)
    agg = DS.windowed_mention_counts(stream, window="1 minute",
                                     watermark="2 minutes")
    q = (agg.writeStream.format("memory").queryName("w_counts")
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(120)
    rows = spark.sql("select * from w_counts").collect()
    assert rows
    assert {r.entity_group for r in rows} >= {"PERSON", "EMAIL_ADDRESS"}
    # windows align to the minute and counts are positive
    assert all(r.window_start.second == 0 and r.n_mentions > 0
               for r in rows)


def test_stateful_entity_registry(spark, pages_dir, tmp_path):
    """applyInPandasWithState: each pseudo_key emitted exactly once across
    micro-batches (maxFilesPerTrigger=1 -> multiple batches)."""
    from redactify_spark.streaming.stateful import entity_registry_stream

    stream = DS.stream_pages(spark, pages_dir)
    mentions = DS.stream_mentions(stream).drop("warc_ts")
    reg = entity_registry_stream(mentions)
    q = (reg.writeStream.format("memory").queryName("registry")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(180)
    rows = spark.sql("select * from registry").collect()
    keys = [r.pseudo_key for r in rows]
    assert len(keys) == len(set(keys)), "a key was emitted twice"
    batch = detect_mentions(spark.read.parquet(pages_dir),
                            id_col="url", text_col="text")
    expected_keys = {r.pseudo_key for r in
                     batch.select("pseudo_key").distinct().collect()}
    assert set(keys) == expected_keys
