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


def test_stream_triples_matches_batch(spark, pages_dir, tmp_path):
    """Streaming triple ingestion (foreachBatch append) over several
    micro-batches equals the batch pipeline over the same pages; a
    restart with a new tranche appends only the new pages' triples."""
    from redactify_spark.operators.triples import all_triples

    out = str(tmp_path / "triples_out")
    ckpt = str(tmp_path / "triples_ckpt")
    q = DS.stream_triples(spark, pages_dir, out, ckpt)
    q.awaitTermination(180)
    got = {tuple(r) for r in
           spark.read.parquet(out)
           .select("subj", "pred", "obj", "prov_doc").collect()}
    batch = all_triples(
        detect_mentions(spark.read.parquet(pages_dir),
                        id_col="url", text_col="text"), id_col="url")
    want = {tuple(r) for r in
            batch.select("subj", "pred", "obj", "prov_doc").collect()}
    assert got == want and got

    # restart with no new files: nothing is reprocessed or re-appended
    n_before = spark.read.parquet(out).count()
    q2 = DS.stream_triples(spark, pages_dir, out, ckpt)
    q2.awaitTermination(180)
    assert spark.read.parquet(out).count() == n_before


def test_stateful_registry_survives_restart(spark, tmp_path):
    """State-store recovery: stop the registry stream after the first
    tranche of files, append a second tranche, RESTART from the same
    checkpoint -- first-sightings must stay exactly-once across the
    restart (keys emitted before the crash are not re-emitted; new keys
    are)."""
    from redactify_spark.streaming.stateful import entity_registry_stream

    src = str(tmp_path / "pages")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "registry_out")
    synth_pages(spark, 24, partitions=2).write.mode("overwrite").parquet(src)

    def run():
        # fault-tolerant file sink (the memory sink cannot recover from a
        # checkpoint); each restart resumes source offsets AND state
        stream = DS.stream_pages(spark, src)
        mentions = DS.stream_mentions(stream).drop("warc_ts")
        reg = entity_registry_stream(mentions)
        q = (reg.writeStream.format("parquet")
             .option("path", out)
             .option("checkpointLocation", ckpt)
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(180)
        return [r.pseudo_key for r in spark.read.parquet(out).collect()]

    first = set(run())
    assert first, "first run emitted nothing"

    # "crash" happened; a second crawl tranche lands (docs 24..47: they
    # share many entities with the first tranche plus some new ones)
    seen_urls = synth_pages(spark, 24, partitions=2).select("url")
    synth_pages(spark, 48, partitions=2) \
        .join(seen_urls, "url", "left_anti") \
        .write.mode("append").parquet(src)

    all_emitted = run()
    assert len(all_emitted) == len(set(all_emitted)), \
        "a key emitted before the restart was re-emitted after it"
    batch = detect_mentions(spark.read.parquet(src),
                            id_col="url", text_col="text")
    all_keys = {r.pseudo_key for r in
                batch.select("pseudo_key").distinct().collect()}
    assert set(all_emitted) == all_keys
    assert set(all_emitted) - first, "second tranche added no new keys"
