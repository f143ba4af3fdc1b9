"""Table IO: parquet fallback path with bucket repartitioning."""

from redactify_spark.sources import io as IO


def test_iceberg_not_available(spark):
    assert IO.iceberg_available(spark) is False


def test_write_read_roundtrip(spark, tmp_path):
    df = spark.range(100).selectExpr("id", "concat('u', id % 7) as url")
    target = str(tmp_path / "t")
    IO.write_table(df, target, bucket_col="url", n_buckets=4)
    back = IO.read_table(spark, target)
    assert back.count() == 100
    assert {r.url for r in back.select("url").distinct().collect()} == \
        {f"u{i}" for i in range(7)}


def test_compact_table_preserves_content(spark, tmp_path):
    from redactify_spark.sources.io import compact_table
    p = str(tmp_path / "frag")
    df = spark.range(0, 10_000).withColumnRenamed("id", "v")
    df.repartition(64).write.parquet(p)
    import os
    before = sum(f.endswith(".parquet")
                 for _, _, fs in os.walk(p) for f in fs)
    assert before == 64
    h_before = sorted(r.v for r in spark.read.parquet(p).collect())
    stats = compact_table(spark, p, target_file_bytes=1 << 30)
    assert stats["files_before"] == 64 and stats["files_after"] == 1
    assert sorted(r.v for r in spark.read.parquet(p).collect()) == h_before


def test_compact_table_recovers_from_crashed_swap(spark, tmp_path):
    """A crash between the two swap renames leaves the table in trash;
    the next invocation restores it before compacting."""
    import os
    import shutil

    from redactify_spark.sources.io import compact_table
    p = str(tmp_path / "t")
    spark.range(0, 100).withColumnRenamed("id", "v") \
        .repartition(8).write.parquet(p)
    # simulate the crash window: table renamed to trash, no new table
    os.rename(p, p + "__compact_trash")
    assert not os.path.exists(p)
    stats = compact_table(spark, p, target_file_bytes=1 << 30)
    assert stats["files_after"] == 1
    assert spark.read.parquet(p).count() == 100
    assert not os.path.exists(p + "__compact_trash")


def test_compact_table_rejects_remote_scheme(spark):
    import pytest
    from redactify_spark.sources.io import compact_table
    with pytest.raises(ValueError, match="local paths"):
        compact_table(spark, "s3a://bucket/table")
    with pytest.raises(ValueError, match="local paths"):
        compact_table(spark, "hdfs://nn:8020/warehouse/t")


def test_incremental_schema_evolution_merge(spark, tmp_path):
    """A later tranche adds a column: mergeSchema reads the union table
    with NULLs for the old tranche -- the crawl-pipeline reality when a
    new extractor field appears mid-corpus."""
    d = str(tmp_path / "tranches")
    spark.createDataFrame([(1, "a")], "id long, text string") \
        .write.parquet(f"{d}/t0")
    spark.createDataFrame([(2, "b", "en")],
                          "id long, text string, lang string") \
        .write.parquet(f"{d}/t1")
    merged = (spark.read.option("mergeSchema", "true")
              .parquet(f"{d}/t0", f"{d}/t1"))
    rows = {r.id: (r.text, r.lang) for r in merged.collect()}
    assert rows == {1: ("a", None), 2: ("b", "en")}
    assert set(merged.columns) == {"id", "text", "lang"}
