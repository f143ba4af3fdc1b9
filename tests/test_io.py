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
