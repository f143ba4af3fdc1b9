"""Bucketed-table co-located joins: the shuffle-elimination strategy for
repeated large-large joins at 100 TB.

The KG pipeline joins mentions-shaped tables on the same keys over and
over (doc key for co-mention joins, pseudo_key for canonicalization
lookups).  Writing both sides bucketed by the join key with the same
bucket count lets Spark plan a SortMergeJoin with NO Exchange on either
side -- the shuffle is paid once at write time and amortized across
every later join.  (Iceberg's bucket(n, col) partition transform plays
the same role via storage-partitioned joins; this module is the
Spark-managed-table variant that works in the sandbox.)

tests/test_bucketing.py asserts the Exchange nodes are absent from the
physical plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, key: str,
                   n_buckets: int = 16, sort: bool = True) -> None:
    """Materialize df as a bucketed (and bucket-sorted) managed table."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # an orphaned location (e.g. from a killed run) blocks managed-table
    # creation -- clear it
    import shutil
    wh = spark.conf.get("spark.sql.warehouse.dir", "").removeprefix("file:")
    if wh:
        shutil.rmtree(f"{wh}/{table.split('.')[-1]}", ignore_errors=True)
    w = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  key: str, force_smj: bool = True) -> DataFrame:
    """Join two same-bucketed tables on their bucket key.  With matching
    bucket specs Catalyst plans SortMergeJoin without Exchange.

    force_smj adds merge hints: on small test tables the planner would
    otherwise broadcast (and skip bucketed reads entirely); at the scale
    this exists for, neither side is broadcastable and SMJ is what you
    get anyway."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    if force_smj:
        left, right = left.hint("merge"), right.hint("merge")
    return left.join(right, key)


def plan_has_exchange(df: DataFrame) -> bool:
    """True if the physical plan shuffles (used by tests and plan audits)."""
    import contextlib
    import io
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return "Exchange" in buf.getvalue()
