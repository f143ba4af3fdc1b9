"""Bucketed co-located joins: no Exchange in the joined plan."""

import pytest
from pyspark.sql import functions as F

from redactify_spark.operators import bucketing as B


def test_bucketed_join_eliminates_shuffle(spark):
    left = spark.range(0, 2000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("a"))
    right = spark.range(0, 2000).select(
        F.col("id").alias("k"), (F.col("id") % 11).alias("b"))
    B.write_bucketed(left, "t_left", "k", n_buckets=8)
    B.write_bucketed(right, "t_right", "k", n_buckets=8)
    joined = B.bucketed_join(spark, "t_left", "t_right", "k")
    assert joined.count() == 2000
    assert not B.plan_has_exchange(joined), "bucketed join still shuffles"
    # contrast: the same join on unbucketed frames DOES shuffle
    plain = left.hint("merge").join(right.hint("merge"), "k")
    assert B.plan_has_exchange(plain)
