"""Deterministic sequential ID assignment (two-phase zipWithIndex)."""

from pyspark.sql import functions as F

from redactify_spark.operators.ids import assign_sequential_ids


def test_ids_match_global_order_any_partitioning(spark):
    import random
    rng = random.Random(3)
    keys = [f"k{rng.randrange(10**9):09d}" for _ in range(500)]
    keys = list(dict.fromkeys(keys))
    df = spark.createDataFrame([(k,) for k in keys], "k string")
    for parts in (1, 3, 16):
        out = assign_sequential_ids(df.repartition(parts), "k",
                                    partitions=5)
        got = {r.k: r.seq_id for r in out.collect()}
        want = {k: i for i, k in enumerate(sorted(keys))}
        assert got == want, parts


def test_ids_start_offset_and_density(spark):
    df = spark.createDataFrame([(x,) for x in "dacb"], "k string")
    out = sorted((r.k, r.seq_id)
                 for r in assign_sequential_ids(df, "k",
                                                start=100).collect())
    assert out == [("a", 100), ("b", 101), ("c", 102), ("d", 103)]
