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


@pytest.fixture(scope="module")
def triples_and_canon(spark):
    from redactify_spark.operators.components import canonical_map
    from redactify_spark.operators.detection import detect_mentions
    from redactify_spark.operators.linking import match_edges
    from redactify_spark.operators.triples import all_triples
    from redactify_spark.sources.pages import synth_pages
    pages = synth_pages(spark, 64, partitions=4)
    mentions = detect_mentions(pages, id_col="url", text_col="text").cache()
    triples = all_triples(mentions, id_col="url")
    canon = canonical_map(mentions, match_edges(mentions)) \
        .withColumnRenamed("pseudo_key", "subj")
    return triples, canon


def test_triples_bucketed_canon_join_no_shuffle(spark, triples_and_canon):
    """The production sink path: triples and the canonical map written
    bucketed by the join key (subj) -> the canonicalization join plans
    with NO Exchange on either side (the Iceberg bucket(n, col)
    storage-partitioned-join analogue, sandbox-runnable)."""
    triples, canon = triples_and_canon
    B.write_bucketed(triples, "t_triples", "subj", n_buckets=8)
    B.write_bucketed(canon, "t_canon", "subj", n_buckets=8)
    joined = B.bucketed_join(spark, "t_triples", "t_canon", "subj")
    assert joined.count() > 0
    assert not B.plan_has_exchange(joined), "bucketed triples join shuffles"


def test_write_table_partition_pruning(spark, triples_and_canon, tmp_path):
    """write_table(partition_col='pred') must produce a layout whose
    scans prune partitions: the pred predicate appears as a
    PartitionFilter (not a post-scan Filter over all files)."""
    import contextlib
    import io as _io

    from redactify_spark.sources import io as IO
    triples, _ = triples_and_canon
    target = str(tmp_path / "triples_part")
    IO.write_table(triples, target, partition_col="pred")
    back = IO.read_table(spark, target).where("pred = 'has_contact'")
    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        back.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan
    # the pred filter is applied at partition level...
    assert any("PartitionFilters" in ln and "pred" in ln
               for ln in plan.splitlines()), plan
    rows = back.count()
    total = IO.read_table(spark, target).count()
    assert 0 < rows < total


def test_dynamic_partition_pruning_fires(spark, tmp_path):
    """Star join over a hive-partitioned fact table with a filtered dim:
    Catalyst must inject a dynamic-pruning subquery so only the dim-
    selected partitions are scanned (the 100-TB star-join pattern)."""
    import contextlib
    import io

    from pyspark.sql import functions as F

    fact = (spark.range(5000)
            .select("id", (F.col("id") % 20).alias("pk"),
                    (F.col("id") * 2).alias("v")))
    fpath = str(tmp_path / "fact")
    fact.write.mode("overwrite").partitionBy("pk").parquet(fpath)
    dim = spark.range(20).select(F.col("id").alias("pk"),
                                 (F.col("id") % 4).alias("grp"))

    prev = spark.conf.get("spark.sql.optimizer.dynamicPartitionPruning.enabled",
                          "true")
    spark.conf.set(
        "spark.sql.optimizer.dynamicPartitionPruning.enabled", "true")
    try:
        j = (spark.read.parquet(fpath)
             .join(dim.where(F.col("grp") == 1), "pk")
             .agg(F.sum("v").alias("s")))
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            j.explain("formatted")
        plan = buf.getvalue()
        assert "dynamicpruning" in plan.lower(), plan[:2000]
        # and the answer is right
        expect = (fact.join(dim.where(F.col("grp") == 1), "pk")
                  .agg(F.sum("v")).collect()[0][0])
        assert j.collect()[0].s == expect
    finally:
        spark.conf.set(
            "spark.sql.optimizer.dynamicPartitionPruning.enabled", prev)
