"""Physical-plan invariants for the headline queries: the plans BENCH.md
claims (pushed filters, pruned scans, broadcast joins, top-k without a
global sort) are asserted here so an operator change that silently
regresses the plan fails CI, not a 100-TB run."""

import contextlib
import io

import pytest


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def qs():
    import __spark_entry__ as entry
    return entry.queries()


SF = "/root/testdata/sf0.001"


def test_q01_filter_pushdown_and_column_pruning(spark, qs):
    plan = plan_of(qs["q01_lineitem_agg"](spark, SF))
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan
    # ReadSchema pruned: projection needs 5 columns, not the whole table
    read = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "l_shipdate" in read and "l_quantity" in read
    assert "l_partkey" not in read and "l_comment" not in read


def test_q05_broadcasts_the_dim(spark, qs):
    plan = plan_of(qs["q05_broadcast_dim_join"](spark, SF))
    assert "BroadcastHashJoin" in plan


def test_q21_broadcasts_both_dims(spark, qs):
    plan = plan_of(qs["q21_multi_join"](spark, SF))
    # tree section prints each join once as "BroadcastHashJoin Inner"
    assert plan.count("BroadcastHashJoin Inner") == 2


def test_q11_topk_no_global_sort(spark, qs):
    plan = plan_of(qs["q11_topk"](spark, SF))
    assert "TakeOrderedAndProject" in plan


def test_q26_semi_join(spark, qs):
    plan = plan_of(qs["q26_exists_semijoin"](spark, SF))
    assert "LeftSemi" in plan


def test_q22_anti_join(spark, qs):
    plan = plan_of(qs["q22_set_ops"](spark, SF))
    assert "LeftAnti" in plan


def test_detection_input_column_pruned(spark):
    """The detection UDTF's scan must read only (doc_id, text) -- a scan
    of all document columns would move dead bytes through Arrow."""
    from redactify_spark.operators.detection import detect_mentions
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = plan_of(detect_mentions(docs, id_col="doc_id", text_col="text"))
    read = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "doc_id" in read and "text" in read
    assert "source" not in read and "lang" not in read
