"""Third flagship DAG: checkpointed web-analytics pipeline -- semantics
+ kill-resume byte-equality, same gates as the KG and corpus DAGs."""

import pytest

from redactify_spark.plans import checkpoint as CP
from redactify_spark.plans.analytics import analytics_pipeline


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet")


@pytest.fixture()
def root(tmp_path):
    return str(tmp_path / "analytics")


def table_set(df):
    return sorted(tuple(str(v) for v in row) for row in df.collect())


def test_analytics_pipeline_semantics(spark, events, root):
    out = analytics_pipeline(spark, events, root)
    trans = {(r.from_type, r.to_type): r.n
             for r in out["transitions"].collect()}
    assert sum(trans.values()) > 0
    # every user's sessions exist and are non-overlapping in count
    n_users = events.select("user_id").distinct().count()
    assert out["sessions"].select("user_id").distinct().count() == n_users
    # cohort week 0 offset row exists for every cohort
    cohorts = {(r.cohort_week, r.week_offset): r.active_users
               for r in out["cohorts"].collect()}
    assert all((cw, 0) in cohorts for cw, _ in cohorts)
    # rolling actives covers every observed day
    n_days = (events.selectExpr("cast(cast(ts as timestamp) as date) d")
              .distinct().count())
    assert out["rolling"].count() == n_days


def test_analytics_pipeline_kill_resume(spark, events, root):
    full = analytics_pipeline(spark, events, root)
    before = {k: table_set(v) for k, v in full.items()}
    hashes = {k: CP.content_hash(v) for k, v in full.items()}

    # crash after conversions: wipe downstream, resume
    for stage in ("03_cohorts", "04_transitions", "05_rolling"):
        CP.invalidate(root, stage)
    resumed = analytics_pipeline(spark, events, root)
    for k in before:
        assert table_set(resumed[k]) == before[k], k
        assert CP.content_hash(resumed[k]) == hashes[k], k
    for stage in ("01_sessions", "02_conversions", "03_cohorts",
                  "04_transitions", "05_rolling"):
        assert CP.stage_complete(root, stage)
