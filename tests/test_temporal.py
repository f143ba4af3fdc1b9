"""Temporal operators: as-of join (vs pandas merge_asof) + sessionization."""

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F

from redactify_spark.operators import temporal as TP


def _ts(minute, second=0, micro=0):
    return dt.datetime(2024, 1, 1, 10, minute, second, micro)


@pytest.fixture(scope="module")
def trades_quotes(spark):
    quotes = [  # (user, ts, price)
        (1, _ts(0), 10.0),
        (1, _ts(5), 11.0),
        (1, _ts(5, 30), 11.5),
        (2, _ts(3), 20.0),
    ]
    trades = [  # (trade_id, user, ts)
        (0, 1, _ts(0)),        # exact tie -> inclusive match at 10.0
        (1, 1, _ts(4, 59)),    # between -> 10.0
        (2, 1, _ts(6)),        # after both -> 11.5
        (3, 2, _ts(2, 59)),    # before any quote -> NULL
        (4, 3, _ts(9)),        # key with no quotes -> NULL
    ]
    q = spark.createDataFrame(quotes, "user_id long, ts timestamp, price double")
    t = spark.createDataFrame(trades, "trade_id long, user_id long, ts timestamp")
    return t, q


def test_asof_backward_inclusive(spark, trades_quotes):
    t, q = trades_quotes
    out = {r.trade_id: r.price_asof
           for r in TP.asof_join(t, q, "user_id",
                                 value_cols=["price"]).collect()}
    assert out == {0: 10.0, 1: 10.0, 2: 11.5, 3: None, 4: None}


def test_asof_matched_ts_exposed(spark, trades_quotes):
    t, q = trades_quotes
    row = (TP.asof_join(t, q, "user_id", value_cols=["price"])
           .where("trade_id = 2").first())
    assert row.ts_asof == _ts(5, 30)


def test_asof_tolerance_nulls_stale_matches(spark, trades_quotes):
    t, q = trades_quotes
    # trade 1 is 4m59s after its match -> stale at a 60s tolerance
    out = {r.trade_id: r.price_asof
           for r in TP.asof_join(t, q, "user_id", value_cols=["price"],
                                 tolerance_us=60_000_000).collect()}
    assert out == {0: 10.0, 1: None, 2: 11.5, 3: None, 4: None}


def test_asof_matches_pandas_merge_asof(spark):
    """Randomized parity with pandas.merge_asof (deterministic seed)."""
    import numpy as np
    rng = np.random.RandomState(7)
    base = dt.datetime(2024, 1, 1)
    lefts = pd.DataFrame({
        "lid": range(200),
        "key": rng.randint(0, 5, 200),
        "ts": [base + dt.timedelta(seconds=int(s))
               for s in rng.randint(0, 10_000, 200)],
    })
    rights = pd.DataFrame({
        "key": rng.randint(0, 5, 80),
        "ts": [base + dt.timedelta(seconds=int(s))
               for s in rng.randint(0, 10_000, 80)],
        "v": rng.rand(80).round(4),
    }).drop_duplicates(["key", "ts"])  # pinned semantics need unique (key,ts)
    expected = pd.merge_asof(
        lefts.sort_values("ts"), rights.sort_values("ts"),
        on="ts", by="key", direction="backward").set_index("lid")["v"]
    l = spark.createDataFrame(lefts)
    r = spark.createDataFrame(rights)
    got = {row.lid: row.v_asof
           for row in TP.asof_join(l, r, "key",
                                   value_cols=["v"]).collect()}
    for lid, exp in expected.items():
        g = got[lid]
        assert (g is None and pd.isna(exp)) or g == exp, (lid, g, exp)


def test_asof_partition_invariant(spark, trades_quotes):
    t, q = trades_quotes
    a = sorted((r.trade_id, r.price_asof) for r in
               TP.asof_join(t, q, "user_id", value_cols=["price"]).collect())
    b = sorted((r.trade_id, r.price_asof) for r in
               TP.asof_join(t.repartition(7), q.repartition(3),
                            "user_id", value_cols=["price"]).collect())
    assert a == b


def test_sessionize_gap_boundary(spark):
    """Gap strictly-greater semantics at the exact boundary, microsecond
    precision: 30:00.000000 stays in-session, 30:00.000001 breaks."""
    rows = [
        (0, 1, _ts(0)),
        (1, 1, _ts(30)),                 # exactly 30m -> same session
        (2, 1, dt.datetime(2024, 1, 1, 11, 0, 0, 1)),  # 30m + 1us -> new
        (3, 2, _ts(0)),
    ]
    ev = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    out = {r.event_id: r.session_idx
           for r in TP.sessionize(ev, gap_minutes=30.0).collect()}
    assert out == {0: 0, 1: 0, 2: 1, 3: 0}


def test_session_stats(spark):
    rows = [
        (0, 1, _ts(0), 1.0),
        (1, 1, _ts(10), 2.0),
        (2, 1, _ts(50), 4.0),   # 40m gap -> session 1
        (3, 1, _ts(55), 8.0),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double")
    out = {(r.user_id, r.session_idx): (r.n_events, r.duration_us,
                                        r.total_value)
           for r in TP.session_stats(ev, gap_minutes=30.0).collect()}
    assert out == {(1, 0): (2, 600_000_000, 3.0),
                   (1, 1): (2, 300_000_000, 12.0)}


def test_asof_null_timestamps(spark):
    """Null-ts right rows never match; null-ts left rows get NULL."""
    q = spark.createDataFrame(
        [(1, None, 99.0), (1, _ts(5), 11.0)],
        "user_id long, ts timestamp, price double")
    t = spark.createDataFrame(
        [(0, 1, _ts(4)), (1, 1, _ts(6)), (2, 1, None)],
        "trade_id long, user_id long, ts timestamp")
    out = {r.trade_id: r.price_asof
           for r in TP.asof_join(t, q, "user_id",
                                 value_cols=["price"]).collect()}
    assert out == {0: None, 1: 11.0, 2: None}


def test_interval_join_boundaries_and_cap(spark):
    from redactify_spark.operators.temporal import (interval_join,
                                                    wide_interval_count)
    iv = spark.createDataFrame(
        [(0, _ts(0), _ts(30)),           # [10:00, 10:30)
         (1, _ts(45), _ts(50))],         # [10:45, 10:50)
        "iv_id long, start timestamp, end timestamp")
    pts = spark.createDataFrame(
        [(0, _ts(0)),        # == start -> IN (inclusive)
         (1, _ts(29, 59)),   # just inside
         (2, _ts(30)),       # == end -> OUT (exclusive)
         (3, _ts(46)),       # second interval
         (4, _ts(59))],      # no interval
        "pid long, ts timestamp")
    out = {(r.pid, r.iv_id)
           for r in interval_join(pts, iv, bin_minutes=15).collect()}
    assert out == {(0, 0), (1, 0), (3, 1)}

    # an interval spanning more bins than the cap is dropped + counted
    import datetime as dt
    wide = spark.createDataFrame(
        [(9, _ts(0), dt.datetime(2024, 1, 30))],
        "iv_id long, start timestamp, end timestamp")
    assert wide_interval_count(wide, bin_minutes=15,
                               max_bins_per_interval=100) == 1
    assert interval_join(pts, wide, bin_minutes=15,
                         max_bins_per_interval=100).count() == 0


def test_interval_join_matches_theta_join(spark):
    """Bin-blocked result == the naive range join on a random fixture,
    for bin widths smaller and larger than the intervals."""
    import datetime as dt
    import random
    rng = random.Random(3)
    base = dt.datetime(2024, 1, 1)
    iv = [(i, base + dt.timedelta(minutes=rng.randint(0, 2000)), None)
          for i in range(30)]
    iv = [(i, s, s + dt.timedelta(minutes=rng.randint(1, 180)))
          for i, s, _ in iv]
    pts = [(j, base + dt.timedelta(minutes=rng.randint(0, 2200)))
           for j in range(300)]
    ivd = spark.createDataFrame(iv, "iv_id long, start timestamp, end timestamp")
    ptd = spark.createDataFrame(pts, "pid long, ts timestamp")
    want = {(p, i) for i, s, e in iv for p, t in pts if s <= t < e}
    for bins in (7, 60, 600):
        from redactify_spark.operators.temporal import interval_join
        got = {(r.pid, r.iv_id)
               for r in interval_join(ptd, ivd, bin_minutes=bins).collect()}
        assert got == want, bins


def test_wide_interval_count_includes_null_bounds(spark):
    """Null-bound intervals are dropped by the join's bin-span predicate;
    the metric must count them (no silent caps)."""
    from redactify_spark.operators.temporal import (interval_join,
                                                    wide_interval_count)
    iv = spark.createDataFrame(
        [(0, _ts(0), _ts(30)),
         (1, None, _ts(30)),
         (2, _ts(0), None)],
        "iv_id long, start timestamp, end timestamp")
    pts = spark.createDataFrame([(0, _ts(5))], "pid long, ts timestamp")
    # the null-bound intervals match nothing...
    assert {(r.pid, r.iv_id)
            for r in interval_join(pts, iv, bin_minutes=15).collect()} \
        == {(0, 0)}
    # ...and both are counted as dropped
    assert wide_interval_count(iv, bin_minutes=15) == 2


def test_resample_ffill(spark):
    """Gap-fill: missing hourly buckets carry the previous value forward,
    per-bucket representative = latest event by order col."""
    from redactify_spark.operators.temporal import resample_ffill
    import datetime as dt
    rows = [
        (0, 1, dt.datetime(2024, 1, 1, 10, 0), 10.0),   # hour 10
        (1, 1, dt.datetime(2024, 1, 1, 10, 10), 11.0),  # hour 10, later wins
        (2, 1, dt.datetime(2024, 1, 1, 13, 0), 30.0),   # hour 13 (11-12 gap)
        (3, 2, dt.datetime(2024, 1, 1, 11, 0), 5.0),    # user 2: one bucket
    ]
    e = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double")
    out = {(r.key, r.bucket - min(x.bucket for x in c if x.key == r.key)):
           (r.value, r.filled)
           for c in [resample_ffill(e).collect()] for r in c}
    got = {(r[0][0], r[0][1]): r[1] for r in out.items()}
    assert got[(1, 0)] == (11.0, False)   # argmax by event_id
    assert got[(1, 1)] == (11.0, True)    # filled forward
    assert got[(1, 2)] == (11.0, True)
    assert got[(1, 3)] == (30.0, False)
    assert got[(2, 0)] == (5.0, False)
    assert len(got) == 5                   # no spine beyond activity


def test_resample_ffill_properties_random(spark):
    """Random event sets: spine is exactly [min,max] buckets per key,
    values never null, filled marks exactly the bucket-gap rows."""
    import datetime as dt
    import random
    rng = random.Random(5)
    rows = []
    for eid in range(120):
        rows.append((eid, rng.randrange(4),
                     dt.datetime(2024, 1, 1) + dt.timedelta(
                         minutes=rng.randrange(0, 48 * 60)),
                     round(rng.uniform(0, 100), 2)))
    e = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double")
    from redactify_spark.operators.temporal import resample_ffill
    out = resample_ffill(e).collect()
    by_key = {}
    for r in out:
        by_key.setdefault(r.key, []).append(r)
    actual_buckets = {}
    for eid, uid, ts, v in rows:
        actual_buckets.setdefault(uid, set()).add(
            int(ts.timestamp() * 1_000_000) // 3_600_000_000)
    for key, rs in by_key.items():
        buckets = sorted(r.bucket for r in rs)
        assert buckets == list(range(min(buckets), max(buckets) + 1))
        assert min(buckets) == min(actual_buckets[key])
        assert max(buckets) == max(actual_buckets[key])
        assert all(r.value is not None for r in rs)
        for r in rs:
            assert r.filled == (r.bucket not in actual_buckets[key])
