"""Temporal operators Spark lacks natively: as-of join + sessionization.

Both are staples of event-log / feature-engineering pipelines over the
same corpora the KG build consumes (the reference has no equivalent --
these are part of the beyond-reference training-data toolkit, like
operators/dedup.py).

Scale design:

- `asof_join` is the UNION-AND-SWEEP as-of join, not a range join: tag
  both sides, union, one window sweep per key carrying the last-seen
  right payload forward.  Cost = ONE shuffle on the key + one sort --
  the same plan as a sort-merge join -- regardless of how many right
  rows precede each left row.  The naive formulation (range-join then
  argmax per left row) explodes to |L|x|R| pairs per key first; a
  10^6-event key would materialize 10^12 pairs.  Spark has no ASOF JOIN
  (SPARK-22947 open); pandas merge_asof is single-node.  DuckDB's native
  ASOF JOIN is the oracle.
- `sessionize` is two window sweeps (lag -> gap flag -> running sum)
  over the same (key, ts) sort; session stats are then one
  map-side-combinable groupBy.  State per key is O(1) during the sweep;
  a key's events need not fit in memory (WindowExec streams frames for
  running aggregates).

Skew note: both operators shuffle by the key column; a single hot key
(one user with 10^9 events) serializes its window sweep.  That is
inherent to per-key ordered semantics; mitigate upstream by splitting
keys on a coarse time bucket when sessions/lookbacks never span buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(left: DataFrame, right: DataFrame, key_col: str,
              left_ts: str = "ts", right_ts: str = "ts",
              value_cols: list[str] | None = None,
              suffix: str = "_asof",
              tolerance_us: int | None = None) -> DataFrame:
    """Backward inclusive as-of join: each left row gains the `value_cols`
    of the latest right row with right.ts <= left.ts for the same key
    (pandas.merge_asof(direction='backward') / DuckDB `ASOF LEFT JOIN ...
    ON l.key = r.key AND l.ts >= r.ts` semantics).  Unmatched -> NULL.

    Output = all left columns + one `<col><suffix>` per value col +
    `<right_ts><suffix>` (the matched right timestamp, for staleness
    checks).  `tolerance_us` nulls matches older than the given
    microseconds (merge_asof's `tolerance`).

    Right rows that tie on (key, ts) are broken to the MAX (ts, values)
    struct -- pass a de-duplicated right side for fully pinned semantics
    (q55's events fixture has unique (user, ts) pairs, verified).
    Because the sweep orders by that struct, value columns must be
    ORDERABLE types (maps are not; wrap them on the right side first).

    Null timestamps: right rows with a null ts are dropped (they have no
    position on the timeline to match from); left rows with a null ts
    come back with a NULL match.  pandas.merge_asof refuses NaT outright
    -- dropping-with-documented-semantics beats erroring in a pipeline
    that sees dirty crawl data."""
    if value_cols is None:
        value_cols = [c for c in right.columns
                      if c not in (key_col, right_ts)]
    right = right.where(F.col(right_ts).isNotNull())
    tagged_r = right.select(
        F.col(key_col).alias("_key"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.struct(F.col(right_ts).alias("_rts"),
                 *[F.col(c) for c in value_cols]).alias("_payload"))
    tagged_l = left.select(
        F.col(key_col).alias("_key"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(tagged_r.schema["_payload"].dataType)
        .alias("_payload"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_row"))
    u = tagged_r.withColumn("_row", F.lit(None)
                            .cast(tagged_l.schema["_row"].dataType)) \
        .unionByName(tagged_l)
    # right rows (_side=0) sort before left rows at the same timestamp ->
    # equal timestamps match (backward INCLUSIVE)
    w = (Window.partitionBy("_key").orderBy("_ts", "_side", "_payload")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    swept = (u.withColumn("_match", F.last("_payload", ignorenulls=True)
                          .over(w))
             .where(F.col("_side") == 1))
    if tolerance_us is not None:
        fresh = (F.unix_micros(F.col("_ts").cast("timestamp"))
                 - F.unix_micros(F.col("_match._rts").cast("timestamp"))
                 <= F.lit(tolerance_us))
        swept = swept.withColumn(
            "_match", F.when(fresh, F.col("_match")))
    return swept.select(
        *[F.col(f"_row.{c}").alias(c) for c in left.columns],
        F.col("_match._rts").alias(f"{right_ts}{suffix}"),
        *[F.col(f"_match.{c}").alias(f"{c}{suffix}") for c in value_cols])


def sessionize(events: DataFrame, key_col: str = "user_id",
               ts_col: str = "ts", gap_minutes: float = 30.0,
               tiebreak_col: str = "event_id") -> DataFrame:
    """Assign gap-based session indexes: a new session starts when the
    time since the key's previous event exceeds `gap_minutes`.  Adds
    `session_idx` (0-based per key).  Two window sweeps over one
    (key, ts) sort; exact integer-microsecond gap arithmetic so Spark
    and the DuckDB oracle agree at sub-second boundaries (the q04
    lesson)."""
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    gap_us = int(gap_minutes * 60_000_000)
    prev = F.lag(ts_col).over(w)
    new_session = F.when(prev.isNull(), F.lit(0)).otherwise(
        (F.unix_micros(F.col(ts_col).cast("timestamp"))
         - F.unix_micros(prev.cast("timestamp"))
         > F.lit(gap_us)).cast("int"))
    return (events.withColumn("_new", new_session)
            .withColumn("session_idx",
                        F.sum("_new").over(
                            w.rowsBetween(Window.unboundedPreceding,
                                          Window.currentRow))
                        .cast("long"))
            .drop("_new"))


def session_stats(events: DataFrame, key_col: str = "user_id",
                  ts_col: str = "ts", gap_minutes: float = 30.0,
                  value_col: str = "value") -> DataFrame:
    """Per-session aggregates over `sessionize` output: event count,
    exact duration in microseconds, value total.  One map-side-
    combinable groupBy after the window sweeps."""
    s = sessionize(events, key_col, ts_col, gap_minutes)
    return (s.groupBy(key_col, "session_idx")
            .agg(F.count("*").alias("n_events"),
                 (F.unix_micros(F.max(ts_col).cast("timestamp"))
                  - F.unix_micros(F.min(ts_col).cast("timestamp")))
                 .alias("duration_us"),
                 F.round(F.sum(value_col), 2).alias("total_value")))


def interval_join(points: DataFrame, intervals: DataFrame,
                  ts_col: str = "ts", start_col: str = "start",
                  end_col: str = "end", bin_minutes: int = 60,
                  max_bins_per_interval: int = 1000) -> DataFrame:
    """Point-in-interval join ([start, end) semantics) as an EQUI-join:
    each point maps to its one time bin, each interval explodes to the
    bins it covers, the join runs on the bin key and the exact range
    predicate filters inside the matched bins.

    Why: Spark plans a raw `start <= ts AND ts < end` join as
    BroadcastNestedLoopJoin -- a full cross product per partition, the
    classic range-join scale-killer.  Bin blocking turns it into one
    shuffle keyed by bin; each pair is found exactly once (a point
    lives in exactly one bin), so no dedup pass.  Pick `bin_minutes`
    near the median interval length; intervals covering more than
    `max_bins_per_interval` bins, and intervals with a NULL start or
    end (the bin-span predicate evaluates to NULL), are dropped and
    counted (wide_interval_count) -- an unbounded interval would
    otherwise explode to every bin in the corpus."""
    bin_us = bin_minutes * 60_000_000
    p_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    s_us = F.unix_micros(F.col(start_col).cast("timestamp"))
    e_us = F.unix_micros(F.col(end_col).cast("timestamp"))
    p = points.withColumn("_bin", F.floor(p_us / bin_us))
    iv = (intervals
          .withColumn("_b0", F.floor(s_us / bin_us))
          .withColumn("_b1", F.floor(e_us / bin_us))
          .where(F.col("_b1") - F.col("_b0") < max_bins_per_interval)
          .withColumn("_bin", F.explode(F.sequence("_b0", "_b1")))
          .drop("_b0", "_b1"))
    return (p.join(iv, "_bin")
            .where((F.unix_micros(F.col(start_col).cast("timestamp"))
                    <= F.unix_micros(F.col(ts_col).cast("timestamp")))
                   & (F.unix_micros(F.col(ts_col).cast("timestamp"))
                      < F.unix_micros(F.col(end_col).cast("timestamp"))))
            .drop("_bin"))


def wide_interval_count(intervals: DataFrame, start_col: str = "start",
                        end_col: str = "end", bin_minutes: int = 60,
                        max_bins_per_interval: int = 1000) -> int:
    """Metric: intervals dropped by interval_join (no silent caps) --
    both span > cap AND null-bound intervals, which the join's bin-span
    predicate silently evaluates to NULL and drops."""
    bin_us = bin_minutes * 60_000_000
    s_us = F.unix_micros(F.col(start_col).cast("timestamp"))
    e_us = F.unix_micros(F.col(end_col).cast("timestamp"))
    too_wide = F.floor(e_us / bin_us) - F.floor(s_us / bin_us) \
        >= max_bins_per_interval
    null_bound = F.col(start_col).isNull() | F.col(end_col).isNull()
    return intervals.where(too_wide | null_bound).count()


def resample_ffill(events: DataFrame, key_col: str = "user_id",
                   ts_col: str = "ts", value_col: str = "value",
                   order_col: str = "event_id",
                   freq_minutes: int = 60) -> DataFrame:
    """(key, bucket, value, filled): per-key fixed-frequency resample
    with forward fill -- the time-series gap-fill operator (Spark has no
    native equivalent; TimescaleDB calls it time_bucket + locf).

    Per bucket the representative value is that of the LATEST event by
    `order_col` (unique + monotone with time, so the choice is
    deterministic even under timestamp ties).  Each key's spine spans
    its own [min, max] bucket (sequence + explode -- rows stay
    proportional to key activity, not to the global time range);
    missing buckets take the previous value via last(ignorenulls) over
    a per-key window.  `filled` marks carried-forward rows.  Leading
    buckets before a key's first event cannot exist by construction.

    Scale shape: one groupBy on (key, bucket), one per-key explode, one
    window sweep -- all keyed by `key_col`, no global sort."""
    bucket_us = freq_minutes * 60_000_000
    b = F.floor(F.unix_micros(F.col(ts_col).cast("timestamp"))
                / F.lit(bucket_us))
    per_bucket = (events
                  .select(F.col(key_col).alias("key"), b.alias("bucket"),
                          F.col(value_col).alias("v"),
                          F.col(order_col).alias("o"))
                  .groupBy("key", "bucket")
                  .agg(F.max_by("v", "o").alias("bv")))
    spine = (per_bucket.groupBy("key")
             .agg(F.min("bucket").alias("b0"), F.max("bucket").alias("b1"))
             .select("key", F.explode(F.sequence("b0", "b1"))
                     .alias("bucket")))
    w = Window.partitionBy("key").orderBy("bucket") \
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    joined = spine.join(per_bucket, ["key", "bucket"], "left")
    return (joined
            .select("key", "bucket",
                    F.last("bv", ignorenulls=True).over(w).alias("value"),
                    F.col("bv").isNull().alias("filled")))
