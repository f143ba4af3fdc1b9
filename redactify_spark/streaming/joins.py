"""Watermarked stream-stream join: continuous click -> purchase
conversion pairing.

The batch funnel (__spark_entry__.q87) computes conversions with a
per-user window sweep over the full history; on an endless stream the
same question is the canonical STREAM-STREAM INTERVAL JOIN: each click
waits for purchases of the same user within `window_minutes`, and the
watermark bounds how long click state is retained.

Semantics (documented delta vs the batch funnel): this operator emits
EVERY (click, purchase) pair inside the window -- pair-level output is
what the join primitive produces continuously; collapsing to
first-purchase-only conversion flags is a downstream aggregation over
the pairs.  State per side is bounded by the watermark: a click older
than watermark + window can never match a future purchase and is
evicted by Spark's state store; purchases are evicted past the
watermark.  Both sides MUST carry a watermark or the state grows
without bound -- Spark enforces this for append-mode interval joins.

Scale: the join is keyed by user_id (hash-shuffled both sides), the
time predicate is evaluated inside matched key groups only -- never a
cross-stream scan.  A hot user key concentrates state but not pairs
beyond its own click x purchase volume inside the window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def conversion_pairs_stream(events_stream: DataFrame,
                            window_minutes: int = 30,
                            watermark_minutes: int = 60,
                            ts_col: str = "ts",
                            user_col: str = "user_id") -> DataFrame:
    """(user_id, click_id, purchase_id, delay_us): every purchase within
    `window_minutes` after a click by the same user.  Works identically
    on a batch DataFrame (same code path, no watermark needed) -- the
    batch-parity test runs both."""
    streaming = events_stream.isStreaming
    # watermarks require TIMESTAMP (not TIMESTAMP_NTZ); the session runs
    # in UTC so the cast is stable and batch/stream paths agree
    events_stream = events_stream.withColumn(
        ts_col, F.col(ts_col).cast("timestamp"))
    clicks = events_stream.where(F.col("event_type") == "click")
    purchases = events_stream.where(F.col("event_type") == "purchase")
    if streaming:
        clicks = clicks.withWatermark(ts_col, f"{watermark_minutes} minutes")
        purchases = purchases.withWatermark(
            ts_col, f"{watermark_minutes} minutes")
    c = clicks.select(F.col(user_col).alias("user_id"),
                      F.col("event_id").alias("click_id"),
                      F.col(ts_col).alias("c_ts"))
    p = purchases.select(F.col(user_col).alias("p_user"),
                         F.col("event_id").alias("purchase_id"),
                         F.col(ts_col).alias("p_ts"))
    cond = ((F.col("user_id") == F.col("p_user"))
            & (F.col("p_ts") >= F.col("c_ts"))
            & (F.col("p_ts") <= F.col("c_ts")
               + F.expr(f"INTERVAL {window_minutes} MINUTES")))
    return (c.join(p, cond)
            .select("user_id", "click_id", "purchase_id",
                    (F.unix_micros(F.col("p_ts").cast("timestamp"))
                     - F.unix_micros(F.col("c_ts").cast("timestamp")))
                    .alias("delay_us")))
