"""Streaming crawl ingest: canonical-URL dedup on the live stream.

The batch recrawl dedup (operators/urls.py::dedup_pages_by_url) keeps
the newest snapshot per canonical URL over the WHOLE table; a continuous
crawl wants the same suppression online, with bounded state.  Spark's
`dropDuplicatesWithinWatermark` is exactly that operator: state holds
one entry per canonical URL seen within the watermark horizon, and
expires it once the event-time watermark passes -- so a URL recrawled
within the horizon is suppressed, and state never grows beyond the
horizon's URL count.

Horizon choice is a semantics/state trade: crawl recrawl-bursts cluster
within hours, so a '1 hour' horizon suppresses the burst while keeping
per-executor state proportional to hourly crawl volume, not corpus
size.  (Exact global keep-newest needs the batch operator over the
accumulated table -- run both: stream dedup for the hot path, batch
dedup in the nightly compaction.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from redactify_spark.operators.urls import with_canonical_url


def dedup_pages_stream(pages_stream: DataFrame,
                       watermark: str = "1 hour",
                       ts_col: str = "warc_ts") -> DataFrame:
    """pages stream -> stream with one row per canonical URL within the
    watermark horizon (first snapshot wins inside a micro-batch)."""
    withc = with_canonical_url(pages_stream)
    return (withc.withWatermark(ts_col, watermark)
            .dropDuplicatesWithinWatermark(["canonical_url"]))
