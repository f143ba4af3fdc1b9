"""Pipeline metrics: per-stage counters and cardinality estimates.

The reference reports per-request counters (total_entities,
detectors_used, processing_time -- server/server.py:205-222,:317-325);
at pipeline scale these become a metrics TABLE per stage: row counts,
distinct-entity estimates (approx_count_distinct -- HLL sketch, one
pass, mergeable across partitions: the right cardinality tool at 10^12
rows where exact countDistinct would shuffle every key), per-detector
breakdowns, and score histograms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mention_metrics(mentions: DataFrame) -> DataFrame:
    """One row: global counters over a mentions table."""
    return mentions.agg(
        F.count("*").cast("long").alias("n_mentions"),
        F.approx_count_distinct("pseudo_key").alias("approx_entities"),
        F.approx_count_distinct("surface").alias("approx_surfaces"),
        F.countDistinct("entity_group").cast("long").alias("n_types"),
        F.round(F.avg("score"), 4).alias("avg_score"),
        F.round(F.min("score"), 4).alias("min_score"))


def detector_breakdown(mentions: DataFrame) -> DataFrame:
    """Per-detector counters (the reference's detectors_used metadata)."""
    return (mentions.groupBy("detector")
            .agg(F.count("*").cast("long").alias("n"),
                 F.approx_count_distinct("pseudo_key").alias("approx_entities"),
                 F.round(F.avg("score"), 4).alias("avg_score"))
            .orderBy("detector"))


def score_histogram(mentions: DataFrame, buckets: int = 10) -> DataFrame:
    """Score distribution in fixed-width buckets (native, one pass)."""
    b = F.least(F.floor(F.col("score") * buckets).cast("int"),
                F.lit(buckets - 1))
    return (mentions.groupBy(b.alias("bucket"))
            .agg(F.count("*").cast("long").alias("n"))
            .orderBy("bucket"))
