"""Third flagship DAG: checkpointed web-analytics pipeline over the
events stream (the clickstream companion to the KG and training-corpus
pipelines).

    events -> 01_sessions     gap-based session stats per user
           -> 02_conversions  click -> purchase pairs (30-min window)
           -> 03_cohorts      retention matrix by first-activity week
           -> 04_transitions  event-type Markov transition counts
           -> 05_rolling      7-day rolling distinct active users

Every stage goes through plans/checkpoint.run_stage (observe-fused
manifest, per-file lineage, resume), so a killed run restarts from the
last complete stage -- same contract as kg_pipeline/corpus_pipeline,
pinned by the same kill-resume byte-equality test style.

Scale notes: every stage is keyed by user or by a low-cardinality
dimension; no stage sorts globally (the rolling-actives explode is a
bounded 7x expansion + semi-join, documented at the query level).  All
stages read the 00/01 checkpoint tables, so the events scan happens
once per stage table, not once per downstream consumer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from redactify_spark.plans.checkpoint import run_stage


def analytics_pipeline(spark: SparkSession, events: DataFrame, root: str,
                       gap_minutes: float = 30.0,
                       conversion_window_minutes: int = 30,
                       cohort_epoch: str = "2024-01-01"
                       ) -> dict[str, DataFrame]:
    from redactify_spark.operators.temporal import session_stats
    from redactify_spark.streaming.joins import conversion_pairs_stream

    sessions = run_stage(
        spark, root, "01_sessions",
        lambda: session_stats(events, gap_minutes=gap_minutes))

    conversions = run_stage(
        spark, root, "02_conversions",
        lambda: conversion_pairs_stream(
            events, window_minutes=conversion_window_minutes))

    def _cohorts():
        weeks = (events.select(
            "user_id",
            F.floor(F.datediff(F.to_date(F.col("ts").cast("timestamp")),
                               F.lit(cohort_epoch).cast("date")) / 7)
            .alias("week")).distinct())
        # cohort week via a per-user window min: one keyed shuffle.  A
        # broadcast of the per-user cohort table would be user-
        # cardinality -- gigabytes at 10^9 users, never broadcastable.
        cohort_week = F.min("week").over(Window.partitionBy("user_id"))
        return (weeks.withColumn("cohort_week", cohort_week)
                .groupBy("cohort_week",
                         (F.col("week") - F.col("cohort_week"))
                         .alias("week_offset"))
                .agg(F.count_distinct("user_id").cast("long")
                     .alias("active_users")))

    cohorts = run_stage(spark, root, "03_cohorts", _cohorts)

    def _transitions():
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        return (events.withColumn("next_type",
                                  F.lead("event_type").over(w))
                .where(F.col("next_type").isNotNull())
                .groupBy(F.col("event_type").alias("from_type"),
                         F.col("next_type").alias("to_type"))
                .agg(F.count("*").cast("long").alias("n")))

    transitions = run_stage(spark, root, "04_transitions", _transitions)

    def _rolling():
        days = (events.select(
            "user_id", F.to_date(F.col("ts").cast("timestamp"))
            .alias("day")).distinct())
        span = days.select(
            "user_id",
            F.explode(F.sequence(F.col("day"), F.date_add(F.col("day"), 6)))
            .alias("report_day"))
        observed = days.select(F.col("day").alias("report_day")).distinct()
        return (span.join(observed, "report_day", "left_semi")
                .groupBy("report_day")
                .agg(F.count_distinct("user_id").cast("long")
                     .alias("active_users_7d")))

    rolling = run_stage(spark, root, "05_rolling", _rolling)

    return {"sessions": sessions, "conversions": conversions,
            "cohorts": cohorts, "transitions": transitions,
            "rolling": rolling}
