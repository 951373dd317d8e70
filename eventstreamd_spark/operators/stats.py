"""Stats aggregation (operator O11) — the reference's /stats endpoint,
generalized to data-level aggregation.

Reference: /root/reference/evtstrd/stats.py:28-50 aggregates only
*operational* metadata (start time, total connections, per-connection
projection).  We reproduce that shape for a listener registry, and add
the data-level stats a Spark engine can answer over the event stream
itself (counts, distinct users, time bounds per subsystem) — a single
shuffle with map-side combine; ``approx_count_distinct`` is the
100 TB-friendly variant of the exact distinct.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from eventstreamd_spark.operators.routing import Listener


def listener_connections(spark: SparkSession, listeners: list[Listener]) -> DataFrame:
    """The /stats "connections" projection (stats.py:35-44) as a table."""
    rows = [
        (li.name, li.subsystem, list(li.filters))
        for li in listeners
    ]
    return spark.createDataFrame(
        rows, "listener string, subsystem string, filters array<string>"
    )


def subsystem_stats(df: DataFrame, subsystem_col: str = "event_type") -> DataFrame:
    """Per-subsystem operational aggregate over the event stream."""
    return df.groupBy(F.col(subsystem_col).alias("subsystem")).agg(
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("max_ts"),
        F.min("event_id").alias("min_event_id"),
        F.max("event_id").alias("max_event_id"),
    )


def server_stats(df: DataFrame) -> DataFrame:
    """Whole-stream totals (the "start-time"/"total-connections" analog)."""
    return df.agg(
        F.count("*").alias("total_events"),
        F.countDistinct(F.col("event_type")).alias("n_subsystems"),
        F.min("ts").alias("start_ts"),
        F.max("ts").alias("end_ts"),
    )
