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


def with_observed_metrics(df: DataFrame, name: str = "evt_metrics") -> DataFrame:
    """Attach zero-cost observed metrics to a (batch or streaming) plan.

    ``df.observe`` computes the aggregates inline during normal
    execution — no extra pass, no extra shuffle — and surfaces them per
    micro-batch through StreamingQueryListener / QueryExecutionListener.
    This is the Spark-native home for the reference's monotone counters
    (dispatcher.py:56): operational metrics ride the query instead of
    being kept in daemon state.
    """
    return df.observe(
        name,
        F.count(F.lit(1)).alias("n_events"),
        F.approx_count_distinct("subsystem").alias("n_subsystems"),
    )


class MetricsCollector:
    """StreamingQueryListener that accumulates observed metrics per
    micro-batch — the /stats counter feed for the streaming daemon."""

    def __init__(self, metric_name: str = "evt_metrics") -> None:
        self.metric_name = metric_name
        self.totals: dict[str, int] = {"n_events": 0, "batches": 0}

    def attach(self, spark: SparkSession) -> "MetricsCollector":
        from pyspark.sql.streaming import StreamingQueryListener

        collector = self

        class _Listener(StreamingQueryListener):
            def onQueryStarted(self, event):
                pass

            def onQueryProgress(self, event):
                row = event.progress.observedMetrics.get(collector.metric_name)
                if row is not None:
                    collector.totals["n_events"] += row["n_events"]
                    collector.totals["batches"] += 1

            def onQueryIdle(self, event):
                pass

            def onQueryTerminated(self, event):
                pass

        self._listener = _Listener()
        spark.streams.addListener(self._listener)
        return self

    def detach(self, spark: SparkSession) -> None:
        spark.streams.removeListener(self._listener)


def quality_observation(df: DataFrame, cols: list[str]):
    """One-pass batch data-quality counters: total rows + per-column
    null counts computed WHILE the main job runs (pyspark Observation —
    same mechanism as with_observed_metrics, batch-flavored API).

    At 100 TB a separate `df.filter(isnull).count()` audit is a second
    full scan; an Observation rides the action the pipeline was already
    doing for free.  Returns (observed_df, observation) — run any
    action on observed_df, then read ``observation.get``.
    """
    from pyspark.sql import Observation

    obs = Observation("quality")
    metrics = [F.count(F.lit(1)).alias("n_rows")] + [
        F.sum(F.isnull(c).cast("long")).alias(f"n_null_{c}") for c in cols
    ]
    return df.observe(obs, *metrics), obs
