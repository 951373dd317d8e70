"""Event-time windowing over the event stream — batch-mode semantics
shared with the streaming layer (SURVEY.md §7: batch-first core with
streaming-identical expressions).

The reference has no event-time processing at all (absence list,
SURVEY.md §2); these operators are the layer-B upgrade.  Buckets are
computed with integer epoch arithmetic (``unix_micros`` + integer div)
rather than ``F.window`` so the exact same bucket boundaries are
expressible in any engine (the DuckDB oracle uses the same formula);
``F.window``/``session_window`` variants live in streaming/ where
watermarks apply.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

from eventstreamd_spark.functions.exact import dsum

US = 1_000_000


def tumbling_counts(
    events: DataFrame, width_s: int = 300, ts_col: str = "ts"
) -> DataFrame:
    """Tumbling (fixed, non-overlapping) windows: count + exact value sum
    per (bucket, subsystem).  One shuffle; bucket arithmetic is a narrow
    codegen'd projection."""
    # integer `div`, not `/` + cast: float division of epoch-micros can
    # round up across a bucket boundary; integer arithmetic cannot.
    bucket = F.timestamp_seconds(
        F.expr(f"unix_micros({ts_col}) div {width_s * US}") * width_s
    ).cast("timestamp_ntz")  # match the source tables' naive timestamps
    return (
        events.withColumn("bucket", bucket)
        .groupBy("bucket", "event_type")
        .agg(F.count("*").alias("n_events"), dsum("value", "sum_value"))
    )


def sliding_counts(
    events: DataFrame, width_s: int = 600, slide_s: int = 300, ts_col: str = "ts"
) -> DataFrame:
    """Sliding windows: each event lands in width/slide buckets.  Built
    by generating the covering bucket starts with ``sequence`` + explode
    — stays declarative, no UDF; row expansion factor = width/slide."""
    n = width_s // slide_s
    last_start = F.expr(f"unix_micros({ts_col}) div {slide_s * US}") * slide_s
    starts = F.sequence(
        last_start - F.lit((n - 1) * slide_s), last_start, F.lit(slide_s)
    )
    return (
        events.withColumn("window_start", F.explode(starts))
        .withColumn(
            "window_start", F.timestamp_seconds("window_start").cast("timestamp_ntz")
        )
        .groupBy("window_start", "event_type")
        .agg(F.count("*").alias("n_events"))
    )


def sessionize(
    events: DataFrame, gap_s: int = 1800, ts_col: str = "ts"
) -> DataFrame:
    """Sessionization: per-user sessions split on inactivity > gap.

    Classic two-window formulation: lag to detect gaps, prefix-sum of
    the gap indicator to number sessions.  Shuffles once on user_id;
    both windows reuse the same partitioning+sort (single exchange in
    the physical plan)."""
    w = W.partitionBy("user_id").orderBy(ts_col, "event_id")
    prev_ts = F.lag(ts_col).over(w)
    is_new = (
        prev_ts.isNull()
        | (F.unix_micros(F.col(ts_col)) - F.unix_micros(prev_ts) > gap_s * US)
    ).cast("int")
    numbered = events.withColumn(
        "session_seq",
        F.sum(is_new).over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )
    return numbered.groupBy("user_id", "session_seq").agg(
        F.count("*").alias("n_events"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
    )
