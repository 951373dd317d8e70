"""Central registry: every driver-checkable query + its DuckDB oracle.

Each entry pairs a Spark callable ``(spark, sf_dir) -> DataFrame`` with an
equivalent DuckDB SQL string over the driver's pre-registered views.  The
Spark side is the *implementation under test* (the operators from
SURVEY.md §2 expressed Spark-first); the SQL side is an independent
semantic statement of the result, kept engine-exact (decimal arithmetic
for float aggregates, identical column aliases).

Registration helper keeps QUERIES/ORACLES in lockstep; queries whose
semantics aren't SQL-expressible register with ``oracle=None`` and get
the driver's weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from eventstreamd_spark.functions.sse import http_chunk, sse_frame, sse_frame_sql
from eventstreamd_spark.operators import envelope as envelope_op
from eventstreamd_spark.operators import routing as routing_op
from eventstreamd_spark.operators import stats as stats_op
from eventstreamd_spark.operators.filters import (
    filter_events,
    oracle_filters_sql,
    parse_filter,
)
from eventstreamd_spark.session import load_table

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# ---------------------------------------------------------------------------
# Faithful core — the reference's own query surface (SURVEY.md §2 O1-O11)
# ---------------------------------------------------------------------------

_FLAGSHIP_FILTERS = ["k>=50"]
_FLAGSHIP_SUBSYSTEM = "purchase"


@register(
    "flagship_filter_dsl",
    "SELECT event_id, ts, user_id, event_type, value FROM events "
    f"WHERE event_type = '{_FLAGSHIP_SUBSYSTEM}' AND "
    + oracle_filters_sql([parse_filter(f) for f in _FLAGSHIP_FILTERS], "props"),
)
def flagship_filter_dsl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EP1+EP2 hot path: subsystem routing gate + filter-DSL conjunction.

    Reference semantics: dispatcher.py:88-99 (subsystem lookup) +
    listener.py:62 (AND of filters).  One narrow scan->filter->project
    plan; the subsystem predicate is pushdown-eligible.
    """
    events = load_table(spark, sf_dir, "events")
    specs = [parse_filter(f) for f in _FLAGSHIP_FILTERS]
    routed = events.filter(F.col("event_type") == _FLAGSHIP_SUBSYSTEM)
    return filter_events(routed, specs).select(
        "event_id", "ts", "user_id", "event_type", "value"
    )


@register(
    "filter_dsl_int",
    "SELECT event_id, user_id, event_type FROM events WHERE "
    + oracle_filters_sql([parse_filter("k>=50")], "props"),
)
def filter_dsl_int(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O4/O5: int comparison over the dynamic JSON payload."""
    events = load_table(spark, sf_dir, "events")
    return filter_events(events, [parse_filter("k>=50")]).select(
        "event_id", "user_id", "event_type"
    )


@register(
    "filter_dsl_conjunction",
    "SELECT event_id, event_type FROM events WHERE "
    + oracle_filters_sql([parse_filter("k>=25"), parse_filter("k<=75")], "props"),
)
def filter_dsl_conjunction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O6: AND of multiple filters (listener.py:62)."""
    events = load_table(spark, sf_dir, "events")
    specs = [parse_filter("k>=25"), parse_filter("k<=75")]
    return filter_events(events, specs).select("event_id", "event_type")


@register(
    "filter_dsl_date",
    "SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE "
    "coalesce(CAST(o_orderdate AS DATE) >= DATE '1997-06-01', FALSE)",
)
def filter_dsl_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O5 date semantics end-to-end: the order date is serialized into a
    JSON payload (reference wire format) and probed back out through the
    DSL's date filter — exercising ISO parse + string-node type gate."""
    orders = load_table(spark, sf_dir, "orders")
    payload = F.to_json(
        F.struct(F.date_format("o_orderdate", "yyyy-MM-dd").alias("d"))
    )
    with_payload = orders.withColumn("props", payload)
    return filter_events(with_payload, [parse_filter("d>=1997-06-01")]).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


@register(
    "envelope_validate",
    "SELECT event_type AS subsystem, 'add' AS event_kind, "
    "CAST(event_id AS VARCHAR) AS id FROM events WHERE event_id % 7 <> 0",
)
def envelope_validate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1+O2 end-to-end: events -> reference JSON wire lines (with every
    7th line corrupted) -> envelope validation -> typed projection.
    The oracle states the expected surviving set."""
    events = load_table(spark, sf_dir, "events")
    raw = envelope_op.events_to_raw_lines(events, corrupt_every=7)
    ok = envelope_op.validate_envelope(raw)
    return ok.select(
        "subsystem", F.lit("add").alias("event_kind"), "id"
    )


_LISTENERS = [
    routing_op.Listener("big-purchases", "purchase", ("k>=50",)),
    routing_op.Listener("all-errors", "error"),
    routing_op.Listener("mid-signups", "signup", ("k>=25", "k<=75")),
    routing_op.Listener("purchase-low", "purchase", ("k<25",)),
]


@register(
    "routing_fanout",
    routing_op.oracle_deliveries_sql(_LISTENERS, select="event_id, user_id"),
)
def routing_fanout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3: one event delivered to every matching listener — single-pass
    columnar fan-out (dispatcher.py:88-99 + listener.py:62)."""
    events = load_table(spark, sf_dir, "events")
    return routing_op.deliveries(events, _LISTENERS).select(
        "event_id", "user_id", "listener"
    )


@register(
    "subsystem_counts",
    "SELECT event_type AS subsystem, count(*) AS n_events "
    "FROM events GROUP BY event_type",
)
def subsystem_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Routing-table shape: per-subsystem cardinality."""
    events = load_table(spark, sf_dir, "events")
    return routing_op.subsystem_counts(events)


@register(
    "subsystem_stats",
    "SELECT event_type AS subsystem, count(*) AS n_events, "
    "count(DISTINCT user_id) AS n_users, min(ts) AS first_ts, "
    "max(ts) AS max_ts, min(event_id) AS min_event_id, "
    "max(event_id) AS max_event_id FROM events GROUP BY event_type",
)
def subsystem_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O11 generalized: /stats as a data-level aggregation."""
    events = load_table(spark, sf_dir, "events")
    return stats_op.subsystem_stats(events)


@register(
    "server_stats",
    "SELECT count(*) AS total_events, count(DISTINCT event_type) AS n_subsystems, "
    "min(ts) AS start_ts, max(ts) AS end_ts FROM events",
)
def server_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return stats_op.server_stats(events)


@register(
    "sse_frames",
    "SELECT event_id, "
    + sse_frame_sql("event_type", "props", "CAST(event_id AS VARCHAR)")
    + " AS frame FROM events WHERE "
    + oracle_filters_sql([parse_filter("k>=80")], "props"),
)
def sse_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O7 (pure part): the SSE wire frame as a Column, for delivered
    events (events.py:27-33); payload rides through verbatim, id present."""
    events = load_table(spark, sf_dir, "events")
    delivered = filter_events(events, [parse_filter("k>=80")])
    frame = sse_frame(
        F.col("event_type"), F.col("props"), F.col("event_id").cast("string")
    )
    return delivered.select("event_id", frame.alias("frame"))


@register(
    "sse_chunked",
    "SELECT event_id, lower(to_hex(length(frame))) || chr(13) || chr(10) || frame "
    "|| chr(13) || chr(10) AS chunk FROM (SELECT event_id, "
    + sse_frame_sql("event_type", "props", "CAST(event_id AS VARCHAR)")
    + " AS frame FROM events WHERE "
    + oracle_filters_sql([parse_filter("k>=80")], "props")
    + ")",
)
def sse_chunked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O7 full wire path: SSE frame wrapped in HTTP/1.1 chunked transfer
    encoding (http.py:114-125)."""
    events = load_table(spark, sf_dir, "events")
    delivered = filter_events(events, [parse_filter("k>=80")])
    frame = sse_frame(
        F.col("event_type"), F.col("props"), F.col("event_id").cast("string")
    )
    return delivered.select("event_id", http_chunk(frame).alias("chunk"))
