"""Routing / fan-out (O3) + stats (O11)."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from eventstreamd_spark.operators.routing import (
    Listener,
    deliveries,
    listener_view,
    oracle_deliveries_sql,
    subsystem_counts,
)
from eventstreamd_spark.operators.stats import subsystem_stats
from eventstreamd_spark.session import load_table

LISTENERS = [
    Listener("big-purchases", "purchase", ("k>=50",)),
    Listener("all-errors", "error"),
    Listener("mid-signups", "signup", ("k>=25", "k<=75")),
]


def test_fanout_matches_per_listener_views(spark, sf_dir) -> None:
    events = load_table(spark, sf_dir, "events")
    fan = deliveries(events, LISTENERS)
    per_listener = {
        li.name: listener_view(events, li).count() for li in LISTENERS
    }
    got = {
        r["listener"]: r["n"]
        for r in fan.groupBy("listener").agg(F.count("*").alias("n")).collect()
    }
    for name, n in per_listener.items():
        assert got.get(name, 0) == n
    assert fan.count() == sum(per_listener.values())


def test_fanout_against_duckdb(spark, sf_dir) -> None:
    events = load_table(spark, sf_dir, "events")
    got = deliveries(events, LISTENERS).groupBy("listener").count()
    got_map = {r["listener"]: r["count"] for r in got.collect()}
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'"
    )
    sql = oracle_deliveries_sql(LISTENERS, select="event_id")
    oracle = con.execute(
        f"SELECT listener, count(*) FROM ({sql}) GROUP BY listener"
    ).fetchall()
    assert got_map == {name: n for name, n in oracle}


def test_no_listener_events_dropped(spark) -> None:
    # at-most-once: events whose subsystem has no listener never appear
    df = spark.createDataFrame(
        [("a", '{"k": 1}'), ("zzz", '{"k": 1}')], "event_type string, props string"
    )
    out = deliveries(df, [Listener("l1", "a")])
    assert [r["event_type"] for r in out.collect()] == ["a"]


def test_subsystem_counts_and_stats(spark, sf_dir) -> None:
    events = load_table(spark, sf_dir, "events")
    counts = {r["subsystem"]: r["n_events"] for r in subsystem_counts(events).collect()}
    assert sum(counts.values()) == events.count()
    stats = subsystem_stats(events)
    row = stats.filter(F.col("subsystem") == list(counts)[0]).collect()[0]
    assert row["n_events"] == counts[row["subsystem"]]
    assert row["first_ts"] <= row["max_ts"]
