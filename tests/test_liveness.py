from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from eventstreamd_spark.operators import liveness


def _events(spark, rows):
    return spark.createDataFrame(rows, "user_id bigint, ts timestamp")


def test_ping_spine_covers_span_inclusive(spark) -> None:
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [(1, t0), (1, t0 + dt.timedelta(seconds=25)), (2, t0)]
    out = liveness.ping_spine(_events(spark, rows), interval_s=10).collect()
    by_user = {}
    for r in out:
        by_user.setdefault(r.user_id, []).append((r.ping_idx, r.ping_ts, r.event))
    # user 1: pings at +0, +10, +20 (25 not reached by step), idx 0..2
    assert [p[0] for p in sorted(by_user[1])] == [0, 1, 2]
    assert sorted(by_user[1])[-1][1] == t0 + dt.timedelta(seconds=20)
    # a single-event connection still gets its connect-time ping
    assert [p[0] for p in by_user[2]] == [0]
    assert all(p[2] == "ping" for u in by_user.values() for p in u)


def test_expiry_logouts_refresh_or_expire(spark) -> None:
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    s = dt.timedelta(seconds=1)
    # user 1: gap of 5s > ttl 3s -> expire after 1st event AND after last;
    # user 2: steady refreshes within ttl -> only the final expiry
    rows = [
        (1, t0),
        (1, t0 + 5 * s),
        (2, t0),
        (2, t0 + 2 * s),
        (2, t0 + 4 * s),
    ]
    out = liveness.expiry_logouts(_events(spark, rows), ttl_s=3).collect()
    got = sorted((r.user_id, r.logout_ts) for r in out)
    assert got == [
        (1, t0 + 3 * s),
        (1, t0 + 8 * s),
        (2, t0 + 7 * s),
    ]
    assert all(r.reason == "expire" for r in out)


def test_ping_spine_plan_has_no_join(spark, sf_dir) -> None:
    from eventstreamd_spark.session import load_table

    plan = liveness.ping_spine(load_table(spark, sf_dir, "events"))._jdf.queryExecution().executedPlan().toString()
    # one keyed agg + generate/explode; no join anywhere in the plan
    assert "Join" not in plan
    assert "Generate" in plan
