"""Round-5 additions to the statistics tier: transitions, A/B, catalog."""

from __future__ import annotations

import duckdb
from pyspark.sql import Row

from eventstreamd_spark.operators import statistics as stats_mod
from eventstreamd_spark.session import load_table


def test_event_transitions_rows_normalize(spark, sf_dir) -> None:
    rows = stats_mod.event_transitions(
        load_table(spark, sf_dir, "events")
    ).collect()
    by_from: dict[str, float] = {}
    for r in rows:
        by_from[r["from_type"]] = by_from.get(r["from_type"], 0.0) + r["prob"]
        assert r["n"] <= r["n_from"]
    for total in by_from.values():
        assert abs(total - 1.0) < 1e-9


def test_ab_test_zero_se_guard(spark) -> None:
    """Everyone converts -> pooled variance 0 -> z must be NULL, not a
    crash (ANSI mode turns div-by-zero into an error otherwise)."""
    rows = [
        Row(event_id=i, user_id=i, event_type="purchase", value=200.0)
        for i in range(4)
    ]
    out = stats_mod.ab_test_report(spark.createDataFrame(rows)).collect()
    assert len(out) == 1
    assert out[0]["p_a"] == 1.0 and out[0]["p_b"] == 1.0
    assert out[0]["z_score"] is None


def test_column_stats_catalog_matches_duckdb(spark, sf_dir) -> None:
    got = {
        tuple(r)
        for r in stats_mod.column_stats_catalog(
            load_table(spark, sf_dir, "lineitem")
        ).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW lineitem AS "
        f"SELECT * FROM '{sf_dir}/lineitem.parquet'"
    )
    want = {
        tuple(r)
        for r in con.sql(stats_mod.sql_column_stats_catalog()).fetchall()
    }
    assert got == want
    assert len(got) == 11


def test_ks_drift_identical_halves_zero(spark) -> None:
    """If both halves carry the same value multiset, D must be 0; a
    fully shifted half must give D = 1."""
    from pyspark.sql import Row

    same = [
        Row(event_id=i, event_type="a", value=float(i % 5))
        for i in range(20)
    ]  # parity halves see identical value multisets {0..4}x2
    out = stats_mod.ks_drift_test(spark.createDataFrame(same)).collect()
    assert out[0]["d_num"] == 0 and out[0]["d_stat"] == 0.0

    shifted = [
        Row(
            event_id=i,
            event_type="b",
            value=float(i % 2),  # even ids -> 0.0, odd ids -> 1.0
        )
        for i in range(20)
    ]
    out = stats_mod.ks_drift_test(spark.createDataFrame(shifted)).collect()
    assert out[0]["d_stat"] == 1.0


def test_ks_drift_matches_scipy_formula(spark, sf_dir) -> None:
    """Cross-check the exact statistic against a direct two-sample
    computation in Python on the fixture data."""
    from eventstreamd_spark.session import load_table

    events = load_table(spark, sf_dir, "events")
    got = {
        r["event_type"]: r for r in stats_mod.ks_drift_test(events).collect()
    }
    rows = events.select("event_id", "event_type", "value").collect()
    by_type: dict = {}
    for r in rows:
        g = by_type.setdefault(r["event_type"], ([], []))
        g[0 if r["event_id"] % 2 == 0 else 1].append(r["value"])
    for et, (a, b) in by_type.items():
        n1, n2 = len(a), len(b)
        support = sorted(set(a) | set(b))
        d_num = max(
            abs(
                sum(1 for x in a if x <= v) * n2
                - sum(1 for x in b if x <= v) * n1
            )
            for v in support
        )
        assert got[et]["d_num"] == d_num
        assert got[et]["d_stat"] == d_num / (float(n1) * float(n2))


def test_trend_regression_recovers_planted_slope(spark) -> None:
    """A perfectly linear series must regress to its exact slope and
    intercept; a one-timestamp group must yield NULLs, not an error."""
    import datetime

    from pyspark.sql import Row

    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        Row(
            event_id=i,
            event_type="lin",
            ts=t0 + datetime.timedelta(seconds=i),
            value=5.0 + 2.5 * i,  # slope 2.5 per second
        )
        for i in range(50)
    ] + [
        Row(event_id=100 + i, event_type="flat", ts=t0, value=1.0)
        for i in range(3)
    ]
    out = {
        r["event_type"]: r
        for r in stats_mod.value_trend_regression(
            spark.createDataFrame(rows)
        ).collect()
    }
    assert abs(out["lin"]["slope_per_sec"] - 2.5) < 1e-9
    # intercept is at epoch 0, extrapolated: y(t0) - slope * t0_seconds
    t0_s = int(t0.replace(tzinfo=datetime.timezone.utc).timestamp())
    assert abs(out["lin"]["intercept"] - (5.0 - 2.5 * t0_s)) < 1e-4
    assert out["flat"]["slope_per_sec"] is None
    assert out["flat"]["intercept"] is None


def test_mannwhitney_auc_reference(spark) -> None:
    """AUC = P(X1 > X2) + 0.5 P(X1 = X2): verify against a direct
    O(n1*n2) computation, including ties; fully separated groups give
    AUC 1 (or 0)."""
    from pyspark.sql import Row

    vals = [3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0, 5.0, 3.0]
    rows = [
        Row(event_id=i, event_type="m", value=v) for i, v in enumerate(vals)
    ] + [
        # group 1 (even ids) strictly above group 2 -> AUC exactly 1
        Row(event_id=100 + i, event_type="sep", value=float(10 + (i % 2) * -9 + (0 if i % 2 else 10)))
        for i in range(8)
    ]
    out = {
        r["event_type"]: r
        for r in stats_mod.mannwhitney_auc(
            spark.createDataFrame(rows)
        ).collect()
    }
    a = [v for i, v in enumerate(vals) if i % 2 == 0]
    b = [v for i, v in enumerate(vals) if i % 2 == 1]
    auc_ref = sum(
        1.0 if x > y else (0.5 if x == y else 0.0) for x in a for y in b
    ) / (len(a) * len(b))
    assert out["m"]["auc"] == auc_ref
    assert out["m"]["n1"] == len(a) and out["m"]["n2"] == len(b)
    assert out["sep"]["auc"] == 1.0


def test_cusum_detects_planted_level_shift(spark) -> None:
    """A mid-series level jump must cross the threshold with the
    crossing localized after the shift; a flat series must not."""
    import datetime

    from pyspark.sql import Row

    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        Row(
            event_id=i,
            event_type="shifted",
            ts=t0 + datetime.timedelta(seconds=i),
            value=10.0 if i < 50 else 110.0,  # +100 jump at i=50
        )
        for i in range(100)
    ] + [
        Row(
            event_id=200 + i,
            event_type="flat",
            ts=t0 + datetime.timedelta(seconds=i),
            value=10.0,
        )
        for i in range(100)
    ]
    out = {
        r["event_type"]: r
        for r in stats_mod.cusum_shift_detection(
            spark.createDataFrame(rows), threshold=500.0
        ).collect()
    }
    assert out["shifted"]["shift_detected"]
    assert out["shifted"]["first_crossing_event"] >= 50
    # drawup of the centered walk peaks at the series end: 50 * 50
    assert abs(out["shifted"]["max_excursion"] - 2500.0) < 1e-6
    assert not out["flat"]["shift_detected"]
    assert out["flat"]["first_crossing_event"] is None
    assert out["flat"]["max_excursion"] == 0.0



def test_cusum_detects_shift_at_series_start(spark) -> None:
    """Regression for the empty-prefix baseline: a one-sided upward
    deviation on the FIRST event must register (the drawup without the
    cum_0 = 0 term reports 0 here)."""
    import datetime

    from pyspark.sql import Row

    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        Row(
            event_id=i,
            event_type="early",
            ts=t0 + datetime.timedelta(seconds=i),
            value=160.0 if i == 0 else 59.0,
        )
        for i in range(100)
    ]
    out = stats_mod.cusum_shift_detection(
        spark.createDataFrame(rows), threshold=50.0
    ).collect()[0]
    # centered series: first deviation is +(160 - mean) ~ +99.99
    assert out["max_excursion"] > 99.0
    assert out["shift_detected"]
    assert out["first_crossing_event"] == 0
