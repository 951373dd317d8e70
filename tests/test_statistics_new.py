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
