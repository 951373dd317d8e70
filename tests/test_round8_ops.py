"""Round-8 operators: skew-proof exact top-k."""

from __future__ import annotations

from pyspark.sql import functions as F

from eventstreamd_spark.operators import skew as sk
from eventstreamd_spark.session import load_table


def test_salted_topk_exact_under_planted_skew(spark) -> None:
    """Salted two-phase top-k equals the unsalted collect_list answer
    on a fixture where one key owns 60% of rows — exactness is salt-
    assignment-independent (top-k of per-salt top-k's is top-k)."""
    df = spark.range(5000).select(
        F.when(F.col("id") % 10 < 6, F.lit(7)).otherwise(
            F.pmod(F.col("id"), F.lit(50))
        ).alias("k"),
        (F.col("id") % 997).cast("double").alias("v"),
    )
    got = {
        r["k"]: r["topk"]
        for r in sk.salted_topk(df, "k", "v", k=5).collect()
    }
    want = {
        r["k"]: r["topk"]
        for r in df.groupBy("k")
        .agg(
            F.slice(
                F.sort_array(F.collect_list("v"), asc=False), 1, 5
            ).alias("topk")
        )
        .collect()
    }
    assert got == want


def test_salted_topk_pads_short_groups(spark, sf_dir) -> None:
    """Groups with fewer than k values return all of them; the
    registered projection null-pads to fixed columns."""
    df = spark.createDataFrame(
        [(1, 2.0), (1, 1.0), (2, 9.0)], "user_id bigint, value double"
    )
    rows = {
        r["user_id"]: r["topk"]
        for r in sk.salted_topk(df, "user_id", "value", k=5).collect()
    }
    assert rows[1] == [2.0, 1.0]
    assert rows[2] == [9.0]
    # registered projection over real data: no exceptions, v1 >= v2
    from eventstreamd_spark.queries_registry import QUERIES

    out = QUERIES["salted_topk_values"](spark, sf_dir)
    row = out.filter(F.col("v2").isNotNull()).first()
    if row is not None:
        assert row["v1"] >= row["v2"]
