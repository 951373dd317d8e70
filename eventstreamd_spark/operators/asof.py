"""As-of join — for each left row, the latest right row at-or-before its
timestamp, per key.

Spark has no native as-of join; the naive formulations are a range
cross-join (O(n*m) per key) or a per-key ``merge_asof`` in pandas
(Python-side).  This implementation is the scalable union-merge idiom:

    1. tag both sides and UNION them on (key, ts);
    2. one window over (key) ordered by (ts, side, ...) — right rows
       sort before left rows at equal ts, giving <= semantics;
    3. ``last(value, ignorenulls=True)`` over the unbounded-preceding
       frame carries the most recent right-side payload forward;
    4. keep left rows.

Cost: ONE shuffle on the key + a per-partition sort — the same price as
a regular sort-merge join, no row explosion, no Python.  Skewed keys
are handled by AQE the same way a join would be.  This mirrors how
streaming engines express temporal joins (ordered merge + state carry).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    left_cols: list[str],
) -> DataFrame:
    """Latest right row with right_ts <= left_ts per key.

    Returns left_cols + value_cols (NULL where no right row precedes).
    Right-side ties on ts resolve to the row with the greatest
    value_cols[0] (deterministic).
    """
    order_col = value_cols[0]
    r = right.select(
        F.col(right_key).alias("__k"),
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"__v_{c}") for c in value_cols],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols],
    )
    l = left.select(
        F.col(left_key).alias("__k"),
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__v_{c}") for c in value_cols],
        *[F.col(c) for c in left_cols],
    )
    unioned = r.unionByName(l)
    w = (
        W.partitionBy("__k")
        .orderBy("__t", "__side", f"__v_{order_col}")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(f"__v_{c}", ignorenulls=True).over(w).alias(c)
            for c in value_cols
        ],
    )
    return carried.filter(F.col("__side") == 1).select(*left_cols, *value_cols)


def asof_join_oracle_sql(
    left_table: str,
    right_table: str,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    left_cols: list[str],
) -> str:
    """DuckDB twin using the same union+window formulation (engine-neutral
    ANSI window SQL, so tie semantics match exactly)."""
    order_col = value_cols[0]
    v_nulls = ", ".join(f"NULL AS __v_{c}" for c in value_cols)
    v_sel = ", ".join(f"{c} AS __v_{c}" for c in value_cols)
    l_nulls = ", ".join(f"NULL AS {c}" for c in left_cols)
    l_sel = ", ".join(left_cols)
    carries = ", ".join(
        f"last_value(__v_{c} IGNORE NULLS) OVER "
        f"(PARTITION BY __k ORDER BY __t, __side, __v_{order_col} "
        f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS {c}"
        for c in value_cols
    )
    return f"""
WITH u AS (
  SELECT {right_key} AS __k, {right_ts} AS __t, 0 AS __side, {v_sel}, {l_nulls}
  FROM {right_table}
  UNION ALL BY NAME
  SELECT {left_key} AS __k, {left_ts} AS __t, 1 AS __side, {v_nulls}, {l_sel}
  FROM {left_table}
), w AS (
  SELECT *, {carries} FROM u
)
SELECT {l_sel}, {", ".join(value_cols)} FROM w WHERE __side = 1
"""


def asof_join_tolerance(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    left_cols: list[str],
    tolerance_days: int,
) -> DataFrame:
    """As-of join with a staleness bound (pandas ``merge_asof``'s
    ``tolerance``): the latest preceding right row matches only while
    it is at most ``tolerance_days`` old at the left timestamp; staler
    matches null out — the freshness contract a feature-store lookup
    enforces (a year-old customer state is not a feature, it is a
    leak).

    Same single union-merge shuffle as asof_join — the matched
    right_ts rides along as one more carried column and one narrow
    post-projection applies the bound; no second join, no range probe.
    Output adds ``match_age_days`` (NULL where no fresh match).
    """
    carried = asof_join(
        left,
        right.select(*dict.fromkeys([right_key, right_ts, *value_cols])),
        left_key,
        right_key,
        left_ts,
        right_ts,
        value_cols=[*value_cols, right_ts],
        left_cols=[*left_cols, left_ts],
    )
    age = F.datediff(
        F.col(left_ts).cast("date"), F.col(right_ts).cast("date")
    )
    fresh = age <= tolerance_days
    return carried.select(
        *left_cols,
        *[
            F.when(fresh, F.col(c)).otherwise(F.lit(None)).alias(c)
            for c in value_cols
        ],
        F.when(fresh, age.cast("bigint")).alias("match_age_days"),
    )


def sql_asof_join_tolerance(
    left_table: str,
    right_table: str,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    left_cols: list[str],
    tolerance_days: int,
) -> str:
    """DuckDB twin: the plain as-of oracle with the same staleness
    post-projection."""
    inner = asof_join_oracle_sql(
        left_table,
        right_table,
        left_key,
        right_key,
        left_ts,
        right_ts,
        value_cols=[*value_cols, right_ts],
        left_cols=[*left_cols, left_ts],
    )
    age = f"datediff('day', CAST({right_ts} AS DATE), CAST({left_ts} AS DATE))"
    vals = ", ".join(
        f"CASE WHEN {age} <= {tolerance_days} THEN {c} END AS {c}"
        for c in value_cols
    )
    lcols = ", ".join(left_cols)
    return f"""
SELECT {lcols}, {vals},
       CASE WHEN {age} <= {tolerance_days}
            THEN CAST({age} AS BIGINT) END AS match_age_days
FROM ({inner})
"""
