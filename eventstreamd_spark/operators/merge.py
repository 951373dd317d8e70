"""Upsert / MERGE INTO semantics as a pure DataFrame program.

The reference has no persistence at all (SURVEY.md §2 absence list); a
warehouse built on this engine needs CDC-style upserts.  Without a
transactional table format, MERGE decomposes into a full-outer join on
the key plus per-column precedence — which is exactly what table
formats execute under the hood (minus the commit protocol, which is
the storage layer's job, not the dataflow's).

Scale: one shuffle on the merge key for both sides (or a broadcast if
the update batch is small — the common CDC case, flagged via
``broadcast_updates``).  Column values resolve update-wins via
coalesce; a delete marker column can be filtered before the merge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def merge_upsert(
    base: DataFrame,
    updates: DataFrame,
    key: str,
    broadcast_updates: bool = True,
) -> DataFrame:
    """MERGE updates INTO base ON key: matched rows take the update's
    columns, unmatched base rows pass through, brand-new keys insert.

    Both sides must share a schema.  update-wins is per-row (not
    per-column CDC patching — that variant coalesces column-wise).
    """
    cols = base.columns
    if updates.columns != cols:
        raise ValueError(f"schema mismatch: {updates.columns} vs {cols}")
    u = F.broadcast(updates) if broadcast_updates else updates
    u = u.select([F.col(c).alias(f"__u_{c}") for c in cols])
    joined = base.join(u, base[key] == u[f"__u_{key}"], "full_outer")
    return joined.select(
        *[
            F.coalesce(F.col(f"__u_{c}"), F.col(c)).alias(c)
            for c in cols
        ]
    )


def sql_merge_upsert(base: str, updates: str, key: str, cols: list[str]) -> str:
    sel = ", ".join(
        f"coalesce(u.{c}, b.{c}) AS {c}" for c in cols
    )
    return (
        f"SELECT {sel} FROM {base} b FULL OUTER JOIN {updates} u "
        f"ON b.{key} = u.{key}"
    )


def scd2_history(
    changes: DataFrame,
    key: str,
    ts: str,
    attrs: list[str],
    tiebreak: str,
) -> DataFrame:
    """Build a type-2 slowly-changing-dimension history from a change
    stream: one row per version with a validity interval
    [valid_from, valid_to) and an is_current flag — the other half of
    CDC next to merge_upsert (type-1 overwrites; type-2 keeps every
    version so point-in-time joins reproduce any past state).

    valid_to = lead(valid_from) over the key's change order; the open
    interval of the latest version is NULL/is_current.  One window,
    partitioned by the dimension key — embarrassingly parallel at any
    scale (no global ordering exists or is needed).  ``tiebreak``
    makes the version order total when two changes share a timestamp.
    """
    from pyspark.sql import Window as W

    w = W.partitionBy(key).orderBy(ts, tiebreak)
    return changes.select(
        key,
        *attrs,
        F.col(ts).alias("valid_from"),
        F.col(tiebreak).alias("__tb"),
    ).select(
        key,
        *attrs,
        F.row_number().over(
            W.partitionBy(key).orderBy("valid_from", "__tb")
        ).cast("bigint").alias("version_seq"),
        "valid_from",
        F.lead("valid_from").over(
            W.partitionBy(key).orderBy("valid_from", "__tb")
        ).alias("valid_to"),
        F.lead("valid_from")
        .over(W.partitionBy(key).orderBy("valid_from", "__tb"))
        .isNull()
        .alias("is_current"),
    )


def sql_scd2_history(
    table: str, key: str, ts: str, attrs: list[str], tiebreak: str
) -> str:
    a = ", ".join(attrs)
    return f"""
SELECT {key}, {a},
       CAST(row_number() OVER w AS BIGINT) AS version_seq,
       {ts} AS valid_from,
       lead({ts}) OVER w AS valid_to,
       lead({ts}) OVER w IS NULL AS is_current
FROM {table}
WINDOW w AS (PARTITION BY {key} ORDER BY {ts}, {tiebreak})
"""


# ---------------------------------------------------------------------------
# Incremental view maintenance — merge partial aggregates, don't recompute
# ---------------------------------------------------------------------------

IVM_CUTOFF = "1997-01-01"


def _ivm_partials(orders: DataFrame) -> DataFrame:
    """Mergeable partial-aggregate state for the revenue view: counts
    add, DECIMAL sums add exactly (order-independent — the whole reason
    the float sum is decimal here), max merges by max."""
    return orders.groupBy("o_orderpriority").agg(
        F.count("*").cast("bigint").alias("p_count"),
        F.sum(F.col("o_totalprice").cast("decimal(18,4)")).alias("p_sum"),
        F.max("o_totalprice").alias("p_max"),
    )


def ivm_priority_revenue(orders: DataFrame, cutoff: str = IVM_CUTOFF) -> DataFrame:
    """Incrementally-maintained per-priority revenue view.

    The materialized view pattern at 100 TB: the base aggregate over
    the historical partition is computed ONCE (here: orders before
    ``cutoff``); each new batch (orders at/after ``cutoff``) folds in
    by merging partial-aggregate STATE — count/sum/max are all
    associative+commutative, so refresh cost is O(|delta| + |keys|),
    never O(|history|).  avg is derived at read time from merged
    sum/count (the classic algebraic-aggregate decomposition); the
    decimal sum keeps the merge bit-exact in any order, so the
    incremental result is hash-identical to a full recompute — which is
    exactly what the DuckDB oracle asserts.

    The two scans here stand in for "stored state + new batch"; a real
    deployment persists the partial table and scans only the delta.
    """
    cut = F.lit(cutoff).cast("timestamp")
    base = _ivm_partials(orders.filter(F.col("o_orderdate") < cut))
    delta = _ivm_partials(orders.filter(F.col("o_orderdate") >= cut))
    merged = (
        base.unionByName(delta)
        .groupBy("o_orderpriority")
        .agg(
            F.sum("p_count").cast("bigint").alias("n_orders"),
            F.sum("p_sum").alias("m_sum"),
            F.max("p_max").alias("max_price"),
        )
    )
    return merged.select(
        "o_orderpriority",
        "n_orders",
        F.col("m_sum").cast("double").alias("total_revenue"),
        (F.col("m_sum").cast("double") / F.col("n_orders")).alias("avg_revenue"),
        "max_price",
    )


def sql_ivm_priority_revenue(orders: str = "orders") -> str:
    """Oracle: the full recompute the incremental plan must equal."""
    return f"""
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
         AS total_revenue,
       (CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
          / count(*)) AS avg_revenue,
       max(o_totalprice) AS max_price
FROM {orders}
GROUP BY o_orderpriority
"""
