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


# ---------------------------------------------------------------------------
# Snapshot diff — what changed between two table versions
# ---------------------------------------------------------------------------

DIFF_ADD_CUTOFF = "2001-06-01"  # v2-only rows: the newest ingest slice
DIFF_UPDATE_MOD = 97            # v2 bumps totalprice where key % 97 == 0
DIFF_DELETE_MOD = 101           # v2 drops rows where key % 101 == 3


def _diff_versions(orders: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Two deterministic snapshots of the orders table: v1 lacks the
    newest slice; v2 applies updates and deletes.  Stands in for two
    lakehouse table versions."""
    cut = F.lit(DIFF_ADD_CUTOFF).cast("timestamp")
    v1 = orders.filter(F.col("o_orderdate") < cut)
    v2 = orders.filter(F.col("o_orderkey") % DIFF_DELETE_MOD != 3).withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % DIFF_UPDATE_MOD == 0,
            F.col("o_totalprice") + F.lit(1000.0),
        ).otherwise(F.col("o_totalprice")),
    )
    return v1, v2


def snapshot_diff(orders: DataFrame) -> DataFrame:
    """Row- and column-level diff between two table versions — the
    lakehouse time-travel comparison (Delta DESCRIBE HISTORY's "what
    actually changed") as one full-outer join.

    One shuffle on the key; per-row status (added/removed/changed/
    unchanged) and per-column change counters fold into a single
    aggregate — no per-column passes.  Doubles compare by equality of
    identical stored values (bit-stable through parquet), not
    arithmetic.  At 100 TB both sides bucket on the key and the join
    is co-located; the diff summary is O(1) output.
    """
    v1, v2 = _diff_versions(orders)
    # presence comes from explicit marker columns, NOT payload
    # nullness: a version row whose payload columns are all NULL is
    # still present (the twin keys presence off the join key the same
    # way)
    a = v1.select(
        F.col("o_orderkey").alias("k"),
        F.col("o_totalprice").alias("a_price"),
        F.col("o_orderstatus").alias("a_status"),
        F.lit(1).alias("a_mark"),
    )
    b = v2.select(
        F.col("o_orderkey").alias("k"),
        F.col("o_totalprice").alias("b_price"),
        F.col("o_orderstatus").alias("b_status"),
        F.lit(1).alias("b_mark"),
    )
    j = a.join(b, "k", "full_outer")
    in_a = F.col("a_mark").isNotNull()
    in_b = F.col("b_mark").isNotNull()
    price_chg = in_a & in_b & (F.col("a_price") != F.col("b_price"))
    status_chg = in_a & in_b & (F.col("a_status") != F.col("b_status"))
    status = (
        F.when(~in_a, F.lit("added"))
        .when(~in_b, F.lit("removed"))
        .when(price_chg | status_chg, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return (
        j.groupBy(status.alias("row_status"))
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.sum(price_chg.cast("int")).cast("bigint").alias("n_price_changed"),
            F.sum(status_chg.cast("int")).cast("bigint").alias("n_status_changed"),
        )
    )


def sql_snapshot_diff(orders: str = "orders") -> str:
    return f"""
WITH v1 AS (
  SELECT o_orderkey, o_totalprice, o_orderstatus FROM {orders}
  WHERE o_orderdate < TIMESTAMP '{DIFF_ADD_CUTOFF}'
),
v2 AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % {DIFF_UPDATE_MOD} = 0
              THEN o_totalprice + 1000.0 ELSE o_totalprice END
           AS o_totalprice,
         o_orderstatus
  FROM {orders} WHERE o_orderkey % {DIFF_DELETE_MOD} != 3
),
j AS (
  SELECT coalesce(a.o_orderkey, b.o_orderkey) AS k,
         a.o_totalprice AS a_price, a.o_orderstatus AS a_status,
         b.o_totalprice AS b_price, b.o_orderstatus AS b_status,
         (a.o_orderkey IS NOT NULL) AS in_a,
         (b.o_orderkey IS NOT NULL) AS in_b
  FROM v1 a FULL OUTER JOIN v2 b ON a.o_orderkey = b.o_orderkey
),
flagged AS (
  SELECT *,
         (in_a AND in_b AND a_price != b_price) AS price_chg,
         (in_a AND in_b AND a_status != b_status) AS status_chg
  FROM j
)
SELECT CASE WHEN NOT in_a THEN 'added'
            WHEN NOT in_b THEN 'removed'
            WHEN price_chg OR status_chg THEN 'changed'
            ELSE 'unchanged' END AS row_status,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CASE WHEN price_chg THEN 1 ELSE 0 END) AS BIGINT)
         AS n_price_changed,
       CAST(sum(CASE WHEN status_chg THEN 1 ELSE 0 END) AS BIGINT)
         AS n_status_changed
FROM flagged
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Cascade delete report (right-to-be-forgotten propagation)
# ---------------------------------------------------------------------------

FORGET_MODULUS = 97  # deterministic stand-in for a real deletion-request list


def cascade_delete_report(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    modulus: int = FORGET_MODULUS,
) -> DataFrame:
    """GDPR/CCPA delete propagation audit: given a deletion-request key
    set (here: c_custkey % modulus == 0, a deterministic stand-in for
    the request table), report — per table along the FK cascade
    customer -> orders -> lineitem — how many rows the delete removes,
    how many remain, and an exact DECIMAL checksum (key sum) of the
    SURVIVING rows, so downstream replicas can verify the post-delete
    state without exchanging the rows themselves.

    Plan at 100 TB: the request set is broadcast (deletion batches are
    small); orders resolves deletions with one broadcast semi-join; the
    lineitem hop joins on the DOOMED ORDER KEYS — also broadcast-sized
    (|doomed customers| x orders-per-customer), so no fact-to-fact
    shuffle anywhere.  Each per-table report row is one conditional
    aggregate over a single scan: n_deleted + n_remaining + checksum in
    the same pass, never a delete-then-rescan.
    """
    dec = "decimal(38,0)"
    doomed_cust = customer.filter(
        F.col("c_custkey") % modulus == 0
    ).select("c_custkey")
    doomed_orders = orders.join(
        F.broadcast(doomed_cust),
        orders["o_custkey"] == doomed_cust["c_custkey"],
    ).select("o_orderkey")

    def report(df: DataFrame, table: str, key: str, doom_flag) -> DataFrame:
        # checksum accumulates in DECIMAL(38,0) (exact at any scale);
        # the BIGINT output cast holds to key sums < 2^63 — ~6e9 rows
        # of 3e9-ish keys overflow it LOUDLY (ANSI cast), the signal to
        # widen the output column, never a silent wrap
        return (
            df.select(
                doom_flag.cast("int").alias("doomed"),
                F.col(key).alias("k"),
            )
            .groupBy(F.lit(table).alias("table_name"))
            .agg(
                F.sum("doomed").cast("bigint").alias("n_deleted"),
                (F.count(F.lit(1)) - F.sum("doomed"))
                .cast("bigint")
                .alias("n_remaining"),
                F.sum(
                    F.when(F.col("doomed") == 0, F.col("k"))
                    .otherwise(0)
                    .cast(dec)
                )
                .cast("bigint")
                .alias("surviving_key_sum"),
            )
        )

    cust_rep = report(
        customer, "customer", "c_custkey",
        F.col("c_custkey") % modulus == 0,
    )
    ord_rep = report(
        orders.join(
            F.broadcast(doomed_cust.select(F.col("c_custkey").alias("dk"))),
            orders["o_custkey"] == F.col("dk"),
            "left",
        ),
        "orders", "o_orderkey", F.col("dk").isNotNull(),
    )
    li_rep = report(
        lineitem.join(
            F.broadcast(doomed_orders.select(F.col("o_orderkey").alias("dok"))),
            lineitem["l_orderkey"] == F.col("dok"),
            "left",
        ),
        "lineitem", "l_orderkey", F.col("dok").isNotNull(),
    )
    return cust_rep.unionByName(ord_rep).unionByName(li_rep)


def sql_cascade_delete_report(
    customer: str = "customer",
    orders: str = "orders",
    lineitem: str = "lineitem",
    modulus: int = FORGET_MODULUS,
) -> str:
    """DuckDB twin of cascade_delete_report (same request-set rule,
    cascade hops, and exact surviving-key checksums)."""
    return f"""
WITH doomed_cust AS (
  SELECT c_custkey FROM {customer} WHERE c_custkey % {modulus} = 0
),
doomed_orders AS (
  SELECT o_orderkey FROM {orders} o
  JOIN doomed_cust d ON o.o_custkey = d.c_custkey
)
SELECT 'customer' AS table_name,
       CAST(sum(CASE WHEN c_custkey % {modulus} = 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_deleted,
       CAST(count(*) - sum(CASE WHEN c_custkey % {modulus} = 0
                                THEN 1 ELSE 0 END) AS BIGINT) AS n_remaining,
       CAST(sum(CAST(CASE WHEN c_custkey % {modulus} = 0 THEN 0
                ELSE c_custkey END AS HUGEINT)) AS BIGINT)
         AS surviving_key_sum
FROM {customer}
UNION ALL
SELECT 'orders',
       CAST(sum(CASE WHEN d.c_custkey IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT),
       CAST(count(*) - sum(CASE WHEN d.c_custkey IS NOT NULL
                                THEN 1 ELSE 0 END) AS BIGINT),
       CAST(sum(CAST(CASE WHEN d.c_custkey IS NOT NULL THEN 0
                ELSE o.o_orderkey END AS HUGEINT)) AS BIGINT)
FROM {orders} o LEFT JOIN doomed_cust d ON o.o_custkey = d.c_custkey
UNION ALL
SELECT 'lineitem',
       CAST(sum(CASE WHEN k.o_orderkey IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT),
       CAST(count(*) - sum(CASE WHEN k.o_orderkey IS NOT NULL
                                THEN 1 ELSE 0 END) AS BIGINT),
       CAST(sum(CAST(CASE WHEN k.o_orderkey IS NOT NULL THEN 0
                ELSE l.l_orderkey END AS HUGEINT)) AS BIGINT)
FROM {lineitem} l LEFT JOIN doomed_orders k
  ON l.l_orderkey = k.o_orderkey
"""


# ---------------------------------------------------------------------------
# Changelog compaction (latest-wins upserts + tombstones)
# ---------------------------------------------------------------------------


def changelog_compaction(events: DataFrame) -> DataFrame:
    """Compact an upsert/tombstone changelog to current state — the
    maintenance pass every CDC-fed table needs (Kafka log compaction /
    Delta-Hudi compaction semantics): keep only each key's LATEST
    record, and drop the key entirely when that latest record is a
    tombstone.

    The event stream is read as a changelog keyed by user_id: an
    ``error`` event is the tombstone sentinel (account torn down), any
    other event upserts the user's state with its value; (ts, event_id)
    is the total version order.  Output, per SURVIVING key: the live
    version's id and value, total versions absorbed, and how many
    tombstones the history contained (a resurrected account shows
    n_tombstones > 0 — the audit column compaction debugging wants).

    Scale: ONE descending time window per key yields the version rank,
    version count, and tombstone count in a single pass (distributed
    by user_id, the same shape as sessionization); the filter keeps
    one row per key, so output is |keys| rows and nothing shuffles
    after the window sort.  At 100 TB the changelog arrives
    partitioned by key from the CDC source, so the window sort is
    partition-local.  All columns are exact (BIGINT counts, cent-exact
    value passthrough).
    """
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    wall = Window.partitionBy("user_id")
    is_tomb = (F.col("event_type") == "error").cast("bigint")
    ranked = events.select(
        "user_id",
        "event_id",
        "value",
        is_tomb.alias("tomb"),
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wall).cast("bigint").alias("n_versions"),
        F.sum(is_tomb).over(wall).cast("bigint").alias("n_tombstones"),
    )
    return ranked.filter((F.col("rn") == 1) & (F.col("tomb") == 0)).select(
        "user_id",
        F.col("event_id").alias("live_event_id"),
        F.col("value").alias("live_value"),
        "n_versions",
        "n_tombstones",
    )


def sql_changelog_compaction(table: str = "events") -> str:
    return f"""
WITH ranked AS (
  SELECT user_id, event_id, value,
         CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS tomb,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn,
         CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS n_versions,
         CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
              OVER (PARTITION BY user_id) AS BIGINT) AS n_tombstones
  FROM {table}
)
SELECT user_id,
       event_id AS live_event_id,
       value AS live_value,
       n_versions,
       n_tombstones
FROM ranked WHERE rn = 1 AND tomb = 0
"""
