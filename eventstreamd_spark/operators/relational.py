"""Layer-B relational operators: aggregation, joins, windows, top-k,
set operations, grouping sets.

The reference has NONE of these (SURVEY.md §2 absence list) — its only
aggregation is over operational metadata.  This module is the scale-out
analytics surface, written so every function is a declarative
DataFrame program Catalyst can optimize: filters sit next to scans
(pushdown), small dimension tables are broadcast explicitly, and
aggregates use exact decimal arithmetic (functions/exact.py) so results
are reproducible across engines and partitionings.

Scale notes per operator are in the docstrings; the common themes:
- one shuffle per groupBy/join on the declared keys, map-side partials;
- broadcast for dimensions (region/nation/customer at 100 TB:
  region/nation always; customer only if it fits — noted);
- window functions shuffle once on the partition key, then sort within
  partitions — the partition key choice is the scalability decision.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

from eventstreamd_spark.functions.exact import (
    davg,
    dmul,
    dsum,
    dsum_expr,
    one_minus,
    sql_dmul,
    sql_dsum,
    sql_one_minus,
)


def pricing_summary(lineitem: DataFrame, cutoff: str = "1998-09-02") -> DataFrame:
    """TPC-H Q1 shape: scan-filter-aggregate over the fact table.

    At 100 TB this is the canonical map-heavy query: the date filter
    prunes at the parquet level (min/max stats), partial aggregation
    collapses each task's rows to <=6 groups (returnflag x linestatus),
    and the final shuffle moves only a handful of rows.  No joins, one
    shuffle, all codegen.
    """
    disc_price = dmul(F.col("l_extendedprice"), one_minus(F.col("l_discount")))
    charge = disc_price * (F.lit(1).cast("decimal(18,4)") + F.col("l_tax").cast("decimal(18,4)"))
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit(cutoff).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum_expr(disc_price, "sum_disc_price"),
            dsum_expr(charge, "sum_charge"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


def top_revenue_orders(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    segment: str = "BUILDING",
    k: int = 10,
) -> DataFrame:
    """TPC-H Q3 shape: selective dimension -> fact join chain + top-k.

    Join strategy at scale: customer filtered on segment is small
    relative to the facts -> broadcast it into orders (kills one
    shuffle); orders⨝lineitem stays a shuffle (sort-merge / AQE's
    choice) on l_orderkey.  Top-k runs as a final single-partition
    take over pre-aggregated rows (one row per order), which is tiny.
    deterministic: revenue is exact decimal; ties broken by o_orderkey.
    """
    cust = customer.filter(F.col("c_mktsegment") == segment).select("c_custkey")
    revenue = dmul(F.col("l_extendedprice"), one_minus(F.col("l_discount")))
    joined = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum_expr(revenue, "revenue"))
    )
    return joined.orderBy(F.desc("revenue"), F.asc("o_orderkey")).limit(k)


def brand_revenue(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """Broadcast-join enrichment: fact ⨝ small dimension, aggregate by
    dimension attribute.  ``part`` is explicitly broadcast — at 100 TB a
    part dimension in the millions still fits comfortably; if it did
    not, AQE would fall back to shuffle join, same plan shape."""
    revenue = dmul(F.col("l_extendedprice"), one_minus(F.col("l_discount")))
    return (
        lineitem.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(
            dsum_expr(revenue, "revenue"),
            dsum("l_quantity", "sum_qty"),
            F.count("*").alias("n_items"),
        )
    )


def nation_order_rollup(
    customer: DataFrame, orders: DataFrame, nation: DataFrame
) -> DataFrame:
    """ROLLUP over a join: per (nation, orderstatus) + subtotals + grand
    total.  Both dims broadcast; rollup costs one shuffle with grouping
    sets expanded map-side."""
    j = orders.join(
        F.broadcast(customer.select("c_custkey", "c_nationkey")),
        F.col("o_custkey") == F.col("c_custkey"),
    ).join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
    return j.rollup("n_name", "o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        dsum("o_totalprice", "sum_price"),
    )


def status_cube(lineitem: DataFrame) -> DataFrame:
    """CUBE: all grouping-set combinations of (returnflag, linestatus)."""
    return lineitem.cube("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n_items"),
        dsum("l_quantity", "sum_qty"),
    )


ORDER_STATUSES = ("F", "O", "P")


def priority_status_pivot(orders: DataFrame) -> DataFrame:
    """PIVOT: order counts per priority, statuses spread into columns.

    The pivot value list is EXPLICIT — with it Spark skips the extra
    distinct-scan job it otherwise runs to discover the columns, and
    the output schema is deterministic.  That is also the 100 TB rule:
    a pivot over unbounded distinct values is a schema explosion;
    bound it or use groupBy.  Absent combinations are coalesced to 0
    (count semantics, matching conditional aggregation).
    """
    piv = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", list(ORDER_STATUSES))
        .agg(F.count(F.lit(1)))
    )
    return piv.select(
        "o_orderpriority",
        *[
            F.coalesce(F.col(f"`{s}`"), F.lit(0)).alias(s)
            for s in ORDER_STATUSES
        ],
    )


def sql_priority_status_pivot(table: str = "orders") -> str:
    """DuckDB twin: conditional aggregation (the pivot's definition)."""
    cols = ", ".join(
        f"count(*) FILTER (WHERE o_orderstatus = '{s}') AS \"{s}\""
        for s in ORDER_STATUSES
    )
    return f"SELECT o_orderpriority, {cols} FROM {table} GROUP BY o_orderpriority"


UNPIVOT_METRICS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


def lineitem_metrics_unpivot(lineitem: DataFrame) -> DataFrame:
    """UNPIVOT (melt): wide metric columns -> long (metric, value) rows.

    Pure narrow projection+generate — no shuffle, row count is
    len(values) x input, so at 100 TB unpivot ONLY the columns you need
    (column pruning still reaches the scan for the id/value set).
    """
    return lineitem.unpivot(
        ids=["l_orderkey", "l_linenumber"],
        values=list(UNPIVOT_METRICS),
        variableColumnName="metric",
        valueColumnName="value",
    )


def sql_lineitem_metrics_unpivot(table: str = "lineitem") -> str:
    """DuckDB twin: the UNION ALL that defines unpivot."""
    parts = [
        f"SELECT l_orderkey, l_linenumber, '{m}' AS metric, {m} AS value "
        f"FROM {table}"
        for m in UNPIVOT_METRICS
    ]
    return " UNION ALL ".join(parts)


def topk_orders_per_customer(orders: DataFrame, k: int = 3) -> DataFrame:
    """Window top-k per group: row_number over (custkey, price desc).

    One shuffle on o_custkey, per-partition sort; no global sort.  This
    is the scalable top-k idiom — a global orderBy().limit() would
    funnel everything to one partition."""
    w = W.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rk")
    )


def supplier_running_total(lineitem: DataFrame) -> DataFrame:
    """Running (prefix) sum per supplier in shipdate order.

    Frame = ROWS UNBOUNDED PRECEDING..CURRENT; fully deterministic
    ordering (shipdate, orderkey, linenumber) and exact decimal sums so
    the prefix values are engine-identical.  Shuffles once on suppkey."""
    w = (
        W.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return lineitem.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.sum(F.col("l_quantity").cast("decimal(18,4)"))
        .over(w)
        .cast("double")
        .alias("running_qty"),
    )


def trailing_window_spend(orders: DataFrame, days: int = 7) -> DataFrame:
    """Time-RANGE window frame: each order's trailing ``days``-day spend
    for its customer (RANGE BETWEEN INTERVAL, not ROWS — the frame is
    defined by event-time distance, so it is insensitive to tie order
    and row count).  Decimal-exact sum (functions/exact.py) keeps the
    result reproducible across engines and partitionings.  One shuffle
    on the partition key; the sort is per-partition.
    """
    from eventstreamd_spark.functions.exact import DEC

    # NTZ has no direct long cast; via TIMESTAMP with the session pinned
    # to UTC the epoch matches DuckDB's epoch() of the same naive value
    epoch = F.col("o_orderdate").cast("timestamp").cast("long")
    w = (
        W.partitionBy("o_custkey")
        .orderBy(epoch)
        .rangeBetween(-days * 86400, 0)
    )
    spend = (
        F.sum(F.col("o_totalprice").cast(DEC)).over(w).cast("double")
    )
    return orders.select(
        "o_orderkey", "o_custkey", spend.alias("trailing_spend")
    )


def sql_trailing_window_spend(table: str = "orders", days: int = 7) -> str:
    secs = days * 86400
    return (
        "SELECT o_orderkey, o_custkey, "
        "CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) OVER ("
        "PARTITION BY o_custkey ORDER BY CAST(epoch(o_orderdate) AS BIGINT) "
        f"RANGE BETWEEN {secs} PRECEDING AND CURRENT ROW) AS DOUBLE) "
        f"AS trailing_spend FROM {table}"
    )


def lag_lead_order_gaps(orders: DataFrame) -> DataFrame:
    """lag/lead: per-customer inter-order gap in days."""
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev = F.lag("o_orderdate").over(w)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.datediff(F.col("o_orderdate"), prev).alias("days_since_prev"),
        F.row_number().over(w).alias("order_seq"),
    )


def users_error_except_purchase(events: DataFrame, threshold: float = 195.0) -> DataFrame:
    """Set difference: users with a high-value error event but no
    high-value purchase."""
    err = (
        events.filter((F.col("event_type") == "error") & (F.col("value") > threshold))
        .select("user_id").distinct()
    )
    pur = (
        events.filter((F.col("event_type") == "purchase") & (F.col("value") > threshold))
        .select("user_id").distinct()
    )
    return err.subtract(pur)


def users_error_and_purchase(events: DataFrame) -> DataFrame:
    """Set intersection."""
    err = events.filter(F.col("event_type") == "error").select("user_id").distinct()
    pur = events.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    return err.intersect(pur)


def customers_without_orders(
    customer: DataFrame, orders: DataFrame, min_price: float = 400000.0
) -> DataFrame:
    """Anti join (NOT EXISTS): customers with no order above min_price.
    Catalyst turns this into a broadcast or shuffled anti hash join; no
    data explosion either way, and the price filter prunes the build
    side before the join."""
    big = orders.filter(F.col("o_totalprice") > min_price)
    return customer.join(
        big, customer.c_custkey == big.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


def customers_with_orders(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """Semi join (EXISTS)."""
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_nationkey")


def order_priority_counts(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """TPC-H Q4 shape: EXISTS-style semi join + count by priority."""
    has_item = orders.join(
        lineitem.select("l_orderkey").distinct(),
        F.col("o_orderkey") == F.col("l_orderkey"),
        "left_semi",
    )
    return has_item.groupBy("o_orderpriority").agg(F.count("*").alias("n_orders"))


def local_supplier_volume(
    region: DataFrame,
    nation: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    region_name: str = "ASIA",
) -> DataFrame:
    """TPC-H Q5 shape: the deep multi-join chain — revenue per nation
    where the customer and the supplier sit in the same nation of one
    region.

    Join-order strategy at 100 TB: region (5 rows) and nation (25) are
    always-broadcast; customer and supplier are broadcast of the
    *pre-filtered* dim (region prunes ~80%); lineitem never moves — the
    fact table is only probed.  Catalyst + AQE pick the same shape from
    this declarative program: filters reach the scans, the dim chain
    folds into consecutive BroadcastHashJoins, and the single shuffle
    is the final groupBy(n_name).
    """
    nations_in_region = (
        nation.join(
            F.broadcast(region.filter(F.col("r_name") == region_name)),
            F.col("n_regionkey") == F.col("r_regionkey"),
        ).select("n_nationkey", "n_name")
    )
    cust = customer.join(
        F.broadcast(nations_in_region),
        F.col("c_nationkey") == F.col("n_nationkey"),
    ).select("c_custkey", F.col("n_nationkey").alias("cust_nationkey"))
    supp = supplier.join(
        F.broadcast(nations_in_region),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", "n_name", F.col("n_nationkey").alias("supp_nationkey"))
    return (
        lineitem.join(
            F.broadcast(orders.join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
                        .select("o_orderkey", "cust_nationkey")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .filter(F.col("cust_nationkey") == F.col("supp_nationkey"))
        .groupBy("n_name")
        .agg(dsum_expr(dmul(F.col("l_extendedprice"), one_minus(F.col("l_discount"))), "revenue"))
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


def revenue_grouping_sets(lineitem: DataFrame) -> DataFrame:
    """GROUPING SETS aggregation: per-returnflag, per-linestatus, and
    grand total in ONE pass over the fact table (one shuffle; Spark
    expands the sets map-side).  grouping_id disambiguates the NULLs of
    each set — the standard way to ship several rollup reports from a
    single scan instead of N scans."""
    return (
        lineitem.groupingSets(
            [["l_returnflag"], ["l_linestatus"], []],
            "l_returnflag",
            "l_linestatus",
        )
        .agg(
            F.grouping_id().alias("gid"),
            F.count("*").alias("n_rows"),
            dsum("l_quantity", "sum_qty"),
        )
        .select("l_returnflag", "l_linestatus", "gid", "n_rows", "sum_qty")
    )


def sql_revenue_grouping_sets(table: str = "lineitem") -> str:
    from eventstreamd_spark.functions.exact import sql_dsum

    return (
        "SELECT l_returnflag, l_linestatus, "
        "GROUPING(l_returnflag, l_linestatus) AS gid, "
        "count(*) AS n_rows, " + sql_dsum("l_quantity", "sum_qty")
        + f" FROM {table} GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())"
    )


def distinct_part_stats(lineitem: DataFrame) -> DataFrame:
    """Exact distinct-cardinality profile per return flag.

    count_distinct shuffles (key, value) pairs — exact but two-phase;
    this is the ground-truth twin of approx_distinct_parts below."""
    return lineitem.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        F.count("*").alias("n_rows"),
    )


def approx_distinct_parts(lineitem: DataFrame, rsd: float = 0.02) -> DataFrame:
    """HyperLogLog++ distinct counts: one pass, fixed-size sketch, no
    per-value shuffle — THE cardinality plan at 100 TB (exact distinct
    moves every distinct value; HLL moves a 1.5 KB sketch per group).
    Sketches are engine-specific, so the driver records a rows-only
    check; tests bound the relative error against the exact twin."""
    return lineitem.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd).alias("n_parts_approx"),
        F.count("*").alias("n_rows"),
    )


def approx_distinct_parts_checked(lineitem: DataFrame, rsd: float = 0.02) -> DataFrame:
    """Driver-checkable HLL twin: exact distinct count + a Spark-computed
    ``approx_ok`` flag asserting the sketch landed within 5*rsd of exact.

    The raw sketch estimate is engine-specific (DuckDB cannot reproduce
    Spark's HLL++ value bit-for-bit), so it feeds the bound check but is
    not projected; the oracle recomputes the exact columns and asserts
    the flag TRUE — turning the former rows-only row into a full
    value-hash row."""
    agg = lineitem.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts_exact"),
        F.approx_count_distinct("l_partkey", rsd).alias("_approx"),
        F.count("*").alias("n_rows"),
    )
    bound = F.abs(F.col("_approx") - F.col("n_parts_exact")) <= (
        F.col("n_parts_exact") * (5 * rsd)
    )
    return agg.select(
        "l_returnflag", "n_parts_exact", "n_rows", bound.alias("approx_ok")
    )


def sql_approx_distinct_parts_checked(table: str = "lineitem") -> str:
    return (
        f"SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts_exact, "
        f"count(*) AS n_rows, TRUE AS approx_ok FROM {table} GROUP BY l_returnflag"
    )


def approx_quantity_quantiles_checked(
    lineitem: DataFrame, accuracy: int = 10000, tol: float = 2.0
) -> DataFrame:
    """Driver-checkable sketch-percentile twin: exact per-group medians/
    quartiles + ``approx_ok`` asserting every approx_percentile is within
    ``tol`` of its exact counterpart (l_quantity spans 1..50; accuracy
    10000 bounds rank error far below that).  Same rationale as
    approx_distinct_parts_checked."""
    probs = ", ".join(str(p) for p in QUANTILE_PROBS)
    exact = F.expr(f"percentile(l_quantity, array({probs}))")
    approx = F.expr(f"approx_percentile(l_quantity, array({probs}), {accuracy})")
    agg = lineitem.groupBy("l_returnflag").agg(
        exact.alias("_e"), approx.alias("_a")
    )
    ok = F.lit(True)
    for i in range(len(QUANTILE_PROBS)):
        ok = ok & (F.abs(F.col("_a")[i] - F.col("_e")[i]) <= tol)
    return agg.select(
        "l_returnflag",
        F.col("_e")[0].alias("q25"),
        F.col("_e")[1].alias("q50"),
        F.col("_e")[2].alias("q75"),
        F.col("_e")[3].alias("q95"),
        ok.alias("approx_ok"),
    )


def sql_approx_quantity_quantiles_checked(table: str = "lineitem") -> str:
    cols = ", ".join(
        f"quantile_cont(l_quantity, {p}) AS q{int(p * 100)}"
        for p in QUANTILE_PROBS
    )
    return (
        f"SELECT l_returnflag, {cols}, TRUE AS approx_ok "
        f"FROM {table} GROUP BY l_returnflag"
    )


PRICE_BANDS = [
    (0, "budget", 0.0, 20000.0),
    (1, "mid", 20000.0, 45000.0),
    (2, "premium", 45000.0, 80000.0),
    (3, "luxury", 80000.0, 1e18),
]


def price_band_join(lineitem: DataFrame) -> DataFrame:
    """Range (theta) join: fact rows matched to a banded dimension by
    lo <= price < hi.  The band table is tiny => broadcast nested-loop
    join, which is exactly right: each row scans 4 broadcast rows,
    no shuffle of the fact side.  (A large range dim would instead be
    binned to an equi-key first — bin = floor(price/width) — turning
    the range join into an equi join plus a residual filter.)"""
    spark = lineitem.sparkSession
    bands = spark.createDataFrame(
        PRICE_BANDS, "band_id int, band string, lo double, hi double"
    )
    return (
        lineitem.join(
            F.broadcast(bands),
            (F.col("l_extendedprice") >= F.col("lo"))
            & (F.col("l_extendedprice") < F.col("hi")),
        )
        .groupBy("band_id", "band")
        .agg(F.count("*").alias("n_items"), dsum("l_extendedprice", "sum_price"))
    )


def sql_price_band_join(table: str = "lineitem") -> str:
    from eventstreamd_spark.functions.exact import sql_dsum

    values = ", ".join(
        f"({i}, '{b}', {lo}, {hi})" for i, b, lo, hi in PRICE_BANDS
    )
    return (
        f"SELECT band_id, band, count(*) AS n_items, "
        + sql_dsum("l_extendedprice", "sum_price")
        + f" FROM {table} JOIN (SELECT * FROM (VALUES {values}) "
        "v(band_id, band, lo, hi)) b ON l_extendedprice >= lo AND l_extendedprice < hi "
        "GROUP BY band_id, band"
    )


QUANTILE_PROBS = [0.25, 0.5, 0.75, 0.95]


def quantity_quantiles(lineitem: DataFrame) -> DataFrame:
    """Exact interpolated percentiles per group.

    ``percentile`` is exact: it sorts each group's values (a per-group
    shuffle+sort) — right when groups are few and answers must be
    reproducible.  At 100 TB with many groups the one-pass sketch twin
    (approx_quantity_quantiles) replaces it, same plan shape otherwise.
    """
    probs = ", ".join(str(p) for p in QUANTILE_PROBS)
    q = F.expr(f"percentile(l_quantity, array({probs}))")
    return lineitem.groupBy("l_returnflag").agg(
        q[0].alias("q25"), q[1].alias("q50"), q[2].alias("q75"), q[3].alias("q95")
    )


def sql_quantity_quantiles(table: str = "lineitem") -> str:
    cols = ", ".join(
        f"quantile_cont(l_quantity, {p}) AS q{int(p * 100)}"
        for p in QUANTILE_PROBS
    )
    return f"SELECT l_returnflag, {cols} FROM {table} GROUP BY l_returnflag"


def approx_quantity_quantiles(lineitem: DataFrame, accuracy: int = 10000) -> DataFrame:
    """KLL/GK-sketch percentiles: one pass, bounded memory, mergeable
    across partitions — the scale path for high-cardinality groups."""
    probs = ", ".join(str(p) for p in QUANTILE_PROBS)
    q = F.expr(f"approx_percentile(l_quantity, array({probs}), {accuracy})")
    return lineitem.groupBy("l_returnflag").agg(
        q[0].alias("q25"), q[1].alias("q50"), q[2].alias("q75"), q[3].alias("q95")
    )


def customer_order_distribution(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """TPC-H Q13 shape: LEFT OUTER join + two-level aggregation — the
    distribution of per-customer order counts, including zero-order
    customers (which only an outer join can surface).

    Scale: orders groups to one row per customer *before* anything wide
    happens downstream; the second aggregation runs over |customer| rows
    keyed by a small-cardinality count, so its shuffle is trivial.  The
    outer join shuffles on custkey once; AQE handles customer-side skew.
    """
    per_cust = (
        customer.join(
            orders, customer.c_custkey == orders.o_custkey, "left_outer"
        )
        .groupBy(customer.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


def sql_customer_order_distribution(
    customer: str = "customer", orders: str = "orders"
) -> str:
    return (
        "SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist FROM ("
        "SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count "
        f"FROM {customer} c LEFT OUTER JOIN {orders} o "
        "ON c.c_custkey = o.o_custkey GROUP BY c.c_custkey"
        ") GROUP BY c_count"
    )


def small_quantity_part_revenue(
    lineitem: DataFrame, part: DataFrame, brand: str = "Brand#3", factor: float = 0.5
) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar subquery (per-part average
    quantity), decorrelated into aggregate + join — the rewrite Catalyst
    would apply to the SQL form, stated explicitly in DataFrame ops.

    Scale: the per-part threshold aggregate collapses lineitem to one
    row per partkey (map-side partials), the brand dimension filter is
    broadcast, and the final join shuffles lineitem once on l_partkey.
    The threshold uses exact decimal avg so the `<` gate is
    engine-portable (no float-boundary flakiness in the oracle compare).
    """
    thresholds = lineitem.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (
            (F.sum(F.col("l_quantity").cast("decimal(18,4)")) / F.count("l_quantity"))
            * F.lit(factor).cast("decimal(18,4)")
        ).alias("qty_threshold")
    )
    brand_parts = part.filter(F.col("p_brand") == brand).select("p_partkey")
    return (
        lineitem.join(F.broadcast(brand_parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(thresholds, F.col("l_partkey") == F.col("t_partkey"))
        .filter(F.col("l_quantity").cast("decimal(18,4)") < F.col("qty_threshold"))
        .agg(
            dsum("l_extendedprice", "total_extprice"),
            F.count("*").alias("n_small_lineitems"),
        )
    )


def sql_small_quantity_part_revenue(
    brand: str = "Brand#3",
    factor: float = 0.5,
    lineitem: str = "lineitem",
    part: str = "part",
) -> str:
    return (
        f"SELECT {sql_dsum('l.l_extendedprice', 'total_extprice')}, "
        "CAST(COUNT(*) AS BIGINT) AS n_small_lineitems "
        f"FROM {lineitem} l JOIN {part} p ON l.l_partkey = p.p_partkey "
        f"WHERE p.p_brand = '{brand}' AND CAST(l.l_quantity AS DECIMAL(18,4)) < ("
        "SELECT (sum(CAST(l2.l_quantity AS DECIMAL(18,4))) / count(l2.l_quantity)) "
        f"* CAST({factor} AS DECIMAL(18,4)) "
        f"FROM {lineitem} l2 WHERE l2.l_partkey = l.l_partkey)"
    )


def rich_inactive_customers(
    customer: DataFrame, orders: DataFrame, min_price: float = 300000.0
) -> DataFrame:
    """TPC-H Q22 shape: global scalar subquery (average positive account
    balance) feeding a filter, then NOT EXISTS (anti join, here against
    large orders only), then a group count — three classic subquery
    patterns in one plan.

    Scale: the scalar aggregate is one number — broadcast it via a
    1-row cross join (Catalyst does exactly this for the SQL form).
    The anti join shuffles on custkey (or broadcasts the filtered
    customer side if it is the small one); the final per-nation
    aggregate is tiny.  Exact decimal avg keeps the `>` gate portable.
    """
    avg_bal = (
        customer.filter(F.col("c_acctbal") > 0)
        .agg(
            (
                F.sum(F.col("c_acctbal").cast("decimal(18,4)"))
                / F.count("c_acctbal")
            ).alias("avg_bal")
        )
    )
    rich = customer.crossJoin(F.broadcast(avg_bal)).filter(
        F.col("c_acctbal").cast("decimal(18,4)") > F.col("avg_bal")
    )
    big_orders = orders.filter(F.col("o_totalprice") > min_price)
    inactive = rich.join(
        big_orders, rich.c_custkey == big_orders.o_custkey, "left_anti"
    )
    return inactive.groupBy("c_nationkey").agg(
        F.count("*").alias("n_custs"),
        dsum("c_acctbal", "total_bal"),
    )


def sql_rich_inactive_customers(
    customer: str = "customer", orders: str = "orders", min_price: float = 300000.0
) -> str:
    return (
        "SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS n_custs, "
        f"{sql_dsum('c_acctbal', 'total_bal')} "
        f"FROM {customer} c WHERE CAST(c_acctbal AS DECIMAL(18,4)) > ("
        "SELECT sum(CAST(c2.c_acctbal AS DECIMAL(18,4))) / count(c2.c_acctbal) "
        f"FROM {customer} c2 WHERE c2.c_acctbal > 0) "
        f"AND NOT EXISTS (SELECT 1 FROM {orders} o WHERE o.o_custkey = c.c_custkey "
        f"AND o.o_totalprice > {min_price}) "
        "GROUP BY c_nationkey"
    )


def customer_balance_ranks(customer: DataFrame, buckets: int = 4) -> DataFrame:
    """Ranking-window suite: ntile / percent_rank / cume_dist /
    first_value over one window — per-nation wealth ranking.

    Scale: one shuffle on the partition key (nationkey), one sort within
    partitions, then all four functions evaluate in a single Window
    physical operator (same spec => no extra exchanges).  The ordering
    is made total (acctbal DESC, custkey) so rank-family outputs are
    deterministic and engine-portable.
    """
    w = (
        W.partitionBy("c_nationkey")
        .orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    )
    return customer.select(
        "c_custkey",
        "c_nationkey",
        "c_acctbal",
        F.ntile(buckets).over(w).alias("bal_quartile"),
        F.percent_rank().over(w).alias("bal_pct_rank"),
        F.cume_dist().over(w).alias("bal_cume_dist"),
        F.first("c_custkey").over(w).alias("richest_cust"),
    )


def sql_customer_balance_ranks(buckets: int = 4, customer: str = "customer") -> str:
    return (
        "SELECT c_custkey, c_nationkey, c_acctbal, "
        f"CAST(NTILE({buckets}) OVER w AS INT) AS bal_quartile, "
        "PERCENT_RANK() OVER w AS bal_pct_rank, "
        "CUME_DIST() OVER w AS bal_cume_dist, "
        "FIRST_VALUE(c_custkey) OVER w AS richest_cust "
        f"FROM {customer} WINDOW w AS "
        "(PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)"
    )


def global_sorted_orders(orders: DataFrame) -> DataFrame:
    """Total ordering of a whole relation: range-partitioned sort.

    Unlike top-k (TakeOrderedAndProject), a full sort must move data —
    but it does so with ONE range-partitioning exchange driven by
    reservoir-sampled split points, then sorts each partition locally;
    output partitions are globally ordered end-to-end.  At 100 TB this
    is how you lay data out for downstream merge consumers or sorted
    parquet writes (paired with sortWithinPartitions when only
    per-file order matters, which skips the global exchange entirely).
    """
    return orders.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))


HIST_LO, HIST_WIDTH, HIST_BUCKETS = 0.0, 50000.0, 12


def price_histogram(orders: DataFrame) -> DataFrame:
    """Numeric binning: fixed-width histogram of order prices.

    floor((x - lo) / width) with an upper clamp — portable arithmetic
    (same IEEE division both engines), no width_bucket dialect
    dependence.  One narrow map + a tiny shuffle on <= n_buckets keys;
    at 100 TB the partial aggregation collapses each task to the bucket
    count before anything moves.
    """
    b = F.floor((F.col("o_totalprice") - F.lit(HIST_LO)) / F.lit(HIST_WIDTH))
    bucket = F.least(b, F.lit(HIST_BUCKETS - 1)).cast("int").alias("bucket")
    return (
        orders.select(bucket)
        .groupBy("bucket")
        .agg(F.count("*").alias("n_orders"))
        .withColumn(
            "lo", (F.lit(HIST_LO) + F.col("bucket") * F.lit(HIST_WIDTH))
        )
    )


def sql_price_histogram(table: str = "orders") -> str:
    return (
        "SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_orders, "
        f"({HIST_LO} + bucket * {HIST_WIDTH}) AS lo FROM ("
        f"SELECT CAST(least(floor((o_totalprice - {HIST_LO}) / {HIST_WIDTH}), "
        f"{HIST_BUCKETS - 1}) AS INT) AS bucket FROM {table}"
        ") GROUP BY bucket"
    )


def hourly_event_rollup(events: DataFrame) -> DataFrame:
    """Multi-grain time rollup (hypertable-style): counts at
    (day, hour) with per-day subtotals and a grand total in one pass.

    date_trunc + ROLLUP — the continuous-aggregate shape: grouping
    sets expand map-side, so day totals don't need a second scan over
    the hour rows.  At scale this feeds a downsampled serving table.
    """
    return (
        events.select(
            F.date_trunc("day", F.col("ts")).alias("day"),
            F.hour(F.col("ts")).alias("hr"),
        )
        .rollup("day", "hr")
        .agg(F.count("*").alias("n_events"))
    )


def sql_hourly_event_rollup(table: str = "events") -> str:
    return (
        "SELECT day, hr, CAST(COUNT(*) AS BIGINT) AS n_events FROM ("
        "SELECT date_trunc('day', ts) AS day, CAST(hour(ts) AS INT) AS hr "
        f"FROM {table}) GROUP BY ROLLUP (day, hr)"
    )


def heavy_hitter_users(events: DataFrame, min_events: int = 30) -> DataFrame:
    """Heavy hitters, exact: users above an activity threshold (GROUP BY
    + HAVING).

    Exact heavy hitters at 100 TB are one shuffle on the key with
    map-side partials — fine while the key space fits the shuffle; when
    it doesn't, the sketch path (count-min / space-saving over a sample,
    or approx_count_distinct-style mergeable state) trades exactness for
    one narrow pass.  This is the exact baseline those sketches are
    judged against.
    """
    return (
        events.groupBy("user_id")
        .agg(F.count("*").alias("n_events"))
        .filter(F.col("n_events") >= min_events)
    )


def sql_heavy_hitter_users(min_events: int = 30, table: str = "events") -> str:
    return (
        "SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events "
        f"FROM {table} GROUP BY user_id HAVING COUNT(*) >= {min_events}"
    )


def shipping_priority_mix(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """TPC-H Q12 shape: join + conditional aggregation — per linestatus,
    how many lineitems belong to critical-priority orders vs not.

    CASE-inside-SUM folds what would be two filtered scans into one
    pass; the join shuffles on orderkey (or broadcasts orders' 2-column
    projection when it fits).  The conditional never touches the plan
    shape — it's a codegen expression in the aggregate.
    """
    crit = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH").cast("long")
    return (
        lineitem.join(
            orders.select("o_orderkey", "o_orderpriority"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_linestatus")
        .agg(
            F.sum(crit).alias("n_critical"),
            F.sum(F.lit(1) - crit).alias("n_normal"),
        )
    )


def sql_shipping_priority_mix(
    orders: str = "orders", lineitem: str = "lineitem"
) -> str:
    crit = "CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END"
    return (
        "SELECT l_linestatus, "
        f"CAST(SUM({crit}) AS BIGINT) AS n_critical, "
        f"CAST(SUM(1 - ({crit})) AS BIGINT) AS n_normal "
        f"FROM {lineitem} JOIN {orders} ON l_orderkey = o_orderkey "
        "GROUP BY l_linestatus"
    )


def promo_revenue_ratio(
    lineitem: DataFrame, part: DataFrame, month: str = "1997-06"
) -> DataFrame:
    """TPC-H Q14 shape: conditional revenue ratio — the share of one
    month's discounted revenue coming from promo-class parts.

    Both sums are exact decimal (order-independent); the single final
    division runs in double on two bit-identical operands, so the ratio
    is engine-exact.  The month filter prunes at the scan; part is a
    broadcast dimension.
    """
    revenue = dmul(F.col("l_extendedprice"), one_minus(F.col("l_discount")))
    promo = F.when(
        F.col("p_type").startswith("PROMO"), revenue
    ).otherwise(F.lit(0).cast("decimal(18,4)"))
    start = f"{month}-01"
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit(start).cast("timestamp"))
            & (
                F.col("l_shipdate")
                < F.add_months(F.lit(start).cast("date"), 1).cast("timestamp")
            )
        )
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (
                F.lit(100.0)
                * F.sum(promo).cast("double")
                / F.sum(revenue).cast("double")
            ).alias("promo_pct"),
            F.count("*").alias("n_items"),
        )
    )


def sql_promo_revenue_ratio(
    month: str = "1997-06", lineitem: str = "lineitem", part: str = "part"
) -> str:
    rev = sql_dmul("l_extendedprice", sql_one_minus("l_discount"))
    promo = (
        f"CASE WHEN p_type LIKE 'PROMO%' THEN {rev} "
        "ELSE CAST(0 AS DECIMAL(18,4)) END"
    )
    return (
        "SELECT (100.0 * CAST(SUM("
        + promo
        + ") AS DOUBLE) / CAST(SUM("
        + rev
        + ") AS DOUBLE)) AS promo_pct, CAST(COUNT(*) AS BIGINT) AS n_items "
        f"FROM {lineitem} JOIN {part} ON l_partkey = p_partkey "
        f"WHERE l_shipdate >= TIMESTAMP '{month}-01 00:00:00' "
        f"AND l_shipdate < TIMESTAMP '{month}-01 00:00:00' + INTERVAL 1 MONTH"
    )


def disjunctive_band_revenue(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs predicate across join columns.

    Catalyst extracts the common l_partkey=p_partkey conjunct so the
    join stays an equi (hash) join, with the disjunction evaluated as a
    post-join filter; the per-side sub-predicates (brand lists, size
    and quantity bands) additionally push to their scans as ORs.  The
    anti-pattern this guards against is a nested-loop join on the whole
    disjunction.
    """
    j = lineitem.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    band1 = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(1, 20)
    )
    band2 = (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(10, 25)
        & F.col("l_quantity").between(10, 35)
    )
    revenue = dmul(F.col("l_extendedprice"), one_minus(F.col("l_discount")))
    return j.filter(band1 | band2).agg(
        dsum_expr(revenue, "revenue"), F.count("*").alias("n_items")
    )


def sql_disjunctive_band_revenue(
    lineitem: str = "lineitem", part: str = "part"
) -> str:
    rev = sql_dmul("l_extendedprice", sql_one_minus("l_discount"))
    return (
        f"SELECT CAST(SUM({rev}) AS DOUBLE) AS revenue, "
        "CAST(COUNT(*) AS BIGINT) AS n_items "
        f"FROM {lineitem} JOIN {part} ON l_partkey = p_partkey "
        "WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10 "
        "AND l_quantity BETWEEN 1 AND 20) "
        "OR (p_brand = 'Brand#3' AND p_size BETWEEN 10 AND 25 "
        "AND l_quantity BETWEEN 10 AND 35)"
    )


def major_revenue_nations(
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    fraction: float = 0.05,
) -> DataFrame:
    """TPC-H Q11 shape: group totals kept only if they exceed a fraction
    of the GLOBAL total — HAVING against a scalar subquery.

    The global total is one number: computed once and broadcast via a
    1-row cross join, so the plan is two aggregations over one scan
    lineage plus a broadcast — no re-scan for the threshold.  Exact
    decimal keeps the > gate portable.
    """
    per_nation = (
        orders.join(
            F.broadcast(customer.select("c_custkey", "c_nationkey")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,4)")).alias("nat_total"))
    )
    total = orders.agg(
        (
            F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
            * F.lit(fraction).cast("decimal(18,4)")
        ).alias("threshold")
    )
    return (
        per_nation.crossJoin(F.broadcast(total))
        .filter(F.col("nat_total") > F.col("threshold"))
        .select("n_name", F.col("nat_total").cast("double").alias("revenue"))
    )


def sql_major_revenue_nations(
    fraction: float = 0.05,
    orders: str = "orders",
    customer: str = "customer",
    nation: str = "nation",
) -> str:
    return (
        "SELECT n_name, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) "
        f"AS revenue FROM {orders} "
        f"JOIN {customer} ON o_custkey = c_custkey "
        f"JOIN {nation} ON c_nationkey = n_nationkey "
        "GROUP BY n_name "
        "HAVING SUM(CAST(o_totalprice AS DECIMAL(18,4))) > ("
        f"SELECT SUM(CAST(o_totalprice AS DECIMAL(18,4))) "
        f"* CAST({fraction} AS DECIMAL(18,4)) FROM {orders})"
    )


# ---------------------------------------------------------------------------
# Remaining TPC-H query shapes (adapted where the fixture schema lacks
# partsupp / l_receiptdate / l_commitdate — see each docstring).
# ---------------------------------------------------------------------------


def forecast_revenue_change(
    lineitem: DataFrame,
    start: str = "1996-01-01",
    end: str = "1997-01-01",
    disc_lo: float = 0.03,
    disc_hi: float = 0.07,
    max_qty: float = 24.0,
) -> DataFrame:
    """TPC-H Q6 shape: pure scan-filter-aggregate, zero joins.

    The canonical pushdown benchmark: every predicate (date range,
    discount band, quantity cap) is parquet-stat prunable, the scan
    reads 3 columns, and the whole plan is one codegen stage ending in
    a single-row partial+final aggregate.  At 100 TB this query is I/O
    bound by exactly the bytes of (shipdate, discount, quantity,
    extendedprice) that survive row-group pruning — nothing else moves.
    """
    d = F.col("l_discount").cast("decimal(18,4)")
    filtered = lineitem.filter(
        (F.col("l_shipdate") >= F.lit(start).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(end).cast("timestamp"))
        & (d >= F.lit(disc_lo).cast("decimal(18,4)"))
        & (d <= F.lit(disc_hi).cast("decimal(18,4)"))
        & (F.col("l_quantity") < max_qty)
    )
    return filtered.agg(
        dsum_expr(dmul(F.col("l_extendedprice"), F.col("l_discount")), "revenue"),
        F.count("*").alias("n_items"),
    )


def sql_forecast_revenue_change(
    start: str = "1996-01-01",
    end: str = "1997-01-01",
    disc_lo: float = 0.03,
    disc_hi: float = 0.07,
    max_qty: float = 24.0,
    lineitem: str = "lineitem",
) -> str:
    return (
        f"SELECT {sql_dsum(sql_dmul('l_extendedprice', 'l_discount'), 'revenue')}, "
        "CAST(COUNT(*) AS BIGINT) AS n_items "
        f"FROM {lineitem} WHERE l_shipdate >= TIMESTAMP '{start}' "
        f"AND l_shipdate < TIMESTAMP '{end}' "
        f"AND CAST(l_discount AS DECIMAL(18,4)) >= CAST({disc_lo} AS DECIMAL(18,4)) "
        f"AND CAST(l_discount AS DECIMAL(18,4)) <= CAST({disc_hi} AS DECIMAL(18,4)) "
        f"AND l_quantity < {max_qty}"
    )


def volume_shipping(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    nation_a: str = "NATION_1",
    nation_b: str = "NATION_2",
    start: str = "1996-01-01",
    end: str = "1998-01-01",
) -> DataFrame:
    """TPC-H Q7 shape: bidirectional two-nation trade volume by year.

    Five-way join where every dimension chain (supplier->nation,
    customer->nation) collapses to a broadcast; only lineitem⨝orders
    shuffles (on orderkey).  The disjunctive nation pair filter is
    applied AFTER both nation names are attached — Catalyst still pushes
    the single-nation IN (a,b) parts down each broadcast side, so the
    fact join only carries rows from the two nations of interest.
    """
    n1 = nation.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    ).filter(F.col("supp_nation").isin(nation_a, nation_b))
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    ).filter(F.col("cust_nation").isin(nation_a, nation_b))
    supp = supplier.join(
        F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey")
    ).select("s_suppkey", "supp_nation")
    cust = customer.join(
        F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey")
    ).select("c_custkey", "cust_nation")
    revenue = dmul(F.col("l_extendedprice"), one_minus(F.col("l_discount")))
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit(start).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(end).cast("timestamp"))
        )
        .join(orders.select("o_orderkey", "o_custkey"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .filter(
            ((F.col("supp_nation") == nation_a) & (F.col("cust_nation") == nation_b))
            | ((F.col("supp_nation") == nation_b) & (F.col("cust_nation") == nation_a))
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(dsum_expr(revenue, "revenue"))
    )


def sql_volume_shipping(
    nation_a: str = "NATION_1",
    nation_b: str = "NATION_2",
    start: str = "1996-01-01",
    end: str = "1998-01-01",
) -> str:
    rev = sql_dmul("l_extendedprice", sql_one_minus("l_discount"))
    return (
        "SELECT supp_nation, cust_nation, l_year, "
        f"{sql_dsum('volume', 'revenue')} FROM ("
        "SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation, "
        "CAST(EXTRACT(year FROM l_shipdate) AS INT) AS l_year, "
        f"{rev} AS volume "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
        "JOIN customer ON o_custkey = c_custkey "
        "JOIN supplier ON l_suppkey = s_suppkey "
        "JOIN nation n1 ON s_nationkey = n1.n_nationkey "
        "JOIN nation n2 ON c_nationkey = n2.n_nationkey "
        f"WHERE l_shipdate >= TIMESTAMP '{start}' AND l_shipdate < TIMESTAMP '{end}' "
        f"AND ((n1.n_name = '{nation_a}' AND n2.n_name = '{nation_b}') "
        f"OR (n1.n_name = '{nation_b}' AND n2.n_name = '{nation_a}'))"
        ") GROUP BY supp_nation, cust_nation, l_year"
    )


def national_market_share(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    part: DataFrame,
    target_nation: str = "NATION_3",
    target_region: str = "ASIA",
    part_type: str = "PROMO",
    start: str = "1995-01-01",
    end: str = "1997-01-01",
) -> DataFrame:
    """TPC-H Q8 shape: market-share ratio — conditional sum over a
    six-way join, grouped by order year.

    Scale plan: part (filtered on type) broadcasts into lineitem FIRST —
    it is the most selective gate, so the orderkey shuffle that follows
    carries only matching lineitems.  Customer-side region restriction
    broadcasts (region->nation->customer chain folds into one small
    build side).  The share division happens on two exact decimal sums,
    cast to double at the very end — engine-portable bits.
    """
    promo_parts = part.filter(F.col("p_type") == part_type).select("p_partkey")
    cust_region = (
        customer.join(
            F.broadcast(
                nation.join(
                    F.broadcast(region.filter(F.col("r_name") == target_region)),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                ).select("n_nationkey")
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
    ).select("c_custkey")
    supp_nation = supplier.join(
        F.broadcast(
            nation.select(
                F.col("n_nationkey").alias("sn_key"),
                F.col("n_name").alias("supp_nation"),
            )
        ),
        F.col("s_nationkey") == F.col("sn_key"),
    ).select("s_suppkey", "supp_nation")
    volume = dmul(F.col("l_extendedprice"), one_minus(F.col("l_discount")))
    base = (
        lineitem.join(F.broadcast(promo_parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            orders.filter(
                (F.col("o_orderdate") >= F.lit(start).cast("timestamp"))
                & (F.col("o_orderdate") < F.lit(end).cast("timestamp"))
            ).select("o_orderkey", "o_custkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(cust_region), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp_nation), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            volume.alias("volume"),
            F.col("supp_nation"),
        )
    )
    target_vol = F.sum(
        F.when(F.col("supp_nation") == target_nation, F.col("volume")).otherwise(
            F.lit(0).cast("decimal(18,8)")
        )
    )
    return base.groupBy("o_year").agg(
        (target_vol.cast("double") / F.sum("volume").cast("double")).alias("mkt_share"),
        target_vol.cast("double").alias("nation_volume"),
        F.sum("volume").cast("double").alias("total_volume"),
    )


def sql_national_market_share(
    target_nation: str = "NATION_3",
    target_region: str = "ASIA",
    part_type: str = "PROMO",
    start: str = "1995-01-01",
    end: str = "1997-01-01",
) -> str:
    vol = sql_dmul("l_extendedprice", sql_one_minus("l_discount"))
    return (
        "SELECT o_year, "
        "(CAST(SUM(CASE WHEN supp_nation = '" + target_nation + "' THEN volume "
        "ELSE CAST(0 AS DECIMAL(18,8)) END) AS DOUBLE) / CAST(SUM(volume) AS DOUBLE)) "
        "AS mkt_share, "
        "CAST(SUM(CASE WHEN supp_nation = '" + target_nation + "' THEN volume "
        "ELSE CAST(0 AS DECIMAL(18,8)) END) AS DOUBLE) AS nation_volume, "
        "CAST(SUM(volume) AS DOUBLE) AS total_volume FROM ("
        "SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year, "
        f"{vol} AS volume, n1.n_name AS supp_nation "
        "FROM lineitem JOIN part ON l_partkey = p_partkey "
        "JOIN orders ON l_orderkey = o_orderkey "
        "JOIN customer ON o_custkey = c_custkey "
        "JOIN nation n2 ON c_nationkey = n2.n_nationkey "
        "JOIN region ON n2.n_regionkey = r_regionkey "
        "JOIN supplier ON l_suppkey = s_suppkey "
        "JOIN nation n1 ON s_nationkey = n1.n_nationkey "
        f"WHERE p_type = '{part_type}' AND r_name = '{target_region}' "
        f"AND o_orderdate >= TIMESTAMP '{start}' AND o_orderdate < TIMESTAMP '{end}'"
        ") GROUP BY o_year"
    )


def product_line_profit(
    lineitem: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    part: DataFrame,
    name_fragment: str = "red",
) -> DataFrame:
    """TPC-H Q9 shape (adapted): profit by supplier nation x year for a
    part-name substring match.

    Adaptation: the fixture has no partsupp table, so profit is revenue
    (extendedprice x (1-discount)) rather than revenue minus
    supplycost x quantity — the plan shape (substring-filtered part dim
    broadcast into the fact, supplier->nation broadcast chain, two-key
    group) is the one Q9 exercises.  The LIKE filter cannot use parquet
    min/max stats, so at 100 TB this is the query where a part-name
    bloom/dictionary filter on the broadcast side pays for itself.
    """
    red_parts = part.filter(F.col("p_name").contains(name_fragment)).select("p_partkey")
    supp_nation = supplier.join(
        F.broadcast(
            nation.select(
                F.col("n_nationkey").alias("sn_key"),
                F.col("n_name").alias("nation"),
            )
        ),
        F.col("s_nationkey") == F.col("sn_key"),
    ).select("s_suppkey", "nation")
    profit = dmul(F.col("l_extendedprice"), one_minus(F.col("l_discount")))
    return (
        lineitem.join(F.broadcast(red_parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp_nation), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("nation", F.year("l_shipdate").alias("o_year"))
        .agg(dsum_expr(profit, "sum_profit"))
    )


def sql_product_line_profit(name_fragment: str = "red") -> str:
    profit = sql_dmul("l_extendedprice", sql_one_minus("l_discount"))
    return (
        "SELECT nation, o_year, "
        f"{sql_dsum('amount', 'sum_profit')} FROM ("
        "SELECT n_name AS nation, "
        "CAST(EXTRACT(year FROM l_shipdate) AS INT) AS o_year, "
        f"{profit} AS amount "
        "FROM lineitem JOIN part ON l_partkey = p_partkey "
        "JOIN supplier ON l_suppkey = s_suppkey "
        "JOIN nation ON s_nationkey = n_nationkey "
        f"WHERE p_name LIKE '%{name_fragment}%'"
        ") GROUP BY nation, o_year"
    )


def returned_item_report(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    start: str = "1996-01-01",
    end: str = "1996-04-01",
    k: int = 20,
) -> DataFrame:
    """TPC-H Q10 shape: top-k customers by revenue lost to returns in a
    quarter.

    Scale plan: orders carries the date filter (pushdown), lineitem the
    returnflag filter; their join shuffles on orderkey, then ONE more
    shuffle groups by custkey before customer/nation attributes are
    broadcast-joined onto the (small) aggregate — joining dims after the
    group-by, not before, keeps the wide customer row out of both
    shuffles.  Top-k is TakeOrderedAndProject over per-customer rows.
    """
    revenue = dmul(F.col("l_extendedprice"), one_minus(F.col("l_discount")))
    per_cust = (
        lineitem.filter(F.col("l_returnflag") == "R")
        .join(
            orders.filter(
                (F.col("o_orderdate") >= F.lit(start).cast("timestamp"))
                & (F.col("o_orderdate") < F.lit(end).cast("timestamp"))
            ).select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_custkey")
        .agg(dsum_expr(revenue, "revenue"))
    )
    enriched = per_cust.join(
        F.broadcast(customer.select("c_custkey", "c_name", "c_acctbal", "c_nationkey")),
        F.col("o_custkey") == F.col("c_custkey"),
    ).join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
    return enriched.select(
        "c_custkey", "c_name", "revenue", "c_acctbal", F.col("n_name").alias("nation")
    ).orderBy(F.desc("revenue"), F.asc("c_custkey")).limit(k)


def sql_returned_item_report(
    start: str = "1996-01-01", end: str = "1996-04-01", k: int = 20
) -> str:
    rev = sql_dmul("l_extendedprice", sql_one_minus("l_discount"))
    return (
        "SELECT c_custkey, c_name, revenue, c_acctbal, nation FROM ("
        "SELECT c_custkey, c_name, "
        f"CAST(SUM({rev}) AS DOUBLE) AS revenue, "
        "c_acctbal, n_name AS nation "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
        "JOIN customer ON o_custkey = c_custkey "
        "JOIN nation ON c_nationkey = n_nationkey "
        f"WHERE l_returnflag = 'R' AND o_orderdate >= TIMESTAMP '{start}' "
        f"AND o_orderdate < TIMESTAMP '{end}' "
        "GROUP BY c_custkey, c_name, c_acctbal, n_name"
        f") ORDER BY revenue DESC, c_custkey LIMIT {k}"
    )


def top_suppliers(
    lineitem: DataFrame,
    supplier: DataFrame,
    start: str = "1996-01-01",
    end: str = "1996-04-01",
) -> DataFrame:
    """TPC-H Q15 shape: suppliers achieving the maximum quarterly
    revenue (view + scalar-max subquery).

    The revenue "view" is computed once and reused for both the max and
    the final filter — in Spark that is a single aggregated DataFrame
    referenced twice; the 1-row max broadcasts into the filter, so the
    plan re-reads the tiny aggregate, never the fact.  Exact decimal
    revenue makes `= max` portable (double equality would be flaky).
    """
    revenue = (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit(start).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(end).cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.sum(
                dmul(F.col("l_extendedprice"), one_minus(F.col("l_discount")))
            ).alias("total_revenue_dec")
        )
    )
    max_rev = revenue.agg(F.max("total_revenue_dec").alias("max_revenue"))
    return (
        revenue.crossJoin(F.broadcast(max_rev))
        .filter(F.col("total_revenue_dec") == F.col("max_revenue"))
        .join(F.broadcast(supplier), F.col("supplier_no") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_revenue_dec").cast("double").alias("total_revenue"),
        )
    )


def sql_top_suppliers(start: str = "1996-01-01", end: str = "1996-04-01") -> str:
    rev = sql_dmul("l_extendedprice", sql_one_minus("l_discount"))
    view = (
        f"SELECT l_suppkey AS supplier_no, SUM({rev}) AS total_revenue_dec "
        f"FROM lineitem WHERE l_shipdate >= TIMESTAMP '{start}' "
        f"AND l_shipdate < TIMESTAMP '{end}' GROUP BY l_suppkey"
    )
    return (
        f"WITH revenue AS ({view}) "
        "SELECT s_suppkey, s_name, "
        "CAST(total_revenue_dec AS DOUBLE) AS total_revenue "
        "FROM supplier JOIN revenue ON s_suppkey = supplier_no "
        "WHERE total_revenue_dec = (SELECT MAX(total_revenue_dec) FROM revenue)"
    )


def large_volume_customers(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    min_qty: float = 220.0,
    k: int = 100,
) -> DataFrame:
    """TPC-H Q18 shape: customers with orders above a total-quantity
    threshold (aggregated IN-subquery -> join -> top-k).

    The orderkey HAVING aggregate is computed once over lineitem and
    used as a semi-filter via an inner join back to orders — at scale
    both the aggregate and the join shuffle on the same key (orderkey),
    so AQE coalesces them into one exchange reuse.  Customer attaches
    by broadcast AFTER the selective gate (few hundred orders survive).
    """
    big_orders = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,4)")).alias("sum_qty_dec"))
        .filter(F.col("sum_qty_dec") > F.lit(min_qty).cast("decimal(18,4)"))
    )
    return (
        orders.join(big_orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(
            F.broadcast(customer.select("c_custkey", "c_name")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            F.col("sum_qty_dec").cast("double").alias("sum_qty"),
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(k)
    )


def sql_large_volume_customers(min_qty: float = 220.0, k: int = 100) -> str:
    return (
        "SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, "
        "CAST(sum_qty_dec AS DOUBLE) AS sum_qty FROM orders "
        "JOIN (SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(18,4))) AS sum_qty_dec "
        "FROM lineitem GROUP BY l_orderkey "
        f"HAVING SUM(CAST(l_quantity AS DECIMAL(18,4))) > CAST({min_qty} AS DECIMAL(18,4))) "
        "ON o_orderkey = l_orderkey "
        "JOIN customer ON o_custkey = c_custkey "
        f"ORDER BY o_totalprice DESC, o_orderkey LIMIT {k}"
    )


def lonely_return_suppliers(
    lineitem: DataFrame, supplier: DataFrame, k: int = 100
) -> DataFrame:
    """TPC-H Q21 shape (adapted): suppliers who were the SOLE supplier
    with returned items on a multi-supplier order.

    Adaptation: the fixture lacks l_commitdate/l_receiptdate, so "kept
    orders waiting" becomes "had returns" (l_returnflag = 'R') — the
    plan shape is identical: a fact self-join expressing EXISTS (another
    supplier on the same order) and NOT EXISTS (another supplier with a
    return on the same order).

    Scale plan: all three legs (base, exists-side, not-exists-side) are
    projections of the SAME lineitem scan keyed on orderkey — they
    shuffle once each on orderkey and sort-merge; no broadcast (fact x
    fact).  The final per-supplier count is a second, tiny shuffle.
    Left-semi + left-anti express the quantifiers without exploding
    duplicates (a plain inner join would double-count on multi-match).
    """
    returned = lineitem.filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_suppkey"
    ).dropDuplicates()
    others = lineitem.select(
        F.col("l_orderkey").alias("o2_orderkey"), F.col("l_suppkey").alias("o2_suppkey")
    ).dropDuplicates()
    other_returns = returned.select(
        F.col("l_orderkey").alias("r2_orderkey"), F.col("l_suppkey").alias("r2_suppkey")
    )
    with_other_supplier = returned.join(
        others,
        (F.col("l_orderkey") == F.col("o2_orderkey"))
        & (F.col("l_suppkey") != F.col("o2_suppkey")),
        "left_semi",
    )
    sole_returner = with_other_supplier.join(
        other_returns,
        (F.col("l_orderkey") == F.col("r2_orderkey"))
        & (F.col("l_suppkey") != F.col("r2_suppkey")),
        "left_anti",
    )
    return (
        sole_returner.groupBy("l_suppkey")
        .agg(F.count("*").alias("numwait"))
        .join(F.broadcast(supplier.select("s_suppkey", "s_name")), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_name", "s_suppkey", "numwait")
        .orderBy(F.desc("numwait"), F.asc("s_suppkey"))
        .limit(k)
    )


def sql_lonely_return_suppliers(k: int = 100) -> str:
    return (
        "SELECT s_name, s_suppkey, CAST(COUNT(*) AS BIGINT) AS numwait FROM ("
        "SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem WHERE l_returnflag = 'R'"
        ") l1 JOIN supplier ON l1.l_suppkey = s_suppkey "
        "WHERE EXISTS (SELECT 1 FROM lineitem l2 WHERE l2.l_orderkey = l1.l_orderkey "
        "AND l2.l_suppkey <> l1.l_suppkey) "
        "AND NOT EXISTS (SELECT 1 FROM lineitem l3 WHERE l3.l_orderkey = l1.l_orderkey "
        "AND l3.l_suppkey <> l1.l_suppkey AND l3.l_returnflag = 'R') "
        "GROUP BY s_name, s_suppkey "
        f"ORDER BY numwait DESC, s_suppkey LIMIT {k}"
    )


def min_cost_supplier(
    lineitem: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    part: DataFrame,
    target_region: str = "EUROPE",
    size: int = 15,
    k: int = 100,
) -> DataFrame:
    """TPC-H Q2 shape (adapted): per-part minimum-cost supplier within a
    region (correlated-min subquery -> equality join back).

    Adaptation: no partsupp table, so "supply cost" is the supplier's
    best observed unit price (min extendedprice/quantity over their
    lineitems for that part) — the correlated `= (SELECT min ...)`
    structure is preserved.  Unit price is a double division of
    identical inputs on both engines, and min() is order-independent,
    so equality is portable.

    Scale plan: region->nation->supplier folds to one broadcast gate;
    the per-(part,supplier) aggregate and the per-part min are two
    groupBys over the same shuffled (partkey-keyed) data; the min
    broadcasts back (one row per part after filtering on p_size).
    """
    sized_parts = part.filter(F.col("p_size") == size).select("p_partkey", "p_name")
    region_suppliers = supplier.join(
        F.broadcast(
            nation.join(
                F.broadcast(region.filter(F.col("r_name") == target_region)),
                F.col("n_regionkey") == F.col("r_regionkey"),
            ).select("n_nationkey", F.col("n_name").alias("nation"))
        ),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", "s_name", "s_acctbal", "nation")
    unit_costs = (
        lineitem.join(F.broadcast(sized_parts.select("p_partkey")), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            F.broadcast(region_suppliers.select(F.col("s_suppkey").alias("rs_suppkey"))),
            F.col("l_suppkey") == F.col("rs_suppkey"),
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"))
    )
    best = unit_costs.groupBy(F.col("l_partkey").alias("b_partkey")).agg(
        F.min("unit_cost").alias("best_cost")
    )
    return (
        unit_costs.join(
            best,
            (F.col("l_partkey") == F.col("b_partkey"))
            & (F.col("unit_cost") == F.col("best_cost")),
        )
        .join(F.broadcast(region_suppliers), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(sized_parts), F.col("l_partkey") == F.col("p_partkey"))
        .select(
            "s_acctbal", "s_name", "nation", F.col("l_partkey").alias("p_partkey"),
            "p_name", "unit_cost",
        )
        .orderBy(F.desc("s_acctbal"), F.asc("p_partkey"), F.asc("s_name"))
        .limit(k)
    )


def sql_min_cost_supplier(
    target_region: str = "EUROPE", size: int = 15, k: int = 100
) -> str:
    return (
        "WITH region_supp AS ("
        "SELECT s_suppkey, s_name, s_acctbal, n_name AS nation FROM supplier "
        "JOIN nation ON s_nationkey = n_nationkey "
        "JOIN region ON n_regionkey = r_regionkey "
        f"WHERE r_name = '{target_region}'), "
        "unit_costs AS ("
        "SELECT l_partkey, l_suppkey, MIN(l_extendedprice / l_quantity) AS unit_cost "
        "FROM lineitem "
        f"JOIN (SELECT p_partkey FROM part WHERE p_size = {size}) p ON l_partkey = p_partkey "
        "JOIN region_supp rs ON l_suppkey = rs.s_suppkey "
        "GROUP BY l_partkey, l_suppkey) "
        "SELECT s_acctbal, s_name, nation, l_partkey AS p_partkey, p_name, unit_cost "
        "FROM unit_costs uc "
        "JOIN region_supp ON uc.l_suppkey = region_supp.s_suppkey "
        "JOIN part ON uc.l_partkey = part.p_partkey "
        "WHERE unit_cost = (SELECT MIN(uc2.unit_cost) FROM unit_costs uc2 "
        "WHERE uc2.l_partkey = uc.l_partkey) "
        f"ORDER BY s_acctbal DESC, p_partkey, s_name LIMIT {k}"
    )


def supplier_part_counts(
    lineitem: DataFrame,
    supplier: DataFrame,
    part: DataFrame,
    excluded_brand: str = "Brand#1",
    sizes: tuple = (5, 10, 15, 20, 25, 30, 35, 40),
) -> DataFrame:
    """TPC-H Q16 shape (adapted): distinct-supplier counts per part
    attribute group, with a NOT-IN supplier exclusion.

    Adaptation: the (part, supplier) relationship comes from observed
    lineitems instead of partsupp, and "customer complaints" becomes a
    negative account balance.  Shape preserved: anti-join exclusion
    feeding a count(DISTINCT) over a grouped join.

    Scale plan: the excluded-supplier set is tiny -> broadcast anti
    join on the fact BEFORE the distinct aggregation; count(DISTINCT
    suppkey) expands to a two-stage aggregate (partial distinct by
    (group, suppkey), then count) — Spark does this automatically.
    """
    bad_suppliers = supplier.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    wanted_parts = part.filter(
        (F.col("p_brand") != excluded_brand) & (F.col("p_size").isin(*sizes))
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    pairs = (
        lineitem.select("l_partkey", "l_suppkey")
        .join(F.broadcast(bad_suppliers), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(wanted_parts), F.col("l_partkey") == F.col("p_partkey"))
    )
    return pairs.groupBy("p_brand", "p_type", "p_size").agg(
        F.countDistinct("l_suppkey").alias("supplier_cnt")
    )


def sql_supplier_part_counts(
    excluded_brand: str = "Brand#1",
    sizes: tuple = (5, 10, 15, 20, 25, 30, 35, 40),
) -> str:
    size_list = ", ".join(str(s) for s in sizes)
    return (
        "SELECT p_brand, p_type, p_size, "
        "CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt "
        "FROM lineitem JOIN part ON l_partkey = p_partkey "
        f"WHERE p_brand <> '{excluded_brand}' AND p_size IN ({size_list}) "
        "AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0) "
        "GROUP BY p_brand, p_type, p_size"
    )


def promotable_part_suppliers(
    lineitem: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    part: DataFrame,
    name_fragment: str = "gear",
    target_nation: str = "NATION_5",
    min_qty: float = 50.0,
) -> DataFrame:
    """TPC-H Q20 shape (adapted): suppliers in one nation who moved more
    than a threshold quantity of matching parts (nested semi-join
    chain: name-filtered parts -> per-supplier quantity aggregate ->
    threshold gate -> semi join into supplier).

    Adaptation: no partsupp/availqty, so the 50%%-of-available gate is a
    fixed shipped-quantity threshold; the nesting (subquery feeding a
    subquery feeding IN) is preserved.

    Scale: the part filter broadcasts into lineitem; the per-suppkey
    aggregate is the only fact shuffle; its surviving keys (few)
    broadcast as a semi join into the supplier dim.
    """
    green_parts = part.filter(F.col("p_name").contains(name_fragment)).select("p_partkey")
    heavy_suppliers = (
        lineitem.join(F.broadcast(green_parts), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,4)")).alias("qty"))
        .filter(F.col("qty") > F.lit(min_qty).cast("decimal(18,4)"))
        .select("l_suppkey")
    )
    nation_key = nation.filter(F.col("n_name") == target_nation).select("n_nationkey")
    return (
        supplier.join(F.broadcast(nation_key), F.col("s_nationkey") == F.col("n_nationkey"), "left_semi")
        .join(F.broadcast(heavy_suppliers), F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name", "s_acctbal")
    )


def sql_promotable_part_suppliers(
    name_fragment: str = "gear",
    target_nation: str = "NATION_5",
    min_qty: float = 50.0,
) -> str:
    return (
        "SELECT s_suppkey, s_name, s_acctbal FROM supplier "
        "WHERE s_nationkey IN (SELECT n_nationkey FROM nation "
        f"WHERE n_name = '{target_nation}') "
        "AND s_suppkey IN ("
        "SELECT l_suppkey FROM lineitem "
        "WHERE l_partkey IN (SELECT p_partkey FROM part "
        f"WHERE p_name LIKE '%{name_fragment}%') "
        "GROUP BY l_suppkey "
        f"HAVING SUM(CAST(l_quantity AS DECIMAL(18,4))) > CAST({min_qty} AS DECIMAL(18,4)))"
    )


def nation_segment_rollcall(customer: DataFrame, nation: DataFrame) -> DataFrame:
    """listagg/string_agg + deterministic mode in one pass: per nation,
    the sorted comma-joined list of market segments present, how many,
    the customer count, and the modal segment (most customers,
    lexicographic min on ties).

    Spark has no string_agg aggregate; ``array_sort(collect_list(...))
    -> array_join`` expresses it exactly AND deterministically (the
    bare collect_list order is partition-dependent; sorting makes the
    result engine-stable).  The mode-with-tiebreak is min(struct(-c,
    seg)) — a single struct-min aggregate, no second window pass.  Plan
    at scale: broadcast nation (25 rows), one shuffle keyed n_name for
    the (nation, segment) counts — segment cardinality is tiny so the
    collect_list state is bounded (<=5 elements per nation, NOT per
    customer), then a final 25-group aggregate.
    """
    per_seg = (
        customer.join(
            F.broadcast(nation),
            customer["c_nationkey"] == nation["n_nationkey"],
        )
        .groupBy("n_name", "c_mktsegment")
        .agg(F.count("*").alias("c"))
    )
    neg = F.struct((-F.col("c")).alias("negc"), F.col("c_mktsegment").alias("seg"))
    return (
        per_seg.groupBy("n_name")
        .agg(
            F.array_join(
                F.array_sort(F.collect_list("c_mktsegment")), ","
            ).alias("segments"),
            F.count("*").alias("n_segments"),
            F.sum("c").alias("n_customers"),
            F.min(neg).getField("seg").alias("top_segment"),
        )
        .select("n_name", "segments", "n_segments", "n_customers", "top_segment")
    )


def sql_nation_segment_rollcall() -> str:
    return (
        "WITH per AS ("
        "  SELECT n_name, c_mktsegment AS seg, count(*) AS c "
        "  FROM customer JOIN nation ON c_nationkey = n_nationkey "
        "  GROUP BY n_name, c_mktsegment) "
        "SELECT n_name, "
        "string_agg(seg, ',' ORDER BY seg) AS segments, "
        "CAST(count(*) AS BIGINT) AS n_segments, "
        "CAST(sum(c) AS BIGINT) AS n_customers, "
        "first(seg ORDER BY c DESC, seg ASC) AS top_segment "
        "FROM per GROUP BY n_name"
    )


# ---------------------------------------------------------------------------
# Referential-integrity audit (cross-table data-quality gate)
# ---------------------------------------------------------------------------


def integrity_audit(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    events: DataFrame,
) -> DataFrame:
    """Cross-table referential-integrity report: orphan counts for the
    star schema's foreign keys (lineitem->orders, orders->customer,
    events.user_id->customer) — the admission gate a pipeline runs on
    every upstream drop before joins silently drop or duplicate rows.

    Each check is one LEFT ANTI join counted: the fact side streams,
    the key side reduces to a distinct-key projection that broadcasts
    when small and shuffles as a fixed-width key set when not.  The
    three checks are independent jobs unioned into one tiny report —
    at 100 TB each is a single scan of its fact table with the key
    column alone read (column pruning does the rest).
    """
    checks = [
        (
            "lineitem.l_orderkey -> orders",
            lineitem.select(F.col("l_orderkey").alias("k")),
            orders.select(F.col("o_orderkey").alias("k")),
        ),
        (
            "orders.o_custkey -> customer",
            orders.select(F.col("o_custkey").alias("k")),
            customer.select(F.col("c_custkey").alias("k")),
        ),
        (
            "events.user_id -> customer",
            events.select(F.col("user_id").alias("k")),
            customer.select(F.col("c_custkey").alias("k")),
        ),
    ]
    spark = lineitem.sparkSession
    parts = []
    for name, fact, dim in checks:
        orphans = fact.join(dim.distinct(), "k", "left_anti")
        parts.append(
            fact.agg(F.count("*").alias("n_rows")).crossJoin(
                orphans.agg(
                    F.count("*").alias("n_orphans"),
                    F.countDistinct("k").alias("n_orphan_keys"),
                )
            ).select(
                F.lit(name).alias("fk"),
                F.col("n_rows").cast("bigint").alias("n_rows"),
                F.col("n_orphans").cast("bigint").alias("n_orphans"),
                F.col("n_orphan_keys").cast("bigint").alias("n_orphan_keys"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


def sql_integrity_audit() -> str:
    checks = [
        ("lineitem.l_orderkey -> orders", "lineitem", "l_orderkey",
         "orders", "o_orderkey"),
        ("orders.o_custkey -> customer", "orders", "o_custkey",
         "customer", "c_custkey"),
        ("events.user_id -> customer", "events", "user_id",
         "customer", "c_custkey"),
    ]
    selects = []
    for name, fact, fk, dim, pk in checks:
        selects.append(f"""
SELECT '{name}' AS fk,
       CAST((SELECT count(*) FROM {fact}) AS BIGINT) AS n_rows,
       CAST(count(*) AS BIGINT) AS n_orphans,
       CAST(count(DISTINCT {fk}) AS BIGINT) AS n_orphan_keys
FROM {fact} f WHERE NOT EXISTS (SELECT 1 FROM {dim} d WHERE d.{pk} = f.{fk})
""")
    return " UNION ALL ".join(selects)
