"""Scalar function suites: timestamp parts and array accessors.

Round out the layer-B function library (the reference's scalar surface
is JSON access + ISO dates only — SURVEY.md §2 functions table).  Both
suites are single narrow codegen'd projections — no shuffle, no UDF;
at 100 TB they run at scan speed and exist mostly to pin
engine-portable semantics for the awkward corners (day-of-week
numbering, 1-based array indexing, float->double widening).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def time_function_suite(events: DataFrame) -> DataFrame:
    """Timestamp-part extraction and date arithmetic over event times.

    Portability notes pinned by the oracle: Spark ``dayofweek`` is
    1=Sunday..7=Saturday (DuckDB's is 0-based — oracle adds 1);
    ``weekofyear`` is ISO on both; date_add / datediff compare against
    interval arithmetic.  Session TZ is pinned UTC (session.py) so
    hour extraction agrees.
    """
    ts = F.col("ts")
    return events.select(
        "event_id",
        F.year(ts).alias("y"),
        F.month(ts).alias("m"),
        F.dayofmonth(ts).alias("d"),
        F.hour(ts).alias("h"),
        F.minute(ts).alias("mi"),
        F.dayofweek(ts).alias("dow"),
        F.weekofyear(ts).alias("iso_week"),
        F.quarter(ts).alias("q"),
        # date-typed results go out as TIMESTAMP (repo convention —
        # pandas renders Spark DATE and DuckDB DATE incompatibly)
        F.to_date(ts).cast("timestamp").alias("day"),
        F.date_add(F.to_date(ts), 30).cast("timestamp").alias("day_plus_30"),
        F.datediff(F.lit("2024-03-01").cast("date"), F.to_date(ts)).alias(
            "days_to_march"
        ),
        F.date_trunc("week", ts).alias("week_start"),
    )


def sql_time_function_suite(events: str = "events") -> str:
    return (
        "SELECT event_id, "
        "CAST(EXTRACT(year FROM ts) AS INT) AS y, "
        "CAST(EXTRACT(month FROM ts) AS INT) AS m, "
        "CAST(EXTRACT(day FROM ts) AS INT) AS d, "
        "CAST(EXTRACT(hour FROM ts) AS INT) AS h, "
        "CAST(EXTRACT(minute FROM ts) AS INT) AS mi, "
        "CAST(dayofweek(ts) + 1 AS INT) AS dow, "
        "CAST(weekofyear(ts) AS INT) AS iso_week, "
        "CAST(EXTRACT(quarter FROM ts) AS INT) AS q, "
        "CAST(CAST(ts AS DATE) AS TIMESTAMP) AS day, "
        "CAST(CAST(ts AS DATE) + INTERVAL 30 DAY AS TIMESTAMP) AS day_plus_30, "
        "CAST(datediff('day', CAST(ts AS DATE), DATE '2024-03-01') AS INT) "
        "AS days_to_march, "
        "CAST(date_trunc('week', ts) AS TIMESTAMP) AS week_start "
        f"FROM {events}"
    )


def array_function_suite(embeddings: DataFrame) -> DataFrame:
    """Array accessors over ``array<float>`` without exploding:
    size / element_at (1-based, like SQL) / array_min / array_max plus
    explicit element arithmetic.

    Element sums are written as explicit ``element_at`` chains (not a
    fold) so the double addition order is part of the query text and
    therefore bit-identical on any engine — the same discipline the
    exact-decimal helpers apply to aggregates.
    """
    e = F.col("embedding")

    def el(i: int) -> F.Column:
        return F.element_at(e, i).cast("double")

    return embeddings.select(
        "vec_id",
        F.size(e).alias("n_dims"),
        el(1).alias("first_val"),
        F.array_max(e).cast("double").alias("max_val"),
        F.array_min(e).cast("double").alias("min_val"),
        (el(1) + el(2) + el(3) + el(4)).alias("head4_sum"),
        (el(1) * el(1) + el(2) * el(2) + el(3) * el(3)).alias("head3_sqsum"),
    )


def sql_array_function_suite(embeddings: str = "embeddings") -> str:
    def el(i: int) -> str:
        return f"CAST(embedding[{i}] AS DOUBLE)"

    return (
        "SELECT vec_id, "
        "CAST(len(embedding) AS INT) AS n_dims, "
        f"{el(1)} AS first_val, "
        "CAST(list_max(embedding) AS DOUBLE) AS max_val, "
        "CAST(list_min(embedding) AS DOUBLE) AS min_val, "
        f"({el(1)} + {el(2)} + {el(3)} + {el(4)}) AS head4_sum, "
        f"({el(1)} * {el(1)} + {el(2)} * {el(2)} + {el(3)} * {el(3)}) AS head3_sqsum "
        f"FROM {embeddings}"
    )


def conditional_aggregate_suite(orders: DataFrame) -> DataFrame:
    """count_if / bool_and / bool_or / median per group — the
    predicate-aggregate family.

    median is an EXACT percentile here (not approx): Spark sorts within
    the aggregation buffer; at 100 TB prefer approx_percentile for the
    fixed-size-sketch merge unless exactness is contractual
    (quantity_quantiles covers that trade).  Interpolated midpoints of
    2-dp doubles are the same IEEE expression on both engines.
    """
    return orders.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.count_if(F.col("o_totalprice") > 200000.0).alias("n_big"),
        F.bool_and(F.col("o_totalprice") > 0.0).alias("all_positive"),
        F.bool_or(F.col("o_orderpriority") == "1-URGENT").alias("any_urgent"),
        F.median("o_totalprice").alias("median_price"),
    )


def sql_conditional_aggregate_suite(orders: str = "orders") -> str:
    return (
        "SELECT o_orderstatus, CAST(COUNT(1) AS BIGINT) AS n, "
        "CAST(count_if(o_totalprice > 200000.0) AS BIGINT) AS n_big, "
        "bool_and(o_totalprice > 0.0) AS all_positive, "
        "bool_or(o_orderpriority = '1-URGENT') AS any_urgent, "
        "median(o_totalprice) AS median_price "
        f"FROM {orders} GROUP BY o_orderstatus"
    )


def error_safe_suite(lineitem: DataFrame) -> DataFrame:
    """try_* error-safe semantics: malformed input -> NULL, never a
    task failure.  The reference's whole error philosophy is
    skip-and-continue (SURVEY.md §4: bad input never kills the loop);
    in SQL that discipline is try_divide / try_cast / try_to_date —
    a failed row yields NULL and the 100 TB job keeps running, instead
    of one poison value killing a 10-hour query.

    Malformed rows are RARE by construction (~0.1-0.4%, gated on
    l_orderkey residues), which is both the realistic data shape and a
    measured 20x throughput difference: Spark's try_cast/try_* catch a
    JVM exception per FAILING row (string->int ANSI cast throws;
    ~15us/row of fill-in-stack-trace), so an all-malformed column turns
    a 0.2s scan into a 5s one at sf0.1.  try_to_date is the exception
    — its parser returns null without throwing — but the suite keeps
    the rare-failure shape everywhere so the cost model is uniform.
    """
    numeric_str = F.col("l_orderkey").cast("string")
    flag_src = F.when(
        F.col("l_orderkey") % 1000 == 0, F.col("l_returnflag")
    ).otherwise(numeric_str)
    mixed_src = F.concat(
        F.lit("9"),
        F.when(F.col("l_orderkey") % 500 == 0, F.col("l_linestatus")).otherwise(
            F.col("l_linenumber").cast("string")
        ),
    )
    date_src = F.when(
        F.col("l_orderkey") % 250 == 0, F.concat(F.lit("junk-"), F.col("l_returnflag"))
    ).otherwise(F.date_format("l_shipdate", "yyyy-MM-dd"))
    return lineitem.select(
        "l_orderkey",
        "l_linenumber",
        F.try_divide(F.col("l_extendedprice"), F.col("l_quantity")).alias(
            "unit_price"
        ),
        F.try_divide(
            F.col("l_extendedprice"), F.col("l_quantity") - F.col("l_quantity")
        ).alias("div_by_zero"),
        flag_src.try_cast("int").alias("flag_as_int"),
        F.try_to_date(date_src).cast("timestamp").alias("bad_date"),
        mixed_src.try_cast("int").alias("mixed_cast"),
    )


def sql_error_safe_suite(lineitem: str = "lineitem") -> str:
    return (
        "SELECT l_orderkey, l_linenumber, "
        "(l_extendedprice / NULLIF(l_quantity, 0.0)) AS unit_price, "
        "(l_extendedprice / NULLIF(l_quantity - l_quantity, 0.0)) AS div_by_zero, "
        "TRY_CAST(CASE WHEN l_orderkey % 1000 = 0 THEN l_returnflag "
        "ELSE CAST(l_orderkey AS VARCHAR) END AS INT) AS flag_as_int, "
        "CAST(TRY_CAST(CASE WHEN l_orderkey % 250 = 0 THEN 'junk-' || l_returnflag "
        "ELSE strftime(l_shipdate, '%Y-%m-%d') END AS DATE) AS TIMESTAMP) AS bad_date, "
        "TRY_CAST('9' || CASE WHEN l_orderkey % 500 = 0 THEN l_linestatus "
        "ELSE CAST(l_linenumber AS VARCHAR) END AS INT) AS mixed_cast "
        f"FROM {lineitem}"
    )
