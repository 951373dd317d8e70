"""Event-time windowing over the event stream — batch-mode semantics
shared with the streaming layer (SURVEY.md §7: batch-first core with
streaming-identical expressions).

The reference has no event-time processing at all (absence list,
SURVEY.md §2); these operators are the layer-B upgrade.  Buckets are
computed with integer epoch arithmetic (``unix_micros`` + integer div)
rather than ``F.window`` so the exact same bucket boundaries are
expressible in any engine (the DuckDB oracle uses the same formula);
``F.window``/``session_window`` variants live in streaming/ where
watermarks apply.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

from eventstreamd_spark.functions.exact import dsum

US = 1_000_000


def tumbling_counts(
    events: DataFrame, width_s: int = 300, ts_col: str = "ts"
) -> DataFrame:
    """Tumbling (fixed, non-overlapping) windows: count + exact value sum
    per (bucket, subsystem).  One shuffle; bucket arithmetic is a narrow
    codegen'd projection."""
    # integer `div`, not `/` + cast: float division of epoch-micros can
    # round up across a bucket boundary; integer arithmetic cannot.
    bucket = F.timestamp_seconds(
        F.expr(f"unix_micros({ts_col}) div {width_s * US}") * width_s
    ).cast("timestamp_ntz")  # match the source tables' naive timestamps
    return (
        events.withColumn("bucket", bucket)
        .groupBy("bucket", "event_type")
        .agg(F.count("*").alias("n_events"), dsum("value", "sum_value"))
    )


def sliding_counts(
    events: DataFrame, width_s: int = 600, slide_s: int = 300, ts_col: str = "ts"
) -> DataFrame:
    """Sliding windows: each event lands in width/slide buckets.  Built
    by generating the covering bucket starts with ``sequence`` + explode
    — stays declarative, no UDF; row expansion factor = width/slide."""
    n = width_s // slide_s
    last_start = F.expr(f"unix_micros({ts_col}) div {slide_s * US}") * slide_s
    starts = F.sequence(
        last_start - F.lit((n - 1) * slide_s), last_start, F.lit(slide_s)
    )
    return (
        events.withColumn("window_start", F.explode(starts))
        .withColumn(
            "window_start", F.timestamp_seconds("window_start").cast("timestamp_ntz")
        )
        .groupBy("window_start", "event_type")
        .agg(F.count("*").alias("n_events"))
    )


def sessionize(
    events: DataFrame, gap_s: int = 1800, ts_col: str = "ts"
) -> DataFrame:
    """Sessionization: per-user sessions split on inactivity > gap.

    Classic two-window formulation: lag to detect gaps, prefix-sum of
    the gap indicator to number sessions.  Shuffles once on user_id;
    both windows reuse the same partitioning+sort (single exchange in
    the physical plan)."""
    w = W.partitionBy("user_id").orderBy(ts_col, "event_id")
    prev_ts = F.lag(ts_col).over(w)
    is_new = (
        prev_ts.isNull()
        | (F.unix_micros(F.col(ts_col)) - F.unix_micros(prev_ts) > gap_s * US)
    ).cast("int")
    numbered = events.withColumn(
        "session_seq",
        F.sum(is_new).over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )
    return numbered.groupBy("user_id", "session_seq").agg(
        F.count("*").alias("n_events"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
    )


def funnel_counts(
    events: DataFrame,
    steps: tuple[str, ...] = ("view", "click", "purchase"),
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered-funnel analysis: how many users reached step k (each
    step strictly after the previous one).

    Per user, the earliest time step 1 occurred; then the earliest
    step-2 event after that; and so on — min-over-filtered-window per
    step, all computed in ONE groupBy(user) pass using conditional
    aggregation on a collected (sorted) event list.  One shuffle on
    user_id, state per user = its events of the funnel types only.

    Output: step index + name + users reaching it (monotone declining).
    """
    from pyspark.sql import functions as F

    typed = events.filter(F.col("event_type").isin(*steps)).select(
        "user_id", "event_type", F.col(ts_col).alias("__ts")
    )
    evs = typed.groupBy("user_id").agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("__ts").alias("ts"), "event_type"))
        ).alias("evs")
    )
    # fold the sorted event list once: reached[k] = first ts of steps[k]
    # strictly after reached[k-1].  NB: HOF lambdas must be unary —
    # closures via factory functions, never defaulted params (Spark
    # reads extra params as the element-index argument).
    def first_match(step: str, after):
        def pred(e):
            cond = e["event_type"] == step
            return cond if after is None else cond & (e["ts"] > after)

        return F.array_min(
            F.transform(F.filter(F.col("evs"), pred), lambda e: e["ts"])
        )

    # One STACKED projection per step: t{k} is referenced both by the
    # output and inside t{k+1}'s lambda, so CollapseProject's
    # non-cheap-multi-reference guard keeps each reach time
    # MATERIALIZED.  Building all steps in one select instead nests
    # t0's whole min-filter-transform inside t1 inside t2 — the
    # expression tree (and per-row work) grows geometrically with
    # funnel depth, and codegen CSE cannot share across lambda scopes.
    reached = evs
    for k, step in enumerate(steps):
        prev = F.col(f"t{k - 1}") if k else None
        reached = reached.select(
            "*", first_match(step, prev).alias(f"t{k}")
        )
    reached = reached.drop("evs")
    counts = reached.agg(
        *[
            F.count(F.col(f"t{k}")).alias(f"n{k}")
            for k in range(len(steps))
        ]
    )
    rows = counts.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k + 1).alias("step"),
                        F.lit(steps[k]).alias("event_type"),
                        F.col(f"n{k}").alias("n_users"),
                    )
                    for k in range(len(steps))
                ]
            )
        ).alias("s")
    ).select("s.*")
    return rows


def sql_funnel_counts(
    steps: tuple[str, ...] = ("view", "click", "purchase"),
    table: str = "events",
) -> str:
    """DuckDB twin: same per-user fold via correlated min-filters."""
    step_list = ", ".join(f"'{s}'" for s in steps)
    # correlated references between aggregates need staged CTEs
    ctes = ["SELECT user_id, min(ts) FILTER (event_type = "
            f"'{steps[0]}') AS t0 FROM base GROUP BY user_id"]
    for k in range(1, len(steps)):
        ctes.append(
            f"SELECT r{k-1}.user_id, t0"
            + "".join(f", t{j}" for j in range(1, k))
            + f", min(b.ts) FILTER (b.event_type = '{steps[k]}' AND b.ts > r{k-1}.t{k-1}) AS t{k} "
            f"FROM r{k-1} LEFT JOIN base b ON b.user_id = r{k-1}.user_id "
            f"GROUP BY ALL"
        )
    cte_sql = ",\n".join(
        f"r{k} AS ({q})" for k, q in enumerate(ctes)
    )
    unions = " UNION ALL ".join(
        f"SELECT {k + 1} AS step, '{steps[k]}' AS event_type, "
        f"count(t{k}) AS n_users FROM r{len(steps) - 1}"
        for k in range(len(steps))
    )
    return (
        f"WITH base AS (SELECT user_id, event_type, ts FROM {table} "
        f"WHERE event_type IN ({step_list})),\n{cte_sql}\n{unions}"
    )


def weekly_retention_cohorts(events: DataFrame) -> DataFrame:
    """Cohort retention: users grouped by first-activity week, counted
    per subsequent activity week — the product-analytics staple next to
    funnel_counts.

    Two shuffles total: (1) per-user min(ts) for the cohort label — a
    map-side-partial aggregate on user_id; (2) the distinct-user count
    per (cohort_week, activity_week) cell.  The cohort label joins back
    to activity by user_id; at 100 TB both wide ops key on user_id, so
    pre-partitioning the events table by user_id collapses them onto
    one exchange.  week_offset counts whole weeks since cohort entry.
    """
    weekly = events.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("week")
    )
    cohorts = weekly.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        weekly.join(cohorts, "user_id")
        .groupBy("cohort_week", "week")
        .agg(F.countDistinct("user_id").alias("n_active"))
        .withColumn(
            "week_offset",
            F.datediff(F.col("week"), F.col("cohort_week")) / 7,
        )
        .withColumn("week_offset", F.col("week_offset").cast("int"))
        .select("cohort_week", "week_offset", "n_active")
    )


def sql_weekly_retention_cohorts(table: str = "events") -> str:
    return """
SELECT c.cohort_week,
       CAST(date_diff('day', c.cohort_week, w.week) / 7 AS INT) AS week_offset,
       CAST(COUNT(DISTINCT w.user_id) AS BIGINT) AS n_active
FROM (SELECT user_id, date_trunc('week', ts) AS week FROM {t}) w
JOIN (SELECT user_id, MIN(date_trunc('week', ts)) AS cohort_week
      FROM {t} GROUP BY user_id) c USING (user_id)
GROUP BY c.cohort_week, CAST(date_diff('day', c.cohort_week, w.week) / 7 AS INT)
""".format(t=table)


def interarrival_stats(events: DataFrame) -> DataFrame:
    """Per-user inter-arrival gap statistics: count, min/max and LOWER
    MEDIAN of the gaps between consecutive events (epoch MICROseconds
    — integer-exact; second-truncation would round differently across
    engines) —
    the signal behind session-timeout tuning (operators/windows.py's
    30-minute sessionization gap stops being folklore once this
    reports the actual gap distribution).

    Gaps are integer epoch-microsecond differences via a per-user lag
    window; the median is the rank-threshold rule (min gap with
    2*rank >= count — an actual data value, no interpolation), so the
    whole output is engine-exact.  Everything is partitioned by
    user_id: two window passes + one aggregate, no global state.
    """
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = (
        events.select(
            "user_id",
            "ts",
            "event_id",
            (
                F.unix_micros("ts")
                - F.unix_micros(F.lag("ts").over(w))
            ).alias("gap_us"),
        )
        .filter(F.col("gap_us").isNotNull())
    )
    wr = W.partitionBy("user_id").orderBy("gap_us", "ts", "event_id")
    cnt = W.partitionBy("user_id")
    ranked = gaps.withColumn("rn", F.row_number().over(wr)).withColumn(
        "nn", F.count("*").over(cnt)
    )
    return ranked.groupBy("user_id").agg(
        F.count("*").cast("bigint").alias("n_gaps"),
        F.min("gap_us").cast("bigint").alias("min_gap_us"),
        F.max("gap_us").cast("bigint").alias("max_gap_us"),
        F.min(F.when(2 * F.col("rn") >= F.col("nn"), F.col("gap_us")))
        .cast("bigint")
        .alias("median_gap_us"),
    )


def sql_interarrival_stats(table: str = "events") -> str:
    """DuckDB twin — same gap construction and rank-threshold median."""
    return f"""
WITH gaps AS (
  SELECT user_id, ts, event_id,
         epoch_us(ts) - epoch_us(lag(ts) OVER
           (PARTITION BY user_id ORDER BY ts, event_id)) AS gap_us
  FROM {table}
), g AS (SELECT * FROM gaps WHERE gap_us IS NOT NULL),
r AS (
  SELECT user_id, gap_us,
         row_number() OVER (PARTITION BY user_id
           ORDER BY gap_us, ts, event_id) AS rn,
         count(*) OVER (PARTITION BY user_id) AS nn
  FROM g
)
SELECT user_id, CAST(count(*) AS BIGINT) AS n_gaps,
       CAST(min(gap_us) AS BIGINT) AS min_gap_us,
       CAST(max(gap_us) AS BIGINT) AS max_gap_us,
       CAST(min(CASE WHEN 2 * rn >= nn THEN gap_us END) AS BIGINT)
         AS median_gap_us
FROM r GROUP BY user_id
"""


# ---------------------------------------------------------------------------
# Late-data audit — what would a streaming watermark drop?
# ---------------------------------------------------------------------------

LATE_JITTER_US = 600_000_000   # deterministic arrival jitter: 0..10 min
LATE_DELAY_US = 300_000_000    # audited watermark delay: 5 min
LATE_BUCKET_US = 3_600_000_000  # arrival-hour buckets for the prefix max


def late_data_audit(events: DataFrame, delay_us: int = LATE_DELAY_US) -> DataFrame:
    """Per event-time hour: how many events would a 5-minute watermark
    drop, under a deterministic arrival model?

    Streaming watermark semantics, replayed in batch: an event is LATE
    if its event time is older than (max event time seen over all
    earlier ARRIVALS) minus the allowed delay — exactly the row Spark's
    ``withWatermark`` would exclude from a windowed aggregate.  The
    fixture's ingest order is fully time-sorted, so arrival is modeled
    as ts + hash-derived jitter (0..10 min per event, deterministic in
    the event id): the out-of-orderness of a real collection fleet.

    The scale problem is the running max over GLOBAL arrival order — an
    unpartitioned window.  Decomposed with the repo's two-phase prefix
    idiom: per arrival-hour bucket maxima (one narrow aggregate), a
    cumulative max over the tiny bucket table (the documented KB-window
    exemption), and a bucket-local running max (bounded partitions).
    All comparisons in exact epoch microseconds.
    """
    from eventstreamd_spark.functions.text import h60

    h = h60(F.col("event_id").cast("string"))
    base = events.select(
        "event_id",
        F.unix_micros(F.col("ts")).alias("ev_us"),
        (F.unix_micros(F.col("ts")) + (h % LATE_JITTER_US)).alias("arr_us"),
    ).withColumn("bucket", F.expr(f"arr_us div {LATE_BUCKET_US}"))

    from pyspark.sql import Window as W

    bucket_max = base.groupBy("bucket").agg(F.max("ev_us").alias("b_max"))
    wb = W.orderBy("bucket").rowsBetween(W.unboundedPreceding, -1)
    prev_bucket = bucket_max.withColumn("prev_max", F.max("b_max").over(wb)).select(
        "bucket", "prev_max"
    )
    ww = (
        W.partitionBy("bucket")
        .orderBy("arr_us", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    flagged = (
        base.join(prev_bucket, "bucket")
        .withColumn("in_bucket_max", F.max("ev_us").over(ww))
        .withColumn(
            "run_max",
            F.greatest(
                F.coalesce(F.col("prev_max"), F.lit(-1)),
                F.coalesce(F.col("in_bucket_max"), F.lit(-1)),
            ),
        )
        .withColumn(
            "is_late", F.col("ev_us") < F.col("run_max") - F.lit(delay_us)
        )
    )
    return (
        flagged.groupBy(
            F.expr(f"ev_us div {LATE_BUCKET_US}").alias("event_hour_bucket")
        )
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.sum(F.col("is_late").cast("int")).cast("bigint").alias("n_late"),
        )
        .select(
            "event_hour_bucket",
            "n_events",
            "n_late",
            (F.col("n_events") - F.col("n_late")).alias("n_kept"),
            (
                F.col("n_late").cast("double") / F.col("n_events").cast("double")
            ).alias("late_rate"),
        )
    )


def sql_late_data_audit(table: str = "events") -> str:
    from eventstreamd_spark.functions.text import sql_h60

    h = sql_h60("CAST(event_id AS VARCHAR)")
    return f"""
WITH base AS (
  SELECT event_id,
         epoch_us(ts) AS ev_us,
         epoch_us(ts) + ({h} % {LATE_JITTER_US}) AS arr_us
  FROM {table}
),
bucketed AS (
  SELECT *, arr_us // {LATE_BUCKET_US} AS bucket FROM base
),
bucket_max AS (
  SELECT bucket, max(ev_us) AS b_max FROM bucketed GROUP BY bucket
),
prev_bucket AS (
  SELECT bucket,
         max(b_max) OVER (ORDER BY bucket
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS prev_max
  FROM bucket_max
),
flagged AS (
  SELECT b.ev_us,
         (b.ev_us < greatest(
            coalesce(p.prev_max, -1),
            coalesce(max(b.ev_us) OVER (
              PARTITION BY b.bucket ORDER BY b.arr_us, b.event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
          ) - {LATE_DELAY_US}) AS is_late
  FROM bucketed b JOIN prev_bucket p USING (bucket)
)
SELECT ev_us // {LATE_BUCKET_US} AS event_hour_bucket,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CASE WHEN is_late THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
       CAST(count(*) - sum(CASE WHEN is_late THEN 1 ELSE 0 END) AS BIGINT)
         AS n_kept,
       (CAST(sum(CASE WHEN is_late THEN 1 ELSE 0 END) AS DOUBLE)
          / CAST(count(*) AS DOUBLE)) AS late_rate
FROM flagged
GROUP BY event_hour_bucket
"""


# ---------------------------------------------------------------------------
# Last-touch attribution — self-as-of-join over the event stream
# ---------------------------------------------------------------------------

ATTR_CONVERSION = "purchase"
ATTR_TOUCHES = ("click", "view")


def last_touch_attribution(events: DataFrame) -> DataFrame:
    """Attribute each conversion to the user's most recent prior touch
    event; report conversions and exact time-to-convert per channel.

    The marketing-analytics classic, and a stress test of the as-of
    tier: both sides are the SAME 100 TB event stream, so any range- or
    cross-join formulation explodes.  This reuses asof.py's union-merge
    idiom — one shuffle on user_id, one ordered carry — with ties
    resolved deterministically by touch event id.  Conversions with no
    prior touch land in the 'none' channel (they must not vanish — the
    organic-conversion share is the point of the report).

    Time-to-convert aggregates as an exact BIGINT microsecond sum; the
    per-channel mean is one fixed-order IEEE division at the end.
    """
    # Single-scan specialization of asof.py's union-merge idiom: both
    # as-of sides come from the SAME relation, so instead of two
    # filtered scans glued by a union (what asof_join over
    # events/events would plan), ONE scan computes the side flag and
    # the side-gated columns per row — identical (__t, __side,
    # touch_id) ordering, so tie semantics match asof_join and the
    # unchanged oracle exactly; at 100 TB this halves the corpus reads.
    is_conv = F.col("event_type") == ATTR_CONVERSION
    is_touch = F.col("event_type").isin(*ATTR_TOUCHES)
    base = events.filter(is_conv | is_touch).select(
        F.col("user_id").alias("__k"),
        F.col("ts").alias("__t"),
        is_conv.cast("int").alias("__side"),
        F.when(is_touch, F.col("event_id")).alias("__v_touch_id"),
        F.when(is_touch, F.col("event_type")).alias("__v_touch_type"),
        F.when(is_touch, F.unix_micros(F.col("ts"))).alias("__v_touch_us"),
        F.when(is_conv, F.col("event_id")).alias("purchase_id"),
        F.when(is_conv, F.unix_micros(F.col("ts"))).alias("p_us"),
    )
    w = (
        W.partitionBy("__k")
        .orderBy("__t", "__side", "__v_touch_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    attributed = (
        base.select(
            "*",
            F.last("__v_touch_type", ignorenulls=True).over(w).alias("touch_type"),
            F.last("__v_touch_us", ignorenulls=True).over(w).alias("touch_us"),
        )
        .filter(F.col("__side") == 1)
        .select("purchase_id", "p_us", "touch_type", "touch_us")
    )
    return (
        attributed.groupBy(
            F.coalesce(F.col("touch_type"), F.lit("none")).alias("channel")
        )
        .agg(
            F.count("*").cast("bigint").alias("n_conversions"),
            F.sum(F.col("p_us") - F.col("touch_us")).cast("bigint").alias("sum_lag_us"),
        )
        .select(
            "channel",
            "n_conversions",
            "sum_lag_us",
            (
                F.col("sum_lag_us").cast("double")
                / F.col("n_conversions").cast("double")
                / F.lit(1000000.0)
            ).alias("avg_seconds_to_convert"),
        )
    )


def sql_last_touch_attribution(table: str = "events") -> str:
    from eventstreamd_spark.operators.asof import asof_join_oracle_sql

    left = (
        f"(SELECT event_id AS purchase_id, user_id, ts, epoch_us(ts) AS p_us "
        f"FROM {table} WHERE event_type = '{ATTR_CONVERSION}') AS p"
    )
    touch_set = ", ".join(f"'{t}'" for t in ATTR_TOUCHES)
    right = (
        f"(SELECT user_id, ts, event_id AS touch_id, event_type AS touch_type, "
        f"epoch_us(ts) AS touch_us "
        f"FROM {table} WHERE event_type IN ({touch_set})) AS t"
    )
    inner = asof_join_oracle_sql(
        left, right,
        left_key="user_id", right_key="user_id",
        left_ts="ts", right_ts="ts",
        value_cols=["touch_id", "touch_type", "touch_us"],
        left_cols=["purchase_id", "p_us"],
    )
    return f"""
WITH attributed AS ({inner})
SELECT coalesce(touch_type, 'none') AS channel,
       CAST(count(*) AS BIGINT) AS n_conversions,
       CAST(sum(p_us - touch_us) AS BIGINT) AS sum_lag_us,
       ((CAST(sum(p_us - touch_us) AS DOUBLE) / CAST(count(*) AS DOUBLE))
          / 1000000.0) AS avg_seconds_to_convert
FROM attributed
GROUP BY coalesce(touch_type, 'none')
"""


# --- multi-touch (linear) attribution ----------------------------------------

MT_LOOKBACK_US = 3 * 24 * 3600 * 1000000  # 3-day lookback window


def multi_touch_attribution(events: DataFrame) -> DataFrame:
    """Linear multi-touch attribution with EXACT integer credits: every
    touch in the conversion's 3-day lookback shares the conversion's
    1000 milli-credits as ``1000 div k`` each, with the remainder
    ``1000 mod k`` granted to the LAST touch (deterministic tie-break
    by touch id) — so each conversion's credits sum to exactly 1000 and
    every aggregate stays integer (a 40/20/40 U-shape needs 200/(k-2)
    fractional credits whose doubles sum order-dependently; the
    remainder convention keeps multi-touch exact instead).
    Touchless conversions credit the 'none' channel — the organic
    share must not vanish.

    Plan: one user-keyed equi self-join (purchases x touches) with the
    lookback as the band predicate — per-user pair volume is bounded
    by activity within the 3-day window (the same per-user bound the
    as-of tier documents; skewed power users hit AQE skew-join).  The
    credit split is a per-conversion window over that user's <=window
    touches; channel rollup is |channels| rows, and the share divides
    by the window-summed total exactly.
    """
    from pyspark.sql import Window

    p = events.filter(F.col("event_type") == ATTR_CONVERSION).select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.unix_micros(F.col("ts")).alias("p_us"),
    )
    t = events.filter(F.col("event_type").isin(*ATTR_TOUCHES)).select(
        F.col("user_id").alias("t_user"),
        F.col("event_id").alias("touch_id"),
        F.col("event_type").alias("channel"),
        F.unix_micros(F.col("ts")).alias("touch_us"),
    )
    pairs = p.join(
        t,
        (F.col("p_user") == F.col("t_user"))
        & (F.col("touch_us") <= F.col("p_us"))
        & (F.col("touch_us") > F.col("p_us") - F.lit(MT_LOOKBACK_US)),
        "left",
    )
    wk = Window.partitionBy("purchase_id")
    wlast = Window.partitionBy("purchase_id").orderBy(
        F.desc("touch_us"), F.desc("touch_id")
    )
    credited = (
        pairs.withColumn("k", F.count("touch_id").over(wk))
        .withColumn("rn", F.row_number().over(wlast))
        .select(
            F.coalesce(F.col("channel"), F.lit("none")).alias("channel"),
            F.when(F.col("k") == 0, F.lit(1000).cast("bigint"))
            .otherwise(
                F.expr("1000 div k")
                + F.when(F.col("rn") == 1, F.expr("1000 % k")).otherwise(
                    F.lit(0)
                )
            )
            .cast("bigint")
            .alias("milli_credit"),
        )
    )
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    out = credited.groupBy("channel").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_touches"),
        F.sum("milli_credit").cast("bigint").alias("milli_credit"),
    )
    return out.select(
        "channel",
        "n_touches",
        "milli_credit",
        (
            F.col("milli_credit").cast("double")
            / F.sum("milli_credit").over(wall).cast("double")
        ).alias("credit_share"),
    )


def sql_multi_touch_attribution(table: str = "events") -> str:
    touch_set = ", ".join(f"'{t}'" for t in ATTR_TOUCHES)
    return f"""
WITH p AS (
  SELECT event_id AS purchase_id, user_id AS p_user, epoch_us(ts) AS p_us
  FROM {table} WHERE event_type = '{ATTR_CONVERSION}'
),
t AS (
  SELECT user_id AS t_user, event_id AS touch_id, event_type AS channel,
         epoch_us(ts) AS touch_us
  FROM {table} WHERE event_type IN ({touch_set})
),
pairs AS (
  SELECT p.purchase_id, t.channel, t.touch_id, t.touch_us
  FROM p LEFT JOIN t
    ON p.p_user = t.t_user
   AND t.touch_us <= p.p_us
   AND t.touch_us > p.p_us - {MT_LOOKBACK_US}
),
credited AS (
  SELECT coalesce(channel, 'none') AS channel,
         CASE WHEN count(touch_id) OVER (PARTITION BY purchase_id) = 0
              THEN 1000
              ELSE 1000 // count(touch_id) OVER (PARTITION BY purchase_id)
                   + CASE WHEN row_number() OVER (
                            PARTITION BY purchase_id
                            ORDER BY touch_us DESC, touch_id DESC) = 1
                          THEN 1000 % count(touch_id)
                                 OVER (PARTITION BY purchase_id)
                          ELSE 0 END
         END AS milli_credit
  FROM pairs
),
rolled AS (
  SELECT channel,
         CAST(count(*) AS BIGINT) AS n_touches,
         CAST(sum(milli_credit) AS BIGINT) AS milli_credit
  FROM credited GROUP BY 1
)
SELECT channel, n_touches, milli_credit,
       CAST(milli_credit AS DOUBLE)
         / CAST(sum(milli_credit) OVER () AS DOUBLE) AS credit_share
FROM rolled
"""


# --- session statistics rollup ------------------------------------------------


def session_stats(events: DataFrame, gap_s: int = 1800) -> DataFrame:
    """One-row session health report over the gap sessionizer: session
    count, bounce rate (single-event sessions — the engagement metric
    every funnel review starts with), exact mean events/session, the
    nearest-rank MEDIAN session length in events, and mean session
    duration in seconds.

    Exactness: counts and microsecond duration sums are BIGINTs; means
    are one final divide each; the median comes from a nearest-rank
    walk over the session-LENGTH HISTOGRAM (lengths are small ints, so
    the histogram is KB — the documented spine-table window idiom), not
    a sort of the session table.

    Plan: the sessionizer's one user-keyed exchange, a small session
    aggregate, then everything runs over the |distinct lengths|-row
    histogram.
    """
    from pyspark.sql import Window

    sessions = sessionize(events, gap_s=gap_s)
    lens = sessions.select(
        F.col("n_events").cast("bigint").alias("len"),
        (
            F.unix_micros(F.col("session_end"))
            - F.unix_micros(F.col("session_start"))
        ).alias("dur_us"),
    )
    hist = lens.groupBy("len").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt"),
        F.sum("dur_us").cast("bigint").alias("sum_dur_us"),
    )
    wcum = Window.orderBy("len").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    h = (
        hist.withColumn("cum", F.sum("cnt").over(wcum))
        .withColumn("n_sessions", F.sum("cnt").over(wall))
        .withColumn("n_bounce", F.sum(F.when(F.col("len") == 1, F.col("cnt")).otherwise(F.lit(0))).over(wall))
        .withColumn("sum_len", F.sum(F.col("len") * F.col("cnt")).over(wall))
        .withColumn("sum_dur", F.sum("sum_dur_us").over(wall))
    )
    rank = F.ceil(F.col("n_sessions").cast("double") / 2.0)
    return (
        h.filter(F.col("cum") >= rank)
        .orderBy("len")
        .limit(1)
        .select(
            F.col("n_sessions"),
            (
                F.col("n_bounce").cast("double")
                / F.col("n_sessions").cast("double")
            ).alias("bounce_rate"),
            (
                F.col("sum_len").cast("double")
                / F.col("n_sessions").cast("double")
            ).alias("mean_events"),
            F.col("len").alias("p50_events"),
            (
                F.col("sum_dur").cast("double")
                / (F.col("n_sessions").cast("double") * F.lit(1000000.0))
            ).alias("mean_duration_s"),
        )
    )


def sql_session_stats(table: str = "events", gap_s: int = 1800) -> str:
    return f"""
WITH numbered AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > {gap_s} * 1000000
              THEN 1 ELSE 0 END AS is_new
  FROM {table}
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  SELECT user_id, session_seq,
         CAST(count(*) AS BIGINT) AS len,
         epoch_us(max(ts)) - epoch_us(min(ts)) AS dur_us
  FROM (
    SELECT user_id, ts,
           sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS session_seq
    FROM numbered
  )
  GROUP BY user_id, session_seq
),
hist AS (
  SELECT len, CAST(count(*) AS BIGINT) AS cnt,
         CAST(sum(dur_us) AS BIGINT) AS sum_dur_us
  FROM sessions GROUP BY 1
),
cum AS (
  SELECT len, cnt, sum_dur_us,
         sum(cnt) OVER (ORDER BY len ROWS UNBOUNDED PRECEDING) AS cum,
         sum(cnt) OVER () AS n_sessions,
         sum(CASE WHEN len = 1 THEN cnt ELSE 0 END) OVER () AS n_bounce,
         sum(len * cnt) OVER () AS sum_len,
         sum(sum_dur_us) OVER () AS sum_dur
  FROM hist
)
SELECT CAST(n_sessions AS BIGINT) AS n_sessions,
       CAST(n_bounce AS DOUBLE) / CAST(n_sessions AS DOUBLE) AS bounce_rate,
       CAST(sum_len AS DOUBLE) / CAST(n_sessions AS DOUBLE) AS mean_events,
       len AS p50_events,
       CAST(sum_dur AS DOUBLE)
         / (CAST(n_sessions AS DOUBLE) * 1000000.0) AS mean_duration_s
FROM cum
WHERE cum >= ceil(CAST(n_sessions AS DOUBLE) / 2.0)
ORDER BY len LIMIT 1
"""
