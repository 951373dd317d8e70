"""Deterministic sampling & dataset splitting — reproducibility
primitives for training-data pipelines.

``df.sample()`` is the wrong tool for curation at scale: its RNG is
partition-seeded, so results change with partitioning, engine, and
retry — and can never be replayed by another system.  The portable
alternative is HASH-GATED sampling: a row is in the sample iff
``hash(key, salt) mod D < rate*D``.  Properties that matter at 100 TB:

- reproducible across engines, partitionings, task retries, and time
  (the DuckDB oracle replays it bit-for-bit);
- stable under appends: a row's membership never changes as the
  dataset grows, so incremental pipelines don't resample old data;
- consistent across tables: sampling ``events`` and ``users`` by the
  same key yields referentially intact samples;
- a narrow filter — pushes to the scan, no shuffle, no state.

The hash is the repo-wide portable md5 construction
(functions/text.py::poly_hash); ``salt`` decorrelates independent
samples/splits drawn from the same key space.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from eventstreamd_spark.functions.text import poly_hash, sql_poly_hash

# denominator for rate arithmetic: rates are basis points (1/10_000),
# plenty for curation and exact in integer arithmetic on both engines
RATE_DENOM = 10_000


def hash_gate(key: Column, salt: str = "") -> Column:
    """Uniform [0, RATE_DENOM) bucket for a row key (BIGINT)."""
    return poly_hash(F.concat(key.cast("string"), F.lit(salt))) % RATE_DENOM


def sql_hash_gate(key_expr: str, salt: str = "") -> str:
    quoted = salt.replace("'", "''")
    return (
        f"({sql_poly_hash(f'(CAST({key_expr} AS VARCHAR) || ' + chr(39) + quoted + chr(39) + ')')} "
        f"% {RATE_DENOM})"
    )


def deterministic_sample(
    df: DataFrame, key: str, rate: float, salt: str = ""
) -> DataFrame:
    """Keep ~``rate`` of rows, membership decided only by ``key``."""
    bp = int(round(rate * RATE_DENOM))
    return df.filter(hash_gate(F.col(key), salt) < F.lit(bp))


def dataset_split(
    df: DataFrame,
    key: str,
    weights: dict[str, float],
    salt: str = "",
    split_col: str = "split",
) -> DataFrame:
    """Disjoint, exhaustive named splits (train/val/test) by key hash.

    Weight order matters for bucket assignment; the dict's insertion
    order is the contract (same order in the oracle).  Weights must sum
    to 1 within rate resolution.
    """
    bps = {name: int(round(w * RATE_DENOM)) for name, w in weights.items()}
    if sum(bps.values()) != RATE_DENOM:
        raise ValueError(f"weights must sum to 1 (got {sum(bps.values())} bp)")
    gate = hash_gate(F.col(key), salt)
    expr: Column | None = None
    lo = 0
    for name, width in bps.items():
        hi = lo + width
        cond = gate < F.lit(hi)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(
            cond, F.lit(name)
        )
        lo = hi
    return df.withColumn(split_col, expr)


def sql_dataset_split(
    key_expr: str,
    weights: dict[str, float],
    salt: str = "",
    split_col: str = "split",
) -> str:
    """The CASE expression twin of ``dataset_split``'s split column."""
    bps = {name: int(round(w * RATE_DENOM)) for name, w in weights.items()}
    gate = sql_hash_gate(key_expr, salt)
    branches = []
    lo = 0
    for name, width in bps.items():
        hi = lo + width
        branches.append(f"WHEN {gate} < {hi} THEN '{name}'")
        lo = hi
    return f"CASE {' '.join(branches)} END AS {split_col}"


def stratified_sample(
    df: DataFrame,
    key: str,
    stratum_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling: each stratum keeps its own
    rate (e.g. downsample 'view' events hard, keep every 'purchase').

    Same hash gate as deterministic_sample — so membership is still
    append-stable and engine-replayable — but the threshold is chosen
    per stratum via one CASE expression.  Still a pure narrow filter:
    no shuffle, pushes past nothing, costs one md5 per row.  This is
    the curation primitive for class rebalancing at corpus scale.
    """
    bp = F.lit(int(round(default_rate * RATE_DENOM)))
    for name, rate in rates.items():
        bp = (
            F.when(F.col(stratum_col) == name, int(round(rate * RATE_DENOM)))
            .otherwise(bp)
        )
    return df.filter(hash_gate(F.col(key), salt) < bp)


def rebalance_to_mix(
    df: DataFrame,
    key: str,
    group_col: str,
    targets: dict[str, float],
    salt: str = "",
) -> DataFrame:
    """Resample to a TARGET group mix — the domain-reweighting primitive
    of training-data pipelines ("web 50%, code 30%, papers 20%"), with
    per-group rates derived FROM the data rather than fixed up front
    (contrast ``stratified_sample``).

    Largest feasible downsample-only plan: N = min_g(count_g/target_g)
    is the biggest corpus whose mix can hit every target without
    upsampling; each group then keeps rate_g = N*target_g/count_g via
    the same append-stable hash gate as every sampler here.  Groups
    absent from ``targets`` are dropped.

    Plan shape at 100 TB: one tiny groupBy count (map-side partials),
    a scalar min, a broadcast of |groups| thresholds back onto the
    fact table, then a narrow filter — no fact-side shuffle at all.
    """
    if not targets:
        raise ValueError("targets must be non-empty")
    t_expr: Column | None = None
    for name, share in targets.items():
        t_expr = (
            F.when(F.col(group_col) == name, F.lit(float(share)))
            if t_expr is None
            else t_expr.when(F.col(group_col) == name, F.lit(float(share)))
        )
    counts = (
        df.groupBy(group_col)
        .agg(F.count("*").alias("_n"))
        .withColumn("_t", t_expr)
        .filter(F.col("_t").isNotNull())
    )
    feasible = counts.agg(F.min(F.col("_n") / F.col("_t")).alias("_cap"))
    rates = (
        counts.crossJoin(F.broadcast(feasible))
        .withColumn(
            "_bp",
            F.floor(
                F.least(
                    F.lit(float(RATE_DENOM)),
                    F.lit(RATE_DENOM) * F.col("_cap") * F.col("_t") / F.col("_n"),
                )
            ).cast("bigint"),
        )
        .select(group_col, "_bp")
    )
    return (
        df.join(F.broadcast(rates), group_col)
        .filter(hash_gate(F.col(key), salt) < F.col("_bp"))
        .drop("_bp")
    )


def sql_rebalance_to_mix(
    key_expr: str,
    group_col: str,
    targets: dict[str, float],
    salt: str = "",
    table: str = "events",
    select: str = "*",
) -> str:
    """CTE twin of ``rebalance_to_mix`` (same double arithmetic ops in
    the same order, so thresholds agree bit-for-bit)."""
    if not targets:
        raise ValueError("targets must be non-empty")
    t_case = " ".join(
        "WHEN '{}' THEN CAST({} AS DOUBLE)".format(
            name.replace("'", "''"), float(share)
        )
        for name, share in targets.items()
    )
    gate = sql_hash_gate(key_expr, salt)
    return f"""
WITH counts AS (
  SELECT {group_col}, count(*) AS _n,
         CASE {group_col} {t_case} END AS _t
  FROM {table} GROUP BY {group_col}
), feasible AS (
  SELECT min(_n / _t) AS _cap FROM counts WHERE _t IS NOT NULL
), rates AS (
  SELECT {group_col},
         CAST(floor(least(CAST({RATE_DENOM} AS DOUBLE),
                          {RATE_DENOM} * _cap * _t / _n)) AS BIGINT) AS _bp
  FROM counts, feasible WHERE _t IS NOT NULL
)
SELECT {select} FROM {table} JOIN rates USING ({group_col})
WHERE {gate} < _bp
"""


def temperature_mix(
    df: DataFrame,
    key: str,
    group_col: str,
    salt: str = "",
) -> DataFrame:
    """Temperature-based domain mixing at tau=2 (the multilingual-
    sampling smoother of Conneau & Lample 2019: sample group g with
    probability proportional to n_g^(1/tau), flattening the head
    without drowning the tail).

    Downsample-only closed form: with target share t_g proportional to
    sqrt(n_g), the largest feasible corpus keeps the smallest group
    whole and every other group at rate_g = sqrt(n_min)/sqrt(n_g) —
    the normalizing constant T = sum sqrt(n_g) cancels out of the rate,
    which is what makes this engine-portable: no cross-group float SUM
    whose accumulation order could differ between engines, only sqrt
    (IEEE correctly-rounded in both) and one division.  tau=2 is pinned
    for exactly that reason; arbitrary tau needs pow(), whose rounding
    is implementation-defined.

    Plan shape at 100 TB: identical to rebalance_to_mix — one tiny
    groupBy count, a scalar min, broadcast |groups| thresholds, narrow
    hash-gate filter; no fact-side shuffle.
    """
    counts = df.groupBy(group_col).agg(F.count("*").alias("_n"))
    n_min = counts.agg(F.min("_n").alias("_n_min"))
    rates = (
        counts.crossJoin(F.broadcast(n_min))
        .withColumn(
            "_bp",
            F.floor(
                F.lit(float(RATE_DENOM))
                * F.sqrt(F.col("_n_min").cast("double"))
                / F.sqrt(F.col("_n").cast("double"))
            ).cast("bigint"),
        )
        .select(group_col, "_bp")
    )
    return (
        df.join(F.broadcast(rates), group_col)
        .filter(hash_gate(F.col(key), salt) < F.col("_bp"))
        .drop("_bp")
    )


def sql_temperature_mix(
    key_expr: str,
    group_col: str,
    salt: str = "",
    table: str = "events",
    select: str = "*",
) -> str:
    """CTE twin of ``temperature_mix`` (same double ops, same order)."""
    gate = sql_hash_gate(key_expr, salt)
    return f"""
WITH counts AS (
  SELECT {group_col}, count(*) AS _n FROM {table} GROUP BY {group_col}
), m AS (
  SELECT min(_n) AS _n_min FROM counts
), rates AS (
  SELECT {group_col},
         CAST(floor(CAST({RATE_DENOM} AS DOUBLE)
                    * sqrt(CAST(_n_min AS DOUBLE))
                    / sqrt(CAST(_n AS DOUBLE))) AS BIGINT) AS _bp
  FROM counts, m
)
SELECT {select} FROM {table} JOIN rates USING ({group_col})
WHERE {gate} < _bp
"""


def sql_stratified_sample_pred(
    key_expr: str,
    stratum_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    salt: str = "",
) -> str:
    """WHERE-clause twin of the stratified gate."""
    gate = sql_hash_gate(key_expr, salt)
    branches = " ".join(
        f"WHEN {stratum_col} = '{name}' THEN {int(round(rate * RATE_DENOM))}"
        for name, rate in rates.items()
    )
    default_bp = int(round(default_rate * RATE_DENOM))
    return f"({gate} < CASE {branches} ELSE {default_bp} END)"


def seeded_shuffle_keys(
    df: DataFrame, key: str, seed: str = "epoch0"
) -> DataFrame:
    """Seed-stable global shuffle for training export: attach the
    portable-hash shuffle key a writer sorts by.

    Training pipelines need a reproducible corpus permutation per
    epoch (so a resumed/rescaled job reads the same order) without a
    global row_number — at 100 TB you never materialize positions.
    The shuffle_key is the scalable form: write with
    ``repartitionByRange(n, "shuffle_key").sortWithinPartitions`` and
    readers stream the permutation; changing the seed string is a new
    epoch permutation.  Same append-stable property as hash_gate:
    rows added later do not perturb existing keys.  Distinct-key
    caveat: ties hash-collide at ~n²/2/HASH_MOD and are broken by the
    row key downstream, which keeps the order total.
    """
    return df.select(
        F.col(key),
        poly_hash(F.concat(F.col(key).cast("string"), F.lit(":" + seed))).alias(
            "shuffle_key"
        ),
    )


def sql_seeded_shuffle_keys(
    table: str, key: str, seed: str = "epoch0"
) -> str:
    quoted = (":" + seed).replace("'", "''")
    h = sql_poly_hash(f"(CAST({key} AS VARCHAR) || '{quoted}')")
    return f"SELECT {key}, {h} AS shuffle_key FROM {table}"


def rebalance_to_token_mix(
    docs: DataFrame,
    key: str,
    group_col: str,
    targets: dict[str, float],
    weight_col: str = "n_chars",
    salt: str = "",
) -> DataFrame:
    """Domain rebalancing where the target mix is a WEIGHT share (token
    or byte budget), not a document share — what a training run
    actually specifies ("30% of TOKENS from code"), since domains have
    very different document lengths.

    Same largest-feasible downsample-only closed form as
    rebalance_to_mix, with per-group WEIGHT totals in place of counts:
    N = min_g(w_g / t_g), rate_g = N * t_g / w_g.  The hash gate stays
    per-document (docs are kept or dropped whole), so the achieved
    weight share concentrates around the target by sampling, exact in
    expectation.  Plan: tiny weighted groupBy, scalar min, broadcast
    thresholds, narrow filter — still no fact-side shuffle.
    """
    if not targets:
        raise ValueError("targets must be non-empty")
    t_expr: Column | None = None
    for name, share in targets.items():
        t_expr = (
            F.when(F.col(group_col) == name, F.lit(float(share)))
            if t_expr is None
            else t_expr.when(F.col(group_col) == name, F.lit(float(share)))
        )
    counts = (
        docs.groupBy(group_col)
        .agg(F.sum(F.col(weight_col).cast("long")).alias("_w"))
        .withColumn("_t", t_expr)
        .filter(F.col("_t").isNotNull())
    )
    feasible = counts.agg(F.min(F.col("_w") / F.col("_t")).alias("_cap"))
    rates = (
        counts.crossJoin(F.broadcast(feasible))
        .withColumn(
            "_bp",
            F.floor(
                F.least(
                    F.lit(float(RATE_DENOM)),
                    F.lit(RATE_DENOM) * F.col("_cap") * F.col("_t") / F.col("_w"),
                )
            ).cast("bigint"),
        )
        .select(group_col, "_bp")
    )
    return (
        docs.join(F.broadcast(rates), group_col)
        .filter(hash_gate(F.col(key), salt) < F.col("_bp"))
        .drop("_bp")
    )


def sql_rebalance_to_token_mix(
    key_expr: str,
    group_col: str,
    targets: dict[str, float],
    weight_col: str = "n_chars",
    salt: str = "",
    table: str = "documents",
    select: str = "*",
) -> str:
    """CTE twin of ``rebalance_to_token_mix``."""
    if not targets:
        raise ValueError("targets must be non-empty")
    t_case = " ".join(
        "WHEN '{}' THEN CAST({} AS DOUBLE)".format(
            name.replace("'", "''"), float(share)
        )
        for name, share in targets.items()
    )
    gate = sql_hash_gate(key_expr, salt)
    return f"""
WITH counts AS (
  SELECT {group_col}, CAST(sum({weight_col}) AS BIGINT) AS _w,
         CASE {group_col} {t_case} END AS _t
  FROM {table} GROUP BY {group_col}
), feasible AS (
  SELECT min(_w / _t) AS _cap FROM counts WHERE _t IS NOT NULL
), rates AS (
  SELECT {group_col},
         CAST(floor(least(CAST({RATE_DENOM} AS DOUBLE),
                          {RATE_DENOM} * _cap * _t / _w)) AS BIGINT) AS _bp
  FROM counts, feasible WHERE _t IS NOT NULL
)
SELECT {select} FROM {table} JOIN rates USING ({group_col})
WHERE {gate} < _bp
"""


def per_group_cap(
    df: DataFrame,
    key: str,
    group_col: str,
    cap: int,
    salt: str = "",
) -> DataFrame:
    """Keep at most ``cap`` rows per group, chosen deterministically by
    hash order — the per-domain quota of crawl pipelines (no single
    host may contribute more than K documents), replayable across
    engines.

    Pick rule: the ``cap`` smallest (hash_gate, key) pairs per group —
    a uniform "random" quota that any engine reproduces exactly.  Not
    append-stable (an exact quota can't be: a new doc can displace one)
    — use stratified_sample when append stability matters more than the
    hard cap.

    Plan: one window over the group-keyed exchange.  At 100 TB with a
    skewed group this is rank-then-filter on the hot key; the physical
    fix Spark applies for LIMIT-like windows (WindowGroupLimit pushes
    the rank filter into a per-partition pre-pass before the exchange)
    keeps the shuffle bounded at cap rows per group per map task.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(
        hash_gate(F.col(key), salt).asc(), F.col(key).asc()
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= cap)
        .drop("_rn")
    )


def sql_per_group_cap(
    key_expr: str,
    group_col: str,
    cap: int,
    salt: str = "",
    table: str = "documents",
    select: str = "*",
) -> str:
    """QUALIFY twin of ``per_group_cap``."""
    gate = sql_hash_gate(key_expr, salt)
    return f"""
SELECT {select} FROM {table}
QUALIFY row_number() OVER (
  PARTITION BY {group_col} ORDER BY {gate}, {key_expr}) <= {cap}
"""


# ---------------------------------------------------------------------------
# Weighted sampling — sequential Poisson (Ohlsson 1998)
# ---------------------------------------------------------------------------


def weighted_sample(
    df: DataFrame,
    key: str,
    weight: str,
    k: int,
    salt: str = "sps",
) -> DataFrame:
    """Deterministic weighted sample of ``k`` rows: sequential Poisson
    sampling (Ohlsson 1998) — rank every row by ``u / w`` where ``u``
    is a hash-uniform in (0, 1] derived from ``key`` and ``w`` is its
    weight, keep the ``k`` smallest.  Heavier rows draw smaller keys
    in expectation, giving inclusion probability ~ proportional to
    size, and membership is a pure function of (key, salt) — stable
    across engines, partitionings, and retries, like every sampler in
    this module.

    The priority is pure rational arithmetic on hash integers (no log/
    pow, unlike A-ES reservoir keys u^(1/w)) — bit-identical across
    engines, so the oracle replays it exactly.

    Scale: the ranking is ``ORDER BY ... LIMIT k`` — Spark plans
    TakeOrderedAndProject (per-partition top-k heaps, then a k-row
    merge on the driver side of the final stage), NOT a global sort or
    a one-partition window.  The scan stays narrow; nothing shuffles
    except per-partition k-row heads.

    Rows with NULL or non-positive weight are excluded (they have no
    defined inclusion probability).
    """
    kc, wc = F.col(key), F.col(weight)
    u = (
        (poly_hash(F.concat(kc.cast("string"), F.lit(":" + salt))) + 1)
        .cast("double")
    )  # in [1, HASH_MOD] — scale-free: only ratios order the sample
    pri = u / wc.cast("double")
    return (
        df.filter(wc.isNotNull() & (wc > 0))
        .select(kc.alias(key), wc.cast("bigint").alias("weight"),
                pri.alias("priority"))
        .orderBy("priority", key)
        .limit(k)
    )


def sql_weighted_sample(
    table: str,
    key: str,
    weight: str,
    k: int,
    salt: str = "sps",
) -> str:
    """DuckDB twin — identical hash-uniform, priority arithmetic, tie
    order, and LIMIT."""
    quoted = (":" + salt).replace("'", "''")
    h = sql_poly_hash(f"(CAST({key} AS VARCHAR) || '{quoted}')")
    return f"""
SELECT {key}, CAST({weight} AS BIGINT) AS weight,
       CAST(({h}) + 1 AS DOUBLE) / CAST({weight} AS DOUBLE) AS priority
FROM {table}
WHERE {weight} IS NOT NULL AND {weight} > 0
ORDER BY priority, {key}
LIMIT {k}
"""
