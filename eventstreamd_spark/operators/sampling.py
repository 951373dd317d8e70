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
