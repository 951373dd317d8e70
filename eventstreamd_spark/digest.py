"""Registry digest: one driver-verifiable row per TAIL query.

The driver's correctness gate checks the first 50 registered queries;
the remaining ~120 ("the tail") were previously evidenced only by local
runs of tools/check_correctness.py.  ``registry_digest`` closes that
gap: it is itself a window query whose result contains, for EVERY tail
query, the row count and an order-insensitive value fingerprint of that
query's full result — computed by Spark over the Spark results, while
the DuckDB twin computes the same fingerprint over the oracle SQL
results.  One green driver row therefore transitively pins every tail
query's values each round.

Fingerprint = SUM over result rows of a 60-bit row hash, where the row
hash is md5 over a canonical row string (columns sorted by name,
length-prefixed field tokens).  SUM of non-negative 60-bit values in
DECIMAL(38,0) is exact, associative and commutative — order-insensitive
and partitioning-proof — and both engines agree on md5 of identical
UTF-8 strings (functions.text.poly_hash precedent).

Canonical rendering is the hard cross-engine part; per column KIND:

- str   -> the value itself (length prefix disambiguates concatenation)
- int   -> CAST(v AS VARCHAR)            (same digits either engine)
- bool  -> CAST(CAST(v AS INT) AS VARCHAR)
- date  -> CAST(v AS VARCHAR)            ('YYYY-MM-DD' both)
- ts    -> epoch microseconds as integer (unix_micros / epoch_us);
           never the rendered string — fraction formatting differs
- double-> 'nan'/'inf'/'-inf' spelled out, else
           CAST(round(clamp(v)*1e6, 0) AS BIGINT) as VARCHAR: v is
           bit-identical across engines (the registry invariant the
           per-query gates enforce), v*1e6 is one IEEE multiply,
           round(x, 0) is half-away-from-zero in BOTH engines, and the
           cast of an integral double <= 9.2e18 is exact in both
           (Spark truncates, DuckDB rounds — both identity on
           integers).  The clamp to +/-9.2e12 keeps the cast in range;
           6-dp quantization is lossy but DETERMINISTIC, which is all
           a fingerprint needs.
- NULL  -> the literal token 'N' (a length-prefixed token always
           starts with a digit, so 'N' cannot collide)

The per-query column kinds come from a generated, pytest-pinned
manifest (digest_manifest.py) rather than live schema inspection, so
the Spark side and the statically-generated SQL twin canonicalize
identically by construction; a schema drift raises instead of silently
fingerprinting different shapes.
"""

from __future__ import annotations

from typing import Callable, Iterable

from pyspark.sql import DataFrame, SparkSession, functions as F

DOUBLE_CLAMP = 9.2e12  # |v*1e6| stays < 2^63 after the multiply
_INT_TYPES = {"tinyint", "smallint", "int", "bigint"}


def kind_of(spark_type: str) -> str:
    """Map a Spark simpleString dtype to a canonical kind."""
    if spark_type == "string":
        return "str"
    if spark_type in _INT_TYPES:
        return "int"
    if spark_type == "boolean":
        return "bool"
    if spark_type == "date":
        return "date"
    if spark_type in ("timestamp", "timestamp_ntz"):
        return "ts"
    if spark_type in ("double", "float"):
        return "double"
    raise ValueError(f"no canonical digest kind for dtype {spark_type!r}")


# --- Spark-side canonicalization -------------------------------------------


def _canon(col: F.Column, kind: str) -> F.Column:
    if kind == "str":
        return col
    if kind == "int":
        return col.cast("bigint").cast("string")
    if kind == "bool":
        return col.cast("int").cast("string")
    if kind == "date":
        return col.cast("string")
    if kind == "ts":
        # TIMESTAMP_NTZ refuses unix_micros; the session tz is pinned
        # UTC, so the cast preserves the instant and both timestamp
        # flavors canonicalize to the same epoch-micros integer
        return F.unix_micros(col.cast("timestamp")).cast("string")
    if kind == "double":
        v = col.cast("double")
        clamped = F.greatest(
            F.least(v, F.lit(DOUBLE_CLAMP)), F.lit(-DOUBLE_CLAMP)
        )
        q = F.round(clamped * 1_000_000.0, 0).cast("bigint").cast("string")
        return (
            F.when(F.isnan(v), F.lit("nan"))
            .when(v == F.lit(float("inf")), F.lit("inf"))
            .when(v == F.lit(float("-inf")), F.lit("-inf"))
            .otherwise(q)
        )
    raise ValueError(kind)


def _token(col: F.Column, kind: str) -> F.Column:
    c = _canon(col, kind)
    return F.when(col.isNull(), F.lit("N")).otherwise(
        F.concat(F.length(c).cast("string"), F.lit(":"), c)
    )


def digest_frame(
    df: DataFrame, name: str, cols: list[tuple[str, str]]
) -> DataFrame:
    """1-row (query, n_rows, fp) digest of ``df`` under the manifest
    column spec ``cols`` (name-sorted [(column, kind), ...])."""
    got = sorted((f.name, kind_of(f.dataType.simpleString())) for f in df.schema.fields)
    want = sorted((c, k) for c, k in cols)
    if got != want:
        raise ValueError(
            f"digest manifest stale for {name!r}: manifest={want} live={got}"
        )
    rowstr = F.concat(*[_token(F.col(c), k) for c, k in want])
    h = F.conv(F.substring(F.md5(rowstr), 1, 15), 16, 10).cast("bigint")
    return df.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.coalesce(
            F.sum(h.cast("decimal(38,0)")).cast("string"), F.lit("0")
        ).alias("fp"),
    ).select(F.lit(name).alias("query"), "n_rows", "fp")


def registry_digest(
    spark: SparkSession,
    sf_dir: str,
    queries: dict[str, Callable[[SparkSession, str], DataFrame]],
    manifest: dict[str, list[tuple[str, str]]],
    names: Iterable[str],
) -> DataFrame:
    """Digest every query in ``names``: each tail query's digest is a
    fully DISTRIBUTED 1-row aggregation (scan/shuffle shapes of the
    underlying query are untouched); only the 1-row digests — O(tail
    count) scalars, a control plane like the k-means centroid loop —
    come back to the driver to be re-emitted as one small frame.  A
    lazy 120-arm union would express the same thing in one plan, but
    pays a megaplan optimization pass and loses per-query failure
    attribution; the meta-loop is deliberate.
    """
    rows = []
    for name in names:
        d = digest_frame(queries[name](spark, sf_dir), name, manifest[name])
        rows.extend(d.collect())
    return spark.createDataFrame(
        [(r["query"], r["n_rows"], r["fp"]) for r in rows],
        "query string, n_rows bigint, fp string",
    )


# --- DuckDB twin ------------------------------------------------------------


def _sql_canon(col: str, kind: str) -> str:
    if kind == "str":
        return col
    if kind == "int":
        return f"CAST(CAST({col} AS BIGINT) AS VARCHAR)"
    if kind == "bool":
        return f"CAST(CAST({col} AS INT) AS VARCHAR)"
    if kind == "date":
        return f"CAST({col} AS VARCHAR)"
    if kind == "ts":
        return f"CAST(epoch_us({col}) AS VARCHAR)"
    if kind == "double":
        v = f"CAST({col} AS DOUBLE)"
        clamped = f"greatest(least({v}, {DOUBLE_CLAMP}), -{DOUBLE_CLAMP})"
        q = f"CAST(CAST(round({clamped} * 1000000.0, 0) AS BIGINT) AS VARCHAR)"
        return (
            f"CASE WHEN isnan({v}) THEN 'nan' "
            f"WHEN {v} = 'infinity'::DOUBLE THEN 'inf' "
            f"WHEN {v} = '-infinity'::DOUBLE THEN '-inf' "
            f"ELSE {q} END"
        )
    raise ValueError(kind)


def _sql_token(col: str, kind: str) -> str:
    c = _sql_canon(col, kind)
    return (
        f"CASE WHEN {col} IS NULL THEN 'N' "
        f"ELSE CAST(length({c}) AS VARCHAR) || ':' || {c} END"
    )


def sql_digest_arm(
    name: str, oracle_sql: str, cols: list[tuple[str, str]]
) -> str:
    want = sorted((c, k) for c, k in cols)
    rowstr = " || ".join(_sql_token(f'"{c}"', k) for c, k in want)
    h = f"(('0x' || substr(md5({rowstr}), 1, 15))::BIGINT)"
    return (
        f"SELECT '{name}' AS query, CAST(count(*) AS BIGINT) AS n_rows, "
        f"coalesce(CAST(sum(CAST({h} AS DECIMAL(38,0))) AS VARCHAR), '0') AS fp "
        f"FROM ({oracle_sql}) __t_{name}"
    )


def sql_registry_digest(
    oracles: dict[str, str],
    manifest: dict[str, list[tuple[str, str]]],
    names: Iterable[str],
) -> str:
    arms = [sql_digest_arm(n, oracles[n], manifest[n]) for n in names]
    return "\nUNION ALL\n".join(arms)
