"""Vector math over ``array<float>`` embedding columns — JVM-side
(zip_with + aggregate), accumulating in DOUBLE.

No UDFs: a 64-d dot product as ``aggregate(zip_with(a,b,*),0d,+)`` runs
inside codegen and vectorizes fine; a Pandas-UDF round trip would pay
Arrow serialization for arithmetic the JVM does natively.  At 100 TB
the brute-force variants below are quadratic-candidate generators —
they exist as correctness baselines; the scale path is the LSH-bucketed
variant in operators/similarity.py which prunes candidates before any
dot product is computed.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def to_double(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential left-to-right accumulation — same association order as
    DuckDB's list_* reductions, so results match to the last ULP."""
    return F.aggregate(
        F.zip_with(to_double(a), to_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


# --- DuckDB twins (explicit reductions, same association order) -----------


def sql_dot(a: str, b: str) -> str:
    return (
        f"list_reduce(list_prepend(CAST(0 AS DOUBLE), "
        f"list_transform(list_zip({a}, {b}), "
        f"p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))), "
        f"(acc, x) -> acc + x)"
    )


def sql_cosine(a: str, b: str) -> str:
    return f"({sql_dot(a, b)} / (sqrt({sql_dot(a, a)}) * sqrt({sql_dot(b, b)})))"


# --- zero-norm guard --------------------------------------------------------
#
# cosine(x, 0-vector) is 0/0 = NaN, and the two engines RANK NaN
# differently in the argmax idioms (Spark min(struct(-ccos, ...)) treats
# NaN as largest so the zero-norm candidate ranks LAST; DuckDB ORDER BY
# cos DESC ranks NaN FIRST).  The guarded variants replace the undefined
# cosine with a -2.0 sentinel — strictly below every real cosine (>= -1)
# in BOTH engines, so a zero-norm vector/centroid deterministically
# loses every argmax and never produces a NaN divergence.


def cosine_guarded(a: Column, b: Column) -> Column:
    na, nb = norm(a), norm(b)
    return F.when((na * nb) == 0.0, F.lit(-2.0)).otherwise(
        dot(a, b) / (na * nb)
    )


def sql_cosine_guarded(a: str, b: str) -> str:
    return (
        f"(CASE WHEN {sql_dot(a, a)} = 0 OR {sql_dot(b, b)} = 0 "
        f"THEN -2.0 ELSE {sql_cosine(a, b)} END)"
    )
