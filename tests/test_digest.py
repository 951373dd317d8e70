"""Cross-engine canonicalization contract of the registry digest
(eventstreamd_spark/digest.py): the Spark fingerprint and the DuckDB
twin must agree on every kind, including the adversarial edges (NULLs,
unicode, NaN/inf, negative zero, 6-dp rounding ties, clamp bounds)."""

from __future__ import annotations

import duckdb
import pandas as pd

from eventstreamd_spark import digest as dg


def _spark_digest(spark, rows, schema, cols):
    df = spark.createDataFrame(rows, schema)
    out = dg.digest_frame(df, "t", cols).collect()[0]
    return out["n_rows"], out["fp"]


def _duck_digest(src, cols):
    """src: a pandas frame, or a VALUES-style SQL string (pandas
    registration coerces NaN to NULL, so NaN fixtures must be built as
    SQL literals — the real oracle produces NaN inside DuckDB)."""
    con = duckdb.connect()
    if isinstance(src, str):
        sql = dg.sql_digest_arm("t", src, cols)
    else:
        con.register("t_src", src)
        sql = dg.sql_digest_arm("t", "SELECT * FROM t_src", cols)
    _, n, fp = con.execute(sql).fetchone()
    return n, fp


def test_digest_matches_across_engines_on_edge_values(spark) -> None:
    rows = [
        (1, "héllo wörld", 1.5, True),
        (2, None, float("nan"), False),
        (3, "colons:and||pipes", float("inf"), None),
        (4, "", float("-inf"), True),
        (5, "N", -0.0, False),              # the NULL token as a real value
        (6, "x", 0.0001220703125, True),     # odd/2^13: exact 6-dp-ish tie food
        (7, "y", -1e15, False),              # beyond the clamp
        (8, "z", None, True),
        (9, "0:", 123456.7890123, False),
    ]
    schema = "id long, s string, d double, b boolean"
    cols = [("b", "bool"), ("d", "double"), ("id", "int"), ("s", "str")]
    n_s, fp_s = _spark_digest(spark, rows, schema, cols)

    def lit(v):
        if v is None:
            return "NULL"
        if isinstance(v, bool):
            return "true" if v else "false"
        if isinstance(v, float):
            if v != v:
                return "'nan'::DOUBLE"
            if v == float("inf"):
                return "'infinity'::DOUBLE"
            if v == float("-inf"):
                return "'-infinity'::DOUBLE"
            return f"CAST({v!r} AS DOUBLE)"
        if isinstance(v, str):
            return "'" + v.replace("'", "''") + "'"
        return str(v)

    values = ", ".join(
        "(" + ", ".join(lit(v) for v in row) + ")" for row in rows
    )
    src = f'SELECT * FROM (VALUES {values}) AS v(id, s, d, b)'
    n_d, fp_d = _duck_digest(src, cols)
    assert (n_s, fp_s) == (n_d, fp_d)
    assert n_s == 9 and fp_s != "0"


def test_digest_is_order_insensitive_and_value_sensitive(spark) -> None:
    cols = [("id", "int"), ("s", "str")]
    schema = "id long, s string"
    rows = [(1, "a"), (2, "b"), (3, "c")]
    _, fp1 = _spark_digest(spark, rows, schema, cols)
    _, fp2 = _spark_digest(spark, list(reversed(rows)), schema, cols)
    assert fp1 == fp2
    _, fp3 = _spark_digest(spark, [(1, "a"), (2, "b"), (3, "d")], schema, cols)
    assert fp3 != fp1


def test_digest_timestamps_match(spark) -> None:
    import datetime as dt

    rows = [
        (1, dt.datetime(2024, 1, 2, 3, 4, 5, 123456)),
        (2, dt.datetime(1969, 12, 31, 23, 59, 59, 999999)),  # negative epoch
        (3, None),
    ]
    cols = [("id", "int"), ("ts", "ts")]
    n_s, fp_s = _spark_digest(spark, rows, "id long, ts timestamp", cols)
    pdf = pd.DataFrame(rows, columns=["id", "ts"])
    n_d, fp_d = _duck_digest(pdf, cols)
    assert (n_s, fp_s) == (n_d, fp_d)


def test_digest_empty_result_is_zero(spark) -> None:
    cols = [("id", "int")]
    n, fp = _spark_digest(spark, [], "id long", cols)
    assert (n, fp) == (0, "0")
    n_d, fp_d = _duck_digest(pd.DataFrame({"id": pd.Series([], dtype="int64")}), cols)
    assert (n_d, fp_d) == (0, "0")


def test_digest_raises_on_manifest_drift(spark) -> None:
    import pytest

    df = spark.createDataFrame([(1, "a")], "id long, s string")
    with pytest.raises(ValueError, match="stale"):
        dg.digest_frame(df, "t", [("id", "int")])


def test_manifest_regeneration_is_noop(spark) -> None:
    """A forgotten `gen_digest_manifest` regeneration after a tail-query
    schema change must fail CI in BOTH directions: the registry import
    already raises on live-schema drift; this asserts the committed file
    is byte-identical to what the generator would write now, so a stale
    (silently narrower) manifest can't survive either."""
    import os
    import sys

    sys.path.insert(
        0,
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "tools",
        ),
    )
    import gen_digest_manifest as gen

    committed = open(gen.OUT).read()
    assert gen.render(gen.build_manifest(spark)) == committed
