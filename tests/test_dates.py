"""Port of /root/reference/evtstrd_test/date.py + Column-side equivalents."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from eventstreamd_spark.functions.dates import iso_date_col, parse_iso_date


def test_parse_with_dashes() -> None:
    assert parse_iso_date("2015-04-13") == datetime.date(2015, 4, 13)


def test_parse_without_dashes() -> None:
    assert parse_iso_date("20150413") == datetime.date(2015, 4, 13)


@pytest.mark.parametrize("bad", ["", "INVALID", "20151304"])
def test_parse_errors(bad: str) -> None:
    with pytest.raises(ValueError):
        parse_iso_date(bad)


def test_iso_date_col_matches_python_semantics(spark) -> None:
    cases = ["2015-04-13", "20150413", "", "INVALID", "20151304", "2000-12-32"]
    df = spark.createDataFrame([(c,) for c in cases], "s string")
    got = {r["s"]: r["d"] for r in df.select("s", iso_date_col(F.col("s")).alias("d")).collect()}
    for c in cases:
        try:
            expected = parse_iso_date(c)
        except ValueError:
            expected = None
        assert got[c] == expected, c
