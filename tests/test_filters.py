"""Port of the reference filter conformance suite to DataFrame land.

Every case from /root/reference/evtstrd_test/filter.py appears here; the
payloads become rows of a JSON-string column and the parsed filter is
compiled to a Column predicate.  This file is the executable spec of the
filter language's semantics (missing path / wrong type => no-match).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from eventstreamd_spark.operators.filters import (
    compile_filter,
    compile_filters,
    parse_filter,
)


def matches(spark, filter_string: str, payload: str) -> bool:
    spec = parse_filter(filter_string)
    df = spark.createDataFrame([(payload,)], "props string")
    rows = df.select(compile_filter(spec, F.col("props")).alias("m")).collect()
    assert len(rows) == 1
    assert rows[0]["m"] is not None  # predicate must be null-safe boolean
    return rows[0]["m"]


# --- FilterTest (filter.py:8-37) -------------------------------------------


def test_str_roundtrip() -> None:
    assert str(parse_filter("foo.bar<='ABC'")) == "foo.bar<='ABC'"


def test_string_filter_path_not_found(spark) -> None:
    assert not matches(spark, "foo.bar<='ABC'", '{"foo": {}}')


def test_string_filter_wrong_type(spark) -> None:
    assert not matches(spark, "foo.bar<='50'", '{"foo": {"bar": 13}}')


def test_string_filter_compare(spark) -> None:
    assert matches(spark, "foo.bar<='ABC'", '{"foo": {"bar": "AAA"}}')
    assert matches(spark, "foo.bar<='ABC'", '{"foo": {"bar": "ABC"}}')
    assert not matches(spark, "foo.bar<='ABC'", '{"foo": {"bar": "CAA"}}')


def test_string_filter_lt(spark) -> None:
    assert matches(spark, "foo.bar<'ABC'", '{"foo": {"bar": "AAA"}}')
    assert not matches(spark, "foo.bar<'ABC'", '{"foo": {"bar": "ABC"}}')
    assert not matches(spark, "foo.bar<'ABC'", '{"foo": {"bar": "CAA"}}')


def test_string_filter_gt(spark) -> None:
    assert not matches(spark, "foo.bar>'ABC'", '{"foo": {"bar": "AAA"}}')
    assert not matches(spark, "foo.bar>'ABC'", '{"foo": {"bar": "ABC"}}')
    assert matches(spark, "foo.bar>'ABC'", '{"foo": {"bar": "CAA"}}')


# --- ParseFilterTest (filter.py:40-93) -------------------------------------


def test_invalid_filter() -> None:
    with pytest.raises(ValueError):
        parse_filter("INVALID")


def test_invalid_values() -> None:
    for bad in ("foo=bar", "foo='bar", "foo='", "foo=2000-12-32"):
        with pytest.raises(ValueError):
            parse_filter(bad)


def test_no_such_field(spark) -> None:
    assert not matches(spark, "foo<=10", "{}")


def test_wrong_type(spark) -> None:
    assert not matches(spark, "foo<=10", '{"foo": ""}')


def test_eq_int(spark) -> None:
    assert not matches(spark, "foo=10", '{"foo": 9}')
    assert matches(spark, "foo=10", '{"foo": 10}')
    assert not matches(spark, "foo=10", '{"foo": 11}')


def test_le_int(spark) -> None:
    assert matches(spark, "foo<=10", '{"foo": 9}')
    assert matches(spark, "foo<=10", '{"foo": 10}')
    assert not matches(spark, "foo<=10", '{"foo": 11}')


def test_ge_int(spark) -> None:
    assert not matches(spark, "foo>=10", '{"foo": 9}')
    assert matches(spark, "foo>=10", '{"foo": 10}')
    assert matches(spark, "foo>=10", '{"foo": 11}')


def test_eq_str(spark) -> None:
    assert not matches(spark, "foo='bar'", '{"foo": "baz"}')
    assert matches(spark, "foo='bar'", '{"foo": "bar"}')


def test_eq_date(spark) -> None:
    assert not matches(spark, "foo=2016-03-24", '{"foo": "2000-01-01"}')
    assert matches(spark, "foo=2016-03-24", '{"foo": "2016-03-24"}')


def test_nested_value(spark) -> None:
    assert matches(spark, "foo.bar<=10", '{"foo": {"bar": 10}}')


# --- beyond the reference suite: semantics the survey pins down ------------


def test_int_filter_rejects_float_bool_and_numeric_string(spark) -> None:
    # json_get(..., int) only accepts a JSON integer
    assert not matches(spark, "foo=1", '{"foo": 1.0}')
    assert not matches(spark, "foo=1", '{"foo": true}')
    assert not matches(spark, "foo=10", '{"foo": "10"}')


def test_string_filter_rejects_object_and_array(spark) -> None:
    assert not matches(spark, "foo='x'", '{"foo": {}}')
    assert not matches(spark, "foo='x'", '{"foo": []}')


def test_date_filter_accepts_undashed_field_value(spark) -> None:
    # parse_iso_date accepts YYYYMMDD (reference date.py:4)
    assert matches(spark, "foo=2016-03-24", '{"foo": "20160324"}')


def test_date_filter_range_and_ordering(spark) -> None:
    assert matches(spark, "foo>2016-03-24", '{"foo": "2016-03-25"}')
    assert not matches(spark, "foo>2016-03-24", '{"foo": "2016-03-24"}')
    # out-of-range field date => no-match, not error
    assert not matches(spark, "foo=2016-03-24", '{"foo": "2016-13-99"}')


def test_invalid_payload_json_no_match(spark) -> None:
    assert not matches(spark, "foo=10", "this is not json")


def test_conjunction_and_empty_filters(spark) -> None:
    df = spark.createDataFrame(
        [('{"k": 5, "s": "a"}',), ('{"k": 50, "s": "a"}',), ('{"k": 50, "s": "b"}',)],
        "props string",
    )
    specs = [parse_filter("k>=10"), parse_filter("s='a'")]
    got = df.filter(compile_filters(specs, F.col("props"))).count()
    assert got == 1
    assert df.filter(compile_filters([], F.col("props"))).count() == 3


def test_undashed_date_literal() -> None:
    spec = parse_filter("foo=20160324")
    assert spec.kind == "date"
    assert spec.value.isoformat() == "2016-03-24"
