"""Property-based conformance: the Spark-compiled filter DSL against an
independent Python interpreter of the reference semantics.

The interpreter below is written from the spec (SURVEY.md §2 O4/O5,
reference filters.py:22-96): probe the dotted path; missing path or
JSON-type mismatch => no-match; int filters match JSON integers only
(bool is not an int), string filters match strings, date filters fetch
a string and ISO-parse it (dashed or YYYYMMDD), unparseable => no-match.
Hypothesis drives random payloads x random filters through BOTH
implementations and requires identical verdicts.
"""

from __future__ import annotations

import datetime
import json

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from eventstreamd_spark.functions.dates import parse_iso_date
from eventstreamd_spark.operators.filters import compile_filter, parse_filter

# --- independent reference-semantics interpreter ---------------------------


def _probe(payload: object, field: str) -> object:
    node = payload
    for seg in field.split("."):
        if not isinstance(node, dict) or seg not in node:
            raise KeyError(field)
        node = node[seg]
    return node


_OPS = {
    "=": lambda a, b: a == b,
    ">": lambda a, b: a > b,
    ">=": lambda a, b: a >= b,
    "<": lambda a, b: a < b,
    "<=": lambda a, b: a <= b,
}


def reference_match(payload: dict, filter_string: str) -> bool:
    spec = parse_filter(filter_string)
    try:
        raw = _probe(payload, spec.field)
    except KeyError:
        return False
    op = _OPS[spec.op]
    if spec.kind == "int":
        if not isinstance(raw, int) or isinstance(raw, bool):
            return False
        return op(raw, spec.value)
    if spec.kind == "string":
        if not isinstance(raw, str):
            return False
        return op(raw, spec.value)
    # date: fetch as string, ISO-parse, unparseable => no-match
    if not isinstance(raw, str):
        return False
    try:
        return op(parse_iso_date(raw), spec.value)
    except ValueError:
        return False


# --- strategies -------------------------------------------------------------

_SEG = st.from_regex(r"[a-z]{1,4}", fullmatch=True)
_FIELD = st.builds(".".join, st.lists(_SEG, min_size=1, max_size=2))
_OP = st.sampled_from(["=", ">", ">=", "<", "<="])
_ASCII = st.text(
    alphabet=st.characters(min_codepoint=0x20, max_codepoint=0x7E, exclude_characters="'\\\""),
    max_size=6,
)
_DATE = st.dates(datetime.date(2000, 1, 1), datetime.date(2030, 12, 28))


def _filter_strings() -> st.SearchStrategy[str]:
    lit = st.one_of(
        st.integers(-999, 999).map(str),
        _ASCII.map(lambda s: f"'{s}'"),
        _DATE.map(lambda d: d.isoformat()),
    )
    return st.builds(lambda f, o, v: f + o + v, _FIELD, _OP, lit)


_LEAF = st.one_of(
    st.integers(-999, 999),
    st.booleans(),
    st.none(),
    st.floats(-100, 100, allow_nan=False),
    _ASCII,
    _DATE.map(lambda d: d.isoformat()),
    _DATE.map(lambda d: d.strftime("%Y%m%d")),
)
_PAYLOAD = st.dictionaries(
    _SEG,
    st.one_of(_LEAF, st.dictionaries(_SEG, _LEAF, max_size=2)),
    max_size=4,
)


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    payloads=st.lists(_PAYLOAD, min_size=1, max_size=12),
    filters=st.lists(_filter_strings(), min_size=1, max_size=5),
)
def test_filter_dsl_conformance(spark, payloads, filters) -> None:
    rows = [(i, json.dumps(p)) for i, p in enumerate(payloads)]
    df = spark.createDataFrame(rows, "id bigint, props string")
    cols = [
        compile_filter(parse_filter(f), F.col("props")).alias(f"f{j}")
        for j, f in enumerate(filters)
    ]
    got = {r["id"]: r for r in df.select("id", *cols).collect()}
    for i, payload in enumerate(payloads):
        for j, f in enumerate(filters):
            expected = reference_match(payload, f)
            actual = bool(got[i][f"f{j}"])
            assert actual == expected, (
                f"filter {f!r} on payload {payload!r}: spark={actual} "
                f"reference={expected}"
            )
