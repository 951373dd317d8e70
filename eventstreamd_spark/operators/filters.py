"""The reference's filter mini-language, compiled to Catalyst Columns.

Grammar (reference /root/reference/evtstrd/filters.py:65-96):

    filter  := field op literal
    field   := [a-z.-]+          (dots = JSON path into the payload)
    op      := '=' | '>=' | '<=' | '<' | '>'
    literal := "'" str "'"       -> string filter
             | ISO date          -> date filter   (YYYY-MM-DD / YYYYMMDD)
             | int               -> int filter

Semantics (filters.py:22-44 + conformance tests evtstrd_test/filter.py):

- missing path        => no-match  (never an error)
- wrong JSON type     => no-match  (string filter over int field, int
                                    filter over string field, ...)
- date filters probe a JSON *string* field and ISO-parse it; junk or
  out-of-range dates => no-match
- multiple filters AND together; zero filters match everything
  (/root/reference/evtstrd/listener.py:62)
- parse errors raise ValueError (filters.py:88, 82)

Design: one ``FilterSpec`` is the single source of truth, compiled two
ways — ``compile_filter`` emits a Spark Column (variant-typed access, all
JVM-side, codegen'd), ``oracle_filter_sql`` emits the equivalent DuckDB
predicate for the driver's correctness oracle.  Both encode the same
strict type gates, so results are engine-identical by construction.

At scale: compiled filters are ordinary Catalyst predicates — they get
pushed below projections, AND-short-circuited, and (for envelope columns)
pushed into the parquet scan.  Payload probes can't push into the scan
(opaque JSON string) but run inside whole-stage codegen; at 100 TB the
subsystem/partition-column predicates do the data elimination and the
payload predicates run only on surviving rows.
"""

from __future__ import annotations

import datetime
import re
from dataclasses import dataclass
from functools import reduce
from typing import Literal

from pyspark.sql import Column, functions as F

from eventstreamd_spark.functions.dates import (
    iso_date_col,
    iso_date_sql,
    parse_iso_date,
)
from eventstreamd_spark.functions.jsonpath import duckdb_json_path, json_path

# Same regex as the reference (filters.py:65); alternation order matters
# for matching ">=" before ">".
_FILTER_RE = re.compile(r"^([a-z.-]+)(=|>=|<=|<|>)(.*)$")

Kind = Literal["string", "int", "date"]

_SPARK_OPS = {
    "=": lambda a, b: a == b,
    ">": lambda a, b: a > b,
    ">=": lambda a, b: a >= b,
    "<": lambda a, b: a < b,
    "<=": lambda a, b: a <= b,
}

_SQL_OPS = {"=": "=", ">": ">", ">=": ">=", "<": "<", "<=": "<="}


@dataclass(frozen=True)
class FilterSpec:
    """A parsed filter: field path, comparator, typed literal."""

    field: str
    op: str
    value: str | int | datetime.date
    kind: Kind
    string: str  # original text, round-trips like Filter.__str__

    def __str__(self) -> str:
        return self.string


def _parse_value(v: str) -> str | int | datetime.date:
    """Literal typing rules, reference filters.py:75-82.

    Quoted => string; ISO date => date; else int() (raising ValueError on
    junk, which is the parse-error contract the tests pin down).
    """
    if len(v) >= 2 and v.startswith("'") and v.endswith("'"):
        return v[1:-1]
    try:
        return parse_iso_date(v)
    except ValueError:
        pass
    return int(v)


def parse_filter(string: str) -> FilterSpec:
    """Parse one filter expression; raises ValueError on bad syntax."""
    m = _FILTER_RE.match(string)
    if not m:
        raise ValueError(f"invalid filter '{string}'")
    field = m.group(1)
    op = m.group(2)
    value = _parse_value(m.group(3))
    if isinstance(value, datetime.date):
        kind: Kind = "date"
    elif isinstance(value, int):
        kind = "int"
    else:
        kind = "string"
    return FilterSpec(field=field, op=op, value=value, kind=kind, string=string)


def compile_filter(
    spec: FilterSpec, payload: Column, pre_parsed: bool = False
) -> Column:
    """FilterSpec -> boolean Column over a JSON-string payload column
    (or, with ``pre_parsed=True``, an already-parsed variant column).

    NULL-safe: any missing path / wrong type / unparseable date collapses
    to False via the final coalesce, exactly the reference's
    ``except ValueError: return False`` (filters.py:25-26).

    Callers applying more than one filter should parse once and pass the
    variant (see filter_events) — each compiled predicate probes the
    payload twice (type gate + typed get), so inlining the parse costs
    2 x n_filters JSON parses per row.
    """
    path = json_path(spec.field)
    v = payload if pre_parsed else F.try_parse_json(payload)
    node_type = F.schema_of_variant(F.try_variant_get(v, path, "variant"))
    op = _SPARK_OPS[spec.op]

    if spec.kind == "int":
        # json_get(..., int): only a JSON integer matches (bool/float/str
        # coercions rejected by the type gate).
        typed = F.try_variant_get(v, path, "bigint")
        ok = node_type.isin("TINYINT", "SMALLINT", "INT", "BIGINT")
        pred = ok & op(typed, F.lit(spec.value))
    elif spec.kind == "string":
        typed = F.try_variant_get(v, path, "string")
        pred = (node_type == "STRING") & op(typed, F.lit(spec.value))
    else:  # date: probe a JSON string, then strict ISO parse
        raw = F.try_variant_get(v, path, "string")
        parsed = iso_date_col(raw)
        pred = (node_type == "STRING") & op(parsed, F.lit(spec.value))
    return F.coalesce(pred, F.lit(False))


def compile_filters(
    specs: list[FilterSpec], payload: Column, pre_parsed: bool = False
) -> Column:
    """AND of all filters; empty list matches everything
    (reference listener.py:62: ``all(f(data) for f in self.filters)``)."""
    if not specs:
        return F.lit(True)
    return reduce(
        lambda a, b: a & b,
        (compile_filter(s, payload, pre_parsed) for s in specs),
    )


def filter_events(df, specs: list[FilterSpec], payload_col: str = "props"):
    """Apply the compiled conjunction to a DataFrame.

    Parses the payload into a variant column ONCE; every predicate
    probes the parsed value.  ``filter_once`` keeps it that way — a
    plain ``.filter`` is pushed below the parse projection by the
    optimizer, re-parsing the payload per predicate probe inside
    FilterExec (which does no subexpression elimination); see
    plans/barriers.py.
    """
    from eventstreamd_spark.plans.barriers import filter_once

    if not specs:
        return df
    parsed = df.withColumn("__v", F.try_parse_json(F.col(payload_col)))
    return filter_once(
        parsed, compile_filters(specs, F.col("__v"), pre_parsed=True)
    ).drop("__v")


# ---------------------------------------------------------------------------
# DuckDB oracle twins — same semantics, generated from the same FilterSpec.
# ---------------------------------------------------------------------------


def _sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def oracle_filter_sql(spec: FilterSpec, payload_expr: str) -> str:
    """DuckDB boolean expression equivalent to ``compile_filter``."""
    path = _sql_quote(duckdb_json_path(spec.field))
    j = f"try_cast({payload_expr} AS JSON)"  # invalid JSON => NULL => no-match
    node_type = f"json_type({j}, {path})"
    raw = f"({j} ->> {path})"
    op = _SQL_OPS[spec.op]

    if spec.kind == "int":
        ok = f"{node_type} IN ('UBIGINT', 'BIGINT')"
        cmp = f"try_cast({raw} AS BIGINT) {op} {spec.value}"
    elif spec.kind == "string":
        ok = f"{node_type} = 'VARCHAR'"
        cmp = f"{raw} {op} {_sql_quote(str(spec.value))}"
    else:
        ok = f"{node_type} = 'VARCHAR'"
        cmp = f"{iso_date_sql(raw)} {op} DATE {_sql_quote(spec.value.isoformat())}"
    return f"coalesce(({ok}) AND ({cmp}), FALSE)"


def oracle_filters_sql(specs: list[FilterSpec], payload_expr: str) -> str:
    if not specs:
        return "TRUE"
    return " AND ".join(oracle_filter_sql(s, payload_expr) for s in specs)


def typed_extract(spec: FilterSpec, v: Column) -> Column:
    """The type-gated value of ``spec.field`` as a typed column
    (NULL on missing path / wrong JSON type / unparseable date).

    Splitting extraction from comparison lets MANY predicates over the
    same field share ONE variant probe: extract distinct (field, kind)
    pairs once per row, then every listener's comparison is a plain
    columnar op.  The reference evaluates each filter per (event,
    listener) with no sharing (SURVEY §3 EP1.5) — this is the
    corresponding optimization its architecture can't express.
    """
    path = json_path(spec.field)
    node_type = F.schema_of_variant(F.try_variant_get(v, path, "variant"))
    if spec.kind == "int":
        return F.when(
            node_type.isin("TINYINT", "SMALLINT", "INT", "BIGINT"),
            F.try_variant_get(v, path, "bigint"),
        )
    raw = F.when(
        node_type == "STRING", F.try_variant_get(v, path, "string")
    )
    if spec.kind == "string":
        return raw
    return iso_date_col(raw)


def extract_key(spec: FilterSpec) -> str:
    return f"__x_{spec.kind}_{spec.field.replace('.', '_')}"


def compile_on_extracted(spec: FilterSpec, extracted: Column) -> Column:
    """Comparison over a typed_extract column; NULL => no-match."""
    op = _SPARK_OPS[spec.op]
    return F.coalesce(op(extracted, F.lit(spec.value)), F.lit(False))
