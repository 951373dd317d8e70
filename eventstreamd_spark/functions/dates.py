"""ISO-date parsing with the reference's strict semantics.

Reference: /root/reference/evtstrd/date.py:7-16 — ``parse_iso_date``
accepts ``YYYY-MM-DD`` and ``YYYYMMDD`` (also the mixed forms the regex
``^(\\d{4})-?(\\d{2})-?(\\d{2})$`` admits), range-checks the components,
and raises ``ValueError`` otherwise.

Two surfaces:

- ``parse_iso_date`` — driver-side Python, used by the filter-DSL parser
  to type filter *literals* (parse errors must raise, matching
  /root/reference/evtstrd/filters.py:75-82).
- ``iso_date_col`` — executor-side Column expression, used to interpret
  payload *field values*; invalid => NULL (which the filter compiler
  turns into no-match, matching filters.py:25-26).
"""

from __future__ import annotations

import datetime
import re

from pyspark.sql import Column, functions as F

ISO_DATE_RE = re.compile(r"^(\d\d\d\d)-?(\d\d)-?(\d\d)$")

# Same pattern, Spark/RE2-safe, used inside Column expressions.
_ISO_DATE_PATTERN = r"^(\d{4})-?(\d{2})-?(\d{2})$"


def parse_iso_date(date_string: str) -> datetime.date:
    """Strict ISO date parse; raises ValueError like the reference."""
    if not date_string:
        raise ValueError(f"invalid date {date_string!r}")
    m = ISO_DATE_RE.match(date_string)
    if not m:
        raise ValueError(f"invalid date {date_string!r}")
    try:
        return datetime.date(int(m.group(1)), int(m.group(2)), int(m.group(3)))
    except ValueError as exc:
        raise ValueError(f"invalid date {date_string!r}") from exc


def iso_date_col(col: Column) -> Column:
    """String column -> DateType; NULL on anything parse_iso_date rejects.

    Normalizes ``YYYYMMDD`` to dashed form first, then ``try_to_date``
    (which range-checks month/day, so 2000-12-32 => NULL).  Strings not
    matching the ISO shape at all are mapped to NULL explicitly so junk
    like ``'hello'`` can never sneak through a lenient parser.
    """
    shaped = F.regexp_like(col, F.lit(_ISO_DATE_PATTERN))
    normalized = F.regexp_replace(col, _ISO_DATE_PATTERN, r"$1-$2-$3")
    return F.when(shaped, F.try_to_date(normalized, "yyyy-MM-dd"))


def iso_date_sql(expr: str) -> str:
    """DuckDB expression with semantics identical to ``iso_date_col``."""
    pat = r"^(\d{4})-?(\d{2})-?(\d{2})$"
    return (
        f"CASE WHEN regexp_matches({expr}, '{pat}') THEN "
        f"try_cast(regexp_replace({expr}, '{pat}', '\\1-\\2-\\3') AS DATE) END"
    )
