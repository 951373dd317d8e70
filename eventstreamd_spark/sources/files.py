"""Multi-format batch file sources — the absence-list scan coverage
(SURVEY.md §2: the reference has ONE source, newline-JSON over a Unix
socket; a warehouse engine needs every common file format).

Parquet is the native path (typed, compressed, column-prunable,
predicate-pushable — what every fixture table uses via
session.load_table).  CSV and JSON-lines exist for interchange; both
are read with an EXPLICIT schema, which at scale is non-negotiable:
schema inference is a full extra pass over the data, and silently
wrong (all-null columns infer as string).  PERMISSIVE mode mirrors the
reference's skip-bad-lines ingest (util.py:11-21): malformed rows
null-fill instead of failing the job, and can be quarantined via
``columnNameOfCorruptRecord``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

FORMATS = ("parquet", "orc", "csv", "json")


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str,
    schema: StructType | None = None,
) -> DataFrame:
    """Read ``path`` in any supported format with identical semantics.

    Parquet carries its own schema; csv/json REQUIRE one (no inference
    pass — see module docstring).
    """
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {FORMATS}")
    if fmt == "parquet":
        return spark.read.parquet(path)
    if fmt == "orc":
        # the other typed columnar format: schema-carrying, column-
        # prunable, predicate-pushable (PushedFilters reach the ORC
        # reader exactly like parquet's)
        return spark.read.orc(path)
    if schema is None:
        raise ValueError(f"{fmt} reads require an explicit schema")
    reader = spark.read.schema(schema).option("mode", "PERMISSIVE")
    if fmt == "csv":
        return reader.option("header", "true").csv(path)
    return reader.json(path)


def write_table(df: DataFrame, path: str, fmt: str) -> None:
    """Write ``df`` in any supported format (overwrite)."""
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {FORMATS}")
    w = df.write.mode("overwrite")
    if fmt == "csv":
        w.option("header", "true").csv(path)
    elif fmt == "json":
        w.json(path)
    elif fmt == "orc":
        w.orc(path)
    else:
        w.parquet(path)
