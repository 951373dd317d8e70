"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke-check at sf0.001.
``queries()``    — every implemented operator from SURVEY.md §2 (and the
                   layer-B analytics battery), as (spark, sf_dir) -> DataFrame.
``oracle_sql()`` — DuckDB twins over the pre-registered views
                   (region nation customer supplier part orders lineitem
                   events documents embeddings).

Column names are aliased identically on both sides; float aggregates are
computed via exact decimal arithmetic and cast back to double so the
order-insensitive value hash is bit-stable across engines.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession

from eventstreamd_spark import queries_registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference's whole hot path in one declarative plan —
    subsystem routing + filter-DSL conjunction over the event stream
    (SURVEY.md §7 phase 0)."""
    return queries_registry.QUERIES["flagship_filter_dsl"](
        spark, "/root/testdata/sf0.001"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(queries_registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(queries_registry.ORACLES)
