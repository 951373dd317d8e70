"""Multi-dimensional data layout: Z-order clustering for data skipping.

The reference has no storage at all (SURVEY.md §4 — nothing to push
down into); at 100 TB the dominant cost of every selective query is the
bytes the scan does NOT skip.  Partitioning handles one categorical
dimension; a linear sort handles one ordered dimension; Z-ordering
interleaves the bits of TWO (or more) dimensions so every file covers a
small rectangle of the key space — parquet min/max row-group stats then
prune scans filtered on EITHER dimension.

All JVM-side: the z-value is built from shiftright/shiftleft/bitwise-OR
column expressions (whole-stage codegen, no UDF), the layout write is
``repartitionByRange`` on the z-value (range exchange with sampled
split points) + ``sortWithinPartitions`` so each output file owns a
contiguous z-range.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, functions as F

BITS = 16


def _normalize(c: Column, lo: float, hi: float) -> Column:
    """Map a numeric column into [0, 2^BITS) as a long."""
    scaled = (c.cast("double") - F.lit(float(lo))) / F.lit(float(hi - lo))
    clamped = F.least(F.greatest(scaled, F.lit(0.0)), F.lit(1.0 - 1e-12))
    return (clamped * F.lit(float(1 << BITS))).cast("long")


def zvalue(x: Column, y: Column) -> Column:
    """Interleave the low BITS bits of two longs (Morton code).

    2*BITS shift/mask/or column ops — constant-folded into one codegen
    stage; cost is a few ns per row, repaid at scan time by row-group
    pruning on both dimensions.
    """
    parts = []
    for i in range(BITS):
        parts.append(F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i + 1))
        parts.append(F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i))
    return reduce(lambda a, b: a.bitwiseOR(b), parts)


def write_zordered(
    df: DataFrame,
    path: str,
    col_x: str,
    col_y: str,
    x_range: tuple,
    y_range: tuple,
    n_files: int = 8,
) -> None:
    """Write ``df`` as parquet clustered by the Z-order of two columns.

    Ranges are caller-supplied (at scale: from table stats, not a
    pre-scan).  One range exchange + local sort; the z-value column is
    dropped before writing so the layout is invisible to readers except
    through its min/max stats.
    """
    zv = zvalue(
        _normalize(F.col(col_x), *x_range), _normalize(F.col(col_y), *y_range)
    ).alias("__zv")
    (
        df.withColumn("__zv", zv)
        .repartitionByRange(n_files, "__zv")
        .sortWithinPartitions("__zv")
        .drop("__zv")
        .write.mode("overwrite")
        .parquet(path)
    )


def file_clustering_spans(
    spark, path: str, col_x: str, col_y: str
) -> list[tuple[float, float]]:
    """Per-file (x_span, y_span) — the fraction of each dimension's
    global range a file covers.  The data-skipping figure of merit:
    a scan with a predicate on either column reads ~span of the files.
    """
    import glob
    import os

    spans = []
    files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    whole = spark.read.parquet(path).agg(
        F.min(col_x), F.max(col_x), F.min(col_y), F.max(col_y)
    ).collect()[0]
    gx = float(whole[1] - whole[0]) or 1.0
    gy = float(whole[3] - whole[2]) or 1.0
    for f in files:
        r = (
            spark.read.parquet(f)
            .agg(F.min(col_x), F.max(col_x), F.min(col_y), F.max(col_y))
            .collect()[0]
        )
        spans.append((float(r[1] - r[0]) / gx, float(r[3] - r[2]) / gy))
    return spans
