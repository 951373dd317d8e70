"""Skew-handling operators: salting and bucketed (shuffle-free) joins.

AQE's skew-join splitting handles most skew automatically (enabled in
session.py), but two situations need explicit treatment at 100 TB:

- **Salted aggregation**: a groupBy where a handful of keys own most
  rows (the power-law reality of subsystem/user keys).  One reducer
  gets the heavy key and the stage runs at straggler speed.  Salting
  splits each key into ``n_salts`` sub-keys for a parallel partial
  aggregate, then re-aggregates the (tiny) per-salt results — two
  shuffles, but the first is balanced and the second moves only
  |keys| x n_salts rows.

- **Bucketed join**: two big fact tables repeatedly joined on the same
  key should be bucketed on disk (``bucketBy``) so every join is
  co-located: no Exchange on either side, for every future query.
  This is THE amortized-shuffle strategy for a 100 TB warehouse.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_agg(
    df: DataFrame,
    key: str,
    n_salts: int = 16,
    count_alias: str = "n_rows",
) -> DataFrame:
    """Two-phase salted count per key, robust to heavy-hitter keys.

    Phase 1 groups on (key, salt) — the heavy key's rows spread over
    ``n_salts`` reducers; phase 2 sums the per-salt partials.  The salt
    is a deterministic hash of a uniqueness source (here: the row's
    partition+offset via ``monotonically_increasing_id``), so results
    are exact and reproducible.
    """
    salted = df.withColumn(
        "__salt", (F.monotonically_increasing_id() % n_salts).cast("int")
    )
    partial = salted.groupBy(key, "__salt").agg(
        F.count("*").alias("__partial")
    )
    return partial.groupBy(key).agg(F.sum("__partial").alias(count_alias))


def salted_topk(
    df: DataFrame,
    key: str,
    value_col: str = "value",
    k: int = 5,
    n_salts: int = 16,
) -> DataFrame:
    """Exact per-key top-k values, skew-proof.

    ``collect_list``-based aggregates are the groupBy shape that
    actually suffers under key skew: unlike count/sum, their PARTIAL
    state is the whole value list, so map-side combine doesn't shrink
    the shuffle and the heavy key's every row lands on one reducer
    that then sorts them single-threaded (measured: tools/
    skew_bench.py, SCALE.md §16).  Top-k is salvage-able because it is
    algebraic in disguise: top-k of a union = top-k of the per-part
    top-k's.  Phase 1 takes top-k per (key, salt) — bounded state,
    balanced reducers; phase 2 merges at most ``n_salts * k`` values
    per key.  Results are exact and salt-assignment-independent."""
    salted = df.withColumn(
        "__salt", (F.monotonically_increasing_id() % n_salts).cast("int")
    )
    partial = salted.groupBy(key, "__salt").agg(
        F.slice(
            F.sort_array(F.collect_list(value_col), asc=False), 1, k
        ).alias("__top")
    )
    merged = partial.groupBy(key).agg(
        F.flatten(F.collect_list("__top")).alias("__all")
    )
    return merged.select(
        key, F.slice(F.sort_array("__all", asc=False), 1, k).alias("topk")
    )


def sql_topk_per_key(
    table: str, key: str, value_col: str, k: int = 5
) -> str:
    """DuckDB twin of salted_topk, unpivoted to fixed columns (list
    cells choke the driver's canonicalizer): v1..vk, null-padded."""
    cols = ", ".join(
        f"round(vs[{i + 1}], 6) AS v{i + 1}" for i in range(k)
    )
    return f"""
WITH t AS (
  SELECT {key},
         list_sort(list({value_col}) FILTER (WHERE {value_col} IS NOT NULL),
                   'DESC') AS vs
  FROM {table} GROUP BY {key}
)
SELECT {key}, {cols} FROM t
"""


def bucketed_join_tables(
    spark,
    left: DataFrame,
    right: DataFrame,
    key: str,
    n_buckets: int = 8,
    prefix: str = "bkt",
):
    """Write both sides bucketed on the join key, read back, and join —
    the physical plan has NO Exchange on either side (asserted in
    tests/test_plans.py).  At scale this is done once at ingest; every
    subsequent join on the key is shuffle-free."""
    import shutil
    from urllib.parse import urlparse

    lt, rt = f"{prefix}_left", f"{prefix}_right"
    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    for name, df in ((lt, left), (rt, right)):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        # a crashed prior run can leave the managed location behind with
        # no catalog entry; clear it or saveAsTable refuses the name
        shutil.rmtree(f"{warehouse}/{name}", ignore_errors=True)
        (
            df.write.mode("overwrite")
            .bucketBy(n_buckets, key)
            .sortBy(key)
            .saveAsTable(name)
        )
    # merge hint: at test scale AQE would broadcast the small side and
    # never exercise the co-located path; at 100 TB (both sides far
    # beyond the broadcast threshold) sort-merge is what AQE picks, and
    # the buckets remove its Exchange on both sides
    return spark.table(lt).hint("merge").join(spark.table(rt), key)


def persist_partitioned(
    df: DataFrame, path: str, partition_col: str = "event_type"
) -> None:
    """Write partitioned-by-key parquet — the at-scale materialization
    of the reference's routing-table index (dispatcher.py:20: a dict
    keyed by subsystem avoids scanning every listener; a directory
    keyed by subsystem avoids scanning every byte).  A reader filtering
    on the partition column touches only that partition's files
    (PartitionFilters in the scan — asserted in tests/test_plans.py)."""
    df.write.mode("overwrite").partitionBy(partition_col).parquet(path)


def read_partition(spark, path: str, partition_col: str, value: str) -> DataFrame:
    """Read one partition; the filter prunes at planning time."""
    return spark.read.parquet(path).filter(F.col(partition_col) == value)


def compact_small_files(
    spark,
    src_path: str,
    dst_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Small-file compaction: rewrite a fragmented parquet dataset into
    ceil(total_bytes / target) files.  Returns the file count written.

    The small-files problem is a first-order 100 TB failure mode —
    streaming jobs and over-parallel writers leave millions of KB-scale
    files whose per-file open/footer cost dominates scans and whose
    listing crushes the driver.  Sizing is measured through the Hadoop
    FileSystem API (works on HDFS/S3/local alike, not just local
    os.stat), and the rewrite is ONE round-robin repartition to the
    computed width — no key shuffle, no skew sensitivity.
    """
    import math

    df = spark.read.parquet(src_path)
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    total = 0
    for f in df.inputFiles():
        p = jvm.org.apache.hadoop.fs.Path(f)
        total += p.getFileSystem(conf).getFileStatus(p).getLen()
    n_files = max(1, math.ceil(total / target_file_bytes))
    df.repartition(n_files).write.mode("overwrite").parquet(dst_path)
    return n_files


def key_skew_profile(df: DataFrame, key: str) -> DataFrame:
    """Join-key skew diagnostics: the profile you run BEFORE a 100 TB
    fact-fact join to decide between plain shuffle, salting, and AQE
    skew splitting.

    One groupBy to per-key counts, then one scalar aggregate over the
    (distinct-key-sized) count table:
    - ``max_count`` / ``skew_ratio`` — the straggler bound: the
      heaviest reducer gets max_count rows; ratio >> 1 means salt;
    - ``hhi_num`` — integer Herfindahl numerator (sum of squared
      counts, exact, order-free); hhi = hhi_num / n_rows² in [1/k, 1]
      measures concentration without any float accumulation.

    Output is one row; every value integer except the two final
    ratios (single IEEE divisions, engine-exact).
    """
    counts = df.groupBy(key).agg(F.count("*").alias("c"))
    return counts.agg(
        F.count("*").cast("bigint").alias("n_keys"),
        F.sum("c").cast("bigint").alias("n_rows"),
        F.max("c").cast("bigint").alias("max_count"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("hhi_num"),
    ).select(
        "n_keys",
        "n_rows",
        "max_count",
        "hhi_num",
        (
            F.col("max_count").cast("double")
            * F.col("n_keys").cast("double")
            / F.col("n_rows").cast("double")
        ).alias("skew_ratio"),
        (
            F.col("hhi_num").cast("double")
            / (F.col("n_rows").cast("double") * F.col("n_rows").cast("double"))
        ).alias("hhi"),
    )


def sql_key_skew_profile(table: str, key: str) -> str:
    """DuckDB twin of key_skew_profile."""
    return f"""
WITH counts AS (SELECT {key}, count(*) AS c FROM {table} GROUP BY {key})
SELECT CAST(count(*) AS BIGINT) AS n_keys,
       CAST(sum(c) AS BIGINT) AS n_rows,
       CAST(max(c) AS BIGINT) AS max_count,
       CAST(sum(c * c) AS BIGINT) AS hhi_num,
       CAST(max(c) AS DOUBLE) * CAST(count(*) AS DOUBLE)
         / CAST(sum(c) AS DOUBLE) AS skew_ratio,
       CAST(sum(c * c) AS DOUBLE)
         / (CAST(sum(c) AS DOUBLE) * CAST(sum(c) AS DOUBLE)) AS hhi
FROM counts
"""
