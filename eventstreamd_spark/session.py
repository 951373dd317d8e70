"""SparkSession factory + testdata loaders.

Local mode is a correctness harness only; every config below is chosen to
also make sense on a large cluster (AQE on, sane shuffle parallelism,
UTC timestamps for engine-portable semantics, Arrow for the few
pandas-exchange paths).
"""

from __future__ import annotations

import os
import sys


def _ensure_protobuf_shim() -> None:
    """Make ``google.protobuf`` importable when no real protobuf wheel
    exists: Spark 4's transformWithStateInPandas state-server client
    needs it at runtime.  The vendored pure-stdlib shim (_vendor/
    README.md) is appended via sys.path for this process and via
    PYTHONPATH so the JVM-forked Python workers — which inherit this
    process's environment — resolve it too.  A real installation
    always wins: the shim path is only added when the import fails."""
    try:
        import google.protobuf  # noqa: F401

        return
    except ImportError:
        pass
    vendor = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_vendor")
    if vendor not in sys.path:
        sys.path.insert(0, vendor)
    existing = os.environ.get("PYTHONPATH", "")
    if vendor not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            f"{vendor}{os.pathsep}{existing}" if existing else vendor
        )


_ensure_protobuf_shim()

from pyspark.sql import DataFrame, SparkSession, functions as F  # noqa: E402

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# The driver's parquet writer emits INT64 TIMESTAMP(NANOS), which Spark's
# parquet reader refuses outright (PARQUET_TYPE_ILLEGAL) — nanosecond
# timestamps only round-trip via the legacy nanos-as-long escape hatch.
# We read those columns as epoch-nanos longs and rebuild TimestampType at
# microsecond precision (truncation, same as DuckDB's nanos->us read).
_TIMESTAMP_COLS: dict[str, list[str]] = {
    "events": ["ts"],
    "orders": ["o_orderdate"],
    "lineitem": ["l_shipdate"],
}


def get_spark(
    app_name: str = "eventstreamd-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for this engine.

    On a real cluster the ``master`` and memory settings come from
    spark-submit; everything set here is cluster-appropriate:

    - AQE enabled: runtime coalescing of shuffle partitions, skew-join
      splitting, and dynamic join-strategy switching — the knobs that keep
      plans healthy when the optimizer's size estimates are off by 100x.
    - shuffle.partitions sized to cores locally; at 100 TB this should be
      (executors * cores * 2..3) or simply left to AQE's coalescing with a
      high initial value.
    - session timezone pinned to UTC so timestamp semantics are portable
      (and match the DuckDB correctness oracle).
    """
    cpus = cpus or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle = shuffle_partitions or cpus
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # Start every shuffle WIDE and let AQE coalesce down (the
        # docstring's 100 TB guidance, now applied locally too): with a
        # hard 32-partition ceiling the sf10 probe's inverted-index
        # join ground through oversized sort/agg partitions —
        # dedup_ngram_jaccard measured 71.1 s at sf10 under 32
        # partitions vs 58.1 s under a 256 initial width (fresh-JVM
        # controls, SCALE.md §17), pulling its measured decade
        # exponent from 1.14 back to 1.05 ~ the claimed ~N.  Small
        # queries are unaffected: AQE coalesces them back to a handful
        # of partitions at runtime.
        # SPARK_GRAFT_INITIAL_SHUFFLE_MULT exists for A/B adjudication
        # of the wide-start tax on tiny shuffles (SCALE.md §17): 1
        # reverts to the pinned-width behavior, 8 is the ship default.
        .config(
            "spark.sql.adaptive.coalescePartitions.initialPartitionNum",
            str(
                int(os.environ.get("SPARK_GRAFT_INITIAL_SHUFFLE_MULT", "8"))
                * shuffle
            ),
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # keep catalog state out of the repo: managed tables (bucketing)
        # and the derby metastore live under /tmp locally; on a cluster
        # these come from the real warehouse/metastore config
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get(
                "SPARK_GRAFT_WAREHOUSE", "/tmp/eventstreamd_spark_warehouse"
            ),
        )
        .config(
            "spark.driver.extraJavaOptions",
            "-Dderby.system.home=/tmp/eventstreamd_spark_derby",
        )
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one of the driver-generated parquet tables.

    Parquet scan => columnar, predicate pushdown and column pruning reach
    the reader for free when callers stay declarative.
    """
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLES}")
    # Self-contained under a foreign SparkSession (driver harness, notebook):
    # the fixture parquet stores INT64 TIMESTAMP(NANOS), which Spark's reader
    # rejects unless the legacy nanos-as-long escape hatch is on.  The conf is
    # runtime-settable, so set it here rather than relying on get_spark()
    # having built the session.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # Pin UTC for the same reason: timestamp semantics (ntz->ltz casts,
    # date_trunc, window()) must match the DuckDB oracle regardless of the
    # host session's timezone.  Both confs are runtime-settable.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    dtypes = dict(df.dtypes)
    for c in _TIMESTAMP_COLS.get(name, []):
        # Only rebuild when the file actually stored TIMESTAMP(NANOS) and
        # the legacy conf surfaced it as a long (physical type varies per
        # table/scale-factor in the driver data).  `div` stays in 64-bit
        # integer arithmetic (a double division would lose precision above
        # 2^53 ns). Cheap narrow projection — no shuffle, stays in codegen.
        if dtypes.get(c) == "bigint":
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
        elif dtypes.get(c) == "timestamp_ntz":
            # Some scale factors store plain micros, which surface as
            # TIMESTAMP_NTZ; normalize to TimestampType so downstream
            # operators (unix_micros, window()) see one type everywhere.
            # Session tz is UTC, so the instant is unchanged.
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def fan_out(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition a narrow input up to cluster parallelism before a
    CPU-heavy per-row stage (shingling, hashing, Arrow-batched kernels).

    Small parquet files arrive as 1-2 splits, which serializes an
    expensive projection on one core no matter how wide the cluster is —
    Spark sizes scan partitions by bytes, not by downstream cost.  The
    shuffle moves only the (small) input rows, so it pays for itself as
    soon as the per-row work dominates.  Guarded: when the input already
    has enough partitions (the 100 TB case — thousands of file splits),
    this is a no-op, adding no shuffle at scale.
    """
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    try:
        current = df.rdd.getNumPartitions()
    except Exception:  # streaming plans can't expose an RDD; leave as-is
        return df
    return df.repartition(target) if current < target else df


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register every fixture table as a temp view, opening the full
    Spark SQL surface (joins, subqueries, CTEs, window functions,
    grouping sets — everything Catalyst parses) over the same data the
    DataFrame operators use.

    This is the engine's ad-hoc front door: the reference's only query
    front-end is the filter mini-language (http_server.py:145-153);
    here any ANSI SQL string becomes a distributed plan.  Temp views
    are lazy — registering all ten costs nothing until queried.
    """
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


def sql(spark: SparkSession, query: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    """One-call SQL entry point: ensure views exist, run the query."""
    register_views(spark, sf_dir)
    return spark.sql(query)
