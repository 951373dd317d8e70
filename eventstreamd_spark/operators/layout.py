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


# ---------------------------------------------------------------------------
# Token-budget shard packing — distributed prefix sum
# ---------------------------------------------------------------------------

SHARD_TOKENS = 4096
BUCKET_WIDTH = 64


def weighted_shard_assignments(
    df: DataFrame,
    key: str,
    weight: str,
    budget: int,
    bucket_width: int = BUCKET_WIDTH,
) -> DataFrame:
    """Pack rows (in ``key`` order) into contiguous shards of ~``budget``
    total ``weight``: shard_id = exclusive-prefix-sum(weight) div budget
    — the writer-sharding step of a training pipeline, generic over the
    weight (tokens, bytes, samples).

    The naive plan is ``sum() OVER (ORDER BY key)`` — an UNPARTITIONED
    window that drags the whole corpus through one task.  This is the
    scalable two-phase prefix sum instead:

      1. within-bucket cumsum, window partitioned by
         bucket = key div bucket_width  (fully parallel),
      2. per-bucket totals (tiny aggregate) -> exclusive bucket offsets
         via a window over ONLY the bucket rows (corpus/bucket_width
         rows — the single-partition window runs over KB, not TB),
      3. broadcast-join offsets back, add.

    Same trick scales any order-dependent computation (row numbering,
    cumulative anything) past the single-task window limit.  All
    arithmetic is BIGINT; the floor division is exact.  Returns the
    input key + weight plus ``shard_id`` and ``shard_start`` (the
    exclusive prefix sum).
    """
    from pyspark.sql import Window

    based = df.select(
        key,
        F.col(weight).cast("long").alias(weight),
        (F.col(key) - F.col(key) % bucket_width).alias("bucket"),
    )
    within = Window.partitionBy("bucket").orderBy(key)
    cum_in_bucket = based.withColumn(
        "bucket_cum", F.sum(weight).over(within)
    )
    bucket_w = (
        Window.orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        based.groupBy("bucket")
        .agg(F.sum(weight).alias("bucket_total"))
        .withColumn(
            "bucket_offset", F.coalesce(F.sum("bucket_total").over(bucket_w), F.lit(0))
        )
        .select("bucket", "bucket_offset")
    )
    cum = F.col("bucket_offset") + F.col("bucket_cum")
    excl = cum - F.col(weight)
    # `div` is Spark's integral division (long div long -> long), so the
    # shard id stays exact past 2^53 total weight where float64 floor
    # division would silently round.
    return (
        cum_in_bucket.join(F.broadcast(offsets), "bucket")
        .withColumn("_excl", excl)
        .select(
            key,
            weight,
            F.expr(f"_excl div {int(budget)}").alias("shard_id"),
            F.col("_excl").alias("shard_start"),
        )
    )


def token_shard_assignments(
    docs: DataFrame,
    shard_tokens: int = SHARD_TOKENS,
    bucket_width: int = BUCKET_WIDTH,
) -> DataFrame:
    """Token-budget shard packing (see weighted_shard_assignments for
    the two-phase prefix-sum plan)."""
    from eventstreamd_spark.functions.text import tokens

    toked = docs.select(
        "doc_id", F.size(tokens(F.col("text"))).cast("long").alias("n_tokens")
    )
    return weighted_shard_assignments(
        toked, "doc_id", "n_tokens", shard_tokens, bucket_width
    ).withColumnRenamed("shard_start", "shard_start_token")


SHARD_BYTES = 16_384


def media_shard_assignments(
    media: DataFrame,
    shard_bytes: int = SHARD_BYTES,
    bucket_width: int = BUCKET_WIDTH,
) -> DataFrame:
    """Byte-budget shard packing for binary media blobs — the same
    two-phase prefix sum over ``byte_len`` (a media table's tar-shard
    writer, WebDataset-style)."""
    sized = media.select("doc_id", F.col("byte_len").cast("long").alias("n_bytes"))
    return weighted_shard_assignments(
        sized, "doc_id", "n_bytes", shard_bytes, bucket_width
    ).withColumnRenamed("shard_start", "shard_start_byte")


def sql_token_shard_assignments(
    table: str = "documents", shard_tokens: int = SHARD_TOKENS
) -> str:
    from eventstreamd_spark.functions.text import sql_tokens

    toks = sql_tokens("text")
    return (
        "WITH t AS ("
        f"  SELECT doc_id, CAST(len({toks}) AS BIGINT) AS n_tokens FROM {table}"
        "), c AS ("
        "  SELECT doc_id, n_tokens, "
        "    sum(n_tokens) OVER (ORDER BY doc_id) - n_tokens AS excl "
        "  FROM t) "
        "SELECT doc_id, n_tokens, "
        f"CAST(excl // {shard_tokens} AS BIGINT) AS shard_id, "
        "CAST(excl AS BIGINT) AS shard_start_token "
        "FROM c"
    )


def sql_media_shard_assignments(
    table: str = "documents", shard_bytes: int = SHARD_BYTES
) -> str:
    return (
        "WITH t AS ("
        f"  SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes FROM {table}"
        "), c AS ("
        "  SELECT doc_id, n_bytes, "
        "    sum(n_bytes) OVER (ORDER BY doc_id) - n_bytes AS excl "
        "  FROM t) "
        "SELECT doc_id, n_bytes, "
        f"CAST(excl // {shard_bytes} AS BIGINT) AS shard_id, "
        "CAST(excl AS BIGINT) AS shard_start_byte "
        "FROM c"
    )


N_LENGTH_BUCKETS = 8


def length_bucket_assignments(
    docs: DataFrame, n_buckets: int = N_LENGTH_BUCKETS
) -> DataFrame:
    """Length-grouped batching: assign every document to a token-length
    bucket so a training loader can batch similar lengths together
    (padding waste on mixed-length batches is pure lost FLOPs).

    The naive form is ``ntile(n) OVER (ORDER BY n_tokens)`` — an
    unpartitioned global window (single task, the same trap the shard
    packer avoids).  Scalable form: exact quantile boundaries from one
    tiny aggregation (n_buckets-1 doubles), broadcast them, and assign
    by comparison in a narrow pass — bucket_id = #(boundaries <
    n_tokens).  Unlike ntile, equal lengths always land in the same
    bucket (boundary ties don't split), which is what a batcher wants
    anyway.  percentile() interpolation halves integers — exact in
    binary, so the DuckDB twin (quantile_cont) matches bit-for-bit.
    """
    from eventstreamd_spark.functions.text import tokens

    sized = docs.select(
        "doc_id", F.size(tokens(F.col("text"))).cast("long").alias("n_tokens")
    )
    fracs = [i / n_buckets for i in range(1, n_buckets)]
    bounds = sized.agg(
        F.expr(
            "percentile(n_tokens, array("
            + ", ".join(f"{f!r}" for f in fracs)
            + "))"
        ).alias("bounds")
    )
    assigned = sized.join(F.broadcast(bounds))
    n_below = F.size(
        F.filter("bounds", lambda b: b < F.col("n_tokens").cast("double"))
    )
    return assigned.select(
        "doc_id", "n_tokens", n_below.cast("int").alias("length_bucket")
    )


def sql_length_bucket_assignments(
    table: str = "documents", n_buckets: int = N_LENGTH_BUCKETS
) -> str:
    from eventstreamd_spark.functions.text import sql_tokens

    toks = sql_tokens("text")
    fracs = ", ".join(repr(i / n_buckets) for i in range(1, n_buckets))
    return (
        "WITH sized AS ("
        f"  SELECT doc_id, CAST(len({toks}) AS BIGINT) AS n_tokens FROM {table}"
        "), b AS ("
        f"  SELECT quantile_cont(n_tokens, [{fracs}]) AS bounds FROM sized) "
        "SELECT doc_id, n_tokens, "
        "  CAST(len(list_filter(bounds, x -> x < CAST(n_tokens AS DOUBLE))) AS INT) "
        "    AS length_bucket "
        "FROM sized, b"
    )


# ---------------------------------------------------------------------------
# Training-export writer: seeded order, bounded files, manifest
# ---------------------------------------------------------------------------


def write_training_export(
    docs: DataFrame,
    path: str,
    seed: str = "epoch0",
    max_records_per_file: int = 200,
    fmt: str = "parquet",
) -> DataFrame:
    """Materialize a training-ready export: rows laid out in the
    seed-stable shuffle order (sampling.seeded_shuffle_keys' hash key —
    replayable, partitioning-independent), files bounded by
    ``max_records_per_file``, and a MANIFEST returned as a DataFrame
    (file -> row/token counts) — the index a data loader needs to plan
    epochs without listing/reading the corpus.

    Plan: repartitionByRange on the shuffle key (one range exchange —
    sampled split points keep file sizes balanced regardless of key
    skew) + sortWithinPartitions, so the global order is the key order
    without any single-task sort; ``maxRecordsPerFile`` then splits
    within each task.  The manifest is a one-aggregate read of the
    written files via input_file_name() — row-group footer metadata at
    100 TB, not a data scan, if swapped for the catalog's file stats.
    """
    from eventstreamd_spark.functions.text import poly_hash
    from eventstreamd_spark.sources.files import FORMATS, read_table

    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {FORMATS}")
    keyed = docs.withColumn(
        "shuffle_key",
        poly_hash(
            F.concat(F.col("doc_id").cast("string"), F.lit(":" + seed))
        ),
    )
    writer = (
        keyed.repartitionByRange(8, "shuffle_key")
        .sortWithinPartitions("shuffle_key")
        .write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
    )
    if fmt == "csv":
        writer = writer.option("header", "true")  # sources.files contract
    writer.format(fmt).save(path)
    spark = docs.sparkSession
    # manifest read-back: csv/json are schema-less on disk, so the
    # writer's own schema is re-applied (sources.files contract)
    written = read_table(spark, path, fmt, schema=keyed.schema)
    return (
        written.groupBy(F.input_file_name().alias("file"))
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.sum(F.size(F.split(F.col("text"), r"\s+")))
            .cast("bigint")
            .alias("n_tokens_ws"),
            F.min("shuffle_key").alias("key_lo"),
            F.max("shuffle_key").alias("key_hi"),
        )
        .orderBy("key_lo")
    )


MM_BYTES_PER_TOKEN = 64  # media cost model: 1 packing token per 64 bytes


def multimodal_shard_assignments(
    docs: DataFrame,
    shard_tokens: int = SHARD_TOKENS,
    bucket_width: int = BUCKET_WIDTH,
) -> DataFrame:
    """Modality-aware shard packing: each document's packing weight is
    its text token count PLUS a media-token equivalent (ceil(bytes /
    {MM}) — the fixed per-patch/per-frame token cost a multimodal
    model pays for attached media).  One composite BIGINT weight feeds
    the same generic two-phase prefix sum as the token/byte packers,
    so a mixed text+image corpus packs into sequence-budget shards
    with a single plan.

    The media table is the documents_as_media adapter (text bytes
    stand in for blobs; the arithmetic is the real thing).
    """
    from eventstreamd_spark.functions.text import tokens
    from eventstreamd_spark.operators.multimodal import documents_as_media

    media = documents_as_media(docs).select("doc_id", "byte_len")
    weighted = (
        docs.join(media, "doc_id")
        .select(
            "doc_id",
            (
                F.size(tokens(F.col("text"))).cast("long")
                + F.ceil(
                    F.col("byte_len").cast("long")
                    / F.lit(float(MM_BYTES_PER_TOKEN))
                ).cast("long")
            ).alias("n_pack_tokens"),
        )
    )
    return weighted_shard_assignments(
        weighted, "doc_id", "n_pack_tokens", shard_tokens, bucket_width
    ).withColumnRenamed("shard_start", "shard_start_token")


def sql_multimodal_shard_assignments(
    table: str = "documents", shard_tokens: int = SHARD_TOKENS
) -> str:
    from eventstreamd_spark.functions.text import sql_tokens

    toks = sql_tokens("text")
    w = (
        f"CAST(len({toks}) AS BIGINT) + "
        f"CAST(ceil(CAST(octet_length(encode(text)) AS BIGINT) "
        f"/ CAST({MM_BYTES_PER_TOKEN} AS DOUBLE)) AS BIGINT)"
    )
    return (
        "WITH t AS ("
        f"  SELECT doc_id, {w} AS n_pack_tokens FROM {table}"
        "), c AS ("
        "  SELECT doc_id, n_pack_tokens, "
        "    sum(n_pack_tokens) OVER (ORDER BY doc_id) - n_pack_tokens AS excl "
        "  FROM t) "
        "SELECT doc_id, n_pack_tokens, "
        f"CAST(excl // {shard_tokens} AS BIGINT) AS shard_id, "
        "CAST(excl AS BIGINT) AS shard_start_token "
        "FROM c"
    )


# ---------------------------------------------------------------------------
# Zone-map skipping report — the measurable payoff of Z-ordering
# ---------------------------------------------------------------------------

ZR_BITS = 10          # per-dimension key bits for the report
ZR_BUCKET_SHIFT = 14  # 20-bit z -> top 6 bits = 64 "files"
ZR_LO, ZR_HI = 256, 383  # probe slab in normalized space (1/8 of domain)


def _zr_interleave_terms(xe: str, ye: str) -> str:
    """SQL text of the 10-bit Morton interleave (engine-portable)."""
    terms = []
    for i in range(ZR_BITS):
        terms.append(f"((({xe} >> {i}) & 1) << {2 * i + 1})")
        terms.append(f"((({ye} >> {i}) & 1) << {2 * i})")
    return " + ".join(terms)  # disjoint bits: + == OR


def zorder_skipping_report(lineitem: DataFrame) -> DataFrame:
    """Quantified data skipping: zone maps (per-file min/max, exactly
    what parquet row-group stats give a reader) for a Z-ordered layout
    vs a single-key-sorted layout, probed with one slab predicate per
    dimension.

    The whole computation is the planning step a lakehouse table format
    (Delta/Iceberg file stats) performs before a scan: which files can
    a predicate skip?  Buckets stand in for files: the Z layout buckets
    on the top bits of the 20-bit Morton code (every bucket owns a
    small rectangle of (x, y) space), the comparison layout on the top
    bits of x alone (perfect for x predicates, useless for y).  For
    each (layout, predicate) the report counts scannable buckets and
    the rows they hold — all-integer except the final scan_fraction
    division, so the oracle is exact.

    One scan of the fact table per layout (two total), zone maps are
    <= 64 rows each; everything downstream is driver-scale.  At 100 TB
    the same plan reads footer stats instead of data.
    """
    spark = lineitem.sparkSession
    raw = lineitem.select(
        F.col("l_partkey").cast("long").alias("rx"),
        F.col("l_suppkey").cast("long").alias("ry"),
    )
    # Integer min/max normalization into [0, 2^BITS): low-cardinality
    # keys must still fill the bit domain or their Morton bits carry no
    # information.  At scale the bounds come from table stats, not a
    # scan; here a tiny agg + broadcast stands in.  Exact integer
    # arithmetic on both engines (non-negative operands, floor div).
    bounds = raw.agg(
        F.min("rx").alias("mnx"), F.max("rx").alias("mxx"),
        F.min("ry").alias("mny"), F.max("ry").alias("mxy"),
    )
    dom = 1 << ZR_BITS
    # three legs (two zone maps + the match counts) consume `keyed`;
    # Catalyst does not share the subtree, so without materialization
    # the fact scan and the bounds aggregate would run three times
    # (same idiom as kmv_join_size's presence table)
    keyed = raw.crossJoin(F.broadcast(bounds)).select(
        F.expr(f"((rx - mnx) * {dom}) div (mxx - mnx + 1)").alias("x"),
        F.expr(f"((ry - mny) * {dom}) div (mxy - mny + 1)").alias("y"),
    ).localCheckpoint()
    z = F.expr(_zr_interleave_terms("x", "y"))

    def zone_map(df: DataFrame, bucket: F.Column, layout: str) -> DataFrame:
        return df.groupBy(bucket.alias("bucket")).agg(
            F.count("*").cast("bigint").alias("n"),
            F.min("x").alias("min_x"),
            F.max("x").alias("max_x"),
            F.min("y").alias("min_y"),
            F.max("y").alias("max_y"),
        ).withColumn("layout", F.lit(layout))

    zm = zone_map(
        keyed.withColumn("z", z), F.expr(f"z >> {ZR_BUCKET_SHIFT}"), "zorder"
    ).unionByName(
        zone_map(keyed, F.expr(f"x >> {ZR_BITS - 6}"), "xsort")
    )

    preds = spark.sql(
        f"SELECT 'x' AS dim, {ZR_LO} AS lo, {ZR_HI} AS hi "
        f"UNION ALL SELECT 'y', {ZR_LO}, {ZR_HI}"
    )
    lo_b = F.when(F.col("dim") == "x", F.col("min_x")).otherwise(F.col("min_y"))
    hi_b = F.when(F.col("dim") == "x", F.col("max_x")).otherwise(F.col("max_y"))
    overlap = (hi_b >= F.col("lo")) & (lo_b <= F.col("hi"))
    summary = (
        zm.crossJoin(F.broadcast(preds))
        .groupBy("layout", "dim")
        .agg(
            F.count("*").cast("bigint").alias("n_buckets"),
            F.sum(overlap.cast("int")).cast("bigint").alias("n_scanned"),
            F.sum(F.when(overlap, F.col("n")).otherwise(F.lit(0)))
            .cast("bigint")
            .alias("rows_scanned"),
        )
    )
    matches = (
        keyed.crossJoin(F.broadcast(preds))
        .filter(
            F.when(F.col("dim") == "x", F.col("x")).otherwise(F.col("y")).between(
                F.col("lo"), F.col("hi")
            )
        )
        .groupBy("dim")
        .agg(F.count("*").cast("bigint").alias("rows_matching"))
    )
    return summary.join(F.broadcast(matches), "dim").select(
        "layout",
        "dim",
        "n_buckets",
        "n_scanned",
        "rows_scanned",
        "rows_matching",
        (F.col("n_scanned").cast("double") / F.col("n_buckets").cast("double")).alias(
            "scan_fraction"
        ),
    )


def sql_zorder_skipping_report(table: str = "lineitem") -> str:
    zi = _zr_interleave_terms("x", "y")
    return f"""
WITH raw AS (
  SELECT CAST(l_partkey AS BIGINT) AS rx, CAST(l_suppkey AS BIGINT) AS ry
  FROM {table}
),
bounds AS (
  SELECT min(rx) AS mnx, max(rx) AS mxx, min(ry) AS mny, max(ry) AS mxy
  FROM raw
),
keyed AS (
  SELECT ((rx - mnx) * {1 << ZR_BITS}) // (mxx - mnx + 1) AS x,
         ((ry - mny) * {1 << ZR_BITS}) // (mxy - mny + 1) AS y
  FROM raw CROSS JOIN bounds
),
zm AS (
  SELECT 'zorder' AS layout, (({zi}) >> {ZR_BUCKET_SHIFT}) AS bucket,
         CAST(count(*) AS BIGINT) AS n,
         min(x) AS min_x, max(x) AS max_x, min(y) AS min_y, max(y) AS max_y
  FROM keyed GROUP BY bucket
  UNION ALL
  SELECT 'xsort', (x >> {ZR_BITS - 6}),
         CAST(count(*) AS BIGINT), min(x), max(x), min(y), max(y)
  FROM keyed GROUP BY (x >> {ZR_BITS - 6})
),
preds AS (
  SELECT 'x' AS dim, {ZR_LO} AS lo, {ZR_HI} AS hi
  UNION ALL SELECT 'y', {ZR_LO}, {ZR_HI}
),
summary AS (
  SELECT layout, dim,
         CAST(count(*) AS BIGINT) AS n_buckets,
         CAST(sum(CASE WHEN (CASE WHEN dim = 'x' THEN max_x ELSE max_y END) >= lo
                        AND (CASE WHEN dim = 'x' THEN min_x ELSE min_y END) <= hi
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_scanned,
         CAST(sum(CASE WHEN (CASE WHEN dim = 'x' THEN max_x ELSE max_y END) >= lo
                        AND (CASE WHEN dim = 'x' THEN min_x ELSE min_y END) <= hi
                  THEN n ELSE 0 END) AS BIGINT) AS rows_scanned
  FROM zm CROSS JOIN preds
  GROUP BY layout, dim
),
matches AS (
  SELECT dim, CAST(count(*) AS BIGINT) AS rows_matching
  FROM keyed CROSS JOIN preds
  WHERE (CASE WHEN dim = 'x' THEN x ELSE y END) BETWEEN lo AND hi
  GROUP BY dim
)
SELECT s.layout, s.dim, s.n_buckets, s.n_scanned, s.rows_scanned,
       m.rows_matching,
       (CAST(s.n_scanned AS DOUBLE) / CAST(s.n_buckets AS DOUBLE))
         AS scan_fraction
FROM summary s JOIN matches m USING (dim)
"""


# ---------------------------------------------------------------------------
# Curriculum ordering (difficulty-staged training export)
# ---------------------------------------------------------------------------


def curriculum_order(docs: DataFrame, seed: str = "epoch0") -> DataFrame:
    """Curriculum sort keys: order the corpus easy -> hard (difficulty
    deciles of ``n_chars``, the stand-in complexity score — swap in a
    model-scored column without touching the plan) with a SEED-STABLE
    shuffle inside each stage, as one integer key per doc:

        curriculum_key = difficulty_decile * 2e9 + poly_hash(doc_id:seed)

    Training runs that pace data simple-to-complex consume the corpus
    in ``curriculum_key`` order; a new seed reshuffles within stages
    without moving any doc across stages.

    Scale: the decile comes from the value-frequency CDF idiom
    (percentile_rank_features) — one narrow aggregate, a cumulative
    window over the KB-sized value table, one broadcast join back;
    positions are never materialized (no global sort, no row_number
    over the corpus): writers lay out the order via
    ``repartitionByRange(curriculum_key)`` exactly like
    write_training_export does with its flat shuffle key.  Integer
    discipline: strict-below prefix sums, nonneg integer div (== in
    both engines), decile * 2_000_000_000 + hash < 2^35 — no overflow.
    """
    from eventstreamd_spark.functions.text import poly_hash
    from pyspark.sql import Window as W

    freq = docs.groupBy(F.col("n_chars").alias("v")).agg(
        F.count("*").cast("bigint").alias("c")
    )
    wcum = W.orderBy("v").rowsBetween(W.unboundedPreceding, -1)
    cdf = freq.withColumn(
        "below", F.coalesce(F.sum("c").over(wcum), F.lit(0)).cast("bigint")
    )
    tot = docs.agg(F.count("*").cast("bigint").alias("n"))
    h = poly_hash(
        F.concat(F.col("doc_id").cast("string"), F.lit(":" + seed))
    )
    return (
        docs.select("doc_id", "n_chars")
        .join(F.broadcast(cdf), F.col("n_chars") == F.col("v"))
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            F.expr("least(10, (below * 10) div n + 1)")
            .cast("bigint")
            .alias("difficulty_decile"),
            (
                F.expr("least(10, (below * 10) div n + 1)")
                * F.lit(2_000_000_000).cast("bigint")
                + h
            ).cast("bigint").alias("curriculum_key"),
        )
    )


def sql_curriculum_order(table: str = "documents", seed: str = "epoch0") -> str:
    """DuckDB twin of curriculum_order (same CDF, div, and hash)."""
    from eventstreamd_spark.functions.text import sql_poly_hash

    quoted = (":" + seed).replace("'", "''")
    h = sql_poly_hash(f"(CAST(doc_id AS VARCHAR) || '{quoted}')")
    return f"""
WITH freq AS (
  SELECT n_chars AS v, CAST(count(*) AS BIGINT) AS c
  FROM {table} GROUP BY n_chars
),
cdf AS (
  SELECT v,
         CAST(coalesce(sum(c) OVER (ORDER BY v
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS below
  FROM freq
),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM {table})
SELECT d.doc_id,
       CAST(least(10, (c.below * 10) // t.n + 1) AS BIGINT)
         AS difficulty_decile,
       CAST(least(10, (c.below * 10) // t.n + 1) * 2000000000 + {h}
            AS BIGINT) AS curriculum_key
FROM {table} d
JOIN cdf c ON c.v = d.n_chars
CROSS JOIN tot t
"""
