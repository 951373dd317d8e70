"""Distributed linear algebra over embedding columns — the exact
integer-quantization tier.

Three operators a training-data pipeline needs once embeddings are a
first-class column: the d x d covariance of the corpus (whitening,
drift monitoring, PCA input), a Johnson-Lindenstrauss random
projection (cheap dimensionality reduction / LSH preprocessing), and
the top principal component by power iteration with a distributed
projection (corpus "direction of maximum variance" scoring, the
building block of PCA-based outlier and near-dup detection).

All three share one determinism discipline: embedding floats are
quantized once to scaled integers (``round(v * 1e6)`` — round is
half-away-from-zero in both Spark and DuckDB, so codes agree
bit-for-bit), and every aggregate after that is integer/decimal exact,
hence associative and order-independent — Spark's parallel partial
aggregation and DuckDB's sequential scan produce the *same integers*,
and the final integer -> double conversions are correctly rounded on
both sides (Spark decimal->double; DuckDB via the VARCHAR round-trip,
see statistics.py).  The power iteration additionally renormalizes
with non-negative integer floor division only, which Python, Spark and
DuckDB all agree on.

Scale notes (100 TB): covariance/Gram is inherently O(N d^2)
multiply-adds; here the per-row pair generation collapses through
map-side partial aggregation to d^2/2 rows per task BEFORE the (tiny,
d^2-key) shuffle — the wide intermediate never hits the wire.  The
power iteration is a k x d driver control plane (d^2 + d numbers
collected, same idiom as clustering.py); the projection pass is one
narrow codegen'd scan with a TakeOrdered top-k (no global sort).

Reference parity: srittau/eventstreamd has no analytics surface
(SURVEY.md §0) — this module is layer-B scope mandated by the north
star (similarity/dedup pipelines over embedding columns).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

DEC = "decimal(38,0)"
_Q = 1_000_000.0  # 1e6 quantization scale: float mantissas fit exactly


def _qvec(col: Column) -> Column:
    """array<float> -> array<long>, scaled-integer quantization."""
    return F.transform(
        col, lambda x: F.round(x.cast("double") * F.lit(_Q), 0).cast("long")
    )


_SQL_QVEC = (
    "list_transform({col}, x -> "
    "CAST(round(CAST(x AS DOUBLE) * 1000000.0, 0) AS BIGINT))"
)


def _sql_d2d(expr: str) -> str:
    # DuckDB's direct DECIMAL/HUGEINT -> DOUBLE cast can be 1 ULP off
    # correctly-rounded above 2^53; the VARCHAR round-trip is exact
    # (statistics.py idiom).
    return f"CAST(CAST({expr} AS VARCHAR) AS DOUBLE)"


# --- covariance -------------------------------------------------------------


def _gram_partials(q: DataFrame, dim: int) -> DataFrame:
    """Per-Arrow-batch exact integer Gram partials: (i, j, sp) for the
    upper triangle, j >= i, plus marginal rows (i, -1, s_i) and one
    count row (-1, -1, n_rows) per batch.

    The quantization happened JVM-side (``_qvec``, the canonical
    F.round) — this kernel sees only int64 codes, so Python introduces
    no float rounding at all: numpy does a pure-int64 ``Q^T @ Q``
    (C-speed, exact; per-entry bound rows_per_chunk * max_q^2 < 2^63
    requires |q| <= ~2.3e7, i.e. |v| <= ~23 at the 1e6 scale and 16k
    chunk size — the kernel RAISES past that rather than let int64
    wrap silently), and the d^2-row partials are summed exactly in
    DECIMAL downstream.  This
    replaces a per-row nested-HOF pair expansion that evaluated
    interpreted at ~3 ms/row — the Arrow kernel is the BLAS-shaped
    O(N d^2) inner loop, the tiny (d^2 x n_batches) shuffle is
    unchanged."""
    import pandas as pd  # noqa: PLC0415 — executor-side import

    iu_i, iu_j = [], []
    for i in range(dim):
        for j in range(i, dim):
            iu_i.append(i)
            iu_j.append(j)

    def kernel(batches):
        import numpy as np  # noqa: PLC0415

        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.stack(pdf["q"].to_numpy()).astype(np.int64)
            if mat.size and int(np.abs(mat).max()) > 23_000_000:
                raise ValueError(
                    "gram kernel overflow guard: |q| > 2.3e7 — lower "
                    "the quantization scale (linalg._Q) for this data"
                )
            for lo in range(0, mat.shape[0], 16384):
                chunk = mat[lo : lo + 16384]
                g = chunk.T @ chunk
                yield pd.DataFrame(
                    {
                        "i": iu_i + list(range(dim)) + [-1],
                        "j": iu_j + [-1] * dim + [-1],
                        "sp": [int(g[a, b]) for a, b in zip(iu_i, iu_j)]
                        + [int(x) for x in chunk.sum(axis=0)]
                        + [chunk.shape[0]],
                    }
                )

    return q.mapInPandas(kernel, schema="i int, j int, sp long")


def _exact_gram_agg(q: DataFrame, dim: int) -> DataFrame:
    """Exact DECIMAL reduction of the per-batch Gram partials — the
    single determinism-critical aggregate shared by the covariance
    query and the PCA control plane."""
    return (
        _gram_partials(q, dim)
        .groupBy("i", "j")
        .agg(F.sum(F.col("sp").cast(DEC)).alias("sp"))
    )


def embedding_covariance(embeddings: DataFrame, dim: int = 64) -> DataFrame:
    """Exact corpus covariance: cov(i, j) for the upper triangle
    (d*(d+1)/2 rows), computed as (n*S_ij - S_i*S_j) / (n^2 * 1e12)
    from scaled-integer sums — the raw-moments form needs one pass and
    no mean-broadcast, and every sum is exact, so both engines emit
    identical doubles.

    Plan: one scan -> Arrow int64-Gram kernel (_gram_partials, the
    BLAS-shaped inner loop) -> exact DECIMAL hash aggregate over the
    tiny d^2-keyed partials -> broadcast joins of the d-row marginals
    and the 1-row count.  Single tiny shuffle; scales linearly in N.
    """
    q = embeddings.select(_qvec(F.col("embedding")).alias("q"))
    # one kernel pass; the (d^2/2 + d + 1)-row exact aggregate is
    # checkpointed so the three consumers below don't re-run it
    agg = _exact_gram_agg(q, dim).localCheckpoint()
    gram = agg.filter(F.col("j") >= 0)
    marg = agg.filter((F.col("j") == -1) & (F.col("i") >= 0)).select(
        "i", F.col("sp").alias("s")
    )
    n_df = agg.filter(F.col("i") == -1).select(
        F.col("sp").cast("long").alias("n")
    )
    out = (
        gram.join(F.broadcast(marg.select("i", F.col("s").alias("si"))), "i")
        .join(
            F.broadcast(
                marg.select(F.col("i").alias("j"), F.col("s").alias("sj"))
            ),
            "j",
        )
        .crossJoin(F.broadcast(n_df))
    )
    a = F.col("n").cast(DEC) * F.col("sp") - F.col("si") * F.col("sj")
    nn = (F.col("n") * F.col("n")).cast("double")
    return out.select(
        "i",
        "j",
        "n",
        (a.cast("double") / nn / F.lit(1e12)).alias("cov"),
    )


def sql_embedding_covariance(table: str = "embeddings", dim: int = 64) -> str:
    qv = _SQL_QVEC.format(col="embedding")
    return f"""
WITH q AS (SELECT {qv} AS q FROM {table}),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM q),
marg AS (
  SELECT i, sum(v) AS s FROM (
    SELECT CAST(generate_subscripts(q, 1) - 1 AS INT) AS i,
           CAST(UNNEST(q) AS HUGEINT) AS v FROM q
  ) GROUP BY i
),
gram AS (
  SELECT g.i AS i, g.j AS j, sum(CAST(q.q[g.i + 1] * q.q[g.j + 1] AS HUGEINT)) AS sp
  FROM q, LATERAL (
    SELECT CAST(a.i AS INT) AS i, CAST(b.j AS INT) AS j
    FROM (SELECT UNNEST(range({dim})) AS i) a,
         (SELECT UNNEST(range({dim})) AS j) b
    WHERE b.j >= a.i
  ) g
  GROUP BY g.i, g.j
)
SELECT g.i AS i, g.j AS j, nn.n AS n,
       {_sql_d2d("CAST(nn.n AS HUGEINT) * g.sp - mi.s * mj.s")}
         / CAST(nn.n * nn.n AS DOUBLE) / 1e12 AS cov
FROM gram g
JOIN marg mi ON mi.i = g.i
JOIN marg mj ON mj.i = g.j
CROSS JOIN nn
"""


# --- Johnson-Lindenstrauss random projection --------------------------------

# Deterministic +-1 sign matrix derived from (i, j) by integer hashing
# only — no RNG, no stored matrix, recomputable on any engine.  The
# mixing constants are Knuth multiplicative-hash primes; every
# intermediate stays under 2^63 (h1 < 2^32, h1 * 99991 < 2^49).


def _jl_sign(i: Column, j: Column) -> Column:
    il, jl = i.cast("long"), j.cast("long")
    h1 = (il * F.lit(2654435761) + jl * F.lit(1315423911)) % F.lit(
        4294967296
    )
    g = (h1 * F.lit(99991).cast("long") + F.lit(12345)) % F.lit(4294967296)
    return F.when(g.bitwiseAND(F.lit(4096)) == 0, F.lit(1)).otherwise(
        F.lit(-1)
    )


_SQL_JL_SIGN = (
    "CASE WHEN ((((i * 2654435761 + j * 1315423911) % 4294967296)"
    " * 99991 + 12345) % 4294967296) & 4096 = 0 THEN 1 ELSE -1 END"
)


def _jl_sign_matrix(dim: int, k: int):
    """The same hash in vectorized int64 numpy: S[i, j] in {-1, +1}.
    Every intermediate is < 2^49, far inside int64."""
    import numpy as np  # noqa: PLC0415

    i = np.arange(dim, dtype=np.int64)[:, None]
    j = np.arange(k, dtype=np.int64)[None, :]
    h1 = (i * 2654435761 + j * 1315423911) % 4294967296
    g = (h1 * 99991 + 12345) % 4294967296
    return np.where((g & 4096) == 0, 1, -1).astype(np.int64)


def random_projection(
    embeddings: DataFrame, dim: int = 64, k: int = 16
) -> DataFrame:
    """JL sketch: d-dim embedding -> k-dim signed-sum projection,
    proj_j = sum_i sign(i, j) * q_i, entirely row-local (zero
    shuffles) — at 100 TB this is the cheap preprocessing step before
    LSH bucketing or a coarse ANN tier.

    The inner loop is an Arrow kernel: JVM-side quantization hands the
    int64 codes to numpy, which multiplies by the hash-derived +-1
    sign matrix in one integer matmul (a per-(i,j) Column expression
    evaluated interpreted at ~35 ms/row; the kernel is ~1000x that).
    Sign hashing is identical integer arithmetic in numpy, the Column
    twin (_jl_sign) and the SQL twin, so outputs agree bit-for-bit.

    Output is oracle-comparable: projections flattened to CSV (array
    columns stringify differently across engines) plus the exact
    squared L2 norm of the projection as a BIGINT.
    """
    import pandas as pd  # noqa: PLC0415

    def kernel(batches):
        import numpy as np  # noqa: PLC0415

        sgn = _jl_sign_matrix(dim, k)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.stack(pdf["q"].to_numpy()).astype(np.int64)
            # sq_norm sums k squares of d-term sums: the int64 bound
            # k*(d*|q|)^2 < 2^63 requires |q| <= ~1.1e7 at d=64, k=16;
            # raise rather than let numpy wrap (gram-kernel idiom)
            if mat.size and int(np.abs(mat).max()) > 11_000_000:
                raise ValueError(
                    "projection kernel overflow guard: |q| > 1.1e7 — "
                    "lower the quantization scale (linalg._Q)"
                )
            proj = mat @ sgn
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "proj_csv": [
                        ",".join(str(int(x)) for x in row) for row in proj
                    ],
                    "sq_norm": (proj * proj).sum(axis=1),
                }
            )

    q = embeddings.select("vec_id", _qvec(F.col("embedding")).alias("q"))
    return q.mapInPandas(
        kernel, schema="vec_id long, proj_csv string, sq_norm long"
    )


def sql_random_projection(
    table: str = "embeddings", dim: int = 64, k: int = 16
) -> str:
    qv = _SQL_QVEC.format(col="embedding")
    term = f"({_SQL_JL_SIGN}) * q[i + 1]"
    proj = (
        f"list_transform(range({k}), j -> CAST(list_reduce("
        f"list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(range({dim}), i -> {term})), "
        f"(a, b) -> a + b) AS BIGINT))"
    )
    return f"""
WITH q AS (SELECT vec_id, {qv} AS q FROM {table}),
p AS (SELECT vec_id, {proj} AS proj FROM q)
SELECT vec_id,
       array_to_string(proj, ',') AS proj_csv,
       CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
         list_transform(proj, x -> x * x)), (a, b) -> a + b) AS BIGINT)
         AS sq_norm
FROM p
"""


# --- top principal component via power iteration ----------------------------


def _collect_second_moments(
    embeddings: DataFrame, dim: int
) -> tuple[int, list[int], list[list[int]]]:
    """One distributed pass -> (n, S_i marginals, S_ij upper Gram),
    all exact Python ints.  O(d^2) numbers cross the driver boundary
    (control plane, same budget as clustering.py's k x d centroids)."""
    q = embeddings.select(_qvec(F.col("embedding")).alias("q"))
    rows = _exact_gram_agg(q, dim).collect()
    n = 0
    s = [0] * dim
    gram = [[0] * dim for _ in range(dim)]
    for r in rows:
        v = int(r["sp"])
        if r["i"] == -1:
            n = v
        elif r["j"] == -1:
            s[r["i"]] = v
        else:
            gram[r["i"]][r["j"]] = v
            gram[r["j"]][r["i"]] = v
    return n, s, gram


def _power_iterate(
    n: int, s: list[int], gram: list[list[int]], dim: int, iters: int
) -> list[int]:
    """Integer power iteration on A = n*Gram - s s^T (same eigenvectors
    as the covariance; scale cancels in the renormalization).  The
    renorm is sign * (|u| * 1e6 // max|u|) — non-negative floor
    division, identical in Python, Spark and DuckDB."""
    a = [
        [n * gram[i][j] - s[i] * s[j] for j in range(dim)]
        for i in range(dim)
    ]
    w = [10**6] * dim
    for _ in range(iters):
        u = [sum(a[i][j] * w[j] for j in range(dim)) for i in range(dim)]
        # degenerate (all-zero) step: divide by 1, zeroing w — the
        # EXACT mirror of the twin's greatest(max(abs(u)), 1); an
        # early break here would keep the previous w and diverge from
        # the unrolled SQL on constant corpora
        m = max(abs(x) for x in u) or 1
        w = [
            (1 if x >= 0 else -1) * (abs(x) * 10**6 // m) for x in u
        ]
    return w


def pca_projection_topk(
    embeddings: DataFrame,
    dim: int = 64,
    iters: int = 8,
    topk: int = 20,
) -> DataFrame:
    """Top-principal-component scores: power-iterate on the exact
    second-moment matrix (driver control plane), then one distributed
    narrow pass projects every vector onto the component and keeps the
    top-k by score — the "most extreme along the dominant corpus
    direction" documents, a standard PCA outlier / domain-skew probe.

    Determinism: the iteration is pure integer arithmetic from exact
    integer inputs, so the component (and hence every score) is
    bit-identical across engines; ties break on vec_id.  Scale: the
    heavy O(N d^2) Gram collapses map-side; the projection pass is
    O(N d) with TakeOrdered top-k (no global sort).
    """
    n, s, gram = _collect_second_moments(embeddings, dim)
    w = _power_iterate(n, s, gram, dim, iters)
    w_arr = F.array(*[F.lit(int(x)).cast("long") for x in w])
    # bind the quantized array to a real column BEFORE the fold —
    # F.get on an unbound transform expression re-evaluates the whole
    # transform per element (the dedup.py CollapseProject note)
    score = F.aggregate(
        F.zip_with(F.col("q"), w_arr, lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return (
        embeddings.select(
            "vec_id", _qvec(F.col("embedding")).alias("q")
        )
        .select("vec_id", score.alias("score"))
        .orderBy(F.col("score").desc(), "vec_id")
        .limit(topk)
    )


def sql_pca_projection_topk(
    table: str = "embeddings",
    dim: int = 64,
    iters: int = 8,
    topk: int = 20,
) -> str:
    """DuckDB twin: the same iteration unrolled as chained CTEs over
    HUGEINT (every intermediate bounded well under 2^127 at the test
    scales; at production scale lower the quantization, documented in
    the module docstring)."""
    qv = _SQL_QVEC.format(col="embedding")
    parts = [
        f"q AS MATERIALIZED (SELECT vec_id, {qv} AS q FROM {table})",
        "nn AS (SELECT CAST(count(*) AS HUGEINT) AS n FROM q)",
        "marg AS (SELECT i, sum(v) AS s FROM ("
        "SELECT CAST(generate_subscripts(q, 1) - 1 AS INT) AS i, "
        "CAST(UNNEST(q) AS HUGEINT) AS v FROM q) GROUP BY i)",
        f"gram AS MATERIALIZED (SELECT g.i AS i, g.j AS j, "
        f"sum(CAST(q.q[g.i + 1] * q.q[g.j + 1] AS HUGEINT)) AS sp "
        f"FROM q, LATERAL (SELECT CAST(a.i AS INT) AS i, "
        f"CAST(b.j AS INT) AS j FROM "
        f"(SELECT UNNEST(range({dim})) AS i) a, "
        f"(SELECT UNNEST(range({dim})) AS j) b) g "
        f"GROUP BY g.i, g.j)",
        "a AS MATERIALIZED (SELECT g.i AS i, g.j AS j, "
        "nn.n * g.sp - mi.s * mj.s AS v "
        "FROM gram g JOIN marg mi ON mi.i = g.i "
        "JOIN marg mj ON mj.i = g.j CROSS JOIN nn)",
        f"w0 AS (SELECT CAST(UNNEST(range({dim})) AS INT) AS i, "
        f"CAST(1000000 AS HUGEINT) AS w)",
    ]
    for t in range(iters):
        parts.append(
            f"u{t + 1} AS MATERIALIZED (SELECT a.i AS i, sum(a.v * w.w) AS u "
            f"FROM a JOIN w{t} w ON w.i = a.j GROUP BY a.i)"
        )
        parts.append(
            f"m{t + 1} AS MATERIALIZED (SELECT greatest(max(abs(u)), 1) AS m "
            f"FROM u{t + 1})"
        )
        parts.append(
            f"w{t + 1} AS MATERIALIZED (SELECT u.i AS i, "
            f"(CASE WHEN u.u >= 0 THEN 1 ELSE -1 END) * "
            f"((abs(u.u) * 1000000) // m.m) AS w "
            f"FROM u{t + 1} u CROSS JOIN m{t + 1} m)"
        )
    body = ",\n".join(parts)
    return f"""
WITH {body}
SELECT e.vec_id AS vec_id, CAST(sum(e.v * w.w) AS BIGINT) AS score
FROM (
  SELECT vec_id, CAST(generate_subscripts(q, 1) - 1 AS INT) AS i,
         CAST(UNNEST(q) AS HUGEINT) AS v FROM q
) e
JOIN w{iters} w ON w.i = e.i
GROUP BY e.vec_id
ORDER BY score DESC, vec_id
LIMIT {topk}
"""


# --- embedding centroid drift between corpus halves --------------------------


def centroid_shift(embeddings: DataFrame) -> DataFrame:
    """Per-label embedding drift report: the cosine between the label's
    centroid in corpus half A (even vec_id — stand-in for "yesterday's
    snapshot" / "source 1") and half B (odd vec_id), plus each half's
    mean-vector norm — the geometric drift monitor for an embedding
    column (a re-embedded or contaminated label shows up as a centroid
    rotation long before accuracy metrics move).

    Exactness: cosine is scale-invariant, so centroid cosines equal
    COMPONENT-SUM cosines — no mean division ever happens.  Embeddings
    quantize once to 1e6-scaled integers; per (label, dim) the two
    half-sums are exact DECIMALs; dot / |a|^2 / |b|^2 fold those 64
    exact pairs per label into three exact DECIMAL sums; the only
    floating math is one correctly-rounded decimal->double per term
    and IEEE sqrt/divide (both exact-rounded).  Bound: half-sums are
    DECIMAL(18,0) (|sum| < 1e18 => ~1e12 rows/label-half at unit-norm
    inputs), products DECIMAL(38,0).

    Plan: one scan -> posexplode (narrow, 64x) -> map-side-combinable
    (label, dim) aggregate (the ONLY corpus shuffle, capped at
    |labels| x d partials per task) -> |labels|-row fold.  Empty
    halves yield NULL cosine (no NaN crosses an engine boundary).
    """
    half_a = (F.col("vec_id") % 2) == 0
    q = embeddings.select(
        "label",
        half_a.alias("is_a"),
        _qvec(F.col("embedding")).alias("q"),
    )
    # posexplode_OUTER, not posexplode: an inner generate over the bound
    # _qvec alias lets InferFiltersFromGenerate add `size(q) > 0`, which
    # pushdown inlines the whole quantize-transform into the scan filter
    # (the 12x pattern SCALE.md §5 documents); embeddings are fixed-width
    # non-empty by construction, so outer explode is identical and
    # infers no filter.
    comp = q.select(
        "label", "is_a", F.posexplode_outer(F.col("q")).alias("idx", "v")
    )
    per = comp.groupBy("label", "idx").agg(
        F.coalesce(
            F.sum(F.when(F.col("is_a"), F.col("v"))).cast("decimal(18,0)"),
            F.lit(0).cast("decimal(18,0)"),
        ).alias("sa"),
        F.coalesce(
            F.sum(F.when(~F.col("is_a"), F.col("v"))).cast("decimal(18,0)"),
            F.lit(0).cast("decimal(18,0)"),
        ).alias("sb"),
    )
    agg = per.groupBy("label").agg(
        F.sum((F.col("sa") * F.col("sb")).cast(DEC)).alias("dot"),
        F.sum((F.col("sa") * F.col("sa")).cast(DEC)).alias("naa"),
        F.sum((F.col("sb") * F.col("sb")).cast(DEC)).alias("nbb"),
    )
    counts = q.groupBy("label").agg(
        F.sum(F.col("is_a").cast("bigint")).cast("bigint").alias("n_a"),
        F.sum((~F.col("is_a")).cast("bigint")).cast("bigint").alias("n_b"),
    )
    cos = F.when(
        (F.col("naa") == 0) | (F.col("nbb") == 0), F.lit(None).cast("double")
    ).otherwise(
        F.col("dot").cast("double")
        / (F.sqrt(F.col("naa").cast("double")) * F.sqrt(F.col("nbb").cast("double")))
    )
    norm_a = F.when(F.col("n_a") == 0, F.lit(None).cast("double")).otherwise(
        F.sqrt(F.col("naa").cast("double"))
        / (F.lit(_Q) * F.col("n_a").cast("double"))
    )
    norm_b = F.when(F.col("n_b") == 0, F.lit(None).cast("double")).otherwise(
        F.sqrt(F.col("nbb").cast("double"))
        / (F.lit(_Q) * F.col("n_b").cast("double"))
    )
    return counts.join(agg, "label").select(
        "label",
        "n_a",
        "n_b",
        cos.alias("cos_shift"),
        norm_a.alias("norm_mean_a"),
        norm_b.alias("norm_mean_b"),
    )


def sql_centroid_shift(table: str = "embeddings") -> str:
    qv = _SQL_QVEC.format(col="embedding")
    return f"""
WITH q AS (
  SELECT label, (vec_id % 2 = 0) AS is_a, {qv} AS q FROM {table}
),
comp AS (
  SELECT label, is_a,
         CAST(generate_subscripts(q, 1) - 1 AS INT) AS idx,
         CAST(UNNEST(q) AS HUGEINT) AS v
  FROM q
),
per AS (
  SELECT label, idx,
         coalesce(sum(CASE WHEN is_a THEN v END), 0) AS sa,
         coalesce(sum(CASE WHEN NOT is_a THEN v END), 0) AS sb
  FROM comp GROUP BY 1, 2
),
agg AS (
  SELECT label, sum(sa * sb) AS dot,
         sum(sa * sa) AS naa, sum(sb * sb) AS nbb
  FROM per GROUP BY 1
),
counts AS (
  SELECT label,
         CAST(sum(CASE WHEN is_a THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         CAST(sum(CASE WHEN is_a THEN 0 ELSE 1 END) AS BIGINT) AS n_b
  FROM q GROUP BY 1
)
SELECT c.label, c.n_a, c.n_b,
       CASE WHEN a.naa = 0 OR a.nbb = 0 THEN NULL
            ELSE {_sql_d2d("a.dot")}
                 / (sqrt({_sql_d2d("a.naa")}) * sqrt({_sql_d2d("a.nbb")}))
       END AS cos_shift,
       CASE WHEN c.n_a = 0 THEN NULL
            ELSE sqrt({_sql_d2d("a.naa")}) / (1000000.0 * CAST(c.n_a AS DOUBLE))
       END AS norm_mean_a,
       CASE WHEN c.n_b = 0 THEN NULL
            ELSE sqrt({_sql_d2d("a.nbb")}) / (1000000.0 * CAST(c.n_b AS DOUBLE))
       END AS norm_mean_b
FROM counts c JOIN agg a ON c.label = a.label
"""
