"""Linear-algebra tier: covariance / JL projection / power-iteration
PCA — cross-engine exactness plus numerical sanity."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import Row, functions as F

from eventstreamd_spark.operators import linalg


def _con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS "
        f"SELECT * FROM '{sf_dir}/embeddings.parquet'"
    )
    return con


def _load(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_covariance_matches_duckdb(spark, sf_dir) -> None:
    got = {
        tuple(r)
        for r in linalg.embedding_covariance(_load(spark, sf_dir)).collect()
    }
    con = _con(sf_dir)
    want = {
        tuple(r) for r in con.sql(linalg.sql_embedding_covariance()).fetchall()
    }
    assert got == want
    assert len(got) == 64 * 65 // 2  # upper triangle incl. diagonal


def test_covariance_diagonal_nonnegative(spark, sf_dir) -> None:
    rows = linalg.embedding_covariance(_load(spark, sf_dir)).collect()
    for r in rows:
        assert r["j"] >= r["i"]
        if r["i"] == r["j"]:
            assert r["cov"] >= 0.0


def test_random_projection_matches_duckdb(spark, sf_dir) -> None:
    got = {
        tuple(r)
        for r in linalg.random_projection(_load(spark, sf_dir)).collect()
    }
    con = _con(sf_dir)
    want = {
        tuple(r) for r in con.sql(linalg.sql_random_projection()).fetchall()
    }
    assert got == want


def test_jl_signs_balanced(spark) -> None:
    """The hash-derived sign matrix should be roughly balanced — a
    degenerate all-ones column would make the projection useless."""
    df = spark.range(1).select(
        F.flatten(
            F.transform(
                F.sequence(F.lit(0), F.lit(15)),
                lambda j: F.transform(
                    F.sequence(F.lit(0), F.lit(63)),
                    lambda i: linalg._jl_sign(i, j),
                ),
            )
        ).alias("s")
    )
    signs = df.collect()[0]["s"]
    pos = sum(1 for x in signs if x == 1)
    assert 0.35 * len(signs) < pos < 0.65 * len(signs)


def test_jl_sign_matrix_matches_column_twin(spark) -> None:
    """The numpy kernel, the Column expression and the SQL twin must
    all derive the same +-1 matrix from the integer hash."""
    sgn = linalg._jl_sign_matrix(64, 16)
    df = spark.range(1).select(
        F.flatten(
            F.transform(
                F.sequence(F.lit(0), F.lit(15)),
                lambda j: F.transform(
                    F.sequence(F.lit(0), F.lit(63)),
                    lambda i: linalg._jl_sign(i, j),
                ),
            )
        ).alias("s")
    )
    col_signs = df.collect()[0]["s"]
    np_signs = [int(sgn[i, j]) for j in range(16) for i in range(64)]
    assert col_signs == np_signs


def test_pca_matches_duckdb(spark, sf_dir) -> None:
    got = [
        tuple(r)
        for r in linalg.pca_projection_topk(_load(spark, sf_dir)).collect()
    ]
    con = _con(sf_dir)
    want = con.sql(linalg.sql_pca_projection_topk()).fetchall()
    assert got == [tuple(r) for r in want]
    assert len(got) == 20


def test_power_iteration_finds_dominant_direction() -> None:
    """On a corpus with one dominant variance direction, the integer
    power iteration must align with it (up to sign)."""
    np = pytest.importorskip("numpy")
    rng = np.random.default_rng(7)
    dim, n = 8, 200
    base = rng.normal(size=(n, dim)) * 0.01
    base[:, 3] += rng.normal(size=n) * 5.0  # dominant axis = dim 3
    q = [[int(round(v * 1e6)) for v in row] for row in base]
    s = [sum(row[i] for row in q) for i in range(dim)]
    gram = [
        [sum(row[i] * row[j] for row in q) for j in range(dim)]
        for i in range(dim)
    ]
    w = linalg._power_iterate(n, s, gram, dim, iters=8)
    w_arr = np.array(w, dtype=float)
    w_arr /= np.linalg.norm(w_arr)
    assert abs(w_arr[3]) > 0.99


def test_power_iteration_zero_matrix_guard() -> None:
    """Zero matrix -> every step divides by greatest(m, 1) = 1 and w
    collapses to zeros — matching the SQL twin's unrolled CTEs."""
    dim = 4
    w = linalg._power_iterate(
        0, [0] * dim, [[0] * dim for _ in range(dim)], dim, iters=8
    )
    assert w == [0] * dim


def test_pca_handles_constant_embeddings(spark) -> None:
    """All-identical vectors -> zero covariance -> the degenerate
    divide-by-greatest(m,1) path must agree WITH THE TWIN, not just
    run (the early-break variant of the guard kept the previous w on
    the Spark side while the unrolled SQL zeroed it)."""
    import pandas as pd

    rows = [Row(vec_id=i, embedding=[1.0, 2.0, 3.0, 4.0]) for i in range(5)]
    df = spark.createDataFrame(rows)
    got = [
        tuple(r)
        for r in linalg.pca_projection_topk(
            df, dim=4, iters=3, topk=5
        ).collect()
    ]
    con = duckdb.connect()
    con.register("embeddings", pd.DataFrame([r.asDict() for r in rows]))
    want = con.sql(
        linalg.sql_pca_projection_topk(dim=4, iters=3, topk=5)
    ).fetchall()
    assert got == [tuple(r) for r in want]
    assert len(got) == 5
    assert {r[1] for r in got} == {0}  # zero matrix -> zero scores


def test_gram_kernel_overflow_guard(spark) -> None:
    """Values past the int64-safe quantization bound must raise, not
    silently wrap inside the numpy matmul."""
    import pytest
    from pyspark.sql import Row

    rows = [Row(vec_id=0, embedding=[50.0, 0.0]), Row(vec_id=1, embedding=[1.0, 1.0])]
    df = spark.createDataFrame(rows)
    with pytest.raises(Exception, match="overflow guard"):
        linalg.embedding_covariance(df, dim=2).collect()


# --- centroid shift ----------------------------------------------------------


def test_centroid_shift_identical_halves(spark) -> None:
    from pyspark.sql import Row

    from eventstreamd_spark.operators import linalg as la

    # even/odd halves contain the SAME two vectors -> centroids equal,
    # cosine exactly 1.0 (integer sums are identical, so the divide is
    # x/x with x > 0)
    rows = []
    for i in range(4):
        v = [1.0, 2.0, 3.0] if i < 2 else [0.5, 0.25, 4.0]
        rows.append(Row(vec_id=2 * i, embedding=v, label=7))
        rows.append(Row(vec_id=2 * i + 1, embedding=v, label=7))
    out = la.centroid_shift(spark.createDataFrame(rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_a"] == 4 and r["n_b"] == 4
    assert r["cos_shift"] == 1.0
    assert r["norm_mean_a"] == r["norm_mean_b"]


def test_centroid_shift_orthogonal_and_empty_half(spark) -> None:
    from pyspark.sql import Row

    from eventstreamd_spark.operators import linalg as la

    rows = [
        # label 1: half A on e1, half B on e2 -> cosine exactly 0
        Row(vec_id=0, embedding=[1.0, 0.0], label=1),
        Row(vec_id=1, embedding=[0.0, 1.0], label=1),
        # label 2: only an even vec_id -> half B empty -> NULL cosine
        Row(vec_id=2, embedding=[1.0, 1.0], label=2),
    ]
    out = {
        r["label"]: r
        for r in la.centroid_shift(spark.createDataFrame(rows)).collect()
    }
    assert out[1]["cos_shift"] == 0.0
    assert out[2]["cos_shift"] is None
    assert out[2]["norm_mean_b"] is None and out[2]["n_b"] == 0


def test_centroid_shift_bounds_on_real_data(spark, sf_dir) -> None:
    from eventstreamd_spark.operators import linalg as la
    from eventstreamd_spark.session import load_table

    rows = la.centroid_shift(
        load_table(spark, sf_dir, "embeddings")
    ).collect()
    assert rows
    for r in rows:
        if r["cos_shift"] is not None:
            assert -1.0 - 1e-9 <= r["cos_shift"] <= 1.0 + 1e-9
        # two random halves of the same label cluster should agree in
        # direction far more than orthogonal
        assert r["n_a"] + r["n_b"] > 0
