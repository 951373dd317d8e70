"""Property-based invariants of the hash-gated sampling family — the
claims that make these operators safe at 100 TB: membership depends
only on (key, salt), never on partitioning, row order, or what else is
in the dataset (append stability)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from eventstreamd_spark.operators import sampling
from eventstreamd_spark.session import load_table


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


def _ids(df):
    return {r["doc_id"] for r in df.select("doc_id").collect()}


def test_sample_invariant_under_partitioning(spark, docs) -> None:
    base = _ids(sampling.deterministic_sample(docs, "doc_id", 0.3))
    for parts in (1, 7):
        shuffled = docs.repartition(parts, "lang")
        assert _ids(sampling.deterministic_sample(shuffled, "doc_id", 0.3)) == base


def test_sample_append_stable(spark, docs) -> None:
    """Membership of existing rows never changes when rows are added."""
    half = docs.filter("doc_id % 2 = 0")
    s_half = _ids(sampling.deterministic_sample(half, "doc_id", 0.3))
    s_full = _ids(sampling.deterministic_sample(docs, "doc_id", 0.3))
    assert s_half == {i for i in s_full if i % 2 == 0}


def test_sample_monotone_in_rate(spark, docs) -> None:
    """A higher rate strictly extends the sample (nested gates)."""
    prev: set = set()
    for rate in (0.1, 0.3, 0.6, 1.0):
        cur = _ids(sampling.deterministic_sample(docs, "doc_id", rate))
        assert prev <= cur
        prev = cur
    assert prev == _ids(docs)  # rate 1.0 keeps everything


def test_split_disjoint_exhaustive_and_salt_decorrelated(spark, docs) -> None:
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    split = sampling.dataset_split(docs, "doc_id", w)
    counts = {r["split"]: r["n"] for r in split.groupBy("split").agg(
        F.count("*").alias("n")).collect()}
    assert set(counts) == set(w)  # no NULL bucket: exhaustive
    assert sum(counts.values()) == docs.count()
    # different salt draws a different (but equally deterministic) split
    a = _ids(sampling.dataset_split(docs, "doc_id", w, salt="a").filter("split = 'val'"))
    b = _ids(sampling.dataset_split(docs, "doc_id", w, salt="b").filter("split = 'val'"))
    assert a != b
    a2 = _ids(sampling.dataset_split(docs, "doc_id", w, salt="a").filter("split = 'val'"))
    assert a == a2


def test_rebalance_rejects_empty_targets(spark, docs) -> None:
    with pytest.raises(ValueError, match="non-empty"):
        sampling.rebalance_to_mix(docs, "doc_id", "source", {})
    with pytest.raises(ValueError, match="non-empty"):
        sampling.sql_rebalance_to_mix("doc_id", "source", {})


def test_sql_rebalance_escapes_quotes() -> None:
    sql = sampling.sql_rebalance_to_mix("doc_id", "source", {"o'brien": 1.0})
    assert "o''brien" in sql  # quoted literal survives


# --- sequential Poisson weighted sampling -----------------------------------


def test_weighted_sample_invariant_under_weight_scaling(spark, docs) -> None:
    """Uniformly scaling every weight preserves the selected set (the
    priority ordering u/w is scale-free) — the property that makes
    weight units (chars vs tokens vs bytes) irrelevant to membership."""
    base = _ids(sampling.weighted_sample(docs, "doc_id", "n_chars", 40))
    scaled = docs.withColumn("n_chars", F.col("n_chars") * 1000)
    assert _ids(sampling.weighted_sample(scaled, "doc_id", "n_chars", 40)) == base


def test_weighted_sample_invariant_under_partitioning(spark, docs) -> None:
    base = _ids(sampling.weighted_sample(docs, "doc_id", "n_chars", 40))
    for parts in (1, 7):
        assert _ids(
            sampling.weighted_sample(
                docs.repartition(parts, "lang"), "doc_id", "n_chars", 40
            )
        ) == base


def test_weighted_sample_monotone_in_k(spark, docs) -> None:
    prev: set = set()
    for k in (5, 20, 40):
        cur = _ids(sampling.weighted_sample(docs, "doc_id", "n_chars", k))
        assert prev <= cur and len(cur) == k
        prev = cur


def test_exact_quantiles_invariant_under_partitioning(spark, sf_dir) -> None:
    """Histogram-refinement order statistics must not depend on the
    physical layout: any repartitioning yields identical cut values
    (the property a sort-based implementation gets for free and a
    distributed one must prove)."""
    from eventstreamd_spark.operators import statistics
    from eventstreamd_spark.session import load_table

    li = load_table(spark, sf_dir, "lineitem")
    base = {
        r["frac"]: (r["rank"], r["value"])
        for r in statistics.exact_quantile_values(li, "l_extendedprice").collect()
    }
    for parts in (1, 13):
        got = {
            r["frac"]: (r["rank"], r["value"])
            for r in statistics.exact_quantile_values(
                li.repartition(parts, "l_orderkey"), "l_extendedprice"
            ).collect()
        }
        assert got == base
