"""Graph tier: integer PageRank + canonical-copy selection."""

from __future__ import annotations

import duckdb
from pyspark.sql import Row

from eventstreamd_spark.operators import dedup as dedup_op
from eventstreamd_spark.operators import graph


def test_pagerank_canonical_matches_duckdb(spark, sf_dir) -> None:
    from eventstreamd_spark.session import load_table

    docs = dedup_op.with_planted_near_dups(
        load_table(spark, sf_dir, "documents")
    )
    got = {tuple(r) for r in graph.pagerank_canonical(docs).collect()}
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS "
        f"SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    sql = graph.sql_pagerank_canonical(dedup_op.sql_planted_near_dups())
    want = {tuple(r) for r in con.sql(sql).fetchall()}
    assert got == want
    # exactly one canonical per cluster
    by_cluster: dict[int, int] = {}
    for _, cluster_id, _, is_canon in got:
        by_cluster[cluster_id] = by_cluster.get(cluster_id, 0) + (
            1 if is_canon else 0
        )
    assert all(v == 1 for v in by_cluster.values())


def test_pagerank_star_center_wins(spark) -> None:
    """On a star graph the hub must out-rank every leaf, so the hub is
    the canonical pick regardless of doc ids (leaf 0 would win a
    min-id rule; PageRank picks the hub, id 9)."""
    edges = spark.createDataFrame(
        [Row(src=i, dst=9) for i in range(4)]
    )
    pr = {r["node"]: r["pr"] for r in graph.pagerank(edges).collect()}
    assert pr[9] > max(pr[i] for i in range(4))


def test_pagerank_mass_roughly_conserved(spark) -> None:
    """Truncating integer division only ever loses mass — total rank
    stays within a small deficit of n * SCALE and never exceeds it."""
    edges = spark.createDataFrame(
        [Row(src=0, dst=1), Row(src=1, dst=2), Row(src=2, dst=3)]
    )
    rows = graph.pagerank(edges).collect()
    total = sum(r["pr"] for r in rows)
    n = len(rows)
    assert total <= n * graph.PR_SCALE
    assert total > int(0.95 * n * graph.PR_SCALE)


def test_pagerank_symmetric_pair_equal_ranks(spark) -> None:
    edges = spark.createDataFrame([Row(src=5, dst=7)])
    pr = {r["node"]: r["pr"] for r in graph.pagerank(edges).collect()}
    assert pr[5] == pr[7]


def test_resolve_entities_transitive_merge(spark) -> None:
    """A~B and B~C (each within 2 edits) must land in ONE entity even
    though A and C are 4 edits apart; unrelated names stay singleton."""
    from pyspark.sql import Row

    rows = [
        Row(p_name="alpha beta gamma"),
        Row(p_name="alpha beta gamba"),   # 2 edits from the first
        Row(p_name="alpha beta bamba"),   # 2 edits from the second
        Row(p_name="totally different name"),
    ]
    out = dedup_op.resolve_entities(
        spark.createDataFrame(rows), name_col="p_name"
    ).collect()
    by_name = {r["name"]: r for r in out}
    cluster = {
        by_name[n]["entity_id"]
        for n in ("alpha beta gamma", "alpha beta gamba", "alpha beta bamba")
    }
    assert cluster == {"alpha beta bamba"}  # min name of the component
    assert by_name["alpha beta gamma"]["n_names"] == 3
    assert by_name["totally different name"]["entity_id"] == (
        "totally different name"
    )
    assert by_name["totally different name"]["n_names"] == 1


def _pagerank_reference(edges: list[tuple[int, int]], iters: int = 5):
    """Pure-Python replica of the integer iteration — the third
    independent implementation (after Spark and the DuckDB twin)."""
    sym = edges + [(b, a) for a, b in edges]
    deg: dict[int, int] = {}
    for s, _ in sym:
        deg[s] = deg.get(s, 0) + 1
    pr = {n: graph.PR_SCALE for n in deg}
    for _ in range(iters):
        nxt: dict[int, int] = {n: 0 for n in deg}
        for s, d in sym:
            nxt[d] += pr[s] // deg[s]
        pr = {n: graph._BASE + (17 * v) // 20 for n, v in nxt.items()}
    return pr


def test_pagerank_matches_python_reference_random_graphs(spark) -> None:
    """Exact equality against an independent pure-Python fixed-point
    implementation on pseudo-random graphs (hash-derived edges, no
    RNG) — any divergence in div/damping/sum order would show here."""
    from pyspark.sql import Row

    for seed in (1, 2, 3):
        edges = []
        for i in range(25):
            a = (i * 7 + seed * 13) % 18
            b = (i * 11 + seed * 5) % 18
            if a != b:
                edges.append((min(a, b), max(a, b)))
        edges = sorted(set(edges))
        got = {
            r["node"]: r["pr"]
            for r in graph.pagerank(
                spark.createDataFrame([Row(src=a, dst=b) for a, b in edges])
            ).collect()
        }
        assert got == _pagerank_reference(edges)
