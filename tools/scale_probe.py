#!/usr/bin/env python
"""Measure OBSERVED scaling exponents for the candidate-generating
dedup/ANN tiers — the empirical check behind SCALE.md's claimed bounds.

Method: run each probed query at sf0.1 (N) and at a synthetic 10x
blow-up (10N), steady-state timing (best of two full executions after a
cold pass), and report a = log(t_10N / t_N) / log(10) — the local
scaling exponent.  a ~ 1 is scan-dominated, the explicitly-quadratic
exact baseline should show a ~ 2, and anything unexpectedly >= 2 in a
"scale path" tier means a cutoff needs tightening.

The 10x corpus is sf0.1 replicated with key offsets and deterministic
per-replica perturbation chosen so REPLICAS ARE MUTUALLY DISSIMILAR
while each replica preserves the base corpus's internal near-dup
structure: documents get a replica suffix appended to EVERY word
(all shingles differ across replicas; planted near-dup pairs inside a
replica stay near-dups), embeddings get a cyclic dimension rotation by
the replica index (cos(rot_r(a), rot_r(b)) == cos(a, b) exactly, while
cross-replica cosines decorrelate).  A naive blow-up (same text plus a
trailing token / a tiny vector nudge) makes every row a 10-way
NEAR-DUPLICATE clique, growing candidate pairs ~quadratically and
measuring the synthetic data, not the operator — the first run of this
probe demonstrated exactly that (dedup_ngram_jaccard read a=1.52).

Writes tools' sidecar SCALE_PROBE.json and prints a markdown table to
paste into SCALE.md.  Scratch data lives under .scratch/ (gitignored).
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCRATCH = os.path.join(REPO, ".scratch", "sf_probe10x")
REPLICAS = 10
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)

PROBES = [
    # (query name, SCALE.md claimed bound)
    ("dedup_ngram_jaccard", "~N (inverted index + hot-shingle guard)"),
    ("dedup_minhash_lsh", "~N (banded bucket join)"),
    ("dedup_clusters", "~N log n (large-star/small-star)"),
    ("similarity_lsh_ann", "~N (bucketed corpus, broadcast queries)"),
    ("semantic_dedup", "~N^1.5 intra-cell (SemDeDup cells)"),
    ("embedding_near_dup", "N^2 BY DESIGN (labeled exact baseline)"),
    # round-5 sketch tier: all claimed ~N (one narrow scan + map-side
    # partials; sketch/summary sizes constant in N)
    ("kmv_distinct", "~N (bottom-k partials, k-row merge)"),
    ("hll_distinct", "~N (m registers, map-side max)"),
    ("cms_heavy_hitters", "~N (d x w cells, map-side sum)"),
    ("late_data_audit", "~N (bucket prefix max, bucket-local windows)"),
    # late round-5: linalg / graph / profile tiers
    ("embedding_covariance", "~N (Arrow int64-Gram, d^2 partials/batch)"),
    ("random_projection", "~N (row-local int64 matmul)"),
    ("pca_projection_topk", "~N (Gram control plane + narrow projection)"),
    ("pagerank_canonical", "~E log n components + 5 E-join rank rounds"),
    ("source_overlap", "~N shingles (source-collapsed inverted index)"),
    ("event_transitions", "~N (one lag window + tiny pair agg)"),
    ("column_stats_catalog", "~N (one multi-distinct scan)"),
    # round-6 second wave
    ("bootstrap_ci", "~N (single scan, 128 accumulator columns)"),
    ("rolling_active_users", "~N (one (day,user) dedup + spine fan)"),
    ("rolling_wau_hll", "~N ((day,bucket) register partials)"),
    ("tokenizer_fertility", "~N ((lang,source,token) distinct)"),
    ("hapax_report", "~N (token-keyed counts + hapax join)"),
    ("centroid_shift", "~N ((label,dim) partial sums)"),
    ("multi_touch_attribution", "~N (user-keyed banded self-join)"),
    ("user_diversity", "~N (two id-keyed aggregates)"),
    ("media_corpus_manifest", "~N (digest agg + prefix-sum packing)"),
    ("triangle_stats", "~E^1.5 worst-case (kappa orientation)"),
    ("survivorship_merge", "~N (ER closure + entity-keyed aggs)"),
    ("session_stats", "~N (one user-keyed window + KB histogram)"),
    ("ivf_incremental_add", "~N x cells (broadcast centroids)"),
    ("column_stats_catalog_hll", "~N (n_cols-x narrow unpivot, register partials)"),
]


def build_blowup(spark) -> None:
    from pyspark.sql import functions as F

    from eventstreamd_spark.session import load_table

    os.makedirs(SCRATCH, exist_ok=True)
    for t in TABLES:
        if t in ("documents", "embeddings", "events", "lineitem", "part"):
            continue
        dst = os.path.join(SCRATCH, f"{t}.parquet")
        if not os.path.exists(dst):
            shutil.copyfile(os.path.join(BASE, f"{t}.parquet"), dst)

    # lineitem + part: replicated with CONSISTENT key offsets (the
    # l_partkey -> p_partkey join stays valid across replicas) so the
    # fact-table tiers (column_stats_catalog at 6M rows ~ sf1) measure
    # real 10x data — an earlier probe revision copied lineitem
    # verbatim, which made its a=0.02 reading vacuous.  p_name gets the
    # per-replica word suffix (replicas mutually dissimilar, intra-
    # replica fuzzy-name structure preserved) for the entity tier.
    li = load_table(spark, BASE, "lineitem")
    max_ok = li.agg(F.max("l_orderkey")).collect()[0][0]
    pt = load_table(spark, BASE, "part")
    max_pk = pt.agg(F.max("p_partkey")).collect()[0][0]
    reps0 = spark.range(REPLICAS).select(F.col("id").alias("rep"))
    blown_li = li.crossJoin(reps0).select(
        (F.col("l_orderkey") + F.col("rep") * (max_ok + 1)).alias("l_orderkey"),
        (F.col("l_partkey") + F.col("rep") * (max_pk + 1)).alias("l_partkey"),
        *[c for c in li.columns if c not in ("l_orderkey", "l_partkey")],
    )
    blown_li.coalesce(16).write.mode("overwrite").parquet(
        os.path.join(SCRATCH, "lineitem.parquet")
    )
    p_resuffixed = F.concat_ws(
        " ",
        F.transform(
            F.split(F.col("p_name"), r"\s+"),
            lambda w: F.concat(w, F.lit("~"), F.col("rep").cast("string")),
        ),
    )
    blown_pt = pt.crossJoin(reps0).select(
        (F.col("p_partkey") + F.col("rep") * (max_pk + 1)).alias("p_partkey"),
        F.when(F.col("rep") == 0, F.col("p_name"))
        .otherwise(p_resuffixed)
        .alias("p_name"),
        *[c for c in pt.columns if c not in ("p_partkey", "p_name")],
    )
    blown_pt.coalesce(8).write.mode("overwrite").parquet(
        os.path.join(SCRATCH, "part.parquet")
    )

    # events: replicate with distinct event_ids (distinct-count probes
    # must see 10x cardinality) and the same users/types/timestamps
    # (heavy hitters and rate buckets scale in depth, not width)
    ev = load_table(spark, BASE, "events")
    n_ev = ev.count()
    ev_reps = spark.range(REPLICAS).select(F.col("id").alias("rep"))
    blown_ev = ev.crossJoin(ev_reps).select(
        (F.col("event_id") + F.col("rep") * (n_ev * 10)).alias("event_id"),
        "ts",
        "user_id",
        "event_type",
        "value",
        "props",
    )
    blown_ev.coalesce(8).write.mode("overwrite").parquet(
        os.path.join(SCRATCH, "events.parquet")
    )

    docs = load_table(spark, BASE, "documents")
    n_docs = docs.count()
    reps = spark.range(REPLICAS).select(F.col("id").alias("rep"))
    resuffixed = F.concat_ws(
        " ",
        F.transform(
            F.split(F.col("text"), r"\s+"),
            lambda w: F.concat(w, F.lit("~"), F.col("rep").cast("string")),
        ),
    )
    blown_docs = docs.crossJoin(reps).select(
        (F.col("doc_id") + F.col("rep") * (n_docs * 10)).alias("doc_id"),
        F.when(F.col("rep") == 0, F.col("text")).otherwise(resuffixed).alias("text"),
        "lang",
        "source",
        "n_chars",
    )
    blown_docs.coalesce(8).write.mode("overwrite").parquet(
        os.path.join(SCRATCH, "documents.parquet")
    )

    emb = load_table(spark, BASE, "embeddings")
    n_vec = emb.count()
    # cyclic rotation by 7*rep dims: exact isometry within a replica
    rot = (F.col("rep") * 7 % 64).cast("int")
    rotated = F.concat(
        F.slice(F.col("embedding"), rot + 1, 64 - rot),
        F.slice(F.col("embedding"), 1, rot),
    )
    blown_emb = emb.crossJoin(reps).select(
        (F.col("vec_id") + F.col("rep") * (n_vec * 10)).alias("vec_id"),
        F.when(F.col("rep") == 0, F.col("embedding")).otherwise(rotated).alias("embedding"),
        "label",
    )
    blown_emb.coalesce(8).write.mode("overwrite").parquet(
        os.path.join(SCRATCH, "embeddings.parquet")
    )
    print(f"blow-up ready: {n_docs * REPLICAS} docs, {n_vec * REPLICAS} vecs")


def steady(fn, spark, sf_dir: str) -> float:
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # cold
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    from eventstreamd_spark.session import get_spark

    spark = get_spark("scale-probe", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")

    from eventstreamd_spark import queries_registry as reg

    build_blowup(spark)

    results = {}
    for name, claim in PROBES:
        fn = reg.QUERIES[name]
        t1 = steady(fn, spark, BASE)
        t10 = steady(fn, spark, SCRATCH)
        a = math.log(t10 / t1) / math.log(REPLICAS)
        results[name] = {
            "t_base_sec": round(t1, 3),
            "t_10x_sec": round(t10, 3),
            "exponent": round(a, 3),
            "claimed": claim,
        }
        print(f"{name}: {t1:.2f}s -> {t10:.2f}s  a={a:.2f}  ({claim})")

    # Outlier remeasure pass (bench.py's rule, exponent-flavored): a
    # long 31-query session accumulates JVM state (GC pressure,
    # checkpoint storage), and a single query occasionally reads 3-10x
    # slow — two different runs this round pinned a=1.03 on pagerank
    # and a=1.08 on late_data_audit that clean re-measurement put back
    # at ~0.2-0.6.  Any exponent past 0.85 is re-measured at both
    # scales after the sweep and min-merged, so a one-off GC stall
    # cannot masquerade as a scale cliff (genuinely superlinear tiers
    # would reproduce under remeasure).
    remeasured = []
    for name, r in results.items():
        if r["exponent"] <= 0.85:
            continue
        fn = reg.QUERIES[name]
        t1 = min(r["t_base_sec"], steady(fn, spark, BASE))
        t10 = min(r["t_10x_sec"], steady(fn, spark, SCRATCH))
        a = math.log(t10 / t1) / math.log(REPLICAS)
        results[name] = {
            "t_base_sec": round(t1, 3),
            "t_10x_sec": round(t10, 3),
            "exponent": round(a, 3),
            "claimed": r["claimed"],
            "remeasured": True,
        }
        remeasured.append(name)
        print(f"REMEASURED {name}: {t1:.2f}s -> {t10:.2f}s  a={a:.2f}")

    out = os.path.join(REPO, "tools", "SCALE_PROBE.json")
    with open(out, "w") as fh:
        json.dump({"base": BASE, "replicas": REPLICAS, "probes": results}, fh, indent=1)
    print(f"\nwrote {out}\n")
    print("| query | t(N) | t(10N) | observed a | claimed bound |")
    print("|---|---|---|---|---|")
    for name, r in results.items():
        print(
            f"| {name} | {r['t_base_sec']}s | {r['t_10x_sec']}s "
            f"| **{r['exponent']}** | {r['claimed']} |"
        )


if __name__ == "__main__":
    main()
