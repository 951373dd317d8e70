"""Round-7 additions: IVF tier for the kNN label-noise audit, sketch-only
production twins (see test_sketches.py / test_plans.py), resumable batch
inference (test_inference.py)."""

from __future__ import annotations

from pyspark.sql import functions as F, Window as W

from eventstreamd_spark.operators import similarity as sim
from eventstreamd_spark.session import load_table


def _noise_neighbor_sets(spark, sf_dir):
    """Re-derive exact and IVF neighbor rankings with the operator's own
    building blocks (same scoring, same tie order) to measure recall at
    the NEIGHBOR level — the rollup output deliberately aggregates it
    away."""
    emb = load_table(spark, sf_dir, "embeddings")
    anchors = emb.filter(F.col("vec_id") % sim.NOISE_ANCHOR_MOD == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    exact = (
        emb.join(F.broadcast(anchors), F.col("vec_id") != F.col("query_id"))
        .withColumn("cos", sim.cosine_guarded(F.col("qvec"), F.col("embedding")))
        .withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= sim.NOISE_K)
        .select("query_id", "vec_id")
    )
    cells = sim.ivf_cells(emb, sim.N_CELLS, keep=("label",))
    cents = emb.filter(F.col("vec_id") < sim.N_CELLS).select(
        F.col("vec_id").alias("cell_id"), F.col("embedding").alias("cvec")
    )
    wq = W.partitionBy("query_id").orderBy(F.desc("ccos"), F.asc("cell_id"))
    probes = (
        anchors.join(F.broadcast(cents))
        .withColumn("ccos", sim.cosine(F.col("qvec"), F.col("cvec")))
        .withColumn("r", F.row_number().over(wq))
        .filter(F.col("r") <= sim.NOISE_N_PROBE)
        .select("query_id", "qvec", "cell_id")
    )
    ivf = (
        cells.join(F.broadcast(probes), "cell_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn("cos", sim.cosine_guarded(F.col("qvec"), F.col("embedding")))
        .withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= sim.NOISE_K)
        .select("query_id", "vec_id")
    )
    return exact, ivf


def test_knn_label_noise_ivf_recall_vs_exact(spark, sf_dir) -> None:
    """The IVF tier scans ~n_probe/n_cells of the corpus per anchor; its
    neighbor recall vs the exact tier must clear both an absolute floor
    AND the random-coverage baseline (n_probe/n_cells) — the proof the
    index CONCENTRATES neighbors rather than just sampling the corpus.
    Measured at sf0.001: 0.51 vs 0.25 coverage."""
    exact, ivf = _noise_neighbor_sets(spark, sf_dir)
    n_exact = exact.count()
    hit = exact.join(ivf, ["query_id", "vec_id"]).count()
    recall = hit / n_exact
    coverage = sim.NOISE_N_PROBE / sim.N_CELLS
    assert recall >= 0.4
    assert recall > coverage + 0.1


def test_knn_label_noise_ivf_rollup_shape(spark, sf_dir) -> None:
    emb = load_table(spark, sf_dir, "embeddings")
    exact = {r["label"]: r for r in sim.knn_label_noise(emb).collect()}
    ivf = {r["label"]: r for r in sim.knn_label_noise_ivf(emb).collect()}
    # every label the exact audit covers is audited by the IVF tier too
    assert set(ivf) == set(exact)
    for lab, r in ivf.items():
        assert 0.0 <= r["mean_noise"] <= 1.0
        assert 0 <= r["n_flagged"] <= r["n_anchors"]
        # anchor coverage: IVF audits the same hash-defined anchor set
        # (an anchor only drops if its probed cells are empty)
        assert r["n_anchors"] <= exact[lab]["n_anchors"]
        assert r["n_anchors"] >= max(1, exact[lab]["n_anchors"] - 2)


def test_rater_agreement_kappa_chance_correction(spark, sf_dir) -> None:
    """Cohen's kappa invariants: on the junk-planted corpus both raters
    have real work and kappa lands strictly between 0 and p_observed
    (chance correction bites); on the clean corpus the heuristic gate
    keeps EVERYTHING — a constant rater carries no signal and kappa is
    exactly 0, which is precisely why the registered query plants junk."""
    from eventstreamd_spark.operators import textops as tx

    docs = load_table(spark, sf_dir, "documents")
    row = tx.rater_agreement_kappa(tx.with_planted_junk(docs)).collect()[0]
    assert 0 < row["n_gate_keep"] < row["n_docs"]
    assert 0 < row["n_clf_keep"] < row["n_docs"]
    assert row["n_agree"] <= row["n_docs"]
    assert -1.0 <= row["kappa"] <= 1.0
    assert 0.0 < row["kappa"] < row["p_observed"]

    clean = tx.rater_agreement_kappa(docs).collect()[0]
    assert clean["n_gate_keep"] == clean["n_docs"]
    assert clean["kappa"] == 0.0
