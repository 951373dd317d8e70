"""Resumable batch inference (VERDICT r6 ask #7): kill the job mid-run,
resume, and get exactly-once outputs that are bit-identical to the
Catalyst classifier twin."""

from __future__ import annotations

import os

import pytest

from eventstreamd_spark.operators import inference as inf
from eventstreamd_spark.operators import textops
from eventstreamd_spark.session import load_table


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").select("doc_id", "text")


def test_kernel_matches_catalyst_classifier_exactly(spark, sf_dir, tmp_path):
    """The pandas kernel replays textops.classifier_quality_scores
    bit-for-bit: same md5 weights, fold order, HALF_UP rounding."""
    docs = _docs(spark, sf_dir)
    out_dir = str(tmp_path / "scores")
    summary = inf.resumable_inference(docs, out_dir, n_shards=4)
    assert summary["skipped"] == [] and summary["ran"] == [0, 1, 2, 3]

    got = {
        r["doc_id"]: (r["n_feats"], r["logit"], r["keep"])
        for r in inf.read_inference_output(spark, out_dir).collect()
    }
    want = {
        r["doc_id"]: (r["n_feats"], r["logit"], r["keep"])
        for r in textops.classifier_quality_scores(
            load_table(spark, sf_dir, "documents")
        ).collect()
    }
    assert got == want  # exact equality, every doc, no dup/missing


def test_crash_and_resume_exactly_once(spark, sf_dir, tmp_path):
    """Kill after shard 2's parquet write but BEFORE its commit marker
    (the torn window), resume, and assert: committed shards 0-1 are
    skipped (not re-scored), shard 2 re-runs and overwrites its torn
    output, and the final corpus has every doc exactly once."""
    docs = _docs(spark, sf_dir)
    out_dir = str(tmp_path / "scores_crash")

    with pytest.raises(RuntimeError, match="injected crash"):
        inf.resumable_inference(
            docs, out_dir, n_shards=4, _crash_before_commit=2
        )
    # torn state: shards 0,1 committed; shard 2 written but uncommitted
    assert sorted(inf.read_progress(out_dir)) == [0, 1]
    assert os.path.isdir(os.path.join(out_dir, "shard=2"))
    # the manifest-driven reader must NOT expose the torn shard
    seen = inf.read_inference_output(spark, out_dir).count()
    n_committed = sum(
        r["rows"] for r in inf.read_progress(out_dir).values()
    )
    assert seen == n_committed

    summary = inf.resumable_inference(docs, out_dir, n_shards=4)
    assert summary["skipped"] == [0, 1]  # no recompute of committed work
    assert summary["ran"] == [2, 3]

    out = inf.read_inference_output(spark, out_dir)
    n_docs = docs.count()
    assert out.count() == n_docs  # nothing missing
    assert out.select("doc_id").distinct().count() == n_docs  # nothing duplicated
    # and the resumed run is still value-exact vs the Catalyst twin
    got = {r["doc_id"]: r["logit"] for r in out.collect()}
    want = {
        r["doc_id"]: r["logit"]
        for r in textops.classifier_quality_scores(
            load_table(spark, sf_dir, "documents")
        ).collect()
    }
    assert got == want


def test_resume_with_different_sharding_raises(spark, sf_dir, tmp_path):
    """Resuming the same out_dir with a different n_shards must raise:
    shard markers are only valid under the pmod modulus they were
    written with — silently reusing them would duplicate and drop
    doc_ids (round-8 ADVICE fix: job identity pinned in the manifest)."""
    docs = _docs(spark, sf_dir)
    out_dir = str(tmp_path / "scores_ident")
    with pytest.raises(RuntimeError, match="injected crash"):
        inf.resumable_inference(
            docs, out_dir, n_shards=4, _crash_before_commit=1
        )
    with pytest.raises(ValueError, match="identity mismatch"):
        inf.resumable_inference(docs, out_dir, n_shards=8)
    # the original parameters still resume cleanly
    summary = inf.resumable_inference(docs, out_dir, n_shards=4)
    assert summary["skipped"] == [0]
    out = inf.read_inference_output(spark, out_dir)
    assert out.count() == docs.count()


def test_resume_legacy_manifest_without_identity_raises(
    spark, sf_dir, tmp_path
):
    """A manifest with committed shard markers but no job.json (written
    by a pre-identity-guard run) must refuse to resume rather than
    silently stamping the CURRENT identity over markers of unknown
    sharding (round-9 ADVICE fix)."""
    docs = _docs(spark, sf_dir)
    out_dir = str(tmp_path / "scores_legacy")
    with pytest.raises(RuntimeError, match="injected crash"):
        inf.resumable_inference(
            docs, out_dir, n_shards=4, _crash_before_commit=1
        )
    os.remove(os.path.join(out_dir, "_progress", "job.json"))
    with pytest.raises(ValueError, match="no job.json identity"):
        inf.resumable_inference(docs, out_dir, n_shards=4)


def test_kernel_whitespace_is_ascii_like_java(spark):
    """The kernel's tokenizer must match Java \\s (ASCII-only): a NBSP
    must NOT split tokens in the kernel, exactly as in the Catalyst
    twin — parity would silently fork on non-ASCII whitespace
    otherwise (round-8 ADVICE fix)."""
    import pandas as pd

    pdf = pd.DataFrame({"doc_id": [1], "text": ["alpha\xa0beta gamma"]})
    [out] = list(inf.classifier_kernel(iter([pdf])))
    # Java \s does not match \xa0: tokens are ["alpha\xa0beta", "gamma"]
    # -> exactly ONE bigram feature
    assert out["n_feats"].tolist() == [1]
    # and the Catalyst twin agrees on the same document
    from eventstreamd_spark.operators import textops as t

    df = spark.createDataFrame(
        [(1, "alpha\xa0beta gamma")], "doc_id bigint, text string"
    )
    row = t.classifier_quality_scores(df).collect()[0]
    assert row["n_feats"] == 1
    assert row["logit"] == out["logit"].tolist()[0]


def test_double_crash_replay_is_idempotent(spark, sf_dir, tmp_path):
    """Crash on the SAME shard twice (at-least-once execution), then
    finish: overwrite semantics mean the replays land on the same
    files — exactly-once contents."""
    docs = _docs(spark, sf_dir)
    out_dir = str(tmp_path / "scores_twice")
    for _ in range(2):
        with pytest.raises(RuntimeError, match="injected crash"):
            inf.resumable_inference(
                docs, out_dir, n_shards=3, _crash_before_commit=1
            )
    summary = inf.resumable_inference(docs, out_dir, n_shards=3)
    assert summary["skipped"] == [0]
    out = inf.read_inference_output(spark, out_dir)
    assert out.count() == docs.count()
    assert out.select("doc_id").distinct().count() == docs.count()
