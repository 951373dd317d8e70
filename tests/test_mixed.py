"""Mixed-modality perceptual tier: one content-dispatched kernel over
a PNG/JPEG/WAV/MP4 corpus, oracle parity, and the admission face."""

from __future__ import annotations

from eventstreamd_spark.operators import mixed as mx
from eventstreamd_spark.session import load_table


def test_dispatch_picks_the_right_kernel() -> None:
    """Each modality's blob routes to its own fingerprint — verified
    against the per-tier kernels directly."""
    from eventstreamd_spark.operators.audio import (
        _envelope_fingerprint as audio_fp,
    )
    from eventstreamd_spark.operators.audio import _synth_scene_wav
    from eventstreamd_spark.operators.perceptual import (
        _grid_hashes,
        _synth_scene_media,
    )
    from eventstreamd_spark.operators.video import (
        _envelope_fingerprint as video_fp,
    )
    from eventstreamd_spark.operators.video import _synth_scene_mp4

    img = _synth_scene_media(0)  # cohort 0 -> image modality
    wav = _synth_scene_wav(4)  # cohort 1 -> audio
    mp4 = _synth_scene_mp4(8)  # cohort 2 -> video
    assert mx._dispatch_fingerprint(img) == _grid_hashes(img)
    assert mx._dispatch_fingerprint(wav) == audio_fp(wav)
    assert mx._dispatch_fingerprint(mp4) == video_fp(mp4)
    # and the mixed synthesizer routes cohorts the same way
    assert mx._synth_mixed_media(0) == img
    assert mx._synth_mixed_media(4) == wav
    assert mx._synth_mixed_media(8) == mp4


def test_scene_key_spaces_structurally_disjoint_at_sf100() -> None:
    """Regression for the round-9 ADVICE finding: with the old 1<<20 /
    1<<21 offsets, an image cohort c and audio cohort c-524288 shared a
    scene key once doc_id passed ~2^21, producing verified
    cross-modality false pairs the parity gate cannot see.  The widened
    offsets keep the three key RANGES pairwise disjoint for every
    doc_id up to well past the sf100 fixture ceiling, while staying
    inside the hash's 2^32 input domain and the oracle's BIGINT bound."""
    from eventstreamd_spark.operators.audio import AUDIO_SCENE_OFFSET
    from eventstreamd_spark.operators.perceptual import _MIX_K1
    from eventstreamd_spark.operators.video import VIDEO_SCENE_OFFSET

    doc_id_max = 100_000_000  # 2x the sf100 fixture's ~5e7 ceiling
    span = 2 * (doc_id_max // 4) + 1  # max key within a modality band
    assert span < AUDIO_SCENE_OFFSET  # image band ends before audio's
    assert AUDIO_SCENE_OFFSET + span < VIDEO_SCENE_OFFSET
    assert VIDEO_SCENE_OFFSET + span < 1 << 32  # inside the hash domain
    # DuckDB oracle computes (s+1)*K1 before the mod — must fit BIGINT
    assert (VIDEO_SCENE_OFFSET + span + 1) * _MIX_K1 < 1 << 63
    # the exact round-9 counterexample shape: no audio cohort can now
    # reach down into the image band, whatever the doc_id
    assert AUDIO_SCENE_OFFSET > span  # audio's minimum key > image max


def test_mixed_near_dup_matches_oracle_and_stays_intra_modal(
    spark, sf_dir
) -> None:
    """Spark's dispatched pipeline is bit-identical to the single
    CASE-dispatched scene CTE; every planted twin pair is caught and
    every surviving pair stays within one cohort (hence one
    modality)."""
    import duckdb

    docs = load_table(spark, sf_dir, "documents")
    media = mx.documents_as_mixed_media(docs)
    got = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in mx.mixed_media_near_dup(media).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    want = {
        tuple(r) for r in con.execute(mx.sql_mixed_media_near_dup()).fetchall()
    }
    assert got == want
    n = docs.count()
    planted = {(c, c + 1) for c in range(0, n - 3, 4)} | {
        (c, c + 2) for c in range(0, n - 3, 4)
    }
    assert planted <= {(a, b) for a, b, _ in got}
    assert all(a // 4 == b // 4 for a, b, _ in got)  # intra-cohort only


def test_admission_kernel_accepts_mixed_signatures(
    spark, sf_dir, tmp_path
) -> None:
    """The streaming admission writer runs the mixed kernel: a twin
    arriving a batch after its canonical is rejected against the index
    REGARDLESS of modality — one admission pipeline for the whole
    mixed corpus."""
    from eventstreamd_spark.streaming.pipeline import (
        media_admission_writer,
        seed_media_index,
    )

    docs = load_table(spark, sf_dir, "documents").filter("doc_id < 36")
    media = mx.documents_as_mixed_media(docs).select("doc_id", "blob")
    idx, out = str(tmp_path / "mixidx"), str(tmp_path / "mixout")
    seed_media_index(
        spark.createDataFrame(
            [],
            "doc_id bigint, a_hi bigint, a_lo bigint, d_hi bigint, d_lo bigint",
        ),
        idx,
    )
    w = media_admission_writer(idx, out, sig_fn=mx.mixed_media_fingerprints)
    # split inside an image cohort (0-3), an audio cohort (4-7) and a
    # video cohort (8-11): canonicals 0/4/8 land in batch 1, their
    # twins 1-2/5-6/9-10 partly in batch 2
    w(media.filter("doc_id IN (0, 4, 8) OR doc_id >= 12"), 0)
    w(media.filter("doc_id IN (1, 2, 5, 6, 9, 10, 11, 3, 7)"), 1)
    rows = {
        r["doc_id"]: (r["cluster_id"], r["keep"], r["reason"])
        for r in spark.read.parquet(out).collect()
    }
    assert len(rows) == 36
    for canonical in (0, 4, 8):  # image, audio, video twins all reject
        for twin in (canonical + 1, canonical + 2):
            assert rows[twin] == (canonical, False, "near_dup_index"), twin
        assert rows[canonical] == (canonical, True, "kept")
