"""Perceptual media near-dup (round-8, VERDICT ask #5): aHash/dHash
over REAL PNG decode, Hamming-banded pairs, planted resized-duplicate
fixture — the re-encoded/resized twins exact digests miss."""

from __future__ import annotations

from eventstreamd_spark.operators import perceptual as perc
from eventstreamd_spark.session import load_table


def _pack(bits):
    lo = hi = 0
    for k in range(32):
        lo |= int(bits[k]) << k
        hi |= int(bits[32 + k]) << k
    return hi, lo


def _expected_hashes(doc_id: int):
    """Oracle arithmetic replayed in python: hash bits from the scene
    bytes alone (uniform blocks cancel out of the cross-multiplies)."""
    s, _size, perturbed = perc._doc_scene(doc_id)
    vals = [perc._scene_value(s, c) for c in range(perc.N_CELLS)]
    if perturbed:
        vals[s % perc.N_CELLS] ^= perc.PERTURB_XOR
    total = sum(vals)
    abits = [perc.N_CELLS * v >= total for v in vals]
    dbits = [
        vals[i * 8 + j] > vals[i * 8 + (j + 1) % 8]
        for i in range(8)
        for j in range(8)
    ]
    return (*_pack(abits), *_pack(dbits))


def _hamming(h1, h2) -> int:
    return sum(bin(a ^ b).count("1") for a, b in zip(h1, h2))


def test_kernel_matches_scene_arithmetic_exactly() -> None:
    """encode_png -> decode_png -> grid -> hash must equal the pure
    scene arithmetic for every member size — a codec, grid-edge, or
    packing bug flips bits here."""
    for doc_id in (0, 1, 2, 3, 40, 41, 42, 43, 117):
        blob = perc._synth_scene_media(doc_id)
        assert perc._grid_hashes(blob) == _expected_hashes(doc_id), doc_id


def test_resized_duplicate_has_identical_hashes() -> None:
    """Member 1 is the SAME scene rendered as a 64x64 grayscale JPEG
    instead of a 16x16 RGB PNG: both hashes must be bit-identical
    across BOTH real codec round-trips — the resize AND cross-codec
    invariance the operator exists for (round-9: the JPEG leg)."""
    for base in (0, 4, 96):
        h0 = perc._grid_hashes(perc._synth_scene_media(base))
        h1 = perc._grid_hashes(perc._synth_scene_media(base + 1))
        assert h0 == h1, base


def test_perturbed_member_is_near_but_not_far() -> None:
    """Member 2 (one scene cell xored): dHash distance <= 2 by
    construction (a flipped cell touches exactly its two horizontal
    comparisons), combined distance always within the verify
    threshold — and often exactly 0, which is the robustness-to-
    re-encode-noise property the hash exists for, not a bug.  Member 3
    (fresh scene) is far from everything in its cohort."""
    distances = []
    for base in range(0, 120, 4):
        h0 = perc._grid_hashes(perc._synth_scene_media(base))
        h2 = perc._grid_hashes(perc._synth_scene_media(base + 2))
        h3 = perc._grid_hashes(perc._synth_scene_media(base + 3))
        d02 = _hamming(h0, h2)
        assert d02 <= perc.HAMMING_MAX, (base, d02)
        # dHash alone (last two halves) within the banding guarantee
        d_d = _hamming(h0[2:], h2[2:])
        assert d_d <= 2, (base, d_d)
        assert _hamming(h0, h3) > perc.HAMMING_MAX, base
        distances.append(d02)
    assert any(d > 0 for d in distances)  # the perturbation is real


def test_grid_hashes_on_non_multiple_of_8_sizes() -> None:
    """The grid uses integer block edges, so arbitrary sizes (the
    multimodal fixture's 8..16 px RGB PNGs) hash deterministically."""
    from eventstreamd_spark.operators.multimodal import _synth_png

    for doc_id in (0, 3, 5, 11):
        h1 = perc._grid_hashes(_synth_png(doc_id))
        h2 = perc._grid_hashes(_synth_png(doc_id))
        assert h1 == h2
        assert all(0 <= x < (1 << 32) for x in h1)


def test_media_clusters_keep_one_per_cohort(spark, sf_dir) -> None:
    """Cluster assignment: members 0/1/2 of every cohort collapse to
    one cluster keyed by the min doc_id with exactly one keep=True;
    member 3 (fresh scene) stays a singleton that keeps itself."""
    docs = load_table(spark, sf_dir, "documents")
    media = perc.documents_as_scene_media(docs)
    rows = {
        r["doc_id"]: (r["cluster_id"], r["keep"])
        for r in perc.media_near_dup_clusters(media).collect()
    }
    cohorts: dict = {}
    for d in rows:
        cohorts.setdefault(d // perc.COHORT, []).append(d)
    checked = 0
    for _p, members in cohorts.items():
        by_m = {d % perc.COHORT: d for d in members}
        if set(by_m) == {0, 1, 2, 3}:
            trio = [by_m[0], by_m[1], by_m[2]]
            cid = min(trio)
            assert all(rows[d][0] == cid for d in trio), trio
            assert [rows[d][1] for d in sorted(trio)] == [True, False, False]
            assert rows[by_m[3]] == (by_m[3], True)  # singleton keeps itself
            checked += 1
    assert checked > 50


def test_media_split_leakage_sees_cross_split_twins(spark, sf_dir) -> None:
    """The planted resized duplicates land in different hash-disjoint
    splits often enough that the boundary report MUST show leaked
    pairs — the exact-digest audit sees zero (different blobs)."""
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    media = perc.documents_as_scene_media(docs)
    weights = {"train": 0.8, "val": 0.1, "test": 0.1}
    rows = perc.media_split_leakage(media, weights).collect()
    total = sum(r["n_pairs"] for r in rows)
    leaked = sum(r["n_pairs"] for r in rows if r["is_boundary"])
    assert total > 100  # the fixture plants ~3 pairs per cohort
    assert leaked > 0  # content leaks across blob-disjoint splits
    # and the exact-digest view of the same pairs is blind: every
    # planted twin is a DIFFERENT blob (other resolution / perturbed)
    md5s = perc.documents_as_scene_media(docs).select(
        "doc_id", "content_md5"
    )
    dup_digests = (
        md5s.groupBy("content_md5").count().filter(F.col("count") > 1).count()
    )
    assert dup_digests == 0


def test_media_near_dup_catches_planted_pairs(spark, sf_dir) -> None:
    """End-to-end over the documents corpus: every cohort's resized
    duplicate (m0, m1) surfaces at Hamming 0, the perturbed twin pairs
    with both, the fresh-scene member pairs with nothing, and no
    cross-cohort pair appears."""
    docs = load_table(spark, sf_dir, "documents")
    media = perc.documents_as_scene_media(docs)
    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in perc.media_near_dup(media).collect()
    }
    doc_ids = sorted(r["doc_id"] for r in docs.select("doc_id").collect())
    cohorts = {}
    for d in doc_ids:
        cohorts.setdefault(d // perc.COHORT, []).append(d)
    n_checked = 0
    for _p, members in cohorts.items():
        by_m = {d % perc.COHORT: d for d in members}
        if 0 in by_m and 1 in by_m:
            key = (min(by_m[0], by_m[1]), max(by_m[0], by_m[1]))
            assert pairs.get(key) == 0, key  # resized dup, Hamming 0
            n_checked += 1
        if 0 in by_m and 2 in by_m:
            key = (min(by_m[0], by_m[2]), max(by_m[0], by_m[2]))
            assert key in pairs, key  # hamming may be 0 (absorbed noise)
    assert n_checked > 50  # the fixture actually planted cohorts
    for (a, b), _h in pairs.items():
        assert a // perc.COHORT == b // perc.COHORT, (a, b)
        assert a % perc.COHORT != 3 and b % perc.COHORT != 3, (a, b)


def test_media_admission_decisions_classes(spark, sf_dir) -> None:
    """The registered admission split exercises every decision class:
    even cohorts' member 2 rejects against the INDEX (its canonical
    entered via the corpus dedup), odd cohorts' members 0/1/2 cluster
    IN-BATCH (one kept, two rejected), and nothing in the batch is
    silently dropped (one decision row per batch doc)."""
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents").filter("doc_id < 400")
    media = perc.documents_as_scene_media(docs).select("doc_id", "blob")
    in_corpus = F.col("doc_id") % 8
    corpus = media.filter(in_corpus.isin(*perc.ADMIT_CORPUS_MOD8))
    batch = media.filter(~in_corpus.isin(*perc.ADMIT_CORPUS_MOD8))
    rows = {
        r["doc_id"]: (r["cluster_id"], r["keep"], r["reason"])
        for r in perc.media_admission_decisions(corpus, batch).collect()
    }
    batch_ids = {r["doc_id"] for r in batch.select("doc_id").collect()}
    assert set(rows) == batch_ids  # exactly one decision per batch doc
    for d, (cid, keep, reason) in rows.items():
        m8 = d % 8
        if m8 == 2:  # even cohort's perturbed twin vs the index canonical
            assert (cid, keep, reason) == (d - 2, False, "near_dup_index"), d
        elif m8 == 4:  # odd cohort canonical, first of the in-batch trio
            assert (cid, keep, reason) == (d, True, "kept"), d
        else:  # m8 in (5, 6): in-batch near-dups of the m8=4 canonical
            assert (cid, keep, reason) == (d - (m8 - 4), False, "near_dup_batch"), d


def test_media_near_dup_prod_guard_is_wired_and_oracle_exact(
    spark, sf_dir
) -> None:
    """Round-10 (VERDICT ask #4): the REGISTERED production twin runs
    with the hot-bucket guard ON and its oracle mirrors the guard —
    on the non-degenerate fixture the guard drops nothing (every
    planted pair survives, prod == unguarded), and on a planted flood
    the prod operator's pair set collapses to the true twins while
    the guarded SQL twin states the identical computation."""
    import duckdb

    from eventstreamd_spark.operators import multimodal as mm

    media = mm.cached_media(spark, sf_dir, "scene_image")
    prod = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in perc.media_near_dup_prod(media).collect()
    }
    unguarded = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in perc.media_near_dup(media).collect()
    }
    assert prod == unguarded  # guard inert on a real corpus
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    want = {
        tuple(r) for r in con.execute(perc.sql_media_near_dup_prod()).fetchall()
    }
    assert prod == want
    # flood path: the registered guard width bounds a planted flood
    flood = [(i, 7, 7, 7, 7) for i in range(2_000)]
    twins = [(100_000, 11, 22, 33, 44), (100_001, 11, 22, 33, 44)]
    sig = spark.createDataFrame(
        flood + twins,
        "doc_id bigint, a_hi bigint, a_lo bigint, d_hi bigint, d_lo bigint",
    )
    guarded_pairs = perc.banded_pairs(
        sig, perc.HAMMING_MAX, max_bucket=perc.PROD_MAX_BUCKET
    ).collect()
    assert {(r["doc_a"], r["doc_b"]) for r in guarded_pairs} == {
        (100_000, 100_001)
    }


def test_wide_pair_band_tier_matches_narrow_and_shrinks_candidates(
    spark, sf_dir
) -> None:
    """Round-10 wide tier: 32-bit pair buckets find the SAME pair set
    as the 16-bit tier on the fixture (every planted twin is within
    the Hamming <= 6 pair-band recall guarantee), match their own
    DuckDB oracle exactly, and generate orders of magnitude fewer
    random candidates — the property the tier exists for."""
    import duckdb

    from eventstreamd_spark.operators import multimodal as mm
    from pyspark.sql import functions as F

    media = mm.cached_media(spark, sf_dir, "scene_image")
    sig = perc.perceptual_hashes(media).localCheckpoint()
    wide = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in perc.banded_pairs_wide(sig, perc.HAMMING_MAX).collect()
    }
    narrow = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in perc.banded_pairs(sig, perc.HAMMING_MAX).collect()
    }
    assert wide == narrow  # fixture pairs all within the <= 6 guarantee
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    want = {
        tuple(r)
        for r in con.execute(perc.sql_media_near_dup_wide()).fetchall()
    }
    assert wide == want

    def random_candidates(stack_fn):
        """Bucket collisions between DIFFERENT cohorts — the random
        (non-twin) term the wide tier exists to shrink.  Twin
        collisions necessarily grow 28/8 with the pair explosion, so
        raw totals are the wrong measure at twin-dominated scales."""
        st = stack_fn(sig).select("doc_id", "band", "bhash")
        l, r = st.alias("l"), st.alias("r")
        return (
            l.join(
                r,
                (F.col("l.band") == F.col("r.band"))
                & (F.col("l.bhash") == F.col("r.bhash"))
                & (F.col("l.doc_id") < F.col("r.doc_id"))
                & (
                    (F.col("l.doc_id") / 4).cast("bigint")
                    != (F.col("r.doc_id") / 4).cast("bigint")
                ),
            ).count()
        )

    n_wide = random_candidates(perc.pair_band_stack)
    n_narrow = random_candidates(perc.band_stack)
    # 2^16x larger key space: the random term must collapse (at sf10
    # the measured narrow-tier random load is 44M candidates)
    assert n_wide <= n_narrow, (n_wide, n_narrow)
    assert n_wide <= 2, n_wide  # essentially zero at 2^32 buckets


def test_hot_bucket_guard_bounds_degenerate_floods(spark) -> None:
    """A planted flood (10k copies of one signature — the all-black-
    thumbnail corpus) would generate ~10^8 candidates per band through
    the unguarded self-join; with max_bucket the flood's buckets are
    excluded BEFORE pair generation while ordinary twins in small
    buckets keep their pairs and admission matches."""
    flood = [(i, 7, 7, 7, 7) for i in range(10_000)]
    twins = [(100_000, 11, 22, 33, 44), (100_001, 11, 22, 33, 44)]
    sig = spark.createDataFrame(
        flood + twins,
        "doc_id bigint, a_hi bigint, a_lo bigint, d_hi bigint, d_lo bigint",
    )
    pairs = perc.banded_pairs(sig, hamming_max=10, max_bucket=64).collect()
    assert {(r["doc_a"], r["doc_b"]) for r in pairs} == {(100_000, 100_001)}
    # the admission primitive with a flooded INDEX: probe twins still
    # match their small-bucket index entries, the flood is inert
    probe = spark.createDataFrame(
        [(5, 11, 22, 33, 44), (6, 7, 7, 7, 7)],
        "doc_id bigint, a_hi bigint, a_lo bigint, d_hi bigint, d_lo bigint",
    )
    matches = perc.banded_matches_against(
        probe, sig, hamming_max=10, max_bucket=64
    ).collect()
    assert {(r["doc_id"], r["index_doc"]) for r in matches} == {
        (5, 100_000),
        (5, 100_001),
    }
    # and WITHOUT the guard the flood probe would match all 10k: prove
    # the guard is load-bearing on a 100-doc slice (bounded runtime)
    small_flood = sig.filter("doc_id < 100 OR doc_id >= 100000")
    unguarded = perc.banded_matches_against(probe, small_flood, 10).count()
    assert unguarded == 102  # 2 twin matches + 100 flood matches


def test_media_admission_wide_matches_narrow(spark, sf_dir) -> None:
    """Round-12 (VERDICT ask #6): the BATCH admission face with
    wide=True (32-bit pair-band candidates) — every planted media twin
    sits within the wide tier's guaranteed-recall bound (the streaming
    parity test's argument), so narrow and wide verdicts must be
    identical on this corpus, decision for decision."""
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents").filter("doc_id < 400")
    media = perc.documents_as_scene_media(docs).select("doc_id", "blob")
    media = media.localCheckpoint()
    in_corpus = F.col("doc_id") % 8
    corpus = media.filter(in_corpus.isin(*perc.ADMIT_CORPUS_MOD8))
    batch = media.filter(~in_corpus.isin(*perc.ADMIT_CORPUS_MOD8))
    verdicts = {}
    for wide in (False, True):
        verdicts[wide] = {
            (r["doc_id"], r["cluster_id"], r["keep"], r["reason"])
            for r in perc.media_admission_decisions(
                corpus, batch, wide=wide
            ).collect()
        }
    assert verdicts[True] == verdicts[False]


def test_admission_accepts_precomputed_sigs_identically(spark, sf_dir) -> None:
    """Round-12 one-decode-pass sharing: admission given precomputed
    corpus_sig/batch_sig relations (the registry serves both splits of
    the family's session-cached signature table) returns exactly the
    decisions it computes from the raw blobs — a pure
    common-subexpression factoring, narrow and wide."""
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents").filter("doc_id < 400")
    media = perc.documents_as_scene_media(docs).select("doc_id", "blob")
    media = media.localCheckpoint()
    sigs = perc.perceptual_hashes(media).localCheckpoint()
    in_corpus = F.col("doc_id") % 8
    corpus = media.filter(in_corpus.isin(*perc.ADMIT_CORPUS_MOD8))
    batch = media.filter(~in_corpus.isin(*perc.ADMIT_CORPUS_MOD8))
    corpus_sig = sigs.filter(in_corpus.isin(*perc.ADMIT_CORPUS_MOD8))
    batch_sig = sigs.filter(~in_corpus.isin(*perc.ADMIT_CORPUS_MOD8))
    for wide in (False, True):
        own = {
            tuple(r)
            for r in perc.media_admission_decisions(
                corpus, batch, wide=wide
            ).collect()
        }
        shared = {
            tuple(r)
            for r in perc.media_admission_decisions(
                corpus_sig,
                batch_sig,
                wide=wide,
                corpus_sig=corpus_sig,
                batch_sig=batch_sig,
            ).collect()
        }
        assert own == shared, wide
