"""Round-6 operator tier: privacy, calibration, ACF, EWMA, triangle
census, nDCG ranking eval, changelog compaction.

Value-hash parity with DuckDB is the registry gate's job; these tests
pin the SEMANTIC laws each operator must satisfy (monotonicity,
normalization, closed-form invariants, hand-computed fixtures) so a
refactor that stays self-consistent across engines but drifts from
the intended math still fails loudly.
"""

from __future__ import annotations

from pyspark.sql import Row

from eventstreamd_spark.operators import (
    dedup as dedup_op,
    graph as graph_op,
    merge as merge_op,
    similarity as sim_op,
    statistics as stats_mod,
)
from eventstreamd_spark.session import load_table


# --- k-anonymity -----------------------------------------------------------


def test_k_anonymity_monotone_in_k(spark, sf_dir) -> None:
    rows = sorted(
        stats_mod.k_anonymity_report(
            load_table(spark, sf_dir, "customer")
        ).collect(),
        key=lambda r: r["k"],
    )
    assert [r["k"] for r in rows] == list(stats_mod.K_ANON_THRESHOLDS)
    for lo, hi in zip(rows, rows[1:]):
        # a class below k is also below every larger k
        assert lo["n_classes_below"] <= hi["n_classes_below"]
        assert lo["n_rows_at_risk"] <= hi["n_rows_at_risk"]
    for r in rows:
        assert 0.0 <= r["risk_frac"] <= 1.0


def test_k_anonymity_fixture(spark) -> None:
    rows = [
        Row(c_custkey=i, c_nationkey=1, c_mktsegment="A", c_acctbal=500.0)
        for i in range(4)
    ] + [Row(c_custkey=9, c_nationkey=2, c_mktsegment="B", c_acctbal=500.0)]
    out = {
        r["k"]: r
        for r in stats_mod.k_anonymity_report(
            spark.createDataFrame(rows)
        ).collect()
    }
    # class sizes: {4, 1}; k=2 -> only the singleton at risk
    assert out[2]["n_classes_below"] == 1
    assert out[2]["n_rows_at_risk"] == 1
    # k=5 -> both classes below threshold, all 5 rows at risk
    assert out[5]["n_classes_below"] == 2
    assert out[5]["n_rows_at_risk"] == 5
    assert out[5]["risk_frac"] == 1.0


# --- calibration -----------------------------------------------------------


def test_calibration_totals_and_ece(spark, sf_dir) -> None:
    rows = stats_mod.calibration_report(
        load_table(spark, sf_dir, "events")
    ).collect()
    n_total = sum(r["n"] for r in rows)
    assert n_total == load_table(spark, sf_dir, "events").count()
    # every row carries the same global ECE, equal to the n-weighted
    # mean absolute gap
    ece = rows[0]["ece"]
    assert all(abs(r["ece"] - ece) < 1e-15 for r in rows)
    recomputed = sum(abs(r["gap"]) * r["n"] for r in rows) / n_total
    assert abs(ece - recomputed) < 1e-9
    for r in rows:
        assert 0.0 <= r["mean_pred"] <= 1.0
        assert 0.0 <= r["obs_rate"] <= 1.0
        assert 0.0 <= r["brier"] <= 1.0


def test_calibration_perfect_scorer(spark) -> None:
    # p=1 & y=1 and p=0 & y=0 -> brier 0, gap 0, ece 0
    rows = [
        Row(event_id=1, event_type="purchase", value=200.0),
        Row(event_id=2, event_type="view", value=0.0),
    ]
    out = stats_mod.calibration_report(spark.createDataFrame(rows)).collect()
    assert all(r["brier"] == 0.0 and r["ece"] == 0.0 for r in out)


# --- ACF -------------------------------------------------------------------


def test_acf_bounds_and_pair_counts(spark, sf_dir) -> None:
    from pyspark.sql import functions as F

    events = load_table(spark, sf_dir, "events")
    type_counts = {
        r["event_type"]: r["c"]
        for r in events.groupBy("event_type")
        .agg(F.count("*").alias("c"))
        .collect()
    }
    rows = stats_mod.acf_profile(events).collect()
    assert len(rows) == len(type_counts) * len(stats_mod.ACF_LAGS)
    for r in rows:
        assert -1.0 <= r["acf"] <= 1.0
        assert r["n_pairs"] == type_counts[r["event_type"]] - r["lag"]


def test_acf_perfect_alternation(spark) -> None:
    # strictly alternating series: ACF(1) = -1, ACF(2) = +1
    import datetime

    rows = [
        Row(
            event_id=i,
            event_type="t",
            ts=datetime.datetime(2024, 1, 1, 0, 0, i),
            value=1.0 if i % 2 == 0 else 3.0,
        )
        for i in range(40)
    ]
    out = {
        r["lag"]: r["acf"]
        for r in stats_mod.acf_profile(spark.createDataFrame(rows)).collect()
    }
    assert abs(out[1] + 1.0) < 1e-9
    assert abs(out[2] - 1.0) < 1e-9


# --- EWMA ------------------------------------------------------------------


def test_ewma_matches_reference_recursion(spark, sf_dir) -> None:
    events = load_table(spark, sf_dir, "events")
    got = {
        r["user_id"]: r
        for r in stats_mod.ewma_user_score(events).collect()
    }
    # reference: plain python over each user's last-16 values
    pdf = events.select("user_id", "ts", "event_id", "value").toPandas()
    pdf = pdf.sort_values(["user_id", "ts", "event_id"])
    for uid, grp in pdf.groupby("user_id"):
        vals = [round(v * 100) for v in grp["value"].tolist()][-stats_mod.EWMA_DEPTH:]
        num = sum(c * (1 << i) for i, c in enumerate(vals))
        den = sum(1 << i for i in range(len(vals)))
        r = got[uid]
        # weights: the j-th most recent carries 2^(15-j); with full
        # depth both formulations agree after scaling
        scale = 1 << (stats_mod.EWMA_DEPTH - len(vals))
        assert r["ewma_num"] == num * scale
        assert r["ewma_den"] == den * scale
        assert abs(r["ewma_value"] - num / den / 100.0) < 1e-9
        assert r["n_events"] == len(grp)


def test_ewma_recency_dominates(spark) -> None:
    import datetime

    rows = [
        Row(event_id=i, user_id=1,
            ts=datetime.datetime(2024, 1, 1, 0, 0, i),
            event_type="t", value=0.0)
        for i in range(15)
    ] + [
        Row(event_id=99, user_id=1,
            ts=datetime.datetime(2024, 1, 1, 1, 0, 0),
            event_type="t", value=100.0)
    ]
    out = stats_mod.ewma_user_score(spark.createDataFrame(rows)).collect()
    # newest event carries weight 2^15 of the 2^16-1 total: just over half
    assert abs(out[0]["ewma_value"] - 100.0 * (1 << 15) / ((1 << 16) - 1)) < 1e-9


# --- triangle census -------------------------------------------------------


def test_triangle_invariants(spark, sf_dir) -> None:
    docs = dedup_op.with_planted_near_dups(
        load_table(spark, sf_dir, "documents")
    )
    row = graph_op.triangle_stats(docs).collect()[0]
    # every triangle contains exactly 3 wedges
    assert 3 * row["n_triangles"] <= row["n_wedges"]
    assert 0.0 <= row["global_clustering"] <= 1.0
    assert row["n_nodes"] <= 2 * row["n_edges"]
    # planted near-dup groups are cliques: expect real triangles
    assert row["n_triangles"] > 0


# --- nDCG ------------------------------------------------------------------


def test_ndcg_bounds_and_idcg_closed_form(spark, sf_dir) -> None:
    k = 10
    idcg_expected = sum(
        (k + 1 - r) * (sim_op.NDCG_LCM // (1 + r)) for r in range(1, k + 1)
    )
    rows = sim_op.ndcg_eval(
        load_table(spark, sf_dir, "embeddings"), [0, 1, 2, 3, 4], k=k
    ).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["idcg_num"] == idcg_expected
        assert 0 <= r["dcg_num"] <= r["idcg_num"]
        assert 0.0 <= r["ndcg"] <= 1.0
        if r["first_hit_rank"] is not None:
            assert r["reciprocal_rank"] == 1.0 / r["first_hit_rank"]
        else:
            assert r["reciprocal_rank"] == 0.0


def test_ndcg_saturates_at_exact_agreement(spark, sf_dir) -> None:
    # a query whose approx list reproduces the exact ranking must score
    # exactly 1.0 (the integer numerators make this an == check, no
    # tolerance), and any missed/misordered neighbor must cost ndcg
    emb = load_table(spark, sf_dir, "embeddings")
    recall = {
        r["query_id"]: r["recall_at_k"]
        for r in sim_op.ann_recall_report(
            emb, [0, 1, 2, 3, 4], k=10, tier="ivf"
        ).collect()
    }
    for r in sim_op.ndcg_eval(emb, [0, 1, 2, 3, 4], k=10).collect():
        if r["dcg_num"] == r["idcg_num"]:
            assert r["ndcg"] == 1.0
        if recall[r["query_id"]] < 1.0:
            # missing any exact-top-k neighbor strictly lowers DCG
            assert r["dcg_num"] < r["idcg_num"]


# --- changelog compaction --------------------------------------------------


def test_changelog_compaction_matches_direct_recompute(spark, sf_dir) -> None:
    events = load_table(spark, sf_dir, "events")
    got = {
        r["user_id"]: r
        for r in merge_op.changelog_compaction(events).collect()
    }
    pdf = events.select(
        "user_id", "ts", "event_id", "event_type", "value"
    ).toPandas()
    pdf = pdf.sort_values(["user_id", "ts", "event_id"])
    seen = 0
    for uid, grp in pdf.groupby("user_id"):
        last = grp.iloc[-1]
        tombs = int((grp["event_type"] == "error").sum())
        if last["event_type"] == "error":
            assert uid not in got
            continue
        seen += 1
        r = got[uid]
        assert r["live_event_id"] == last["event_id"]
        assert r["live_value"] == last["value"]
        assert r["n_versions"] == len(grp)
        assert r["n_tombstones"] == tombs
    assert seen == len(got)


def test_changelog_tombstone_drops_key(spark) -> None:
    import datetime

    t = datetime.datetime(2024, 1, 1)
    rows = [
        Row(event_id=1, user_id=7, ts=t, event_type="view", value=5.0),
        Row(event_id=2, user_id=7,
            ts=t + datetime.timedelta(seconds=1),
            event_type="error", value=0.0),
        Row(event_id=3, user_id=8, ts=t, event_type="error", value=0.0),
        Row(event_id=4, user_id=8,
            ts=t + datetime.timedelta(seconds=1),
            event_type="view", value=9.0),
    ]
    out = {
        r["user_id"]: r
        for r in merge_op.changelog_compaction(
            spark.createDataFrame(rows)
        ).collect()
    }
    assert 7 not in out  # latest is a tombstone
    assert out[8]["live_value"] == 9.0  # resurrected after tombstone
    assert out[8]["n_tombstones"] == 1


# --- MMR -------------------------------------------------------------------


def test_mmr_matches_numpy_greedy(spark, sf_dir) -> None:
    import numpy as np

    emb = load_table(spark, sf_dir, "embeddings")
    got = sorted(
        sim_op.mmr_topk(emb, 0, k=5, candidates=20).collect(),
        key=lambda r: r["selection_rank"],
    )
    pdf = emb.toPandas()
    vecs = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in pdf.itertuples()}
    q = vecs[0]

    def cos(a, b):
        na, nb = np.sqrt(a @ a), np.sqrt(b @ b)
        return -2.0 if na * nb == 0 else float(a @ b) / (na * nb)

    rel = {i: cos(v, q) for i, v in vecs.items() if i != 0}
    cand = sorted(rel, key=lambda i: (-rel[i], i))[:20]
    lam = sim_op.MMR_LAMBDA
    sel: list[int] = []
    for _ in range(5):
        best, best_score = None, None
        for i in cand:
            if i in sel:
                continue
            pen = max((cos(vecs[i], vecs[j]) for j in sel), default=0.0)
            score = lam * rel[i] - (1 - lam) * pen if sel else lam * rel[i]
            if best is None or score > best_score or (
                score == best_score and i < best
            ):
                best, best_score = i, score
        sel.append(best)
    assert [r["vec_id"] for r in got] == sel
    # diversity law: the MMR list must not be a pure relevance sort
    # unless relevance order already is diverse — at minimum ranks are
    # 1..5 with distinct ids and scores finite
    assert [r["selection_rank"] for r in got] == [1, 2, 3, 4, 5]
    assert len({r["vec_id"] for r in got}) == 5


# --- bootstrap CI ------------------------------------------------------------


def test_bootstrap_ci_constant_collapses(spark) -> None:
    rows = [
        Row(event_id=i, event_type="t", value=7.0) for i in range(50)
    ]
    out = stats_mod.bootstrap_ci(spark.createDataFrame(rows)).collect()
    assert len(out) == 1
    r = out[0]
    # every replicate mean of a constant IS the constant: the CI has
    # zero width and sits exactly on the mean
    assert r["mean_value"] == 7.0
    assert r["ci_lo"] == 7.0 and r["ci_hi"] == 7.0
    assert r["n_replicates"] == stats_mod.BOOT_B
    assert r["n"] == 50


def test_bootstrap_ci_brackets_mean(spark, sf_dir) -> None:
    out = stats_mod.bootstrap_ci(load_table(spark, sf_dir, "events")).collect()
    assert out
    for r in out:
        assert r["n_replicates"] == stats_mod.BOOT_B
        assert r["ci_lo"] <= r["ci_hi"]
        assert r["ci_lo"] <= r["mean_value"] <= r["ci_hi"]
        # Rao-Wu rescale keeps the half-widths finite and nonzero on
        # real (non-constant) data
        assert r["ci_hi"] - r["ci_lo"] > 0.0


# --- rolling active users ----------------------------------------------------


def test_rolling_active_users_fixture(spark) -> None:
    from datetime import datetime

    rows = [
        Row(event_id=1, ts=datetime(2024, 3, 1, 8), user_id=1),
        Row(event_id=2, ts=datetime(2024, 3, 1, 9), user_id=2),
        Row(event_id=3, ts=datetime(2024, 3, 6, 9), user_id=2),
    ]
    out = {
        r["day"].date().isoformat(): r
        for r in stats_mod.rolling_active_users(
            spark.createDataFrame(rows)
        ).collect()
    }
    assert sorted(out) == [f"2024-03-0{d}" for d in range(1, 7)]  # gap-free
    assert out["2024-03-01"]["dau"] == 2
    assert all(out[d]["dau"] == 0 for d in ("2024-03-02", "2024-03-05"))
    assert out["2024-03-06"]["dau"] == 1
    # both users stay inside every trailing-7d window of the span
    assert all(out[d]["wau"] == 2 for d in out)


def test_rolling_active_users_laws(spark, sf_dir) -> None:
    rows = stats_mod.rolling_active_users(
        load_table(spark, sf_dir, "events")
    ).collect()
    assert rows
    days = sorted(r["day"] for r in rows)
    # contiguous daily spine
    assert len(days) == (days[-1] - days[0]).days + 1
    by_day = {r["day"]: r for r in rows}
    for d, r in by_day.items():
        assert r["wau"] >= r["dau"]
        window = [
            by_day[x]["dau"] for x in by_day
            if 0 <= (d - x).days <= stats_mod.WAU_WINDOW_DAYS - 1
        ]
        assert r["wau"] <= sum(window)  # distinct <= sum of dailies


# --- kNN label noise ---------------------------------------------------------


def test_knn_label_noise_flags_planted_mislabel(spark) -> None:
    import math

    def vec(axis: int, jitter: int) -> list[float]:
        v = [0.0] * 8
        v[axis] = 1.0
        v[(axis + 4) % 8] = 0.01 * jitter
        n = math.sqrt(sum(x * x for x in v))
        return [x / n for x in v]

    rows = [
        Row(vec_id=i, embedding=vec(0, i), label=0) for i in range(5)
    ] + [
        Row(vec_id=5 + i, embedding=vec(1, i), label=1) for i in range(5)
    ]
    # plant a mislabel: vec 4 lives in cluster 0 but claims label 9
    rows[4] = Row(vec_id=4, embedding=vec(0, 4), label=9)
    out = {
        r["label"]: r
        for r in sim_op.knn_label_noise(
            spark.createDataFrame(rows), k=4, anchor_mod=1
        ).collect()
    }
    # the planted point: all 4 nearest neighbors disagree
    assert out[9]["n_anchors"] == 1
    assert out[9]["mean_noise"] == 1.0
    assert out[9]["n_flagged"] == 1
    # clean cluster-1 anchors: nearest 4 are their own cluster
    assert out[1]["mean_noise"] == 0.0
    assert out[1]["n_flagged"] == 0
    # cluster 0 sees the planted intruder among its neighbors but is
    # never majority-disagreed
    assert out[0]["n_flagged"] == 0
    assert 0.0 < out[0]["mean_noise"] < 0.5


def test_knn_label_noise_bounds(spark, sf_dir) -> None:
    rows = sim_op.knn_label_noise(
        load_table(spark, sf_dir, "embeddings")
    ).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["mean_noise"] <= 1.0
        assert 0 <= r["n_flagged"] <= r["n_anchors"]


# --- tokenizer fertility -----------------------------------------------------


def test_tokenizer_fertility_fixture(spark) -> None:
    from eventstreamd_spark.operators import textops as text_mod

    rows = [
        Row(doc_id=1, text="the cat the cat", lang="en", source="a"),
        Row(doc_id=2, text="dog", lang="en", source="a"),
        Row(doc_id=3, text="xy zz", lang="de", source="b"),
    ]
    out = {
        (r["lang"], r["source"]): r
        for r in text_mod.tokenizer_fertility(
            spark.createDataFrame(rows)
        ).collect()
    }
    en = out[("en", "a")]
    assert en["n_docs"] == 2 and en["n_tokens"] == 5 and en["n_types"] == 3
    assert en["chars_per_token"] == (15 + 3) / 5
    assert en["tokens_per_doc"] == 2.5
    assert en["type_token_ratio"] == 3 / 5
    de = out[("de", "b")]
    assert de["n_tokens"] == 2 and de["n_types"] == 2
    assert de["type_token_ratio"] == 1.0


def test_tokenizer_fertility_laws(spark, sf_dir) -> None:
    from eventstreamd_spark.operators import textops as text_mod

    rows = text_mod.tokenizer_fertility(
        load_table(spark, sf_dir, "documents")
    ).collect()
    assert rows
    for r in rows:
        assert 1 <= r["n_types"] <= r["n_tokens"]
        assert 0.0 < r["type_token_ratio"] <= 1.0
        # tokens are whitespace-delimited: chars/token >= 1 always
        assert r["chars_per_token"] >= 1.0


# --- multi-touch attribution -------------------------------------------------


def test_multi_touch_credits_sum_exactly(spark, sf_dir) -> None:
    from eventstreamd_spark.operators import windows as win_mod

    ev = load_table(spark, sf_dir, "events")
    rows = win_mod.multi_touch_attribution(ev).collect()
    assert rows
    total_credit = sum(r["milli_credit"] for r in rows)
    n_conversions = ev.filter("event_type = 'purchase'").count()
    # the remainder-to-last convention makes credits EXACT: 1000 per
    # conversion, no float drift anywhere
    assert total_credit == 1000 * n_conversions
    assert abs(sum(r["credit_share"] for r in rows) - 1.0) < 1e-12


def test_multi_touch_fixture(spark) -> None:
    from datetime import datetime

    from pyspark.sql import Row

    from eventstreamd_spark.operators import windows as win_mod

    rows = [
        # conversion with 3 prior touches inside the 3-day window:
        # 1000 div 3 = 333 each, remainder 1 to the LAST touch (click t3)
        Row(event_id=1, ts=datetime(2024, 5, 10, 12), user_id=1,
            event_type="purchase"),
        Row(event_id=2, ts=datetime(2024, 5, 10, 9), user_id=1,
            event_type="view"),
        Row(event_id=3, ts=datetime(2024, 5, 10, 10), user_id=1,
            event_type="view"),
        Row(event_id=4, ts=datetime(2024, 5, 10, 11), user_id=1,
            event_type="click"),
        # touch OUTSIDE the lookback: ignored
        Row(event_id=5, ts=datetime(2024, 5, 1, 11), user_id=1,
            event_type="click"),
        # touchless conversion: organic
        Row(event_id=6, ts=datetime(2024, 5, 10, 12), user_id=2,
            event_type="purchase"),
    ]
    out = {
        r["channel"]: r
        for r in win_mod.multi_touch_attribution(
            spark.createDataFrame(rows)
        ).collect()
    }
    assert out["view"]["milli_credit"] == 666
    assert out["click"]["milli_credit"] == 334  # 333 + remainder 1
    assert out["none"]["milli_credit"] == 1000
    assert out["view"]["n_touches"] == 2


# --- Fano burstiness ---------------------------------------------------------


def test_fano_poisson_vs_bursty_fixture(spark) -> None:
    from datetime import datetime

    from pyspark.sql import Row

    rows = []
    eid = 0
    # 'steady': exactly 2 events every day for 10 days -> variance 0
    for d in range(1, 11):
        for _ in range(2):
            eid += 1
            rows.append(Row(event_id=eid, ts=datetime(2024, 3, d, 8),
                            event_type="steady"))
    # 'bursty': all 20 events on one day
    for _ in range(20):
        eid += 1
        rows.append(Row(event_id=eid, ts=datetime(2024, 3, 5, 8),
                        event_type="bursty"))
    out = {
        r["event_type"]: r
        for r in stats_mod.fano_burstiness(
            spark.createDataFrame(rows)
        ).collect()
    }
    assert out["steady"]["fano"] == 0.0 and not out["steady"]["is_bursty"]
    # bursty: n=10, s=20, sc2=400 -> (10*400-400)/(10*20) = 18
    assert out["bursty"]["fano"] == 18.0 and out["bursty"]["is_bursty"]
    assert out["steady"]["mean_daily"] == 2.0


# --- hapax report ------------------------------------------------------------


def test_hapax_fixture(spark) -> None:
    from pyspark.sql import Row

    from eventstreamd_spark.operators import textops as text_mod

    rows = [
        Row(doc_id=1, text="alpha beta alpha", source="a"),
        Row(doc_id=2, text="beta gamma", source="b"),
    ]
    out = {
        r["source"]: r
        for r in text_mod.hapax_report(spark.createDataFrame(rows)).collect()
    }
    # corpus counts: alpha=2, beta=2, gamma=1 -> hapax = {gamma}
    assert out["a"]["n_tokens"] == 3 and out["a"]["n_hapax"] == 0
    assert out["b"]["n_tokens"] == 2 and out["b"]["n_hapax"] == 1
    assert out["b"]["hapax_token_share"] == 0.5
    assert out["b"]["hapax_type_share"] == 0.5
    assert out["a"]["n_types"] == 2


def test_hapax_laws(spark, sf_dir) -> None:
    from eventstreamd_spark.operators import textops as text_mod

    rows = text_mod.hapax_report(
        load_table(spark, sf_dir, "documents")
    ).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_hapax"] <= r["n_types"] <= r["n_tokens"]
        assert 0.0 <= r["hapax_token_share"] <= r["hapax_type_share"] <= 1.0


# --- media corpus manifest ----------------------------------------------------


def test_media_manifest_composition_laws(spark, sf_dir) -> None:
    from eventstreamd_spark.operators import multimodal as mm_mod

    docs = load_table(spark, sf_dir, "documents")
    rows = sorted(
        mm_mod.media_corpus_manifest(docs).collect(),
        key=lambda r: r["doc_id"],
    )
    assert rows
    # gate: every survivor meets the byte floor
    assert all(r["n_bytes"] >= mm_mod.MEDIA_MIN_BYTES for r in rows)
    # dedup: survivors' blobs (text bytes here) are pairwise distinct
    kept_ids = {r["doc_id"] for r in rows}
    texts = {
        r["doc_id"]: r["text"]
        for r in docs.filter(docs.doc_id.isin(list(kept_ids))).collect()
    }
    assert len(set(texts.values())) == len(kept_ids)
    # packing: exclusive prefix sums are consistent and shard-monotone
    acc = 0
    for r in rows:  # doc_id order IS the packing order
        assert r["shard_start_byte"] == acc
        assert r["shard_id"] == acc // 16_384
        acc += r["n_bytes"]
    # modality column matches the fixture dispatch
    mt = {0: "image/png", 1: "audio/wav", 2: "video/mp4"}
    assert all(r["media_type"] == mt[r["doc_id"] % 3] for r in rows)


# --- partition/order invariance (the 100 TB safety claim, asserted) ----------


def test_round6_tier_invariant_under_partitioning(spark, sf_dir) -> None:
    """Every round-6 operator must produce IDENTICAL rows regardless of
    partitioning — the property that makes hash-derived weights and
    exact integer/decimal aggregation safe on any cluster layout.
    (Float-accumulating designs fail exactly this test.)"""
    from eventstreamd_spark.operators import (
        linalg as la,
        multimodal as mm_mod,
        sketches as sk,
        textops as text_mod,
        windows as win_mod,
    )

    ev = load_table(spark, sf_dir, "events")
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")

    cases = [
        (stats_mod.bootstrap_ci, ev, "user_id"),
        (stats_mod.rolling_active_users, ev, "user_id"),
        (stats_mod.fano_burstiness, ev, "event_type"),
        (sk.rolling_wau_hll, ev, "user_id"),
        (win_mod.multi_touch_attribution, ev, "event_type"),
        (text_mod.tokenizer_fertility, docs, "lang"),
        (text_mod.hapax_report, docs, "source"),
        (la.centroid_shift, emb, "label"),
        (mm_mod.media_corpus_manifest, docs, "source"),
        (sim_op.knn_label_noise, emb, "label"),
    ]
    for fn, df, skew_col in cases:
        base = sorted(tuple(r) for r in fn(df.repartition(1)).collect())
        redist = sorted(
            tuple(r) for r in fn(df.repartition(7, skew_col)).collect()
        )
        assert base == redist, fn.__name__
        assert base, fn.__name__


# --- incremental IVF add -------------------------------------------------------


def test_ivf_incremental_add_conservation(spark, sf_dir) -> None:
    ev = load_table(spark, sf_dir, "embeddings")
    rows = sim_op.ivf_incremental_add(ev).collect()
    assert rows
    n_total = ev.count()
    # every vector lands in exactly one cell, batch + base partition it
    assert sum(r["total_after"] for r in rows) == n_total
    n_batch = ev.filter("vec_id % 7 = 3 AND vec_id >= 16").count()
    assert sum(r["n_added"] for r in rows) == n_batch
    for r in rows:
        assert 0.0 <= r["frac_added"] < 1.0  # existing cells never empty
        assert r["total_after"] == r["n_existing"] + r["n_added"]


def test_ivf_incremental_add_agrees_with_full_assignment(spark, sf_dir) -> None:
    """Frozen-centroid invariant: assigning the batch incrementally
    must give every batch vector the SAME cell a full ivf_cells pass
    would (centroids are the first 16 corpus vectors in both)."""
    ev = load_table(spark, sf_dir, "embeddings")
    full = {
        r["vec_id"]: r["cell_id"] for r in sim_op.ivf_cells(ev).collect()
    }
    per_cell_added: dict[int, int] = {}
    for vid, cell in full.items():
        if vid % 7 == 3 and vid >= 16:
            per_cell_added[cell] = per_cell_added.get(cell, 0) + 1
    report = {
        r["cell_id"]: r["n_added"]
        for r in sim_op.ivf_incremental_add(ev).collect()
    }
    for cell, n in per_cell_added.items():
        assert report[cell] == n


# --- user diversity -----------------------------------------------------------


def test_user_diversity_fixture_and_bounds(spark, sf_dir) -> None:
    from datetime import datetime

    rows = [
        # monomaniac: 4 identical events -> diversity exactly 0
        Row(event_id=1, user_id=1, event_type="click", ts=datetime(2024, 1, 1)),
        Row(event_id=2, user_id=1, event_type="click", ts=datetime(2024, 1, 1)),
        Row(event_id=3, user_id=1, event_type="click", ts=datetime(2024, 1, 1)),
        Row(event_id=4, user_id=1, event_type="click", ts=datetime(2024, 1, 1)),
        # uniform over 2 types -> 1 - 2*(1/2)^2 = 0.5 exactly
        Row(event_id=5, user_id=2, event_type="click", ts=datetime(2024, 1, 1)),
        Row(event_id=6, user_id=2, event_type="view", ts=datetime(2024, 1, 1)),
    ]
    out = {
        r["user_id"]: r
        for r in stats_mod.user_diversity(spark.createDataFrame(rows)).collect()
    }
    assert out[1]["diversity"] == 0.0 and out[1]["n_types"] == 1
    assert out[2]["diversity"] == 0.5 and out[2]["n_types"] == 2
    # real data: bounds + the analytic max 1 - 1/n_types
    real = stats_mod.user_diversity(load_table(spark, sf_dir, "events")).collect()
    assert real
    for r in real:
        assert 0.0 <= r["diversity"] <= 1.0 - 1.0 / r["n_types"] + 1e-12


# --- session stats -------------------------------------------------------------


def test_session_stats_fixture(spark) -> None:
    from datetime import datetime

    from eventstreamd_spark.operators import windows as win_mod

    rows = [
        # user 1: one 3-event session (gaps < 30 min), duration 600 s
        Row(event_id=1, user_id=1, ts=datetime(2024, 1, 1, 10, 0)),
        Row(event_id=2, user_id=1, ts=datetime(2024, 1, 1, 10, 5)),
        Row(event_id=3, user_id=1, ts=datetime(2024, 1, 1, 10, 10)),
        # user 1 again after a 2 h gap: a bounce (single event)
        Row(event_id=4, user_id=1, ts=datetime(2024, 1, 1, 12, 30)),
        # user 2: a single bounce
        Row(event_id=5, user_id=2, ts=datetime(2024, 1, 1, 9, 0)),
    ]
    out = win_mod.session_stats(spark.createDataFrame(rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_sessions"] == 3
    assert r["bounce_rate"] == 2 / 3
    assert r["mean_events"] == 5 / 3
    assert r["p50_events"] == 1  # lengths {3,1,1}: median 1
    assert r["mean_duration_s"] == 200.0  # (600 + 0 + 0) / 3


def test_session_stats_consistent_with_sessionize(spark, sf_dir) -> None:
    from eventstreamd_spark.operators import windows as win_mod

    ev = load_table(spark, sf_dir, "events")
    sessions = win_mod.sessionize(ev).collect()
    r = win_mod.session_stats(ev).collect()[0]
    assert r["n_sessions"] == len(sessions)
    lens = sorted(s["n_events"] for s in sessions)
    assert r["bounce_rate"] == sum(1 for x in lens if x == 1) / len(lens)
    # nearest-rank median
    import math

    assert r["p50_events"] == lens[math.ceil(len(lens) / 2) - 1]
