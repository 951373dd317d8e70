"""Sketch tier: mergeability laws + structural guarantees.

The value-level equivalence is the DuckDB oracle gate; these tests pin
the properties that make sketches usable at 100 TB — partial sketches
built on disjoint halves of the data must merge to exactly the
whole-corpus sketch (that's what lets map-side partials replace a
corpus-wide shuffle), and the one-sided error guarantees must hold.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from eventstreamd_spark.operators import sketches as sk
from eventstreamd_spark.session import load_table


def _halves(events):
    a = events.filter(F.col("event_id").cast("string").substr(-1, 1).isin(
        ["0", "1", "2", "3", "4"]
    ))
    b = events.subtract(a)
    return a, b


def test_kmv_bottom_k_merges(spark, sf_dir) -> None:
    """bottom-k(A ∪ B) == bottom-k(bottom-k(A) ∪ bottom-k(B))."""
    events = load_table(spark, sf_dir, "events")
    a, b = _halves(events)

    def bottom(df):
        h = sk._h60(F.col("event_id").cast("string")).alias("h")
        return df.select(h).distinct().orderBy("h").limit(sk.KMV_K)

    whole = {r["h"] for r in bottom(events).collect()}
    merged_rows = bottom(a).unionAll(bottom(b)).distinct().orderBy("h").limit(sk.KMV_K)
    merged = {r["h"] for r in merged_rows.collect()}
    assert whole == merged


def test_kmv_batching_invariance(spark, sf_dir) -> None:
    """The mapInPandas partial sketch gives the same kth hash under
    different partitionings (set semantics, not batch semantics)."""
    events = load_table(spark, sf_dir, "events")
    one = sk.kmv_distinct_events(events.repartition(1)).collect()[0]
    many = sk.kmv_distinct_events(events.repartition(7)).collect()[0]
    assert one["kth_hash"] == many["kth_hash"]
    assert one["kmv_estimate"] == many["kmv_estimate"]


def test_hll_registers_merge_by_max(spark, sf_dir) -> None:
    """registers(A ∪ B) == element-wise max(registers(A), registers(B))."""
    events = load_table(spark, sf_dir, "events")
    a, b = _halves(events)

    def regs(df):
        h = sk._h60(F.col("event_id").cast("string")).alias("h")
        hh = df.select(h)
        buck = F.expr(f"shiftright(h, {sk._REM_BITS})")
        rem = F.expr(f"h % CAST({1 << sk._REM_BITS} AS BIGINT)")
        rho = F.when(rem == 0, F.lit(sk._REM_BITS + 1)).otherwise(
            F.lit(sk._REM_BITS + 1) - F.length(F.bin(rem))
        )
        rows = (
            hh.select(buck.alias("bucket"), rho.alias("rho"))
            .groupBy("bucket")
            .agg(F.max("rho").alias("m_rho"))
            .collect()
        )
        return {r["bucket"]: r["m_rho"] for r in rows}

    ra, rb, rw = regs(a), regs(b), regs(events)
    merged = dict(ra)
    for k, v in rb.items():
        merged[k] = max(merged.get(k, 0), v)
    assert merged == rw


def test_hll_estimate_within_bound(spark, sf_dir) -> None:
    row = sk.hll_distinct_events(load_table(spark, sf_dir, "events")).collect()[0]
    assert row["within_bound"] is True
    assert row["n_zero_registers"] >= 0
    # sanity: estimate in the right ballpark of the exact count
    assert 0.5 * row["n_exact"] <= row["hll_estimate"] <= 2.0 * row["n_exact"]


def test_cms_never_undercounts_and_merges(spark, sf_dir) -> None:
    events = load_table(spark, sf_dir, "events")
    rows = sk.cms_heavy_hitters(events).collect()
    assert rows, "expected candidates"
    for r in rows:
        assert r["cms_estimate"] >= r["n_exact"]
        assert r["never_undercounts"] is True

    # cell-wise additivity: sketch(A) + sketch(B) == sketch(A ∪ B)
    a, b = _halves(events)

    def cells(df):
        out = {}
        for i in range(sk.CMS_DEPTH):
            col = (
                sk._h60(F.concat(F.lit(f"{i}:"), F.col("user_id").cast("string")))
                % sk.CMS_WIDTH
            )
            for r in (
                df.select(col.alias("col"))
                .groupBy("col")
                .agg(F.count("*").alias("n"))
                .collect()
            ):
                out[(i, r["col"])] = out.get((i, r["col"]), 0) + r["n"]
        return out

    ca, cb, cw = cells(a), cells(b), cells(events)
    merged = dict(ca)
    for k, v in cb.items():
        merged[k] = merged.get(k, 0) + v
    assert merged == cw


def test_bloom_no_false_negatives(spark, sf_dir) -> None:
    row = sk.bloom_join_prune(
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "orders"),
    ).collect()[0]
    assert row["no_false_negatives"] is True
    assert row["n_pass_bloom"] >= row["n_true_match"]
    assert row["n_false_positive"] == row["n_pass_bloom"] - row["n_true_match"]
    assert 0.0 <= row["fp_rate"] < 1.0


def test_bloom_probe_broadcasts_bits(spark, sf_dir) -> None:
    """The probe-side plan must broadcast the bit table (the whole
    point: no shuffle of the fact side for the pre-filter)."""
    plan = sk.bloom_join_prune(
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "orders"),
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_zorder_skipping_beats_single_key_layout(spark, sf_dir) -> None:
    """The Z layout must prune on BOTH dimensions; the x-sorted layout
    prunes only on x.  Zone-map soundness: scanned rows ⊇ matching."""
    from eventstreamd_spark.operators import layout

    rows = {
        (r["layout"], r["dim"]): r
        for r in layout.zorder_skipping_report(
            load_table(spark, sf_dir, "lineitem")
        ).collect()
    }
    assert rows[("xsort", "y")]["scan_fraction"] == 1.0
    assert rows[("zorder", "y")]["scan_fraction"] < 0.5
    assert rows[("zorder", "x")]["scan_fraction"] < 0.5
    for r in rows.values():
        assert r["rows_scanned"] >= r["rows_matching"]


def test_ivm_merge_is_slice_invariant(spark, sf_dir) -> None:
    """Maintaining the view through ANY slicing of the input merges to
    the same state as one-shot aggregation — the associativity that
    makes O(delta) refresh sound."""
    from eventstreamd_spark.operators import merge as mg

    orders = load_table(spark, sf_dir, "orders")
    whole = {
        r["o_orderpriority"]: (r["n_orders"], r["total_revenue"], r["max_price"])
        for r in mg.ivm_priority_revenue(orders).collect()
    }
    # a different cutoff slices base/delta differently; merged state
    # must be identical
    other = {
        r["o_orderpriority"]: (r["n_orders"], r["total_revenue"], r["max_price"])
        for r in mg.ivm_priority_revenue(orders, cutoff="1995-06-15").collect()
    }
    assert whole == other


def test_kmv_join_size_estimates(spark, sf_dir) -> None:
    row = sk.kmv_join_size(
        load_table(spark, sf_dir, "orders")
    ).collect()[0]
    assert row["within_bound"] is True
    assert 0 <= row["n_both"] <= row["n_below"]
    assert row["n_intersect_exact"] <= row["n_union_exact"]


def test_expectations_clean_table_passes(spark, sf_dir) -> None:
    from eventstreamd_spark.operators import expectations as ex

    rows = {
        r["constraint_name"]: r
        for r in ex.expectations_report(
            load_table(spark, sf_dir, "lineitem"),
            load_table(spark, sf_dir, "orders"),
        ).collect()
    }
    assert len(rows) == 7
    li = load_table(spark, sf_dir, "lineitem")
    expected_dups = li.count() - li.select("l_orderkey", "l_linenumber").distinct().count()
    # the synthetic fixture ships duplicate line keys; the report must
    # say so honestly, and every row-local constraint must pass
    assert rows["unique_line_key"]["n_violations"] == expected_dups
    for name in (
        "not_null_returnflag", "range_quantity", "range_discount",
        "domain_returnflag", "positive_extendedprice", "fk_orderkey",
    ):
        assert rows[name]["passed"] is True, name
        assert rows[name]["n_violations"] == 0


def test_expectations_counts_planted_violations(spark, sf_dir) -> None:
    """Corrupt a copy of the table in known ways; every constraint must
    count exactly its planted violations."""
    from eventstreamd_spark.operators import expectations as ex

    li = load_table(spark, sf_dir, "lineitem")
    bad = (
        li.limit(5)
        .withColumn("l_quantity", F.lit(999.0))       # 5 range_quantity
        .withColumn("l_returnflag", F.lit("Z"))       # 5 domain_returnflag
        .withColumn("l_orderkey", F.lit(-1).cast("long"))  # 5 fk orphans
    )
    corrupted = li.unionByName(bad)
    n_dup = (
        corrupted.count()
        - corrupted.select("l_orderkey", "l_linenumber").distinct().count()
    )
    rows = {
        r["constraint_name"]: r
        for r in ex.expectations_report(
            corrupted, load_table(spark, sf_dir, "orders")
        ).collect()
    }
    assert rows["range_quantity"]["n_violations"] == 5
    assert rows["domain_returnflag"]["n_violations"] == 5
    assert rows["fk_orderkey"]["n_violations"] == 5
    assert rows["unique_line_key"]["n_violations"] == n_dup
    assert rows["range_discount"]["passed"] is True


def test_late_data_audit_monotone_in_delay(spark, sf_dir) -> None:
    """A more tolerant watermark can only drop FEWER events; an
    infinite delay drops none."""
    from eventstreamd_spark.operators import windows as w

    ev = load_table(spark, sf_dir, "events")

    def total_late(delay_us):
        return (
            w.late_data_audit(ev, delay_us=delay_us)
            .agg(F.sum("n_late").alias("s"))
            .collect()[0]["s"]
        )

    strict, default, infinite = (
        total_late(0),
        total_late(w.LATE_DELAY_US),
        total_late(10**15),
    )
    assert strict >= default >= infinite == 0
    assert strict > 0  # the jitter model actually produces lateness


def test_attribution_conserves_conversions(spark, sf_dir) -> None:
    """Every conversion is attributed exactly once (channel totals sum
    to the purchase count) and lags are non-negative."""
    from eventstreamd_spark.operators import windows as w

    ev = load_table(spark, sf_dir, "events")
    rows = w.last_touch_attribution(ev).collect()
    n_purchases = ev.filter(F.col("event_type") == w.ATTR_CONVERSION).count()
    assert sum(r["n_conversions"] for r in rows) == n_purchases
    for r in rows:
        if r["channel"] != "none":
            assert r["sum_lag_us"] >= 0
            assert r["avg_seconds_to_convert"] >= 0.0
        else:
            assert r["sum_lag_us"] is None


def test_hll_by_type_matches_per_group_estimates(spark, sf_dir) -> None:
    """Each group's estimate must equal the single-set HLL computed on
    that group alone — group sketches are independent."""
    from eventstreamd_spark.operators.sketches import (
        hll_distinct_by_type, hll_estimate_from_registers, hll_registers,
    )

    ev = load_table(spark, sf_dir, "events")
    rows = {r["event_type"]: r for r in hll_distinct_by_type(ev).collect()}
    assert rows
    for etype, r in rows.items():
        regs = {
            x["bucket"]: x["m_rho"]
            for x in hll_registers(
                ev.filter(F.col("event_type") == etype),
                F.col("user_id").cast("string"),
            ).collect()
        }
        assert r["hll_estimate"] == hll_estimate_from_registers(regs)
        assert r["within_bound"] is True


def test_percentile_rank_matches_sorted_definition(spark, sf_dir) -> None:
    """The shuffle-free CDF formulation must equal the textbook
    percent_rank computed by actually sorting (on the small fixture)."""
    from eventstreamd_spark.operators.statistics import percentile_rank_features

    docs = load_table(spark, sf_dir, "documents")
    got = {
        r["doc_id"]: (r["below"], r["pct_rank"])
        for r in percentile_rank_features(docs).collect()
    }
    vals = sorted(r["n_chars"] for r in docs.select("n_chars").collect())
    n = len(vals)
    import bisect

    for r in docs.select("doc_id", "n_chars").collect():
        below = bisect.bisect_left(vals, r["n_chars"])
        assert got[r["doc_id"]] == (below, below / (n - 1))


def test_snapshot_diff_partitions_every_row(spark, sf_dir) -> None:
    """added+removed+changed+unchanged must cover |v1 ∪ v2| exactly,
    and column change counts only appear under 'changed'."""
    from eventstreamd_spark.operators import merge as mg

    orders = load_table(spark, sf_dir, "orders")
    v1, v2 = mg._diff_versions(orders)
    rows = {r["row_status"]: r for r in mg.snapshot_diff(orders).collect()}
    n_union = (
        v1.select("o_orderkey").union(v2.select("o_orderkey")).distinct().count()
    )
    assert sum(r["n_rows"] for r in rows.values()) == n_union
    for st, r in rows.items():
        if st != "changed":
            assert r["n_price_changed"] == 0 and r["n_status_changed"] == 0
    assert rows["changed"]["n_price_changed"] > 0
    assert rows["added"]["n_rows"] > 0 and rows["removed"]["n_rows"] > 0


def test_contingency_profile_marginals(spark, sf_dir) -> None:
    """Observed cells must sum to row/col totals and N; contributions
    are non-negative; expected sums back to N per row dimension."""
    from eventstreamd_spark.operators.statistics import contingency_profile

    rows = contingency_profile(load_table(spark, sf_dir, "lineitem")).collect()
    n = rows[0]["n"]
    assert sum(r["o"] for r in rows) == n
    by_flag: dict = {}
    for r in rows:
        assert r["chi2_contribution"] >= 0.0
        by_flag.setdefault(r["l_returnflag"], 0)
        by_flag[r["l_returnflag"]] += r["o"]
    for r in rows:
        assert by_flag[r["l_returnflag"]] == r["r"]


def test_event_rate_anomalies_flag_planted_spike(spark, sf_dir) -> None:
    """A planted burst minute must surface with a large positive z."""
    from eventstreamd_spark.operators.statistics import event_rate_anomalies

    ev = load_table(spark, sf_dir, "events").select("event_type", "ts")
    burst_ts = "2024-01-15 12:00:30"
    burst = (
        spark.range(50)
        .select(
            F.lit("click").alias("event_type"),
            F.lit(burst_ts).cast("timestamp").alias("ts"),
        )
    )
    out = event_rate_anomalies(ev.unionByName(burst)).collect()
    spikes = [
        r for r in out
        if r["event_type"] == "click" and r["c"] >= 50 and r["z_score"] > 3
    ]
    assert spikes, "planted 50-event minute not flagged"


def test_compression_signal_orders_redundancy(spark, sf_dir) -> None:
    """Planted repetitive text must compress far better than natural
    text; ratios live in (0, ~1.2]; deterministic across repartition."""
    from eventstreamd_spark.operators.textops import compression_ratio_signal

    docs = load_table(spark, sf_dir, "documents")
    planted = docs.limit(3).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(F.lit("spam spam "), F.expr("repeat('buy now! ', 200)")).alias(
            "text"
        ),
    )
    base = docs.select("doc_id", "text").unionByName(planted)
    rows = {r["doc_id"]: r for r in compression_ratio_signal(base).collect()}
    nat = [r["compression_ratio"] for k, r in rows.items() if k < 1000000]
    rep = [r["compression_ratio"] for k, r in rows.items() if k >= 1000000]
    assert rep and nat
    assert max(rep) < min(nat) * 0.5  # repetition compresses much harder
    for r in rows.values():
        assert 0.0 < r["compression_ratio"] <= 1.5
        assert r["n_compressed_bytes"] > 0
    # determinism under different partitionings
    again = {
        r["doc_id"]: r["compression_ratio"]
        for r in compression_ratio_signal(base.repartition(7)).collect()
    }
    assert again == {k: r["compression_ratio"] for k, r in rows.items()}


def test_kmv_unsaturated_sketch_reports_exact(spark, sf_dir) -> None:
    """Fewer distinct keys than k: the sketch holds the whole set and
    must report it exactly, not extrapolate."""
    ev = load_table(spark, sf_dir, "events").limit(40)
    row = sk.kmv_distinct_events(ev).collect()[0]
    assert row["k_kept"] == row["n_exact"] <= 40
    assert row["kmv_estimate"] == float(row["n_exact"])
    assert row["within_bound"] is True


def test_compression_signal_null_and_empty_text(spark) -> None:
    from eventstreamd_spark.operators.textops import compression_ratio_signal

    df = spark.createDataFrame(
        [(1, "hello world hello world"), (2, None), (3, "")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in compression_ratio_signal(df).collect()}
    assert rows[2]["n_raw_bytes"] is None
    assert rows[2]["compression_ratio"] is None
    assert rows[3]["n_raw_bytes"] == 0
    assert rows[3]["compression_ratio"] is None
    assert rows[1]["compression_ratio"] > 0


def test_ivf_index_serving_matches_in_memory(spark, sf_dir, tmp_path) -> None:
    """The persisted-index serving path must return the same neighbors
    as the in-memory ivf_topk, and its candidate scan must be
    partition-pruned to the probed cells only."""
    from eventstreamd_spark.operators import similarity as sim

    emb = load_table(spark, sf_dir, "embeddings")
    path = str(tmp_path / "ivf_index")
    sim.write_ivf_index(emb, path)

    qids = [40, 41, 42]
    queries = [
        (r["vec_id"], list(r["embedding"]))
        for r in emb.filter(F.col("vec_id").isin(qids)).collect()
    ]
    served = sim.ivf_index_topk(spark, path, queries)
    expected = sim.ivf_topk(emb, qids)
    s_rows = sorted(tuple(r) for r in served.collect())
    e_rows = sorted(tuple(r) for r in expected.collect())
    assert s_rows == e_rows

    plan = served._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell_id" in plan
    # the probed-cell filter must actually reach the scan
    assert "cell_id IN" in plan or "cell_id#" in plan


def test_cms_sketch_agg_combines_map_side(spark, sf_dir) -> None:
    """The d x w shuffle-volume cap (SCALE.md: cms a=0.71) rests on the
    explode collapsing INSIDE its stage: the sketch aggregate must have
    a partial phase below the exchange, so each task ships at most
    depth x width partial rows, never one row per event."""
    from eventstreamd_spark.plans import explain_string

    events = load_table(spark, sf_dir, "events")
    cells = sk.cms_cells(events, F.col("user_id").cast("string"))
    phys = explain_string(cells, "formatted")
    # partial aggregate exists and sits below the exchange (formatted
    # mode numbers operators leaf-to-root: partial_count's HashAggregate
    # must appear before Exchange in the tree dump)
    assert "partial_count" in phys
    lines = phys.split("\n\n")[0].splitlines()
    ex_line = next(i for i, ln in enumerate(lines) if "Exchange" in ln)
    # root-first dump: a HashAggregate BELOW the Exchange line is the
    # map-side partial (the final agg sits above it)
    assert any(
        "HashAggregate" in ln for ln in lines[ex_line + 1 :]
    ), "no partial aggregate below the exchange"
    # and the Generate (explode) feeds that partial in the SAME stage
    assert any("Generate" in ln for ln in lines[ex_line + 1 :])


def test_cms_state_merge_all_cells_exact(spark, sf_dir) -> None:
    """Value-level: every merged cell equals the union-sketch cell (the
    streaming monitor's fold arithmetic, oracle-pinned in the registry;
    asserted here too so the property fails fast in pytest)."""
    events = load_table(spark, sf_dir, "events")
    out = sk.cms_state_merge(events)
    assert out.filter(~F.col("merge_exact")).count() == 0
    # the merged state is the full d x w-bounded table, nothing dropped
    assert out.count() == out.select("i", "col").distinct().count()


# --- rolling WAU via merged HLL registers ------------------------------------


def test_rolling_wau_hll_matches_window_semantics(spark, sf_dir) -> None:
    from eventstreamd_spark.operators import sketches as sk
    from eventstreamd_spark.operators import statistics as st
    from eventstreamd_spark.session import load_table

    ev = load_table(spark, sf_dir, "events")
    hll = {r["day"]: r for r in sk.rolling_wau_hll(ev).collect()}
    exact = {
        r["day"]: r for r in st.rolling_active_users(ev).collect()
    }
    assert set(hll) == set(exact)  # same spine
    for d, r in hll.items():
        # the eval column IS the exact tier's wau
        assert r["wau_exact"] == exact[d]["wau"]
        assert r["within_bound"]
        assert r["wau_est"] > 0.0


def test_rolling_wau_hll_registers_merge_monotonically(spark, sf_dir) -> None:
    # widening the window can only grow the sketch estimate: merged
    # registers are element-wise max, so s_total shrinks and est grows
    from eventstreamd_spark.operators import sketches as sk
    from eventstreamd_spark.session import load_table

    ev = load_table(spark, sf_dir, "events")
    w1 = {r["day"]: r["wau_est"] for r in sk.rolling_wau_hll(ev, 1).collect()}
    w7 = {r["day"]: r["wau_est"] for r in sk.rolling_wau_hll(ev, 7).collect()}
    for d in w1:
        assert w7[d] >= w1[d]


def test_rolling_wau_hll_shuffle_is_register_bounded(spark, sf_dir) -> None:
    # the corpus-side aggregate must keep map-side partials on
    # (day, bucket) — the cap that makes this the 100 TB tier — and the
    # spine must broadcast
    from eventstreamd_spark.operators import sketches as sk
    from eventstreamd_spark.plans import explain_string
    from eventstreamd_spark.session import load_table

    plan = explain_string(
        sk.rolling_wau_hll(load_table(spark, sf_dir, "events")), "extended"
    ).split("== Physical Plan ==")[-1]
    assert "partial_max" in plan
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


# --- ANALYZE sketch tier -------------------------------------------------------


def test_column_stats_hll_matches_exact_counts(spark, sf_dir) -> None:
    from eventstreamd_spark.operators import statistics as st
    from eventstreamd_spark.session import load_table

    li = load_table(spark, sf_dir, "lineitem")
    exact = {
        r["column_name"]: r
        for r in st.column_stats_catalog(li).collect()
    }
    sketch = {
        r["column_name"]: r
        for r in st.column_stats_catalog_hll(li).collect()
    }
    assert set(sketch) == set(st._CATALOG_KINDS)
    for c, r in sketch.items():
        # count columns must agree exactly with the Expand tier
        assert r["n_nonnull"] == exact[c]["n_nonnull"]
        assert r["n_null"] == exact[c]["n_null"]
        assert r["ndv_exact"] == exact[c]["ndv"]
        assert r["within_bound"]
        assert r["ndv_hll"] > 0.0


# --- sketch-only production twins --------------------------------------------


def test_prod_twins_match_eval_siblings_exactly(spark, sf_dir) -> None:
    """The registered production twins drop the exact leg but must keep
    the IDENTICAL deterministic register arithmetic: every sketch
    column equals the eval-column sibling's, row for row.  This is the
    bridge that lets the accuracy bound live on the sibling while the
    twin ships sketch-only plans."""
    from eventstreamd_spark.operators import statistics as st

    ev = load_table(spark, sf_dir, "events")
    li = load_table(spark, sf_dir, "lineitem")

    a = sk.hll_distinct_events(ev).collect()[0]
    b = sk.hll_distinct_events_prod(ev).collect()[0]
    assert (a["register_sum_scaled"], a["hll_estimate"]) == (
        b["register_sum_scaled"], b["hll_estimate"]
    )

    sib = {r["event_type"]: r for r in sk.hll_distinct_by_type(ev).collect()}
    twin = {r["event_type"]: r for r in sk.hll_distinct_by_type_prod(ev).collect()}
    assert set(sib) == set(twin)
    for k in sib:
        assert sib[k]["hll_estimate"] == twin[k]["hll_estimate"]
        assert sib[k]["within_bound"]  # bound stays asserted via sibling

    sibw = {r["day"]: r for r in sk.rolling_wau_hll(ev).collect()}
    twinw = {r["day"]: r for r in sk.rolling_wau_hll_prod(ev).collect()}
    assert set(sibw) == set(twinw)
    for d in sibw:
        assert sibw[d]["register_sum_scaled"] == twinw[d]["register_sum_scaled"]
        assert sibw[d]["wau_est"] == twinw[d]["wau_est"]
        assert sibw[d]["within_bound"]

    sibc = {r["column_name"]: r for r in st.column_stats_catalog_hll(li).collect()}
    twinc = {
        r["column_name"]: r
        for r in st.column_stats_catalog_hll_prod(li).collect()
    }
    assert set(sibc) == set(twinc)
    for c in sibc:
        assert sibc[c]["ndv_hll"] == twinc[c]["ndv_hll"]
        assert sibc[c]["n_nonnull"] == twinc[c]["n_nonnull"]
        assert sibc[c]["within_bound"]


def test_kmv_prod_twins_match_eval_siblings_exactly(spark, sf_dir) -> None:
    from eventstreamd_spark.session import load_table as lt

    ev = lt(spark, sf_dir, "events")
    od = lt(spark, sf_dir, "orders")

    a = sk.kmv_distinct_events(ev).collect()[0]
    b = sk.kmv_distinct_events_prod(ev).collect()[0]
    assert (a["k_kept"], a["kth_hash"], a["kmv_estimate"]) == (
        b["k_kept"], b["kth_hash"], b["kmv_estimate"]
    )
    assert a["within_bound"]  # the bound stays pinned via the sibling

    c = sk.kmv_join_size(od).collect()[0]
    d = sk.kmv_join_size_prod(od).collect()[0]
    for col in ("theta", "n_below", "n_both", "union_estimate",
                "intersect_estimate"):
        assert c[col] == d[col], col
    assert c["within_bound"]


# --- log-bucket quantile sketch ----------------------------------------------


def test_logbucket_quantiles_envelope_contains_exact(spark, sf_dir) -> None:
    """Every sketched quantile's [lb, ub] envelope must contain the
    EXACT nearest-rank value (same ceil(frac*n) rank definition), and
    the envelope must honor the 2^-QSK_M relative-width guarantee —
    the two properties that make the sketch a usable percentile at
    100 TB without ever re-reading the corpus."""
    from eventstreamd_spark.operators import statistics as st

    li = load_table(spark, sf_dir, "lineitem")
    out = {r["frac"]: r for r in sk.logbucket_quantiles(li).collect()}
    cents = li.select(
        F.round(F.col("l_extendedprice") * 100.0, 0).cast("long").alias("v")
    )
    exact = {
        r["frac"]: r["value"]
        for r in st.exact_quantile_values(
            cents, "v", fracs=tuple(sorted(out))
        ).collect()
    }
    assert set(out) == set(exact)
    for f, r in out.items():
        assert r["lb_cents"] <= exact[f] <= r["ub_cents"], f
        # width bound: ub - lb + 1 = 2^shift and lb >= 2^QSK_M * 2^shift
        assert (r["ub_cents"] - r["lb_cents"] + 1) * (1 << sk.QSK_M) <= max(
            r["lb_cents"], 1 << sk.QSK_M
        ), f
        assert r["est_price"] == r["lb_cents"] / 100.0


def test_logbucket_registers_merge_additively(spark, sf_dir) -> None:
    """Partial sketches on disjoint halves must merge (count-add) to
    exactly the whole-corpus register table, with identical per-bucket
    [lb, ub] envelopes — the property that lets map-side partials
    replace a corpus shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    full = {
        r["bucket"]: (r["lb"], r["ub"], r["c"])
        for r in sk.logbucket_registers(li).collect()
    }
    merged: dict = {}
    for half in ("l_orderkey % 2 = 0", "l_orderkey % 2 = 1"):
        for r in sk.logbucket_registers(li.filter(half)).collect():
            lb, ub, c = merged.get(r["bucket"], (r["lb"], r["ub"], 0))
            assert (lb, ub) == (r["lb"], r["ub"])  # envelope is key-determined
            merged[r["bucket"]] = (lb, ub, c + r["c"])
    assert merged == full


def test_logbucket_sketch_agg_combines_map_side(spark, sf_dir) -> None:
    """The KB shuffle cap rests on the register aggregate having a
    partial phase below the exchange — each task ships at most
    64 x 2^(QSK_M+1) bucket rows, never one row per lineitem."""
    from eventstreamd_spark.plans import explain_string

    li = load_table(spark, sf_dir, "lineitem")
    phys = explain_string(sk.logbucket_registers(li), "formatted")
    assert "partial_count" in phys
    lines = phys.split("\n\n")[0].splitlines()
    ex_line = next(i for i, ln in enumerate(lines) if "Exchange" in ln)
    assert any(
        "HashAggregate" in ln for ln in lines[ex_line + 1 :]
    ), "no partial aggregate below the exchange"


def test_logbucket_grouped_quantiles_envelope(spark, sf_dir) -> None:
    """Per-group placement: every group's sketched rank envelope must
    contain that group's exact nearest-rank value (driver-side sort is
    fine at fixture scale; the operator itself never sorts)."""
    import collections

    li = load_table(spark, sf_dir, "lineitem")
    rows = sk.logbucket_quantiles_by_group(li).collect()
    vals: dict = collections.defaultdict(list)
    for r in li.select(
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100.0, 0)
        .cast("long")
        .alias("v"),
    ).collect():
        vals[r["l_returnflag"]].append(r["v"])
    for v in vals.values():
        v.sort()
    assert {r["l_returnflag"] for r in rows} == set(vals)
    assert len(rows) == len(vals) * len(sk.QSK_FRACS)
    for r in rows:
        exact = vals[r["l_returnflag"]][r["rank"] - 1]
        assert r["lb_cents"] <= exact <= r["ub_cents"], (
            r["l_returnflag"],
            r["frac"],
        )


def test_column_quantiles_catalog_envelopes(spark, sf_dir) -> None:
    """ANALYZE quantile catalog: every column's sketched rank envelope
    must contain that column's exact nearest-rank scaled value,
    including the zero-heavy discount/tax columns (v=0 rides the exact
    small-value path)."""
    import collections

    li = load_table(spark, sf_dir, "lineitem")
    rows = sk.column_quantiles_catalog(li).collect()
    vals: dict = collections.defaultdict(list)
    for c in sk.QCAT_COLS:
        for r in li.select(
            F.round(F.col(c) * 100.0, 0).cast("long").alias("v")
        ).collect():
            vals[c].append(r["v"])
    for v in vals.values():
        v.sort()
    assert {r["column"] for r in rows} == set(sk.QCAT_COLS)
    assert len(rows) == len(sk.QCAT_COLS) * len(sk.QSK_FRACS)
    for r in rows:
        exact = vals[r["column"]][r["rank"] - 1]
        assert r["lb_scaled"] <= exact <= r["ub_scaled"], (
            r["column"],
            r["frac"],
        )
        assert r["est_value"] == r["lb_scaled"] / 100.0


def test_logbucket_weighted_quantiles_envelope(spark, sf_dir) -> None:
    """Weighted placement: each sketched rank envelope must contain the
    exact WEIGHTED nearest-rank value — the smallest scaled price whose
    cumulative quantity reaches ceil(frac * total_quantity)."""
    import math

    li = load_table(spark, sf_dir, "lineitem")
    rows = sk.logbucket_quantiles(li, weight=F.col("l_quantity")).collect()
    pairs = sorted(
        (r["v"], r["w"])
        for r in li.select(
            F.round(F.col("l_extendedprice") * 100.0, 0)
            .cast("long")
            .alias("v"),
            F.col("l_quantity").cast("long").alias("w"),
        ).collect()
    )
    total = sum(w for _, w in pairs)
    assert len(rows) == len(sk.QSK_FRACS)
    for r in rows:
        rk = math.ceil(r["frac"] * total)
        assert r["rank"] == rk
        cum = 0
        for v, w in pairs:
            cum += w
            if cum >= rk:
                exact = v
                break
        assert r["lb_cents"] <= exact <= r["ub_cents"], r["frac"]
