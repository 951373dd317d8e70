#!/usr/bin/env python
"""Bit-balance audit for the 64-bit text SimHash tier (round 11 — the
audit the audio zbits skew proved necessary, SCALE.md §21: "any
LSH-banded signature needs its bit balance AUDITED, not assumed").

A band of width w only delivers its nominal 2^-w random-collision rate
when every bit is ~balanced across the corpus: a bit set with
probability p contributes (p^2 + q^2) >= 1/2 to the band's random
pair-collision probability, so the band's INFLATION over nominal is

    inflation(band) = prod_{j in band} (p_j^2 + q_j^2) / 2^-w

(independence-approximate; the empirical bucket-occupancy term below
needs no independence assumption and is the number that actually
bills).  The audio tier's p~1/3 zbits inflated 16-bit collisions ~5x
and surfaced only at sf10 (a10 = 1.22); this audit makes the same
defect visible at sf0.1 in seconds.

Reports, for the 4 single bands and 6 pair bands:
  - per-bit frequency extremes,
  - the independence-model inflation factor,
  - EMPIRICAL expected random collisions per band: sum_b C(n_b, 2)
    over observed bucket occupancies, vs the nominal n^2/2^(w+1)
    (the direct-count methodology of SCALE.md §21).

Writes tools/BIT_BALANCE.json and prints a markdown table.
Run ALONE (no concurrent Spark) — same rule as bench.py.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from eventstreamd_spark.session import get_spark, load_table  # noqa: E402
from eventstreamd_spark.operators import dedup as dd  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(REPO, "tools", "BIT_BALANCE.json")


def _text_sig(spark):
    docs = dd.with_planted_near_dups(load_table(spark, SF, "documents"))
    sig = dd.simhash_signatures(docs)
    return sig, ("sig_lo", "sig_hi"), dd.simhash_band_stack, dd.simhash_pair_band_stack


def _media_sig(spark, kind: str):
    """The 4-word (a, d) media signatures — image/audio/video/mixed —
    via the real decode kernels over the cached fixture.  Bit order:
    a_lo, a_hi, d_lo, d_hi (matches band_stack's a0..a3/d0..d3)."""
    from eventstreamd_spark.operators import audio as au
    from eventstreamd_spark.operators import mixed as mx
    from eventstreamd_spark.operators import multimodal as mm
    from eventstreamd_spark.operators import perceptual as pc
    from eventstreamd_spark.operators import video as vd

    kernel, fixture = {
        "image": (pc.perceptual_hashes, "scene_image"),
        "audio": (au.audio_fingerprints, "scene_audio"),
        "video": (vd.video_fingerprints, "scene_video"),
        "mixed": (mx.mixed_media_fingerprints, "scene_mixed"),
    }[kind]
    media = mm.cached_media(spark, SF, fixture)
    sig = kernel(media)
    return sig, ("a_lo", "a_hi", "d_lo", "d_hi"), pc.band_stack, pc.pair_band_stack


def main() -> None:
    import sys

    tier = sys.argv[sys.argv.index("--tier") + 1] if "--tier" in sys.argv else "text"
    spark = get_spark("bit-balance")
    if tier == "text":
        sig, half_cols, stack_fn, pair_stack_fn = _text_sig(spark)
    else:
        sig, half_cols, stack_fn, pair_stack_fn = _media_sig(spark, tier)
    sig = sig.localCheckpoint()
    n = sig.count()

    # per-bit set frequencies, one aggregate pass; global bit k =
    # 32 * half_index + j (half_cols arrive in (w_lo, w_hi, ...) order)
    aggs = [
        F.sum((F.col(c).bitwiseAND(F.lit(1 << j)) > 0).cast("long")).alias(
            f"b{32 * i + j}"
        )
        for i, c in enumerate(half_cols)
        for j in range(32)
    ]
    row = sig.agg(*aggs).collect()[0]
    nbits = 32 * len(half_cols)
    p = [row[f"b{k}"] / n for k in range(nbits)]

    # band definitions matching each stack's actual band naming:
    # per 64-bit word, 4 x 16-bit bands (k<2 from lo, k>=2 from hi)
    n_words = len(half_cols) // 2
    defs = []
    for w in range(n_words):
        kind = half_cols[2 * w].split("_")[0]
        for k in range(4):
            src = 2 * w + (0 if k < 2 else 1)
            base = 32 * src + (k % 2) * 16
            name = k if n_words == 1 else f"{kind}{k}"
            defs.append((name, list(range(base, base + 16))))
    pair_defs = []
    k = 0
    for i in range(len(defs)):
        for j in range(i + 1, len(defs)):
            name = k if n_words == 1 else f"{defs[i][0]}|{defs[j][0]}"
            pair_defs.append((name, defs[i][1] + defs[j][1]))
            k += 1

    def inflation(bits: list[int]) -> float:
        prob = 1.0
        for j in bits:
            pj = p[j]
            prob *= pj * pj + (1 - pj) * (1 - pj)
        return prob * (2 ** len(bits))

    # empirical random-collision mass per band tier: bucket occupancies
    def empirical(stacked, width: int) -> dict:
        occ = (
            stacked.groupBy("band", "bhash")
            .agg(F.count("*").alias("c"))
            .groupBy("band")
            .agg(
                F.sum(F.col("c") * (F.col("c") - 1) / 2).alias("pairs"),
                F.max("c").alias("max_bucket"),
            )
            .collect()
        )
        nominal = n * (n - 1) / 2 / (2**width)
        return {
            "nominal_random_pairs_per_band": nominal,
            "bands": {
                str(r["band"]): {
                    "candidate_pairs": int(r["pairs"]),
                    "max_bucket": int(r["max_bucket"]),
                    "x_nominal": (r["pairs"] / nominal) if nominal else None,
                }
                for r in occ
            },
        }

    report = {
        "tier": tier,
        "sf_dir": SF,
        "n_docs": n,
        "bit_freq_min": min(p),
        "bit_freq_max": max(p),
        "worst_bits": sorted(
            ((j, round(pj, 4)) for j, pj in enumerate(p)),
            key=lambda t: abs(t[1] - 0.5),
            reverse=True,
        )[:8],
        "single_band_inflation": {
            str(name): inflation(bits) for name, bits in defs
        },
        "pair_band_inflation": {
            str(name): inflation(bits) for name, bits in pair_defs
        },
        "empirical_16bit": empirical(stack_fn(sig), 16),
        "empirical_32bit_pairs": empirical(pair_stack_fn(sig), 32),
    }

    out = OUT if tier == "text" else OUT.replace(".json", f"_{tier}.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1, sort_keys=True)

    print(f"tier={tier}  n={n}  bit freq in [{min(p):.3f}, {max(p):.3f}]")
    print("| band | model inflation | empirical pairs | x nominal | max bucket |")
    print("|---|---|---|---|---|")
    emp = report["empirical_16bit"]["bands"]
    for name, _bits in defs:
        e = emp[str(name)]
        print(
            f"| {name} (16-bit) "
            f"| {report['single_band_inflation'][str(name)]:.2f}x "
            f"| {e['candidate_pairs']:,} | {e['x_nominal']:.1f}x "
            f"| {e['max_bucket']} |"
        )
    empw = report["empirical_32bit_pairs"]["bands"]
    for name, _bits in pair_defs:
        e = empw[str(name)]
        print(
            f"| {name} (32-bit pair) "
            f"| {report['pair_band_inflation'][str(name)]:.2f}x "
            f"| {e['candidate_pairs']:,} | {e['x_nominal']:.1f}x "
            f"| {e['max_bucket']} |"
        )
    print(f"\nwrote {out}")


if __name__ == "__main__":
    main()
