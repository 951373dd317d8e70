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


def main() -> None:
    spark = get_spark("bit-balance")
    docs = dd.with_planted_near_dups(load_table(spark, SF, "documents"))
    sig = dd.simhash_signatures(docs).localCheckpoint()
    n = sig.count()

    # per-bit set frequencies, one aggregate pass
    aggs = []
    for j in range(32):
        aggs.append(
            F.sum(
                (F.col("sig_lo").bitwiseAND(F.lit(1 << j)) > 0).cast("long")
            ).alias(f"lo{j}")
        )
        aggs.append(
            F.sum(
                (F.col("sig_hi").bitwiseAND(F.lit(1 << j)) > 0).cast("long")
            ).alias(f"hi{j}")
        )
    row = sig.agg(*aggs).collect()[0]
    # global bit order matches simhash64: bit k<32 -> lo, k>=32 -> hi
    p = [row[f"lo{j}"] / n for j in range(32)] + [
        row[f"hi{j}"] / n for j in range(32)
    ]

    def band_bits(b: int) -> list[int]:
        # _simhash_band_chunks layout: bands 0-1 slice lo, 2-3 slice hi
        base = (0 if b < 2 else 32) + (b % 2) * 16
        return list(range(base, base + 16))

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
            str(b): inflation(band_bits(b)) for b in range(4)
        },
        "pair_band_inflation": {},
        "empirical_16bit": empirical(dd.simhash_band_stack(sig), 16),
        "empirical_32bit_pairs": empirical(
            dd.simhash_pair_band_stack(sig), 32
        ),
    }
    k = 0
    for i in range(4):
        for j in range(i + 1, 4):
            report["pair_band_inflation"][f"{k}({i}|{j})"] = inflation(
                band_bits(i) + band_bits(j)
            )
            k += 1

    with open(OUT, "w") as f:
        json.dump(report, f, indent=1, sort_keys=True)

    print(f"n={n}  bit freq in [{min(p):.3f}, {max(p):.3f}]")
    print("| band | model inflation | empirical pairs | x nominal | max bucket |")
    print("|---|---|---|---|---|")
    emp = report["empirical_16bit"]["bands"]
    for b in range(4):
        e = emp[str(b)]
        print(
            f"| {b} (16-bit) | {report['single_band_inflation'][str(b)]:.2f}x "
            f"| {e['candidate_pairs']:,} | {e['x_nominal']:.1f}x "
            f"| {e['max_bucket']} |"
        )
    empw = report["empirical_32bit_pairs"]["bands"]
    for key, infl in report["pair_band_inflation"].items():
        b = key.split("(")[0]
        e = empw[b]
        print(
            f"| {key} (32-bit pair) | {infl:.2f}x | {e['candidate_pairs']:,} "
            f"| {e['x_nominal']:.1f}x | {e['max_bucket']} |"
        )
    print(f"\nwrote {OUT}")


if __name__ == "__main__":
    main()
