"""Audio perceptual fingerprint (round-9, VERDICT ask #3): exact
digests (``multimodal.media_dedup``) catch byte-identical WAV; a
RESAMPLED or re-encoded audio twin escapes them by construction.  The
standard cheap fix mirrors what aHash/dHash did for images — an
integer sign-of-band-energy fingerprint (the chromaprint shape, no
FFT, no floats) over fixed relative time windows, followed by the
SAME Hamming-banded candidate tier as ``perceptual.media_near_dup``:

- decode the WAV for REAL (functions/wav.py: RIFF walk, 16-bit PCM);
- energy envelope: 64 fixed RELATIVE windows with integer edges
  ``gi = (i*64)//n`` — exact for any sample count, which is what
  makes the fingerprint SAMPLE-RATE invariant (a resampled twin has
  the same envelope over relative time);
- **eBit(k)** = ``E(k) * n_total >= E_total * n(k)`` — window energy
  above the global mean, cross-multiplied so no division happens
  (E(k) = sum of |sample| in window k, all integers);
- **dBit(k)** = ``E(k) * n(k+1) > E(k+1) * n(k)`` — the energy-delta
  sign between adjacent windows, wrap at 64 keeps it 64 bits;
- the two 64-bit words travel as the same (a_hi, a_lo, d_hi, d_lo)
  signature schema as the image tier, so candidate generation +
  verify REUSE ``perceptual.banded_pairs`` (4x16-bit bands,
  pigeonhole recall guarantee, combined-Hamming verify) and the SQL
  twin reuses ``perceptual.sql_banded_pairs_tail``.

Scale shape at 100 TB: identical to the image tier — one Arrow decode
kernel per blob, 5 BIGINTs/doc after it, banded equi-join, O(1)
verify, no all-pairs stage.

Fixture: ``documents_as_scene_audio`` renders one REAL WAV per
document from a closed-form 64-value audio "scene" (the image tier's
avalanche-verified mix, keyed disjointly via ``AUDIO_SCENE_OFFSET``):
window k holds a square wave of amplitude ``64 * scene(k)``, so
|sample| is constant per window and E(k) recovers the scene exactly
at ANY sample count that is a multiple of 64.  Cohorts of 4 share a
scene: member 0 renders 1024 samples @ 8 kHz, member 1 renders 2048
samples @ 16 kHz (a true RESAMPLED duplicate — same duration, double
rate), member 2 renders 4096 samples with ONE window xor-perturbed
(re-encode noise), member 3 gets a fresh scene (negative control).
The DuckDB oracle states fingerprints, banding, and the pair set
purely arithmetically (the shared scene CTE with ``neighbor='linear'``
for the time axis) while Spark runs the full real pipeline (WAV
encode -> decode -> envelope -> fingerprint -> band join -> verify).

Reference parity note: the reference (srittau/eventstreamd) has no
media surface; this operator is layer-B training-data-pipeline scope.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, functions as F

from eventstreamd_spark.operators.perceptual import (
    COHORT,
    HAMMING_MAX,
    HASH_SCHEMA,
    N_CELLS,
    PERTURB_XOR,
    _scene_value,
    _sql_scene_hashes,
    banded_pairs,
    sql_banded_pairs_tail,
)
from eventstreamd_spark.session import fan_out

AUDIO_SCENE_OFFSET = 1 << 20  # keys audio scenes disjointly from image scenes
N_WINDOWS = N_CELLS  # 64 relative time windows = the scene cell count
AMP_SCALE = 64  # scene byte -> square-wave amplitude (max 16320 < 2^15)
MEMBER_SAMPLES = (1024, 2048, 4096, 1024)  # all multiples of N_WINDOWS
MEMBER_RATES = (8000, 16000, 8000, 8000)  # member 1 = resampled twin
RESAMPLED_MEMBER = 1


def _audio_scene(doc_id: int) -> tuple[int, int, int, bool]:
    """(scene key, n_samples, sample_rate, perturbed?) for a doc."""
    m = doc_id % COHORT
    s = AUDIO_SCENE_OFFSET + 2 * (doc_id // COHORT) + (1 if m == 3 else 0)
    return s, MEMBER_SAMPLES[m], MEMBER_RATES[m], m == 2


def _synth_scene_wav(doc_id: int) -> bytes:
    """Render the document's audio scene as a REAL 16-bit PCM WAV at
    its member length/rate: sample i belongs to window (i*64)//n and
    alternates +/- its window amplitude (zero-DC square wave)."""
    from eventstreamd_spark.functions.wav import encode_wav

    s, n, rate, perturbed = _audio_scene(doc_id)
    pcell = s % N_WINDOWS
    amps = []
    for k in range(N_WINDOWS):
        v = _scene_value(s, k)
        if perturbed and k == pcell:
            v ^= PERTURB_XOR
        amps.append(v * AMP_SCALE)
    samples = [
        amps[(i * N_WINDOWS) // n] * (1 if i % 2 == 0 else -1)
        for i in range(n)
    ]
    return encode_wav(rate, 1, samples)


def documents_as_scene_audio(docs: DataFrame) -> DataFrame:
    """Adapter: one scene-rendered WAV per document (stands in for the
    object-store fetch stage, like the other media adapters)."""
    from eventstreamd_spark.operators.multimodal import _synth_media_adapter

    return _synth_media_adapter(docs, _synth_scene_wav, F.lit("audio/wav"))


def _envelope_fingerprint(blob: bytes) -> tuple[int, int, int, int]:
    """(e_hi, e_lo, d_hi, d_lo) from a decoded WAV — pure integer
    pipeline; works for ANY sample count >= 64 (integer window
    edges).  Overflow note: E <= 2^15 * n and the cross-multiplies
    add another factor n, so int64 holds for n up to ~10^7 samples
    per blob (hours of mono 16-bit audio)."""
    import numpy as np

    from eventstreamd_spark.functions.wav import decode_wav

    _rate, _channels, _bits, samples = decode_wav(blob)
    arr = np.abs(np.asarray(samples, dtype=np.int64))
    n = arr.shape[0]
    gi = (np.arange(n, dtype=np.int64) * N_WINDOWS) // n
    E = np.zeros(N_WINDOWS, dtype=np.int64)
    np.add.at(E, gi, arr)
    cnt = np.bincount(gi, minlength=N_WINDOWS).astype(np.int64)
    ebits = E * cnt.sum() >= E.sum() * cnt
    En, cn = np.roll(E, -1), np.roll(cnt, -1)
    dbits = E * cn > En * cnt

    def pack(bits) -> tuple[int, int]:
        lo = hi = 0
        for k in range(32):
            lo |= int(bits[k]) << k
            hi |= int(bits[32 + k]) << k
        return hi, lo

    e_hi, e_lo = pack(ebits)
    d_hi, d_lo = pack(dbits)
    return e_hi, e_lo, d_hi, d_lo


def audio_fingerprints(media: DataFrame) -> DataFrame:
    """Per-blob envelope fingerprint in the shared signature schema
    (the energy word rides the a_* columns) — decode is the per-row
    cost, so fan_out before the Arrow kernel and project to
    (doc_id, blob) first (nothing prunes through mapInPandas)."""
    import pandas as pd

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            fps = [_envelope_fingerprint(bytes(b)) for b in pdf["blob"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "a_hi": pd.Series([t[0] for t in fps], dtype="int64"),
                    "a_lo": pd.Series([t[1] for t in fps], dtype="int64"),
                    "d_hi": pd.Series([t[2] for t in fps], dtype="int64"),
                    "d_lo": pd.Series([t[3] for t in fps], dtype="int64"),
                }
            )

    return fan_out(media.select("doc_id", "blob")).mapInPandas(
        kernel, schema=HASH_SCHEMA
    )


def audio_near_dup(
    media: DataFrame, hamming_max: int = HAMMING_MAX
) -> DataFrame:
    """Banded audio near-dup pairs — the WAV mirror of
    ``media_near_dup``: same banding, same pigeonhole recall
    guarantee (combined Hamming <= 7 / per-word <= 3), same verify;
    only the signature kernel differs.  Catches the resampled twin
    (member 1: Hamming 0 at a different sample rate) and the
    re-encode-noise twin (member 2: one window perturbed flips <= 2
    delta bits + <= 1 energy bit) that ``media_dedup`` misses.
    Decode-once: signatures are localCheckpoint'ed before the banded
    self-join (see ``perceptual.media_near_dup``)."""
    return banded_pairs(audio_fingerprints(media).localCheckpoint(), hamming_max)


# ---------------------------------------------------------------------------
# DuckDB oracles — scene arithmetic (never WAV bytes); the envelope's
# uniform window sizes cancel out of both cross-multiplied compares,
# so the oracle bits are the scene bits with the LINEAR neighbor.
# ---------------------------------------------------------------------------


def sql_audio_fingerprints(table: str = "documents") -> str:
    return f"""
WITH {_sql_scene_hashes(table, s_offset=AUDIO_SCENE_OFFSET, neighbor="linear")}
SELECT doc_id, a_hi, a_lo, d_hi, d_lo FROM sig
"""


def sql_audio_near_dup(
    table: str = "documents", hamming_max: int = HAMMING_MAX
) -> str:
    return f"""
WITH {_sql_scene_hashes(table, s_offset=AUDIO_SCENE_OFFSET, neighbor="linear")},
{sql_banded_pairs_tail(hamming_max)}
"""
