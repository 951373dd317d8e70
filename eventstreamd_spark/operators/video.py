"""Video perceptual fingerprint (round-9): exact digests catch
byte-identical MP4s; a RE-ENCODED, RESIZED or FRAME-RATE-RESAMPLED
video twin escapes them by construction.  The cheap standard fix
mirrors the audio tier — an integer sign-of-luminance-envelope
fingerprint over fixed RELATIVE time positions — but the per-position
"energy" here is the pixel sum of a REAL decoded frame, located
through REAL ISO-BMFF sample tables:

- parse the MP4 for real (functions/mp4.py: moov/trak/mdia/minf/stbl
  walk; stsz sizes + stsc runs + stco offsets locate every sample in
  mdat — the public-spec layout of a Motion-JPEG/PNG-per-frame file);
- decode each sampled frame for real (functions/image.py magic-byte
  dispatch into the in-repo PNG inflate/unfilter or baseline-JPEG
  huffman/dequant/IDCT decoders);
- luminance envelope: 64 fixed RELATIVE time positions, position t
  reads frame ``(t*F)//64`` — exact for any frame count F that 64
  divides or is divided by, which is what makes the fingerprint
  FRAME-RATE invariant (a rate-doubled twin shows the same relative
  timeline); E(t) = integer sum of every decoded sample byte of that
  frame, so RESOLUTION and channel count scale E uniformly and cancel
  out of the cross-multiplied compares (resize invariance);
- **eBit(t)** = ``64 * E(t) >= E_total`` — frame brighter than the
  video mean, division-free;
- **dBit(t)** = ``E(t) > E((t+1) % 64)`` — the temporal luminance
  gradient sign, wrap keeps it 64 bits;
- the two words travel as the shared (a_hi, a_lo, d_hi, d_lo)
  signature schema, so candidates + verify REUSE
  ``perceptual.banded_pairs`` (4x16-bit bands, pigeonhole recall,
  combined-Hamming verify, opt-in hot-bucket guard) and the streaming
  admission kernel accepts ``video_fingerprints`` as its ``sig_fn``.

Scale shape at 100 TB: per-video work is one Arrow kernel decoding F
frames (the object-store fetch + decode stage every video pipeline
pays anyway); everything after is 5 BIGINTs/doc — identical to the
image/audio tiers, no all-pairs stage.

Fixture: ``documents_as_scene_video`` renders one REAL MP4 per
document from a closed-form 64-value video "scene" (the shared
avalanche-verified mix, keyed disjointly via ``VIDEO_SCENE_OFFSET``):
frame f shows a flat image whose byte value is scene cell
``(f*64)//F`` — flat frames are the one shape BOTH codecs round-trip
bit-exactly at any size (PNG always; JPEG because a constant block is
DC-only under the all-ones quant).  Cohorts of 4 share a scene:
member 0 renders 64 frames of 8x8 grayscale PNG, member 1 renders 64
frames of 64x64 single-channel baseline JPEG (a true CROSS-CODEC
RESIZED twin), member 2 renders 128 frames of 8x8 PNG with ONE scene
cell xor-perturbed (a FRAME-RATE-DOUBLED re-encode-noise twin),
member 3 gets a fresh-scene video (negative control).  The DuckDB
oracle reuses the image/audio tiers' scene CTE verbatim
(``perceptual._sql_scene_hashes`` with ``neighbor='linear'`` for the
time axis) — the envelope bits over flat-frame sums ARE the scene
bits — while Spark runs the full real pipeline (PNG/JPEG encode ->
mdat + sample tables -> stbl walk -> per-frame decode -> envelope ->
band join -> verify).

Reference parity note: the reference (srittau/eventstreamd) has no
media surface; this operator is part of the layer-B training-data
pipeline mandated by the build brief.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, functions as F

from eventstreamd_spark.operators.perceptual import (
    HAMMING_MAX,
    HASH_SCHEMA,
    N_CELLS,
    PERTURB_XOR,
    _scene_value,
    banded_pairs,
    sql_banded_pairs_tail,
)
from eventstreamd_spark.operators.perceptual import (
    _sql_scene_hashes as _sql_scene,
)
from eventstreamd_spark.session import fan_out

VIDEO_SCENE_OFFSET = 1 << 21  # keys video scenes disjointly (image: 0+,
#                               audio: 1<<20+) — same convention
N_POSITIONS = N_CELLS  # 64 relative time positions = the scene cell count
COHORT = 4
MEMBER_FRAMES = (64, 64, 128, 64)  # member 2 = frame-rate-doubled twin
MEMBER_SIZES = (8, 64, 8, 8)  # member 1 = resized cross-codec twin
JPEG_MEMBER = 1


def _video_scene(doc_id: int) -> tuple[int, int, int, bool]:
    """(scene key, n_frames, frame size, perturbed?) for a doc."""
    m = doc_id % COHORT
    s = VIDEO_SCENE_OFFSET + 2 * (doc_id // COHORT) + (1 if m == 3 else 0)
    return s, MEMBER_FRAMES[m], MEMBER_SIZES[m], m == 2


def _synth_scene_mp4(doc_id: int) -> bytes:
    """Render the document's video scene as a REAL MP4: flat frames
    (PNG or all-ones-quant JPEG by member) indexed by real sample
    tables; frame f shows scene cell (f*64)//F."""
    from eventstreamd_spark.functions.jpeg import encode_jpeg
    from eventstreamd_spark.functions.mp4 import encode_video_mp4
    from eventstreamd_spark.functions.png import encode_png

    s, n_frames, size, perturbed = _video_scene(doc_id)
    pcell = s % N_POSITIONS
    vals = []
    for cell in range(N_POSITIONS):
        v = _scene_value(s, cell)
        if perturbed and cell == pcell:
            v ^= PERTURB_XOR
        vals.append(v)
    jpeg = doc_id % COHORT == JPEG_MEMBER
    # one render per DISTINCT cell value, reused across frames
    rendered: dict[int, bytes] = {}
    frames = []
    for f in range(n_frames):
        v = vals[(f * N_POSITIONS) // n_frames]
        if v not in rendered:
            flat = bytes([v]) * (size * size)
            rendered[v] = (
                encode_jpeg(size, size, 1, flat, quant_luma=[1] * 64)
                if jpeg
                else encode_png(size, size, 1, flat)
            )
        frames.append(rendered[v])
    return encode_video_mp4(
        size, size, frames, fourcc=b"mjpa" if jpeg else b"png ",
        frame_duration=600 // (n_frames // 8),
    )


def documents_as_scene_video(docs: DataFrame) -> DataFrame:
    """Adapter: one scene-rendered MP4 per document (the object-store
    fetch stage stand-in, like the image/audio adapters)."""
    from eventstreamd_spark.operators.multimodal import _synth_media_adapter

    return _synth_media_adapter(docs, _synth_scene_mp4, F.lit("video/mp4"))


def _envelope_fingerprint(blob: bytes) -> tuple[int, int, int, int]:
    """(a_hi, a_lo, d_hi, d_lo) from a decoded video: stbl walk ->
    per-frame image decode -> pixel sums -> 64 relative-position
    envelope bits.  Pure integer; frame count and resolution cancel
    out of both compares (invariance contract in the module doc)."""
    from eventstreamd_spark.functions.image import decode_image
    from eventstreamd_spark.functions.mp4 import decode_mp4_samples

    _w, _h, _fc, samples = decode_mp4_samples(blob)
    n_frames = len(samples)
    # sum of decoded sample bytes, computed once per frame then read
    # per position (positions >= frames when F divides 64)
    sums = [None] * n_frames
    energy = []
    for t in range(N_POSITIONS):
        f = (t * n_frames) // N_POSITIONS
        if sums[f] is None:
            _, _, _, px = decode_image(samples[f])
            sums[f] = sum(px)
        energy.append(sums[f])
    total = sum(energy)
    ebits = [N_POSITIONS * e >= total for e in energy]
    dbits = [
        energy[t] > energy[(t + 1) % N_POSITIONS]
        for t in range(N_POSITIONS)
    ]

    def pack(bits) -> tuple[int, int]:
        lo = hi = 0
        for k in range(32):
            lo |= int(bits[k]) << k
            hi |= int(bits[32 + k]) << k
        return hi, lo

    e_hi, e_lo = pack(ebits)
    d_hi, d_lo = pack(dbits)
    return e_hi, e_lo, d_hi, d_lo


def video_fingerprints(media: DataFrame) -> DataFrame:
    """Per-video envelope fingerprint in the shared signature schema —
    fan_out before the Arrow kernel (the decode is the per-row cost),
    project to (doc_id, blob) first (nothing prunes through the
    mapInPandas barrier)."""
    import pandas as pd

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            prints = [_envelope_fingerprint(bytes(b)) for b in pdf["blob"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "a_hi": pd.Series([p[0] for p in prints], dtype="int64"),
                    "a_lo": pd.Series([p[1] for p in prints], dtype="int64"),
                    "d_hi": pd.Series([p[2] for p in prints], dtype="int64"),
                    "d_lo": pd.Series([p[3] for p in prints], dtype="int64"),
                }
            )

    return fan_out(media.select("doc_id", "blob")).mapInPandas(
        kernel, schema=HASH_SCHEMA
    )


def video_near_dup(
    media: DataFrame, hamming_max: int = HAMMING_MAX
) -> DataFrame:
    """Video near-dup pairs: the MP4 mirror of ``media_near_dup`` /
    ``audio_near_dup`` — the shared Hamming-banded tier over envelope
    fingerprints catches the planted RESIZED cross-codec twin and the
    FRAME-RATE-DOUBLED twin at Hamming 0, and the re-encode-noise twin
    within the verify threshold; recall semantics as documented on
    ``perceptual.media_near_dup``.  Decode-once: signatures are
    localCheckpoint'ed before the banded self-join — the per-frame
    decode is by far the dominant cost here (F frames per blob), so
    the lineage re-run would double an already-heavy kernel."""
    return banded_pairs(video_fingerprints(media).localCheckpoint(), hamming_max)


# ---------------------------------------------------------------------------
# DuckDB oracles — flat frames make the envelope bits THE scene bits,
# so the image/audio tiers' scene CTE is reused verbatim
# ---------------------------------------------------------------------------


def sql_video_fingerprints(table: str = "documents") -> str:
    return f"""
WITH {_sql_scene(table, s_offset=VIDEO_SCENE_OFFSET, neighbor="linear")}
SELECT doc_id, a_hi, a_lo, d_hi, d_lo FROM sig
"""


def sql_video_near_dup(
    table: str = "documents", hamming_max: int = HAMMING_MAX
) -> str:
    return f"""
WITH {_sql_scene(table, s_offset=VIDEO_SCENE_OFFSET, neighbor="linear")},
{sql_banded_pairs_tail(hamming_max)}
"""
