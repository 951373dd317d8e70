"""Minimal pure-stdlib RIFF/WAVE PCM codec (16-bit little-endian).

The audio sibling of functions/png.py: real container parsing with no
external codec dependency, so the multimodal decode stage can extract
true sample statistics from ``audio/wav`` payloads instead of the
byte-histogram fallback.  Scope is deliberately the WAV that training
corpora actually carry: canonical RIFF layout, PCM format 1, 16-bit
samples; anything else raises ValueError and the caller falls back.

Reference parity: srittau/eventstreamd has no media surface (SURVEY.md
§0); this is layer-B scope (multimodal columns in the north star).
"""

from __future__ import annotations

import struct


def encode_wav(
    sample_rate: int, channels: int, samples: list[int]
) -> bytes:
    """16-bit PCM samples (interleaved if multi-channel) -> WAV bytes."""
    data = struct.pack(f"<{len(samples)}h", *samples)
    byte_rate = sample_rate * channels * 2
    block_align = channels * 2
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, byte_rate, block_align, 16
    )
    body = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav_pcm(blob: bytes) -> tuple[int, int, int, bytes]:
    """WAV bytes -> (sample_rate, channels, bits, raw PCM data chunk).

    Walks RIFF chunks (word-aligned, unknown chunks skipped), requires
    PCM format 1 at 16 bits; raises ValueError on anything else.  The
    data chunk comes back as BYTES so hot Arrow kernels can
    ``np.frombuffer`` it zero-copy instead of materializing a Python
    int list per blob — at 500k blobs/run the per-sample PyObject
    churn was the dominant (and GC-noisy) cost of the audio
    fingerprint stage (SCALE.md §20)."""
    if len(blob) < 12 or blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt_body = data_body = None
    while pos + 8 <= len(blob):
        cid = blob[pos : pos + 4]
        (clen,) = struct.unpack("<I", blob[pos + 4 : pos + 8])
        body = blob[pos + 8 : pos + 8 + clen]
        if len(body) != clen:
            raise ValueError("truncated chunk")
        if cid == b"fmt ":
            fmt_body = body
        elif cid == b"data":
            data_body = body
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if fmt_body is None or data_body is None:
        raise ValueError("missing fmt/data chunk")
    if len(fmt_body) < 16:
        raise ValueError("short fmt chunk")
    audio_format, channels, sample_rate, _, _, bits = struct.unpack(
        "<HHIIHH", fmt_body[:16]
    )
    if audio_format != 1 or bits != 16:
        raise ValueError("only 16-bit PCM supported")
    n = len(data_body) // 2
    return sample_rate, channels, bits, data_body[: n * 2]


def decode_wav(blob: bytes) -> tuple[int, int, int, list[int]]:
    """WAV bytes -> (sample_rate, channels, bits, samples) — the
    list-of-ints convenience face over ``decode_wav_pcm``."""
    sample_rate, channels, bits, data = decode_wav_pcm(blob)
    samples = list(struct.unpack(f"<{len(data) // 2}h", data))
    return sample_rate, channels, bits, samples
