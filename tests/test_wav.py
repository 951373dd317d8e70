"""Pure-stdlib RIFF/WAVE PCM codec + the multimodal decode dispatch."""

from __future__ import annotations

import struct

import pytest

from eventstreamd_spark.functions.wav import decode_wav, encode_wav
from eventstreamd_spark.operators.multimodal import (
    _decode,
    _fake_decode,
    _synth_wav,
    _wav_decode,
)


def test_roundtrip_identity() -> None:
    samples = [0, 1, -1, 32767, -32768, 1234, -4321]
    blob = encode_wav(44100, 1, samples)
    rate, ch, bits, out = decode_wav(blob)
    assert (rate, ch, bits) == (44100, 1, 16)
    assert out == samples


def test_chunk_walk_skips_unknown_and_pads_odd() -> None:
    """LIST chunk with odd length before fmt/data must be skipped with
    word alignment — the part naive parsers get wrong."""
    base = encode_wav(8000, 1, [5, -5])
    # splice an odd-length junk chunk right after the WAVE tag
    junk = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"  # pad byte
    blob = base[:12] + junk + base[12:]
    blob = blob[:4] + struct.pack("<I", len(blob) - 8) + blob[8:]
    rate, ch, bits, out = decode_wav(blob)
    assert out == [5, -5]


def test_rejects_non_pcm() -> None:
    blob = bytearray(encode_wav(8000, 1, [1, 2]))
    # flip audio_format to 3 (IEEE float) inside the fmt chunk
    fmt_off = blob.index(b"fmt ") + 8
    blob[fmt_off : fmt_off + 2] = struct.pack("<H", 3)
    with pytest.raises(ValueError):
        decode_wav(bytes(blob))


def test_dispatch_falls_back_on_corrupt_riff() -> None:
    corrupt = b"RIFF\x00\x00\x00\x00WAVEgarbage"
    assert _decode(corrupt) == _fake_decode(corrupt)


def test_synth_wav_stats_closed_form() -> None:
    doc_id = 13
    f = _wav_decode(_synth_wav(doc_id))
    n = 64 + doc_id % 33
    samples = [((doc_id * 131 + i * 17) % 4096) - 2048 for i in range(n)]
    assert f[0] == 8000.0 and f[1] == 1.0 and f[2] == float(n)
    assert f[3] == sum(samples) / n
    assert f[4] == float(min(samples)) and f[5] == float(max(samples))
    assert f[6] == sum(x * x for x in samples) / n


from hypothesis import given, settings, strategies as st


@given(
    samples=st.lists(
        st.integers(min_value=-32768, max_value=32767),
        min_size=1,
        max_size=200,
    ),
    rate=st.sampled_from([8000, 16000, 44100, 48000]),
)
@settings(max_examples=50, deadline=None)
def test_roundtrip_property(samples: list[int], rate: int) -> None:
    got_rate, ch, bits, out = decode_wav(encode_wav(rate, 1, samples))
    assert (got_rate, ch, bits, out) == (rate, 1, 16, samples)
