"""Minimal pure-stdlib ISO-BMFF (MP4) box walker.

The video sibling of functions/png.py / functions/wav.py: real
container parsing with no codec dependency.  Scope is the metadata a
corpus pipeline actually needs from ``video/mp4`` payloads before any
frame decode — movie timescale, duration, and track count — read from
the ``moov``/``mvhd``/``trak`` box tree.  Sample data (mdat) is
opaque by design; a frame decoder would slot behind the same walk.

Reference parity: srittau/eventstreamd has no media surface (SURVEY.md
§0); layer-B scope.
"""

from __future__ import annotations

import struct


def _box(type_: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + type_ + payload


def encode_minimal_mp4(
    timescale: int, duration: int, n_tracks: int
) -> bytes:
    """ftyp + moov(mvhd + n_tracks x trak(tkhd)) skeleton — the
    smallest tree real parsers accept for metadata probes."""
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0) + b"isom")
    mvhd_payload = (
        struct.pack(">I", 0)  # version + flags
        + struct.pack(">II", 0, 0)  # creation, modification
        + struct.pack(">II", timescale, duration)
        + struct.pack(">i", 0x00010000)  # rate 1.0
        + struct.pack(">h", 0x0100)  # volume 1.0
        + b"\x00" * 10  # reserved
        + struct.pack(">9i", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24  # predefined
        + struct.pack(">I", n_tracks + 1)  # next track id
    )
    traks = b""
    for tid in range(1, n_tracks + 1):
        tkhd_payload = (
            struct.pack(">I", 0x000007)  # version 0 + enabled flags
            + struct.pack(">II", 0, 0)
            + struct.pack(">I", tid)
            + struct.pack(">I", 0)  # reserved
            + struct.pack(">I", duration)
            + b"\x00" * 60  # reserved/layer/matrix/width/height
        )
        traks += _box(b"trak", _box(b"tkhd", tkhd_payload))
    moov = _box(b"moov", _box(b"mvhd", mvhd_payload) + traks)
    return ftyp + moov


def _walk(blob: bytes, start: int, end: int):
    """Yield (type, payload_start, payload_end) for sibling boxes."""
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack(">I", blob[pos : pos + 4])
        btype = blob[pos + 4 : pos + 8]
        if size == 1:  # 64-bit largesize
            if pos + 16 > end:
                raise ValueError("truncated largesize box")
            (size,) = struct.unpack(">Q", blob[pos + 8 : pos + 16])
            header = 16
        elif size == 0:  # box extends to end of enclosing container
            size = end - pos
            header = 8
        else:
            header = 8
        if size < header or pos + size > end:
            raise ValueError("malformed box size")
        yield btype, pos + header, pos + size
        pos += size


def decode_mp4(blob: bytes) -> tuple[int, int, int]:
    """MP4 bytes -> (timescale, duration, n_tracks) from moov/mvhd."""
    if len(blob) < 12 or blob[4:8] != b"ftyp":
        raise ValueError("not an ISO-BMFF payload")
    for btype, s, e in _walk(blob, 0, len(blob)):
        if btype != b"moov":
            continue
        timescale = duration = None
        n_tracks = 0
        for ctype, cs, ce in _walk(blob, s, e):
            if ctype == b"mvhd":
                body = blob[cs:ce]
                if len(body) < 20:
                    raise ValueError("short mvhd")
                version = body[0]
                if version == 0:
                    timescale, duration = struct.unpack(">II", body[12:20])
                else:  # version 1: 64-bit times
                    if len(body) < 32:
                        raise ValueError("short mvhd v1")
                    (timescale,) = struct.unpack(">I", body[20:24])
                    (duration,) = struct.unpack(">Q", body[24:32])
            elif ctype == b"trak":
                n_tracks += 1
        if timescale is None:
            raise ValueError("moov without mvhd")
        return timescale, duration, n_tracks
    raise ValueError("no moov box")
