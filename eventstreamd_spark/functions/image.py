"""Content-dispatched image decode: magic bytes pick the codec
(``functions/png.py`` or ``functions/jpeg.py``), one uniform
``(width, height, channels, pixels)`` contract out — the
``mixed_media_manifest`` dispatch idiom, factored so the perceptual
hash tier hashes ANY supported image format with one call.

Raises ValueError for unrecognized or undecodable payloads; callers
treat that as "not an image" and fall back (byte histogram / skip)."""

from __future__ import annotations

from eventstreamd_spark.functions.jpeg import SOI as _JPEG_SOI, decode_jpeg
from eventstreamd_spark.functions.png import SIGNATURE as _PNG_SIG, decode_png


def image_kind(blob: bytes) -> str | None:
    """'png' / 'jpeg' by magic bytes, None if neither."""
    if blob is None:
        return None
    if blob[:8] == _PNG_SIG:
        return "png"
    if blob[:2] == _JPEG_SOI:
        return "jpeg"
    return None


def decode_image(blob: bytes) -> tuple[int, int, int, bytes]:
    """Decode a PNG or baseline JPEG -> (width, height, channels,
    8-bit row-major pixels).  ValueError on anything else."""
    kind = image_kind(blob)
    if kind == "png":
        return decode_png(blob)
    if kind == "jpeg":
        return decode_jpeg(blob)
    raise ValueError("unrecognized image format")
