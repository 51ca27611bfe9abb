"""Pure-Python PNG codec for the multimodal decode edge.

The container ships no image libraries, but PNG needs none: the format
is zlib (stdlib) + per-scanline filters. This module implements a real
encoder (valid, round-trippable 8-bit grayscale PNGs) and a real decoder
(signature check, IHDR parse, IDAT inflate, full filter reconstruction
per the PNG spec §9: None/Sub/Up/Average/Paeth) so
``decode_media(real_decode=True)`` exercises genuine codec work through
the same Arrow ``mapInPandas`` plumbing a PIL-backed decoder would use.

The encoder writes Up-filtered scanlines after the first row on purpose:
for a solid-gray image the compressed stream then contains the pixel
value only once (row 0) and zeros elsewhere, so a "decoder" that skips
filter reconstruction and averages raw inflated bytes computes ~v/h
instead of v — the oracle-backed round-trip query catches it.
"""

from __future__ import annotations

import struct
import zlib

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png_gray(width: int, height: int, value: int) -> bytes:
    """A valid 8-bit grayscale PNG of a solid ``value`` image.

    Row 0 uses filter type 0 (None); every later row uses filter type 2
    (Up), which for a solid image filters to all zeros — see module
    docstring for why that asymmetry is load-bearing for verification.
    """
    if not (0 < width and 0 < height and 0 <= value <= 255):
        raise ValueError("need width, height > 0 and 0 <= value <= 255")
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    row = bytes([value]) * width
    raw = b"\x00" + row  # first scanline: None filter
    for _ in range(height - 1):
        raw += b"\x02" + bytes(width)  # Up filter of an identical row
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png_gray(data: bytes) -> tuple[int, int, float]:
    """(width, height, mean_pixel) of an 8-bit grayscale PNG.

    Real decode: validates the signature, walks the chunk stream,
    inflates the concatenated IDATs, and reconstructs every scanline
    through the five PNG filter types. Raises ValueError on anything
    that is not an 8-bit grayscale PNG.
    """
    if data[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = len(_PNG_SIG)
    width = height = None
    idat = b""
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + tag + body + crc
        if tag == b"IHDR":
            width, height, bit_depth, color_type = struct.unpack(
                ">IIBB", body[:10]
            )
            if bit_depth != 8 or color_type != 0:
                raise ValueError(
                    f"only 8-bit grayscale supported, got depth={bit_depth} "
                    f"color_type={color_type}"
                )
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    if width is None or not idat:
        raise ValueError("missing IHDR or IDAT")
    raw = zlib.decompress(idat)
    stride = width + 1
    if len(raw) != stride * height:
        raise ValueError("scanline payload size mismatch")
    total = 0
    prev = bytes(width)
    for y in range(height):
        line = raw[y * stride : (y + 1) * stride]
        ftype, flt = line[0], line[1:]
        cur = bytearray(width)
        for x in range(width):
            a = cur[x - 1] if x else 0  # left
            b = prev[x]  # up
            c = prev[x - 1] if x else 0  # up-left
            if ftype == 0:
                rec = flt[x]
            elif ftype == 1:
                rec = flt[x] + a
            elif ftype == 2:
                rec = flt[x] + b
            elif ftype == 3:
                rec = flt[x] + (a + b) // 2
            elif ftype == 4:
                rec = flt[x] + _paeth(a, b, c)
            else:
                raise ValueError(f"bad filter type {ftype}")
            cur[x] = rec & 0xFF
        total += sum(cur)
        prev = bytes(cur)
    return width, height, total / float(width * height)


def png_decode_batch(pdf):
    """``decode_media``-compatible per-batch decoder backed by the real
    PNG parser: (doc_id, media, media_meta) -> decode-metrics batch with
    width/height/mean_byte taken from the DECODED PIXELS, not metadata.
    Images carry no duration, so ``duration_s`` is null.
    """
    import pandas as pd

    ids, lens, ws, hs, means = [], [], [], [], []
    for doc_id, media in zip(pdf["doc_id"], pdf["media"]):
        w, h, mean = decode_png_gray(bytes(media))
        ids.append(doc_id)
        lens.append(len(media))
        ws.append(w)
        hs.append(h)
        means.append(mean)
    return pd.DataFrame(
        {
            "doc_id": pd.Series(ids, dtype="int64"),
            "byte_len": pd.Series(lens, dtype="int64"),
            "width": pd.Series(ws, dtype="int32"),
            "height": pd.Series(hs, dtype="int32"),
            "duration_s": pd.Series([None] * len(ids), dtype="float64"),
            "mean_byte": pd.Series(means, dtype="float64"),
        }
    )
