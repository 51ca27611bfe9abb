"""Pure-Python PNG codec: encoder validity, decoder filter
reconstruction (all five PNG filter types), and the Spark round trip
through decode_media(real_decode=True)."""

from __future__ import annotations

import struct
import zlib

import pytest

from fred_economic_data_pipeline_local_spark.operators.png import (
    _chunk,
    _paeth,
    _PNG_SIG,
    decode_png_gray,
    encode_png_gray,
)


def test_encode_decode_round_trip():
    data = encode_png_gray(7, 5, 200)
    w, h, mean = decode_png_gray(data)
    assert (w, h, mean) == (7, 5, 200.0)


def test_encoder_emits_valid_chunk_crcs():
    data = encode_png_gray(3, 3, 10)
    assert data.startswith(_PNG_SIG)
    pos = len(_PNG_SIG)
    tags = []
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])
        assert crc == zlib.crc32(tag + body) & 0xFFFFFFFF, tag
        tags.append(tag)
        pos += 12 + length
    assert tags == [b"IHDR", b"IDAT", b"IEND"]


def _png_with_filters(pixels: list[list[int]], ftypes: list[int]) -> bytes:
    """Hand-build a PNG whose scanlines are filtered with the given
    per-row filter types — exercises decoder reconstruction paths the
    solid-image encoder never emits."""
    h, w = len(pixels), len(pixels[0])
    raw = b""
    prev = [0] * w
    for y, ftype in enumerate(ftypes):
        cur = pixels[y]
        flt = bytearray()
        for x in range(w):
            a = cur[x - 1] if x else 0
            b = prev[x]
            c = prev[x - 1] if x else 0
            pred = {
                0: 0,
                1: a,
                2: b,
                3: (a + b) // 2,
                4: _paeth(a, b, c),
            }[ftype]
            flt.append((cur[x] - pred) & 0xFF)
        raw += bytes([ftype]) + bytes(flt)
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )


def test_decoder_reconstructs_every_filter_type():
    # a gradient so every filter produces non-trivial deltas
    pixels = [[(3 * x + 17 * y + 5) % 256 for x in range(6)] for y in range(5)]
    expect = sum(sum(r) for r in pixels) / 30.0
    w, h, mean = decode_png_gray(_png_with_filters(pixels, [0, 1, 2, 3, 4]))
    assert (w, h) == (6, 5)
    assert mean == pytest.approx(expect, abs=1e-12)


def test_decoder_rejects_non_png_and_wrong_depth():
    with pytest.raises(ValueError, match="not a PNG"):
        decode_png_gray(b"GIF89a....")
    # RGB (color type 2) header
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)
    bad = _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="grayscale"):
        decode_png_gray(bad)


def test_naive_decoder_would_fail_the_oracle():
    """The load-bearing asymmetry: averaging raw inflated bytes (no
    un-filtering) reads ~value/height for the Up-filtered solid image,
    so only a real filter reconstruction matches the oracle."""
    data = encode_png_gray(8, 8, 240)
    # locate IDAT, inflate, average WITHOUT filter reconstruction
    pos = len(_PNG_SIG)
    idat = b""
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        if tag == b"IDAT":
            idat += data[pos + 8 : pos + 8 + length]
        pos += 12 + length
    raw = zlib.decompress(idat)
    naive_mean = sum(raw) / len(raw)
    assert naive_mean < 240 / 4  # nowhere near the true mean
    assert decode_png_gray(data)[2] == 240.0


def test_spark_round_trip_matches_closed_form(spark):
    from fred_economic_data_pipeline_local_spark.catalog import load_table
    from fred_economic_data_pipeline_local_spark.operators.multimodal import (
        attach_png_media,
        decode_media,
    )

    docs = load_table(spark, "documents", "/root/testdata/sf0.001").limit(40)
    rows = decode_media(attach_png_media(docs), real_decode=True).collect()
    assert len(rows) == 40
    for r in rows:
        i = r.doc_id
        assert r.width == 4 + i % 8
        assert r.height == 4 + (i // 8) % 8
        assert r.mean_byte == float(i % 251)
        assert r.duration_s is None
        assert r.byte_len > len(_PNG_SIG)
