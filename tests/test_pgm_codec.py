"""The PGM codec and the format-dispatching mixed decode path.

Mirrors test_png_codec.py's strategy: the encoder plants a header
comment so statistics computed WITHOUT real header tokenization (e.g.
averaging raw file bytes) are measurably wrong, and the Spark round
trip is pinned against the closed-form id->geometry/value rules.
"""

from __future__ import annotations

import pytest

from fred_economic_data_pipeline_local_spark.operators.pgm import (
    decode_pgm_gray,
    encode_pgm_gray,
)


def test_round_trip_solid_image():
    data = encode_pgm_gray(7, 5, 200)
    assert decode_pgm_gray(data) == (7, 5, 200.0)


def test_header_comment_skews_naive_byte_average():
    data = encode_pgm_gray(6, 4, 250)
    naive_mean = sum(data) / len(data)
    assert abs(naive_mean - 250.0) > 20  # header bytes drag it down
    assert decode_pgm_gray(data)[2] == 250.0


def test_comments_and_whitespace_tolerated_anywhere_in_header():
    raster = bytes([9]) * 6
    data = b"P5 # inline\n# full line\n 3\t2 # dims done\n255\n" + raster
    assert decode_pgm_gray(data) == (3, 2, 9.0)


@pytest.mark.parametrize(
    "data",
    [
        b"P6\n2 2\n255\n" + bytes(12),  # wrong magic (PPM)
        b"P5\n2 2\n65535\n" + bytes(8),  # 16-bit maxval
        b"P5\n2 2\n255\n" + bytes(3),  # truncated raster
        b"P5\n2 2\n255\n" + bytes(5),  # oversized raster
        b"P5\n2",  # truncated header
        encode_pgm_gray(2, 2, 0)[:-1],  # valid header, short payload
    ],
)
def test_malformed_inputs_raise(data):
    with pytest.raises(ValueError):
        decode_pgm_gray(data)


def test_encoder_rejects_bad_args():
    for w, h, v in ((0, 1, 0), (1, 0, 0), (1, 1, 256), (1, 1, -1)):
        with pytest.raises(ValueError):
            encode_pgm_gray(w, h, v)


def test_mixed_decode_dispatches_per_row(spark):
    from fred_economic_data_pipeline_local_spark.catalog import load_table
    from fred_economic_data_pipeline_local_spark.operators.multimodal import (
        attach_mixed_media,
        decode_media,
        mixed_decode_batch,
    )

    docs = load_table(spark, "documents", "/root/testdata/sf0.001").limit(40)
    media = attach_mixed_media(docs)
    # the media column genuinely alternates formats
    first_bytes = {
        r.doc_id: bytes(r.media)[:2] for r in media.limit(10).collect()
    }
    for i, head in first_bytes.items():
        assert head == (b"\x89P" if i % 2 == 0 else b"P5")
    rows = decode_media(media, decode_fn=mixed_decode_batch).collect()
    assert len(rows) == 40
    for r in rows:
        i = r.doc_id
        assert r.width == 4 + i % 8
        assert r.height == 4 + (i // 8) % 8
        assert r.mean_byte == float(i % 251)


def test_mixed_decode_raises_on_unregistered_format(spark):
    import pandas as pd

    from fred_economic_data_pipeline_local_spark.operators.multimodal import (
        mixed_decode_batch,
    )

    pdf = pd.DataFrame(
        {
            "doc_id": [1],
            "media": [b"RIFF...."],
            "media_meta": [
                {
                    "media_type": "audio/wav",
                    "width": 0,
                    "height": 0,
                    "n_frames": 1,
                    "sample_rate": 16000,
                }
            ],
        }
    )
    with pytest.raises(ValueError, match="no codec registered"):
        mixed_decode_batch(pdf)
