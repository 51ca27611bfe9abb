"""Pure-Python PGM (P5 binary graymap) codec for the multimodal edge.

Second real codec behind ``decode_media`` (after ``png.py``), proving
the Arrow/mapInPandas decode plumbing is codec-agnostic: same batch
signature, same output schema, a different on-disk format. PGM needs no
libraries at all — an ASCII header (magic, dimensions, maxval, with
``#`` comments legal anywhere in the header whitespace) followed by raw
pixel bytes.

The encoder deliberately writes a comment line into the header: a
"decoder" that skips real header tokenization and, say, byte-averages
the whole payload (or slices at a fixed offset) picks up header/comment
bytes in its statistics and fails the closed-form oracle, exactly like
the Up-filter trick in the PNG codec.
"""

from __future__ import annotations


def encode_pgm_gray(width: int, height: int, value: int) -> bytes:
    """A valid binary (P5) PGM of a solid ``value`` image."""
    if not (0 < width and 0 < height and 0 <= value <= 255):
        raise ValueError("need width, height > 0 and 0 <= value <= 255")
    header = (
        b"P5\n"
        b"# synthetic solid graymap\n"
        + f"{width} {height}\n255\n".encode("ascii")
    )
    return header + bytes([value]) * (width * height)


def _tokens(data: bytes):
    """Header tokenizer: whitespace-separated tokens, ``#``-to-newline
    comments skipped, yielding (token, end_offset) so the caller knows
    where the raster begins (exactly one whitespace byte after maxval,
    per the netpbm spec)."""
    i, n = 0, len(data)
    while i < n:
        c = data[i : i + 1]
        if c in b" \t\r\n":
            i += 1
        elif c == b"#":
            while i < n and data[i : i + 1] != b"\n":
                i += 1
        else:
            j = i
            while j < n and data[j : j + 1] not in b" \t\r\n":
                j += 1
            yield data[i:j], j
            i = j


def decode_pgm_gray(data: bytes) -> tuple[int, int, float]:
    """(width, height, mean_pixel) of a binary 8-bit PGM.

    Real decode: tokenizes the header (comment- and whitespace-tolerant),
    validates magic/maxval, and checks the raster is exactly
    width*height bytes after the single post-maxval whitespace byte.
    Raises ValueError on anything that is not an 8-bit P5 graymap.
    """
    toks = _tokens(data)
    try:
        magic, _ = next(toks)
        if magic != b"P5":
            raise ValueError(f"not a binary PGM (magic {magic!r})")
        (w_tok, _), (h_tok, _), (max_tok, end) = (
            next(toks),
            next(toks),
            next(toks),
        )
    except StopIteration:
        raise ValueError("truncated PGM header") from None
    width, height, maxval = int(w_tok), int(h_tok), int(max_tok)
    if width <= 0 or height <= 0:
        raise ValueError(f"bad dimensions {width}x{height}")
    if maxval != 255:
        raise ValueError(f"only 8-bit graymaps supported, maxval={maxval}")
    raster = data[end + 1 :]  # single whitespace byte after maxval
    if len(raster) != width * height:
        raise ValueError(
            f"raster size mismatch: {len(raster)} != {width}x{height}"
        )
    return width, height, sum(raster) / float(width * height)


def pgm_decode_batch(pdf):
    """``decode_media``-compatible per-batch decoder backed by the PGM
    parser — the same contract as ``png.png_decode_batch``."""
    import pandas as pd

    ids, lens, ws, hs, means = [], [], [], [], []
    for doc_id, media in zip(pdf["doc_id"], pdf["media"]):
        w, h, mean = decode_pgm_gray(bytes(media))
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
