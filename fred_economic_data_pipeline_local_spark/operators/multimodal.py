"""Multimodal column operators: opaque binary media + typed metadata.

Design for a 100 TB training-data lake: media travels as an opaque
``binary`` column next to a typed metadata struct; decode / resize /
frame-sample / feature-extract run as Arrow-batched ``mapInPandas``
stages so the (expensive) per-item Python work is vectorized per batch
and scales with partitions, never with driver memory.

The heavy codec work (JPEG decode, audio resample, video frame grab)
needs image/audio libraries that are NOT in this container, so the
default decode path computes deterministic fake outputs from the bytes +
metadata. PNG needs no external libraries, though: ``real_decode=True``
runs the pure-Python PNG codec (``operators.png`` — zlib inflate + full
scanline filter reconstruction) through the exact same ``mapInPandas``
plumbing, proving the batch shape on genuine decode work. Swapping in
PIL/libsndfile for other formats changes only the inner per-batch
function.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Typed metadata carried next to every media payload.
MEDIA_META_SCHEMA = StructType(
    [
        StructField("media_type", StringType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("n_frames", IntegerType(), True),
        StructField("sample_rate", IntegerType(), True),
    ]
)


def attach_media(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Materialize a (media binary, media_meta struct) pair per row.

    Test-fixture adapter: the UTF-8 bytes of ``text_col`` stand in for
    real image/audio payloads, and the metadata derives deterministically
    from the text length — so every downstream operator exercises the
    exact schema/batch shapes it would see on real media.
    """
    n = F.length(F.col(text_col))
    return df.select(
        F.col(id_col),
        F.encode(F.col(text_col), "UTF-8").alias("media"),
        F.struct(
            F.lit("image/fake").alias("media_type"),
            (64 + (n * 7) % 448).cast("int").alias("width"),
            (64 + (n * 13) % 448).cast("int").alias("height"),
            (1 + n % 16).cast("int").alias("n_frames"),
            F.lit(16000).alias("sample_rate"),
        ).alias("media_meta"),
    )


def attach_png_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Materialize a REAL (valid, decodable) PNG payload per row.

    Each row gets an 8-bit grayscale PNG whose geometry and pixel value
    are closed-form functions of the id — ``width = 4 + id % 8``,
    ``height = 4 + (id // 8) % 8``, solid ``value = id % 251`` — so a
    correctness oracle can predict the decoded statistics without ever
    seeing the bytes. Encoding runs per Arrow batch in ``mapInPandas``
    (the codec edge is where Python belongs; everything around it stays
    JVM-side).
    """
    from .png import encode_png_gray

    out_schema = StructType(
        [
            StructField("doc_id", LongType(), True),
            StructField("media", BinaryType(), True),
            StructField("media_meta", MEDIA_META_SCHEMA, True),
        ]
    )

    ids_df = df.select(F.col(id_col).cast("long").alias("doc_id"))

    def _encode(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            medias, metas = [], []
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                w, h, v = 4 + i % 8, 4 + (i // 8) % 8, i % 251
                medias.append(encode_png_gray(w, h, v))
                metas.append(
                    {
                        "media_type": "image/png",
                        "width": w,
                        "height": h,
                        "n_frames": 1,
                        "sample_rate": None,
                    }
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "media": medias, "media_meta": metas}
            )

    return ids_df.mapInPandas(_encode, out_schema)


def attach_mixed_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Materialize a MIXED-format media column: even ids get a real PNG,
    odd ids a real binary PGM — same closed-form geometry/value rules as
    ``attach_png_media`` so the decoded stats stay oracle-predictable.
    This is the realistic lake shape (one binary column, per-row format
    recorded in typed metadata) that a format-dispatching decoder must
    handle; the per-batch encode runs at the Arrow edge like the others.
    """
    from .pgm import encode_pgm_gray
    from .png import encode_png_gray

    out_schema = StructType(
        [
            StructField("doc_id", LongType(), True),
            StructField("media", BinaryType(), True),
            StructField("media_meta", MEDIA_META_SCHEMA, True),
        ]
    )

    ids_df = df.select(F.col(id_col).cast("long").alias("doc_id"))

    def _encode(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            medias, metas = [], []
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                w, h, v = 4 + i % 8, 4 + (i // 8) % 8, i % 251
                if i % 2 == 0:
                    medias.append(encode_png_gray(w, h, v))
                    mt = "image/png"
                else:
                    medias.append(encode_pgm_gray(w, h, v))
                    mt = "image/x-portable-graymap"
                metas.append(
                    {
                        "media_type": mt,
                        "width": w,
                        "height": h,
                        "n_frames": 1,
                        "sample_rate": None,
                    }
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "media": medias, "media_meta": metas}
            )

    return ids_df.mapInPandas(_encode, out_schema)


def mixed_decode_batch(pdf):
    """Format-dispatching per-batch decoder: routes each row to the PNG
    or PGM parser on ``media_meta.media_type``, raising on formats with
    no registered codec (the honest behavior at a real decode edge —
    never silently stub). Row order within the batch is preserved."""
    import pandas as pd

    from .pgm import decode_pgm_gray
    from .png import decode_png_gray

    codecs = {
        "image/png": decode_png_gray,
        "image/x-portable-graymap": decode_pgm_gray,
    }
    ids, lens, ws, hs, means = [], [], [], [], []
    for doc_id, media, meta in zip(
        pdf["doc_id"], pdf["media"], pdf["media_meta"]
    ):
        mt = meta["media_type"]
        if mt not in codecs:
            raise ValueError(f"no codec registered for {mt!r}")
        w, h, mean = codecs[mt](bytes(media))
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


_DECODE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), True),
        StructField("byte_len", LongType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_s", DoubleType(), True),
        StructField("mean_byte", DoubleType(), True),
    ]
)


def stub_decode_batch(pdf):
    """Default per-batch decoder: deterministic fake metrics from bytes +
    metadata. Computes byte length, echoes decoded dimensions, derives
    duration from (n_frames, sample_rate), and averages the raw bytes
    (standing in for pixel statistics a real decoder would produce).
    """
    import pandas as pd

    media = pdf["media"]
    meta = pdf["media_meta"]
    return pd.DataFrame(
        {
            "doc_id": pdf["doc_id"],
            "byte_len": media.map(len).astype("int64"),
            "width": meta.map(lambda m: m["width"]).astype("int32"),
            "height": meta.map(lambda m: m["height"]).astype("int32"),
            "duration_s": meta.map(
                lambda m: m["n_frames"] / float(m["sample_rate"])
            ),
            "mean_byte": media.map(
                lambda b: (sum(b) / len(b)) if len(b) else 0.0
            ),
        }
    )


def decode_media(df: DataFrame, decode_fn=None, real_decode: bool = False) -> DataFrame:
    """Decode stage: (media, media_meta) -> per-item decoded metrics.

    ``mapInPandas`` over Arrow batches: ``decode_fn`` maps one pandas
    DataFrame batch (doc_id, media, media_meta) to one _DECODE_SCHEMA
    batch. The codec edge is pluggable — a real pipeline passes a
    PIL/libsndfile-backed function and reuses this exact plumbing; the
    default is the deterministic stub. ``real_decode=True`` without a
    ``decode_fn`` runs the built-in pure-Python PNG decoder
    (``operators.png``): genuine codec work for PNG payloads, a
    ValueError for formats that would need external libraries.
    """
    if real_decode and decode_fn is None:
        from .png import png_decode_batch

        decode_fn = png_decode_batch
    fn = decode_fn or stub_decode_batch

    def _decode(batches: Iterator) -> Iterator:
        for pdf in batches:
            yield fn(pdf)

    return df.mapInPandas(_decode, _DECODE_SCHEMA)


_FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), True),
        StructField("frame_idx", IntegerType(), True),
        StructField("frame_bytes", BinaryType(), True),
    ]
)


def sample_frames(df: DataFrame, every: int = 1) -> DataFrame:
    """Frame-sampling stage: one input item -> n_frames/every output rows.

    Demonstrates the 1->N batch shape a video pipeline needs: the inner
    pandas function emits multiple rows per input row. The stub slices
    the payload bytes per frame (a real implementation would seek+decode);
    ``every`` keeps every k-th frame (stride sampling).
    """

    def _frames(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ids, idxs, blobs = [], [], []
            for doc_id, media, meta in zip(
                pdf["doc_id"], pdf["media"], pdf["media_meta"]
            ):
                n = int(meta["n_frames"])
                size = max(len(media) // max(n, 1), 1)
                for i in range(0, n, every):
                    ids.append(doc_id)
                    idxs.append(i)
                    blobs.append(bytes(media[i * size : (i + 1) * size]))
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame_bytes": blobs}
            )

    return df.mapInPandas(_frames, _FRAME_SCHEMA)


_FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), True),
        StructField("feature", ArrayType(FloatType()), True),
    ]
)


def extract_features(df: DataFrame, dim: int = 8) -> DataFrame:
    """Feature-extraction stage: media bytes -> fixed-dim float vector.

    Stub embedding: per-dimension byte-sum folds (deterministic, unit-free)
    standing in for a vision/audio encoder forward pass. Output is the
    same ``array<float>`` shape as the ``embeddings`` fixture, so the
    result composes directly with the similarity operators
    (brute_force_topk / lsh_topk).
    """

    def _feat(batches: Iterator) -> Iterator:
        import pandas as pd

        def vec(b: bytes) -> list[float]:
            acc = [0.0] * dim
            for i, by in enumerate(b):
                acc[i % dim] += by
            norm = sum(x * x for x in acc) ** 0.5 or 1.0
            return [float(x / norm) for x in acc]

        for pdf in batches:
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "feature": pdf["media"].map(vec)}
            )

    return df.mapInPandas(_feat, _FEATURE_SCHEMA)


_RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), True),
        StructField("media", BinaryType(), True),
        StructField(
            "media_meta",
            StructType(
                [
                    StructField("media_type", StringType(), False),
                    StructField("width", IntegerType(), True),
                    StructField("height", IntegerType(), True),
                    StructField("n_frames", IntegerType(), True),
                    StructField("sample_rate", IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)


def resize_media(
    df: DataFrame, target_w: int = 224, target_h: int = 224
) -> DataFrame:
    """Resize stage: (media, media_meta) -> same pair at target dimensions.

    The shape every vision-training pipeline needs between decode and
    feature-extract. The stub scales the payload byte count by the pixel
    ratio and rewrites the metadata dims (a real implementation decodes,
    interpolates, re-encodes inside the same per-batch function); output
    schema == input schema, so resize composes with sample_frames /
    extract_features in either order.
    """

    def _resize(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            medias, metas = [], []
            for media, meta in zip(pdf["media"], pdf["media_meta"]):
                w, h = int(meta["width"]), int(meta["height"])
                ratio = (target_w * target_h) / float(max(w * h, 1))
                new_len = max(int(len(media) * ratio), 1)
                # deterministic stub: tile/truncate bytes to the scaled size
                reps = (new_len // max(len(media), 1)) + 1
                medias.append(bytes((media * reps)[:new_len]))
                metas.append(
                    {
                        "media_type": meta["media_type"],
                        "width": target_w,
                        "height": target_h,
                        "n_frames": meta["n_frames"],
                        "sample_rate": meta["sample_rate"],
                    }
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "media": medias, "media_meta": metas}
            )

    return df.mapInPandas(_resize, _RESIZE_SCHEMA)


_PHASH_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), True),
        StructField("phash", LongType(), True),
    ]
)

_PATTERN_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), True),
        StructField("media", BinaryType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
    ]
)


def attach_pattern_media(
    df: DataFrame, id_col: str = "doc_id", variant_every: int = 5
) -> DataFrame:
    """Materialize a deterministic grayscale PATTERN image per row plus,
    for every ``variant_every``-th id, a HALF-RESOLUTION re-render of
    the same continuous pattern under ``doc_id + 1_000_000`` — the
    resized-re-upload scenario exact (md5) dedup is blind to and
    perceptual hashing exists for.

    The pattern is a sinusoid field sampled on normalized coordinates
    (pixel value depends on (x+0.5)/W, (y+0.5)/H, not on raw pixel
    indices), so two renders at different resolutions are the SAME
    image content — geometry, not bytes. Rendering runs per Arrow batch
    in ``mapInPandas`` (the codec edge); output is raw row-major
    grayscale bytes with real (width, height) metadata.
    """

    def _render_one(np, i: int, scale: int):
        w = max((32 + (i * 7) % 64) // scale, 4)
        h = max((32 + (i * 13) % 64) // scale, 4)
        # three LOW-frequency sinusoids (<= 3.5 cycles — pHash keeps
        # only the top-left 8x8 DCT block, so the content must live in
        # those frequencies; a first cut with ~8-cycle patterns hashed
        # on leakage alone: 13-way collisions, variant Hamming up to
        # 20). Base-5 digit mixtures give every id a distinct field:
        # measured on 500 ids — 500 distinct hashes, unrelated median
        # Hamming 32 (1/2391 pairs <= 7), variant median 2 (3% > 7).
        y, x = np.mgrid[0:h, 0:w]
        u, v = (x + 0.5) / w, (y + 0.5) / h
        img = np.full((h, w), 128.0)
        for k in range(3):
            a = 1 + (i // 5 ** (2 * k)) % 5
            b = 1 + (i // 5 ** (2 * k + 1)) % 5
            p = ((i * (k + 3)) % 11) / 11.0
            amp = (30, 50, 40)[k]
            img = img + amp * np.sin(
                2 * np.pi * (a * u * 0.7 + b * v * 0.7 + p)
            )
        return np.clip(img, 0, 255).astype(np.uint8), w, h

    def _render(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            ids, medias, ws, hs = [], [], [], []
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                if i >= 1_000_000:
                    # variant ids are doc_id + 1_000_000; an input id at
                    # or past the offset would collide with a variant
                    # and silently corrupt the planted-pair ground truth
                    raise ValueError(
                        f"attach_pattern_media: doc_id {i} >= 1_000_000 "
                        "collides with the variant-id offset"
                    )
                img, w, h = _render_one(np, i, 1)
                ids.append(i)
                medias.append(img.tobytes())
                ws.append(w)
                hs.append(h)
                if i % variant_every == 0:
                    img2, w2, h2 = _render_one(np, i, 2)
                    ids.append(i + 1_000_000)
                    medias.append(img2.tobytes())
                    ws.append(w2)
                    hs.append(h2)
            yield pd.DataFrame(
                {"doc_id": ids, "media": medias, "width": ws, "height": hs}
            )

    return df.select(F.col(id_col).cast("long").alias("doc_id")).mapInPandas(
        _render, _PATTERN_SCHEMA
    )


def phash63(
    df: DataFrame,
    media_col: str = "media",
    width_col: str = "width",
    height_col: str = "height",
) -> DataFrame:
    """63-bit DCT perceptual hash per image — the classic pHash pipeline
    (2-D resample -> 2-D DCT-II -> low-frequency block -> median
    threshold) run for real at the codec edge:

      1. the row-major grayscale buffer (width x height metadata, the
         decoder's output shape) nearest-resamples to a 32x32 grid —
         a true 2-D resize, so re-renders of the same content at
         different resolutions land on (nearly) the same grid;
      2. orthonormal DCT-II via two matrix multiplies (numpy, inside
         one Arrow ``mapInPandas`` batch — the only Python hop);
      3. the top-left 8x8 coefficient block MINUS the DC term gives 63
         AC coefficients; each bit = coefficient > median.

    63 bits (not 64) is load-bearing: the MSB stays clear, the hash is
    a NONNEGATIVE int64, and every downstream consumer (banding shifts,
    XOR/bit_count Hamming) behaves identically under arithmetic and
    logical shifts in any engine — the exported hash table needs no
    unsigned-integer gymnastics in SQL.

    The hash computation itself has no SQL mirror (DCT), so callers
    export the (doc_id, phash) table and verify everything downstream
    (banding, candidate join, Hamming verify) — the exported-index
    pattern. Returns (doc_id, phash); phash is NULL for undecodable or
    short buffers (a sentinel like 0 would alias all malformed images
    into one mutual Hamming-0 duplicate group).
    """

    def _phash(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        n = 32
        k = np.arange(n)
        # orthonormal DCT-II basis
        c = np.sqrt(2.0 / n) * np.cos(
            np.pi * (2 * k[None, :] + 1) * k[:, None] / (2 * n)
        )
        c[0, :] = np.sqrt(1.0 / n)
        for pdf in batches:
            hashes = []
            for raw, w, h in zip(
                pdf["media"], pdf["width"], pdf["height"]
            ):
                # undecodable/short buffer -> NULL hash, never a
                # sentinel: hash 0 would make every malformed image a
                # mutual Hamming-0 "duplicate" of every other one and a
                # real dedup pass would merge/delete them
                if raw is None or w is None or h is None:
                    hashes.append(None)
                    continue
                w, h = int(w), int(h)
                b = np.frombuffer(bytes(raw), dtype=np.uint8)
                if b.size < w * h or w < 1 or h < 1:
                    hashes.append(None)
                    continue
                img = b[: w * h].reshape(h, w)
                yi = (np.arange(n) * h) // n
                xi = (np.arange(n) * w) // n
                grid = img[np.ix_(yi, xi)].astype(np.float64)
                coef = (c @ grid @ c.T)[:8, :8].ravel()[1:]  # drop DC
                med = float(np.median(coef))
                bits = 0
                for i, v in enumerate(coef):
                    if v > med:
                        bits |= 1 << i
                hashes.append(bits)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "phash": pd.array(hashes, dtype="Int64"),
                }
            )

    return df.select(
        "doc_id", media_col, width_col, height_col
    ).mapInPandas(_phash, _PHASH_SCHEMA)


def phash_neardup_pairs(
    hashes: DataFrame, max_hamming: int = 7
) -> DataFrame:
    """Hamming-distance near-dup pairs over a (doc_id, phash) table via
    multi-index banding: the 63-bit hash splits into 8 fixed bands
    (7 x 8 bits + 1 x 7 bits); by pigeonhole, any pair within Hamming
    distance 7 agrees EXACTLY on at least one band, so the banded
    equi-join is a LOSSLESS candidate generator for
    ``max_hamming <= 7`` — never an all-pairs compare — and each
    candidate is verified with one XOR + bit_count. The same
    index-then-verify shape as MinHash LSH, on bits instead of
    shingles. NULL hashes (undecodable media, see phash63) are dropped
    before banding — they carry no content signal and must never pair.
    Returns (id_a, id_b, hamming).

    Scale shape (r14): the band join runs over DISTINCT hashes, not
    rows — re-uploaded/copied media collapse to one hash first, so
    band buckets (and the quadratic-in-bucket candidate space) are
    bounded by content DIVERSITY, not corpus size; id pairs expand
    only at output, which is the true result's own size. The 16x
    scale-trend corpus measured the row-banded form at 38.8x
    wall-clock growth, entirely duplicated-content bucket inflation
    (the result itself grew 72x). Equal-hash pairs (hamming 0) come
    from a per-hash-group self-join directly; cross-hash candidates
    cannot be capped — the pigeonhole losslessness is the point — but
    distinct-hash buckets no longer grow with duplication.
    """
    hashes = hashes.where(F.col("phash").isNotNull())
    bands = F.array(
        *[
            F.shiftrightunsigned(F.col("phash"), 8 * i).bitwiseAND(
                F.lit(255 if i < 7 else 127).cast("long")
            )
            for i in range(8)
        ]
    )
    dh = hashes.select("phash").distinct()
    bt = dh.select("phash", F.posexplode(bands).alias("band", "bval"))
    a = bt.select("band", "bval", F.col("phash").alias("ph_a"))
    b = bt.select("band", "bval", F.col("phash").alias("ph_b"))
    ham = F.bit_count(
        F.col("ph_a").bitwiseXOR(F.col("ph_b"))
    ).cast("int")
    hpairs = (
        a.join(b, ["band", "bval"])
        .where(F.col("ph_a") < F.col("ph_b"))
        .select("ph_a", "ph_b", ham.alias("hamming"))
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )
    ma = hashes.select(
        F.col("phash").alias("ph_a"), F.col("doc_id").alias("__ia")
    )
    mb = hashes.select(
        F.col("phash").alias("ph_b"), F.col("doc_id").alias("__ib")
    )
    cross = hpairs.join(ma, "ph_a").join(mb, "ph_b").select(
        F.least("__ia", "__ib").alias("id_a"),
        F.greatest("__ia", "__ib").alias("id_b"),
        "hamming",
    )
    same = (
        ma.join(mb, F.col("ph_a") == F.col("ph_b"))
        .where(F.col("__ia") < F.col("__ib"))
        .select(
            F.col("__ia").alias("id_a"),
            F.col("__ib").alias("id_b"),
            F.lit(0).cast("int").alias("hamming"),
        )
    )
    return cross.unionByName(same)


_AUDIO_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), True),
        StructField("media", BinaryType(), True),
        StructField("sample_rate", IntegerType(), True),
        StructField("n_samples", IntegerType(), True),
    ]
)

AUDIO_WINDOW = 256


def attach_audio_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Materialize a deterministic int16 PCM payload per row — the
    audio stand-in with CLOSED-FORM ground truth (the attach_png_media
    discipline): ``8 + id % 8`` windows of :data:`AUDIO_WINDOW` samples;
    window w is digital silence when ``(id + w) % 4 == 0``, otherwise a
    full-scale square wave of amplitude ``1000 + (id % 50) * 100``
    (alternating +A/-A each sample), little-endian int16 — so an oracle
    can predict every window's RMS (square wave RMS is EXACTLY A; the
    integer mean-of-squares is A^2 and sqrt(A^2) is exact in IEEE)
    from id arithmetic alone, without seeing a byte. Synthesis runs per
    Arrow batch in ``mapInPandas`` (the codec edge).
    """

    def _synth(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            medias, rates, ns = [], [], []
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                n_win = 8 + i % 8
                amp = 1000 + (i % 50) * 100
                wave = np.empty(n_win * AUDIO_WINDOW, dtype=np.int16)
                alt = np.where(
                    np.arange(AUDIO_WINDOW) % 2 == 0, amp, -amp
                ).astype(np.int16)
                for w in range(n_win):
                    s = w * AUDIO_WINDOW
                    if (i + w) % 4 == 0:
                        wave[s : s + AUDIO_WINDOW] = 0
                    else:
                        wave[s : s + AUDIO_WINDOW] = alt
                medias.append(wave.astype("<i2").tobytes())
                rates.append(16000)
                ns.append(n_win * AUDIO_WINDOW)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media": medias,
                    "sample_rate": rates,
                    "n_samples": ns,
                }
            )

    return df.select(F.col(id_col).cast("long").alias("doc_id")).mapInPandas(
        _synth, _AUDIO_SCHEMA
    )


_ENERGY_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), True),
        StructField("win_idx", IntegerType(), True),
        StructField("rms", DoubleType(), True),
        StructField("peak", IntegerType(), True),
    ]
)


def audio_window_energy(
    df: DataFrame, media_col: str = "media", window: int = AUDIO_WINDOW
) -> DataFrame:
    """Frame int16 PCM into fixed windows and compute per-window RMS +
    peak — the voice-activity/silence-trim primitive of every audio
    ingest pipeline, run as real numpy work per Arrow batch. The mean
    of squares uses int64 accumulation (exact for int16 inputs), so
    RMS is ``sqrt`` of an exact rational — deterministic on any
    engine/host. Trailing partial windows are dropped (frame semantics).
    Returns (doc_id, win_idx, rms, peak).
    """

    def _energy(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            ids, wins, rmss, peaks = [], [], [], []
            for doc_id, raw in zip(pdf["doc_id"], pdf[media_col]):
                pcm = np.frombuffer(bytes(raw), dtype="<i2")
                n_win = pcm.size // window
                for w in range(n_win):
                    seg = pcm[w * window : (w + 1) * window].astype(
                        np.int64
                    )
                    ids.append(int(doc_id))
                    wins.append(w)
                    rmss.append(
                        float(np.sqrt(np.sum(seg * seg) / window))
                    )
                    peaks.append(int(np.max(np.abs(seg))))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "win_idx": pd.Series(wins, dtype="int32"),
                    "rms": pd.Series(rmss, dtype="float64"),
                    "peak": pd.Series(peaks, dtype="int32"),
                }
            )

    return df.select("doc_id", media_col).mapInPandas(
        _energy, _ENERGY_SCHEMA
    )
