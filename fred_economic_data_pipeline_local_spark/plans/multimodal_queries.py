"""Multimodal-pipeline queries over ``documents`` as fake media.

The decode/resize/frame-sample stubs are deterministic functions of the
payload bytes + metadata (operators/multimodal.py), so the mapInPandas
plumbing itself is oracle-checked: DuckDB mirrors the stub arithmetic in
SQL. The feature-extraction path (hash-fold embedding -> cosine top-k)
is rows-only (byte-fold arithmetic is not worth mirroring in SQL) but
proves the media -> vector -> similarity composition end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..exports import export_sql
from ..operators.multimodal import (
    attach_media,
    decode_media,
    extract_features,
    sample_frames,
)
from ..operators.similarity import brute_force_topk
from .registry import query

# the stub's metadata derivation, mirrored in SQL (length() is chars in
# both engines; the fixture text is ASCII so chars == bytes == len(media))
_META_SQL = """
SELECT doc_id, text,
       CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
       CAST(64 + (length(text) * 7) % 448 AS INTEGER) AS width,
       CAST(64 + (length(text) * 13) % 448 AS INTEGER) AS height,
       CAST(1 + length(text) % 16 AS INTEGER) AS n_frames
FROM documents
"""


@query(
    "multimodal_decode_meta",
    oracle=f"""
SELECT doc_id, byte_len, width, height,
       round(CAST(n_frames AS DOUBLE) / 16000.0, 6) AS duration_s
FROM ({_META_SQL})
""",
    description="mapInPandas decode stage: binary media -> per-item metrics",
)
def multimodal_decode_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    decoded = decode_media(attach_media(docs))
    return decoded.select(
        "doc_id",
        "byte_len",
        "width",
        "height",
        F.round("duration_s", 6).alias("duration_s"),
    )


@query(
    "multimodal_frame_sample",
    oracle=f"""
SELECT doc_id, CAST(unnest(generate_series(0, n_frames - 1)) AS INTEGER) AS frame_idx
FROM ({_META_SQL})
""",
    description="mapInPandas 1->N frame sampling: one row per (item, frame)",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    frames = sample_frames(attach_media(docs), every=1)
    return frames.select("doc_id", "frame_idx")


@query(
    "multimodal_feature_topk",
    # the byte-fold stub embedding itself is a Python codec stage (no
    # SQL mirror), but its OUTPUT vectors are exported, and DuckDB runs
    # the brute-force cosine top-k over them — everything downstream of
    # feature extraction is hash-checked
    oracle=f"""
WITH f AS (SELECT * FROM {export_sql('multimodal_features')}),
c AS (SELECT doc_id, CAST(feature AS DOUBLE[]) AS e FROM f),
q AS (SELECT * FROM c WHERE doc_id < 5)
SELECT q.doc_id AS query_id, c.doc_id AS neighbor_id,
       round(list_dot_product(q.e, c.e) /
             (sqrt(list_dot_product(q.e, q.e)) *
              sqrt(list_dot_product(c.e, c.e))), 6) AS cos_sim
FROM q JOIN c ON q.doc_id <> c.doc_id
QUALIFY row_number() OVER (PARTITION BY query_id
                           ORDER BY cos_sim DESC, c.doc_id) <= 5
""",
    description="media -> feature vector -> cosine top-k (full "
    "multimodal path); the extracted feature table is exported and the "
    "ANN stage is hash-checked against DuckDB's brute-force rerun",
)
def multimodal_feature_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..exports import export_table

    docs = load_table(spark, "documents", sf_dir)
    feats = export_table(
        extract_features(attach_media(docs), dim=8), "multimodal_features"
    )
    queries = feats.where(F.col("doc_id") < 5)
    return brute_force_topk(
        feats, queries, k=5, id_col="doc_id", vec_col="feature"
    )


@query(
    "multimodal_png_roundtrip",
    oracle="""
SELECT doc_id,
       CAST(4 + doc_id % 8 AS INTEGER) AS width,
       CAST(4 + (doc_id // 8) % 8 AS INTEGER) AS height,
       round(CAST(doc_id % 251 AS DOUBLE), 6) AS mean_px
FROM documents
""",
    description="REAL codec round trip: per-row valid 8-bit grayscale "
    "PNGs (pure-Python encoder, Up-filtered scanlines) decoded by the "
    "pure-Python parser — signature, IHDR, zlib inflate, full filter "
    "reconstruction — via decode_media(real_decode=True). The oracle "
    "predicts the decoded geometry and pixel mean in closed form, so a "
    "decoder that skips un-filtering hash-mismatches (it would read "
    "~value/height, not value)",
)
def multimodal_png_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import attach_png_media

    docs = load_table(spark, "documents", sf_dir)
    decoded = decode_media(attach_png_media(docs), real_decode=True)
    return decoded.select(
        "doc_id",
        "width",
        "height",
        F.round("mean_byte", 6).alias("mean_px"),
    )


@query(
    "multimodal_resize_decode",
    oracle=f"""
SELECT doc_id,
       CAST(greatest(CAST(floor(byte_len * (50176.0 / greatest(width * height, 1))) AS BIGINT), 1) AS BIGINT) AS byte_len,
       CAST(224 AS INTEGER) AS width,
       CAST(224 AS INTEGER) AS height,
       round(CAST(n_frames AS DOUBLE) / 16000.0, 6) AS duration_s
FROM ({_META_SQL})
""",
    description="mapInPandas resize stage composed with decode: payload "
    "rescaled to 224x224 (byte count scaled by the pixel ratio in the "
    "stub), metadata dims rewritten — the decode→resize→featurize chain "
    "every vision pipeline runs between the lake and the trainer",
)
def multimodal_resize_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import resize_media

    docs = load_table(spark, "documents", sf_dir)
    resized = resize_media(attach_media(docs), 224, 224)
    return decode_media(resized).select(
        "doc_id",
        "byte_len",
        "width",
        "height",
        F.round("duration_s", 6).alias("duration_s"),
    )


@query(
    "multimodal_mixed_codec",
    oracle="""
SELECT doc_id,
       CASE WHEN doc_id % 2 = 0 THEN 'image/png'
            ELSE 'image/x-portable-graymap' END AS media_type,
       CAST(4 + doc_id % 8 AS INTEGER) AS width,
       CAST(4 + (doc_id // 8) % 8 AS INTEGER) AS height,
       round(CAST(doc_id % 251 AS DOUBLE), 6) AS mean_px
FROM documents
""",
    description="format-dispatching decode over a MIXED media column: "
    "even ids carry real PNGs, odd ids real binary PGMs, one binary "
    "column + typed metadata; mixed_decode_batch routes each row to the "
    "matching pure-Python parser through the same mapInPandas plumbing. "
    "The oracle predicts geometry and pixel mean per format in closed "
    "form, so a decoder that ignores the format tag (or averages raw "
    "file bytes, header included) hash-mismatches",
)
def multimodal_mixed_codec(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import attach_mixed_media, mixed_decode_batch

    docs = load_table(spark, "documents", sf_dir)
    media = attach_mixed_media(docs)
    decoded = decode_media(media, decode_fn=mixed_decode_batch)
    fmt = F.when(F.col("doc_id") % 2 == 0, F.lit("image/png")).otherwise(
        F.lit("image/x-portable-graymap")
    )
    return decoded.select(
        "doc_id",
        fmt.alias("media_type"),
        "width",
        "height",
        F.round("mean_byte", 6).alias("mean_px"),
    )


@query(
    "multimodal_frame_dedup",
    # the frame slicing is the sample_frames stub (bytes i*size ..
    # (i+1)*size with size = max(len // max(n_frames, 1), 1)); the
    # fixture text is ASCII so DuckDB's substr over chars re-derives the
    # same bytes and md5 agrees byte-for-byte — the whole cross-media
    # frame-dedup result is hash-checked
    oracle="""
WITH m AS (
  SELECT doc_id, text,
         CAST(1 + length(text) % 16 AS INTEGER) AS n_frames,
         greatest(length(text) // greatest(1 + length(text) % 16, 1), 1)
           AS fsize
  FROM documents
),
fr AS (
  SELECT doc_id, t.i AS frame_idx,
         md5(substr(text, t.i * fsize + 1, fsize)) AS frame_md5
  FROM m CROSS JOIN LATERAL
       (SELECT unnest(generate_series(0, n_frames - 1)) AS i) t
)
SELECT frame_md5,
       count(*) AS n_occurrences,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       min(doc_id) AS min_doc
FROM fr
GROUP BY frame_md5
HAVING count(*) > 1
""",
    description="cross-media frame-level dedup: 1->N frame sampling "
    "(mapInPandas at the codec edge) then JVM-side md5 fingerprints "
    "grouped corpus-wide — the shuffle carries (16-byte hash, ids), "
    "never frame bytes; duplicate groups (shared intro/outro frames, "
    "re-uploads) surface with occurrence and document counts",
)
def multimodal_frame_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    frames = sample_frames(attach_media(docs), every=1)
    fp = frames.select(
        "doc_id", F.md5(F.col("frame_bytes")).alias("frame_md5")
    )
    return (
        fp.groupBy("frame_md5")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.count_distinct("doc_id").alias("n_docs"),
            F.min("doc_id").alias("min_doc"),
        )
        .where(F.col("n_occurrences") > 1)
    )


@query(
    "multimodal_phash_dedup",
    # the DCT hash has no SQL mirror; the exported (doc_id, phash)
    # table is the persisted perceptual index, and DuckDB re-derives
    # banding + candidate join + Hamming verify from it (63-bit hashes
    # are nonnegative, so arithmetic >> == logical >> in any engine)
    oracle=f"""
WITH h AS (SELECT * FROM {export_sql('multimodal_phash')}),
bt AS (
  SELECT doc_id, phash, t.band,
         (phash >> (8 * t.band))
           & (CASE WHEN t.band < 7 THEN 255 ELSE 127 END) AS bval
  FROM h CROSS JOIN
       (SELECT unnest(generate_series(0, 7)) AS band) t
)
SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.phash, b.phash)) AS INTEGER) AS hamming
FROM bt a JOIN bt b
  ON a.band = b.band AND a.bval = b.bval AND a.doc_id < b.doc_id
WHERE bit_count(xor(a.phash, b.phash)) <= 7
""",
    description="perceptual-hash near-dup over image media: the REAL "
    "pHash pipeline (2-D 32x32 resample from the decoded width/height "
    "buffer -> 2-D DCT-II -> 8x8 low-frequency block -> "
    "median-threshold bits) runs in one Arrow mapInPandas at the codec "
    "edge, then everything is JVM-side: the 63-bit hash splits into 8 "
    "fixed bands (pigeonhole-LOSSLESS candidates for Hamming <= 7 — "
    "never an all-pairs compare), XOR + bit_count verifies; the "
    "fixture plants half-resolution re-renders of every 5th image — "
    "the resized-re-upload exact md5 dedup is blind to (measured: "
    "variant pairs Hamming 0-8, unrelated >= 10) — and the query "
    "recovers them; the exported hash table is the persisted "
    "perceptual index (operators/multimodal.py:attach_pattern_media, "
    "phash63, phash_neardup_pairs)",
)
def multimodal_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..exports import export_table
    from ..operators.multimodal import (
        attach_pattern_media,
        phash63,
        phash_neardup_pairs,
    )

    docs = load_table(spark, "documents", sf_dir)
    hashes = export_table(
        phash63(attach_pattern_media(docs)), "multimodal_phash"
    )
    return phash_neardup_pairs(hashes, max_hamming=7)


@query(
    "multimodal_audio_energy",
    # closed-form ground truth (the attach_png discipline): the PCM is
    # synthesized from id arithmetic, so the oracle predicts every
    # window's energy WITHOUT seeing a byte — silent windows are
    # i ≡ (-id) mod 4, square-wave RMS is exactly the amplitude (the
    # int64 mean-of-squares is A^2 and sqrt(A^2) is IEEE-exact)
    oracle="""
WITH d AS (SELECT DISTINCT doc_id FROM documents),
w AS (
  SELECT doc_id, 8 + doc_id % 8 AS n_windows,
         (4 - doc_id % 4) % 4 AS r,
         1000 + (doc_id % 50) * 100 AS amp
  FROM d
)
SELECT doc_id,
       CAST(n_windows AS BIGINT) AS n_windows,
       CAST((n_windows - 1 - r) // 4 + 1 AS BIGINT) AS n_silent,
       round(CAST((n_windows - 1 - r) // 4 + 1 AS DOUBLE) / n_windows, 6)
         AS silence_share,
       round(CAST(amp AS DOUBLE), 6) AS active_rms
FROM w
""",
    description="audio windowed-energy analysis (the voice-activity / "
    "silence-trim primitive): int16 PCM framed into 256-sample windows "
    "with per-window RMS + peak computed as real numpy work in one "
    "Arrow mapInPandas (int64 mean-of-squares — exact for int16, so "
    "RMS is engine/host-deterministic), then a JVM-side per-document "
    "rollup of silence share and active-window level; the synthetic "
    "PCM has closed-form ground truth, so the oracle verifies the "
    "whole decode->frame->energy pipeline from id arithmetic alone "
    "(operators/multimodal.py:attach_audio_media, audio_window_energy)",
)
def multimodal_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import attach_audio_media, audio_window_energy

    docs = load_table(spark, "documents", sf_dir)
    en = audio_window_energy(attach_audio_media(docs))
    return en.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_windows"),
        F.sum((F.col("rms") == 0).cast("long")).alias("n_silent"),
        F.round(
            F.sum((F.col("rms") == 0).cast("long")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("silence_share"),
        F.round(
            F.avg(F.when(F.col("rms") > 0, F.col("rms"))), 6
        ).alias("active_rms"),
    )
