"""Multimodal-column specs: driver-checkable image/video plumbing.

The lake's blob posture comes from the reference's opaque course
tarballs (``mitx/mitx_etl.py:115-116``); the training-data
generalization is media as ``binary`` columns + typed metadata with
Arrow-batched decode stages (``operators/multimodal.py``).

No media fixture exists, so each spec derives a deterministic media
table from ``documents``: ``content = encode(text)`` (the fixture is
pure ASCII, so char offsets == byte offsets), ``kind`` cycles
image/video/audio by ``doc_id % 3``. The fake decoder hashes the blob
with md5 — DuckDB computes the identical digest over the identical
bytes, so the whole mapInPandas path is hash-checked against SQL, not
just unit-tested. A real decoder (PIL/ffmpeg) drops into the same seam.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from odl_etl_spark.io.sources import load_table, spread
from odl_etl_spark.functions.numeric import roundn
from odl_etl_spark.operators.multimodal import (
    extract_audio_features,
    extract_image_features,
    sample_video_frames,
)
from odl_etl_spark.queries.base import spec

# DuckDB value of hex nibble j (1-based) of digest d.
_NIB = "(strpos('0123456789abcdef', substring({d}, {j}, 1)) - 1)"


def _hexval(d: str, start: int, n: int) -> str:
    """DuckDB expression: integer value of n hex nibbles of ``d``
    starting at 1-based position ``start``."""
    return " + ".join(
        f"{_NIB.format(d=d, j=start + i)} * {16 ** (n - 1 - i)}" for i in range(n)
    )


def media_from_documents(spark, sf_dir):
    """Deterministic media table: blob = utf-8 text bytes, kind by id."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("video"), F.lit("audio")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("kind"),
        F.element_at(
            F.array(F.lit("image/png"), F.lit("video/mp4"), F.lit("audio/wav")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("mime"),
        F.encode("text", "utf-8").alias("content"),
        F.create_map(F.lit("lang"), F.col("lang")).alias("meta"),
    )


@spec(
    "multimodal_catalog",
    """
    SELECT CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'video'
           ELSE 'audio' END AS kind,
           COUNT(*) AS n_assets,
           CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
           CAST(MAX(octet_length(encode(text))) AS BIGINT) AS max_bytes
    FROM documents GROUP BY 1
    """,
    doc=(
        "Metadata-only media catalog: per-kind asset count and byte "
        "totals. The blob column feeds only octet_length, and on a real "
        "parquet media table the metadata-only projection prunes the "
        "bytes at the scan — the cheap-catalog-query story for a 100 TB "
        "media lake."
    ),
)
def multimodal_catalog(spark, sf_dir):
    m = media_from_documents(spark, sf_dir)
    return m.groupBy("kind").agg(
        F.count("*").alias("n_assets"),
        F.sum(F.length("content")).alias("total_bytes"),
        F.max(F.length("content")).cast("bigint").alias("max_bytes"),
    )


@spec(
    "multimodal_image_features",
    f"""
    WITH img AS (
      SELECT doc_id AS media_id, md5(text) AS d,
             octet_length(encode(text)) AS n_bytes
      FROM documents WHERE doc_id % 3 = 0
    )
    SELECT media_id,
           CAST(16 + ({_hexval('d', 1, 4)}) % 1024 AS INTEGER) AS width,
           CAST(16 + ({_hexval('d', 5, 4)}) % 1024 AS INTEGER) AS height,
           CAST(n_bytes AS BIGINT) AS n_bytes,
           CAST({_hexval('d', 1, 2)} AS INTEGER) AS emb_b0,
           CAST({_hexval('d', 15, 2)} AS INTEGER) AS emb_b7
    FROM img
    """,
    doc=(
        "Arrow-batched image decode/featurize over mapInPandas "
        "(operators/multimodal.py:extract_image_features): blobs in, "
        "(width, height, embedding) out, bytes dropped before any "
        "shuffle. The fake decoder derives features from md5(content), "
        "so DuckDB reproduces them from the same bytes — the Python "
        "batch path is hash-checked end to end. emb_b0/emb_b7 recover "
        "the first/last embedding bytes exactly (float32 b/255 "
        "round-trips through ROUND(x*255) losslessly)."
    ),
)
def multimodal_image_features(spark, sf_dir):
    feats = extract_image_features(media_from_documents(spark, sf_dir))
    return feats.select(
        "media_id",
        "width",
        "height",
        "n_bytes",
        F.round(F.element_at("embedding", 1) * 255).cast("int").alias("emb_b0"),
        F.round(F.element_at("embedding", 8) * 255).cast("int").alias("emb_b7"),
    )


@spec(
    "multimodal_video_frames",
    """
    WITH vid AS (
      SELECT doc_id AS media_id, text,
             LEAST(GREATEST(octet_length(encode(text)) // 64, 1), 8)
               AS n_frames
      FROM documents WHERE doc_id % 3 = 1
    )
    SELECT media_id,
           CAST(UNNEST(range(0, n_frames)) AS INTEGER) AS frame_idx,
           md5(substring(text, CAST(UNNEST(range(0, n_frames)) AS INTEGER) * 64 + 1, 64))
             AS frame_md5
    FROM vid
    """,
    doc=(
        "Video frame-sampling fan-out (operators/multimodal.py:"
        "sample_video_frames): one blob row explodes into up to 8 frame "
        "rows via mapInPandas, the downstream join shape for a frame "
        "featurizer. Frames are byte slices of the blob; md5 of each "
        "slice is recomputed by DuckDB on char slices (ASCII fixture: "
        "char == byte), hash-checking the fan-out exactly."
    ),
)
def multimodal_video_frames(spark, sf_dir):
    frames = sample_video_frames(
        media_from_documents(spark, sf_dir), every_n_bytes=64, max_frames=8
    )
    return frames.select(
        "media_id", "frame_idx", F.md5("frame_bytes").alias("frame_md5")
    )


@spec(
    "multimodal_audio_features",
    f"""
    WITH aud AS (
      SELECT doc_id AS media_id, md5(text) AS d,
             octet_length(encode(text)) AS n_bytes
      FROM documents WHERE doc_id % 3 = 2
    )
    SELECT media_id,
           CAST(CASE ({_hexval('d', 1, 1)}) % 4
                WHEN 0 THEN 8000 WHEN 1 THEN 16000
                WHEN 2 THEN 22050 ELSE 44100 END AS INTEGER) AS sample_rate,
           CAST(n_bytes * 4 AS BIGINT) AS n_samples,
           CAST(n_bytes * 4 * 1000 //
                (CASE ({_hexval('d', 1, 1)}) % 4
                 WHEN 0 THEN 8000 WHEN 1 THEN 16000
                 WHEN 2 THEN 22050 ELSE 44100 END) AS BIGINT) AS duration_ms,
           ROUND((CAST({_hexval('d', 9, 4)} AS DOUBLE) / 65535) * 1000000)
             / 1000000 AS rms
    FROM aud
    """,
    doc=(
        "Arrow-batched audio decode/featurize over mapInPandas "
        "(operators/multimodal.py:extract_audio_features): blobs in, "
        "(sample_rate, n_samples, duration_ms, rms) out, bytes dropped "
        "before any shuffle — completes the image/video/audio modality "
        "set. The fake decoder derives features from md5(content) and "
        "byte length, so DuckDB recomputes them from the same bytes and "
        "the Python batch path is hash-checked end to end."
    ),
)
def multimodal_audio_features(spark, sf_dir):
    feats = extract_audio_features(media_from_documents(spark, sf_dir))
    return feats.select(
        "media_id",
        "sample_rate",
        "n_samples",
        "duration_ms",
        roundn(F.col("rms"), 6).alias("rms"),
    )


SPECS = [
    multimodal_catalog,
    multimodal_image_features,
    multimodal_video_frames,
    multimodal_audio_features,
]
