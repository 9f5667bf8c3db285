"""Multimodal (image/audio/video) column plumbing.

Media lives in the lake as opaque ``binary`` columns + typed metadata —
the same blob posture as the reference's course tarballs
(``mitx/mitx_etl.py:115-116``, read back via ``binaryFile``). Decode /
resize / frame-sample run as Arrow-batched ``mapInPandas`` stages: the
Spark side (schemas, batching, partition sizing) is real and tested;
the codec call itself is a seam — this container has no media libraries,
so the default decoder is a deterministic fake and a real one (PIL,
ffmpeg, torchaudio) drops into the same signature.

Scale posture: blobs make rows wide — keep ``maxPartitionBytes`` modest,
never collect, and project metadata-only whenever the blob isn't needed
(column pruning skips the bytes entirely in Parquet).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("mime", T.StringType()),
        T.StructField("content", T.BinaryType()),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ]
)


def fake_image_decode(content: bytes) -> dict[str, Any]:
    """Deterministic stand-in for a real image decoder.

    Derives (width, height, 8-dim embedding) from ``md5(content)`` —
    reproducible AND cross-engine computable (DuckDB's ``md5`` over the
    same blob yields the same digest), so the mapInPandas plumbing is
    differentially verifiable, not merely unit-tested. A real
    implementation (PIL/torchvision) has the same contract: bytes in,
    dict of features out.
    """
    if content is None or len(content) == 0:
        raise NotImplementedError(
            "real media decoding requires an image library not present in "
            "this environment; empty payloads have no fake features"
        )
    import hashlib

    d = hashlib.md5(bytes(content)).hexdigest()
    return {
        "width": 16 + int(d[0:4], 16) % 1024,
        "height": 16 + int(d[4:8], 16) % 1024,
        "embedding": [int(d[2 * i : 2 * i + 2], 16) / 255.0 for i in range(8)],
    }


def pil_image_decode(content: bytes) -> dict[str, Any]:
    """Real image decoder behind the same bytes→dict contract as
    ``fake_image_decode``: width/height from the decoded image, and an
    8-dim embedding = mean luma of 8 vertical bands (deterministic, no
    model weights). Imports PIL lazily; raises ImportError when Pillow
    is absent — use ``image_decoder()`` to fall back automatically."""
    import io

    from PIL import Image  # lazy: not a hard dependency

    if content is None or len(content) == 0:
        raise ValueError("empty image payload")
    img = Image.open(io.BytesIO(bytes(content)))
    gray = img.convert("L")
    w, h = img.size
    # 8 vertical bands, mean luma each, normalized to [0, 1].
    band_w = max(w // 8, 1)
    px = list(gray.getdata())
    emb = []
    for b in range(8):
        lo, hi = b * band_w, min((b + 1) * band_w, w)
        if lo >= w:
            emb.append(0.0)
            continue
        vals = [px[y * w + x] for y in range(h) for x in range(lo, hi)]
        emb.append(sum(vals) / (len(vals) * 255.0))
    return {"width": w, "height": h, "embedding": emb}


def image_decoder() -> Callable[[bytes], dict[str, Any]]:
    """The best available image decoder: PIL-backed when Pillow is
    importable, the deterministic fake otherwise. The CORRECTNESS keys
    always pass ``fake_image_decode`` explicitly (cross-engine
    hash-checkable); this selector is for real pipeline use."""
    try:
        import PIL  # noqa: F401

        return pil_image_decode
    except ImportError:
        return fake_image_decode


def extract_image_features(
    media: DataFrame,
    decoder: Callable[[bytes], dict[str, Any]] = fake_image_decode,
) -> DataFrame:
    """Decode + featurize image blobs via Arrow-batched ``mapInPandas``.

    One Python worker call per Arrow batch (not per row); the blob column
    is projected in, features out — the output drops the bytes, so
    downstream stages shuffle only features.
    """

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decoder(c) for c in pdf["content"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": [f["width"] for f in feats],
                    "height": [f["height"] for f in feats],
                    "n_bytes": pdf["content"].map(len),
                    "embedding": [f["embedding"] for f in feats],
                }
            )

    return media.where(F.col("kind") == "image").mapInPandas(
        decode_batches, schema=IMAGE_FEATURES_SCHEMA
    )


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("rms", T.DoubleType()),
    ]
)

_FAKE_RATES = (8000, 16000, 22050, 44100)


def fake_audio_decode(content: bytes) -> dict[str, Any]:
    """Deterministic stand-in for a real audio decoder (same contract as
    ``fake_image_decode``): md5-derived sample rate / RMS, byte-count-
    derived sample count, so DuckDB reproduces every feature from the
    same blob and the mapInPandas path is hash-checked, not just
    unit-tested. A real implementation (soundfile/torchaudio) drops into
    the same signature: bytes in, dict of features out."""
    if content is None or len(content) == 0:
        raise NotImplementedError(
            "real media decoding requires an audio library not present in "
            "this environment; empty payloads have no fake features"
        )
    import hashlib

    d = hashlib.md5(bytes(content)).hexdigest()
    n_samples = len(content) * 4
    rate = _FAKE_RATES[int(d[0], 16) % 4]
    return {
        "sample_rate": rate,
        "n_samples": n_samples,
        "duration_ms": n_samples * 1000 // rate,
        "rms": int(d[8:12], 16) / 65535.0,
    }


def soundfile_audio_decode(content: bytes) -> dict[str, Any]:
    """Real audio decoder behind the same bytes→dict contract as
    ``fake_audio_decode``: sample rate / sample count from the container
    header, RMS over the decoded waveform. Imports soundfile lazily;
    raises ImportError when absent — use ``audio_decoder()`` to fall
    back automatically."""
    import io
    import math

    import soundfile as sf  # lazy: not a hard dependency

    if content is None or len(content) == 0:
        raise ValueError("empty audio payload")
    data, rate = sf.read(io.BytesIO(bytes(content)), dtype="float64")
    flat = data.reshape(-1) if getattr(data, "ndim", 1) > 1 else data
    n_frames = len(data)
    rms = math.sqrt(float((flat * flat).mean())) if len(flat) else 0.0
    return {
        "sample_rate": int(rate),
        "n_samples": int(n_frames),
        "duration_ms": int(n_frames) * 1000 // int(rate),
        "rms": rms,
    }


def audio_decoder() -> Callable[[bytes], dict[str, Any]]:
    """The best available audio decoder: soundfile-backed when
    importable, the deterministic fake otherwise (same selection
    contract as ``image_decoder``)."""
    try:
        import soundfile  # noqa: F401

        return soundfile_audio_decode
    except ImportError:
        return fake_audio_decode


def extract_audio_features(
    media: DataFrame,
    decoder: Callable[[bytes], dict[str, Any]] = fake_audio_decode,
) -> DataFrame:
    """Decode + featurize audio blobs via Arrow-batched ``mapInPandas``;
    same batching/projection posture as ``extract_image_features``."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decoder(c) for c in pdf["content"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "sample_rate": [f["sample_rate"] for f in feats],
                    "n_samples": [f["n_samples"] for f in feats],
                    "duration_ms": [f["duration_ms"] for f in feats],
                    "rms": [f["rms"] for f in feats],
                }
            )

    return media.where(F.col("kind") == "audio").mapInPandas(
        decode_batches, schema=AUDIO_FEATURES_SCHEMA
    )


def sample_video_frames(
    media: DataFrame, every_n_bytes: int = 1024, max_frames: int = 8
) -> DataFrame:
    """Frame-sampling plumbing: one input blob row → N frame rows.

    The fake "frame" is a byte-offset slice marker; a real implementation
    yields decoded frames at timestamps. Output shape (media_id,
    frame_idx, frame_bytes) is what a downstream image-featurizer joins
    on — the explode/fan-out pattern is the part that matters at scale.
    """
    frame_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame_bytes", T.BinaryType()),
        ]
    )

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {"media_id": [], "frame_idx": [], "frame_bytes": []}
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                n = min(max(len(content) // every_n_bytes, 1), max_frames)
                for i in range(n):
                    out["media_id"].append(mid)
                    out["frame_idx"].append(i)
                    out["frame_bytes"].append(
                        bytes(content[i * every_n_bytes : (i + 1) * every_n_bytes])
                    )
            yield pd.DataFrame(out)

    return media.where(F.col("kind") == "video").mapInPandas(frames, schema=frame_schema)
