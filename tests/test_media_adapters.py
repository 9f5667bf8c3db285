"""Real-media decoder adapters (VERDICT.md r4, Next-round #4).

``pil_image_decode`` / ``soundfile_audio_decode`` sit behind the exact
bytes→dict contract the fake decoders define, import their library
lazily, and ``image_decoder()`` / ``audio_decoder()`` select the real
one when importable, the deterministic fake otherwise. The CORRECTNESS
keys stay on the fakes (cross-engine hash-checkable); these tests cover
the adapter layer — with a tiny synthetic PNG/WAV when the library is
present, skipped-with-reason otherwise.
"""

from __future__ import annotations

import struct
import zlib

import pytest

from odl_etl_spark.operators.multimodal import (
    audio_decoder,
    fake_audio_decode,
    fake_image_decode,
    image_decoder,
    pil_image_decode,
    soundfile_audio_decode,
)


def _has(mod: str) -> bool:
    try:
        __import__(mod)
        return True
    except ImportError:
        return False


def _png_chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def _tiny_png(w: int = 4, h: int = 2, value: int = 128) -> bytes:
    """Hand-built grayscale PNG (no image library needed to CREATE it):
    signature + IHDR + zlib'd scanlines + IEND."""
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)  # 8-bit grayscale
    raw = b"".join(b"\x00" + bytes([value]) * w for _ in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )


def _tiny_wav(rate: int = 8000, n: int = 1600, amp: int = 0) -> bytes:
    """16-bit mono PCM WAV via the stdlib wave module."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(struct.pack("<h", amp) * n)
    return buf.getvalue()


def test_image_adapter_selection():
    want = pil_image_decode if _has("PIL") else fake_image_decode
    assert image_decoder() is want


def test_audio_adapter_selection():
    want = soundfile_audio_decode if _has("soundfile") else fake_audio_decode
    assert audio_decoder() is want


@pytest.mark.skipif(not _has("PIL"), reason="Pillow not installed in this environment")
def test_pil_decode_synthetic_png():
    feats = pil_image_decode(_tiny_png(w=4, h=2, value=128))
    assert (feats["width"], feats["height"]) == (4, 2)
    assert len(feats["embedding"]) == 8
    # Uniform 128-luma image → every band mean ≈ 128/255.
    assert all(abs(v - 128 / 255.0) < 1e-6 for v in feats["embedding"] if v > 0)


@pytest.mark.skipif(
    not _has("soundfile"), reason="soundfile not installed in this environment"
)
def test_soundfile_decode_synthetic_wav():
    feats = soundfile_audio_decode(_tiny_wav(rate=8000, n=1600, amp=0))
    assert feats["sample_rate"] == 8000
    assert feats["n_samples"] == 1600
    assert feats["duration_ms"] == 200
    assert feats["rms"] == pytest.approx(0.0, abs=1e-9)


def test_real_adapters_raise_importerror_without_libs():
    """Without the libraries the REAL adapters raise ImportError (so the
    selectors fall back) rather than failing deep in a Spark task."""
    if not _has("PIL"):
        with pytest.raises(ImportError):
            pil_image_decode(_tiny_png())
    if not _has("soundfile"):
        with pytest.raises(ImportError):
            soundfile_audio_decode(_tiny_wav())


def test_selected_decoder_plugs_into_mapinpandas(spark):
    """Whichever decoder the selector picks, extract_image_features
    accepts it — real bytes when PIL is present, fake-featurizable bytes
    otherwise — proving the adapter honors the plumbing contract."""
    from odl_etl_spark.operators.multimodal import extract_image_features

    dec = image_decoder()
    content = _tiny_png() if dec is pil_image_decode else b"not-a-real-image"
    media = spark.createDataFrame(
        [(1, "image", "image/png", bytearray(content), {})],
        "media_id long, kind string, mime string, content binary, "
        "meta map<string,string>",
    )
    [row] = extract_image_features(media, decoder=dec).collect()
    assert row["media_id"] == 1
    assert row["width"] > 0 and row["height"] > 0
    assert len(row["embedding"]) == 8
