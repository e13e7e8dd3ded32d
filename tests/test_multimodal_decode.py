"""The genuine codec path: decode_ppm must parse real PPM bytes without
any image library, decode_image must route P6 payloads to it (and only
gate COMPRESSED formats on pillow), and the oracle-checked decode query
must produce exact channel means. Complements the digest-feature
fallback tests in test_llm_ops.py."""

from __future__ import annotations

import numpy as np
import pytest

from data_engineering_spotify_etl_airflow_aws_spark.operators.multimodal import (
    _wav_header,
    decode_image,
    decode_ppm,
    decode_wav,
)


def _make_ppm(w: int, h: int, pixel_bytes: bytes) -> bytes:
    return f"P6\n{w} {h}\n255\n".encode() + pixel_bytes


def test_decode_ppm_roundtrip():
    rng = np.random.default_rng(7)
    pixels = rng.integers(0, 256, size=(3, 2, 3), dtype=np.uint8)
    w, h, arr = decode_ppm(_make_ppm(2, 3, pixels.tobytes()))
    assert (w, h) == (2, 3)
    assert arr.shape == (3, 2, 3)
    assert np.array_equal(arr, pixels)


def test_decode_ppm_rejects_garbage():
    with pytest.raises(ValueError, match="not a binary PPM"):
        decode_ppm(b"\x89PNG\r\n\x1a\n....")
    with pytest.raises(ValueError, match="truncated PPM pixel data"):
        decode_ppm(b"P6\n4 4\n255\nshort")
    with pytest.raises(ValueError, match="16-bit"):
        decode_ppm(b"P6\n1 1\n65535\n" + b"\x00" * 6)


def test_decode_ppm_rejects_nonpositive_dimensions():
    # int() parses "-3"; without the guard a negative frombuffer count
    # reads the whole buffer and fails in reshape instead of raising
    # the parser's documented ValueError dialect.
    for bad in (b"P6\n-3 4\n255\n", b"P6\n4 0\n255\n", b"P6\n2 2\n0\n"):
        with pytest.raises(ValueError, match="invalid PPM dimensions"):
            decode_ppm(bad + b"\x00" * 64)


def test_decode_image_routes_ppm_without_pillow():
    pixels = bytes(range(48))
    w, h, arr = decode_image(_make_ppm(4, 4, pixels))
    assert (w, h) == (4, 4)
    assert arr.tobytes() == pixels


def test_decode_wav_roundtrip():
    rng = np.random.default_rng(11)
    samples = rng.integers(-32768, 32768, size=32, dtype=np.int16)
    payload = _wav_header(32, 8000) + samples.astype("<i2").tobytes()
    rate, channels, got = decode_wav(payload)
    assert (rate, channels) == (8000, 1)
    assert np.array_equal(got, samples)


def test_decode_wav_skips_extra_chunks():
    # a LIST metadata chunk between fmt and data must be walked over
    samples = np.arange(4, dtype="<i2")
    hdr = _wav_header(4, 8000)
    fmt_end = 12 + 8 + 16  # RIFF hdr + fmt chunk
    payload = (
        hdr[:fmt_end]
        + b"LIST" + (4).to_bytes(4, "little") + b"INFO"
        + hdr[fmt_end:]
        + samples.tobytes()
    )
    rate, channels, got = decode_wav(payload)
    assert rate == 8000 and np.array_equal(got, samples)


def test_decode_wav_rejects_non_pcm():
    import struct

    hdr = bytearray(_wav_header(4, 8000))
    struct.pack_into("<H", hdr, 20, 3)  # audio_format = IEEE float
    with pytest.raises(ValueError, match="16-bit PCM"):
        decode_wav(bytes(hdr) + b"\x00" * 8)
    with pytest.raises(ValueError, match="not a RIFF/WAVE"):
        decode_wav(b"OggS" + b"\x00" * 40)


def test_decode_wav_rejects_truncation():
    # data chunk declares 8 samples but only 4 bytes follow: must raise,
    # not silently return a shorter sample array (review finding)
    payload = _wav_header(8, 8000) + b"\x01\x02\x03\x04"
    with pytest.raises(ValueError, match="truncated WAVE data"):
        decode_wav(payload)
    # fmt chunk shorter than the 16 PCM bytes: ValueError, not struct.error
    bad_fmt = (
        b"RIFF" + (20).to_bytes(4, "little") + b"WAVEfmt "
        + (4).to_bytes(4, "little") + b"\x01\x00\x01\x00"
    )
    with pytest.raises(ValueError, match="truncated WAVE fmt"):
        decode_wav(bad_fmt)


def test_decode_y4m_degenerate_payload_errors():
    from data_engineering_spotify_etl_airflow_aws_spark.operators.multimodal import (
        decode_y4m,
    )

    # all malformed-input paths must speak the parser's ValueError
    # dialect, not leak numpy/bytes internals (review finding)
    with pytest.raises(ValueError, match="no frames"):
        decode_y4m(b"YUV4MPEG2 W4 H4 C444\n")
    with pytest.raises(ValueError, match="truncated y4m stream header"):
        decode_y4m(b"YUV4MPEG2 W4 H4 C444")
    with pytest.raises(ValueError, match="truncated y4m frame header"):
        decode_y4m(b"YUV4MPEG2 W4 H4 C444\nFRAME")


def test_decode_y4m_roundtrip():
    from data_engineering_spotify_etl_airflow_aws_spark.operators.multimodal import (
        decode_y4m,
    )

    rng = np.random.default_rng(13)
    frames = rng.integers(0, 256, size=(2, 3, 4, 4), dtype=np.uint8)
    payload = b"YUV4MPEG2 W4 H4 F25:1 Ip A1:1 C444\n" + b"".join(
        b"FRAME\n" + f.tobytes() for f in frames
    )
    w, h, got = decode_y4m(payload)
    assert (w, h) == (4, 4)
    assert np.array_equal(got, frames)


def test_decode_y4m_rejects_unsupported():
    from data_engineering_spotify_etl_airflow_aws_spark.operators.multimodal import (
        decode_y4m,
    )

    with pytest.raises(ValueError, match="not a YUV4MPEG2"):
        decode_y4m(b"RIFF....AVI LIST\n")
    with pytest.raises(ValueError, match="C444"):
        decode_y4m(b"YUV4MPEG2 W4 H4 C420jpeg\nFRAME\n" + b"\x00" * 24)
    with pytest.raises(ValueError, match="truncated y4m frame"):
        decode_y4m(b"YUV4MPEG2 W4 H4 C444\nFRAME\n" + b"\x00" * 10)


def test_decode_image_still_gates_compressed_formats():
    # this container ships no pillow, so a JPEG payload must raise the
    # documented seam error rather than mis-decode
    with pytest.raises((NotImplementedError, OSError)):
        decode_image(b"\xff\xd8\xff\xe0" + b"\x00" * 32)
