"""The genuine codec path: decode_ppm/decode_png/decode_jpeg must parse
real bytes without any image library, decode_image must route every
signature to the right native codec, and the oracle-checked decode
queries must produce exact channel means. Complements the digest-feature
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


def test_decode_image_routes_jpeg_natively():
    # since r10 the JPEG signature routes to the native baseline decoder
    # (no pillow anywhere): a malformed stream raises the codec dialect,
    # a valid one round-trips
    import numpy as np

    from data_engineering_spotify_etl_airflow_aws_spark.operators.multimodal import (
        encode_jpeg_gray,
    )

    with pytest.raises(ValueError):
        decode_image(b"\xff\xd8\xff\xe0" + b"\x00" * 32)
    img = np.kron(
        np.arange(4, dtype=np.int64).reshape(2, 2) * 60,
        np.ones((8, 8), dtype=np.int64),
    ).astype(np.uint8)
    w, h, arr = decode_image(encode_jpeg_gray(img))
    assert (w, h) == (16, 16)
    assert np.array_equal(arr, img)


# ---------------------------------------------------------------------------
# PNG: the compressed-format codec (stdlib zlib + numpy unfilter).


def _spec_filter_scanline(ftype, cur, prev):
    """Independent per-spec (RFC 2083 §6) scalar filter implementation,
    deliberately NOT sharing code with the engine's encoder: used to
    prove encode_png's filtered bytes match the standard, which breaks
    the encode/decode circularity of the oracle query."""
    bpp, out = 3, []
    for x in range(len(cur)):
        a = cur[x - bpp] if x >= bpp else 0
        b = prev[x]
        c = prev[x - bpp] if x >= bpp else 0
        if ftype == 0:
            pred = 0
        elif ftype == 1:
            pred = a
        elif ftype == 2:
            pred = b
        elif ftype == 3:
            pred = (a + b) >> 1
        else:
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
        out.append((cur[x] - pred) & 0xFF)
    return bytes(out)


def test_png_roundtrip_all_filters():
    from data_engineering_spotify_etl_airflow_aws_spark.operators.multimodal import (
        decode_png,
        encode_png,
    )

    rng = np.random.default_rng(11)
    # h=10 cycles filter types 0..4 twice (encode uses r % 5)
    pixels = rng.integers(0, 256, size=(10, 7, 3), dtype=np.uint8)
    w, h, arr = decode_png(encode_png(pixels))
    assert (w, h) == (7, 10)
    assert np.array_equal(arr, pixels)


def test_png_encoder_matches_spec_filters():
    import zlib

    from data_engineering_spotify_etl_airflow_aws_spark.operators.multimodal import (
        encode_png,
    )

    rng = np.random.default_rng(13)
    pixels = rng.integers(0, 256, size=(5, 4, 3), dtype=np.uint8)
    payload = encode_png(pixels)
    # locate the IDAT body and inflate it
    idx = payload.index(b"IDAT")
    (size,) = __import__("struct").unpack(">I", payload[idx - 4 : idx])
    raw = zlib.decompress(payload[idx + 4 : idx + 4 + size])
    stride = 1 + 4 * 3
    rows = [list(map(int, pixels[r].reshape(-1))) for r in range(5)]
    for r in range(5):
        line = raw[r * stride : (r + 1) * stride]
        assert line[0] == r % 5
        prev = rows[r - 1] if r else [0] * 12
        assert line[1:] == _spec_filter_scanline(r % 5, rows[r], prev)


def test_png_decodes_independently_built_payload():
    """A PNG assembled in the test from the spec (filter 0 + filter 2
    rows, chunks and CRCs written longhand) must decode exactly —
    decoder correctness without touching the engine's encoder."""
    import struct
    import zlib

    from data_engineering_spotify_etl_airflow_aws_spark.operators.multimodal import (
        decode_png,
    )

    def chunk(ctype, body):
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    row0 = bytes([10, 20, 30, 40, 50, 60])  # 2x2 RGB, w=2
    row1_raw = bytes([15, 25, 35, 45, 55, 65])
    # row1 filtered with Up: raw - prior_row mod 256
    row1_up = bytes((row1_raw[i] - row0[i]) & 0xFF for i in range(6))
    scanlines = b"\x00" + row0 + b"\x02" + row1_up
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)
    payload = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(scanlines))
        + chunk(b"IEND", b"")
    )
    w, h, arr = decode_png(payload)
    assert (w, h) == (2, 2)
    assert arr.reshape(-1).tolist() == list(row0) + list(row1_raw)


def test_png_rejects_malformed_payloads():
    import struct
    import zlib

    from data_engineering_spotify_etl_airflow_aws_spark.operators.multimodal import (
        decode_png,
        encode_png,
    )

    good = encode_png(np.zeros((2, 2, 3), dtype=np.uint8))
    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"P6\n2 2\n255\n" + b"\x00" * 12)
    # flip one IDAT byte -> CRC mismatch
    idx = good.index(b"IDAT") + 5
    bad_crc = good[:idx] + bytes([good[idx] ^ 0xFF]) + good[idx + 1 :]
    with pytest.raises(ValueError, match="CRC mismatch"):
        decode_png(bad_crc)
    # cut inside the declared IDAT body -> chunk-level truncation
    with pytest.raises(ValueError, match="truncated PNG chunk"):
        decode_png(good[: good.index(b"IDAT") + 6])
    # cut the IEND tail off entirely -> stream-level truncation
    with pytest.raises(ValueError, match="PNG missing IEND"):
        decode_png(good[:-6])

    def chunk(ctype, body):
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    sig = b"\x89PNG\r\n\x1a\n"
    gray = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)
    with pytest.raises(ValueError, match="only 8-bit RGB"):
        decode_png(sig + chunk(b"IHDR", gray) + chunk(b"IEND", b""))
    interlaced = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 1)
    with pytest.raises(ValueError, match="interlace"):
        decode_png(sig + chunk(b"IHDR", interlaced) + chunk(b"IEND", b""))
    zero_dim = struct.pack(">IIBBBBB", 0, 2, 8, 2, 0, 0, 0)
    with pytest.raises(ValueError, match="invalid PNG dimensions"):
        decode_png(sig + chunk(b"IHDR", zero_dim) + chunk(b"IEND", b""))
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)
    short = zlib.compress(b"\x00" + b"\x01" * 6)  # one row, needs two
    with pytest.raises(ValueError, match="size mismatch"):
        decode_png(
            sig + chunk(b"IHDR", ihdr) + chunk(b"IDAT", short)
            + chunk(b"IEND", b"")
        )
    garbage = chunk(b"IDAT", b"not-deflate-data")
    with pytest.raises(ValueError, match="corrupt PNG IDAT"):
        decode_png(sig + chunk(b"IHDR", ihdr) + garbage + chunk(b"IEND", b""))
    bad_filter = zlib.compress(
        b"\x09" + b"\x00" * 6 + b"\x00" + b"\x00" * 6
    )
    with pytest.raises(ValueError, match="invalid PNG filter type"):
        decode_png(
            sig + chunk(b"IHDR", ihdr) + chunk(b"IDAT", bad_filter)
            + chunk(b"IEND", b"")
        )


def test_decode_image_routes_png_natively():
    from data_engineering_spotify_etl_airflow_aws_spark.operators.multimodal import (
        encode_png,
    )

    pixels = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    w, h, arr = decode_image(encode_png(pixels))
    assert (w, h) == (4, 4)
    assert np.array_equal(arr, pixels)


def test_documents_text_is_ascii_at_all_fixture_sfs():
    """The synthetic-payload fixtures (PPM / PNG / WAV / Y4M queries)
    slice documents.text by CHARACTER (substring/rpad) and then
    encode(..., 'UTF-8') assuming one byte per character; the DuckDB
    oracles additionally read ord() as a byte value. Both only hold for
    pure-ASCII text (r9 ADVICE #3): a single multi-byte character would
    produce an oversized payload that fails the frombuffer/reshape.
    Assert that invariant once, per scale factor, over the exact column
    the fixtures consume — if a future fixture generator emits
    non-ASCII, this fails loudly instead of the codec queries failing
    obscurely.
    """
    import os

    import duckdb

    testdata = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
    checked = 0
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        path = os.path.join(testdata, sf, "documents.parquet")
        if not os.path.exists(path):
            continue
        con = duckdb.connect()
        try:
            n_bad, n_rows = con.execute(
                f"""
                SELECT count(*) FILTER (
                           WHERE octet_length(encode(text)) <> length(text)
                       ),
                       count(*)
                FROM '{path}'
                """
            ).fetchone()
        finally:
            con.close()
        assert n_rows > 0
        assert n_bad == 0, (
            f"{sf}: {n_bad} documents.text rows contain non-ASCII "
            "characters; the multimodal fixture constructors assume "
            "1 byte per character"
        )
        checked += 1
    assert checked >= 2  # the driver ships at least sf0.001 + sf0.01


# ---------------------------------------------------------------------------
# JPEG: the Huffman + IDCT codec (r10; dependency-free baseline T.81).


def _jpeg_parts():
    from data_engineering_spotify_etl_airflow_aws_spark.operators.multimodal import (
        _JPEG_A,
        _JPEG_ZIGZAG,
        decode_jpeg,
        encode_jpeg_gray,
    )

    return _JPEG_A, _JPEG_ZIGZAG, decode_jpeg, encode_jpeg_gray


def test_jpeg_zigzag_is_the_spec_table():
    """The zigzag scan order written out per T.81 figure 5 - a literal
    second copy so a typo in the module constant cannot self-verify."""
    _, zz, _, _ = _jpeg_parts()
    expect = []
    r = c = 0
    up = True
    for _ in range(64):
        expect.append(r * 8 + c)
        if up:
            if c == 7:
                r += 1
                up = False
            elif r == 0:
                c += 1
                up = False
            else:
                r -= 1
                c += 1
        else:
            if r == 7:
                c += 1
                up = True
            elif c == 0:
                r += 1
                up = True
            else:
                r += 1
                c -= 1
    assert list(zz) == expect


def test_jpeg_idct_matches_naive_reference():
    """The matrix IDCT must equal the O(n^4) per-spec double sum."""
    import math

    import numpy as np

    A, _, _, _ = _jpeg_parts()
    rng = np.random.default_rng(3)
    F = rng.integers(-1024, 1024, (8, 8)).astype(np.float64)
    got = A.T @ F @ A
    ref = np.zeros((8, 8))
    for x in range(8):
        for y in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    cu = 1 / math.sqrt(2) if u == 0 else 1.0
                    cv = 1 / math.sqrt(2) if v == 0 else 1.0
                    s += (
                        0.25 * cu * cv * F[u, v]
                        * math.cos((2 * x + 1) * u * math.pi / 16)
                        * math.cos((2 * y + 1) * v * math.pi / 16)
                    )
            ref[x, y] = s
    assert np.abs(got - ref).max() < 1e-9


def test_jpeg_block_constant_roundtrip_exact():
    """Block-constant tiles with the default quant table must round-trip
    BIT-exactly (the registered query's oracle-exactness device),
    including the 0 and 255 extremes and multi-block DC prediction."""
    import numpy as np

    _, _, decode_jpeg, encode_jpeg_gray = _jpeg_parts()
    rng = np.random.default_rng(11)
    for trial in range(10):
        vals = rng.integers(0, 256, 64, dtype=np.int64)
        vals[0], vals[1] = 0, 255
        img = np.kron(
            vals.reshape(8, 8), np.ones((8, 8), dtype=np.int64)
        ).astype(np.uint8)
        w, h, arr = decode_jpeg(encode_jpeg_gray(img))
        assert (w, h) == (64, 64)
        assert np.array_equal(arr, img), trial


def _build_gray_jpeg_from_coefs(coef_blocks, q, w, h):
    """Hand-assemble a baseline grayscale payload carrying EXACTLY the
    given per-block zigzag-order integer coefficients - independent of
    encode_jpeg_gray's DCT/quant path, so decoding it checks the
    entropy + dequant + IDCT machinery against ground truth."""
    import struct as _struct

    import numpy as np

    from data_engineering_spotify_etl_airflow_aws_spark.operators.multimodal import (
        _JPEG_AC_BITS,
        _JPEG_AC_VALS,
        _JPEG_DC_BITS,
        _JPEG_DC_VALS,
        _huffman_encode_table,
        _jpeg_magnitude,
        _JpegBitWriter,
    )

    def seg(marker, body):
        return _struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    head = bytearray(b"\xff\xd8")
    head += seg(0xDB, b"\x00" + bytes(int(x) for x in q))
    head += seg(0xC0, _struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
    head += seg(0xC4, b"\x00" + bytes(_JPEG_DC_BITS) + bytes(_JPEG_DC_VALS))
    head += seg(0xC4, b"\x10" + bytes(_JPEG_AC_BITS) + bytes(_JPEG_AC_VALS))
    head += seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    dc_enc = _huffman_encode_table(_JPEG_DC_BITS, _JPEG_DC_VALS)
    ac_enc = _huffman_encode_table(_JPEG_AC_BITS, _JPEG_AC_VALS)
    wtr = _JpegBitWriter()
    prev = 0
    for zz in coef_blocks:
        s, mag = _jpeg_magnitude(int(zz[0]) - prev)
        prev = int(zz[0])
        code, length = dc_enc[s]
        wtr.write(code, length)
        if s:
            wtr.write(mag, s)
        nz = np.nonzero(np.asarray(zz[1:]))[0]
        k_prev = 0
        for idx in nz:
            k = int(idx) + 1
            run = k - k_prev - 1
            while run > 15:
                zc, zl = ac_enc[0xF0]
                wtr.write(zc, zl)
                run -= 16
            s, mag = _jpeg_magnitude(int(zz[k]))
            code, length = ac_enc[(run << 4) | s]
            wtr.write(code, length)
            wtr.write(mag, s)
            k_prev = k
        if k_prev < 63:
            code, length = ac_enc[0x00]
            wtr.write(code, length)
    wtr.flush()
    return bytes(head) + bytes(wtr.buf) + b"\xff\xd9"


def test_jpeg_decode_of_known_coefficients_matches_idct_reference():
    """Decode payloads hand-built from KNOWN integer coefficients (long
    zero runs included, so ZRL/EOB/DC-prediction all fire) and compare
    every pixel against clip(round(IDCT(C*q) + 128)) computed with plain
    matmuls the decoder does not share. No quantization ties exist here
    - the coefficients are ground truth - so the comparison is exact.
    (Why not compare a full encode(img)->decode chain pixel-for-pixel:
    DCT coefficients on the (u,v) in {0,4} lattice are exact multiples
    of 1/8, so an all-ones quant table hits exact-.5 ties where ~1e-13
    of float-order noise legitimately flips round() - the registered
    query's block-constant fixtures are tie-free by construction.)"""
    import numpy as np

    A, zigzag, decode_jpeg, _ = _jpeg_parts()
    rng = np.random.default_rng(5)
    q = rng.integers(1, 32, 64)
    q[0] = 8
    blocks = []
    for n in range(6):  # 16 x 24 image = 6 blocks
        zz = np.zeros(64, dtype=np.int64)
        zz[0] = int(rng.integers(-200, 201))
        for _ in range(int(rng.integers(0, 6))):  # sparse ACs: real runs
            zz[int(rng.integers(1, 64))] = int(rng.integers(-100, 101))
        blocks.append(zz)
    payload = _build_gray_jpeg_from_coefs(blocks, q, 24, 16)
    w, h, got = decode_jpeg(payload)
    assert (w, h) == (24, 16)
    ref = np.zeros((16, 24))
    for n, zz in enumerate(blocks):
        coef = np.zeros(64, dtype=np.int64)
        coef[list(zigzag)] = zz * q
        by, bx = (n // 3) * 8, (n % 3) * 8
        ref[by : by + 8, bx : bx + 8] = A.T @ coef.reshape(8, 8) @ A
    ref = np.clip(np.round(ref + 128.0), 0, 255).astype(np.uint8)
    assert np.array_equal(got, ref)


def test_jpeg_general_roundtrip_stays_in_rounding_band():
    """Random full-detail images through the real encoder with the
    all-ones quant table: the end-to-end error against the source must
    stay within the +/-2 rounding band of a unit-quantized DCT - this
    drives the encoder's AC run-length machinery with dense data."""
    import numpy as np

    _, _, decode_jpeg, encode_jpeg_gray = _jpeg_parts()
    rng = np.random.default_rng(6)
    for trial in range(5):
        img = rng.integers(0, 256, (16, 24), dtype=np.int64).astype(np.uint8)
        w, h, got = decode_jpeg(
            encode_jpeg_gray(img, qtable=np.ones(64, dtype=np.int64))
        )
        assert (w, h) == (24, 16)
        assert np.abs(got.astype(int) - img.astype(int)).max() <= 2, trial


def test_jpeg_malformed_inputs_raise_value_errors():
    """Truncation / unsupported-mode / garbage must all surface as the
    codec's ValueError dialect, never struct.error or KeyError."""
    import numpy as np
    import struct as _struct

    _, _, decode_jpeg, encode_jpeg_gray = _jpeg_parts()
    img = np.full((8, 8), 100, dtype=np.uint8)
    good = encode_jpeg_gray(img)

    with pytest.raises(ValueError, match="not a JPEG"):
        decode_jpeg(b"\x00\x01")
    with pytest.raises(ValueError, match="truncated|marker"):
        decode_jpeg(good[:20])
    with pytest.raises(ValueError, match="truncated JPEG entropy|marker"):
        decode_jpeg(good[:-4])  # cut into the scan
    with pytest.raises(ValueError, match="missing JPEG EOI"):
        decode_jpeg(good[:-2] + b"\x00\x00")
    with pytest.raises(ValueError, match="no scan data"):
        decode_jpeg(b"\xff\xd8\xff\xd9")

    def seg(marker, body):
        return _struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    # 16-bit quant table precision
    with pytest.raises(ValueError, match="16-bit JPEG quant"):
        decode_jpeg(
            b"\xff\xd8" + seg(0xDB, b"\x10" + b"\x00" * 128) + b"\xff\xd9"
        )
    # progressive frame
    sof2 = seg(0xC2, _struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
    with pytest.raises(ValueError, match="progressive"):
        decode_jpeg(b"\xff\xd8" + sof2 + b"\xff\xd9")
    # restart intervals
    with pytest.raises(ValueError, match="restart intervals"):
        decode_jpeg(b"\xff\xd8" + seg(0xDD, b"\x00\x08") + b"\xff\xd9")
    # scan before frame
    with pytest.raises(ValueError, match="SOS before SOF"):
        decode_jpeg(
            b"\xff\xd8" + seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0])) + b"\xff\xd9"
        )

    # r12 ADVICE probes: truncated SOF/DRI/SOS BODIES (segment length
    # field itself valid) previously escaped as struct.error/IndexError.
    sof_full = _struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0])
    with pytest.raises(ValueError, match="truncated JPEG SOF"):
        decode_jpeg(b"\xff\xd8" + seg(0xC0, sof_full[:4]) + b"\xff\xd9")
    with pytest.raises(ValueError, match="truncated JPEG SOF components"):
        decode_jpeg(b"\xff\xd8" + seg(0xC0, sof_full[:7]) + b"\xff\xd9")
    with pytest.raises(ValueError, match="truncated JPEG DRI"):
        decode_jpeg(b"\xff\xd8" + seg(0xDD, b"\x00") + b"\xff\xd9")
    sof_seg = seg(0xC0, sof_full)
    with pytest.raises(ValueError, match="truncated JPEG SOS"):
        decode_jpeg(b"\xff\xd8" + sof_seg + seg(0xDA, b"") + b"\xff\xd9")
    with pytest.raises(ValueError, match="truncated JPEG SOS components"):
        decode_jpeg(b"\xff\xd8" + sof_seg + seg(0xDA, bytes([1, 1])) + b"\xff\xd9")


def test_encode_jpeg_gray_uint16_dimension_guard():
    """SOF dimensions are uint16; oversized inputs must raise the codec's
    ValueError up front, not struct.error mid-stream (r12 ADVICE fix).
    Asserted without allocating a 65544-row image: a zero-height view
    shaped (65544, 0) is enough to trip the guard before any DCT work -
    but width 0 fails the uint16 lower bound first, so use a thin
    strided fake via np.broadcast_to (read-only, no copy)."""
    import numpy as np

    _, _, _, encode_jpeg_gray = _jpeg_parts()
    big = np.broadcast_to(np.uint8(0), (65544, 8))
    with pytest.raises(ValueError, match="uint16"):
        encode_jpeg_gray(big)
    wide = np.broadcast_to(np.uint8(0), (8, 65544))
    with pytest.raises(ValueError, match="uint16"):
        encode_jpeg_gray(wide)


def test_jpeg_color_ycbcr_path():
    """Hand-build a 3-component 4:4:4 stream from three grayscale planes
    (reusing the encoder's entropy segments is not possible per-plane, so
    build constant planes where the YCbCr values are known) and check the
    JFIF color conversion."""
    import numpy as np
    import struct as _struct

    from data_engineering_spotify_etl_airflow_aws_spark.operators.multimodal import (
        _JPEG_AC_BITS,
        _JPEG_AC_VALS,
        _JPEG_DC_BITS,
        _JPEG_DC_VALS,
        decode_jpeg,
    )
    from data_engineering_spotify_etl_airflow_aws_spark.operators.multimodal import (
        _huffman_encode_table,
        _jpeg_magnitude,
        _JpegBitWriter,
    )

    def seg(marker, body):
        return _struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    y, cb, cr = 90, 140, 200  # one constant 8x8 block per component
    head = bytearray(b"\xff\xd8")
    head += seg(0xDB, b"\x00" + bytes([8] + [16] * 63))
    head += seg(
        0xC0,
        _struct.pack(">BHHB", 8, 8, 8, 3)
        + bytes([1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0]),
    )
    head += seg(0xC4, b"\x00" + bytes(_JPEG_DC_BITS) + bytes(_JPEG_DC_VALS))
    head += seg(0xC4, b"\x10" + bytes(_JPEG_AC_BITS) + bytes(_JPEG_AC_VALS))
    head += seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))
    dc_enc = _huffman_encode_table(_JPEG_DC_BITS, _JPEG_DC_VALS)
    ac_enc = _huffman_encode_table(_JPEG_AC_BITS, _JPEG_AC_VALS)
    wtr = _JpegBitWriter()
    prev = 0
    for comp_val in (y, cb, cr):
        dc = comp_val - 128  # quant step 8: DC code = v - 128
        s, mag = _jpeg_magnitude(dc - prev)
        # per-component DC predictors start at 0 in a 3-component scan
        prev = 0
        code, length = dc_enc[s]
        wtr.write(code, length)
        if s:
            wtr.write(mag, s)
        code, length = ac_enc[0x00]
        wtr.write(code, length)
    wtr.flush()
    payload = bytes(head) + bytes(wtr.buf) + b"\xff\xd9"
    w, h, rgb = decode_jpeg(payload)
    assert (w, h) == (8, 8) and rgb.shape == (8, 8, 3)
    exp_r = round(y + 1.402 * (cr - 128))
    exp_g = round(y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128))
    exp_b = round(y + 1.772 * (cb - 128))
    assert (rgb[..., 0] == np.clip(exp_r, 0, 255)).all()
    assert (rgb[..., 1] == np.clip(exp_g, 0, 255)).all()
    assert (rgb[..., 2] == np.clip(exp_b, 0, 255)).all()


# ---------------------------------------------------------------------------
# Resize: the pure-numpy nearest/bilinear kernels (r10).


def test_resize_nearest_matches_integer_index_map():
    from data_engineering_spotify_etl_airflow_aws_spark.operators.multimodal import (
        resize_image,
    )

    rng = np.random.default_rng(17)
    arr = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
    dn = resize_image(arr, 4, 4)
    up = resize_image(arr, 16, 16)
    for y in range(4):
        for x in range(4):
            assert (dn[y, x] == arr[(y * 8) // 4, (x * 8) // 4]).all()
    for y in range(16):
        for x in range(16):
            assert (up[y, x] == arr[(y * 8) // 16, (x * 8) // 16]).all()
    # non-integer ratio + grayscale 2-D input
    g = rng.integers(0, 256, (5, 7), dtype=np.uint8)
    out = resize_image(g, 3, 2)
    for y in range(2):
        for x in range(3):
            assert out[y, x] == g[(y * 5) // 2, (x * 7) // 3]


def test_resize_bilinear_matches_scalar_reference():
    """Independent per-pixel scalar reference (half-pixel centers,
    clamped edges) - deliberately no shared code with the kernel."""
    from data_engineering_spotify_etl_airflow_aws_spark.operators.multimodal import (
        resize_image,
    )

    rng = np.random.default_rng(19)
    arr = rng.integers(0, 256, (6, 10, 3), dtype=np.uint8)
    oh, ow = 9, 4
    got = resize_image(arr, ow, oh, method="bilinear")
    a = arr.astype(float)
    for y in range(oh):
        for x in range(ow):
            sy = (y + 0.5) * 6 / oh - 0.5
            sx = (x + 0.5) * 10 / ow - 0.5
            y0 = min(max(int(np.floor(sy)), 0), 5)
            x0 = min(max(int(np.floor(sx)), 0), 9)
            y1, x1 = min(y0 + 1, 5), min(x0 + 1, 9)
            fy = min(max(sy - y0, 0.0), 1.0)
            fx = min(max(sx - x0, 0.0), 1.0)
            for c in range(3):
                v = (
                    a[y0, x0, c] * (1 - fy) * (1 - fx)
                    + a[y0, x1, c] * (1 - fy) * fx
                    + a[y1, x0, c] * fy * (1 - fx)
                    + a[y1, x1, c] * fy * fx
                )
                assert got[y, x, c] == min(max(round(v), 0), 255), (y, x, c)


def test_resize_bilinear_identity_and_errors():
    from data_engineering_spotify_etl_airflow_aws_spark.operators.multimodal import (
        resize_image,
    )

    rng = np.random.default_rng(23)
    arr = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
    # same-size bilinear is the identity (weights hit integer centers)
    assert np.array_equal(resize_image(arr, 8, 8, "bilinear"), arr)
    with pytest.raises(ValueError, match="invalid resize dimensions"):
        resize_image(arr, 0, 4)
    with pytest.raises(ValueError, match="unknown resize method"):
        resize_image(arr, 4, 4, method="bicubic")
