"""Property-based tests (hypothesis) for the pure codec kernels.

The example-based suites (test_multimodal_decode.py) pin known values
and spec tables; these properties let hypothesis search the input space
for the cases nobody thought to write down - bit-I/O stuffing
boundaries, Huffman codes straddling byte edges, magnitude coding at
category boundaries, resize geometry on awkward ratios, and session
folds across adversarial batch splits. Everything here is pure Python /
numpy: no SparkSession, so the module adds seconds, not minutes.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from data_engineering_spotify_etl_airflow_aws_spark.operators.multimodal import (
    _JPEG_AC_BITS,
    _JPEG_AC_VALS,
    _JPEG_DC_BITS,
    _JPEG_DC_VALS,
    _huffman_codes,
    _huffman_encode_table,
    _jpeg_extend,
    _jpeg_magnitude,
    _JpegBitReader,
    _JpegBitWriter,
    _JpegHuffTable,
    decode_jpeg,
    decode_png,
    decode_ppm,
    encode_jpeg_gray,
    encode_png,
    resize_image,
)

# --------------------------------------------------------------------------
# Bit I/O: write/read round-trip through the 0xFF00 stuffing layer.


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(1, 16)).flatmap(
            lambda t: st.tuples(st.integers(0, (1 << t[0]) - 1), st.just(t[0]))
        ),
        min_size=1,
        max_size=100,
    )
)
def test_bitio_roundtrip_with_stuffing(fields):
    wtr = _JpegBitWriter()
    for value, nbits in fields:
        wtr.write(value, nbits)
    wtr.flush()
    data = bytes(wtr.buf)
    # stuffing invariant: every 0xFF in the entropy segment is followed
    # by 0x00 (otherwise the decoder would see a marker)
    for i, b in enumerate(data[:-1]):
        if b == 0xFF:
            assert data[i + 1] == 0x00
    rdr = _JpegBitReader(data + b"\xff\xd9", 0)
    for value, nbits in fields:
        assert rdr.read_bits(nbits) == value


# --------------------------------------------------------------------------
# Canonical Huffman: the decode table inverts the encode table for both
# Annex K alphabets, wherever the symbols land relative to byte edges.


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.sampled_from(list(range(12))), min_size=1, max_size=80
    ),
    st.lists(st.sampled_from(list(_JPEG_AC_VALS)), min_size=0, max_size=80),
)
def test_huffman_encode_decode_roundtrip(dc_syms, ac_syms):
    dc_enc = _huffman_encode_table(_JPEG_DC_BITS, _JPEG_DC_VALS)
    ac_enc = _huffman_encode_table(_JPEG_AC_BITS, _JPEG_AC_VALS)
    dc_tab = _JpegHuffTable(_JPEG_DC_BITS, _JPEG_DC_VALS)
    ac_tab = _JpegHuffTable(_JPEG_AC_BITS, _JPEG_AC_VALS)
    wtr = _JpegBitWriter()
    for s in dc_syms:
        code, length = dc_enc[s]
        wtr.write(code, length)
    for s in ac_syms:
        code, length = ac_enc[s]
        wtr.write(code, length)
    wtr.flush()
    rdr = _JpegBitReader(bytes(wtr.buf) + b"\xff\xd9", 0)
    got = [rdr.read_symbol(dc_tab) for _ in dc_syms]
    got += [rdr.read_symbol(ac_tab) for _ in ac_syms]
    assert got == dc_syms + ac_syms


def test_huffman_tables_are_prefix_free():
    for bits, vals in (
        (_JPEG_DC_BITS, _JPEG_DC_VALS),
        (_JPEG_AC_BITS, _JPEG_AC_VALS),
    ):
        codes = {
            (length, code) for (length, code) in _huffman_codes(bits, vals)
        }
        as_strings = [format(c, f"0{l}b") for l, c in codes]
        for a in as_strings:
            for b in as_strings:
                if a is not b:
                    assert not b.startswith(a) or a == b


# --------------------------------------------------------------------------
# Magnitude (category) coding: extend inverts magnitude over the whole
# baseline DC/AC range.


@settings(max_examples=300, deadline=None)
@given(st.integers(-2047, 2047))
def test_jpeg_magnitude_extend_roundtrip(v):
    s, mag = _jpeg_magnitude(v)
    assert _jpeg_extend(mag, s) == v
    assert s == (0 if v == 0 else abs(v).bit_length())


# --------------------------------------------------------------------------
# JPEG: block-constant images round-trip bit-exactly at any multiple-of-8
# geometry (the registered query's exactness device, generalized).


@settings(max_examples=40, deadline=None)
@given(
    st.integers(1, 3),
    st.integers(1, 3),
    st.integers(0, 2**32 - 1),
)
def test_jpeg_block_constant_roundtrip_any_geometry(bw, bh, seed):
    rng = np.random.default_rng(seed)
    vals = rng.integers(0, 256, bw * bh, dtype=np.int64)
    img = np.kron(
        vals.reshape(bh, bw), np.ones((8, 8), dtype=np.int64)
    ).astype(np.uint8)
    w, h, arr = decode_jpeg(encode_jpeg_gray(img))
    assert (w, h) == (8 * bw, 8 * bh)
    assert np.array_equal(arr, img)


@settings(max_examples=25, deadline=None)
@given(st.integers(0, 2**32 - 1))
def test_jpeg_general_roundtrip_rounding_band(seed):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (8, 16), dtype=np.int64).astype(np.uint8)
    w, h, got = decode_jpeg(
        encode_jpeg_gray(img, qtable=np.ones(64, dtype=np.int64))
    )
    assert np.abs(got.astype(int) - img.astype(int)).max() <= 2


# --------------------------------------------------------------------------
# PNG / PPM: lossless round-trips on arbitrary shapes.


@settings(max_examples=30, deadline=None)
@given(st.integers(1, 12), st.integers(1, 12), st.integers(0, 2**32 - 1))
def test_png_roundtrip_any_shape(w, h, seed):
    rng = np.random.default_rng(seed)
    pixels = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    got_w, got_h, arr = decode_png(encode_png(pixels))
    assert (got_w, got_h) == (w, h)
    assert np.array_equal(arr, pixels)


@settings(max_examples=30, deadline=None)
@given(st.integers(1, 16), st.integers(1, 16), st.integers(0, 2**32 - 1))
def test_ppm_roundtrip_any_shape(w, h, seed):
    rng = np.random.default_rng(seed)
    pixels = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    payload = f"P6\n{w} {h}\n255\n".encode() + pixels.tobytes()
    got_w, got_h, arr = decode_ppm(payload)
    assert (got_w, got_h) == (w, h)
    assert np.array_equal(arr, pixels)


# --------------------------------------------------------------------------
# Resize: the nearest kernel IS the integer index map, for any geometry.


@settings(max_examples=60, deadline=None)
@given(
    st.integers(1, 12),
    st.integers(1, 12),
    st.integers(1, 20),
    st.integers(1, 20),
    st.integers(0, 2**32 - 1),
)
def test_resize_nearest_index_map_property(sw, sh, ow, oh, seed):
    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 256, (sh, sw, 3), dtype=np.uint8)
    out = resize_image(arr, ow, oh)
    assert out.shape == (oh, ow, 3)
    for y in range(oh):
        for x in range(ow):
            assert (out[y, x] == arr[(y * sh) // oh, (x * sw) // ow]).all()


# --------------------------------------------------------------------------
# Session fold: batch-split + timer-expiry invariance against the batch
# lag-window semantics, hypothesis-driven (the example-based version
# lives in test_streaming.py; this one lets hypothesis pick the gaps
# and the split points).


@settings(max_examples=150, deadline=None)
@given(
    st.lists(
        st.sampled_from(
            [
                1,
                1_000_000,
                30 * 60 * 1_000_000,  # == MICRO gap (not >)
                30 * 60 * 1_000_000 + 1,
                24 * 3600 * 1_000_000,  # == MACRO gap (not >)
                24 * 3600 * 1_000_000 + 1,
                3 * 24 * 3600 * 1_000_000,
            ]
        ),
        min_size=1,
        max_size=25,
    ),
    st.data(),
)
def test_session_fold_split_and_expiry_invariance(gaps, data):
    from data_engineering_spotify_etl_airflow_aws_spark.operators.windows import (
        _MACRO_GAP_US,
        _MICRO_GAP_US,
    )
    from data_engineering_spotify_etl_airflow_aws_spark.streaming.sessions import (
        _fold_session_deltas,
    )

    ts, cur = [], 0
    for g in gaps:
        cur += g
        ts.append(cur)

    # reference: whole-sequence lag-window semantics
    n_sess = n_vis = 0
    starts = []
    for i, us in enumerate(ts):
        if i == 0 or us - ts[i - 1] > _MICRO_GAP_US:
            starts.append(us)
    n_sess = len(starts)
    for j, stt in enumerate(starts):
        if j == 0 or stt - starts[j - 1] > _MACRO_GAP_US:
            n_vis += 1

    n = len(ts)
    n_cuts = data.draw(st.integers(0, n - 1))
    cuts = sorted(
        data.draw(
            st.lists(
                st.integers(1, n - 1),
                min_size=n_cuts,
                max_size=n_cuts,
                unique=True,
            )
            if n > 1
            else st.just([])
        )
    )
    tot = [0, 0, 0]
    last = start = None
    prev = 0
    for c in cuts + [n]:
        piece = ts[prev:c]
        prev = c
        if not piece:
            continue
        # the event-time timer clears state once every future event is
        # provably past the MACRO horizon
        if last is not None and piece[0] - last > _MACRO_GAP_US:
            last = start = None
        d_ev, d_s, d_v, last, start = _fold_session_deltas(
            last, start, piece
        )
        tot[0] += d_ev
        tot[1] += d_s
        tot[2] += d_v
    assert tuple(tot) == (len(ts), n_sess, n_vis)
