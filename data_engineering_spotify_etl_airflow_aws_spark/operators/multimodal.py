"""Multimodal-column operators (SURVEY.md §2b): opaque binary payloads with
typed metadata, content-addressed dedup, and an Arrow-batched feature
extractor.

The container ships no image/audio codec LIBRARIES, so the documents
fixture's text bytes stand in as the opaque payload for most operators
(the point is the Spark-side plumbing: BinaryType columns, metadata
structs, sha2 content addressing, and a real mapInPandas decode/feature
path with correct batch shapes). The decode step itself is genuinely
exercised for the uncompressed format class of every modality AND for
one real compressed format: decode_ppm() is a complete pure-numpy PPM
(P6) image codec, decode_wav() a RIFF/WAVE PCM audio chunk parser,
decode_y4m() a YUV4MPEG2 video frame parser, and decode_png() a
stdlib-zlib + numpy PNG codec (inflate + all five scanline filters,
CRC-verified) for 8-bit RGB; the multimodal_{ppm,wav,y4m,png}_decode_stats
queries build valid payloads, decode them in mapInPandas with the real
codecs, and oracle-check the decoded channel means / waveform stats /
per-frame plane means bit-for-bit. decode_jpeg() completes the family
(r9 verdict stretch): a dependency-free baseline-JFIF decoder (marker
walk, declared Huffman/quant tables, zigzag, exact float 2-D IDCT,
YCbCr->RGB), so decode_image() now routes P6, PNG and JPEG natively
with NO image library anywhere; the deterministic digest-based feature
extractor remains the codec-free fallback for opaque payloads.

Scale notes (100 TB of images/audio):
  * payloads stay in executor-side Arrow batches end to end - nothing binary
    ever reaches the driver;
  * content dedup is one shuffle on the 256-bit digest (uniform key, no
    skew);
  * metadata predicates (content_type, n_bytes) are plain columns, so scans
    prune them without touching payload bytes - store payloads in a
    separate parquet column chunk and Spark's vectorized reader never
    materializes them for metadata-only queries;
  * feature extraction is mapInPandas: Arrow batch in, Arrow batch out,
    ~batch-size Python crossings instead of per-row.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..registry import query
from ..tables import load_table

_N_FEATURES = 8


def payload_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents re-typed as a multimodal table: opaque BinaryType payload +
    typed metadata struct (the schema a real image/audio table would have).

    Deliberately the NARROW scan for every consumer. A widen_small_scan
    here was measured (round 5, sf0.1, min of 3 warm runs) to lose across
    the whole family - JVM-only queries: content_dedup 0.55s narrow vs
    0.81s widened; and even the mapInPandas paths: digest_features 0.63s
    vs 1.12s, frame_sample 0.98s vs 1.15s - repartitioning ships every
    binary payload through a shuffle that costs more than the Python-side
    work it parallelizes. At real corpus scale the scan has >= session
    parallelism splits anyway, so Arrow batches already fan out without
    any explicit repartition."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.length(F.encode("text", "UTF-8")).alias("n_bytes"),
            F.concat(F.lit("application/x-"), F.col("source")).alias(
                "content_type"
            ),
            F.col("lang").alias("lang"),
        ).alias("meta"),
    )


def decode_ppm(payload: bytes):
    """Real, dependency-free decode of a binary PPM (P6) payload:
    (width, height, uint8 pixel array of shape [height, width, 3]).
    PPM is the uncompressed interchange format, so a header parse plus
    np.frombuffer IS the whole codec - no library needed. Header
    comments are unsupported (the multimodal fixtures are
    machine-generated, never hand-edited)."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a binary PPM (P6) payload")
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ValueError("truncated PPM header")
        fields.append(int(payload[start:pos]))
    pos += 1  # the single whitespace byte terminating the header
    width, height, maxval = fields
    if width <= 0 or height <= 0 or maxval <= 0:
        # int() happily parses "-3"; a negative frombuffer count would
        # otherwise read the whole buffer and die in reshape with a
        # confusing error instead of this parser's ValueError dialect.
        raise ValueError("invalid PPM dimensions")
    if maxval > 255:
        raise ValueError("16-bit PPM unsupported")
    n = width * height * 3
    if len(payload) - pos < n:
        raise ValueError("truncated PPM pixel data")
    pixels = np.frombuffer(payload, dtype=np.uint8, count=n, offset=pos)
    return width, height, pixels.reshape(height, width, 3)


def decode_image(payload: bytes):
    """The codec seam - every route is native now. Uncompressed PPM
    decodes with the pure-numpy parser above; 8-bit RGB PNG with the
    stdlib-zlib + numpy codec; baseline JPEG with the Huffman + IDCT
    decoder (all three oracle-checked value-for-value by their
    *_decode_stats queries). Returns (width, height, pixel array).
    An unrecognized signature raises ValueError in the same dialect as
    the per-format parsers; digest_features() remains the deterministic
    codec-free fallback for opaque payloads."""
    if payload.startswith(b"P6"):
        return decode_ppm(payload)
    if payload.startswith(_PNG_SIG):
        return decode_png(payload)
    if payload.startswith(b"\xff\xd8"):
        return decode_jpeg(payload)
    raise ValueError("unsupported image payload signature")


def digest_features(payload: bytes) -> list[float]:
    """Deterministic stand-in feature vector: first N sha256 digest bytes,
    scaled to [0,1]. Mirrors the DuckDB oracle expression exactly."""
    digest = hashlib.sha256(payload).digest()
    return [b / 255.0 for b in digest[:_N_FEATURES]]


# ---------------------------------------------------------------------------
# Content-addressed dedup: sha2-256 over raw payload bytes.
@query(
    "multimodal_content_dedup",
    oracle="""
    SELECT sha256(text) AS content_addr,
           min(doc_id) AS survivor_doc_id,
           count(*) AS n_copies,
           min(length(text)) AS n_bytes
    FROM documents
    GROUP BY 1
    ORDER BY survivor_doc_id
    """,
)
def multimodal_content_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = payload_table(spark, sf_dir)
    return (
        t.groupBy(F.sha2("payload", 256).alias("content_addr"))
        .agg(
            F.min("doc_id").alias("survivor_doc_id"),
            F.count("*").alias("n_copies"),
            F.min(F.col("meta.n_bytes")).alias("n_bytes"),
        )
        .orderBy("survivor_doc_id")
    )


# ---------------------------------------------------------------------------
# Metadata-only aggregation: the query shape that must NEVER touch payload
# bytes at scale (column pruning drops the binary column from the scan).
@query(
    "multimodal_metadata_stats",
    oracle="""
    SELECT 'application/x-' || source AS content_type,
           count(*) AS n_assets,
           CAST(sum(length(text)) AS BIGINT) AS total_bytes,
           max(length(text)) AS max_bytes
    FROM documents
    GROUP BY 1
    ORDER BY content_type
    """,
)
def multimodal_metadata_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = payload_table(spark, sf_dir)
    return (
        t.groupBy(F.col("meta.content_type").alias("content_type"))
        .agg(
            F.count("*").alias("n_assets"),
            F.sum("meta.n_bytes").alias("total_bytes"),
            F.max("meta.n_bytes").alias("max_bytes"),
        )
        .orderBy("content_type")
    )


# ---------------------------------------------------------------------------
# Feature extraction through a real Arrow-batched Python boundary:
# mapInPandas over (doc_id, payload), emitting a fixed-width feature row per
# asset. The digest features are deterministic, so even this Python-UDF path
# is oracle-checked value-for-value against DuckDB.
_FEATURE_SCHEMA = T.StructType(
    [T.StructField("doc_id", T.LongType())]
    + [T.StructField(f"f{i}", T.DoubleType()) for i in range(_N_FEATURES)]
)


def _extract_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        feats = [digest_features(p) for p in pdf["payload"]]
        out = pd.DataFrame(
            feats, columns=[f"f{i}" for i in range(_N_FEATURES)]
        )
        out.insert(0, "doc_id", pdf["doc_id"].values)
        yield out


@query(
    "multimodal_digest_features",
    oracle=f"""
    SELECT doc_id,
           {", ".join(
               f"CAST(CAST(('0x' || substring(sha256(text), {2 * i + 1}, 2)) AS BIGINT)"
               f" AS DOUBLE) / 255.0 AS f{i}"
               for i in range(_N_FEATURES)
           )}
    FROM documents
    ORDER BY doc_id
    """,
)
def multimodal_digest_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = payload_table(spark, sf_dir).select("doc_id", "payload")
    return t.mapInPandas(_extract_batches, schema=_FEATURE_SCHEMA).orderBy(
        "doc_id"
    )


# ---------------------------------------------------------------------------
# Frame sampling: the video/audio pattern of "decode N evenly-spaced frames
# per asset" with real Spark plumbing - mapInPandas fan-out (K output rows
# per input row), byte-range arithmetic, per-frame content digests. The
# codec being stubbed (see decode_image) does not change the plumbing: a
# real implementation swaps the byte-slice for a decoder call, keeping
# schema, partitioning, and batch shapes identical. Oracle-checked: frames
# are deterministic byte windows (the fixture corpus is pure ASCII, so
# DuckDB's char offsets equal the payload's byte offsets; verified for all
# SFs before this operator was written).
_N_FRAMES = 4

_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_bytes", T.LongType()),
        T.StructField("frame_digest", T.StringType()),
    ]
)


def _frame_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out: dict[str, list] = {
            "doc_id": [], "frame_idx": [], "frame_bytes": [], "frame_digest": []
        }
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            n = len(payload)
            for f in range(_N_FRAMES):
                lo, hi = f * n // _N_FRAMES, (f + 1) * n // _N_FRAMES
                frame = payload[lo:hi]
                out["doc_id"].append(doc_id)
                out["frame_idx"].append(f)
                out["frame_bytes"].append(hi - lo)
                out["frame_digest"].append(
                    hashlib.sha256(frame).hexdigest()
                )
        yield pd.DataFrame(out)


@query(
    "multimodal_frame_sample",
    oracle=f"""
    SELECT doc_id, f AS frame_idx,
           (((f+1)*n)//{_N_FRAMES} - (f*n)//{_N_FRAMES}) AS frame_bytes,
           sha256(substring(text, (f*n)//{_N_FRAMES} + 1,
                            ((f+1)*n)//{_N_FRAMES} - (f*n)//{_N_FRAMES}))
               AS frame_digest
    FROM (SELECT doc_id, text, length(text) AS n FROM documents),
         (SELECT unnest(generate_series(0, {_N_FRAMES - 1})) AS f)
    ORDER BY doc_id, frame_idx
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = payload_table(spark, sf_dir).select("doc_id", "payload")
    return t.mapInPandas(_frame_batches, schema=_FRAME_SCHEMA).orderBy(
        "doc_id", "frame_idx"
    )


# ---------------------------------------------------------------------------
# GENUINE image decode, end to end: build a valid uncompressed 4x4 RGB
# PPM per document JVM-side (header + 48 pixel bytes taken from the
# document text - the fixture corpus is pure ASCII, so char positions
# equal byte offsets and DuckDB's ord() sees the exact pixel values),
# decode it with the real pure-numpy PPM codec inside mapInPandas, and
# emit per-channel pixel means. This closes the "decode never executes
# in-sandbox" seam for the uncompressed format class: the operator
# exercises header parsing, buffer reinterpretation, and channel
# statistics on actual image bytes, and the oracle recomputes the same
# means from the source characters. Means are sums of <=16 small ints
# divided by 16 (a power of two), so both engines produce bit-identical
# doubles. A real corpus swaps the payload constructor for a parquet
# binary column; decode + stats are unchanged.
#
# Scale notes (100 TB of images): payload construction and decode are
# shuffle-free projections over the scan - the only shuffle is the
# final presentation sort, and nothing binary ever leaves the executors.
_PPM_W = _PPM_H = 4
_PPM_NPIX = _PPM_W * _PPM_H  # 16 pixels -> 48 RGB bytes


_PPM_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("mean_r", T.DoubleType()),
        T.StructField("mean_g", T.DoubleType()),
        T.StructField("mean_b", T.DoubleType()),
    ]
)


def _ppm_stats_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out: dict[str, list] = {
            "doc_id": [], "width": [], "height": [],
            "mean_r": [], "mean_g": [], "mean_b": [],
        }
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            w, h, arr = decode_ppm(payload)
            means = arr.reshape(-1, 3).mean(axis=0)
            out["doc_id"].append(doc_id)
            out["width"].append(w)
            out["height"].append(h)
            out["mean_r"].append(float(means[0]))
            out["mean_g"].append(float(means[1]))
            out["mean_b"].append(float(means[2]))
        yield pd.DataFrame(out)


@query(
    "multimodal_ppm_decode_stats",
    oracle=f"""
    WITH base AS (
        SELECT doc_id,
               rpad(substring(coalesce(text, ''), 1, {3 * _PPM_NPIX}),
                    {3 * _PPM_NPIX}, 'x') AS px
        FROM documents
    ),
    codes AS (
        SELECT doc_id, i, ord(substring(px, i + 1, 1)) AS code
        FROM base, (SELECT unnest(generate_series(0, {3 * _PPM_NPIX - 1})) AS i)
    )
    SELECT doc_id,
           CAST({_PPM_W} AS BIGINT) AS width,
           CAST({_PPM_H} AS BIGINT) AS height,
           CAST(CAST(sum(CASE WHEN i % 3 = 0 THEN code END) AS VARCHAR) AS DOUBLE)
               / {_PPM_NPIX} AS mean_r,
           CAST(CAST(sum(CASE WHEN i % 3 = 1 THEN code END) AS VARCHAR) AS DOUBLE)
               / {_PPM_NPIX} AS mean_g,
           CAST(CAST(sum(CASE WHEN i % 3 = 2 THEN code END) AS VARCHAR) AS DOUBLE)
               / {_PPM_NPIX} AS mean_b
    FROM codes
    GROUP BY doc_id
    ORDER BY doc_id
    """,
)
def multimodal_ppm_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NOT widened (r16 A/B): the PPM "codec" is a header parse +
    # np.frombuffer - too cheap to pay the repartition (min-of-3
    # 0.77s -> 1.03s widened). Contrast the png/jpeg paths, where a real
    # compression codec runs per row and widening wins 3x.
    return ppm_payload_df(spark, sf_dir).mapInPandas(
        _ppm_stats_batches, schema=_PPM_STATS_SCHEMA
    ).orderBy("doc_id")


def ppm_payload_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, payload) with a valid binary PPM per document — the
    fixture constructor shared by the batch decode query above and its
    Structured Streaming twin (streaming/decode.py), so both decode
    byte-identical payloads."""
    docs = load_table(spark, sf_dir, "documents")
    header = f"P6\n{_PPM_W} {_PPM_H}\n255\n"
    return docs.select(
        "doc_id",
        F.encode(
            F.concat(
                F.lit(header),
                F.rpad(
                    F.substring(F.coalesce("text", F.lit("")), 1, 3 * _PPM_NPIX),
                    3 * _PPM_NPIX,
                    "x",
                ),
            ),
            "UTF-8",
        ).alias("payload"),
    )


# ---------------------------------------------------------------------------
# GENUINE audio decode, same pattern as the PPM path: build a valid
# RIFF/WAVE PCM file per document JVM-side (the header is a constant
# byte string because the sample count is fixed; the 16-bit little-
# endian mono samples are document bytes, so DuckDB's ord() recomputes
# the exact sample values as lo + 256*hi), decode it with the real
# pure-numpy WAV chunk parser inside mapInPandas, and emit waveform
# statistics. ASCII bytes are <= 0x7E, so every sample's high byte is
# positive and int16 reinterpretation is exact. mean_square is a sum of
# 32 squares (each < 2^30) divided by 32 - a power of two - so both
# engines produce bit-identical doubles; peak_abs is an exact integer.
_WAV_N_SAMPLES = 32  # 64 payload bytes; power of two keeps /N exact
_WAV_RATE = 8000


def _wav_header(n_samples: int, rate: int) -> bytes:
    """Canonical 44-byte PCM WAV header for 16-bit mono."""
    data_size = n_samples * 2
    return (
        b"RIFF"
        + struct.pack("<I", 36 + data_size)
        + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
        + b"data"
        + struct.pack("<I", data_size)
    )


def decode_wav(payload: bytes):
    """Real, dependency-free decode of a RIFF/WAVE PCM payload:
    (sample_rate, n_channels, int16 sample array). Walks the chunk list
    generically (a real file may carry LIST/fact chunks before data);
    only uncompressed 16-bit PCM is supported - compressed codecs would
    need an audio library this container does not ship."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, rate, channels, bits = 12, None, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            if len(body) < 16:
                raise ValueError("truncated WAVE fmt chunk")
            fmt, channels, rate = struct.unpack("<HHI", body[:8])
            (bits,) = struct.unpack("<H", body[14:16])
            if fmt != 1 or bits != 16:
                raise ValueError("only uncompressed 16-bit PCM supported")
        elif cid == b"data":
            if rate is None:
                raise ValueError("data chunk before fmt chunk")
            if len(body) < size:
                raise ValueError("truncated WAVE data chunk")
            samples = np.frombuffer(body, dtype="<i2", count=size // 2)
            return rate, channels, samples
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    raise ValueError("no data chunk in WAVE payload")


_WAV_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("sample_rate", T.LongType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("peak_abs", T.LongType()),
        T.StructField("mean_square", T.DoubleType()),
    ]
)


def _wav_stats_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out: dict[str, list] = {
            "doc_id": [], "sample_rate": [], "n_samples": [],
            "peak_abs": [], "mean_square": [],
        }
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            rate, _channels, samples = decode_wav(payload)
            s = samples.astype("int64")
            out["doc_id"].append(doc_id)
            out["sample_rate"].append(rate)
            out["n_samples"].append(len(s))
            out["peak_abs"].append(int(abs(s).max()))
            out["mean_square"].append(float((s * s).sum()) / len(s))
        yield pd.DataFrame(out)


@query(
    "multimodal_wav_decode_stats",
    oracle=f"""
    WITH base AS (
        SELECT doc_id,
               rpad(substring(coalesce(text, ''), 1, {2 * _WAV_N_SAMPLES}),
                    {2 * _WAV_N_SAMPLES}, 'x') AS pcm
        FROM documents
    ),
    samples AS (
        SELECT doc_id,
               ord(substring(pcm, 2 * i + 1, 1))
                   + 256 * ord(substring(pcm, 2 * i + 2, 1)) AS s
        FROM base,
             (SELECT unnest(generate_series(0, {_WAV_N_SAMPLES - 1})) AS i)
    )
    SELECT doc_id,
           CAST({_WAV_RATE} AS BIGINT) AS sample_rate,
           CAST(count(*) AS BIGINT) AS n_samples,
           CAST(max(abs(s)) AS BIGINT) AS peak_abs,
           CAST(CAST(sum(s * s) AS VARCHAR) AS DOUBLE) / {_WAV_N_SAMPLES} AS mean_square
    FROM samples
    GROUP BY doc_id
    ORDER BY doc_id
    """,
)
def multimodal_wav_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    wav = docs.select(
        "doc_id",
        F.concat(
            F.lit(_wav_header(_WAV_N_SAMPLES, _WAV_RATE)),
            F.encode(
                F.rpad(
                    F.substring(
                        F.coalesce("text", F.lit("")), 1, 2 * _WAV_N_SAMPLES
                    ),
                    2 * _WAV_N_SAMPLES,
                    "x",
                ),
                "UTF-8",
            ),
        ).alias("payload"),
    )
    # NOT widened (r16 A/B): the RIFF parse + numpy moments are too cheap
    # to pay the repartition (min-of-3 0.73s -> 1.03s widened; the ppm
    # lesson)
    return wav.mapInPandas(
        _wav_stats_batches, schema=_WAV_STATS_SCHEMA
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# GENUINE video decode, completing the modality set: YUV4MPEG2 (y4m) is
# the uncompressed video interchange format - a text stream header, then
# per-frame "FRAME\n" markers followed by raw YUV planes - so, like PPM
# and WAV, the parser IS the codec. Payloads are built JVM-side (stream
# and frame headers are constant strings at fixed geometry; the plane
# bytes are document bytes), decoded inside mapInPandas with the real
# parser, and the per-frame, per-plane means are oracle-checked
# bit-for-bit (sums of 16 bytes divided by 16). One output row per
# frame - the frame-sampling shape of multimodal_frame_sample, but over
# DECODED pixel planes instead of opaque byte windows.
_Y4M_W = _Y4M_H = 4
_Y4M_FRAMES = 2
_Y4M_PLANE = _Y4M_W * _Y4M_H  # C444: all three planes full-resolution


def _y4m_payload_header() -> str:
    return f"YUV4MPEG2 W{_Y4M_W} H{_Y4M_H} F25:1 Ip A1:1 C444\n"


def decode_y4m(payload: bytes):
    """Real, dependency-free decode of a YUV4MPEG2 (y4m) payload:
    (width, height, uint8 array of shape [n_frames, 3, height, width]).
    C444 only (full-resolution planes; subsampled layouts would need
    per-plane geometry, compressed video a codec library)."""
    nl = payload.find(b"\n")
    if nl < 0:
        raise ValueError("truncated y4m stream header")
    header = payload[:nl].decode("ascii", errors="replace")
    if not header.startswith("YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 payload")
    width = height = None
    colorspace = "C420jpeg"  # the y4m default when no C tag is present
    for tag in header.split()[1:]:
        if tag[0] == "W":
            width = int(tag[1:])
        elif tag[0] == "H":
            height = int(tag[1:])
        elif tag[0] == "C":
            colorspace = tag
    if width is None or height is None:
        raise ValueError("y4m header missing W/H geometry")
    if colorspace != "C444":
        raise ValueError("only C444 (full-resolution planes) supported")
    frame_bytes = 3 * width * height
    frames = []
    pos = nl + 1
    while pos < len(payload):
        fnl = payload.find(b"\n", pos)
        if fnl < 0:
            raise ValueError("truncated y4m frame header")
        if payload[pos:fnl].split(b" ")[0] != b"FRAME":
            raise ValueError("malformed frame marker")
        start = fnl + 1
        if len(payload) - start < frame_bytes:
            raise ValueError("truncated y4m frame data")
        frames.append(
            np.frombuffer(
                payload, dtype=np.uint8, count=frame_bytes, offset=start
            ).reshape(3, height, width)
        )
        pos = start + frame_bytes
    if not frames:
        raise ValueError("y4m stream contains no frames")
    return width, height, np.stack(frames)


_Y4M_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("mean_y", T.DoubleType()),
        T.StructField("mean_u", T.DoubleType()),
        T.StructField("mean_v", T.DoubleType()),
    ]
)


def _y4m_stats_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out: dict[str, list] = {
            "doc_id": [], "frame_idx": [],
            "mean_y": [], "mean_u": [], "mean_v": [],
        }
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            _w, _h, frames = decode_y4m(payload)
            for idx, frame in enumerate(frames):
                means = frame.reshape(3, -1).mean(axis=1)
                out["doc_id"].append(doc_id)
                out["frame_idx"].append(idx)
                out["mean_y"].append(float(means[0]))
                out["mean_u"].append(float(means[1]))
                out["mean_v"].append(float(means[2]))
        yield pd.DataFrame(out)


@query(
    "multimodal_y4m_decode_stats",
    oracle=f"""
    WITH base AS (
        SELECT doc_id,
               rpad(substring(coalesce(text, ''),
                              1, {3 * _Y4M_PLANE * _Y4M_FRAMES}),
                    {3 * _Y4M_PLANE * _Y4M_FRAMES}, 'x') AS px
        FROM documents
    ),
    cells AS (
        SELECT doc_id, f, p,
               ord(substring(px,
                             f * {3 * _Y4M_PLANE} + p * {_Y4M_PLANE} + i + 1,
                             1)) AS code
        FROM base,
             (SELECT unnest(generate_series(0, {_Y4M_FRAMES - 1})) AS f),
             (SELECT unnest(generate_series(0, 2)) AS p),
             (SELECT unnest(generate_series(0, {_Y4M_PLANE - 1})) AS i)
    )
    SELECT doc_id,
           CAST(f AS BIGINT) AS frame_idx,
           CAST(CAST(sum(CASE WHEN p = 0 THEN code END) AS VARCHAR) AS DOUBLE)
               / {_Y4M_PLANE} AS mean_y,
           CAST(CAST(sum(CASE WHEN p = 1 THEN code END) AS VARCHAR) AS DOUBLE)
               / {_Y4M_PLANE} AS mean_u,
           CAST(CAST(sum(CASE WHEN p = 2 THEN code END) AS VARCHAR) AS DOUBLE)
               / {_Y4M_PLANE} AS mean_v
    FROM cells
    GROUP BY doc_id, f
    ORDER BY doc_id, frame_idx
    """,
)
def multimodal_y4m_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    plane_bytes = 3 * _Y4M_PLANE
    frame_cols = [
        F.concat(
            F.lit("FRAME\n"),
            F.rpad(
                F.substring(
                    F.coalesce("text", F.lit("")),
                    f * plane_bytes + 1,
                    plane_bytes,
                ),
                plane_bytes,
                "x",
            ),
        )
        for f in range(_Y4M_FRAMES)
    ]
    y4m = docs.select(
        "doc_id",
        F.encode(
            F.concat(F.lit(_y4m_payload_header()), *frame_cols), "UTF-8"
        ).alias("payload"),
    )
    # NOT widened (r16 A/B): plane split + per-frame means are too cheap
    # to pay the repartition (min-of-3 0.99s -> 1.06s widened; the ppm
    # lesson)
    return y4m.mapInPandas(
        _y4m_stats_batches, schema=_Y4M_STATS_SCHEMA
    ).orderBy("doc_id", "frame_idx")


# ---------------------------------------------------------------------------
# GENUINE COMPRESSED image decode: PNG for 8-bit RGB, dependency-free
# (stdlib zlib inflates the IDAT stream; numpy reconstructs scanlines
# through all five PNG filters: None/Sub/Up/Average/Paeth; chunk CRCs
# are verified). This closes the r8 "compressed formats need pillow"
# seam for PNG - pillow now gates only JPEG.
#
# Unlike the PPM/WAV/Y4M paths, the payload constructor cannot live
# JVM-side: DEFLATE + CRC32 are not column expressions. The scan ships
# (doc_id, 192 raw document bytes); inside mapInPandas encode_png()
# wraps them into a real PNG (filter type cycling r % 5, so every
# document exercises all five filters) and decode_png() - the
# independent inflate+unfilter codec - reconstructs the pixels. The
# oracle recomputes the statistics from the SOURCE characters, so any
# asymmetry in the filter math between the two sides shifts pixel
# values and fails the value hash. (A shared encode/decode bug that
# cancels exactly is the residual blind spot; the unit tests close it
# by checking encode_png's filtered bytes against a per-spec scalar
# reimplementation and decoding test-built PNGs - see
# tests/test_multimodal_decode.py.) wsum is a position-weighted
# checksum (sum of (i+1)*byte over row-major RGB order), so scanline or
# channel permutations that leave the means invariant still fail.
#
# Scale notes (100 TB of images): identical to the PPM path - payload
# bytes live only in executor-side Arrow batches, decode is a
# shuffle-free projection, and the only shuffle is the presentation
# sort. Real corpora swap the fixture constructor for a parquet binary
# column; decode + stats are unchanged.
_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_W = _PNG_H = 8
_PNG_NPIX = _PNG_W * _PNG_H  # 64 pixels (power of two: exact means)


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def encode_png(arr: np.ndarray) -> bytes:
    """Minimal real PNG encoder for 8-bit RGB [h, w, 3] arrays (the
    fixture-payload constructor; roundtrip source for the decoder
    tests). Scanline r is filtered with type r % 5, so an 8-row image
    exercises every PNG filter. Filter predictors reference RAW bytes
    of the current and prior scanline per the spec."""
    h, w, _ = arr.shape
    raw = arr.astype(np.int64)
    zeros = np.zeros(w * 3, dtype=np.int64)
    lines = []
    for r in range(h):
        ftype = r % 5
        cur = raw[r].reshape(-1)
        prev = raw[r - 1].reshape(-1) if r else zeros
        filt = bytearray([ftype])
        for x in range(w * 3):
            a = int(cur[x - 3]) if x >= 3 else 0
            b = int(prev[x])
            c = int(prev[x - 3]) if x >= 3 else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = a
            elif ftype == 2:
                pred = b
            elif ftype == 3:
                pred = (a + b) // 2
            else:
                pred = _paeth(a, b, c)
            filt.append((int(cur[x]) - pred) & 0xFF)
        lines.append(bytes(filt))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(b"".join(lines)))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(payload: bytes):
    """Real, dependency-free PNG decode for 8-bit RGB non-interlaced
    payloads: (width, height, uint8 array of shape [height, width, 3]).
    Walks the chunk list verifying each CRC32, inflates the
    concatenated IDAT stream with stdlib zlib, and reconstructs
    scanlines through all five PNG filter types. Palette / alpha /
    16-bit / interlaced images would need pillow."""
    if not payload.startswith(_PNG_SIG):
        raise ValueError("not a PNG payload")
    pos = len(_PNG_SIG)
    width = height = None
    idat = bytearray()
    seen_iend = False
    while pos + 8 <= len(payload):
        (size,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        if pos + 12 + size > len(payload):
            raise ValueError("truncated PNG chunk")
        body = payload[pos + 8 : pos + 8 + size]
        (crc,) = struct.unpack(
            ">I", payload[pos + 8 + size : pos + 12 + size]
        )
        if crc != (zlib.crc32(ctype + body) & 0xFFFFFFFF):
            raise ValueError("PNG chunk CRC mismatch")
        if ctype == b"IHDR":
            if len(body) != 13:
                # keep malformed input inside the codec's ValueError
                # dialect - struct.error would escape the contract
                raise ValueError("invalid PNG IHDR length")
            width, height, depth, color, comp, filt, inter = struct.unpack(
                ">IIBBBBB", body
            )
            if width == 0 or height == 0:
                raise ValueError("invalid PNG dimensions")
            if depth != 8 or color != 2:
                raise ValueError("only 8-bit RGB PNG supported")
            if comp or filt or inter:
                raise ValueError(
                    "unsupported PNG compression/filter/interlace method"
                )
        elif ctype == b"IDAT":
            if width is None:
                raise ValueError("PNG IDAT before IHDR")
            idat += body
        elif ctype == b"IEND":
            seen_iend = True
            break
        pos += 12 + size
    if width is None:
        raise ValueError("PNG missing IHDR")
    if not seen_iend:
        raise ValueError("PNG missing IEND")
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as exc:
        raise ValueError("corrupt PNG IDAT stream") from exc
    stride = 1 + 3 * width
    if len(raw) != stride * height:
        raise ValueError("PNG scanline data size mismatch")
    out = np.zeros((height, 3 * width), dtype=np.uint8)
    prev = np.zeros(3 * width, dtype=np.int64)
    for r in range(height):
        line = raw[r * stride : (r + 1) * stride]
        ftype = line[0]
        cur = np.frombuffer(line, dtype=np.uint8, offset=1).astype(np.int64)
        if ftype == 0:
            rec = cur
        elif ftype == 2:  # Up: vectorizable (depends only on prior row)
            rec = (cur + prev) & 0xFF
        elif ftype in (1, 3, 4):  # Sub/Average/Paeth: sequential in x
            rec = cur
            for x in range(3 * width):
                a = int(rec[x - 3]) if x >= 3 else 0
                b = int(prev[x])
                c = int(prev[x - 3]) if x >= 3 else 0
                if ftype == 1:
                    pred = a
                elif ftype == 3:
                    pred = (a + b) // 2
                else:
                    pred = _paeth(a, b, c)
                rec[x] = (rec[x] + pred) & 0xFF
        else:
            raise ValueError("invalid PNG filter type")
        out[r] = rec.astype(np.uint8)
        prev = rec
    return width, height, out.reshape(height, width, 3)


_PNG_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("mean_r", T.DoubleType()),
        T.StructField("mean_g", T.DoubleType()),
        T.StructField("mean_b", T.DoubleType()),
        T.StructField("wsum", T.LongType()),
    ]
)


def _png_stats_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    weights = np.arange(1, 3 * _PNG_NPIX + 1, dtype=np.int64)
    for pdf in batches:
        out: dict[str, list] = {
            "doc_id": [], "width": [], "height": [],
            "mean_r": [], "mean_g": [], "mean_b": [], "wsum": [],
        }
        for doc_id, px in zip(pdf["doc_id"], pdf["px"]):
            pixels = np.frombuffer(px, dtype=np.uint8).reshape(
                _PNG_H, _PNG_W, 3
            )
            w, h, arr = decode_png(encode_png(pixels))
            flat = arr.reshape(-1).astype(np.int64)
            means = arr.reshape(-1, 3).mean(axis=0)
            out["doc_id"].append(doc_id)
            out["width"].append(w)
            out["height"].append(h)
            out["mean_r"].append(float(means[0]))
            out["mean_g"].append(float(means[1]))
            out["mean_b"].append(float(means[2]))
            out["wsum"].append(int((flat * weights).sum()))
        yield pd.DataFrame(out)


@query(
    "multimodal_png_decode_stats",
    oracle=f"""
    WITH base AS (
        SELECT doc_id,
               rpad(substring(coalesce(text, ''), 1, {3 * _PNG_NPIX}),
                    {3 * _PNG_NPIX}, 'x') AS px
        FROM documents
    ),
    codes AS (
        SELECT doc_id, i, ord(substring(px, i + 1, 1)) AS code
        FROM base, (SELECT unnest(generate_series(0, {3 * _PNG_NPIX - 1})) AS i)
    )
    SELECT doc_id,
           CAST({_PNG_W} AS BIGINT) AS width,
           CAST({_PNG_H} AS BIGINT) AS height,
           CAST(CAST(sum(CASE WHEN i % 3 = 0 THEN code END) AS VARCHAR) AS DOUBLE)
               / {_PNG_NPIX} AS mean_r,
           CAST(CAST(sum(CASE WHEN i % 3 = 1 THEN code END) AS VARCHAR) AS DOUBLE)
               / {_PNG_NPIX} AS mean_g,
           CAST(CAST(sum(CASE WHEN i % 3 = 2 THEN code END) AS VARCHAR) AS DOUBLE)
               / {_PNG_NPIX} AS mean_b,
           CAST(sum((i + 1) * code) AS BIGINT) AS wsum
    FROM codes
    GROUP BY doc_id
    ORDER BY doc_id
    """,
)
def multimodal_png_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    png = docs.select(
        "doc_id",
        F.encode(
            F.rpad(
                F.substring(F.coalesce("text", F.lit("")), 1, 3 * _PNG_NPIX),
                3 * _PNG_NPIX,
                "x",
            ),
            "UTF-8",
        ).alias("px"),
    )
    # r16: widen before the decode - this projection is 192 bytes/doc
    # (the jpeg class, NOT the full-payload class where widening lost in
    # r5), and the Python side runs a real deflate+inflate+unfilter codec
    # per row; without the widen the whole decode ran on the fixture's
    # single scan split (plan: MapInPandas directly over Scan parquet).
    from ..tables import widen_small_scan

    return widen_small_scan(png).mapInPandas(
        _png_stats_batches, schema=_PNG_STATS_SCHEMA
    ).orderBy("doc_id")


# Perceptual-hash near-dup candidates: the image near-dup pattern (pHash
# banding) on the binary payloads. Each asset gets a 64-bit fingerprint
# of 4 16-bit bands, one per frame digest (frame decomposition identical
# to multimodal_frame_sample; a real codec would swap the byte-slice
# digest for a DCT of decoded pixels - same fingerprint width, same
# plan); candidate pairs are assets sharing ANY band (the hamming-ball
# search as a band equi-join, the MinHash-LSH shape on bits), then each
# candidate's hamming distance - the SUM of per-band XOR popcounts, so
# nothing ever packs past int64 - and a <= 8 near-dup flag are computed
# JVM-side. Pairs are emitted WITH the flag rather than filtered by it,
# so the threshold decision itself is oracle-checked (and the fixture's
# collision-level candidates keep the result non-empty at every SF).
#
# Scale notes (100 TB of images): fingerprints are a shuffle-free
# projection over the payload scan; the band join shuffles only
# (band, 16-bit value, id, band-vector) rows - never payload bytes; the
# per-pair work is 4 XOR+popcounts. Band-collision fan-out is uniform
# (digest bits), so no skew.
_PH_BANDS = 4
_PH_HAMMING_TAU = 8


def _ph_band_duck(g: int) -> str:
    return (
        f"CAST(('0x' || substring(sha256(substring(text, ({g}*n)//{_PH_BANDS} + 1,"
        f" (({g}+1)*n)//{_PH_BANDS} - ({g}*n)//{_PH_BANDS})), 1, 4)) AS BIGINT)"
    )


@query(
    "multimodal_phash_near_dup",
    oracle=f"""
    WITH f AS (SELECT doc_id, length(text) AS n, text FROM documents),
    fp AS (
        SELECT doc_id,
               {", ".join(f"{_ph_band_duck(g)} AS b{g}" for g in range(_PH_BANDS))}
        FROM f
    ),
    bands AS (
        SELECT doc_id, {", ".join(f"b{g}" for g in range(_PH_BANDS))},
               g, CASE g
               {" ".join(f"WHEN {g} THEN b{g}" for g in range(_PH_BANDS))}
               END AS bv
        FROM fp, (SELECT unnest(generate_series(0, {_PH_BANDS - 1})) AS g)
    ),
    cand AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(count(*) AS BIGINT) AS n_shared_bands,
               CAST(min({" + ".join(
                   f"bit_count(xor(a.b{g}, b.b{g}))" for g in range(_PH_BANDS)
               )}) AS BIGINT) AS hamming
        FROM bands a
        JOIN bands b ON a.g = b.g AND a.bv = b.bv AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, n_shared_bands, hamming,
           CASE WHEN hamming <= {_PH_HAMMING_TAU} THEN 1 ELSE 0 END
               AS is_near_dup
    FROM cand
    """,
)
def multimodal_phash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = payload_table(spark, sf_dir).select(
        "doc_id", "payload", F.length("payload").alias("n")
    )
    band_vals = [
        F.expr(
            f"CAST(conv(substring(sha2(substring(payload,"
            f" ({g}*n) div {_PH_BANDS} + 1,"
            f" (({g}+1)*n) div {_PH_BANDS} - ({g}*n) div {_PH_BANDS}), 256),"
            f" 1, 4), 16, 10) AS BIGINT)"
        ).alias(f"b{g}")
        for g in range(_PH_BANDS)
    ]
    fp = t.select("doc_id", *band_vals).select(
        "doc_id",
        F.array(*[F.col(f"b{g}") for g in range(_PH_BANDS)]).alias("bs"),
    )
    bands = fp.select("doc_id", "bs", F.posexplode("bs").alias("g", "bv"))
    a = bands.select(
        F.col("doc_id").alias("doc_a"), F.col("bs").alias("bs_a"), "g", "bv"
    )
    b = bands.select(
        F.col("doc_id").alias("doc_b"), F.col("bs").alias("bs_b"), "g", "bv"
    )
    # per-row hamming: every matched band row of a pair computes the same
    # value, so min() inside the pair group is a pure collapse
    hm = F.expr(
        "aggregate(zip_with(bs_a, bs_b, (x, y) -> bit_count(x ^ y)),"
        " 0, (acc, v) -> acc + v)"
    )
    cand = (
        a.join(b, ["g", "bv"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", hm.alias("hm"))
        .groupBy("doc_a", "doc_b")
        .agg(
            F.count("*").alias("n_shared_bands"),
            F.min("hm").cast("bigint").alias("hamming"),
        )
    )
    return cand.select(
        "doc_a",
        "doc_b",
        "n_shared_bands",
        "hamming",
        F.when(F.col("hamming") <= _PH_HAMMING_TAU, 1).otherwise(0).alias(
            "is_near_dup"
        ),
    )


# ---------------------------------------------------------------------------
# Baseline JPEG (ITU T.81 / JFIF) codec - dependency-free, numpy only.
# Closes the LAST pillow gate: with PPM (raw), PNG (DEFLATE) and now
# JPEG (Huffman + DCT) native, decode_image() routes every fixture
# format without an image library.
#
# Decoder scope: baseline sequential DCT (SOF0), 8-bit samples, 1 or 3
# components, arbitrary 1-2x sampling factors (chroma upsampled by
# pixel replication), standard or custom Huffman/quant tables, 0xFF00
# byte-stuffing. Progressive (SOF2), arithmetic coding, 16-bit quant
# tables and restart intervals raise ValueError in the same dialect as
# the PPM/PNG/WAV parsers - malformed or truncated input must never
# escape as a struct.error/KeyError/IndexError.
#
# Oracle-exactness device (the lossy-codec twist): the REGISTERED query
# builds images whose 8x8 blocks are each a CONSTANT gray level (one
# document byte per block). A constant block's DCT is DC-only; with
# quant step 8 the quantized DC is exactly (v - 128), and the decoder's
# dequant + IDCT + level shift reproduces v bit-for-bit (the float
# round-trip error is ~1e-13, far inside the final round()). So a fully
# GENERAL decoder - Huffman tables, zigzag, dequant, 2-D IDCT - yields
# pixels a DuckDB oracle can recompute from the source characters, and
# the value hash checks the whole pipeline. The AC/run-length and color
# paths, which block-constant fixtures cannot reach, are covered by the
# per-spec unit tests (tests/test_multimodal_decode.py): random full
# images round-tripped against an independent reference IDCT, and
# hand-built entropy streams.
_JPEG_ZIGZAG = (
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
)

# Standard luminance tables (ITU T.81 Annex K) - the encoder always
# writes these; the decoder reads WHATEVER tables the payload declares.
_JPEG_DC_BITS = (0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
_JPEG_DC_VALS = tuple(range(12))
_JPEG_AC_BITS = (0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D)
_JPEG_AC_VALS = (
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
)


def _jpeg_dct_matrix() -> np.ndarray:
    """8x8 DCT-II basis with JPEG normalization: F = A f A^T,
    f = A^T F A."""
    import math

    a = np.zeros((8, 8))
    for u in range(8):
        cu = (1.0 / math.sqrt(2.0)) if u == 0 else 1.0
        for x in range(8):
            a[u, x] = 0.5 * cu * math.cos((2 * x + 1) * u * math.pi / 16)
    return a


_JPEG_A = _jpeg_dct_matrix()


def _huffman_codes(bits, vals) -> dict:
    """Canonical (length, code) -> symbol map per T.81 C.2."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return out


def _huffman_encode_table(bits, vals) -> dict:
    """symbol -> (code, length), inverse of _huffman_codes."""
    return {
        sym: (code, length)
        for (length, code), sym in _huffman_codes(bits, vals).items()
    }


_JPEG_DC_ENC = _huffman_encode_table(_JPEG_DC_BITS, _JPEG_DC_VALS)
_JPEG_AC_ENC = _huffman_encode_table(_JPEG_AC_BITS, _JPEG_AC_VALS)


class _JpegBitWriter:
    """MSB-first bit accumulator with 0xFF byte stuffing; whole bytes
    drain per write call (arbitrary-precision int shifts), not per bit -
    the entropy coder is on the mapInPandas hot path."""

    def __init__(self) -> None:
        self.buf = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, value: int, nbits: int) -> None:
        self._acc = (self._acc << nbits) | (value & ((1 << nbits) - 1))
        self._n += nbits
        while self._n >= 8:
            self._n -= 8
            b = (self._acc >> self._n) & 0xFF
            self.buf.append(b)
            if b == 0xFF:  # byte stuffing
                self.buf.append(0x00)
        self._acc &= (1 << self._n) - 1

    def flush(self) -> None:
        if self._n:
            pad = 8 - self._n
            b = ((self._acc << pad) | ((1 << pad) - 1)) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)
            self._acc = 0
            self._n = 0


class _JpegBitReader:
    """Entropy-segment bit reader with 0xFF00 unstuffing; any real marker
    inside the segment means the stream ended early. Bytes load into an
    int accumulator so read_bits is one shift, and Huffman symbols
    resolve through the canonical mincode/maxcode walk (T.81 F.16) -
    integer compares per length instead of a dict probe per bit."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self._acc = 0
        self._n = 0

    def _load_byte(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("truncated JPEG entropy stream")
        b = self.data[self.pos]
        if b == 0xFF:
            if self.pos + 1 >= len(self.data):
                raise ValueError("truncated JPEG entropy stream")
            if self.data[self.pos + 1] != 0x00:
                raise ValueError(
                    "unexpected marker inside JPEG entropy stream"
                )
            self.pos += 2
        else:
            self.pos += 1
        self._acc = (self._acc << 8) | b
        self._n += 8

    def read_bit(self) -> int:
        if self._n == 0:
            self._load_byte()
        self._n -= 1
        return (self._acc >> self._n) & 1

    def read_bits(self, n: int) -> int:
        while self._n < n:
            self._load_byte()
        self._n -= n
        v = (self._acc >> self._n) & ((1 << n) - 1)
        self._acc &= (1 << self._n) - 1
        return v

    def read_symbol(self, table: "_JpegHuffTable") -> int:
        code = 0
        mincode, maxcode, val_at = table.mincode, table.maxcode, table.val_at
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            if maxcode[length] >= 0 and code <= maxcode[length]:
                return val_at[length][code - mincode[length]]
        raise ValueError("invalid JPEG Huffman code")


class _JpegHuffTable:
    """Canonical decode tables per T.81 F.15/F.16: for each code length,
    the smallest/largest code and the symbol slice it maps into."""

    def __init__(self, bits, vals) -> None:
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.val_at: list[list[int]] = [[] for _ in range(17)]
        code, k = 0, 0
        for length in range(1, 17):
            n = bits[length - 1]
            if n:
                self.mincode[length] = code
                self.maxcode[length] = code + n - 1
                self.val_at[length] = list(vals[k : k + n])
                code += n
                k += n
            code <<= 1


def _jpeg_magnitude(v: int) -> tuple[int, int]:
    """(category, appended bits) per T.81 F.1.2.1 (ones-complement for
    negatives)."""
    if v == 0:
        return 0, 0
    s = abs(v).bit_length()
    return (s, v if v > 0 else v + (1 << s) - 1)


def _jpeg_extend(bits: int, s: int) -> int:
    if s == 0:
        return 0
    return bits if bits >= (1 << (s - 1)) else bits - (1 << s) + 1


def encode_jpeg_gray(img: np.ndarray, qtable: np.ndarray | None = None) -> bytes:
    """Minimal real baseline-JFIF encoder for 8-bit GRAYSCALE [h, w]
    arrays with h, w multiples of 8 (the fixture-payload constructor and
    the decoder tests' roundtrip source). Forward float DCT, uniform
    quant table (default: all 8s, which makes BLOCK-CONSTANT images
    round-trip bit-exactly - see the section comment), standard Annex K
    luminance Huffman tables, proper DC prediction / AC run-length / EOB
    / ZRL and 0xFF byte stuffing."""
    h, w = img.shape
    if h % 8 or w % 8:
        raise ValueError("encoder requires multiple-of-8 dimensions")
    # SOF0 carries dimensions as big-endian uint16 (T.81 B.2.2): beyond
    # 65535 struct.pack raises an opaque struct.error mid-stream. Guard
    # up front with the contract's ValueError (r12 ADVICE fix).
    if not (1 <= h <= 65535 and 1 <= w <= 65535):
        raise ValueError("dimensions must fit uint16 (1..65535)")
    q = (
        np.full(64, 8, dtype=np.int64)
        if qtable is None
        else np.asarray(qtable, dtype=np.int64).reshape(64)
    )
    if (q < 1).any() or (q > 255).any():
        raise ValueError("quant entries must be in 1..255")
    dc_enc = _JPEG_DC_ENC  # module-level: the tables are Annex K constants
    ac_enc = _JPEG_AC_ENC

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    head = bytearray(b"\xff\xd8")  # SOI
    head += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    head += seg(0xDB, bytes([0x00]) + bytes(int(q[i]) for i in range(64)))
    head += seg(0xC0, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
    head += seg(
        0xC4,
        bytes([0x00]) + bytes(_JPEG_DC_BITS) + bytes(_JPEG_DC_VALS),
    )
    head += seg(
        0xC4,
        bytes([0x10]) + bytes(_JPEG_AC_BITS) + bytes(_JPEG_AC_VALS),
    )
    head += seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))

    # forward DCT + zigzag quantization VECTORIZED across all blocks
    # (one einsum instead of two 8x8 matmuls per block), then entropy-
    # code from the integer coefficient array, visiting only NONZERO AC
    # coefficients (runs come from index gaps) - the all-zero AC tail of
    # a flat block costs nothing instead of 63 loop iterations.
    shifted = img.astype(np.float64) - 128.0
    blocks = (
        shifted.reshape(h // 8, 8, w // 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
    )
    # broadcast matmul, not einsum: identical math, ~10x less call
    # overhead on (n, 8, 8) stacks (profiled on the mapInPandas path)
    coefs = _JPEG_A @ blocks @ _JPEG_A.T
    zzq = np.round(
        coefs.reshape(-1, 64)[:, list(_JPEG_ZIGZAG)] / q[np.newaxis, :]
    ).astype(np.int64)

    wtr = _JpegBitWriter()
    prev_dc = 0
    for zz in zzq:
        dc = int(zz[0])
        s, mag = _jpeg_magnitude(dc - prev_dc)
        prev_dc = dc
        code, length = dc_enc[s]
        wtr.write(code, length)
        if s:
            wtr.write(mag, s)
        nz = np.nonzero(zz[1:])[0]
        k_prev = 0
        for idx in nz:
            k = int(idx) + 1
            run = k - k_prev - 1
            while run > 15:
                zc, zl = ac_enc[0xF0]  # ZRL: sixteen zeros
                wtr.write(zc, zl)
                run -= 16
            s, mag = _jpeg_magnitude(int(zz[k]))
            code, length = ac_enc[(run << 4) | s]
            wtr.write(code, length)
            wtr.write(mag, s)
            k_prev = k
        if k_prev < 63:
            code, length = ac_enc[0x00]  # EOB
            wtr.write(code, length)
    wtr.flush()
    return bytes(head) + bytes(wtr.buf) + b"\xff\xd9"  # EOI


def decode_jpeg(payload: bytes):
    """Real, dependency-free baseline JPEG decode: (width, height, array)
    - uint8 [h, w] for grayscale, [h, w, 3] RGB for 3-component YCbCr
    (JFIF conversion, chroma upsampled by replication). Full marker walk,
    declared Huffman/quant tables, zigzag + dequant + exact float 2-D
    IDCT. Progressive / arithmetic / 16-bit-quant / restart-interval
    streams raise ValueError, as does any truncation or malformed
    segment."""
    if len(payload) < 4 or payload[0:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}
    frame = None  # (h, w, [(cid, hs, vs, qid), ...])
    scan = None  # ([(cid, dc_id, ac_id), ...], entropy_pos)

    def need(n: int) -> None:
        if pos + n > len(payload):
            raise ValueError("truncated JPEG segment")

    while True:
        need(2)
        if payload[pos] != 0xFF:
            raise ValueError("invalid JPEG marker prefix")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI before any scan
            raise ValueError("JPEG has no scan data")
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:  # TEM/RSTn: bare
            continue
        need(2)
        (seglen,) = struct.unpack(">H", payload[pos : pos + 2])
        if seglen < 2:
            raise ValueError("invalid JPEG segment length")
        need(seglen)
        body = payload[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            b = 0
            while b < len(body):
                pq, tq = body[b] >> 4, body[b] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit JPEG quant tables unsupported")
                if b + 65 > len(body):
                    raise ValueError("truncated JPEG DQT")
                qtables[tq] = np.frombuffer(
                    body, dtype=np.uint8, count=64, offset=b + 1
                ).astype(np.int64)
                b += 65
        elif marker == 0xC4:  # DHT
            b = 0
            while b < len(body):
                tc, th = body[b] >> 4, body[b] & 0x0F
                if b + 17 > len(body):
                    raise ValueError("truncated JPEG DHT")
                bits = list(body[b + 1 : b + 17])
                nsym = sum(bits)
                if b + 17 + nsym > len(body):
                    raise ValueError("truncated JPEG DHT symbols")
                vals = list(body[b + 17 : b + 17 + nsym])
                htables[(tc, th)] = _JpegHuffTable(bits, vals)
                b += 17 + nsym
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1: baseline-decodable
            # Length-guard BEFORE unpack/index: a truncated body must be
            # the contract's ValueError, not an escaping struct.error /
            # IndexError that crashes a corpus-quarantine caller (r12
            # ADVICE fix; the DQT/DHT arms already guarded).
            if len(body) < 6:
                raise ValueError("truncated JPEG SOF")
            prec, fh, fw, nc = struct.unpack(">BHHB", body[0:6])
            if prec != 8:
                raise ValueError("only 8-bit JPEG samples supported")
            if fh == 0 or fw == 0:
                raise ValueError("invalid JPEG dimensions")
            if nc not in (1, 3):
                raise ValueError("only 1- or 3-component JPEG supported")
            if len(body) < 6 + 3 * nc:
                raise ValueError("truncated JPEG SOF components")
            comps = []
            for c in range(nc):
                cid, hv, qid = body[6 + 3 * c], body[7 + 3 * c], body[8 + 3 * c]
                hs, vs = hv >> 4, hv & 0x0F
                if not (1 <= hs <= 2 and 1 <= vs <= 2):
                    raise ValueError("unsupported JPEG sampling factors")
                comps.append((cid, hs, vs, qid))
            frame = (fh, fw, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError("progressive/extended JPEG unsupported")
        elif marker == 0xDD:  # DRI
            if len(body) < 2:
                raise ValueError("truncated JPEG DRI")
            (ri,) = struct.unpack(">H", body[0:2])
            if ri:
                raise ValueError("JPEG restart intervals unsupported")
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            if len(body) < 1:
                raise ValueError("truncated JPEG SOS")
            ns = body[0]
            if ns != len(frame[2]):
                raise ValueError("JPEG partial scans unsupported")
            if len(body) < 1 + 2 * ns:
                raise ValueError("truncated JPEG SOS components")
            sel = []
            for c in range(ns):
                cid, tt = body[1 + 2 * c], body[2 + 2 * c]
                sel.append((cid, tt >> 4, tt & 0x0F))
            scan = (sel, pos + seglen)
            break
        # APPn / COM / anything else with a length: skipped
        pos += seglen

    fh, fw, comps = frame
    sel_by_cid = {cid: (dc, ac) for cid, dc, ac in scan[0]}
    hmax = max(hs for _, hs, _, _ in comps)
    vmax = max(vs for _, _, vs, _ in comps)
    mcux = -(-fw // (8 * hmax))
    mcuy = -(-fh // (8 * vmax))
    planes = []
    for cid, hs, vs, qid in comps:
        if qid not in qtables:
            raise ValueError("JPEG scan references undefined quant table")
        if cid not in sel_by_cid:
            raise ValueError("JPEG scan component mismatch")
        planes.append(
            np.zeros((mcuy * vs * 8, mcux * hs * 8), dtype=np.float64)
        )

    rdr = _JpegBitReader(payload, scan[1])
    pred = [0] * len(comps)
    # dequant table mapped to raster order: deq_raster[_JPEG_ZIGZAG[k]]=q[k]
    deq_raster = []
    for _, _, _, qid in comps:
        t = np.zeros(64, dtype=np.int64)
        for k in range(64):
            t[_JPEG_ZIGZAG[k]] = qtables[qid][k]
        deq_raster.append(t)
    # entropy-decode every block's zigzag coefficients first (sequential
    # by construction), batching positions; dequant + IDCT then run as
    # ONE vectorized einsum per component - the per-block matmul call
    # overhead dominated the mapInPandas hot path otherwise.
    zig = list(_JPEG_ZIGZAG)
    blk_zz: list[list[np.ndarray]] = [[] for _ in comps]
    blk_pos: list[list[tuple[int, int]]] = [[] for _ in comps]
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, (cid, hs, vs, qid) in enumerate(comps):
                dc_t = htables.get((0, sel_by_cid[cid][0]))
                ac_t = htables.get((1, sel_by_cid[cid][1]))
                if dc_t is None or ac_t is None:
                    raise ValueError(
                        "JPEG scan references undefined Huffman table"
                    )
                for v in range(vs):
                    for hblk in range(hs):
                        zz = np.zeros(64, dtype=np.int64)
                        s = rdr.read_symbol(dc_t)
                        if s > 11:
                            raise ValueError("invalid JPEG DC category")
                        pred[ci] += _jpeg_extend(rdr.read_bits(s), s)
                        zz[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = rdr.read_symbol(ac_t)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError(
                                    "JPEG AC run past end of block"
                                )
                            zz[k] = _jpeg_extend(rdr.read_bits(s), s)
                            k += 1
                        blk_zz[ci].append(zz)
                        blk_pos[ci].append(
                            ((my * vs + v) * 8, (mx * hs + hblk) * 8)
                        )
    for ci in range(len(comps)):
        zzs = np.stack(blk_zz[ci])  # [n_blocks, 64] zigzag order
        coef = np.zeros_like(zzs)
        coef[:, zig] = zzs
        deq = (coef * deq_raster[ci][np.newaxis, :]).reshape(-1, 8, 8)
        # broadcast matmul, not einsum (see the encoder note)
        spatial = _JPEG_A.T @ deq @ _JPEG_A
        for b, (py, px) in enumerate(blk_pos[ci]):
            planes[ci][py : py + 8, px : px + 8] = spatial[b]
    # byte-align, then require a proper EOI (optionally padded with FFs)
    tail = rdr.pos
    while tail < len(payload) and payload[tail] == 0xFF and (
        tail + 1 < len(payload) and payload[tail + 1] == 0xFF
    ):
        tail += 1
    if tail + 2 > len(payload) or payload[tail : tail + 2] != b"\xff\xd9":
        raise ValueError("missing JPEG EOI")

    out_planes = []
    for ci, (cid, hs, vs, qid) in enumerate(comps):
        p = planes[ci]
        if hs != hmax or vs != vmax:
            p = np.repeat(np.repeat(p, vmax // vs, axis=0), hmax // hs, axis=1)
        out_planes.append(p[:fh, :fw] + 128.0)
    if len(out_planes) == 1:
        gray = np.clip(np.round(out_planes[0]), 0, 255).astype(np.uint8)
        return fw, fh, gray
    y, cb, cr = out_planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack(
        [np.clip(np.round(ch), 0, 255) for ch in (r, g, b)], axis=-1
    ).astype(np.uint8)
    return fw, fh, rgb


# Oracle-checked JPEG decode: one document byte per 8x8 block (64 blocks
# -> a 64x64 grayscale image), encoded with the REAL entropy coder
# (standard Annex K tables, DC prediction across blocks, byte stuffing)
# and decoded with the fully general baseline decoder above. Block-
# constant tiles + quant step 8 make the lossy pipeline bit-exact (DC
# category coding still varies per document via the byte deltas), so
# the DuckDB oracle recomputes every statistic from the SOURCE
# characters: any defect anywhere in the Huffman tables, bit stuffing,
# zigzag, dequant or IDCT shifts pixels and fails the value hash. wsum
# weights every DECODED PIXEL by its raster position, so a correct set
# of block values laid out in the wrong geometry still fails; the
# per-block weight in the oracle is the closed-form sum of its 64 pixel
# positions (block i at r=i//8, c=i%8 covers rows 8r..8r+7 of a 64-wide
# image: sum = 32768*r + 512*c + 14624).
#
# Scale notes (100 TB of images): same shape as the PPM/PNG paths -
# encode+decode is a shuffle-free mapInPandas projection, payload bytes
# never shuffle, and the only exchange is the presentation sort. Real
# corpora replace the fixture constructor with a parquet binary column.
_JPG_BLOCKS = 64  # 8x8 blocks of 8x8 px = 64x64 image
_JPG_W = _JPG_H = 64


_JPG_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("mean_gray", T.DoubleType()),
        T.StructField("wsum", T.LongType()),
    ]
)


def _jpeg_stats_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    weights = np.arange(1, _JPG_W * _JPG_H + 1, dtype=np.int64)
    tile = np.ones((8, 8), dtype=np.int64)
    for pdf in batches:
        out: dict[str, list] = {
            "doc_id": [], "width": [], "height": [],
            "mean_gray": [], "wsum": [],
        }
        for doc_id, px in zip(pdf["doc_id"], pdf["px"]):
            vals = np.frombuffer(px, dtype=np.uint8).astype(np.int64)
            img = np.kron(vals.reshape(8, 8), tile).astype(np.uint8)
            w, h, arr = decode_jpeg(encode_jpeg_gray(img))
            flat = arr.reshape(-1).astype(np.int64)
            out["doc_id"].append(doc_id)
            out["width"].append(w)
            out["height"].append(h)
            out["mean_gray"].append(float(flat.sum()) / (_JPG_W * _JPG_H))
            out["wsum"].append(int((flat * weights).sum()))
        yield pd.DataFrame(out)


@query(
    "multimodal_jpeg_decode_stats",
    oracle=f"""
    WITH base AS (
        SELECT doc_id,
               rpad(substring(coalesce(text, ''), 1, {_JPG_BLOCKS}),
                    {_JPG_BLOCKS}, 'x') AS px
        FROM documents
    ),
    codes AS (
        SELECT doc_id, i, ord(substring(px, i + 1, 1)) AS code
        FROM base, (SELECT unnest(generate_series(0, {_JPG_BLOCKS - 1})) AS i)
    )
    SELECT doc_id,
           CAST({_JPG_W} AS BIGINT) AS width,
           CAST({_JPG_H} AS BIGINT) AS height,
           CAST(CAST(sum(code) AS VARCHAR) AS DOUBLE) / {_JPG_BLOCKS} AS mean_gray,
           CAST(sum(code * (32768 * (i // 8) + 512 * (i % 8) + 14624))
               AS BIGINT) AS wsum
    FROM codes
    GROUP BY doc_id
    ORDER BY doc_id
    """,
)
def multimodal_jpeg_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..tables import widen_small_scan

    docs = load_table(spark, sf_dir, "documents")
    jpg = docs.select(
        "doc_id",
        F.encode(
            F.rpad(
                F.substring(F.coalesce("text", F.lit("")), 1, _JPG_BLOCKS),
                _JPG_BLOCKS,
                "x",
            ),
            "UTF-8",
        ).alias("px"),
    )
    # Unlike the PPM/PNG family (where widening lost: full payloads had
    # to shuffle), this projection is 64 BYTES per doc and the Python
    # side runs a full entropy codec (~1 ms/doc) - fanning the tiny
    # relation out to session parallelism is a near-free shuffle that
    # buys the whole map stage's concurrency (measured 20s -> ~2s at
    # sf0.1 on local[32]).
    return widen_small_scan(jpg).mapInPandas(
        _jpeg_stats_batches, schema=_JPG_STATS_SCHEMA
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Image resize - the remaining multimodal primitive from the brief's
# decode / feature-extract / resize / frame-sample list. Pure-numpy
# nearest-neighbor and bilinear kernels over decoded pixel arrays; the
# registered query runs decode -> resize (one downscale + one upscale)
# -> channel statistics inside a single mapInPandas projection, and the
# DuckDB oracle recomputes every statistic from the SOURCE characters
# through the same integer index map - any off-by-one in the resize
# geometry (or the decode underneath it) shifts pixels and fails the
# value hash. Bilinear (continuous output, not SQL-reproducible
# bit-for-bit) is covered by unit tests against an independent scalar
# reference instead (tests/test_multimodal_decode.py).
#
# Scale notes (100 TB of images): resize is a per-row projection inside
# the same Arrow batch as the decode - no extra pass, no shuffle, and
# the OUTPUT payload (the resized tensor a training pipeline actually
# ships) is a fixed small size regardless of source resolution, which
# is what makes decode+resize-at-ingest the bandwidth win at scale.


def resize_image(arr: np.ndarray, out_w: int, out_h: int, method: str = "nearest") -> np.ndarray:
    """Resize [h, w] or [h, w, C] uint8 pixels to (out_h, out_w).

    nearest: source pixel floor(y * h / out_h), floor(x * w / out_w) -
    the exact-integer map the oracle-checked query relies on (and the
    replication upsample used by the JPEG chroma path, generalized to
    arbitrary ratios). bilinear: half-pixel-center convention
    (sy = (y + 0.5) * h / out_h - 0.5, edges clamped), float weights,
    rounded back to uint8."""
    if out_w <= 0 or out_h <= 0:
        raise ValueError("invalid resize dimensions")
    h, w = arr.shape[0], arr.shape[1]
    if method == "nearest":
        ys = (np.arange(out_h, dtype=np.int64) * h) // out_h
        xs = (np.arange(out_w, dtype=np.int64) * w) // out_w
        return arr[np.ix_(ys, xs)]
    if method == "bilinear":
        sy = (np.arange(out_h, dtype=np.float64) + 0.5) * (h / out_h) - 0.5
        sx = (np.arange(out_w, dtype=np.float64) + 0.5) * (w / out_w) - 0.5
        y0 = np.clip(np.floor(sy).astype(np.int64), 0, h - 1)
        x0 = np.clip(np.floor(sx).astype(np.int64), 0, w - 1)
        y1 = np.minimum(y0 + 1, h - 1)
        x1 = np.minimum(x0 + 1, w - 1)
        fy = np.clip(sy - y0, 0.0, 1.0)[:, None]
        fx = np.clip(sx - x0, 0.0, 1.0)[None, :]
        if arr.ndim == 3:
            fy = fy[..., None]
            fx = fx[..., None]
        a = arr.astype(np.float64)
        top = a[np.ix_(y0, x0)] * (1 - fx) + a[np.ix_(y0, x1)] * fx
        bot = a[np.ix_(y1, x0)] * (1 - fx) + a[np.ix_(y1, x1)] * fx
        out = top * (1 - fy) + bot * fy
        return np.clip(np.round(out), 0, 255).astype(np.uint8)
    raise ValueError(f"unknown resize method: {method}")


_RSZ_SRC_W = _RSZ_SRC_H = 8  # 8x8 RGB source = 192 payload bytes
_RSZ_DN = 4  # downscale target (4x4)
_RSZ_UP = 16  # upscale target (16x16)
_RSZ_NBYTES = 3 * _RSZ_SRC_W * _RSZ_SRC_H

_RSZ_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("mean_dn", T.DoubleType()),
        T.StructField("wsum_dn", T.LongType()),
        T.StructField("mean_up", T.DoubleType()),
        T.StructField("wsum_up", T.LongType()),
    ]
)


def _resize_stats_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    w_dn = np.arange(1, 3 * _RSZ_DN * _RSZ_DN + 1, dtype=np.int64)
    w_up = np.arange(1, 3 * _RSZ_UP * _RSZ_UP + 1, dtype=np.int64)
    header = f"P6\n{_RSZ_SRC_W} {_RSZ_SRC_H}\n255\n".encode()
    for pdf in batches:
        out: dict[str, list] = {
            "doc_id": [], "mean_dn": [], "wsum_dn": [],
            "mean_up": [], "wsum_up": [],
        }
        for doc_id, px in zip(pdf["doc_id"], pdf["px"]):
            _, _, arr = decode_ppm(header + bytes(px))
            dn = resize_image(arr, _RSZ_DN, _RSZ_DN).reshape(-1).astype(np.int64)
            up = resize_image(arr, _RSZ_UP, _RSZ_UP).reshape(-1).astype(np.int64)
            out["doc_id"].append(doc_id)
            out["mean_dn"].append(float(dn.sum()) / dn.size)
            out["wsum_dn"].append(int((dn * w_dn).sum()))
            out["mean_up"].append(float(up.sum()) / up.size)
            out["wsum_up"].append(int((up * w_up).sum()))
        yield pd.DataFrame(out)


# Oracle index math (nearest-neighbor, integer): source raster index of
# an OUTPUT position i (out size N, per-channel stride 3) is
#   y = i // (3N), x = (i % (3N)) // 3, c = i % 3
#   src = 3 * (8 * (y * 8 // N) + (x * 8 // N)) + c
@query(
    "multimodal_resize_stats",
    oracle=f"""
    WITH base AS (
        SELECT doc_id,
               rpad(substring(coalesce(text, ''), 1, {_RSZ_NBYTES}),
                    {_RSZ_NBYTES}, 'x') AS px
        FROM documents
    ),
    dn AS (
        SELECT doc_id, i,
               ord(substring(px,
                   3 * (8 * ((i // {3 * _RSZ_DN}) * 8 // {_RSZ_DN})
                        + (((i % {3 * _RSZ_DN}) // 3) * 8 // {_RSZ_DN}))
                   + i % 3 + 1, 1)) AS val
        FROM base,
             (SELECT unnest(generate_series(0, {3 * _RSZ_DN * _RSZ_DN - 1}))
              AS i)
    ),
    up AS (
        SELECT doc_id, i,
               ord(substring(px,
                   3 * (8 * ((i // {3 * _RSZ_UP}) * 8 // {_RSZ_UP})
                        + (((i % {3 * _RSZ_UP}) // 3) * 8 // {_RSZ_UP}))
                   + i % 3 + 1, 1)) AS val
        FROM base,
             (SELECT unnest(generate_series(0, {3 * _RSZ_UP * _RSZ_UP - 1}))
              AS i)
    ),
    d AS (
        SELECT doc_id,
               CAST(CAST(sum(val) AS VARCHAR) AS DOUBLE) / {3 * _RSZ_DN * _RSZ_DN} AS mean_dn,
               CAST(sum((i + 1) * val) AS BIGINT) AS wsum_dn
        FROM dn GROUP BY doc_id
    ),
    u AS (
        SELECT doc_id,
               CAST(CAST(sum(val) AS VARCHAR) AS DOUBLE) / {3 * _RSZ_UP * _RSZ_UP} AS mean_up,
               CAST(sum((i + 1) * val) AS BIGINT) AS wsum_up
        FROM up GROUP BY doc_id
    )
    SELECT doc_id, mean_dn, wsum_dn, mean_up, wsum_up
    FROM d JOIN u USING (doc_id)
    ORDER BY doc_id
    """,
)
def multimodal_resize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    src = docs.select(
        "doc_id",
        F.encode(
            F.rpad(
                F.substring(F.coalesce("text", F.lit("")), 1, _RSZ_NBYTES),
                _RSZ_NBYTES,
                "x",
            ),
            "UTF-8",
        ).alias("px"),
    )
    # r16: widen before the resize kernels - fixed small projection
    # (_RSZ_NBYTES bytes/doc, the jpeg class); see the png note above
    from ..tables import widen_small_scan

    return widen_small_scan(src).mapInPandas(
        _resize_stats_batches, schema=_RSZ_STATS_SCHEMA
    ).orderBy("doc_id")
