"""Multimodal column plumbing: image/audio/video as opaque binary + typed
metadata, processed via Arrow-batched mapInPandas.

The Spark-side machinery (schemas, batch shapes, partition sizing) is real
and tested.  Decoding is split honestly by what pure numpy can do:

* REAL decoders (no media libraries needed): `decode_wav` (RIFF/WAVE
  PCM 8/16-bit, any channel count), `decode_bmp` (BITMAPINFOHEADER
  BI_RGB 24/32-bit, bottom-up or top-down, row padding), and — round 6
  — `decode_png` (stdlib zlib inflate + numpy unfiltering of all five
  filter types; gray/RGB/RGBA/gray+alpha at 8/16-bit, palettized at
  1/2/4/8-bit, sequential and Adam7-interlaced — the full PNG
  still-image surface) and JPEG (`operators/jpeg.py`: full Huffman/DCT
  pipeline, 4:4:4/4:2:2/4:2:0, restart markers, BASELINE + — round 7 —
  PROGRESSIVE with spectral selection and successive approximation —
  validated against real libjpeg-produced files of both kinds), plus
  real feature kernels (`audio_features`: RMS/ZCR/spectral centroid via
  FFT; `image_features`: per-channel stats + luminance histogram).
  Round 7 adds VIDEO: `operators/video.py` parses the RIFF/AVI
  container from scratch and decodes MJPEG (via the repo's own JPEG
  decoder) and raw-DIB frame streams with uniform frame SAMPLING —
  `video_features` touches only k frames per row regardless of length —
  and GIF: `operators/gif.py`, a real LZW codec (variable 3..12-bit
  codes, table reset) + interlace + local palettes, first frame of
  animated streams.
  Round 7 late also lands 12-bit JPEG (uint16 decode) and
  ARITHMETIC-coded JPEG, sequential AND progressive
  (`operators/jpeg_arith.py`: T.81 QM-coder with the state table
  PROBED from the system libjpeg, validated bit-exact against libjpeg
  coefficient dumps on 11 real streams).
  Round 8 adds LOSSLESS (SOF3) JPEG — Annex H predictors, 2-16 bit —
  HIERARCHICAL (DHP/EXP/SOF5/SOF7) progressions, and Adobe
  4-component CMYK/YCCK sequential decode: the full T.81 surface.
* STUBBED: what genuinely needs ffmpeg-class dependencies
  (H.264/H.265/VP9 inter-frame codecs) —
  `decode_image_stub` (deterministic fake) stands in, swap for
  PIL/torchaudio/ffmpeg on a real cluster.

`extract_media_features` auto-dispatches: payloads that ARE
wav/bmp/png/jpeg/gif/avi get the real path; everything else falls back
to the stub.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, FloatType, IntegerType, LongType, StringType,
    StructField, StructType,
)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),       # image | audio | video
    StructField("payload", BinaryType()),    # opaque encoded bytes
    StructField("meta", StructType([
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("codec", StringType()),
    ])),
])

FEATURE_SCHEMA = ("media_id long, kind string, n_bytes long, "
                  "digest string, decode_path string, feature array<float>")


def decode_image_stub(payload: bytes, out_dim: int = 16) -> np.ndarray:
    """Deterministic fake 'decode + embed': SHA-256 of the payload expanded
    to out_dim floats in [0, 1).  Replace with a real decoder on a cluster.

    Raising path kept for parity with real decoders:
    >>> decode_image_stub(None)
    Traceback (most recent call last):
    ...
    ValueError: empty payload
    """
    if not payload:
        raise ValueError("empty payload")
    h = hashlib.sha256(payload).digest()
    raw = np.frombuffer((h * ((out_dim * 4) // len(h) + 1))[: out_dim * 4],
                        dtype=np.uint32)
    return (raw % 1_000_003).astype(np.float32) / 1_000_003.0


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Pure-numpy RIFF/WAVE PCM decoder → (samples float32 in [-1, 1] of
    shape (n_frames, n_channels), sample_rate).

    Handles 8-bit (unsigned) and 16-bit (signed LE) PCM, any channel
    count, and chunk walking (skips LIST/fact/etc. to find fmt + data).
    Raises ValueError on anything that is not uncompressed PCM — the
    caller falls back to the stub."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        size = int.from_bytes(payload[pos + 4:pos + 8], "little")
        if pos + 8 + size > len(payload):
            # a truncated/size-corrupted chunk must NOT decode silently to
            # fewer samples — raise so the caller's stub fallback triggers
            # (the bmp decoder's pixel-array check is the same contract)
            raise ValueError(
                f"truncated chunk {cid!r}: declares {size} bytes, "
                f"{len(payload) - pos - 8} remain")
        body = payload[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    if len(fmt) < 16:
        raise ValueError("truncated fmt chunk")
    audio_format = int.from_bytes(fmt[0:2], "little")
    n_channels = int.from_bytes(fmt[2:4], "little")
    sample_rate = int.from_bytes(fmt[4:8], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if audio_format != 1 or n_channels < 1:
        raise ValueError(f"not integer PCM (format {audio_format})")
    if sample_rate <= 0:
        raise ValueError(f"invalid sample rate {sample_rate}")
    if bits == 16:
        raw = np.frombuffer(data[: len(data) & ~1], dtype="<i2")
        samples = raw.astype(np.float32) / 32768.0
    elif bits == 8:
        raw = np.frombuffer(data, dtype=np.uint8)
        samples = (raw.astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported bit depth {bits}")
    n_frames = len(samples) // n_channels
    return samples[: n_frames * n_channels].reshape(
        n_frames, n_channels), sample_rate


def decode_bmp(payload: bytes) -> np.ndarray:
    """Pure-numpy BMP decoder → (height, width, 3) uint8 RGB.

    Handles BITMAPINFOHEADER (and larger V4/V5 headers) with BI_RGB
    24/32-bit pixels, bottom-up (positive height) or top-down rows, and
    the 4-byte row padding.  Raises ValueError on palettized/compressed
    variants — the caller falls back to the stub."""
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_offset = int.from_bytes(payload[10:14], "little")
    header_size = int.from_bytes(payload[14:18], "little")
    if header_size < 40:
        raise ValueError(f"unsupported DIB header size {header_size}")
    width = int.from_bytes(payload[18:22], "little", signed=True)
    height = int.from_bytes(payload[22:26], "little", signed=True)
    bits = int.from_bytes(payload[28:30], "little")
    compression = int.from_bytes(payload[30:34], "little")
    if compression != 0 or bits not in (24, 32) or width <= 0 or height == 0:
        raise ValueError(
            f"unsupported BMP variant (bits={bits}, compression={compression})")
    top_down = height < 0
    height = abs(height)
    bypp = bits // 8
    stride = (width * bypp + 3) & ~3
    need = data_offset + stride * height
    if len(payload) < need:
        raise ValueError("truncated BMP pixel array")
    rows = np.frombuffer(payload, dtype=np.uint8,
                         count=stride * height, offset=data_offset)
    px = rows.reshape(height, stride)[:, : width * bypp]
    px = px.reshape(height, width, bypp)
    if not top_down:
        px = px[::-1]
    # BMP stores BGR(A); return RGB
    return px[:, :, [2, 1, 0]].copy()


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def decode_png(payload: bytes) -> np.ndarray:
    """Pure-numpy+zlib PNG decoder → (height, width, channels) uint8.

    Walks IHDR/PLTE/IDAT/IEND chunks, inflates the concatenated IDAT
    stream with stdlib zlib, and unfilters each scanline (the five PNG
    filter types: None, Sub, Up, Average, Paeth).  The full PNG
    still-image surface (round 6): color types 0 (gray), 2 (RGB), 4
    (gray+alpha), 6 (RGBA) at 8- and 16-bit sample depth (16-bit keeps
    the big-endian high byte — the standard 8-bit downscale, preserving
    the uint8 feature contract), type 3 (palettized, index depths
    1/2/4/8 → RGB via PLTE lookup), sequential AND Adam7-interlaced.
    Raises ValueError on truncated or malformed input — the caller
    falls back to the stub."""
    import zlib

    if len(payload) < 8 + 25 or payload[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG payload")
    pos = 8
    ihdr = None
    plte = None
    idat = bytearray()
    saw_iend = False
    while pos + 8 <= len(payload):
        size = int.from_bytes(payload[pos: pos + 4], "big")
        ctype = payload[pos + 4: pos + 8]
        if pos + 12 + size > len(payload):
            raise ValueError(
                f"truncated chunk {ctype!r}: declares {size} bytes, "
                f"{len(payload) - pos - 12} remain")
        body = payload[pos + 8: pos + 8 + size]
        pos += 12 + size  # 4 length + 4 type + data + 4 crc
        if ctype == b"IHDR":
            ihdr = body
        elif ctype == b"PLTE":
            plte = body
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            saw_iend = True
            break
    if not saw_iend:
        # a clipped trailing chunk header would otherwise pass silently
        raise ValueError("truncated chunk stream: no complete IEND")
    if ihdr is None or len(ihdr) < 13 or not idat:
        raise ValueError("missing IHDR/IDAT chunk")
    width = int.from_bytes(ihdr[0:4], "big")
    height = int.from_bytes(ihdr[4:8], "big")
    bit_depth, color_type, _comp, _filt, interlace = ihdr[8:13]
    paletted = color_type == 3
    if paletted:
        if bit_depth not in (1, 2, 4, 8):
            raise ValueError(f"unsupported palette depth {bit_depth}")
        if plte is None or len(plte) % 3:
            raise ValueError("palettized PNG without a valid PLTE chunk")
        channels = 1            # one index per pixel
        bpp = 1                 # filters act on BYTES (spec: bpp ≥ 1)
        stride = -(-width * bit_depth // 8)
    else:
        if bit_depth not in (8, 16):
            raise ValueError(f"unsupported bit depth {bit_depth}")
        channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(color_type)
        if channels is None:
            raise ValueError(f"unsupported color type {color_type}")
        bpp = channels * (bit_depth // 8)  # filter distance in BYTES
        stride = width * bpp
    if interlace not in (0, 1):
        raise ValueError(f"unknown interlace method {interlace}")
    if width <= 0 or height <= 0:
        raise ValueError(f"bad dimensions {width}x{height}")
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as exc:
        raise ValueError(f"corrupt IDAT stream: {exc}") from exc

    def samples_of(byts: np.ndarray, h: int, w: int, srow: int):
        """Unfiltered byte rows → per-pixel sample array (h, w[, ch]);
        16-bit samples (big-endian) keep their HIGH byte — the standard
        8-bit downscale, keeping the uint8 feature contract."""
        if not paletted:
            if bit_depth == 16:
                return byts.reshape(h, w, channels, 2)[:, :, :, 0].copy()
            return byts.reshape(h, w, channels)
        if bit_depth == 8:
            return byts[:, :w]
        per = 8 // bit_depth
        bits = np.unpackbits(byts, axis=1).reshape(h, srow * per, bit_depth)
        weights = 1 << np.arange(bit_depth - 1, -1, -1)
        return (bits * weights[None, None, :]).sum(axis=2)[:, :w] \
            .astype(np.uint8)

    if interlace == 0:
        if len(raw) != height * (1 + stride):
            raise ValueError("decompressed size does not match dimensions")
        rows = np.frombuffer(raw, dtype=np.uint8).reshape(
            height, 1 + stride)
        out = _png_unfilter(rows[:, 0], rows[:, 1:], stride, bpp)
        px = samples_of(out, height, width, stride)
    else:
        # Adam7: 7 sub-images, each independently filtered, scattered on
        # an (x_start, y_start, x_step, y_step) grid
        passes = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
                  (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]
        if paletted:
            px = np.zeros((height, width), dtype=np.uint8)
        else:
            px = np.zeros((height, width, channels), dtype=np.uint8)
        off = 0
        for x0, y0, xs, ys in passes:
            pw = -(-(width - x0) // xs) if width > x0 else 0
            ph = -(-(height - y0) // ys) if height > y0 else 0
            if pw <= 0 or ph <= 0:
                continue
            prow = -(-pw * bit_depth // 8) if paletted else pw * bpp
            need = ph * (1 + prow)
            if off + need > len(raw):
                raise ValueError("truncated interlaced data")
            rows = np.frombuffer(raw[off: off + need],
                                 dtype=np.uint8).reshape(ph, 1 + prow)
            off += need
            sub = _png_unfilter(rows[:, 0], rows[:, 1:], prow, bpp)
            sp = samples_of(sub, ph, pw, prow)
            px[y0::ys, x0::xs] = sp
        if off != len(raw):
            raise ValueError("interlaced data size mismatch")
    if not paletted:
        return px
    pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
    if int(px.max(initial=0)) >= len(pal):
        raise ValueError("palette index out of range")
    return pal[px]


def _png_unfilter(filters: np.ndarray, data: np.ndarray, stride: int,
                  bpp: int) -> np.ndarray:
    """Reconstruct scanlines from the five PNG filter types (shared by
    the sequential path and each Adam7 pass)."""
    height = len(filters)
    out = np.zeros((height, stride), dtype=np.uint8)
    n_units = stride // bpp
    zero_px = np.zeros(bpp, dtype=np.int64)
    for y in range(height):
        f = filters[y]
        line = data[y].astype(np.int64)
        prev = out[y - 1].astype(np.int64) if y else np.zeros(
            stride, dtype=np.int64)
        if f == 0:                       # None
            cur = line
        elif f == 2:                     # Up
            cur = (line + prev) & 0xFF
        elif f == 1:                     # Sub = prefix sum along filter
            # units, vectorized per byte-within-unit (mod-256 cumsum)
            cur = (np.cumsum(line.reshape(n_units, bpp), axis=0)
                   & 0xFF).reshape(stride)
        elif f in (3, 4):                # Average / Paeth: left-dependent,
            # loop over UNITS with the per-byte math vectorized
            cur2 = line.reshape(n_units, bpp).copy()
            prev2 = prev.reshape(n_units, bpp)
            for x in range(n_units):
                a = cur2[x - 1] if x else zero_px       # left
                b = prev2[x]                            # up
                if f == 3:
                    cur2[x] = (cur2[x] + (a + b) // 2) & 0xFF
                else:
                    c = prev2[x - 1] if x else zero_px  # up-left
                    p = a + b - c
                    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
                    pred = np.where((pa <= pb) & (pa <= pc), a,
                                    np.where(pb <= pc, b, c))
                    cur2[x] = (cur2[x] + pred) & 0xFF
            cur = cur2.reshape(stride)
        else:
            raise ValueError(f"unknown filter type {f} in row {y}")
        out[y] = cur.astype(np.uint8)
    return out


def encode_png(img: np.ndarray, filter_type: int = 0) -> bytes:
    """Minimal non-interlaced 8-bit PNG encoder (tests +
    synthesize_media).  `img`: (H, W) or (H, W, C) uint8 with C in
    {1, 2, 3, 4}.  `filter_type` 0 (None) or 2 (Up) — enough to exercise
    the decoder's filter reconstruction in round-trip tests (Sub/Average/
    Paeth rows are hand-built in the tests)."""
    import zlib

    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    flat = img.reshape(h, w * c).astype(np.uint8)
    rows = []
    for y in range(h):
        if filter_type == 2 and y:
            rows.append(b"\x02" + ((flat[y].astype(np.int64)
                                    - flat[y - 1]) & 0xFF)
                        .astype(np.uint8).tobytes())
        else:
            rows.append(b"\x00" + flat[y].tobytes())
    idat = zlib.compress(b"".join(rows))

    def chunk(ctype: bytes, body: bytes) -> bytes:
        crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
        return (len(body).to_bytes(4, "big") + ctype + body
                + crc.to_bytes(4, "big"))

    ihdr = (w.to_bytes(4, "big") + h.to_bytes(4, "big")
            + bytes([8, color_type, 0, 0, 0]))
    return (_PNG_MAGIC + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat)
            + chunk(b"IEND", b""))


def audio_features(samples: np.ndarray, sample_rate: int) -> np.ndarray:
    """Real audio features from decoded PCM: [duration_sec, rms,
    zero-crossing rate, spectral centroid (Hz)] — float32."""
    mono = samples.mean(axis=1) if samples.ndim == 2 else samples
    n = len(mono)
    if n == 0:
        return np.zeros(4, dtype=np.float32)
    rms = float(np.sqrt(np.mean(mono ** 2)))
    zcr = float(np.mean(np.abs(np.diff(np.signbit(mono).astype(np.int8)))))
    spec = np.abs(np.fft.rfft(mono))
    freqs = np.fft.rfftfreq(n, d=1.0 / sample_rate)
    centroid = float((spec * freqs).sum() / (spec.sum() + 1e-12))
    return np.array([n / sample_rate, rms, zcr, centroid], dtype=np.float32)


def image_features(rgb: np.ndarray) -> np.ndarray:
    """Real image features from a decoded (H, W, C) uint8 array:
    [h, w, aspect, mean/std per RGB channel, 8-bin luminance histogram
    (density)] — 17 float32 values."""
    h, w = rgb.shape[:2]
    chans = rgb.reshape(-1, rgb.shape[2]).astype(np.float64)[:, :3]
    lum = chans @ np.array([0.299, 0.587, 0.114])
    hist, _ = np.histogram(lum, bins=8, range=(0, 256))
    hist = hist / max(1, lum.size)
    return np.concatenate([
        [h, w, w / h],
        chans.mean(axis=0), chans.std(axis=0),
        hist,
    ]).astype(np.float32)


def decode_media(payload: bytes, out_dim: int = 16) -> tuple[str, np.ndarray]:
    """Dispatch: real wav/bmp decode+features when the container matches,
    deterministic stub otherwise.  Returns (path, feature)."""
    if len(payload) >= 12 and payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        try:
            samples, rate = decode_wav(payload)
            return "wav", audio_features(samples, rate)
        except ValueError:
            pass  # RIFF magic but float/24-bit/truncated PCM → stub
    if len(payload) >= 12 and payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
        try:
            from ifeatureomega_cli_spark.operators.video import video_features

            return "avi", video_features(payload)
        except ValueError:
            pass  # AVI magic but H.264-class codec / truncated → stub
    if len(payload) >= 2 and payload[:2] == b"BM":
        try:
            return "bmp", image_features(decode_bmp(payload))
        except ValueError:
            pass  # BM magic but compressed/palettized → stub
    if len(payload) >= 8 and payload[:8] == _PNG_MAGIC:
        try:
            img = decode_png(payload)
            if img.shape[2] < 3:  # gray / gray+alpha → replicated RGB
                img = np.repeat(img[:, :, :1], 3, axis=2)
            return "png", image_features(img)
        except ValueError:
            pass  # PNG magic but truncated/exotic (all color types are real)
    if len(payload) >= 6 and payload[:4] == b"GIF8":
        try:
            from ifeatureomega_cli_spark.operators.gif import decode_gif

            return "gif", image_features(decode_gif(payload))
        except ValueError:
            pass  # GIF magic but truncated/malformed → stub
    if len(payload) >= 3 and payload[:3] == b"\xff\xd8\xff":
        try:
            from ifeatureomega_cli_spark.operators.jpeg import decode_jpeg

            img = decode_jpeg(payload)
            if img.dtype == np.uint16:   # >8-bit stream → 8-bit features
                shift = max(0, int(img.max()).bit_length() - 8)
                img = (img >> shift).astype(np.uint8)
            if img.shape[2] < 3:
                img = np.repeat(img[:, :, :1], 3, axis=2)
            return "jpeg", image_features(img)
        except ValueError:
            pass  # JPEG magic but unsupported-variant/corrupt → stub
    return "stub", decode_image_stub(payload, out_dim)


def extract_media_features(
    df: DataFrame, out_dim: int = 16, batch_rows: int = 256
) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Media rows are large — bound Arrow batches via
    spark.sql.execution.arrow.maxRecordsPerBatch (set smaller than for token
    tables) and repartition by size tier before calling at scale."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, digests, nbytes, paths = [], [], [], []
            for payload in pdf["payload"]:
                b = bytes(payload) if payload is not None else b""
                nbytes.append(len(b))
                digests.append(hashlib.sha256(b).hexdigest() if b else "")
                if not b:
                    paths.append("empty")
                    feats.append(None)
                    continue
                path, feat = decode_media(b, out_dim)
                paths.append(path)
                feats.append(feat.tolist())
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": nbytes,
                "digest": digests,
                "decode_path": paths,
                "feature": feats,
            })

    return df.mapInPandas(gen, schema=FEATURE_SCHEMA)


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Minimal RIFF/WAVE 16-bit PCM encoder (tests + synthesize_media).
    `samples`: float in [-1, 1], shape (n_frames,) or (n_frames, ch)."""
    if samples.ndim == 1:
        samples = samples[:, None]
    ch = samples.shape[1]
    pcm = np.clip(samples * 32767.0, -32768, 32767).astype("<i2").tobytes()
    fmt = (
        (1).to_bytes(2, "little") + ch.to_bytes(2, "little")
        + sample_rate.to_bytes(4, "little")
        + (sample_rate * ch * 2).to_bytes(4, "little")
        + (ch * 2).to_bytes(2, "little") + (16).to_bytes(2, "little"))
    chunks = (b"fmt " + len(fmt).to_bytes(4, "little") + fmt
              + b"data" + len(pcm).to_bytes(4, "little") + pcm)
    return (b"RIFF" + (4 + len(chunks)).to_bytes(4, "little") + b"WAVE"
            + chunks)


def encode_bmp(rgb: np.ndarray) -> bytes:
    """Minimal bottom-up 24-bit BI_RGB BMP encoder (tests +
    synthesize_media).  `rgb`: (H, W, 3) uint8."""
    h, w = rgb.shape[:2]
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = rgb[::-1, :, [2, 1, 0]].reshape(h, w * 3)
    px = rows.tobytes()
    dib = ((40).to_bytes(4, "little")
           + w.to_bytes(4, "little", signed=True)
           + h.to_bytes(4, "little", signed=True)
           + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
           + (0).to_bytes(4, "little") + len(px).to_bytes(4, "little")
           + (2835).to_bytes(4, "little") * 2
           + (0).to_bytes(4, "little") * 2)
    offset = 14 + len(dib)
    head = (b"BM" + (offset + len(px)).to_bytes(4, "little")
            + (0).to_bytes(4, "little") + offset.to_bytes(4, "little"))
    return head + dib + px


def synthesize_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic media table for tests: REAL payloads where the pure-
    numpy decoders apply (image → BMP/PNG/JPEG, audio → 16-bit PCM WAV,
    video → MJPEG/raw-DIB AVI) and seeded opaque bytes for every third
    video row (exercises the stub fallback, the H.264 boundary)."""
    rng = np.random.RandomState(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        if kind == "image":
            w, h = 16 * (1 + i % 4) + (i % 3), 8 * (1 + i % 3)
            px = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
            # rotate all real image decoders; the round-8 JPEG variants
            # (lossless, hierarchical, CMYK) share the "jpeg" path
            which = (i // 3) % 7
            if which == 0:
                payload = encode_bmp(px)
                meta = (w, h, 1, 0, "bmp")
            elif which == 1:
                payload = encode_png(px, filter_type=2)
                meta = (w, h, 1, 0, "png")
            elif which == 3:
                from ifeatureomega_cli_spark.operators.gif import encode_gif

                pal = rng.randint(0, 256, size=(16, 3), dtype=np.uint8)
                px = pal[rng.randint(0, 16, size=(h, w))]
                payload = encode_gif(px, interlace=bool(i % 2))
                meta = (w, h, 1, 0, "gif")
            elif which == 4:
                from ifeatureomega_cli_spark.operators.jpeg import (
                    encode_jpeg_lossless)

                payload = encode_jpeg_lossless(
                    px.astype(np.uint16), predictor=1 + i % 7, bits=8)
                meta = (w, h, 1, 0, "jpeg-lossless")
            elif which == 5:
                from ifeatureomega_cli_spark.operators.jpeg import (
                    encode_jpeg_hierarchical)

                payload = encode_jpeg_hierarchical(
                    px.astype(np.uint16), levels=2, lossless=True,
                    bits=8)
                meta = (w, h, 1, 0, "jpeg-hier")
            elif which == 6:
                from ifeatureomega_cli_spark.operators.jpeg import (
                    encode_jpeg_adobe)

                cmyk = np.concatenate(
                    [px, rng.randint(128, 256, size=(h, w, 1),
                                     dtype=np.uint8)], axis=2)
                payload = encode_jpeg_adobe(cmyk, ycck=bool(i % 2))
                meta = (w, h, 1, 0, "jpeg-cmyk")
            else:
                from ifeatureomega_cli_spark.operators.jpeg import (
                    encode_jpeg)

                payload = encode_jpeg(px, subsample=bool(i % 2))
                meta = (w, h, 1, 0, "jpeg")
        elif kind == "audio":
            rate = 8000
            t = np.arange(rate // 4) / rate
            tone = 0.5 * np.sin(2 * np.pi * (200 + 50 * (i % 7)) * t)
            payload = encode_wav(tone, rate)
            meta = (0, 0, 1, rate, "pcm16")
        else:
            which = (i // 3) % 3  # rotate mjpeg / rawrgb / opaque-fake
            if which < 2:
                from ifeatureomega_cli_spark.operators.video import (
                    encode_avi)

                w, h, nf = 16 * (1 + i % 3), 16, 2 + i % 4
                base = rng.randint(0, 200, size=(h, w, 3), dtype=np.uint8)
                frames = [np.clip(base.astype(np.int16) + 10 * j, 0, 255)
                          .astype(np.uint8) for j in range(nf)]
                codec = "mjpeg" if which == 0 else "rawrgb"
                payload = encode_avi(frames, fps=5 + i % 10, codec=codec)
                meta = (w, h, nf, 0, codec)
            else:
                payload = rng.bytes(rng.randint(64, 4096))
                meta = (64 * (1 + i % 4), 64 * (1 + i % 3), 1 + i % 30,
                        16000, "fake")
        rows.append((i, kind, bytearray(payload), meta))
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
