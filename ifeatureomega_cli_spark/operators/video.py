"""MJPEG / raw-DIB video-in-AVI decode + frame sampling — pure numpy/stdlib.

Round-7 extension of the multimodal surface (SURVEY.md "multimodal
columns"): video payloads stop being a blanket stub.  The RIFF/AVI
container grammar (Microsoft "AVI RIFF File Reference", a public spec)
is parsed here from scratch; MJPEG frame payloads are ordinary JFIF
streams decoded by the repo's own `operators/jpeg.py` (baseline +
progressive), and `DIB ` / BI_RGB frames are raw bottom-up BGR rows —
the same pixel layout `decode_bmp` handles, re-derived here without the
BMP file header.  What genuinely needs an inter-frame entropy codec
(H.264/H.265/VP9/AV1) raises ValueError and the caller's deterministic
stub stands in — the same honest boundary the image/audio decoders use
(`multimodal.py:410`).

Scale design: a video row is ONE binary cell; `parse_avi` walks the
container index without touching frame bytes, and `sample_frames`
decodes only k uniformly-spaced frames — so feature extraction over a
100 TB corpus is scan → mapInPandas → sink with per-row work bounded by
k JPEG decodes, never the full frame count.  Embarrassingly parallel,
no shuffle; partition by payload-size tier like the image path.

Reference parity note: the reference repo (iFeatureOmegaCLI) has no
video surface at all — this module exists for the training-data-pipeline
mandate, not for descriptor parity.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ifeatureomega_cli_spark.operators.jpeg import decode_jpeg, encode_jpeg

__all__ = [
    "VideoInfo", "parse_avi", "decode_frame", "sample_frame_indices",
    "sample_frames", "video_features", "encode_avi", "VIDEO_FEATURE_DIM",
]

# [n_frames, fps, duration_s] + mean image_features(17) + motion
VIDEO_FEATURE_DIM = 21

_MJPEG_FOURCC = {b"MJPG", b"mjpg", b"dmb1", b"jpeg", b"JPEG"}
_RAW_FOURCC = {b"\x00\x00\x00\x00", b"DIB ", b"RGB ", b"raw "}


def _u32(b: bytes, off: int) -> int:
    return int.from_bytes(b[off: off + 4], "little")


def _u16(b: bytes, off: int) -> int:
    return int.from_bytes(b[off: off + 2], "little")


@dataclass
class VideoInfo:
    """Container metadata + frame directory (offsets into the payload)."""
    width: int
    height: int
    fps: float
    codec: str                       # "mjpeg" | "rawrgb"
    bit_count: int = 24
    top_down: bool = False           # raw frames: negative biHeight
    frames: list = field(default_factory=list)   # [(offset, size), ...]

    @property
    def n_frames(self) -> int:
        return len(self.frames)

    @property
    def duration_s(self) -> float:
        return self.n_frames / self.fps if self.fps > 0 else 0.0


def _iter_chunks(d: bytes, pos: int, end: int):
    """Yield (fourcc, body_start, body_size) over a RIFF chunk run,
    honoring the word-alignment pad after odd-sized bodies."""
    while pos + 8 <= end:
        cid = d[pos: pos + 4]
        size = _u32(d, pos + 4)
        body = pos + 8
        if body + size > end:
            raise ValueError("truncated RIFF chunk")
        yield cid, body, size
        pos = body + size + (size & 1)


def parse_avi(payload: bytes) -> VideoInfo:
    """Walk the RIFF/AVI tree: hdrl (avih + per-stream strl) then movi.

    Index-only — no frame bytes are decoded.  Frames of the FIRST
    'vids' stream are collected, including ones grouped inside
    'rec ' LISTs; 'idx1'/'JUNK'/unknown chunks are skipped.  Raises
    ValueError for non-AVI payloads, truncation, or codecs outside
    MJPEG / BI_RGB (→ the caller's stub fallback)."""
    d = payload
    if len(d) < 12 or d[:4] != b"RIFF" or d[8:12] != b"AVI ":
        raise ValueError("not an AVI payload")
    riff_end = min(len(d), 8 + _u32(d, 4))

    avih = None
    streams = []            # (fccType, handler, scale, rate, compression, bitcnt, height_sign)
    movi: list[tuple[int, int]] = []
    vids_idx = None

    def walk_movi(pos: int, end: int, prefix: bytes):
        for cid, body, size in _iter_chunks(d, pos, end):
            if cid == b"LIST" and d[body: body + 4] == b"rec ":
                walk_movi(body + 4, body + size, prefix)
            elif cid[:2] == prefix and cid[2:4] in (b"dc", b"db"):
                movi.append((body, size))

    def walk_hdrl(pos: int, end: int):
        nonlocal avih
        for cid, body, size in _iter_chunks(d, pos, end):
            if cid == b"avih":
                avih = d[body: body + size]
            elif cid == b"LIST" and d[body: body + 4] == b"strl":
                strh = strf = None
                for c2, b2, s2 in _iter_chunks(d, body + 4, body + size):
                    if c2 == b"strh":
                        strh = d[b2: b2 + s2]
                    elif c2 == b"strf":
                        strf = d[b2: b2 + s2]
                if strh is not None and len(strh) >= 40:
                    comp = strf[16:20] if strf and len(strf) >= 20 else b""
                    bitcnt = _u16(strf, 14) if strf and len(strf) >= 16 else 0
                    hneg = (strf is not None and len(strf) >= 12
                            and _u32(strf, 8) >= 0x80000000)
                    streams.append((strh[0:4], strh[4:8],
                                    _u32(strh, 20), _u32(strh, 24),
                                    comp, bitcnt, hneg))

    # top level: LIST hdrl, LIST movi, idx1, JUNK ...
    for cid, body, size in _iter_chunks(d, 12, riff_end):
        if cid != b"LIST":
            continue
        ltype = d[body: body + 4]
        if ltype == b"hdrl":
            walk_hdrl(body + 4, body + size)
        elif ltype == b"movi":
            if vids_idx is None:
                vids_idx = next((i for i, s in enumerate(streams)
                                 if s[0] == b"vids"), None)
                if vids_idx is None:
                    raise ValueError("no video stream in AVI")
            walk_movi(body + 4, body + size, b"%02d" % vids_idx)

    if avih is None or len(avih) < 40:
        raise ValueError("missing avih header")
    if vids_idx is None:
        raise ValueError("no movi list in AVI")
    fcc, handler, scale, rate, comp, bitcnt, hneg = streams[vids_idx]
    width, height = _u32(avih, 32), _u32(avih, 36)
    if width == 0 or height == 0:
        raise ValueError("zero-dimension video")
    if comp == b"" and handler in _MJPEG_FOURCC:
        comp = b"MJPG"   # no strf: trust the stream handler fourcc
    if comp in _MJPEG_FOURCC:
        codec = "mjpeg"
    elif comp in _RAW_FOURCC:
        codec = "rawrgb"
        if bitcnt != 24:
            raise ValueError(f"unsupported raw bit depth {bitcnt}")
    else:
        name = comp.decode("latin1", "replace").strip("\x00 ") or "?"
        raise ValueError(f"unsupported video codec {name!r}")
    fps = rate / scale if scale else (
        1e6 / _u32(avih, 0) if _u32(avih, 0) else 0.0)
    return VideoInfo(width=width, height=height, fps=fps, codec=codec,
                     bit_count=bitcnt or 24, top_down=hneg, frames=movi)


def decode_frame(payload: bytes, info: VideoInfo, i: int) -> np.ndarray:
    """Decode frame i → (H, W, 3) uint8 RGB.

    MJPEG: the chunk body is a standalone JFIF stream → `decode_jpeg`
    (grayscale replicated to RGB).  Raw BI_RGB: bottom-up (or top-down
    when biHeight<0) BGR rows, each padded to a 4-byte boundary —
    BMP's pixel-array layout without the file header."""
    off, size = info.frames[i]
    raw = payload[off: off + size]
    if info.codec == "mjpeg":
        img = decode_jpeg(raw)
        if img.shape[2] < 3:
            img = np.repeat(img[:, :, :1], 3, axis=2)
        return img
    h, w = info.height, info.width
    stride = (w * 3 + 3) & ~3
    if len(raw) < stride * h:
        raise ValueError("truncated raw frame")
    rows = np.frombuffer(raw[: stride * h], dtype=np.uint8)
    rows = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if not info.top_down:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()   # BGR → RGB


def sample_frame_indices(n_frames: int, k: int) -> np.ndarray:
    """k uniformly-spaced frame indices (first and last always included
    when k ≥ 2); fewer when the video is shorter than k frames."""
    if n_frames <= 0:
        return np.zeros(0, dtype=np.int64)
    k = max(1, min(k, n_frames))
    return np.unique(np.rint(np.linspace(0, n_frames - 1, k)).astype(np.int64))


def sample_frames(payload: bytes, k: int,
                  info: VideoInfo | None = None):
    """Decode only k uniformly-spaced frames.  Returns (indices, frames).
    This is the scale path: per-row cost is O(k) decodes regardless of
    video length."""
    info = info if info is not None else parse_avi(payload)
    idx = sample_frame_indices(info.n_frames, k)
    return idx, [decode_frame(payload, info, int(i)) for i in idx]


def video_features(payload: bytes, n_sample: int = 4) -> np.ndarray:
    """Fixed-length video feature vector (VIDEO_FEATURE_DIM float32):

    [n_frames, fps, duration_s] +
    mean over sampled frames of `image_features` (17 values: h, w,
    aspect, RGB mean/std, 8-bin luminance histogram) +
    [motion] — mean |Δpixel| between consecutive SAMPLED frames (0 for
    single-frame or static content)."""
    from ifeatureomega_cli_spark.operators.multimodal import image_features

    info = parse_avi(payload)
    idx, frames = sample_frames(payload, n_sample, info)
    if not frames:
        raise ValueError("no frames in video stream")
    per = np.stack([image_features(f) for f in frames])
    if len(frames) > 1:
        motion = float(np.mean([
            np.abs(frames[j + 1].astype(np.int16)
                   - frames[j].astype(np.int16)).mean()
            for j in range(len(frames) - 1)]))
    else:
        motion = 0.0
    return np.concatenate([
        np.array([info.n_frames, info.fps, info.duration_s]),
        per.mean(axis=0),
        [motion],
    ]).astype(np.float32)


def encode_avi(frames, fps: float = 10.0, codec: str = "mjpeg",
               subsample: bool = False, with_index: bool = True) -> bytes:
    """Minimal-but-conformant AVI writer (tests + synthesize_media):
    RIFF(AVI) → LIST hdrl [avih, LIST strl [strh, strf]] → LIST movi
    [00dc/00db ...] → idx1.  codec='mjpeg' wraps each frame with the
    repo's own `encode_jpeg`; codec='rawrgb' stores bottom-up padded
    BGR (BI_RGB).  Exists so the decoder is hermetically testable and
    the synthetic media table carries REAL video payloads."""
    frames = [np.asarray(f, dtype=np.uint8) for f in frames]
    if not frames:
        raise ValueError("no frames")
    h, w = frames[0].shape[:2]
    scale, rate = 1000, int(round(fps * 1000))

    if codec == "mjpeg":
        blobs = [encode_jpeg(f, subsample=subsample) for f in frames]
        comp, cid, handler = b"MJPG", b"00dc", b"MJPG"
        size_img = 0
    elif codec == "rawrgb":
        stride = (w * 3 + 3) & ~3
        blobs = []
        for f in frames:
            bgr = f[:, :, ::-1]
            padded = np.zeros((h, stride), dtype=np.uint8)
            padded[:, : w * 3] = bgr.reshape(h, w * 3)
            blobs.append(padded[::-1].tobytes())
        comp, cid, handler = b"\x00\x00\x00\x00", b"00db", b"DIB "
        size_img = stride * h
    else:
        raise ValueError(f"unknown codec {codec!r}")

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        return fourcc + len(body).to_bytes(4, "little") + body \
            + (b"\x00" if len(body) & 1 else b"")

    def lst(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", ltype + body)

    max_blob = max(len(b) for b in blobs)
    avih = b"".join(v.to_bytes(4, "little") for v in [
        int(1e6 * scale / rate),          # dwMicroSecPerFrame
        int(sum(map(len, blobs)) * fps / max(1, len(blobs))),
        0, 0x10 if with_index else 0,     # padding, flags (HASINDEX)
        len(blobs), 0, 1, max_blob,       # totalframes, initial, streams, bufsize
        w, h, 0, 0, 0, 0,
    ])
    strh = (b"vids" + handler + b"".join(v.to_bytes(4, "little") for v in [
        0, 0, 0, scale, rate, 0, len(blobs), max_blob, 0xFFFFFFFF, size_img,
    ]) + (0).to_bytes(4, "little")
        + w.to_bytes(2, "little") + h.to_bytes(2, "little"))
    strf = (40).to_bytes(4, "little") + w.to_bytes(4, "little") \
        + h.to_bytes(4, "little") + (1).to_bytes(2, "little") \
        + (24).to_bytes(2, "little") + comp \
        + size_img.to_bytes(4, "little") + b"\x00" * 16

    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi_body = b""
    idx_entries = []
    for b in blobs:
        # idx1 offsets are relative to the 'movi' fourcc position
        idx_entries.append((cid, 0x10, 4 + len(movi_body), len(b)))
        movi_body += chunk(cid, b)
    movi = lst(b"movi", movi_body)
    idx1 = chunk(b"idx1", b"".join(
        c + f.to_bytes(4, "little") + o.to_bytes(4, "little")
        + n.to_bytes(4, "little") for c, f, o, n in idx_entries))
    body = b"AVI " + hdrl + movi + (idx1 if with_index else b"")
    return b"RIFF" + len(body).to_bytes(4, "little") + body
