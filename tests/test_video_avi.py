"""Round-7 video surface: RIFF/AVI container parsing + MJPEG / raw-DIB
frame decode + uniform frame sampling (`operators/video.py`).

The writer and decoder are independent code paths over the published AVI
grammar, so round-trips are a real check; MJPEG frame equality is pinned
against a direct `decode_jpeg(encode_jpeg(frame))` round-trip (bit-exact
— the container must add zero loss on top of the codec), and raw-DIB
round-trips are exact.  The H.264 boundary stays an honest ValueError →
stub fallback, like every other decoder in `multimodal.py`."""

from __future__ import annotations

import numpy as np
import pytest

from ifeatureomega_cli_spark.operators.jpeg import decode_jpeg, encode_jpeg
from ifeatureomega_cli_spark.operators.multimodal import decode_media
from ifeatureomega_cli_spark.operators.video import (
    VIDEO_FEATURE_DIM, decode_frame, encode_avi, parse_avi,
    sample_frame_indices, sample_frames, video_features)


def _frames(n, h=16, w=24, seed=0):
    rng = np.random.RandomState(seed)
    base = rng.randint(0, 200, size=(h, w, 3), dtype=np.uint8)
    return [np.clip(base.astype(np.int16) + 13 * j, 0, 255).astype(np.uint8)
            for j in range(n)]


def test_parse_avi_metadata():
    frames = _frames(5)
    payload = encode_avi(frames, fps=12.5, codec="mjpeg")
    info = parse_avi(payload)
    assert (info.width, info.height) == (24, 16)
    assert info.n_frames == 5
    assert info.codec == "mjpeg"
    assert info.fps == pytest.approx(12.5)
    assert info.duration_s == pytest.approx(5 / 12.5)


def test_mjpeg_container_adds_zero_loss():
    frames = _frames(4)
    payload = encode_avi(frames, fps=10, codec="mjpeg")
    info = parse_avi(payload)
    for i, f in enumerate(frames):
        direct = decode_jpeg(encode_jpeg(f))
        got = decode_frame(payload, info, i)
        np.testing.assert_array_equal(got, direct)


def test_rawrgb_roundtrip_exact():
    # width 21 → stride 63 rounds to 64: exercises row padding
    frames = _frames(3, h=10, w=21, seed=3)
    payload = encode_avi(frames, fps=4, codec="rawrgb")
    info = parse_avi(payload)
    assert info.codec == "rawrgb"
    for i, f in enumerate(frames):
        np.testing.assert_array_equal(decode_frame(payload, info, i), f)


def test_odd_sized_mjpeg_chunks_are_padded():
    # force an odd-length JPEG blob by trying several seeds; the RIFF pad
    # byte after it must not desync the walker
    for seed in range(20):
        frames = _frames(3, seed=seed)
        payload = encode_avi(frames, fps=10, codec="mjpeg")
        info = parse_avi(payload)
        sizes = [s for _, s in info.frames]
        if any(s & 1 for s in sizes):
            for i in range(3):
                assert decode_frame(payload, info, i).shape == (16, 24, 3)
            return
    pytest.skip("no odd-sized JPEG blob in 20 seeds")


def test_rec_list_grouping():
    # rewrap the movi frames inside a 'rec ' LIST (interleaved-AVI style)
    frames = _frames(2)
    payload = bytearray(encode_avi(frames, fps=10, codec="mjpeg",
                                   with_index=False))
    movi_at = bytes(payload).index(b"movi")
    movi_size = int.from_bytes(payload[movi_at - 4: movi_at], "little")
    inner = bytes(payload[movi_at + 4: movi_at + 4 + movi_size - 4])
    rec = b"LIST" + (len(inner) + 4).to_bytes(4, "little") + b"rec " + inner
    rebuilt = bytes(payload[: movi_at - 8]) \
        + b"LIST" + (len(rec) + 4).to_bytes(4, "little") + b"movi" + rec \
        + bytes(payload[movi_at + 4 + movi_size - 4 + (movi_size & 1):])
    rebuilt = rebuilt[:4] + (len(rebuilt) - 8).to_bytes(4, "little") \
        + rebuilt[8:]
    info = parse_avi(rebuilt)
    assert info.n_frames == 2
    np.testing.assert_array_equal(
        decode_frame(rebuilt, info, 1),
        decode_jpeg(encode_jpeg(frames[1])))


def test_sample_frame_indices():
    np.testing.assert_array_equal(sample_frame_indices(10, 3), [0, 4, 9])
    np.testing.assert_array_equal(sample_frame_indices(2, 5), [0, 1])
    np.testing.assert_array_equal(sample_frame_indices(1, 4), [0])
    assert sample_frame_indices(0, 4).size == 0
    idx = sample_frame_indices(100, 4)
    assert idx[0] == 0 and idx[-1] == 99 and len(idx) == 4


def test_sample_frames_decodes_only_k():
    frames = _frames(9)
    payload = encode_avi(frames, fps=3, codec="rawrgb")
    idx, got = sample_frames(payload, 3)
    np.testing.assert_array_equal(idx, [0, 4, 8])
    for j, i in enumerate(idx):
        np.testing.assert_array_equal(got[j], frames[i])


def test_video_features_shape_and_values():
    frames = _frames(6, h=16, w=24)
    payload = encode_avi(frames, fps=6, codec="rawrgb")
    feat = video_features(payload, n_sample=4)
    assert feat.shape == (VIDEO_FEATURE_DIM,) and feat.dtype == np.float32
    assert feat[0] == 6                       # n_frames
    assert feat[1] == pytest.approx(6.0)      # fps
    assert feat[2] == pytest.approx(1.0)      # duration
    assert feat[3] == 16 and feat[4] == 24    # mean image h, w
    assert feat[-1] > 0                       # motion on a changing clip

    static = encode_avi([frames[0]] * 3, fps=3, codec="rawrgb")
    assert video_features(static, n_sample=3)[-1] == 0.0  # no motion


def test_unsupported_codec_raises_and_stub_fallback():
    frames = _frames(2)
    payload = bytearray(encode_avi(frames, fps=10, codec="mjpeg"))
    strf_at = bytes(payload).index(b"strf")
    payload[strf_at + 8 + 16: strf_at + 8 + 20] = b"H264"  # biCompression
    with pytest.raises(ValueError, match="H264"):
        parse_avi(bytes(payload))
    path, feat = decode_media(bytes(payload))
    assert path == "stub" and feat.shape == (16,)


def test_truncated_avi_raises():
    payload = encode_avi(_frames(3), fps=10, codec="mjpeg")
    with pytest.raises(ValueError):
        parse_avi(payload[: len(payload) // 2])
    path, _ = decode_media(payload[: len(payload) // 2])
    assert path == "stub"


def test_decode_media_dispatches_avi():
    payload = encode_avi(_frames(3), fps=10, codec="mjpeg")
    path, feat = decode_media(payload)
    assert path == "avi" and feat.shape == (VIDEO_FEATURE_DIM,)
    # WAV dispatch is untouched (both are RIFF containers)
    from ifeatureomega_cli_spark.operators.multimodal import encode_wav
    wav = encode_wav(np.zeros(100), 8000)
    assert decode_media(wav)[0] == "wav"


def test_spark_pipeline_decodes_real_video(spark):
    from ifeatureomega_cli_spark.operators.multimodal import (
        extract_media_features, synthesize_media)

    df = synthesize_media(spark, n=36)
    out = extract_media_features(df).toPandas()
    vids = out[out["kind"] == "video"]
    assert set(vids["decode_path"]) == {"avi", "stub"}
    real = vids[vids["decode_path"] == "avi"]
    assert len(real) == 8       # 12 video rows, 2 of 3 real
    for f in real["feature"]:
        assert len(f) == VIDEO_FEATURE_DIM and f[0] >= 2
