"""Round-5 pure-numpy media decoders: exact round-trips and real feature
values — the previously-stubbed decode step made real for the container
formats numpy can parse (PCM WAV, BI_RGB BMP)."""

from __future__ import annotations

import numpy as np
import pytest

from ifeatureomega_cli_spark.operators.multimodal import (
    audio_features, decode_bmp, decode_media, decode_wav, encode_bmp,
    encode_wav, image_features)


def test_wav_roundtrip_exact():
    rng = np.random.RandomState(0)
    samples = (rng.randint(-32768, 32768, size=(1000, 2))
               .astype(np.float64) / 32768.0)
    payload = encode_wav(samples, 16000)
    got, rate = decode_wav(payload)
    assert rate == 16000 and got.shape == (1000, 2)
    # int16 quantization is the only loss; encode clamps then rounds
    assert np.abs(got - samples).max() <= 1.5 / 32768.0


def test_wav_chunk_walking_and_8bit():
    # extra LIST chunk before data must be skipped; 8-bit PCM path
    t = np.arange(100) / 8000.0
    mono = 0.25 * np.sin(2 * np.pi * 440 * t)
    base = encode_wav(mono, 8000)
    fmt_start = base.index(b"fmt ")
    lst = b"LIST" + (4).to_bytes(4, "little") + b"INFO"
    patched = base[:fmt_start] + lst + base[fmt_start:]
    patched = (patched[:4]
               + (len(patched) - 8).to_bytes(4, "little") + patched[8:])
    got, rate = decode_wav(patched)
    assert rate == 8000 and got.shape == (100, 1)

    pcm8 = (np.clip(mono * 128 + 128, 0, 255).astype(np.uint8)).tobytes()
    fmt8 = ((1).to_bytes(2, "little") + (1).to_bytes(2, "little")
            + (8000).to_bytes(4, "little") + (8000).to_bytes(4, "little")
            + (1).to_bytes(2, "little") + (8).to_bytes(2, "little"))
    w8 = (b"RIFF" + (4 + 8 + len(fmt8) + 8 + len(pcm8)).to_bytes(4, "little")
          + b"WAVE" + b"fmt " + len(fmt8).to_bytes(4, "little") + fmt8
          + b"data" + len(pcm8).to_bytes(4, "little") + pcm8)
    got8, rate8 = decode_wav(w8)
    assert rate8 == 8000 and got8.shape == (100, 1)
    assert np.abs(got8[:, 0] - mono).max() <= 1.0 / 128.0


def test_wav_rejects_non_pcm():
    bad = bytearray(encode_wav(np.zeros(10), 8000))
    i = bytes(bad).index(b"fmt ") + 8
    bad[i:i + 2] = (3).to_bytes(2, "little")  # IEEE float format tag
    with pytest.raises(ValueError, match="not integer PCM"):
        decode_wav(bytes(bad))


def test_bmp_roundtrip_exact_with_padding():
    rng = np.random.RandomState(1)
    # width 17 → stride padding exercised
    rgb = rng.randint(0, 256, size=(5, 17, 3), dtype=np.uint8)
    got = decode_bmp(encode_bmp(rgb))
    assert got.shape == (5, 17, 3)
    assert (got == rgb).all()


def test_bmp_topdown_and_32bit():
    rgb = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    payload = bytearray(encode_bmp(rgb))
    # flip to top-down: negate height, reverse padded rows in place
    h = 2
    payload[22:26] = (-h).to_bytes(4, "little", signed=True)
    offset = int.from_bytes(payload[10:14], "little")
    stride = ((3 * 3 + 3) & ~3)
    rows = [bytes(payload[offset + i * stride: offset + (i + 1) * stride])
            for i in range(h)]
    payload[offset:offset + stride * h] = b"".join(reversed(rows))
    got = decode_bmp(bytes(payload))
    assert (got == rgb).all()


def test_bmp_rejects_compressed():
    payload = bytearray(encode_bmp(np.zeros((2, 2, 3), dtype=np.uint8)))
    payload[30:34] = (1).to_bytes(4, "little")  # BI_RLE8
    with pytest.raises(ValueError, match="unsupported BMP"):
        decode_bmp(bytes(payload))


def test_audio_features_centroid_tracks_tone():
    rate = 8000
    t = np.arange(rate) / rate
    for hz in (200, 1200):
        feats = audio_features(0.5 * np.sin(2 * np.pi * hz * t)[:, None],
                               rate)
        assert feats.shape == (4,)
        assert abs(feats[0] - 1.0) < 1e-6          # duration
        assert abs(feats[1] - 0.5 / np.sqrt(2)) < 0.01  # sine RMS
        assert abs(feats[3] - hz) < hz * 0.05      # spectral centroid


def test_image_features_values():
    img = np.zeros((4, 8, 3), dtype=np.uint8)
    img[:, :, 0] = 255  # pure red
    f = image_features(img)
    assert f.shape == (17,)
    assert f[0] == 4 and f[1] == 8 and abs(f[2] - 2.0) < 1e-6
    assert abs(f[3] - 255) < 1e-4 and f[4] == 0 and f[5] == 0  # means
    hist = f[9:]
    # red luminance 0.299*255 ≈ 76 → bin 2 of 8 (range 0..256)
    assert hist[2] == 1.0 and hist.sum() == 1.0


def test_decode_media_dispatch():
    wavp = encode_wav(np.zeros(64), 8000)
    bmpp = encode_bmp(np.zeros((2, 2, 3), dtype=np.uint8))
    assert decode_media(wavp)[0] == "wav"
    assert decode_media(bmpp)[0] == "bmp"
    assert decode_media(b"\x89PNG....")[0] == "stub"
    # BM magic but compressed → honest stub fallback, not an error
    comp = bytearray(bmpp)
    comp[30:34] = (1).to_bytes(4, "little")
    assert decode_media(bytes(comp))[0] == "stub"


def test_decode_media_malformed_wav_falls_back_to_stub():
    """RIFF magic with non-decodable audio must reach the stub, never crash
    the task: IEEE-float format tag, zero sample rate, truncated data."""
    base = bytearray(encode_wav(np.zeros(64), 8000))
    i = bytes(base).index(b"fmt ") + 8

    float_tag = bytearray(base)
    float_tag[i:i + 2] = (3).to_bytes(2, "little")
    assert decode_media(bytes(float_tag))[0] == "stub"

    zero_rate = bytearray(base)
    zero_rate[i + 4:i + 8] = (0).to_bytes(4, "little")
    assert decode_media(bytes(zero_rate))[0] == "stub"

    odd = bytes(base)[:-1]  # truncated: odd-length 16-bit data chunk
    path, feat = decode_media(odd)
    assert path in ("wav", "stub") and feat is not None


def test_wav_bmp_roundtrip_property():
    """Property: encode→decode is exact for every valid shape/rate (
    hypothesis drives sizes, channel counts, rates, and pixel widths that
    hit every stride-padding residue)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=40, deadline=None)
    @given(
        n=st.integers(1, 400),
        ch=st.integers(1, 4),
        rate=st.integers(1, 192000),
        seed=st.integers(0, 2**31 - 1),
    )
    def wav_prop(n, ch, rate, seed):
        rng = np.random.RandomState(seed)
        pcm = rng.randint(-32768, 32768, size=(n, ch)).astype(np.int16)
        samples = pcm.astype(np.float64) / 32768.0
        got, got_rate = decode_wav(encode_wav(samples, rate))
        assert got_rate == rate and got.shape == (n, ch)
        # the encoder clips then TRUNCATES (astype); int16 values are exact
        # in float32, so decode recovers the stored ints bit-for-bit
        expected = np.clip(samples * 32767.0, -32768, 32767).astype(np.int16)
        assert ((got * 32768.0).astype(np.int16) == expected).all()

    @settings(max_examples=40, deadline=None)
    @given(
        h=st.integers(1, 20),
        w=st.integers(1, 21),
        seed=st.integers(0, 2**31 - 1),
    )
    def bmp_prop(h, w, seed):
        rng = np.random.RandomState(seed)
        rgb = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
        assert (decode_bmp(encode_bmp(rgb)) == rgb).all()

    wav_prop()
    bmp_prop()


def test_wav_truncated_data_chunk_raises_and_stubs():
    t = np.arange(200) / 8000.0
    wav = encode_wav(0.5 * np.sin(2 * np.pi * 300 * t), 8000)
    truncated = wav[:-37]  # data chunk now declares more bytes than remain
    with pytest.raises(ValueError, match="truncated chunk"):
        decode_wav(truncated)
    # the dispatcher must route the malformed payload to the stub, not
    # silently decode fewer samples as a plausible real-path feature
    path, feat = decode_media(truncated)
    assert path == "stub" and len(feat) == 16
