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


def test_png_roundtrip_all_color_types():
    from ifeatureomega_cli_spark.operators.multimodal import (
        decode_png, encode_png)

    rng = np.random.RandomState(11)
    for c in (1, 2, 3, 4):
        img = rng.randint(0, 256, size=(7, 5, c), dtype=np.uint8)
        for ftype in (0, 2):
            got = decode_png(encode_png(img, filter_type=ftype))
            assert got.shape == (7, 5, c)
            assert (got == img).all(), (c, ftype)


def test_png_hand_built_sub_average_paeth_rows():
    """The encoder only emits None/Up rows, so Sub/Average/Paeth are
    exercised with hand-FILTERED scanlines: filter a known image per the
    PNG spec, then assert the decoder reconstructs it exactly."""
    import zlib
    from ifeatureomega_cli_spark.operators.multimodal import (
        _PNG_MAGIC, decode_png)

    rng = np.random.RandomState(7)
    h, w, c = 6, 5, 3
    img = rng.randint(0, 256, size=(h, w, c), dtype=np.uint8)
    flat = img.reshape(h, w * c).astype(np.int64)
    stride, bpp = w * c, c
    rows = []
    for y, f in enumerate([0, 1, 2, 3, 4, 1]):
        line = flat[y]
        prev = flat[y - 1] if y else np.zeros(stride, dtype=np.int64)
        filt = np.zeros(stride, dtype=np.int64)
        for x in range(stride):
            a = line[x - bpp] if x >= bpp else 0
            b = prev[x]
            cc = prev[x - bpp] if x >= bpp else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) // 2
            else:
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else \
                    b if pb <= pc else cc
            filt[x] = (line[x] - pred) & 0xFF
        rows.append(bytes([f]) + filt.astype(np.uint8).tobytes())
    idat = zlib.compress(b"".join(rows))

    def chunk(t, body):
        return (len(body).to_bytes(4, "big") + t + body
                + (zlib.crc32(t + body) & 0xFFFFFFFF).to_bytes(4, "big"))

    ihdr = (w.to_bytes(4, "big") + h.to_bytes(4, "big")
            + bytes([8, 2, 0, 0, 0]))
    png = (_PNG_MAGIC + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat)
           + chunk(b"IEND", b""))
    got = decode_png(png)
    assert (got == img).all()


def test_png_rejects_unsupported_and_truncated():
    from ifeatureomega_cli_spark.operators.multimodal import (
        decode_png, encode_png)

    img = np.zeros((3, 3, 3), dtype=np.uint8)
    good = encode_png(img)
    with pytest.raises(ValueError, match="truncated chunk"):
        decode_png(good[:-9])   # clips IEND → incomplete chunk stream
    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"\x89PNJ" + good[4:])
    # palettized color type without a PLTE chunk (type 3 itself is
    # supported since round 6 — see test_png_palettized_all_depths)
    bad = bytearray(good)
    bad[8 + 8 + 9] = 3
    with pytest.raises(ValueError, match="PLTE"):
        decode_png(bytes(bad))
    # genuinely unknown color type
    bad = bytearray(good)
    bad[8 + 8 + 9] = 5
    with pytest.raises(ValueError, match="color type"):
        decode_png(bytes(bad))
    # unknown interlace method (Adam7 itself is supported since round
    # 6 — see test_png_adam7_interlaced)
    bad = bytearray(good)
    bad[8 + 8 + 12] = 2
    with pytest.raises(ValueError, match="interlace"):
        decode_png(bytes(bad))
    # interlace byte flipped to Adam7 without re-laying-out the data →
    # size mismatch, honest error (never a silent wrong image)
    bad = bytearray(good)
    bad[8 + 8 + 12] = 1
    with pytest.raises(ValueError):
        decode_png(bytes(bad))
    # corrupt deflate stream
    bad = bytearray(good)
    idat_at = bytes(bad).index(b"IDAT") + 4
    bad[idat_at: idat_at + 4] = b"\x00\x00\x00\x00"
    with pytest.raises(ValueError):
        decode_png(bytes(bad))


def test_png_roundtrip_property():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from ifeatureomega_cli_spark.operators.multimodal import (
        decode_png, encode_png)

    @settings(max_examples=40, deadline=None)
    @given(
        h=st.integers(1, 16),
        w=st.integers(1, 17),
        c=st.integers(1, 4),
        ftype=st.sampled_from([0, 2]),
        seed=st.integers(0, 2**31 - 1),
    )
    def png_prop(h, w, c, ftype, seed):
        rng = np.random.RandomState(seed)
        img = rng.randint(0, 256, size=(h, w, c), dtype=np.uint8)
        assert (decode_png(encode_png(img, filter_type=ftype)) == img).all()

    png_prop()


def test_decode_media_png_dispatch():
    from ifeatureomega_cli_spark.operators.multimodal import (
        decode_media, encode_png, image_features)

    rng = np.random.RandomState(5)
    rgb = rng.randint(0, 256, size=(6, 4, 3), dtype=np.uint8)
    path, feat = decode_media(encode_png(rgb))
    assert path == "png"
    np.testing.assert_allclose(feat, image_features(rgb))
    # grayscale replicates to RGB for the feature kernel
    gray = rng.randint(0, 256, size=(6, 4, 1), dtype=np.uint8)
    path, feat = decode_media(encode_png(gray))
    assert path == "png" and len(feat) == 17
    # truncated PNG → stub, not silent partial decode
    path, _ = decode_media(encode_png(rgb)[:-9])
    assert path == "stub"


def test_png_palettized_all_depths():
    """Hand-built palettized PNGs (color type 3, PLTE lookup) at index
    depths 1/2/4/8 — including a Sub-filtered row — reconstruct the
    exact palette colors."""
    import zlib

    from ifeatureomega_cli_spark.operators.multimodal import (
        _PNG_MAGIC, decode_media, decode_png)

    def chunk(t, body):
        return (len(body).to_bytes(4, "big") + t + body
                + (zlib.crc32(t + body) & 0xFFFFFFFF).to_bytes(4, "big"))

    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255], [10, 20, 30]],
                   dtype=np.uint8)
    rng = np.random.RandomState(3)
    for depth in (1, 2, 4, 8):
        ncol = min(2 ** depth, len(pal))
        w, h = 11, 5  # odd width: sub-byte rows end mid-byte
        idx = rng.randint(0, ncol, size=(h, w), dtype=np.uint8)
        stride = -(-w * depth // 8)
        rows = []
        for y in range(h):
            bits = np.unpackbits(idx[y][:, None], axis=1)[:, 8 - depth:]
            packed = np.packbits(bits.ravel())[:stride]
            f = 1 if y == 2 else 0  # one Sub-filtered row (bpp = 1 byte)
            if f == 1:
                filt = np.empty_like(packed)
                filt[0] = packed[0]
                filt[1:] = (packed[1:].astype(np.int64)
                            - packed[:-1]) & 0xFF
                rows.append(b"\x01" + filt.astype(np.uint8).tobytes())
            else:
                rows.append(b"\x00" + packed.tobytes())
        ihdr = (w.to_bytes(4, "big") + h.to_bytes(4, "big")
                + bytes([depth, 3, 0, 0, 0]))
        png = (_PNG_MAGIC + chunk(b"IHDR", ihdr)
               + chunk(b"PLTE", pal.tobytes())
               + chunk(b"IDAT", zlib.compress(b"".join(rows)))
               + chunk(b"IEND", b""))
        got = decode_png(png)
        assert got.shape == (h, w, 3), depth
        assert (got == pal[idx]).all(), depth
        assert decode_media(png)[0] == "png"
    # palettized without PLTE → stub fallback, not a crash
    bad = (_PNG_MAGIC + chunk(b"IHDR", ihdr)
           + chunk(b"IDAT", zlib.compress(b"".join(rows)))
           + chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="PLTE"):
        decode_png(bad)


def test_png_adam7_interlaced():
    """Hand-laid-out Adam7 streams (7 passes, per-pass filtering incl.
    Up rows) reconstruct exactly — RGB and depth-2 palette variants."""
    import zlib

    from ifeatureomega_cli_spark.operators.multimodal import (
        _PNG_MAGIC, decode_png)

    def chunk(t, body):
        return (len(body).to_bytes(4, "big") + t + body
                + (zlib.crc32(t + body) & 0xFFFFFFFF).to_bytes(4, "big"))

    passes = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
              (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]
    rng = np.random.RandomState(7)
    h, w, c = 13, 9, 3
    img = rng.randint(0, 256, size=(h, w, c), dtype=np.uint8)
    payload = bytearray()
    for x0, y0, xs, ys in passes:
        sub = img[y0::ys, x0::xs]
        if sub.size == 0:
            continue
        ph, pw = sub.shape[:2]
        flat = sub.reshape(ph, pw * c)
        for y in range(ph):
            if y % 2 == 0:
                payload += b"\x00" + flat[y].tobytes()
            else:  # Up-filtered row WITHIN the pass
                payload += b"\x02" + ((flat[y].astype(np.int64)
                                       - flat[y - 1]) & 0xFF).astype(
                    np.uint8).tobytes()
    ihdr = w.to_bytes(4, "big") + h.to_bytes(4, "big") + bytes(
        [8, 2, 0, 0, 1])
    png = (_PNG_MAGIC + chunk(b"IHDR", ihdr)
           + chunk(b"IDAT", zlib.compress(bytes(payload)))
           + chunk(b"IEND", b""))
    assert (decode_png(png) == img).all()

    pal = np.array([[250, 0, 0], [0, 250, 0], [0, 0, 250], [7, 7, 7]],
                   dtype=np.uint8)
    idx = rng.randint(0, 4, size=(h, w), dtype=np.uint8)
    payload = bytearray()
    for x0, y0, xs, ys in passes:
        sub = idx[y0::ys, x0::xs]
        if sub.size == 0:
            continue
        ph, pw = sub.shape
        srow = -(-pw * 2 // 8)
        for y in range(ph):
            bits = np.unpackbits(sub[y][:, None], axis=1)[:, 6:]
            payload += b"\x00" + np.packbits(bits.ravel())[:srow].tobytes()
    ihdr = w.to_bytes(4, "big") + h.to_bytes(4, "big") + bytes(
        [2, 3, 0, 0, 1])
    png = (_PNG_MAGIC + chunk(b"IHDR", ihdr) + chunk(b"PLTE", pal.tobytes())
           + chunk(b"IDAT", zlib.compress(bytes(payload)))
           + chunk(b"IEND", b""))
    assert (decode_png(png) == pal[idx]).all()


def test_png_16bit_samples():
    """16-bit PNGs decode with the standard high-byte downscale; the
    filter distance spans the full 2-byte sample (Sub row pinned)."""
    import zlib

    from ifeatureomega_cli_spark.operators.multimodal import (
        _PNG_MAGIC, decode_media, decode_png)

    def chunk(t, body):
        return (len(body).to_bytes(4, "big") + t + body
                + (zlib.crc32(t + body) & 0xFFFFFFFF).to_bytes(4, "big"))

    rng = np.random.RandomState(4)
    h, w = 6, 5
    img16 = rng.randint(0, 65536, size=(h, w, 3), dtype=np.uint16)
    flat = img16.byteswap().view(np.uint8).reshape(h, w * 6)  # big-endian
    rows = []
    for y in range(h):
        if y == 3:  # Sub filter with bpp = 6 bytes
            line = flat[y].astype(np.int64)
            filt = line.copy()
            filt[6:] = (line[6:] - line[:-6]) & 0xFF
            rows.append(b"\x01" + filt.astype(np.uint8).tobytes())
        else:
            rows.append(b"\x00" + flat[y].tobytes())
    ihdr = (w.to_bytes(4, "big") + h.to_bytes(4, "big")
            + bytes([16, 2, 0, 0, 0]))
    png = (_PNG_MAGIC + chunk(b"IHDR", ihdr)
           + chunk(b"IDAT", zlib.compress(b"".join(rows)))
           + chunk(b"IEND", b""))
    got = decode_png(png)
    assert got.shape == (h, w, 3)
    assert (got == (img16 >> 8).astype(np.uint8)).all()
    assert decode_media(png)[0] == "png"
