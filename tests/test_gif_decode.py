"""Round-7 GIF decoder (`operators/gif.py`): real LZW (dictionary
growth, width bumps, table reset at 4096), interlace, local palettes,
sub-block walking — pinned by writer↔reader round-trips (exact: GIF is
lossless) plus hand-built streams for the paths an encoder round-trip
alone wouldn't prove."""

from __future__ import annotations

import numpy as np
import pytest

from ifeatureomega_cli_spark.operators.gif import decode_gif, encode_gif
from ifeatureomega_cli_spark.operators.multimodal import decode_media


def _paletted(h, w, n_colors=16, seed=0):
    rng = np.random.RandomState(seed)
    pal = rng.randint(0, 256, size=(n_colors, 3), dtype=np.uint8)
    return pal[rng.randint(0, n_colors, size=(h, w))]


def test_roundtrip_exact():
    img = _paletted(23, 31)
    np.testing.assert_array_equal(decode_gif(encode_gif(img)), img)


def test_roundtrip_interlaced():
    # heights around the 4-pass boundaries (1..9 rows hit passes unevenly)
    for h in (1, 2, 3, 5, 8, 9, 16):
        img = _paletted(h, 11, seed=h)
        np.testing.assert_array_equal(
            decode_gif(encode_gif(img, interlace=True)), img)


def test_roundtrip_two_color_min_code_floor():
    # 2-color palette → depth 1 but LZW min code size floors at 2
    img = np.where(np.indices((9, 13)).sum(0)[..., None] % 2 == 0,
                   np.uint8(255), np.uint8(0)) * np.ones(3, np.uint8)
    payload = encode_gif(img)
    assert payload[:6] == b"GIF89a"
    np.testing.assert_array_equal(decode_gif(payload), img)


def test_width_bumps_and_table_reset():
    # noise with a full 256-color palette over >4096 pixels forces code
    # widths 9..12 AND at least one encoder table reset (CLEAR mid-stream)
    img = _paletted(120, 120, n_colors=256, seed=7)
    assert len(np.unique(img.reshape(-1, 3), axis=0)) > 128
    np.testing.assert_array_equal(decode_gif(encode_gif(img)), img)


def test_extensions_and_trailing_frames_skipped():
    img = _paletted(8, 8, seed=2)
    base = encode_gif(img)
    # splice a Graphic Control Extension before the image descriptor
    at = base.index(b"\x2c")
    gce = b"\x21\xf9\x04\x00\x0a\x00\x00\x00"
    patched = base[:at] + gce + base[at:]
    np.testing.assert_array_equal(decode_gif(patched), img)
    # append a second frame after the first; first frame wins
    frame2 = encode_gif(_paletted(8, 8, seed=9))
    two = base[:-1] + frame2[13 + 3 * 16: ]  # strip header+GCT, keep 2C..3B
    np.testing.assert_array_equal(decode_gif(two), img)


def test_local_color_table():
    img = _paletted(6, 7, seed=4)
    base = bytearray(encode_gif(img))
    # move the global color table into a local one on the descriptor
    depth_bits = base[10] & 7
    n = 3 * (2 << depth_bits)
    gct = bytes(base[13: 13 + n])
    rest = bytes(base[13 + n:])
    at = rest.index(b"\x2c")
    rebuilt = bytes(base[:10]) + bytes([base[10] & 0x7F]) + bytes(base[11:13]) \
        + rest[: at + 9] + bytes([rest[at + 9] | 0x80 | depth_bits]) \
        + gct + rest[at + 10:]
    np.testing.assert_array_equal(decode_gif(rebuilt), img)


def test_malformed_raises_then_stub():
    img = _paletted(10, 10)
    payload = encode_gif(img)
    with pytest.raises(ValueError):
        decode_gif(payload[: len(payload) // 2])   # truncated sub-blocks
    with pytest.raises(ValueError):
        decode_gif(b"GIF89a" + payload[6:10])       # truncated descriptor
    with pytest.raises(ValueError):
        decode_gif(b"NOTGIF" + payload[6:])
    assert decode_media(payload[: len(payload) // 2])[0] == "stub"


def test_decode_media_dispatch_gif():
    img = _paletted(12, 18, seed=5)
    path, feat = decode_media(encode_gif(img))
    assert path == "gif" and len(feat) == 17
    from ifeatureomega_cli_spark.operators.multimodal import image_features
    np.testing.assert_allclose(feat, image_features(img))


def test_too_many_colors_rejected_by_encoder():
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, size=(40, 40, 3), dtype=np.uint8)
    assert len(np.unique(img.reshape(-1, 3), axis=0)) > 256
    with pytest.raises(ValueError, match="256"):
        encode_gif(img)
