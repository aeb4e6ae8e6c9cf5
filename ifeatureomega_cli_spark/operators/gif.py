"""GIF87a/89a still-image decode — pure numpy + stdlib, from the public
spec (GIF89a specification, CompuServe 1990; the LZW variant is the one
defined there: variable 3..12-bit codes, CLEAR/EOI, 4096-entry table).

Round-7 completion of the still-image surface (`multimodal.py`): after
PNG (full) and JPEG (baseline + progressive), GIF is the remaining
container common in scraped training corpora that needs no media
library — palette indices under LZW.  Scope: the FIRST image frame of
a possibly-animated stream (training-data thumbnailing semantics),
global or local palette, sequential or interlaced row order, GCE
transparency ignored (the palette color is used).  Malformed streams
raise ValueError → the caller's deterministic stub, the same boundary
every other decoder here uses.

The encoder exists so the decoder is hermetically testable (real
dictionary growth, width bumps, table reset at 4096, interlace) — the
same writer↔reader discipline as encode_png/encode_jpeg/encode_avi.
"""

from __future__ import annotations

import numpy as np

__all__ = ["decode_gif", "encode_gif"]

_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))   # (start row, step) passes


def _u16(b: bytes, off: int) -> int:
    return int.from_bytes(b[off: off + 2], "little")


def _sub_blocks(d: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate data sub-blocks starting at pos; return (data, next)."""
    out = bytearray()
    while True:
        if pos >= len(d):
            raise ValueError("truncated GIF sub-blocks")
        n = d[pos]
        pos += 1
        if n == 0:
            return bytes(out), pos
        if pos + n > len(d):
            raise ValueError("truncated GIF sub-block")
        out += d[pos: pos + n]
        pos += n


def _lzw_decode(data: bytes, min_code: int, n_pixels: int) -> np.ndarray:
    """GIF-LZW → palette indices.  Codes are packed LSB-first; width
    starts at min_code+1 and bumps when the table reaches 2^width
    (capped at 12 bits); CLEAR resets the table and width."""
    if not 2 <= min_code <= 11:
        raise ValueError(f"bad LZW min code size {min_code}")
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8),
                         bitorder="little")
    out = np.empty(n_pixels, dtype=np.uint8)
    n_out = 0
    # table as (prefix_code, tail_byte); roots are (-1, i)
    prefix = np.empty(4096, dtype=np.int32)
    tail = np.empty(4096, dtype=np.uint8)
    nxt = width = 0
    prev = -1
    bp, nbits = 0, len(bits)

    def reset():
        nonlocal nxt, width, prev
        prefix[:clear] = -1
        tail[:clear] = np.arange(clear, dtype=np.uint8)
        nxt, width, prev = eoi + 1, min_code + 1, -1

    def expand(code: int) -> bytes:
        chain = bytearray()
        c = code
        while c >= 0:
            chain.append(tail[c])
            c = prefix[c]
        chain.reverse()
        return bytes(chain)

    reset()
    while n_out < n_pixels:
        if bp + width > nbits:
            raise ValueError("LZW stream exhausted before raster complete")
        code = int(bits[bp: bp + width] @ (1 << np.arange(width, dtype=np.int64)))
        bp += width
        if code == clear:
            reset()
            continue
        if code == eoi:
            raise ValueError("LZW EOI before raster complete")
        if code < nxt and code != clear + 1:
            seq = expand(code)
            if prev >= 0 and nxt < 4096:
                prefix[nxt], tail[nxt] = prev, seq[0]
                nxt += 1
        elif code == nxt and prev >= 0:
            first = expand(prev)[0:1]
            if nxt < 4096:
                prefix[nxt], tail[nxt] = prev, first[0]
                nxt += 1
            seq = expand(code) if code < nxt else expand(prev) + first
        else:
            raise ValueError(f"LZW code {code} out of range")
        take = min(len(seq), n_pixels - n_out)
        out[n_out: n_out + take] = np.frombuffer(seq[:take], dtype=np.uint8)
        n_out += take
        prev = code
        if nxt == (1 << width) and width < 12:
            width += 1
    return out


def decode_gif(payload: bytes) -> np.ndarray:
    """Decode the first image frame → (H, W, 3) uint8 RGB.

    Walks the block stream: logical screen descriptor (+ global color
    table), extensions skipped by grammar, first image descriptor
    (+ local color table) decoded, later frames ignored."""
    d = payload
    if len(d) < 13 or d[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    packed = d[10]
    pos = 13
    global_pal = None
    if packed & 0x80:
        n = 2 << (packed & 7)
        global_pal = np.frombuffer(d[pos: pos + 3 * n],
                                   dtype=np.uint8).reshape(-1, 3)
        if len(global_pal) < n:
            raise ValueError("truncated global color table")
        pos += 3 * n
    while pos < len(d):
        block = d[pos]
        if block == 0x3B:                      # trailer
            break
        if block == 0x21:                      # extension
            if pos + 2 > len(d):
                raise ValueError("truncated extension")
            _, pos = _sub_blocks(d, pos + 2)
        elif block == 0x2C:                    # image descriptor
            if pos + 10 > len(d):
                raise ValueError("truncated image descriptor")
            w, h = _u16(d, pos + 5), _u16(d, pos + 7)
            ipacked = d[pos + 9]
            pos += 10
            pal = global_pal
            if ipacked & 0x80:
                n = 2 << (ipacked & 7)
                pal = np.frombuffer(d[pos: pos + 3 * n],
                                    dtype=np.uint8).reshape(-1, 3)
                if len(pal) < n:
                    raise ValueError("truncated local color table")
                pos += 3 * n
            if pal is None:
                raise ValueError("no color table for image")
            if w == 0 or h == 0:
                raise ValueError("zero-dimension GIF frame")
            min_code = d[pos]
            data, pos = _sub_blocks(d, pos + 1)
            idx = _lzw_decode(data, min_code, w * h)
            if idx.max(initial=0) >= len(pal):
                raise ValueError("palette index out of range")
            rows = idx.reshape(h, w)
            if ipacked & 0x40:                 # interlaced
                ordered = np.empty_like(rows)
                src = 0
                for start, step in _INTERLACE:
                    n_rows = len(range(start, h, step))
                    ordered[start::step] = rows[src: src + n_rows]
                    src += n_rows
                rows = ordered
            return pal[rows]
        else:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
    raise ValueError("no image frame in GIF")


def encode_gif(rgb: np.ndarray, interlace: bool = False) -> bytes:
    """GIF89a writer with REAL LZW compression (dictionary growth, width
    bumps, reset at 4096) — exists to make every decoder path
    hermetically testable.  Image must use ≤256 distinct colors."""
    rgb = np.asarray(rgb, dtype=np.uint8)
    h, w = rgb.shape[:2]
    flat = rgb.reshape(-1, 3)
    pal, idx = np.unique(flat, axis=0, return_inverse=True)
    if len(pal) > 256:
        raise ValueError("more than 256 distinct colors")
    depth = max(1, int(np.ceil(np.log2(max(2, len(pal))))))
    pal_n = 1 << depth
    pal_bytes = np.zeros((pal_n, 3), dtype=np.uint8)
    pal_bytes[: len(pal)] = pal

    rows = idx.reshape(h, w)
    if interlace:
        rows = np.concatenate([rows[start::step]
                               for start, step in _INTERLACE])
    pixels = rows.ravel().astype(np.int32)

    min_code = max(2, depth)
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    codes: list[tuple[int, int]] = []          # (code, width)
    width = min_code + 1
    codes.append((clear, width))
    table: dict[tuple[int, int], int] = {}
    nxt = eoi + 1
    prev = int(pixels[0])
    for p in map(int, pixels[1:]):
        key = (prev, p)
        if key in table:
            prev = table[key]
            continue
        codes.append((prev, width))
        if nxt < 4096:
            table[key] = nxt
            nxt += 1
            if nxt - 1 == (1 << width) and width < 12:
                width += 1
        else:
            codes.append((clear, width))
            table.clear()
            nxt, width = eoi + 1, min_code + 1
        prev = p
    codes.append((prev, width))
    codes.append((eoi, width))

    bitbuf = bytearray()
    acc = nacc = 0
    for code, cw in codes:
        acc |= code << nacc
        nacc += cw
        while nacc >= 8:
            bitbuf.append(acc & 0xFF)
            acc >>= 8
            nacc -= 8
    if nacc:
        bitbuf.append(acc & 0xFF)

    out = bytearray(b"GIF89a")
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes([0x80 | (depth - 1), 0, 0])   # GCT flag+size, bg, aspect
    out += pal_bytes.tobytes()
    out += bytes([0x2C]) + b"\x00\x00\x00\x00" \
        + w.to_bytes(2, "little") + h.to_bytes(2, "little") \
        + bytes([0x40 if interlace else 0])
    out += bytes([min_code])
    for off in range(0, len(bitbuf), 255):
        chunk = bitbuf[off: off + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)
