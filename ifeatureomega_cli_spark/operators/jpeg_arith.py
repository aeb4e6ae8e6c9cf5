"""Arithmetic-coded JPEG (ITU T.81 Annex D QM-coder + F.2.4 models),
pure Python/numpy — the last portable gap in the JPEG surface.

The probability-estimation state machine (T.81 Table D.3 + the fixed
0.5 bin) is PROBED from the system libjpeg's .rodata into
``resources/jpeg_aritab.json`` by ``tools/make_lookups.py --aritab``
(probe-not-transcribe: a hand-copied 114-row table could never be
validated by shared-table round-trips).  The coder itself is written
from the published interval arithmetic:

* QM decision: interval A splits at A-Qe — bottom sub-interval is the
  MPS, top (size Qe) the LPS, with CONDITIONAL EXCHANGE when the
  estimate exceeds half the interval (A-Qe < Qe); states advance to
  NMPS on MPS-renormalization and NLPS (+ MPS flip when SWITCH) on
  LPS.  Renormalization doubles A/C until A ≥ 0x8000.
* Byte stuffing: JPEG's QM streams are BYTE-stuffed — an 0xFF data
  byte is followed by 0x00 (verified against libjpeg streams); a
  0xFF followed by anything else is a marker, after which the decoder
  feeds zero bytes (T.81 D.2.7 convention).
* Statistical models: T.81 F.2.4.1 (DC: zero/sign/magnitude-category
  ladder with L/U conditioning from the DAC marker) and F.2.4.2 (AC:
  per-index EOB / zero-run / magnitude contexts with the Kx low/high
  frequency split); context bin layout follows the spec's Table F.4
  numbering (DC ladder at 20, AC ladders at 189/217, magnitude bits
  at +14, fixed bin for AC signs).

Validation is external and bit-exact: ``tests/fixtures/arith/*.jpg``
are REAL libjpeg-produced arithmetic streams and the tests assert this
decoder recovers EXACTLY the quantized coefficient integers libjpeg's
own ``jpeg_read_coefficients`` reports for them (no IDCT tolerance in
the oracle), plus an in-repo encoder twin for hermetic round-trips.
"""

from __future__ import annotations

import json
import os

import numpy as np

__all__ = ["decode_arith_scan", "decode_arith_coefficients",
           "arith_coefficients_from_stream", "ArithEncoder",
           "encode_jpeg_arith"]

_TAB_PATH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "resources", "jpeg_aritab.json")
with open(_TAB_PATH) as _f:
    _ARITAB = [tuple(r) for r in json.load(_f)]   # (Qe, NMPS, NLPS, SWITCH)

DC_STAT_BINS = 64
AC_STAT_BINS = 256


class _ByteSource:
    """Stuffing/marker-aware entropy byte reader (T.81 D.2.7 / the
    libjpeg convention): 0xFF 0x00 → literal 0xFF; runs of 0xFF fill
    bytes are swallowed; 0xFF + other → marker, after which zero bytes
    are fed indefinitely."""

    def __init__(self, d: bytes, pos: int):
        self.d, self.bp = d, pos
        self.marker = None        # marker code once hit
        self.marker_at = None     # offset of its 0xFF

    def next(self) -> int:
        if self.marker is not None:
            return 0
        d = self.d
        if self.bp >= len(d):
            self.marker, self.marker_at = -1, len(d)
            return 0
        b = d[self.bp]
        self.bp += 1
        if b != 0xFF:
            return b
        start = self.bp - 1
        while self.bp < len(d) and d[self.bp] == 0xFF:
            start = self.bp
            self.bp += 1
        if self.bp < len(d) and d[self.bp] == 0x00:
            self.bp += 1
            return 0xFF
        self.marker = d[self.bp] if self.bp < len(d) else -1
        self.marker_at = start
        return 0


class ArithDecoder:
    """QM decoder core.  C's high 16 bits sit scale-aligned with A
    (initial interval 0x10000); BYTEIN inserts at bits 8..15 every 8
    renormalization shifts."""

    def __init__(self, d: bytes, pos: int):
        self.src = _ByteSource(d, pos)
        self.c = (self.src.next() << 24) | (self.src.next() << 16) \
            | (self.src.next() << 8)
        self.ct = 8
        self.a = 0x10000

    def decode(self, st: bytearray, i: int) -> int:
        s = st[i]
        qe, nmps, nlps, sw = _ARITAB[s & 0x7F]
        mps = s >> 7
        a = self.a - qe
        if (self.c >> 16) < a:
            if a & 0xFFFF8000:            # no renorm (covers a == 0x10000)
                self.a = a
                return mps
            if a < qe:                    # conditional exchange
                bit = 1 - mps
                if sw:
                    mps = bit
                st[i] = (mps << 7) | nlps
            else:
                bit = mps
                st[i] = (mps << 7) | nmps
            self.a = a
        else:
            self.c -= a << 16
            if a < qe:                    # conditional exchange
                bit = mps
                st[i] = (mps << 7) | nmps
            else:
                bit = 1 - mps
                if sw:
                    mps = 1 - mps
                st[i] = (mps << 7) | nlps
            self.a = qe
        # RENORMD
        a, c, ct = self.a, self.c, self.ct
        while a < 0x8000:
            if ct == 0:
                c |= self.src.next() << 8
                ct = 8
            a <<= 1
            c = (c << 1) & 0xFFFFFFFF
            ct -= 1
        self.a, self.c, self.ct = a, c, ct
        return bit


def _decode_dc(dec, stats, dc_ctx, ci, last_dc, L, U):
    """F.2.4.1: one DC difference.  Returns the new DC value; updates
    the per-component conditioning context in dc_ctx."""
    st = dc_ctx[ci]
    if dec.decode(stats, st) == 0:
        dc_ctx[ci] = 0
        return last_dc
    sign = dec.decode(stats, st + 1)
    st += 2 + sign
    m = dec.decode(stats, st)
    if m:
        st = 20                           # Table F.4: X1
        while dec.decode(stats, st):
            m <<= 1
            if m == 0x8000:
                raise ValueError("arith DC magnitude overflow")
            st += 1
    if m < (1 << L) >> 1:
        dc_ctx[ci] = 0
    elif m > (1 << U) >> 1:
        dc_ctx[ci] = 12 + 4 * sign
    else:
        dc_ctx[ci] = 4 + 4 * sign
    v = m
    st += 14
    while m := m >> 1:
        if dec.decode(stats, st):
            v |= m
    v += 1
    return last_dc + (-v if sign else v)


def _decode_ac(dec, stats, fixed, zz, kx, ss=1, se=63):
    """F.2.4.2: AC coefficients Ss..Se of one block into zz (zigzag)."""
    k = ss
    while k <= se:
        st = 3 * (k - 1)
        if dec.decode(stats, st):         # EOB
            return
        while dec.decode(stats, st + 1) == 0:
            st += 3
            k += 1
            if k > se:
                raise ValueError("arith AC index overflow")
        sign = dec.decode(fixed, 0)
        st += 2
        m = dec.decode(stats, st)
        if m:
            if dec.decode(stats, st):
                m = 2
                st = 189 if k <= kx else 217
                while dec.decode(stats, st):
                    m <<= 1
                    if m == 0x8000:
                        raise ValueError("arith AC magnitude overflow")
                    st += 1
        v = m
        st += 14
        while m := m >> 1:
            if dec.decode(stats, st):
                v |= m
        v += 1
        zz[k] = -v if sign else v
        k += 1


def decode_arith_coefficients(d, pos, frame, scan, conditioning,
                              restart_interval):
    """Sequential arithmetic scan → per-component quantized coefficient
    arrays (block raster, zigzag order).  Split out from the pixel path
    so tests can pin EXACT integer equality against libjpeg's
    jpeg_read_coefficients on the same stream — an entropy-level oracle
    with no IDCT tolerance in it."""
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    hmax = max(c["hs"] for c in comps)
    vmax = max(c["vs"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    coefs = [np.zeros((mcuy * c["vs"], mcux * c["hs"], 64), dtype=np.int32)
             for c in comps]

    def fresh_state():
        dc_stats = {t: bytearray(DC_STAT_BINS)
                    for t in {scan[c["id"]][0] for c in comps}}
        ac_stats = {t: bytearray(AC_STAT_BINS)
                    for t in {scan[c["id"]][1] for c in comps}}
        # AC signs use the table's non-adaptive 0.5 bin (state 113)
        return dc_stats, ac_stats, bytearray([113]), [0] * len(comps), \
            [0] * len(comps)

    dec = ArithDecoder(d, pos)
    dc_stats, ac_stats, fixed, dc_ctx, last_dc = fresh_state()
    mcu_count = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                # T.81 restart: expect RSTn, then re-init coder + stats
                src = dec.src
                if src.marker is None:
                    # decoder lookahead hasn't hit it yet: scan forward
                    # (skipping stuffed 0xFF00 data and 0xFF fill bytes)
                    p = src.bp
                    while p + 1 < len(d):
                        if d[p] != 0xFF:
                            p += 1
                        elif d[p + 1] == 0x00:
                            p += 2
                        elif d[p + 1] == 0xFF:
                            p += 1
                        else:
                            break
                    src.marker = d[p + 1] if p + 1 < len(d) else -1
                    src.marker_at = p
                if src.marker != 0xD0 + rst:
                    raise ValueError(
                        f"expected RST{rst}, got {src.marker:#x}"
                        if isinstance(src.marker, int) and src.marker >= 0
                        else "missing restart marker")
                dec = ArithDecoder(d, src.marker_at + 2)
                dc_stats, ac_stats, fixed, dc_ctx, last_dc = fresh_state()
                rst = (rst + 1) % 8
            for ci, c in enumerate(comps):
                dtab, atab = scan[c["id"]]
                L, U = conditioning["dc"].get(dtab, (0, 1))
                kx = conditioning["ac"].get(atab, 5)
                for by in range(c["vs"]):
                    for bx in range(c["hs"]):
                        zz = coefs[ci][my * c["vs"] + by, mx * c["hs"] + bx]
                        last_dc[ci] = _decode_dc(
                            dec, dc_stats[dtab], dc_ctx, ci, last_dc[ci],
                            L, U)
                        zz[0] = last_dc[ci]
                        _decode_ac(dec, ac_stats[atab], fixed, zz, kx)
            mcu_count += 1
    return coefs


def _finish(frame, coefs, qtabs):
    """Vectorized dequant + IDCT over zigzag coefficient arrays, shared
    by the sequential and progressive arithmetic paths."""
    from ifeatureomega_cli_spark.operators.jpeg import (
        _DCT, _ZIGZAG, _planes_to_image)

    center = 1 << (frame.get("prec", 8) - 1)
    planes = []
    for ci, c in enumerate(frame["comps"]):
        q = qtabs[c["q"]].astype(np.float64)
        arr = coefs[ci]
        bh, bw = arr.shape[:2]
        blocks = arr.reshape(-1, 64).astype(np.float64)
        nat = np.zeros_like(blocks)
        nat[:, _ZIGZAG] = blocks
        nat = nat.reshape(-1, 8, 8) * q[None]
        px = np.einsum("ij,njk,kl->nil", _DCT.T, nat, _DCT) + center
        planes.append(px.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3)
                      .reshape(bh * 8, bw * 8))
    return _planes_to_image(frame, planes)


def decode_arith_scan(d, pos, frame, scan, qtabs, conditioning,
                      restart_interval):
    """Sequential arithmetic scan → decoded image: entropy-decode all
    coefficient blocks, then one vectorized dequant + IDCT finish
    (plane assembly / color conversion shared with the Huffman paths
    via jpeg._planes_to_image)."""
    coefs = decode_arith_coefficients(d, pos, frame, scan, conditioning,
                                      restart_interval)
    return _finish(frame, coefs, qtabs)


# ------------------------------------------- progressive (SOF10, G.2)

def decode_arith_progressive_coefficients(d, pos, frame, conditioning,
                                          restart_interval):
    """Arithmetic progressive driver: owns the marker stream from the
    first SOS on, accumulating zigzag coefficients per component across
    DC first/refine (interleaved MCU walk) and AC first/refine
    (component block-raster walk) scans per T.81 G.2 — each scan
    restarts the QM coder and its statistics.  Returns the coefficient
    arrays; `decode_arith_progressive` adds the IDCT finish."""
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    hmax = max(c["hs"] for c in comps)
    vmax = max(c["vs"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    for c in comps:
        cw = -(-(w * c["hs"]) // hmax)
        ch = -(-(h * c["vs"]) // vmax)
        c["bw"] = -(-cw // 8)
        c["bh"] = -(-ch // 8)
    coefs = [np.zeros((mcuy * c["vs"], mcux * c["hs"], 64), dtype=np.int32)
             for c in comps]
    by_id = {c["id"]: (ci, c) for ci, c in enumerate(comps)}
    ri = restart_interval

    while pos + 4 <= len(d):
        if d[pos] != 0xFF:
            raise ValueError(f"marker expected at {pos}")
        marker = d[pos + 1]
        if marker == 0xD9:
            break
        size = int.from_bytes(d[pos + 2: pos + 4], "big")
        body = d[pos + 4: pos + 2 + size]
        if pos + 2 + size > len(d):
            raise ValueError(f"truncated segment {marker:02x}")
        if marker == 0xCC:
            b = body
            while len(b) >= 2:
                tc, tb, val = b[0] >> 4, b[0] & 0xF, b[1]
                if tc == 0:
                    conditioning["dc"][tb] = (val & 0xF, val >> 4)
                else:
                    conditioning["ac"][tb] = val
                b = b[2:]
        elif marker == 0xDD:
            ri = int.from_bytes(body[:2], "big")
        elif marker == 0xDA:
            ns = body[0]
            scan = {}
            order = []
            for si in range(ns):
                cid, tsel = body[1 + 2 * si: 3 + 2 * si]
                scan[cid] = (tsel >> 4, tsel & 0xF)
                order.append(cid)
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ahal = body[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0xF
            pos = _arith_progressive_scan(
                d, pos + 2 + size, frame, scan, order, by_id, conditioning,
                ri, coefs, ss, se, ah, al, mcux, mcuy)
            continue
        pos += 2 + size
    return coefs


def decode_arith_progressive(d, pos, frame, qtabs, conditioning,
                             restart_interval):
    coefs = decode_arith_progressive_coefficients(
        d, pos, frame, conditioning, restart_interval)
    return _finish(frame, coefs, qtabs)


def _arith_progressive_scan(d, pos, frame, scan, order, by_id, cond,
                            ri, coefs, ss, se, ah, al, mcux, mcuy):
    """One arithmetic progressive scan; returns the next marker
    position.  Models per T.81 G.2 / the sequential F.2.4 models with
    successive-approximation point transforms: DC refine and the sign
    of newly-significant AC refine coefficients use the non-adaptive
    0.5 bin."""
    sel = [by_id[cid] for cid in order]

    def fresh():
        return ({t: bytearray(DC_STAT_BINS)
                 for t in {scan[cid][0] for cid in order}},
                {t: bytearray(AC_STAT_BINS)
                 for t in {scan[cid][1] for cid in order}},
                bytearray([113]), [0] * len(frame["comps"]),
                [0] * len(frame["comps"]))

    dec = ArithDecoder(d, pos)
    dc_stats, ac_stats, fixed, dc_ctx, last_dc = fresh()
    p1, m1 = 1 << al, -1 << al

    def do_restart(rst):
        nonlocal dec, dc_stats, ac_stats, fixed, dc_ctx, last_dc
        src = dec.src
        if src.marker is None:
            p = src.bp
            while p + 1 < len(d):
                if d[p] != 0xFF:
                    p += 1
                elif d[p + 1] == 0x00:
                    p += 2
                elif d[p + 1] == 0xFF:
                    p += 1
                else:
                    break
            src.marker = d[p + 1] if p + 1 < len(d) else -1
            src.marker_at = p
        if src.marker != 0xD0 + rst:
            raise ValueError("missing restart marker in progressive scan")
        dec = ArithDecoder(d, src.marker_at + 2)
        dc_stats, ac_stats, fixed, dc_ctx, last_dc = fresh()

    if ss == 0:
        # ----- DC scan: interleaved MCU walk (or single component)
        interleaved = len(order) > 1
        if interleaved:
            nx, ny = mcux, mcuy
        else:
            ci0, c0 = sel[0]
            nx, ny = c0["bw"], c0["bh"]
        n = 0
        rst = 0
        for my in range(ny):
            for mx in range(nx):
                if ri and n and n % ri == 0:
                    do_restart(rst)
                    rst = (rst + 1) % 8
                for ci, c in sel:
                    dtab = scan[c["id"]][0]
                    vs, hs = (c["vs"], c["hs"]) if interleaved else (1, 1)
                    for by in range(vs):
                        for bx in range(hs):
                            zz = coefs[ci][my * vs + by, mx * hs + bx]
                            if ah == 0:
                                L, U = cond["dc"].get(dtab, (0, 1))
                                last_dc[ci] = _decode_dc(
                                    dec, dc_stats[dtab], dc_ctx, ci,
                                    last_dc[ci], L, U)
                                zz[0] = last_dc[ci] << al
                            else:
                                if dec.decode(fixed, 0):
                                    zz[0] |= p1
                n += 1
    else:
        # ----- AC scan: single component over its own block raster
        ci, c = sel[0]
        atab = scan[c["id"]][1]
        kx = cond["ac"].get(atab, 5)
        n = 0
        rst = 0
        for by in range(c["bh"]):
            for bx in range(c["bw"]):
                if ri and n and n % ri == 0:
                    do_restart(rst)
                    rst = (rst + 1) % 8
                zz = coefs[ci][by, bx]
                if ah == 0:
                    # AC first: the sequential model at point transform al
                    before = zz[ss: se + 1].copy()
                    _decode_ac(dec, ac_stats[atab], fixed, zz, kx, ss, se)
                    new = zz[ss: se + 1] != before
                    zz[ss: se + 1][new] <<= al
                else:
                    _decode_ac_refine(dec, ac_stats[atab], fixed, zz,
                                      ss, se, p1, m1)
                n += 1

    # position of the next marker (skip stuffed/fill/restart bytes)
    src = dec.src
    p = src.marker_at if src.marker is not None else src.bp
    from ifeatureomega_cli_spark.operators.jpeg import _next_marker
    return _next_marker(d, p)


def _decode_ac_refine(dec, stats, fixed, zz, ss, se, p1, m1):
    """G.2: AC successive-approximation refinement of one block."""
    kex = se
    while kex >= 1 and zz[kex] == 0:
        kex -= 1
    k = ss
    while k <= se:
        st = 3 * (k - 1)
        if k > kex:
            if dec.decode(stats, st):     # EOB
                return
        while True:
            if zz[k]:                     # previously significant
                if dec.decode(stats, st + 2):
                    zz[k] += m1 if zz[k] < 0 else p1
                break
            if dec.decode(stats, st + 1):  # newly significant
                zz[k] = m1 if dec.decode(fixed, 0) else p1
                break
            st += 3
            k += 1
            if k > se:
                raise ValueError("arith AC refine index overflow")
        k += 1


# ----------------------------------------------------------- encoder twin


def arith_coefficients_from_stream(payload: bytes):
    """Parse a sequential arithmetic JFIF stream (SOF9) and return
    (frame, coefficient arrays, zigzag order) — the test-facing entry
    for the libjpeg ``jpeg_read_coefficients`` oracle.  Coefficient
    arrays are (block_rows, block_cols, 64) int32 in ZIGZAG order over
    the MCU-padded raster; callers crop to the component's true block
    dims before comparing."""
    d = payload
    if len(d) < 4 or d[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    cond = {"dc": {}, "ac": {}}
    frame = None
    ri = 0
    while pos + 4 <= len(d):
        if d[pos] != 0xFF:
            raise ValueError(f"marker expected at {pos}")
        marker = d[pos + 1]
        size = int.from_bytes(d[pos + 2: pos + 4], "big")
        body = d[pos + 4: pos + 2 + size]
        if marker in (0xC9, 0xCA):
            h = int.from_bytes(body[1:3], "big")
            w = int.from_bytes(body[3:5], "big")
            comps = []
            for ci in range(body[5]):
                cid, samp, qid = body[6 + 3 * ci: 9 + 3 * ci]
                comps.append({"id": cid, "hs": samp >> 4,
                              "vs": samp & 0xF, "q": qid})
            frame = {"h": h, "w": w, "comps": comps, "prec": body[0],
                     "progressive": marker == 0xCA}
        elif marker == 0xCC:
            b = body
            while len(b) >= 2:
                tc, tb, val = b[0] >> 4, b[0] & 0xF, b[1]
                if tc == 0:
                    cond["dc"][tb] = (val & 0xF, val >> 4)
                else:
                    cond["ac"][tb] = val
                b = b[2:]
        elif marker == 0xDD:
            ri = int.from_bytes(body[:2], "big")
        elif marker == 0xDA:
            if frame is None:
                raise ValueError("SOS before SOF9/SOF10")
            if frame.get("progressive"):
                coefs = decode_arith_progressive_coefficients(
                    d, pos, frame, cond, ri)
                return frame, coefs
            scan = {}
            for si in range(body[0]):
                cid, tsel = body[1 + 2 * si: 3 + 2 * si]
                scan[cid] = (tsel >> 4, tsel & 0xF)
            coefs = decode_arith_coefficients(
                d, pos + 2 + size, frame, scan, cond, ri)
            return frame, coefs
        pos += 2 + size
    raise ValueError("no SOS segment")


# ----------------------------------------------------------- encoder twin

class ArithEncoder:
    """QM encoder mirror (T.81 Annex D.1) — exists so the decoder's
    coder core and models are hermetically round-trippable on top of
    the external libjpeg fixtures.  Byte-stuffed output with carry
    resolution over stacked 0xFF bytes."""

    def __init__(self):
        self.a = 0x10000
        self.c = 0
        self.ct = 11
        self.buf = None       # last unhardened byte
        self.sc = 0           # stacked 0xFF count
        self.out = bytearray()

    def _emit(self, b: int):
        self.out.append(b)
        if b == 0xFF:
            self.out.append(0x00)     # byte stuffing

    def _byteout(self):
        t = self.c >> 19
        if t > 0xFF:                  # carry
            if self.buf is not None:
                self._emit(self.buf + 1)
            for _ in range(self.sc):  # carried-over 0xFFs become 0x00
                self._emit(0x00)
            self.sc = 0
            self.buf = t & 0xFF
        elif t == 0xFF:
            self.sc += 1              # stack: may still receive carry
        else:
            if self.buf is not None:
                self._emit(self.buf)
            for _ in range(self.sc):
                self._emit(0xFF)
            self.sc = 0
            self.buf = t
        self.c &= 0x7FFFF

    def _renorm(self):
        a, c, ct = self.a, self.c, self.ct
        while True:
            a <<= 1
            c <<= 1
            ct -= 1
            if ct == 0:
                self.c = c
                self._byteout()
                c = self.c
                ct = 8
            if a & 0x8000:
                break
        self.a, self.c, self.ct = a, c, ct

    def encode(self, st: bytearray, i: int, bit: int):
        s = st[i]
        qe, nmps, nlps, sw = _ARITAB[s & 0x7F]
        mps = s >> 7
        a = self.a - qe
        if bit == mps:
            if a & 0xFFFF8000:
                self.a = a
                return
            if a < qe:                # conditional exchange: MPS on top
                self.c += a
                self.a = qe
            else:
                self.a = a
            st[i] = (mps << 7) | nmps
        else:
            if a < qe:                # conditional exchange: LPS at bottom
                self.a = a
            else:
                self.c += a
                self.a = qe
            if sw:
                mps = 1 - mps
            st[i] = (mps << 7) | nlps
        self._renorm()

    def flush(self) -> bytes:
        # pick mid-interval, push every remaining bit through byteout
        self.c += self.a >> 1
        for _ in range(4):
            for _ in range(self.ct):
                self.c <<= 1
            self.ct = 0
            self._byteout()
            self.ct = 8
        if self.buf is not None:
            self._emit(self.buf)
        for _ in range(self.sc):
            self._emit(0xFF)
        # strip redundant trailing zero bytes (decoder feeds zeros)
        out = self.out
        while out and out[-1] == 0x00 and not (
                len(out) >= 2 and out[-2] == 0xFF):
            out.pop()
        return bytes(out)


def _encode_dc(enc, stats, dc_ctx, ci, diff, L, U):
    """F.1.4.1 mirror of _decode_dc."""
    st = dc_ctx[ci]
    if diff == 0:
        enc.encode(stats, st, 0)
        dc_ctx[ci] = 0
        return
    enc.encode(stats, st, 1)
    sign = 1 if diff < 0 else 0
    enc.encode(stats, st + 1, sign)
    st += 2 + sign
    mag = abs(diff) - 1
    if mag == 0:
        enc.encode(stats, st, 0)
        m = 0
    else:
        enc.encode(stats, st, 1)
        m = 1
        st = 20
        while mag >= (m << 1):
            enc.encode(stats, st, 1)
            m <<= 1
            st += 1
        enc.encode(stats, st, 0)
    if m < (1 << L) >> 1:
        dc_ctx[ci] = 0
    elif m > (1 << U) >> 1:
        dc_ctx[ci] = 12 + 4 * sign
    else:
        dc_ctx[ci] = 4 + 4 * sign
    st += 14
    bit = m >> 1
    while bit:
        enc.encode(stats, st, 1 if mag & bit else 0)
        bit >>= 1


def _encode_ac(enc, stats, fixed, zz, kx, se=63):
    """F.1.4.2 mirror of _decode_ac."""
    last = se
    while last >= 1 and zz[last] == 0:
        last -= 1
    k = 1
    while k <= last:
        st = 3 * (k - 1)
        enc.encode(stats, st, 0)          # not EOB
        while zz[k] == 0:
            enc.encode(stats, st + 1, 0)
            st += 3
            k += 1
        enc.encode(stats, st + 1, 1)
        v = int(zz[k])
        enc.encode(fixed, 0, 1 if v < 0 else 0)
        st += 2
        mag = abs(v) - 1
        if mag == 0:
            enc.encode(stats, st, 0)
            m = 0
        else:
            enc.encode(stats, st, 1)
            if mag == 1:
                enc.encode(stats, st, 0)
                m = 1
            else:
                enc.encode(stats, st, 1)
                m = 2
                st = 189 if k <= kx else 217
                while mag >= (m << 1):
                    enc.encode(stats, st, 1)
                    m <<= 1
                    st += 1
                enc.encode(stats, st, 0)
        st += 14
        bit = m >> 1
        while bit:
            enc.encode(stats, st, 1 if mag & bit else 0)
            bit >>= 1
        k += 1
    if last < se:
        st = 3 * (k - 1)
        enc.encode(stats, st, 1)          # EOB


def encode_jpeg_arith(rgb: np.ndarray, subsample: bool = False,
                      restart_interval: int = 0,
                      cmyk: bool = False) -> bytes:
    """Sequential arithmetic-coded JFIF writer (SOF9 + DAC), the
    hermetic twin: shares the DCT/quantization front end with
    jpeg.encode_jpeg so the cross-codec differential oracle applies —
    identical quantized coefficients, arithmetic entropy coding.
    cmyk=True (round 8): `rgb` is (H, W, 4) STORED Adobe CMYK, coded
    as-is with an APP14 transform-0 marker."""
    from ifeatureomega_cli_spark.operators.jpeg import (
        _DCT, _QUANT_CHROMA, _QUANT_LUMA, _ZIGZAG)

    gray = rgb.ndim == 2
    h, w = rgb.shape[:2]
    if cmyk:
        if rgb.ndim != 3 or rgb.shape[2] != 4:
            raise ValueError("cmyk=True expects (H, W, 4) stored values")
        f = rgb.astype(np.float64)
        comps = [f[:, :, ci] for ci in range(4)]
        subsample = False
    elif gray:
        comps = [rgb.astype(np.float64)]
        subsample = False
    else:
        f = rgb.astype(np.float64)
        r, g, b = f[:, :, 0], f[:, :, 1], f[:, :, 2]
        comps = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
    ncomp = len(comps)
    ys = 2 if subsample else 1
    mcu = 8 * ys
    ph, pw = -(-h // mcu) * mcu, -(-w // mcu) * mcu
    comps = [np.pad(c, ((0, ph - h), (0, pw - w)), mode="edge")
             for c in comps]
    if subsample:
        for ci in (1, 2):
            c = comps[ci]
            comps[ci] = c.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
    samp = [(ys, ys)] + [(1, 1)] * (ncomp - 1)

    def seg(marker, body):
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") \
            + body

    out = bytearray(b"\xff\xd8")
    if cmyk:
        out += seg(0xEE, b"Adobe\x00\x64\x00\x00\x00\x00\x00")
    else:
        out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    qtabs = [_QUANT_LUMA] + ([] if gray else [_QUANT_CHROMA])
    for tid, q in enumerate(qtabs):
        out += seg(0xDB, bytes([tid]) + bytes(
            int(x) for x in q.ravel()[_ZIGZAG]))
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") \
        + bytes([ncomp])
    for ci in range(ncomp):
        hs, vs = samp[ci]
        sof += bytes([ci + 1, (hs << 4) | vs, 0 if ci == 0 else 1])
    out += seg(0xC9, sof)                     # SOF9: arith sequential
    dac = b""
    for t in range(1 if gray else 2):
        dac += bytes([t, 0x10])               # DC: U=1, L=0 (defaults)
    for t in range(1 if gray else 2):
        dac += bytes([0x10 | t, 5])           # AC: Kx=5
    out += seg(0xCC, dac)
    if restart_interval:
        out += seg(0xDD, restart_interval.to_bytes(2, "big"))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)

    def fresh():
        return ({t: bytearray(DC_STAT_BINS) for t in range(2)},
                {t: bytearray(AC_STAT_BINS) for t in range(2)},
                bytearray([113]), [0] * ncomp, [0] * ncomp)

    enc = ArithEncoder()
    dc_stats, ac_stats, fixed, dc_ctx, last_dc = fresh()
    mcu_count = 0
    rst = 0
    for my in range(ph // mcu):
        for mx in range(pw // mcu):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                out += enc.flush()
                out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                enc = ArithEncoder()
                dc_stats, ac_stats, fixed, dc_ctx, last_dc = fresh()
            for ci in range(ncomp):
                hs, vs = samp[ci]
                q = (_QUANT_LUMA if ci == 0 else _QUANT_CHROMA) \
                    .astype(np.float64)
                t = 0 if ci == 0 else 1
                for by in range(vs):
                    for bx in range(hs):
                        y0 = (my * vs + by) * 8
                        x0 = (mx * hs + bx) * 8
                        block = comps[ci][y0: y0 + 8, x0: x0 + 8]
                        coef = _DCT @ (block - 128.0) @ _DCT.T
                        zz = np.round(coef / q).astype(np.int64) \
                            .ravel()[_ZIGZAG]
                        _encode_dc(enc, dc_stats[t], dc_ctx, ci,
                                   int(zz[0]) - last_dc[ci], 0, 1)
                        last_dc[ci] = int(zz[0])
                        _encode_ac(enc, ac_stats[t], fixed, zz, 5)
            mcu_count += 1
    out += enc.flush()
    out += b"\xff\xd9"
    return bytes(out)
