"""Build the arithmetic-JPEG validation fixtures: REAL libjpeg-encoded
arithmetic streams + libjpeg's own quantized-coefficient dumps for each
(the bit-exact entropy oracle).  Requires gcc + libjpeg headers (both
present in this container); the outputs are COMMITTED under
tests/fixtures/arith/ so the tests never need a compiler.

Usage: python tools/make_arith_fixtures.py
"""
from __future__ import annotations

import os
import re
import subprocess
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXDIR = os.path.join(REPO, "tests", "fixtures", "arith")


def load_coef_dump(path: str) -> list[np.ndarray]:
    d = open(path, "rb").read()
    comps = []
    m = re.match(rb"NCOMP (\d+)\n", d)
    off = m.end()
    for _ in range(int(m.group(1))):
        m = re.compile(rb"COMP (\d+) (\d+) (\d+)\n").match(d, off)
        off = m.end()
        wib, hib = int(m.group(2)), int(m.group(3))
        arr = np.frombuffer(d, dtype=np.int16, count=64 * wib * hib,
                            offset=off).reshape(hib, wib, 64)
        off += 2 * 64 * wib * hib
        comps.append(arr.copy())
    return comps


def main() -> None:
    os.makedirs(FIXDIR, exist_ok=True)
    tool = os.path.join(tempfile.gettempdir(), "arith_fixture_tool")
    subprocess.run(
        ["gcc", "-O2", "-o", tool,
         os.path.join(REPO, "tools", "arith_fixture_tool.c"), "-ljpeg"],
        check=True)

    rng = np.random.RandomState(3)
    x = np.linspace(0, 255, 40)[None, :, None] * np.ones((28, 1, 3))
    photo = np.clip(x + rng.randint(-25, 25, (28, 40, 3)),
                    0, 255).astype(np.uint8)
    big = np.clip(np.linspace(0, 255, 96)[None, :, None]
                  * np.ones((72, 1, 3))
                  + rng.randint(-40, 40, (72, 96, 3)),
                  0, 255).astype(np.uint8)
    cases = [
        # name, image, (quality, subsamp, restart, progressive)
        ("seq444_q90", photo, ("90", "0", "0", "0")),
        ("seq420_q75", photo, ("75", "1", "0", "0")),
        ("seq420_dri3", photo, ("75", "1", "3", "0")),
        ("seq_gray_q85", photo[:, :, 0].copy(), ("85", "0", "0", "0")),
        ("seq_noise_q95",
         rng.randint(0, 256, (33, 31, 3), dtype=np.uint8),
         ("95", "0", "0", "0")),
        ("seq420_big_q80", big, ("80", "1", "0", "0")),
        # progressive arithmetic (SOF10): decoded for real since late r7
        ("prog420_q85", photo, ("85", "1", "0", "1")),
    ]
    rng11 = np.random.RandomState(11)
    photo11 = np.clip(x + rng11.randint(-25, 25, (28, 40, 3)),
                      0, 255).astype(np.uint8)
    big11 = np.clip(np.linspace(0, 255, 96)[None, :, None]
                    * np.ones((72, 1, 3))
                    + rng11.randint(-40, 40, (72, 96, 3)),
                    0, 255).astype(np.uint8)
    cases += [
        ("prog444_q90", photo11, ("90", "0", "0", "1")),
        ("prog_gray_q85", photo11[:, :, 0].copy(), ("85", "0", "0", "1")),
        ("prog420_dri4", photo11, ("80", "1", "4", "1")),
        ("prog420_big_q80", big11, ("80", "1", "0", "1")),
    ]
    for name, img, args in cases:
        ppm = os.path.join(tempfile.gettempdir(), "fx.ppm")
        hdr = b"P6" if img.ndim == 3 else b"P5"
        with open(ppm, "wb") as f:
            f.write(hdr + b"\n%d %d\n255\n" % (img.shape[1], img.shape[0])
                    + img.tobytes())
        jpg = os.path.join(FIXDIR, name + ".jpg")
        subprocess.run([tool, "encode", ppm, jpg, *args], check=True)
        binp = os.path.join(tempfile.gettempdir(), "fx.bin")
        subprocess.run([tool, "coef", jpg, binp], check=True)
        comps = load_coef_dump(binp)
        np.savez_compressed(
            os.path.join(FIXDIR, name + "_coef.npz"),
            **{f"comp{i}": c for i, c in enumerate(comps)})
        print(f"  {name}: {os.path.getsize(jpg)} B jpg, "
              f"{len(comps)} comps")


if __name__ == "__main__":
    main()
