"""Registry-wide names↔kernel arity audit under NON-default parameters.

The round-3 AAIndex bug (names honored the `aaindex` selection, the kernel
used the fixed default table → 62 names vs 248 values) is a whole CLASS of
latent bug: every parameterized descriptor whose make_names reads a cfg key
its make_kernel ignores.  This sweep bumps every tweakable parameter of
every registered descriptor and asserts the kernel's output width equals
the advertised name count — no Spark needed, kernels run on a raw Ragged.
"""

from __future__ import annotations

import numpy as np
import pytest

from ifeatureomega_cli_spark.functions.kernels import Ragged
from ifeatureomega_cli_spark.functions.registry import DESCRIPTORS

L_BY_TYPE = {"protein": 31, "dna": 81, "rna": 81}
VOCAB = {"protein": 20, "dna": 4, "rna": 4}

# cross-sample descriptors are not registry kernels; skip anything without
# a make_kernel path that runs on a plain token batch
SKIP = set()


def _batch(seq_type: str, L: int, n: int = 24) -> Ragged:
    rng = np.random.RandomState(0)
    return Ragged.from_arrays(
        [rng.randint(0, VOCAB[seq_type], size=L).astype(np.int64)
         for _ in range(n)])


def _variants(defaults: dict):
    """Yield one bumped-cfg per tweakable key (ints +1, floats ×1.5,
    ';'-joined property lists truncated to their first 2 entries)."""
    for k, v in defaults.items():
        if isinstance(v, bool):
            continue
        if isinstance(v, int):
            yield k, {**defaults, k: v + 1}
        elif isinstance(v, float):
            yield k, {**defaults, k: round(v * 1.5, 6)}
        elif isinstance(v, str) and ";" in v:
            parts = v.split(";")
            if len(parts) > 2:
                yield k, {**defaults, k: ";".join(parts[:2])}


@pytest.mark.parametrize("key", sorted(k for k, s in DESCRIPTORS.items()
                                       if s.defaults))
def test_names_width_matches_kernel_width(key):
    spec = DESCRIPTORS[key]
    L = L_BY_TYPE[spec.seq_type]
    r = _batch(spec.seq_type, L)
    checked = 0
    for param, cfg in _variants(spec.defaults):
        try:
            names = spec.names(cfg, L)
            kern = spec.kernel(cfg, L)
            out = kern(r)
        except Exception:
            # constraint violation for this bump (e.g. lambda ≥ L, model
            # mismatch) — a raise is acceptable; silence is not
            continue
        assert out.shape == (r.n, len(names)), (
            f"{key}: bumping {param!r} → kernel width {out.shape[1]} != "
            f"{len(names)} advertised names")
        checked += 1
    if checked == 0:
        pytest.skip(f"{key}: no bumpable parameter ran")


@pytest.mark.parametrize("key", sorted(k for k, s in DESCRIPTORS.items()
                                       if not s.defaults))
def test_default_names_width_matches_kernel_width(key):
    """Parameterless descriptors: same audit at defaults."""
    spec = DESCRIPTORS[key]
    L = L_BY_TYPE[spec.seq_type]
    r = _batch(spec.seq_type, L)
    names = spec.names(None, L)
    out = spec.kernel(None, L)(r)
    assert out.shape == (r.n, len(names)), key


def test_value_sensitivity_of_parameters():
    """Bumping a parameter should CHANGE the kernel output (the
    width-preserving flavour of the AAIndex bug).  Exactly two families are
    legitimately insensitive, both matching the reference:

    * Subsequence `delta` default is 0.0 — the ×1.5 bump is a no-op on 0,
      so the probe compares identical configs (δ>0 paths are value-pinned
      by the δ=0.5/1.0 reference goldens);
    * PseKRAAC `lambdaValue` under the DEFAULT g-gap model is unused — the
      reference only reads it under lambda-correlation (value-pinned by the
      type-2 lambda-correlation golden).
    """
    rng = np.random.RandomState(0)
    allowed = {("dna:Subsequence", "delta"), ("rna:Subsequence", "delta")}
    allowed |= {(k, "lambdaValue") for k in DESCRIPTORS
                if k.startswith("protein:PseKRAAC")}

    def variants(d):
        for k, v in d.items():
            if isinstance(v, bool):
                continue
            if isinstance(v, int):
                yield k, {**d, k: v + 1}
            elif isinstance(v, float):
                yield k, {**d, k: round(v * 1.5, 6)}
            elif isinstance(v, str) and ";" in v and len(v.split(";")) > 2:
                yield k, {**d, k: ";".join(v.split(";")[:2])}

    insensitive = set()
    for key, spec in sorted(DESCRIPTORS.items()):
        if not spec.defaults:
            continue
        L = L_BY_TYPE[spec.seq_type]
        r = Ragged.from_arrays(
            [rng.randint(0, VOCAB[spec.seq_type], size=L).astype(np.int64)
             for _ in range(24)])
        try:
            base = spec.kernel(None, L)(r)
        except Exception:
            continue
        for param, cfg in variants(spec.defaults):
            try:
                out = spec.kernel(cfg, L)(r)
            except Exception:
                continue
            if out.shape == base.shape and np.allclose(out, base,
                                                       equal_nan=True):
                insensitive.add((key, param))
    unexpected = insensitive - allowed
    assert not unexpected, f"parameters silently ignored: {sorted(unexpected)}"
