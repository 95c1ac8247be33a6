"""Host <-> device codec for fixed-limb field elements.

A field element is a uint32 array ``(..., L)`` of 16-bit little-endian limbs.
Device math keeps elements in Montgomery form; the helpers here convert
between Python ints / numpy object arrays and limb arrays (standard or
Montgomery domain).
"""

from __future__ import annotations

import numpy as np

from ..params import FieldSpec


def limb_dtype(spec: FieldSpec):
    return np.uint32 if spec.limb_bits == 16 else np.uint64


def ints_to_limbs(xs, spec: FieldSpec) -> np.ndarray:
    """Int / nested-list-of-int -> unsigned limb array with trailing dim L."""
    arr = np.asarray(xs, dtype=object)
    out = np.empty(arr.shape + (spec.num_limbs,), dtype=limb_dtype(spec))
    flat = arr.reshape(-1)
    out_flat = out.reshape(-1, spec.num_limbs)
    for i, v in enumerate(flat):
        v = int(v) % spec.modulus
        for k in range(spec.num_limbs):
            out_flat[i, k] = (v >> (spec.limb_bits * k)) & spec.mask
    return out


def limbs_to_ints(limbs, spec: FieldSpec):
    """uint32 limb array -> numpy object array of Python ints (same leading shape)."""
    a = np.asarray(limbs)
    lead = a.shape[:-1]
    flat = a.reshape(-1, spec.num_limbs)
    out = np.empty(flat.shape[0], dtype=object)
    for i in range(flat.shape[0]):
        out[i] = spec.from_limbs(flat[i])
    return out.reshape(lead) if lead else out[0]


def ints_to_mont_limbs(xs, spec: FieldSpec) -> np.ndarray:
    arr = np.asarray(xs, dtype=object)
    mont = np.empty_like(arr)
    flat, mflat = arr.reshape(-1), mont.reshape(-1)
    for i in range(flat.shape[0]):
        mflat[i] = spec.to_mont(int(flat[i]))
    return ints_to_limbs(mont, spec)


def mont_limbs_to_ints(limbs, spec: FieldSpec):
    vals = limbs_to_ints(limbs, spec)
    if isinstance(vals, np.ndarray):
        flat = vals.reshape(-1)
        for i in range(flat.shape[0]):
            flat[i] = spec.from_mont(int(flat[i]))
        return vals
    return spec.from_mont(int(vals))
