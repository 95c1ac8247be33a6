"""Batched Pedersen hashing on device (the Merkle/sn/pk hash kernel).

Replaces crypto3's pedersen hash usage (SURVEY.md §2B `hash` row; reference
common.hpp:833,1047).  TPU-first design: window lookup tables are
host-precomputed from the oracle (one-time), then hashing a batch of messages
is a gather over (window, digit) tables followed by a log-depth complete
Edwards tree reduction — no sequential window walk, no branches.

Digest convention (docs/HASH_SPEC.md): 255 little-endian bits of the
x-coordinate of the Pedersen point.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..params import (
    fr_spec,
    PEDERSEN_WINDOW_BITS,
    PEDERSEN_WINDOWS_PER_SEGMENT,
    PEDERSEN_SPACING_BITS,
    DIGEST_BITS,
)
from . import curve_ops as co
from . import limbs as lb


@functools.cache
def window_tables(num_windows: int):
    """Device tables: per window w and 3-bit digit d, the point
    enc(d) * 2^(4*local) * I_segment  in extended Edwards coords.

    Returns a tuple of 4 arrays shaped (num_windows, 8, L).
    """
    from ..refimpl import pedersen as pd
    from ..refimpl import curves as rc

    pts = []
    for w in range(num_windows):
        seg, local = divmod(w, PEDERSEN_WINDOWS_PER_SEGMENT)
        base = rc.jj_mul(pd.segment_generator(seg), 1 << (PEDERSEN_SPACING_BITS * local))
        for d in range(1 << PEDERSEN_WINDOW_BITS):
            s0, s1, s2 = d & 1, (d >> 1) & 1, (d >> 2) & 1
            digit = pd.window_digit(s0, s1, s2)
            pts.append(rc.jj_mul(base, digit % (pd.JUBJUB_RS * 8)))
    dev = co.jj_to_device(pts)
    return tuple(c.reshape(num_windows, 1 << PEDERSEN_WINDOW_BITS, *c.shape[1:]) for c in dev)


def bits_to_digits(bits) -> jnp.ndarray:
    """(batch, nbits) 0/1 -> (batch, ceil(nbits/3)) 3-bit window digits."""
    bits = jnp.asarray(bits, jnp.int32)
    nbits = bits.shape[-1]
    pad = (-nbits) % PEDERSEN_WINDOW_BITS
    if pad:
        bits = jnp.concatenate(
            [bits, jnp.zeros(bits.shape[:-1] + (pad,), jnp.int32)], axis=-1
        )
    b = bits.reshape(*bits.shape[:-1], -1, PEDERSEN_WINDOW_BITS)
    return b[..., 0] + 2 * b[..., 1] + 4 * b[..., 2]


def pedersen_point(digits, num_windows: int):
    """digits: (batch, W) -> extended Edwards point batch (the Pedersen sum)."""
    tables = window_tables(num_windows)
    digits = jnp.asarray(digits, jnp.int32)

    def gather(tc):
        # tc: (W, 8, ...) ; digits: (batch, W) -> (W, batch, ...)
        def per_window(tw, dw):
            return tw[dw]  # (batch, ...)

        return jax.vmap(per_window, in_axes=(0, 1))(tc, digits)

    gathered = tuple(gather(tc) for tc in tables)
    return co.jj_ops().sum_reduce(gathered, axis=0)


def x_coord_bits(point) -> jnp.ndarray:
    """Extended point batch -> (batch, 255) little-endian digest bits."""
    jj = co.jj_ops()
    lbits = fr_spec().limb_bits
    ax, _ = jj.to_affine(point)
    x_std = jj.f.from_mont(ax)  # (batch, L) plain limbs
    shifts = jnp.arange(lbits, dtype=x_std.dtype)
    bits = (x_std[..., :, None] >> shifts) & x_std.dtype.type(1)  # (batch, L, lbits)
    bits = bits.reshape(*x_std.shape[:-1], lbits * x_std.shape[-1])
    return bits[..., :DIGEST_BITS].astype(jnp.uint32)


def pedersen_hash_bits(bits, nbits: int) -> jnp.ndarray:
    """(batch, nbits) message bits -> (batch, 255) digest bits."""
    num_windows = (nbits + PEDERSEN_WINDOW_BITS - 1) // PEDERSEN_WINDOW_BITS
    return x_coord_bits(pedersen_point(bits_to_digits(bits), num_windows))
