"""Multi-scalar multiplication kernels (the Groth16 prover's hot op).

Replaces the reference's single-threaded multiexp hidden behind
``zk::generate/prove`` (SURVEY.md §2D; reference common.hpp:916,1132 and the
wNAF/multiexp params at common.hpp:38-39) with batched device kernels:

  * ``msm_var_base`` — variable-base MSM: vectorised double-and-add across all
    points (255 doublings amortised over the whole lane dimension) followed by
    a log-depth tree reduction.  Simple, fully parallel, O(N * 255) adds.
  * ``FixedBaseTable`` — windowed fixed-base multiplication (4-bit windows,
    host-precomputed table): 63 adds per scalar, no doublings.  Used for CRS
    generation and SAVER encryption where the base is shared.
  * ``msm_pippenger`` — sort-based Pippenger: bucket accumulation is
    reformulated as a segmented tree-reduction over bucket-sorted points
    (XLA-friendly: no scatters of point structs), then the classic
    running-sum over buckets rides a lax.scan vectorised across windows.

All kernels work for either G1 or G2 (pass the matching JacobianOps).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..params import R
from . import curve_ops as co
from .curve_ops import JacobianOps

# ---------------------------------------------------------------------------
# Variable-base MSM
# ---------------------------------------------------------------------------


def msm_var_base(ops: JacobianOps, points, scalar_digits):
    """sum_i scalars[i] * points[i].

    points: Jacobian pytree with leading dim n; scalar_digits: (n, 64) int32
    4-bit windows LSB-first (see scalars_to_window_digits).  Returns a single
    Jacobian point.
    """
    per_point = ops.scalar_mul_windowed(points, scalar_digits)
    return ops.sum_reduce(per_point, axis=0)


# ---------------------------------------------------------------------------
# Fixed-base windowed multiplication
# ---------------------------------------------------------------------------

FB_WINDOW = 4
FB_NUM_WINDOWS = (255 + FB_WINDOW - 1) // FB_WINDOW  # 64


class FixedBaseTable:
    """Host-precomputed table: entry[w][d] = d * 2^(4w) * base (affine oracle),
    shipped to device as Jacobian limb arrays of shape (W, 16, ...)."""

    def __init__(self, base_affine_int, group: str = "g1"):
        from ..refimpl import curves as rc

        mul = rc.g1_mul if group == "g1" else rc.g2_mul
        add = rc.g1_add if group == "g1" else rc.g2_add
        to_dev = co.g1_to_device if group == "g1" else co.g2_to_device
        self.group = group
        entries = []
        win_base = base_affine_int
        for w in range(FB_NUM_WINDOWS):
            row = [None]
            for d in range(1, 1 << FB_WINDOW):
                row.append(add(row[-1], win_base))
            entries.extend(row)
            for _ in range(FB_WINDOW):
                win_base = add(win_base, win_base)
        flat = to_dev(entries)  # (W * 16, ...)
        self.table = tuple(
            c.reshape(FB_NUM_WINDOWS, 1 << FB_WINDOW, *c.shape[1:]) for c in flat
        )

    def mul(self, ops: JacobianOps, digits):
        """digits: (n, W) int32 window digits (LSB window first) -> (n,) points."""
        digits = jnp.asarray(digits, jnp.int32)
        # gather per window: table[w, digits[:, w]] -> (W, n, ...)
        gathered = tuple(
            jax.vmap(lambda t, d: t[d], in_axes=(0, 1))(c, digits) for c in self.table
        )
        return ops.sum_reduce(gathered, axis=0)


def scalars_to_window_digits(scalars, window=FB_WINDOW, num_windows=FB_NUM_WINDOWS) -> np.ndarray:
    arr = np.asarray(scalars, dtype=object).reshape(-1)
    out = np.zeros((arr.shape[0], num_windows), dtype=np.int32)
    mask = (1 << window) - 1
    for i, v in enumerate(arr):
        v = int(v) % R
        for w in range(num_windows):
            out[i, w] = (v >> (window * w)) & mask
    return out


# ---------------------------------------------------------------------------
# Pippenger MSM (sort + segmented reduction)
# ---------------------------------------------------------------------------


def _segmented_tree_sum(ops: JacobianOps, points, seg_ids):
    """Hillis–Steele segmented suffix-sum over a bucket-sorted point array.

    After log2(n) rounds, position i holds the sum of the run of equal
    seg_ids starting at i.  Head positions then hold full segment sums.
    One `add` instance in the scan body.
    """
    n = seg_ids.shape[0]
    if n == 1:
        return points
    steps = (n - 1).bit_length()
    shifts = jnp.asarray([1 << s for s in range(steps)], jnp.int32)
    idx = jnp.arange(n)

    def body(pts, shift):
        shifted = tuple(jnp.roll(c, -shift, axis=0) for c in pts)
        shifted_ids = jnp.roll(seg_ids, -shift)
        valid = (idx + shift < n) & (shifted_ids == seg_ids)
        added = ops.add(pts, shifted)
        out = tuple(
            jnp.where(valid.reshape((n,) + (1,) * (c.ndim - 1)), ac, c)
            for ac, c in zip(added, pts)
        )
        return out, None

    points, _ = jax.lax.scan(body, points, shifts)
    return points


def msm_pippenger(ops: JacobianOps, points, scalars_u16, window_bits: int = 8):
    """Pippenger MSM with sort-based bucket accumulation.

    points: Jacobian pytree, leading dim n.
    scalars_u16: (n, 16) uint32 array of 16-bit little-endian scalar limbs
      (natural output of the Fr limb layout, non-Montgomery).
    window_bits must divide 16.
    """
    n = points[0].shape[0]
    num_windows = 256 // window_bits
    per_limb = 16 // window_bits
    wmask = jnp.uint32((1 << window_bits) - 1)

    # window digits: (n, num_windows)
    digs = []
    for w in range(num_windows):
        limb = scalars_u16[:, w // per_limb]
        digs.append((limb >> (window_bits * (w % per_limb))) & wmask)
    digits = jnp.stack(digs, axis=1)

    def one_window(dig_w):
        # sort points by digit; digit 0 contributes nothing
        order = jnp.argsort(dig_w)
        sorted_pts = tuple(c[order] for c in points)
        sorted_dig = dig_w[order]
        summed = _segmented_tree_sum(ops, sorted_pts, sorted_dig)
        # head of each run: first position or digit != previous digit
        idx = jnp.arange(n)
        prev = jnp.roll(sorted_dig, 1)
        is_head = (idx == 0) | (sorted_dig != prev)
        live = is_head & (sorted_dig != 0)
        # scatter heads into bucket slots [0, 2^w): bucket b at slot b
        nbuckets = 1 << window_bits
        slot = jnp.where(live, sorted_dig, nbuckets)  # dead -> overflow slot
        inf = ops.infinity_like(points[0][:1])
        buckets = tuple(
            jnp.broadcast_to(i, (nbuckets + 1,) + c.shape[1:]).at[slot].set(c)
            for i, c in zip(inf, summed)
        )
        buckets = tuple(c[:nbuckets] for c in buckets)
        # running-sum trick: sum_b b * S_b = sum of suffix sums
        def body(carry, bucket):
            running, total = carry
            running = ops.add(running, bucket)
            total = ops.add(total, running)
            return (running, total), None

        inf0 = ops.infinity_like(points[0][0])
        rev = tuple(c[::-1] for c in buckets)  # from top bucket down, skip 0
        rev = tuple(c[:-1] for c in rev)
        (running, total), _ = jax.lax.scan(body, (inf0, inf0), rev)
        return total

    # vmap across windows (each window sorts independently)
    window_sums = jax.vmap(one_window, in_axes=1)(digits)

    # combine: result = sum_w 2^(w*window_bits) * S_w, via Horner as a scan
    def horner(acc, wsum):
        for _ in range(window_bits):
            acc = ops.double(acc)
        return ops.add(acc, wsum), None

    acc = ops.infinity_like(points[0][0])
    rev_sums = tuple(c[::-1] for c in window_sums)  # MSB window first
    acc, _ = jax.lax.scan(horner, acc, rev_sums)
    return acc


def scalars_to_u16_limbs(scalars) -> np.ndarray:
    """Ints -> (n, 16) uint32 array of 16-bit LE limbs (plain, not Montgomery)."""
    arr = np.asarray(scalars, dtype=object).reshape(-1)
    out = np.zeros((arr.shape[0], 16), dtype=np.uint32)
    for i, v in enumerate(arr):
        v = int(v) % R
        for k in range(16):
            out[i, k] = (v >> (16 * k)) & 0xFFFF
    return out
