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
    """Host-precomputed table: entry[w][d] = d * 2^(bw*w) * base, shipped to
    device as Jacobian limb arrays (W, 2^bw, ...).  The per-scalar sum uses
    distinct-operand adds: partial sums occupy disjoint scalar bit-ranges so
    true doublings cannot occur (infinity handled by flags)."""

    def __init__(self, base_affine_int, group: str = "g1", window_bits: int = 8):
        from ..refimpl import curves as rc

        add = rc.g1_add if group == "g1" else rc.g2_add
        to_dev = co.g1_to_device if group == "g1" else co.g2_to_device
        self.group = group
        self.window_bits = window_bits
        self.num_windows = (255 + window_bits - 1) // window_bits
        entries = []
        win_base = base_affine_int
        for w in range(self.num_windows):
            row = [None]
            for d in range(1, 1 << window_bits):
                row.append(add(row[-1], win_base))
            entries.extend(row)
            for _ in range(window_bits):
                win_base = add(win_base, win_base)
        flat = to_dev(entries)
        self.table = tuple(
            c.reshape(self.num_windows, 1 << window_bits, *c.shape[1:]) for c in flat
        )

    def mul(self, ops: JacobianOps, digits):
        """digits: (n, W) int32 window digits (LSB window first) -> (n,) points."""
        digits = jnp.asarray(digits, jnp.int32)
        # gather per window: table[w, digits[:, w]] -> (W, n, ...)
        gathered = tuple(
            jax.vmap(lambda t, d: t[d], in_axes=(0, 1))(c, digits) for c in self.table
        )
        return ops.sum_reduce(gathered, axis=0, distinct=True)

    def digits(self, scalars) -> np.ndarray:
        return scalars_to_window_digits(scalars, self.window_bits, self.num_windows)


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


def msm_pippenger(ops: JacobianOps, points, scalar_limbs, window_bits: int = 8):
    """Pippenger MSM with sort-based bucket accumulation.

    points: Jacobian pytree, leading dim n.
    scalar_limbs: (n, L) little-endian plain (non-Montgomery) Fr limbs in the
      active layout (see scalars_to_limbs).  window_bits must divide the limb
      width.
    """
    from ..params import fr_spec

    lbits = fr_spec().limb_bits
    points = tuple(jnp.asarray(c) for c in points)
    scalar_limbs = jnp.asarray(scalar_limbs)
    n = points[0].shape[0]
    num_windows = 256 // window_bits
    per_limb = lbits // window_bits
    wmask = scalar_limbs.dtype.type((1 << window_bits) - 1)

    # window digits: (n, num_windows)
    digs = []
    for w in range(num_windows):
        limb = scalar_limbs[:, w // per_limb]
        digs.append(((limb >> (window_bits * (w % per_limb))) & wmask).astype(jnp.uint32))
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


def limbs_to_window_digits(limbs, window: int = FB_WINDOW):
    """Device-side: plain LE scalar limbs (..., L) -> (..., 256/window) int32
    window digits, LSB window first (feeds scalar_mul_windowed/msm_var_base)."""
    from ..params import fr_spec

    lbits = fr_spec().limb_bits
    limbs = jnp.asarray(limbs)
    per = lbits // window
    num_windows = 256 // window
    mask = limbs.dtype.type((1 << window) - 1)
    digs = [
        ((limbs[..., w // per] >> (window * (w % per))) & mask).astype(jnp.int32)
        for w in range(num_windows)
    ]
    return jnp.stack(digs, axis=-1)


def scalars_to_limbs(scalars) -> np.ndarray:
    """Ints -> (n, L) plain (non-Montgomery) LE limbs in the active layout."""
    from ..params import fr_spec
    from . import limbs as lb

    arr = np.asarray(scalars, dtype=object) % R
    return lb.ints_to_limbs(arr, fr_spec())



