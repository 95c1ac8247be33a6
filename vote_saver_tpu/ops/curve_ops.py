"""Batched elliptic-curve arithmetic on device (G1/G2 Jacobian, JubJub Edwards).

Replaces crypto3::algebra curve types (SURVEY.md §2B `algebra` row).  Points
are pytrees of limb arrays so they flow through jit/vmap/scan:

  * Jacobian (G1 over Fq, G2 over Fq2): tuple (X, Y, Z); infinity <=> Z == 0
    (canonical infinity is (1, 1, 0)).  Branch-free: both add and double
    results are computed and the correct one selected with `where`, which is
    the XLA-friendly replacement for the reference's data-dependent C++
    branches.
  * Extended twisted Edwards (JubJub over Fr, a = -1): tuple (X, Y, Z, T);
    the a=-1 Hisil–Wong–Carter–Dawson addition is complete on the odd-order
    subgroup, so no selects are needed at all — ideal for TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..params import fr_spec, fq_spec, JUBJUB_D, R
from . import limbs as lb
from .field_ops import fr_ops, fq_ops, FieldOps
from .fq2_ops import fq2_ops, Fq2Ops


class JacobianOps:
    """Short-Weierstrass y^2 = x^3 + b with a = 0, over FieldOps or Fq2Ops.

    On the TPU 16-bit-limb layout the group law dispatches to fused Pallas
    kernels (ops/pallas_field.py) — one kernel per add/double instead of
    ~16 HLO-level Montgomery multiplies; ~8x measured on v5e.
    """

    def __init__(self, f):
        self.f = f
        self._is_fq2 = isinstance(f, Fq2Ops)

    def _pallas(self):
        spec = self.f.fq.spec if self._is_fq2 else self.f.spec
        if spec.limb_bits != 16:
            return None
        import os

        import jax

        if jax.default_backend() != "tpu" and not os.environ.get(
            "VSTPU_PALLAS_INTERPRET"
        ):
            return None
        from . import pallas_field as pf

        if self._is_fq2:
            return (pf.g2_add_pallas, pf.g2_double_pallas)
        return (pf.g1_add_pallas, pf.g1_double_pallas)

    # -- constructors -------------------------------------------------------

    def infinity_like(self, x_coord):
        one = self._one_like(x_coord)
        return (one, one, jnp.zeros_like(one))

    def _one_like(self, x_coord):
        zero = jnp.zeros_like(x_coord)
        if isinstance(self.f, Fq2Ops):
            om = jnp.asarray(self.f.fq.one_mont)
            return zero.at[..., 0, :].set(jnp.broadcast_to(om, zero[..., 0, :].shape))
        om = jnp.asarray(self.f.one_mont)
        return zero.at[..., :].set(jnp.broadcast_to(om, zero.shape))

    def is_inf(self, p):
        return self.f.is_zero(p[2])

    # -- group law ----------------------------------------------------------

    def double(self, p):
        pk = self._pallas()
        if pk is not None:
            return pk[1](p)
        return self._double_xla(p)

    def _double_xla(self, p):
        f = self.f
        x1, y1, z1 = p
        a = f.sq(x1)
        b = f.sq(y1)
        c = f.sq(b)
        d = f.sub(f.sq(f.add(x1, b)), f.add(a, c))
        d = f.add(d, d)
        e = f.add(f.add(a, a), a)
        ff = f.sq(e)
        x3 = f.sub(ff, f.add(d, d))
        c8 = f.add(c, c)
        c8 = f.add(c8, c8)
        c8 = f.add(c8, c8)
        y3 = f.sub(f.mul(e, f.sub(d, x3)), c8)
        z3 = f.mul(f.add(y1, y1), z1)
        return (x3, y3, z3)

    def add(self, p, q):
        """Complete Jacobian addition via compute-both-and-select."""
        pk = self._pallas()
        if pk is not None:
            return pk[0](p, q, complete=True)
        return self._add_xla(p, q)

    def _add_xla(self, p, q):
        f = self.f
        x1, y1, z1 = p
        x2, y2, z2 = q
        z1z1 = f.sq(z1)
        z2z2 = f.sq(z2)
        u1 = f.mul(x1, z2z2)
        u2 = f.mul(x2, z1z1)
        s1 = f.mul(f.mul(y1, z2), z2z2)
        s2 = f.mul(f.mul(y2, z1), z1z1)
        h = f.sub(u2, u1)
        rr = f.sub(s2, s1)
        rr = f.add(rr, rr)
        i = f.sq(f.add(h, h))
        j = f.mul(h, i)
        v = f.mul(u1, i)
        x3 = f.sub(f.sub(f.sq(rr), j), f.add(v, v))
        s1j = f.mul(s1, j)
        y3 = f.sub(f.mul(rr, f.sub(v, x3)), f.add(s1j, s1j))
        z3 = f.mul(f.sub(f.sq(f.add(z1, z2)), f.add(z1z1, z2z2)), h)
        generic = (x3, y3, z3)

        p_inf = self.is_inf(p)
        q_inf = self.is_inf(q)
        h_zero = f.is_zero(h)
        r_zero = f.is_zero(rr)
        dbl = self._double_xla(p)
        inf = self.infinity_like(x1)

        same = h_zero & r_zero & ~p_inf & ~q_inf
        opposite = h_zero & ~r_zero & ~p_inf & ~q_inf

        out = tuple(f.select(same, d, g) for d, g in zip(dbl, generic))
        out = tuple(f.select(opposite, iz, o) for iz, o in zip(inf, out))
        out = tuple(f.select(p_inf, qq, o) for qq, o in zip(q, out))
        out = tuple(f.select(q_inf & ~p_inf, pp, o) for pp, o in zip(p, out))
        return out

    def add_distinct(self, p, q):
        """Jacobian add assuming p != q whenever both are finite (no doubling
        fallback — ~40% cheaper).  Safe for window-decomposition sums where
        partial sums occupy disjoint scalar bit-ranges (fixed-base tables,
        Pippenger bucket combination); NOT safe for arbitrary operands."""
        pk = self._pallas()
        if pk is not None:
            return pk[0](p, q, complete=False)
        f = self.f
        x1, y1, z1 = p
        x2, y2, z2 = q
        z1z1 = f.sq(z1)
        z2z2 = f.sq(z2)
        u1 = f.mul(x1, z2z2)
        u2 = f.mul(x2, z1z1)
        s1 = f.mul(f.mul(y1, z2), z2z2)
        s2 = f.mul(f.mul(y2, z1), z1z1)
        h = f.sub(u2, u1)
        rr = f.sub(s2, s1)
        rr = f.add(rr, rr)
        i = f.sq(f.add(h, h))
        j = f.mul(h, i)
        v = f.mul(u1, i)
        x3 = f.sub(f.sub(f.sq(rr), j), f.add(v, v))
        s1j = f.mul(s1, j)
        y3 = f.sub(f.mul(rr, f.sub(v, x3)), f.add(s1j, s1j))
        z3 = f.mul(f.sub(f.sq(f.add(z1, z2)), f.add(z1z1, z2z2)), h)
        out = (x3, y3, z3)
        p_inf = self.is_inf(p)
        q_inf = self.is_inf(q)
        out = tuple(f.select(p_inf, qq, o) for qq, o in zip(q, out))
        out = tuple(f.select(q_inf & ~p_inf, pp, o) for pp, o in zip(p, out))
        return out

    def neg(self, p):
        return (p[0], self.f.neg(p[1]), p[2])

    def select(self, cond, p, q):
        return tuple(self.f.select(cond, a, b) for a, b in zip(p, q))

    # -- helpers ------------------------------------------------------------

    def scalar_mul_bits(self, p, bits_msb_first):
        """p * k with k given as a (..., nbits) uint32 bit array (MSB first).

        Batched: p coords and bits broadcast over leading dims.
        """
        bits = jnp.asarray(bits_msb_first, jnp.uint32)
        acc = self.infinity_like(p[0])

        def body(acc, bit):
            acc = self.double(acc)
            added = self.add(acc, p)
            return self.select(bit == 1, added, acc), None

        # scan over the bit axis (moved to front)
        bits_t = jnp.moveaxis(bits, -1, 0)
        acc, _ = jax.lax.scan(body, acc, bits_t)
        return acc

    def scalar_mul_windowed(self, p, digits_lsb_first, window: int = 4):
        """p * k with k as (..., W) int32 base-2^window digits, LSB window first.

        Much cheaper to compile and run than bit-at-a-time: a 16-entry
        multiples table (15 unrolled adds) then a W-step scan whose body is
        `window` doublings + one table-lookup add.
        """
        digits = jnp.asarray(digits_lsb_first, jnp.int32)
        nentries = 1 << window
        # table[d] = d * p, for d = 0..2^w-1, built by a scan (one add instance)
        inf = self.infinity_like(p[0])

        def tab_body(acc, _):
            nxt = self.add(acc, p)
            return nxt, nxt

        _, rest = jax.lax.scan(tab_body, p, None, length=nentries - 2)
        table = tuple(
            jnp.concatenate([jnp.stack([i, pc], axis=0), r], axis=0)
            for i, pc, r in zip(inf, p, rest)
        )

        def lookup(dig):
            # dig: (...) int32 -> gather per-lane table entries
            def take(tc):
                idx = dig.reshape((1,) + dig.shape + (1,) * (tc.ndim - 1 - dig.ndim))
                return jnp.take_along_axis(tc, idx, axis=0)[0]

            return tuple(take(tc) for tc in table)

        def body(acc, dig):
            acc = jax.lax.fori_loop(0, window, lambda _i, a: self.double(a), acc)
            return self.add(acc, lookup(dig)), None

        acc = self.infinity_like(p[0])
        digits_t = jnp.moveaxis(digits, -1, 0)[::-1]  # MSB window first
        acc, _ = jax.lax.scan(body, acc, digits_t)
        return acc

    def sum_reduce(self, p, axis=0, distinct=False):
        """Log-depth sum of points over `axis` via a Hillis–Steele scan.

        One `add` instance in the scan body (compile-friendly); step s adds
        points[i + 2^s] into points[i], so after ceil(log2 n) steps index 0
        holds the total.  distinct=True uses the cheaper no-doubling add
        (valid when all partial sums are provably distinct, e.g. window
        decompositions).
        """
        adder = self.add_distinct if distinct else self.add
        coords = tuple(jnp.moveaxis(c, axis, 0) for c in p)
        n = coords[0].shape[0]
        if n == 1:
            return tuple(c[0] for c in coords)
        steps = max(1, (n - 1).bit_length())
        shifts = jnp.asarray([1 << s for s in range(steps)], jnp.int32)
        idx = jnp.arange(n)

        def body(pts, shift):
            shifted = tuple(jnp.roll(c, -shift, axis=0) for c in pts)
            valid = idx + shift < n
            added = adder(pts, shifted)
            out = tuple(
                jnp.where(valid.reshape((n,) + (1,) * (c.ndim - 1)), ac, c)
                for ac, c in zip(added, pts)
            )
            return out, None

        coords, _ = jax.lax.scan(body, coords, shifts)
        return tuple(c[0] for c in coords)

    def to_affine(self, p):
        """Single or batched; uses per-element Fermat inversion.  Infinity
        maps to (0, 0) (callers check is_inf separately)."""
        f = self.f
        x, y, z = p
        zinv = f.inv(z)
        zinv2 = f.sq(zinv)
        ax = f.mul(x, zinv2)
        ay = f.mul(y, f.mul(zinv, zinv2))
        inf = self.is_inf(p)
        return (f.select(inf, jnp.zeros_like(ax), ax), f.select(inf, jnp.zeros_like(ay), ay))


@functools.cache
def g1_ops() -> JacobianOps:
    return JacobianOps(fq_ops())


@functools.cache
def g2_ops() -> JacobianOps:
    return JacobianOps(fq2_ops())


# ---------------------------------------------------------------------------
# JubJub extended twisted Edwards (a = -1), complete addition, no selects.
# ---------------------------------------------------------------------------


class EdwardsOps:
    def __init__(self):
        self.f = fr_ops()
        spec = fr_spec()
        self.k2d = np.array(spec.to_limbs(spec.to_mont(2 * JUBJUB_D % R)), dtype=np.uint32)

    def identity_like(self, x_coord):
        zero = jnp.zeros_like(x_coord)
        one = zero.at[..., :].set(jnp.broadcast_to(jnp.asarray(self.f.one_mont), zero.shape))
        return (zero, one, one, zero)

    def add(self, p, q):
        f = self.f
        x1, y1, z1, t1 = p
        x2, y2, z2, t2 = q
        a = f.mul(f.sub(y1, x1), f.sub(y2, x2))
        b = f.mul(f.add(y1, x1), f.add(y2, x2))
        c = f.mul(f.mul(t1, t2), jnp.asarray(self.k2d))
        d = f.mul(z1, z2)
        d = f.add(d, d)
        e = f.sub(b, a)
        ff = f.sub(d, c)
        g = f.add(d, c)
        h = f.add(b, a)
        return (f.mul(e, ff), f.mul(g, h), f.mul(ff, g), f.mul(e, h))

    def sum_reduce(self, p, axis=0):
        """Log-depth Hillis–Steele sum over `axis` (complete addition, so the
        only masking needed is leaving out-of-range lanes unchanged)."""
        coords = tuple(jnp.moveaxis(c, axis, 0) for c in p)
        n = coords[0].shape[0]
        if n == 1:
            return tuple(c[0] for c in coords)
        steps = max(1, (n - 1).bit_length())
        shifts = jnp.asarray([1 << s for s in range(steps)], jnp.int32)
        idx = jnp.arange(n)

        def body(pts, shift):
            shifted = tuple(jnp.roll(c, -shift, axis=0) for c in pts)
            valid = idx + shift < n
            added = self.add(pts, shifted)
            out = tuple(
                jnp.where(valid.reshape((n,) + (1,) * (c.ndim - 1)), ac, c)
                for ac, c in zip(added, pts)
            )
            return out, None

        coords, _ = jax.lax.scan(body, coords, shifts)
        return tuple(c[0] for c in coords)

    def to_affine(self, p):
        f = self.f
        x, y, z, _ = p
        zinv = f.inv(z)
        return (f.mul(x, zinv), f.mul(y, zinv))


@functools.cache
def jj_ops() -> EdwardsOps:
    return EdwardsOps()


# ---------------------------------------------------------------------------
# Host <-> device point converters
# ---------------------------------------------------------------------------


def g1_to_device(points):
    """List of affine int points / None -> Jacobian mont limb arrays (n, L)."""
    spec = fq_spec()
    xs = [p[0] if p is not None else 1 for p in points]
    ys = [p[1] if p is not None else 1 for p in points]
    zs = [1 if p is not None else 0 for p in points]
    return (
        lb.ints_to_mont_limbs(xs, spec),
        lb.ints_to_mont_limbs(ys, spec),
        lb.ints_to_mont_limbs(zs, spec),
    )


def g2_to_device(points):
    spec = fq_spec()
    zero2, one2 = (0, 0), (1, 0)
    xs = [p[0] if p is not None else one2 for p in points]
    ys = [p[1] if p is not None else one2 for p in points]
    zs = [one2 if p is not None else zero2 for p in points]
    return (
        lb.ints_to_mont_limbs(xs, spec),
        lb.ints_to_mont_limbs(ys, spec),
        lb.ints_to_mont_limbs(zs, spec),
    )


_AFF_CHUNK = 2048
_aff_jit: dict = {}


def _affine_chunked(p, fq2: bool):
    """Device batched Jacobian->affine (Fermat inversion on device), chunked
    to one static shape so repeat calls reuse the compiled program.  Returns
    (ax, ay, is_inf) numpy limb arrays."""
    ops = g2_ops() if fq2 else g1_ops()
    key = "g2" if fq2 else "g1"
    if key not in _aff_jit:
        _aff_jit[key] = jax.jit(lambda pt: (*ops.to_affine(pt), ops.is_inf(pt)))
    fn = _aff_jit[key]
    want = 3 if fq2 else 2
    coords = tuple(
        (lambda a: a[None] if a.ndim < want else a)(np.asarray(c)) for c in p
    )
    n = coords[0].shape[0]
    outs = []
    for off in range(0, n, _AFF_CHUNK):
        chunk = tuple(c[off : off + _AFF_CHUNK] for c in coords)
        pad = _AFF_CHUNK - chunk[0].shape[0] if n > _AFF_CHUNK else 0
        if pad:
            chunk = tuple(np.pad(c, ((0, pad),) + ((0, 0),) * (c.ndim - 1)) for c in chunk)
        ax, ay, inf = fn(chunk)
        take = chunk[0].shape[0] - pad
        outs.append((np.asarray(ax)[:take], np.asarray(ay)[:take], np.asarray(inf)[:take]))
    return (
        np.concatenate([o[0] for o in outs]),
        np.concatenate([o[1] for o in outs]),
        np.concatenate([o[2] for o in outs]),
    )


def _jacobian_from_device(p, spec, fq2: bool):
    lead = np.asarray(p[0]).shape
    big = (lead[0] if len(lead) > (2 if fq2 else 1) else 1) >= 64
    if big:
        ax, ay, inf = _affine_chunked(p, fq2)
        xs = lb.mont_limbs_to_ints(ax, spec)
        ys = lb.mont_limbs_to_ints(ay, spec)
        out = []
        for i in range(ax.shape[0]):
            if bool(inf[i]):
                out.append(None)
            elif fq2:
                out.append((tuple(int(v) for v in xs[i]), tuple(int(v) for v in ys[i])))
            else:
                out.append((int(xs[i]), int(ys[i])))
        return out
    xs = lb.mont_limbs_to_ints(np.asarray(p[0]), spec)
    ys = lb.mont_limbs_to_ints(np.asarray(p[1]), spec)
    zs = lb.mont_limbs_to_ints(np.asarray(p[2]), spec)
    xs, ys, zs = (np.atleast_1d(np.asarray(a, dtype=object)) for a in (xs, ys, zs))
    from ..refimpl import field as rf
    from ..params import Q

    out = []
    n = xs.shape[0]
    for i in range(n):
        if fq2:
            z = tuple(int(v) for v in zs[i])
            if z == (0, 0):
                out.append(None)
                continue
            zi = rf.fq2_inv(z)
            zi2 = rf.fq2_sq(zi)
            x = rf.fq2_mul(tuple(int(v) for v in xs[i]), zi2)
            y = rf.fq2_mul(tuple(int(v) for v in ys[i]), rf.fq2_mul(zi, zi2))
            out.append((x, y))
        else:
            z = int(zs[i])
            if z == 0:
                out.append(None)
                continue
            zi = pow(z, Q - 2, Q)
            out.append((int(xs[i]) * zi * zi % Q, int(ys[i]) * zi * zi % Q * zi % Q))
    return out


def g1_from_device(p):
    """Jacobian device point(s) -> list of affine int points / None."""
    return _jacobian_from_device(p, fq_spec(), fq2=False)


def g2_from_device(p):
    return _jacobian_from_device(p, fq_spec(), fq2=True)


def jj_to_device(points):
    """List of affine Edwards int points -> extended mont limb arrays."""
    spec = fr_spec()
    xs = [p[0] for p in points]
    ys = [p[1] for p in points]
    ts = [p[0] * p[1] % R for p in points]
    ones = [1] * len(points)
    return (
        lb.ints_to_mont_limbs(xs, spec),
        lb.ints_to_mont_limbs(ys, spec),
        lb.ints_to_mont_limbs(ones, spec),
        lb.ints_to_mont_limbs(ts, spec),
    )


def jj_from_device(p):
    spec = fr_spec()
    xs = lb.mont_limbs_to_ints(np.asarray(p[0]), spec)
    ys = lb.mont_limbs_to_ints(np.asarray(p[1]), spec)
    zs = lb.mont_limbs_to_ints(np.asarray(p[2]), spec)
    xs, ys, zs = (np.atleast_1d(np.asarray(a, dtype=object)) for a in (xs, ys, zs))
    out = []
    for i in range(xs.shape[0]):
        zi = pow(int(zs[i]), R - 2, R)
        out.append((int(xs[i]) * zi % R, int(ys[i]) * zi % R))
    return out


def scalars_to_bits_msb(scalars, nbits=255) -> np.ndarray:
    """Ints -> (n, nbits) uint32 bit array, MSB first (for scalar_mul_bits)."""
    arr = np.asarray(scalars, dtype=object).reshape(-1)
    out = np.zeros((arr.shape[0], nbits), dtype=np.uint32)
    for i, v in enumerate(arr):
        v = int(v)
        for k in range(nbits):
            out[i, nbits - 1 - k] = (v >> k) & 1
    return out
