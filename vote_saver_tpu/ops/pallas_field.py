"""Fused Pallas TPU kernels for Montgomery field & Jacobian curve arithmetic.

The XLA path in :mod:`field_ops` expresses one Montgomery multiply as ~10
separate HLO ops plus an L-step ``lax.scan`` — the scan serialises the VPU and
every op round-trips HBM.  Here a whole curve-group operation (16+ field muls)
runs inside ONE Pallas kernel.

Layout (v2): the batch is a 2-D ``(S, T)`` tile — S sublanes x T lanes — so
every per-limb vector op runs at full (8, 128) vreg density.  (The v1 kernels
kept the batch 1-D on the lane axis only, leaving 7/8 of each vreg empty and
accumulating through a VMEM scratch ref with sublane-unaligned slice
read-modify-writes; measured 41 M fq-mul/s on a v5e.  The value-resident
accumulator below is a Python list of (S, T) vregs — no scratch traffic, no
unaligned sublane ops.)  Limbs are unrolled with static offsets; carries are
lazy: 16-bit limb products accumulate into < 2^23 column sums with one ripple
pass per field op.

Replaces the hot ops behind the reference's single-threaded multiexp
(reference: bin/cli/include/nil/vote_saver/common.hpp:916,1132 and the
multiexp params at common.hpp:38-39) — design per SURVEY.md §7 "hard parts"
item 1/2 and docs/ROADMAP.md round-2 item 1.

Layout contract: public entry points take/return the framework-standard
``(..., L)`` uint32 limb arrays (16-bit limbs, Montgomery form); transposition
to the kernel layout happens at the pallas_call boundary (bandwidth-only).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..params import FieldSpec, fq_spec, fr_spec


def _tile_s() -> int:
    # off-TPU (interpret mode) a 1-sublane tile keeps small test batches from
    # padding to 1024 elements; on hardware 8 sublanes = full vreg density
    return int(os.environ.get("VSTPU_TILE_S", "8" if not _interpret() else "1"))


def _tile_t() -> int:
    return int(os.environ.get("VSTPU_TILE_T", "128"))


def _interpret() -> bool:
    """Run kernels in interpreter mode off-TPU (CPU tests)."""
    if os.environ.get("VSTPU_PALLAS_INTERPRET"):
        return True
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# In-kernel emitters: ops on (L, S, T) uint32 values, 16-bit limbs, unrolled.
# ---------------------------------------------------------------------------


class FqEmit:
    """Emits unrolled Montgomery arithmetic on (L, S, T) values in a kernel.

    Element values are canonical ([0, N)) at op boundaries; within one multiply
    the column accumulator is lazy (sums < 2^23 in uint32) and lives entirely
    in vregs (a Python list of (S, T) values).
    """

    def __init__(self, spec: FieldSpec):
        assert spec.limb_bits == 16, "pallas path is the 16-bit-limb TPU layout"
        self.spec = spec
        self.L = spec.num_limbs
        self.mask = np.uint32(spec.mask)
        self.n0inv = np.uint32(spec.n0_inv)
        self.n_ints = [int(v) for v in spec.to_limbs(spec.modulus)]
        self.one_ints = [int(v) for v in spec.to_limbs(spec.to_mont(1))]

    # -- helpers ------------------------------------------------------------

    def _ripple(self, rows):
        """List of L (S, T) lazy columns (< 2^23) -> list of L canonical limbs.
        Any final carry is dropped (callers guarantee value < 2^(16L))."""
        out = []
        c = jnp.zeros_like(rows[0])
        for k in range(self.L):
            t = rows[k] + c
            out.append(t & self.mask)
            c = t >> 16
        return out

    def _csub_n(self, rows):
        """Canonical limbs, value < 2N -> value < N (conditional subtract)."""
        borrow = jnp.zeros_like(rows[0])
        diff = []
        for k in range(self.L):
            t = rows[k] - np.uint32(self.n_ints[k]) - borrow
            diff.append(t & self.mask)
            borrow = (t >> 16) & np.uint32(1)
        ge = borrow == 0  # no borrow -> value >= N -> keep the difference
        return [jnp.where(ge, d, r) for d, r in zip(diff, rows)]

    @staticmethod
    def _stack(rows):
        return jnp.stack(rows, axis=0)

    @staticmethod
    def _rows(x):
        return [x[k] for k in range(x.shape[0])]

    # -- field ops ----------------------------------------------------------

    def mul(self, a, b):
        """Montgomery product on (L, S, T) canonical values (CIOS, lazy)."""
        L, mask = self.L, self.mask
        ar = self._rows(a)
        br = self._rows(b)
        zero = jnp.zeros_like(ar[0])
        acc = [zero] * (2 * L)
        # product phase: column c accumulates sum_{i+j=c} a_i*b_j (lazy)
        for i in range(L):
            ai = ar[i]
            for j in range(L):
                p = ai * br[j]  # exact: 16x16-bit products in uint32
                acc[i + j] = acc[i + j] + (p & mask)
                acc[i + j + 1] = acc[i + j + 1] + (p >> 16)
        # Montgomery reduction: L unrolled steps, static offsets
        n = [np.uint32(v) for v in self.n_ints]
        for r in range(L):
            m = (acc[r] * self.n0inv) & mask
            for k in range(L):
                p = m * n[k]
                acc[r + k] = acc[r + k] + (p & mask)
                acc[r + k + 1] = acc[r + k + 1] + (p >> 16)
            acc[r + 1] = acc[r + 1] + (acc[r] >> 16)
        rows = self._ripple(acc[L : 2 * L])
        return self._stack(self._csub_n(rows))

    def sq(self, a):
        return self.mul(a, a)

    def add(self, a, b):
        s = a + b
        rows = self._ripple(self._rows(s))
        return self._stack(self._csub_n(rows))

    def dbl(self, a):
        return self.add(a, a)

    def sub(self, a, b):
        borrow = jnp.zeros_like(a[0])
        diff = []
        for k in range(self.L):
            t = a[k] - b[k] - borrow
            diff.append(t & self.mask)
            borrow = (t >> 16) & np.uint32(1)
        # on borrow, add N back (the carry out of the top limb cancels it)
        fixed, c = [], jnp.zeros_like(a[0])
        for k in range(self.L):
            t = diff[k] + np.uint32(self.n_ints[k]) + c
            fixed.append(t & self.mask)
            c = t >> 16
        neg = borrow == 1
        return self._stack([jnp.where(neg, f, d) for f, d in zip(fixed, diff)])

    def is_zero(self, a):
        z = a[0] == 0
        for k in range(1, self.L):
            z = z & (a[k] == 0)
        return z

    def select(self, cond, a, b):
        """cond: (S, T) bool -> where(cond, a, b) on (L, S, T) values."""
        return jnp.where(cond[None], a, b)

    def zero_like(self, a):
        return jnp.zeros_like(a)

    def one_like(self, a):
        return jnp.stack(
            [jnp.full(a.shape[1:], v, jnp.uint32) for v in self.one_ints]
        )


class FqEmitFold(FqEmit):
    """FqEmit with the matmul-fold multiplier (ops/fold_mul.py): the product
    phase is exact-f32 digit FMAs and the whole Montgomery reduction is one
    bf16 matmul against a constant fold matrix (rides the MXU inside the
    kernel).  The matrix arrives as an extra kernel input; the kernel body
    sets ``self.fold`` to its (nbytes, rows) bf16 value.  Select with
    VSTPU_MUL=fold (docs/ROADMAP.md round-2 item 2)."""

    def __init__(self, spec: FieldSpec):
        super().__init__(spec)
        from . import fold_mul as fm

        self._fm = fm
        self.plan = fm.plan(spec)
        self.fold = None  # (nbytes, rows) bf16, set by the kernel body

    def _digits(self, x):
        """(L, S, T) u32 16-bit limbs -> nd (S, T) f32 8-bit digits."""
        out = []
        for k in range(self.plan["nd"]):
            limb = x[k // 2]
            d = (limb >> (8 * (k % 2))) & np.uint32(255)
            out.append(d.astype(jnp.int32).astype(jnp.float32))
        return out

    def _mul_cols(self, cols):
        fm = self._fm
        rows = fm.fold_columns(self.plan, cols, self.fold)
        return self._stack(fm.csub_rows(self.plan, rows))

    def mul(self, a, b):
        fm = self._fm
        return self._mul_cols(
            fm.product_columns(self.plan, self._digits(a), self._digits(b))
        )

    def sq(self, a):
        return self._mul_cols(self._fm.square_columns(self.plan, self._digits(a)))


class FqEmitLoop(FqEmit):
    """FqEmit with the multiply rolled into a lax.fori_loop (loop-CIOS).

    The classic CIOS formulation carries a running (L+1)-limb lazy state t:
    iteration i adds a_i * b and m_i * N (m_i = t[0] * n0inv mod 2^16), then
    shifts one limb down.  The body is ~2L MACs compiled ONCE instead of the
    unrolled form's L^2 straight-line products — measured IDENTICAL runtime
    on a v5e (89.0 vs 89.4 M mul/s, scripts/micro_cios_loop.py) at ~10x less
    Mosaic compile time, which collapses the fused-kernel compile wall
    (round-4 VERDICT item 4: the G2 madd program alone was ~410-560 s of
    every cold start).  Mosaic cannot lower dynamic_slice on in-kernel
    values, so a's limbs are consumed by rotation (static slice + concat).

    Overflow bounds: per iteration each lazy limb gains at most 4 terms
    < 2^16 plus the shifted-down neighbour; over L = 16 iterations the state
    stays < 2^22, far under uint32.  The final value is < 2N (standard CIOS
    bound), restored canonical by the shared ripple + csub."""

    def mul(self, a, b):
        L, mask = self.L, self.mask
        n = [np.uint32(v) for v in self.n_ints]
        n0inv = self.n0inv
        zero = jnp.zeros_like(a[0])
        t0 = jnp.zeros((L + 1,) + a.shape[1:], jnp.uint32)

        def body(_i, carry):
            t, a_rot = carry
            ai = a_rot[0]
            rows = [t[j] for j in range(L + 1)]
            for j in range(L):
                p = ai * b[j]
                rows[j] = rows[j] + (p & mask)
                rows[j + 1] = rows[j + 1] + (p >> 16)
            m = (rows[0] * n0inv) & mask
            for j in range(L):
                p = m * n[j]
                rows[j] = rows[j] + (p & mask)
                rows[j + 1] = rows[j + 1] + (p >> 16)
            carry_w = rows[0] >> 16
            shifted = [rows[1] + carry_w] + rows[2:] + [zero]
            return jnp.stack(shifted), jnp.concatenate([a_rot[1:], a_rot[:1]])

        t, _ = jax.lax.fori_loop(0, L, body, (t0, a))
        rows = self._ripple([t[j] for j in range(L)])
        return self._stack(self._csub_n(rows))


def _mul_mode() -> str:
    return os.environ.get("VSTPU_MUL", "loop")


def _make_emit(spec: FieldSpec, mode: str) -> "FqEmit":
    if mode == "fold":
        return FqEmitFold(spec)
    if mode == "v1":
        return FqEmit(spec)
    return FqEmitLoop(spec)


def _fold_inputs(emit):
    """(extra kernel inputs, extra in_specs, binder) for the fold matrix —
    empty for the v1 emitter, one (nbytes, rows) bf16 input for fold mode."""
    if not isinstance(emit, FqEmitFold):
        return (), (), lambda ref: None

    mat_t = jnp.asarray(np.ascontiguousarray(emit.plan["mat"].T), jnp.bfloat16)
    spec = pl.BlockSpec(mat_t.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)

    def bind(ref):
        emit.fold = ref[:]

    return (mat_t,), (spec,), bind


class Fq2Emit:
    """Fq2 = Fq[u]/(u^2+1) on pairs (c0, c1) of (L, S, T) values (Karatsuba)."""

    def __init__(self, fq: FqEmit):
        self.fq = fq

    def mul(self, a, b):
        f = self.fq
        t0 = f.mul(a[0], b[0])
        t1 = f.mul(a[1], b[1])
        t2 = f.mul(f.add(a[0], a[1]), f.add(b[0], b[1]))
        return (f.sub(t0, t1), f.sub(t2, f.add(t0, t1)))

    def sq(self, a):
        f = self.fq
        t0 = f.mul(f.add(a[0], a[1]), f.sub(a[0], a[1]))
        t1 = f.mul(a[0], a[1])
        return (t0, f.add(t1, t1))

    def add(self, a, b):
        return (self.fq.add(a[0], b[0]), self.fq.add(a[1], b[1]))

    def dbl(self, a):
        return self.add(a, a)

    def sub(self, a, b):
        return (self.fq.sub(a[0], b[0]), self.fq.sub(a[1], b[1]))

    def is_zero(self, a):
        return self.fq.is_zero(a[0]) & self.fq.is_zero(a[1])

    def select(self, cond, a, b):
        return (self.fq.select(cond, a[0], b[0]), self.fq.select(cond, a[1], b[1]))

    def zero_like(self, a):
        return (self.fq.zero_like(a[0]), self.fq.zero_like(a[1]))

    def one_like(self, a):
        return (self.fq.one_like(a[0]), self.fq.zero_like(a[0]))


# ---------------------------------------------------------------------------
# Jacobian group-law formulas over an emitter (shared by G1/Fq and G2/Fq2).
# Identical math to curve_ops.JacobianOps (a = 0 short Weierstrass).
# ---------------------------------------------------------------------------


def _jac_double(f, p):
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


def _jac_addx(f, p, q):
    """Distinct-assumption Jacobian add WITH a doubling-corner flag.

    Computes only the generic add (12 Fq muls — the complete formula's ~25
    with the inline double dominate the MSM combination phases), handles
    infinity operands, lets the `h == 0, r != 0` opposite case fall out
    naturally as `z3 == 0`, and FLAGS the measure-zero `p == q` corner
    (h == 0, r == 0, both finite) instead of paying the doubling branch.
    Callers OR the flag into the scheduled MSM's exceptional output, which
    already triggers the complete-formula fallback (ops/msm_sched.py).
    """
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
    p_inf = f.is_zero(z1)
    q_inf = f.is_zero(z2)
    exceptional = (
        f.is_zero(h) & f.is_zero(rr) & ~p_inf & ~q_inf
    )
    out = tuple(f.select(p_inf, qq, o) for qq, o in zip(q, out))
    out = tuple(f.select(q_inf & ~p_inf, pp, o) for pp, o in zip(p, out))
    return out, exceptional


def _jac_add(f, p, q, complete: bool):
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

    p_inf = f.is_zero(z1)
    q_inf = f.is_zero(z2)
    if complete:
        h_zero = f.is_zero(h)
        r_zero = f.is_zero(rr)
        same = h_zero & r_zero & ~p_inf & ~q_inf
        opposite = h_zero & ~r_zero & ~p_inf & ~q_inf
        dbl = _jac_double(f, p)
        one = f.one_like(x1)
        inf = (one, one, f.zero_like(x1))
        out = tuple(f.select(same, d, g) for d, g in zip(dbl, out))
        out = tuple(f.select(opposite, iz, o) for iz, o in zip(inf, out))
    out = tuple(f.select(p_inf, qq, o) for qq, o in zip(q, out))
    out = tuple(f.select(q_inf & ~p_inf, pp, o) for pp, o in zip(p, out))
    return out


# ---------------------------------------------------------------------------
# pallas_call wrappers.  I/O uses the framework layout:
#   G1 coord: (B, L) uint32;  G2 coord: (B, 2, L) uint32.
# Kernels see (L, S, T) / (2, L, S, T) blocks; the batch tiles over the grid
# on the sublane axis ((S, T) = full-density vregs).
# ---------------------------------------------------------------------------


def _g1_spec(s, t):
    L = fq_spec().num_limbs
    return pl.BlockSpec((L, s, t), lambda i: (0, i, 0), memory_space=pltpu.VMEM)


def _g2_spec(s, t):
    L = fq_spec().num_limbs
    return pl.BlockSpec(
        (2, L, s, t), lambda i: (0, 0, i, 0), memory_space=pltpu.VMEM
    )


def _flag_spec(s, t):
    return pl.BlockSpec((2, s, t), lambda i: (0, i, 0), memory_space=pltpu.VMEM)


def _exc_spec(s, t):
    return pl.BlockSpec((s, t), lambda i: (i, 0), memory_space=pltpu.VMEM)


def _c2(x):  # (2, L, S, T) -> ((L,S,T), (L,S,T))
    return (x[0], x[1])


def _geom(b: int):
    """(S, T, ntiles) covering a batch of b elements."""
    s, t = _tile_s(), _tile_t()
    per = s * t
    ntiles = max(1, -(-b // per))
    return s, t, ntiles


def _to_kernel_layout(coord, s, t, ntiles, g2: bool):
    """(B, L) -> (L, ntiles*S, T) or (B, 2, L) -> (2, L, ntiles*S, T)."""
    b = coord.shape[0]
    pad = ntiles * s * t - b
    x = jnp.moveaxis(coord, 0, -1)  # (L, B) / (2, L, B)
    widths = [(0, 0)] * (x.ndim - 1) + [(0, pad)]
    if pad:
        x = jnp.pad(x, widths)
    return x.reshape(*x.shape[:-1], ntiles * s, t)


def _from_kernel_layout(arr, b: int):
    """(L, S_tot, T) -> (B, L)   (or (2, L, S_tot, T) -> (B, 2, L))."""
    x = arr.reshape(*arr.shape[:-2], -1)[..., :b]
    return jnp.moveaxis(x, -1, 0)


@functools.cache
def _g1_add_call(ntiles: int, s: int, t: int, complete: bool, mode: str = "v1"):
    emit = _make_emit(fq_spec(), mode)
    L = emit.L
    extras, extra_specs, bind = _fold_inputs(emit)
    ne = len(extras)

    def kernel(*refs):
        bind(refs[6]) if ne else None
        p = tuple(r[:] for r in refs[0:3])
        q = tuple(r[:] for r in refs[3:6])
        rx, ry, rz = _jac_add(emit, p, q, complete)
        for oref, val in zip(refs[6 + ne : 9 + ne], (rx, ry, rz)):
            oref[:] = val

    shp = jax.ShapeDtypeStruct((L, ntiles * s, t), jnp.uint32)
    call = pl.pallas_call(
        kernel,
        grid=(ntiles,),
        in_specs=[_g1_spec(s, t)] * 6 + list(extra_specs),
        out_specs=(_g1_spec(s, t),) * 3,
        out_shape=(shp,) * 3,
        interpret=_interpret(),
    )
    return lambda *ins: call(*ins, *extras)


@functools.cache
def _g1_dbl_call(ntiles: int, s: int, t: int, mode: str = "v1"):
    emit = _make_emit(fq_spec(), mode)
    L = emit.L
    extras, extra_specs, bind = _fold_inputs(emit)
    ne = len(extras)

    def kernel(*refs):
        bind(refs[3]) if ne else None
        rx, ry, rz = _jac_double(emit, tuple(r[:] for r in refs[0:3]))
        for oref, val in zip(refs[3 + ne : 6 + ne], (rx, ry, rz)):
            oref[:] = val

    shp = jax.ShapeDtypeStruct((L, ntiles * s, t), jnp.uint32)
    call = pl.pallas_call(
        kernel,
        grid=(ntiles,),
        in_specs=[_g1_spec(s, t)] * 3 + list(extra_specs),
        out_specs=(_g1_spec(s, t),) * 3,
        out_shape=(shp,) * 3,
        interpret=_interpret(),
    )
    return lambda *ins: call(*ins, *extras)


@functools.cache
def _g2_add_call(ntiles: int, s: int, t: int, complete: bool, mode: str = "v1"):
    inner = _make_emit(fq_spec(), mode)
    emit = Fq2Emit(inner)
    L = inner.L
    extras, extra_specs, bind = _fold_inputs(inner)
    ne = len(extras)

    def kernel(*refs):
        bind(refs[6]) if ne else None
        p = tuple(_c2(r[:]) for r in refs[0:3])
        q = tuple(_c2(r[:]) for r in refs[3:6])
        r = _jac_add(emit, p, q, complete)
        for oref, val in zip(refs[6 + ne : 9 + ne], r):
            oref[:] = jnp.stack(val, axis=0)

    shp = jax.ShapeDtypeStruct((2, L, ntiles * s, t), jnp.uint32)
    call = pl.pallas_call(
        kernel,
        grid=(ntiles,),
        in_specs=[_g2_spec(s, t)] * 6 + list(extra_specs),
        out_specs=(_g2_spec(s, t),) * 3,
        out_shape=(shp,) * 3,
        interpret=_interpret(),
    )
    return lambda *ins: call(*ins, *extras)


@functools.cache
def _g2_dbl_call(ntiles: int, s: int, t: int, mode: str = "v1"):
    inner = _make_emit(fq_spec(), mode)
    emit = Fq2Emit(inner)
    L = inner.L
    extras, extra_specs, bind = _fold_inputs(inner)
    ne = len(extras)

    def kernel(*refs):
        bind(refs[3]) if ne else None
        p = tuple(_c2(r[:]) for r in refs[0:3])
        r = _jac_double(emit, p)
        for oref, val in zip(refs[3 + ne : 6 + ne], r):
            oref[:] = jnp.stack(val, axis=0)

    shp = jax.ShapeDtypeStruct((2, L, ntiles * s, t), jnp.uint32)
    call = pl.pallas_call(
        kernel,
        grid=(ntiles,),
        in_specs=[_g2_spec(s, t)] * 3 + list(extra_specs),
        out_specs=(_g2_spec(s, t),) * 3,
        out_shape=(shp,) * 3,
        interpret=_interpret(),
    )
    return lambda *ins: call(*ins, *extras)


@functools.cache
def _g1_addx_call(ntiles: int, s: int, t: int, mode: str = "v1"):
    emit = _make_emit(fq_spec(), mode)
    L = emit.L
    extras, extra_specs, bind = _fold_inputs(emit)
    ne = len(extras)

    def kernel(*refs):
        bind(refs[6]) if ne else None
        p = tuple(r[:] for r in refs[0:3])
        q = tuple(r[:] for r in refs[3:6])
        (rx, ry, rz), exc = _jac_addx(emit, p, q)
        ox, oy, oz, oexc = refs[6 + ne : 10 + ne]
        ox[:], oy[:], oz[:] = rx, ry, rz
        oexc[:] = jnp.where(exc, jnp.uint32(1), jnp.uint32(0))

    shp = jax.ShapeDtypeStruct((L, ntiles * s, t), jnp.uint32)
    eshp = jax.ShapeDtypeStruct((ntiles * s, t), jnp.uint32)
    call = pl.pallas_call(
        kernel,
        grid=(ntiles,),
        in_specs=[_g1_spec(s, t)] * 6 + list(extra_specs),
        out_specs=(_g1_spec(s, t),) * 3 + (_exc_spec(s, t),),
        out_shape=(shp,) * 3 + (eshp,),
        interpret=_interpret(),
    )
    return lambda *ins: call(*ins, *extras)


@functools.cache
def _g2_addx_call(ntiles: int, s: int, t: int, mode: str = "v1"):
    inner = _make_emit(fq_spec(), mode)
    emit = Fq2Emit(inner)
    L = inner.L
    extras, extra_specs, bind = _fold_inputs(inner)
    ne = len(extras)

    def kernel(*refs):
        bind(refs[6]) if ne else None
        p = tuple(_c2(r[:]) for r in refs[0:3])
        q = tuple(_c2(r[:]) for r in refs[3:6])
        (rx, ry, rz), exc = _jac_addx(emit, p, q)
        for oref, val in zip(refs[6 + ne : 9 + ne], (rx, ry, rz)):
            oref[:] = jnp.stack(val, axis=0)
        refs[9 + ne][:] = jnp.where(exc, jnp.uint32(1), jnp.uint32(0))

    shp = jax.ShapeDtypeStruct((2, L, ntiles * s, t), jnp.uint32)
    eshp = jax.ShapeDtypeStruct((ntiles * s, t), jnp.uint32)
    call = pl.pallas_call(
        kernel,
        grid=(ntiles,),
        in_specs=[_g2_spec(s, t)] * 6 + list(extra_specs),
        out_specs=(_g2_spec(s, t),) * 3 + (_exc_spec(s, t),),
        out_shape=(shp,) * 3 + (eshp,),
        interpret=_interpret(),
    )
    return lambda *ins: call(*ins, *extras)


def g1_addx_pallas(p, q):
    """Flagged distinct add: ((B,L)x3 sum, (B,) uint32 doubling-corner flag)."""
    p = tuple(jnp.asarray(c, jnp.uint32) for c in p)
    q = tuple(jnp.asarray(c, jnp.uint32) for c in q)
    shape = jnp.broadcast_shapes(p[0].shape, q[0].shape)
    lead = shape[:-1]
    n = int(np.prod(lead)) if lead else 1
    s, t, ntiles = _geom(n)
    ins = [
        _to_kernel_layout(
            jnp.broadcast_to(c, shape).reshape(n, shape[-1]), s, t, ntiles, g2=False
        )
        for c in (*p, *q)
    ]
    ox, oy, oz, exc = _g1_addx_call(ntiles, s, t, _mul_mode())(*ins)
    out = tuple(_from_kernel_layout(o, n).reshape(shape) for o in (ox, oy, oz))
    return out, exc.reshape(-1)[:n].reshape(lead if lead else ())


def g2_addx_pallas(p, q):
    """G2 variant of the flagged distinct add; coords (..., 2, L)."""
    p = tuple(jnp.asarray(c, jnp.uint32) for c in p)
    q = tuple(jnp.asarray(c, jnp.uint32) for c in q)
    shape = jnp.broadcast_shapes(p[0].shape, q[0].shape)
    lead = shape[:-2]
    n = int(np.prod(lead)) if lead else 1
    s, t, ntiles = _geom(n)
    ins = [
        _to_kernel_layout(
            jnp.broadcast_to(c, shape).reshape(n, 2, shape[-1]), s, t, ntiles, g2=True
        )
        for c in (*p, *q)
    ]
    ox, oy, oz, exc = _g2_addx_call(ntiles, s, t, _mul_mode())(*ins)
    out = tuple(_from_kernel_layout(o, n).reshape(shape) for o in (ox, oy, oz))
    return out, exc.reshape(-1)[:n].reshape(lead if lead else ())


def g1_add_pallas(p, q, complete: bool = True):
    """Batched complete Jacobian add; coords (..., L) broadcast-compatible."""
    p = tuple(jnp.asarray(c, jnp.uint32) for c in p)
    q = tuple(jnp.asarray(c, jnp.uint32) for c in q)
    shape = jnp.broadcast_shapes(p[0].shape, q[0].shape)
    lead = shape[:-1]
    n = int(np.prod(lead)) if lead else 1
    s, t, ntiles = _geom(n)
    ins = [
        _to_kernel_layout(
            jnp.broadcast_to(c, shape).reshape(n, shape[-1]), s, t, ntiles, g2=False
        )
        for c in (*p, *q)
    ]
    outs = _g1_add_call(ntiles, s, t, complete, _mul_mode())(*ins)
    return tuple(_from_kernel_layout(o, n).reshape(shape) for o in outs)


def g1_double_pallas(p):
    p = tuple(jnp.asarray(c, jnp.uint32) for c in p)
    shape = p[0].shape
    lead = shape[:-1]
    n = int(np.prod(lead)) if lead else 1
    s, t, ntiles = _geom(n)
    ins = [
        _to_kernel_layout(c.reshape(n, shape[-1]), s, t, ntiles, g2=False) for c in p
    ]
    outs = _g1_dbl_call(ntiles, s, t, _mul_mode())(*ins)
    return tuple(_from_kernel_layout(o, n).reshape(shape) for o in outs)


def g2_add_pallas(p, q, complete: bool = True):
    """Batched complete G2 Jacobian add; coords (..., 2, L)."""
    p = tuple(jnp.asarray(c, jnp.uint32) for c in p)
    q = tuple(jnp.asarray(c, jnp.uint32) for c in q)
    shape = jnp.broadcast_shapes(p[0].shape, q[0].shape)
    lead = shape[:-2]
    n = int(np.prod(lead)) if lead else 1
    s, t, ntiles = _geom(n)
    ins = [
        _to_kernel_layout(
            jnp.broadcast_to(c, shape).reshape(n, 2, shape[-1]), s, t, ntiles, g2=True
        )
        for c in (*p, *q)
    ]
    outs = _g2_add_call(ntiles, s, t, complete, _mul_mode())(*ins)
    return tuple(_from_kernel_layout(o, n).reshape(shape) for o in outs)


def g2_double_pallas(p):
    p = tuple(jnp.asarray(c, jnp.uint32) for c in p)
    shape = p[0].shape
    lead = shape[:-2]
    n = int(np.prod(lead)) if lead else 1
    s, t, ntiles = _geom(n)
    ins = [
        _to_kernel_layout(c.reshape(n, 2, shape[-1]), s, t, ntiles, g2=True)
        for c in p
    ]
    outs = _g2_dbl_call(ntiles, s, t, _mul_mode())(*ins)
    return tuple(_from_kernel_layout(o, n).reshape(shape) for o in outs)


# ---------------------------------------------------------------------------
# Standalone field multiply (used by NTT/pairing layers and unit tests).
# ---------------------------------------------------------------------------


@functools.cache
def _mul_call(name: str, ntiles: int, s: int, t: int, mode: str = "v1"):
    spec = fq_spec() if name == "fq" else fr_spec()
    emit = _make_emit(spec, mode)
    L = emit.L
    extras, extra_specs, bind = _fold_inputs(emit)
    ne = len(extras)

    def kernel(*refs):
        bind(refs[2]) if ne else None
        refs[2 + ne][:] = emit.mul(refs[0][:], refs[1][:])

    bspec = pl.BlockSpec((L, s, t), lambda i: (0, i, 0), memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        grid=(ntiles,),
        in_specs=[bspec, bspec] + list(extra_specs),
        out_specs=bspec,
        out_shape=jax.ShapeDtypeStruct((L, ntiles * s, t), jnp.uint32),
        interpret=_interpret(),
    )
    return lambda *ins: call(*ins, *extras)


def mont_mul_pallas(spec_name: str, a, b):
    """Montgomery product on (..., L) uint32 arrays ('fq' or 'fr')."""
    a = jnp.asarray(a, jnp.uint32)
    b = jnp.asarray(b, jnp.uint32)
    shape = jnp.broadcast_shapes(a.shape, b.shape)
    lead = shape[:-1]
    n = int(np.prod(lead)) if lead else 1
    s, t, ntiles = _geom(n)
    aa = jnp.broadcast_to(a, shape).reshape(n, shape[-1])
    bb = jnp.broadcast_to(b, shape).reshape(n, shape[-1])
    arr_a = _to_kernel_layout(aa, s, t, ntiles, g2=False)
    arr_b = _to_kernel_layout(bb, s, t, ntiles, g2=False)
    out = _mul_call(spec_name, ntiles, s, t, _mul_mode())(arr_a, arr_b)
    return _from_kernel_layout(out, n).reshape(shape)


# ---------------------------------------------------------------------------
# Mixed addition (Jacobian accumulator += affine point) for bucket MSM.
# ---------------------------------------------------------------------------


def _jac_madd(f, acc, q, sign, active):
    """acc (Jacobian) += (-1)^sign * q (affine), where active; else acc.

    Returns (out, exceptional): `exceptional` is true on the H==0, r==0
    doubling corner (partial bucket sum collided with the incoming point) —
    the caller falls back to a complete-formula MSM in that (negligible-
    probability, but adversarially reachable) case rather than paying the
    doubling branch on every step.
    """
    x1, y1, z1 = acc
    x2, y2 = q
    # (0, 0) encodes an infinite input point (CRS points CAN be infinity when
    # a wire is absent from a query polynomial); treat as inactive.
    active = active & ~(f.is_zero(x2) & f.is_zero(y2))
    y2 = f.select(sign, f.sub(f.zero_like(y2), y2), y2)
    z1z1 = f.sq(z1)
    u2 = f.mul(x2, z1z1)
    s2 = f.mul(f.mul(y2, z1), z1z1)
    h = f.sub(u2, x1)
    hh = f.sq(h)
    i = f.add(hh, hh)
    i = f.add(i, i)
    j = f.mul(h, i)
    r = f.sub(s2, y1)
    r = f.add(r, r)
    v = f.mul(x1, i)
    x3 = f.sub(f.sub(f.sq(r), j), f.add(v, v))
    y1j = f.mul(y1, j)
    y3 = f.sub(f.mul(r, f.sub(v, x3)), f.add(y1j, y1j))
    z3 = f.sub(f.sub(f.sq(f.add(z1, h)), z1z1), hh)
    out = (x3, y3, z3)

    p_inf = f.is_zero(z1)
    h_zero = f.is_zero(h)
    r_zero = f.is_zero(r)
    one = f.one_like(x1)
    # fresh bucket: acc == inf -> lift q to Jacobian
    lifted = (x2, y2, one)
    out = tuple(f.select(p_inf, lq, o) for lq, o in zip(lifted, out))
    # opposite points -> infinity
    opposite = h_zero & r_zero & ~p_inf  # NB: for madd h==0 && r==0 is the
    # doubling corner; h==0 && r!=0 is "opposite"; flag the former
    inf = (one, one, f.zero_like(x1))
    out = tuple(
        f.select(h_zero & ~r_zero & ~p_inf, iz, o) for iz, o in zip(inf, out)
    )
    exceptional = opposite & active
    out = tuple(f.select(active, o, a) for o, a in zip(out, acc))
    return out, exceptional


@functools.cache
def _g1_madd_call(ntiles: int, s: int, t: int, mode: str = "v1"):
    emit = _make_emit(fq_spec(), mode)
    L = emit.L
    extras, extra_specs, bind = _fold_inputs(emit)
    ne = len(extras)

    def kernel(*refs):
        bind(refs[6]) if ne else None
        flags = refs[5]
        sign = flags[0] != 0
        active = flags[1] != 0
        p = tuple(r[:] for r in refs[0:3])
        q = tuple(r[:] for r in refs[3:5])
        (rx, ry, rz), exc = _jac_madd(emit, p, q, sign, active)
        ox, oy, oz, oexc = refs[6 + ne : 10 + ne]
        ox[:], oy[:], oz[:] = rx, ry, rz
        oexc[:] = jnp.where(exc, jnp.uint32(1), jnp.uint32(0))

    shp = jax.ShapeDtypeStruct((L, ntiles * s, t), jnp.uint32)
    eshp = jax.ShapeDtypeStruct((ntiles * s, t), jnp.uint32)
    call = pl.pallas_call(
        kernel,
        grid=(ntiles,),
        in_specs=[_g1_spec(s, t)] * 5 + [_flag_spec(s, t)] + list(extra_specs),
        out_specs=(_g1_spec(s, t),) * 3 + (_exc_spec(s, t),),
        out_shape=(shp,) * 3 + (eshp,),
        interpret=_interpret(),
    )
    return lambda *ins: call(*ins, *extras)


@functools.cache
def _g2_madd_call(ntiles: int, s: int, t: int, mode: str = "v1"):
    inner = _make_emit(fq_spec(), mode)
    emit = Fq2Emit(inner)
    L = inner.L
    extras, extra_specs, bind = _fold_inputs(inner)
    ne = len(extras)

    def kernel(*refs):
        bind(refs[6]) if ne else None
        flags = refs[5]
        sign = flags[0] != 0
        active = flags[1] != 0
        p = tuple(_c2(r[:]) for r in refs[0:3])
        q = tuple(_c2(r[:]) for r in refs[3:5])
        (rx, ry, rz), exc = _jac_madd(emit, p, q, sign, active)
        for oref, val in zip(refs[6 + ne : 9 + ne], (rx, ry, rz)):
            oref[:] = jnp.stack(val, axis=0)
        refs[9 + ne][:] = jnp.where(exc, jnp.uint32(1), jnp.uint32(0))

    shp = jax.ShapeDtypeStruct((2, L, ntiles * s, t), jnp.uint32)
    eshp = jax.ShapeDtypeStruct((ntiles * s, t), jnp.uint32)
    call = pl.pallas_call(
        kernel,
        grid=(ntiles,),
        in_specs=[_g2_spec(s, t)] * 5 + [_flag_spec(s, t)] + list(extra_specs),
        out_specs=(_g2_spec(s, t),) * 3 + (_exc_spec(s, t),),
        out_shape=(shp,) * 3 + (eshp,),
        interpret=_interpret(),
    )
    return lambda *ins: call(*ins, *extras)


def _flags_to_layout(sign, active, s, t, ntiles, b):
    flags = jnp.stack(
        [jnp.asarray(sign, jnp.uint32), jnp.asarray(active, jnp.uint32)], axis=0
    )
    pad = ntiles * s * t - b
    if pad:
        flags = jnp.pad(flags, ((0, 0), (0, pad)))
    return flags.reshape(2, ntiles * s, t)


def g1_madd_pallas(acc, q_affine, sign, active):
    """acc: Jacobian coords (B, L); q_affine: (x, y) each (B, L);
    sign/active: (B,) bool.  Returns ((B,L)x3 acc', (B,) uint32 exc)."""
    accs = tuple(jnp.asarray(c, jnp.uint32) for c in acc)
    qs = tuple(jnp.asarray(c, jnp.uint32) for c in q_affine)
    b = accs[0].shape[0]
    s, t, ntiles = _geom(b)
    ins = [_to_kernel_layout(c, s, t, ntiles, g2=False) for c in (*accs, *qs)]
    flags = _flags_to_layout(sign, active, s, t, ntiles, b)
    ox, oy, oz, exc = _g1_madd_call(ntiles, s, t, _mul_mode())(*ins, flags)
    out = tuple(_from_kernel_layout(o, b) for o in (ox, oy, oz))
    return out, exc.reshape(-1)[:b]


def g2_madd_pallas(acc, q_affine, sign, active):
    """G2 variant: coords (B, 2, L)."""
    accs = tuple(jnp.asarray(c, jnp.uint32) for c in acc)
    qs = tuple(jnp.asarray(c, jnp.uint32) for c in q_affine)
    b = accs[0].shape[0]
    s, t, ntiles = _geom(b)
    ins = [_to_kernel_layout(c, s, t, ntiles, g2=True) for c in (*accs, *qs)]
    flags = _flags_to_layout(sign, active, s, t, ntiles, b)
    ox, oy, oz, exc = _g2_madd_call(ntiles, s, t, _mul_mode())(*ins, flags)
    out = tuple(_from_kernel_layout(o, b) for o in (ox, oy, oz))
    return out, exc.reshape(-1)[:b]
