"""Batched Montgomery field arithmetic on fixed limbs (JAX).

The device-side replacement for crypto3::multiprecision big integers
(SURVEY.md §2B `multiprecision` row; usage at reference common.hpp:1015).

Two limb layouts, selected by FieldSpec (VSTPU_LIMB_BITS):
  * 16-bit limbs in uint32 — the TPU path: limb products are exact in uint32
    and the lo/hi product halves are accumulated into anti-diagonal columns
    by one float32 matmul against a constant 0/1 matrix (exact: column sums
    stay < 2^24) — MXU-friendly;
  * 32-bit limbs in uint64 — the CPU/test path: same algorithm at native
    width with float64 accumulation (exact: sums < 2^53).

Montgomery reduction runs as an L-step lax.scan of cheap VPU ops with lazy
carries; everything broadcasts over leading batch dims and is
jit/vmap/shard_map-compatible (static shapes, no data-dependent control flow).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..params import FieldSpec, fr_spec, fq_spec


class FieldOps:
    """Batched modular arithmetic for one prime field in Montgomery form."""

    def __init__(self, spec: FieldSpec):
        assert spec.limb_bits in (16, 32)
        self.spec = spec
        L = spec.num_limbs
        self.L = L
        self.lb = spec.limb_bits
        if spec.limb_bits == 16:
            self.dtype, self.acc_dtype = jnp.uint32, jnp.float32
            np_dtype = np.uint32
        else:
            jax.config.update("jax_enable_x64", True)
            self.dtype, self.acc_dtype = jnp.uint64, jnp.float64
            np_dtype = np.uint64
        self.mask = self.dtype((1 << self.lb) - 1)
        self.one_bit = self.dtype(1)
        # Constant operands.
        self.n_limbs = np.array(spec.to_limbs(spec.modulus), dtype=np_dtype)
        self.n0_inv = self.dtype(spec.n0_inv)
        self.one_mont = np.array(spec.to_limbs(spec.to_mont(1)), dtype=np_dtype)
        self.r2 = np.array(spec.to_limbs(spec.mont_r2), dtype=np_dtype)
        self.zero = np.zeros(L, dtype=np_dtype)
        # Anti-diagonal accumulation matrices: (L*L, 2L); lo half goes to
        # column i+j, hi half to column i+j+1.
        m_lo = np.zeros((L * L, 2 * L), dtype=np.float32 if self.lb == 16 else np.float64)
        m_hi = np.zeros_like(m_lo)
        for i in range(L):
            for j in range(L):
                m_lo[i * L + j, i + j] = 1.0
                if i + j + 1 < 2 * L:
                    m_hi[i * L + j, i + j + 1] = 1.0
        self.m_lo = m_lo
        self.m_hi = m_hi
        # Exponent bits (MSB first) for Fermat inversion.
        self.inv_bits = np.array([int(b) for b in bin(spec.modulus - 2)[2:]], dtype=np.uint32)

    # -- low-level helpers --------------------------------------------------

    def _carry_limbs(self, cols, out_len):
        """Propagate carries over `out_len` columns; returns (..., out_len)."""
        cols_t = jnp.moveaxis(cols[..., :out_len], -1, 0)

        def body(carry, col):
            t = col + carry
            return t >> self.lb, t & self.mask

        _, outs = jax.lax.scan(body, jnp.zeros(cols.shape[:-1], self.dtype), cols_t)
        return jnp.moveaxis(outs, 0, -1)

    def _cond_sub_n(self, limbs):
        """limbs (..., L+1) value < 2N -> (..., L) canonical value < N."""
        L = self.L
        n_ext = jnp.concatenate(
            [jnp.asarray(self.n_limbs), jnp.zeros(1, self.dtype)]
        )
        limbs_t = jnp.moveaxis(limbs, -1, 0)

        def body(borrow, xs):
            limb, nk = xs
            t = limb - nk - borrow
            return (t >> self.lb) & self.one_bit, t & self.mask

        borrow, diff_t = jax.lax.scan(
            body, jnp.zeros(limbs.shape[:-1], self.dtype), (limbs_t, n_ext)
        )
        diff = jnp.moveaxis(diff_t, 0, -1)
        ge = borrow == 0  # no final borrow -> limbs >= N
        out = jnp.where(ge[..., None], diff, limbs)
        return out[..., :L]

    # -- public ops ---------------------------------------------------------

    def mul(self, a, b):
        """Montgomery product: (a * b * R^-1) mod N.  a,b: (..., L) limbs."""
        L = self.L
        a = jnp.asarray(a, self.dtype)
        b = jnp.asarray(b, self.dtype)
        p = a[..., :, None] * b[..., None, :]  # exact (operands < 2^lb)
        lo = (p & self.mask).astype(self.acc_dtype).reshape(*p.shape[:-2], L * L)
        hi = (p >> self.lb).astype(self.acc_dtype).reshape(*p.shape[:-2], L * L)
        # precision=HIGHEST is required on TPU: f32 matmuls default to bf16
        # passes, which silently round the (exact-integer) column sums.
        # (An integer pad/reshape/sum anti-diagonal variant was tried in
        # round 4 and compiled 7x SLOWER on the TPU backend — keep the dot.)
        cols = (
            jnp.matmul(lo, self.m_lo, preferred_element_type=self.acc_dtype,
                       precision=jax.lax.Precision.HIGHEST)
            + jnp.matmul(hi, self.m_hi, preferred_element_type=self.acc_dtype,
                         precision=jax.lax.Precision.HIGHEST)
        ).astype(self.dtype)  # (..., 2L), each < L * 2^(lb+1)
        return self._reduce(cols)

    def _reduce(self, cols):
        """Montgomery-reduce 2L lazy columns to canonical L limbs."""
        L = self.L
        n = jnp.asarray(self.n_limbs)
        pad_hi = L - 1  # zeros after the phi block (2L - L - 1)

        def step(cols, _):
            m = (cols[..., 0] * self.n0_inv) & self.mask
            p = m[..., None] * n  # (..., L) exact
            zeros_l = jnp.zeros_like(cols[..., :L])
            add_lo = jnp.concatenate([p & self.mask, zeros_l], axis=-1)
            add_hi = jnp.concatenate(
                [jnp.zeros_like(cols[..., :1]), p >> self.lb, zeros_l[..., :pad_hi]],
                axis=-1,
            )
            cols = cols + add_lo + add_hi
            carry = cols[..., 0] >> self.lb  # low limb is zero by construction
            cols = jnp.roll(cols, -1, axis=-1)
            cols = cols.at[..., -1].set(0)
            cols = cols.at[..., 0].add(carry)
            return cols, None

        cols, _ = jax.lax.scan(step, cols, None, length=L)
        out = self._carry_limbs(cols, L + 1)
        return self._cond_sub_n(out)

    def reduce_lazy(self, cols):
        """Montgomery-reduce (..., K<=2L) lazy columns -> canonical (..., L).

        Input is a lazily-accumulated limb vector: value = sum cols_k 2^(lb*k),
        columns may exceed 2^lb.  Requirements for exactness: value < R_mont*N
        (R_mont = 2^(lb*L)) and every column < 2^(2*lb) - 2^lb (headroom for
        the fold-in addends).  Computes value * R_mont^-1 mod N — callers
        compensate with an extra Montgomery factor on one operand (e.g. the
        COO A/B/C evaluation keeps coefficients in double-Montgomery form).
        """
        K = cols.shape[-1]
        if K < 2 * self.L:
            pad = jnp.zeros(cols.shape[:-1] + (2 * self.L - K,), cols.dtype)
            cols = jnp.concatenate([cols, pad], axis=-1)
        return self._reduce(cols.astype(self.dtype))

    def add(self, a, b):
        s = jnp.asarray(a, self.dtype) + jnp.asarray(b, self.dtype)
        s = jnp.concatenate([s, jnp.zeros_like(s[..., :1])], axis=-1)
        out = self._carry_limbs(s, self.L + 1)
        return self._cond_sub_n(out)

    def sub(self, a, b):
        L = self.L
        a, b = jnp.broadcast_arrays(jnp.asarray(a, self.dtype), jnp.asarray(b, self.dtype))
        at, bt = jnp.moveaxis(a, -1, 0), jnp.moveaxis(b, -1, 0)

        def body(borrow, xs):
            ak, bk = xs
            t = ak - bk - borrow
            return (t >> self.lb) & self.one_bit, t & self.mask

        borrow, diff_t = jax.lax.scan(body, jnp.zeros(a.shape[:-1], self.dtype), (at, bt))
        diff = jnp.moveaxis(diff_t, 0, -1)
        # if borrow: add N back (carry out of the top limb cancels the borrow)
        n = jnp.asarray(self.n_limbs)
        fixed = self._carry_limbs(diff + n, L)
        return jnp.where((borrow == 1)[..., None], fixed, diff)

    def neg(self, a):
        return self.sub(jnp.zeros_like(jnp.asarray(a)), a)

    def is_zero(self, a):
        return jnp.all(jnp.asarray(a) == 0, axis=-1)

    def eq(self, a, b):
        return jnp.all(jnp.asarray(a) == jnp.asarray(b), axis=-1)

    def select(self, cond, a, b):
        """cond: (...) bool -> where(cond, a, b) over limb arrays."""
        return jnp.where(jnp.asarray(cond)[..., None], a, b)

    def to_mont(self, a_std):
        return self.mul(a_std, jnp.asarray(self.r2))

    def from_mont(self, a_mont):
        one = jnp.zeros_like(jnp.asarray(a_mont)).at[..., 0].set(1)
        return self.mul(a_mont, one)

    def sq(self, a):
        return self.mul(a, a)

    def pow_fixed(self, a, exp_bits):
        """a^e with e given as a static MSB-first bit sequence."""
        res = jnp.broadcast_to(jnp.asarray(self.one_mont), jnp.asarray(a).shape)
        for bit in exp_bits:
            res = self.sq(res)
            if int(bit):
                res = self.mul(res, a)
        return res

    def inv(self, a):
        """Fermat inversion a^(N-2); returns garbage on zero input (as does
        the reference's field inversion)."""
        bits = jnp.asarray(self.inv_bits)  # MSB first

        def body(res, bit):
            res = self.sq(res)
            res_mul = self.mul(res, a)
            return self.select(bit == 1, res_mul, res), None

        init = jnp.broadcast_to(jnp.asarray(self.one_mont), jnp.asarray(a).shape)
        res, _ = jax.lax.scan(body, init, bits)
        return res

    def batch_inv(self, a):
        """Montgomery's trick over the leading axis via scans: one inv total.

        a: (n, ..., L); zero entries produce garbage (caller masks them).
        """
        def fwd(acc, x):
            nxt = self.mul(acc, x)
            return nxt, acc  # emit prefix product *before* x

        one = jnp.broadcast_to(jnp.asarray(self.one_mont), a.shape[1:])
        total, prefix = jax.lax.scan(fwd, one, a)
        total_inv = self.inv(total)

        def bwd(acc, xs):
            x, pre = xs
            out = self.mul(acc, pre)
            return self.mul(acc, x), out

        _, out_rev = jax.lax.scan(bwd, total_inv, (a[::-1], prefix[::-1]))
        return out_rev[::-1]


@functools.cache
def fr_ops() -> FieldOps:
    return FieldOps(fr_spec())


@functools.cache
def fq_ops() -> FieldOps:
    return FieldOps(fq_spec())
