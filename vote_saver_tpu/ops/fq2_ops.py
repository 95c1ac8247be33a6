"""Batched Fq2 arithmetic on device: elements are uint32 arrays (..., 2, L).

Karatsuba over :class:`FieldOps` — 3 base mults per Fq2 mult.  Needed for G2
Jacobian arithmetic (the Groth16 proof-B MSM runs in G2).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp

from .field_ops import fq_ops


class Fq2Ops:
    def __init__(self):
        self.fq = fq_ops()

    def _c(self, a):
        return a[..., 0, :], a[..., 1, :]

    def _pack(self, c0, c1):
        return jnp.stack([c0, c1], axis=-2)

    def add(self, a, b):
        return self._pack(self.fq.add(a[..., 0, :], b[..., 0, :]), self.fq.add(a[..., 1, :], b[..., 1, :]))

    def sub(self, a, b):
        return self._pack(self.fq.sub(a[..., 0, :], b[..., 0, :]), self.fq.sub(a[..., 1, :], b[..., 1, :]))

    def neg(self, a):
        return self._pack(self.fq.neg(a[..., 0, :]), self.fq.neg(a[..., 1, :]))

    def mul(self, a, b):
        f = self.fq
        a0, a1 = self._c(a)
        b0, b1 = self._c(b)
        t0 = f.mul(a0, b0)
        t1 = f.mul(a1, b1)
        t2 = f.mul(f.add(a0, a1), f.add(b0, b1))
        return self._pack(f.sub(t0, t1), f.sub(t2, f.add(t0, t1)))

    def sq(self, a):
        f = self.fq
        a0, a1 = self._c(a)
        t0 = f.mul(f.add(a0, a1), f.sub(a0, a1))
        t1 = f.mul(a0, a1)
        return self._pack(t0, f.add(t1, t1))

    def muls(self, a, s):
        """Multiply by a base-field element s (..., L)."""
        f = self.fq
        return self._pack(f.mul(a[..., 0, :], s), f.mul(a[..., 1, :], s))

    def inv(self, a):
        f = self.fq
        a0, a1 = self._c(a)
        norm = f.add(f.mul(a0, a0), f.mul(a1, a1))
        ninv = f.inv(norm)
        return self._pack(f.mul(a0, ninv), f.neg(f.mul(a1, ninv)))

    def is_zero(self, a):
        return jnp.all(a == 0, axis=(-2, -1))

    def eq(self, a, b):
        return jnp.all(a == b, axis=(-2, -1))

    def select(self, cond, a, b):
        return jnp.where(jnp.asarray(cond)[..., None, None], a, b)


@functools.cache
def fq2_ops() -> Fq2Ops:
    return Fq2Ops()
