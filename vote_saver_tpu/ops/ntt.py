"""Radix-2 NTT over Fr for the Groth16 QAP witness-polynomial division.

Replaces the crypto3-math FFT hidden inside the reference prover
(SURVEY.md §2B `math` row; linked at reference bin/cli/CMakeLists.txt:94).

Decimation-in-time with host-precomputed bit-reversal permutation and
per-stage twiddle tables (Montgomery limbs).  All butterflies are batched
limb ops; the stage loop is a static Python loop (log2 n stages) so XLA sees
one fused graph.  Supports coset evaluation for the (A*B-C)/Z division.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..params import R, FR_ROOT_OF_UNITY, FR_TWO_ADICITY, FR_GENERATOR, fr_spec
from . import limbs as lb
from .field_ops import fr_ops


def _mxu_default(n: int) -> bool:
    """Matmul-NTT dispatch: on by default on TPU for MXU-worthy domains.

    VSTPU_NTT=mxu forces it everywhere (CPU tests), =radix2 disables."""
    mode = os.environ.get("VSTPU_NTT", "auto")
    if mode == "radix2":
        return False
    if mode == "mxu":
        return True
    return n >= (1 << 12) and jax.default_backend() == "tpu"


class NTT:
    def __init__(self, n: int):
        assert n & (n - 1) == 0, "domain size must be a power of two"
        assert n <= (1 << FR_TWO_ADICITY)
        self.n = n
        self.k = n.bit_length() - 1
        self.use_mxu = _mxu_default(n)
        spec = fr_spec()
        self.f = fr_ops()

        self.w = pow(FR_ROOT_OF_UNITY, (1 << FR_TWO_ADICITY) // n, R)
        self.w_inv = pow(self.w, R - 2, R)
        self.n_inv = pow(n, R - 2, R)

        # bit-reversal permutation
        rev = np.zeros(n, dtype=np.int32)
        for i in range(n):
            rev[i] = int(bin(i)[2:].zfill(self.k)[::-1], 2)
        self.bitrev = rev

        # per-stage twiddles: stage s has half = 2^s butterflies per block,
        # twiddle_j = w^(n/(2^(s+1)) * j)
        self.tw_fwd, self.tw_inv = [], []
        for s in range(self.k):
            half = 1 << s
            step = n // (2 * half)
            tws = [pow(self.w, step * j, R) for j in range(half)]
            tws_i = [pow(self.w_inv, step * j, R) for j in range(half)]
            self.tw_fwd.append(lb.ints_to_mont_limbs(tws, spec))
            self.tw_inv.append(lb.ints_to_mont_limbs(tws_i, spec))

        # coset generator powers (for evaluate-on-coset): g^i and g^-i
        g = FR_GENERATOR
        g_inv = pow(g, R - 2, R)
        self.coset_pows = lb.ints_to_mont_limbs([pow(g, i, R) for i in range(n)], spec)
        self.coset_pows_inv = lb.ints_to_mont_limbs([pow(g_inv, i, R) for i in range(n)], spec)
        self.n_inv_limbs = lb.ints_to_mont_limbs([self.n_inv], spec)[0]
        # Z_H(g) = g^n - 1 on the coset is constant; its inverse too.
        zh_coset = (pow(g, n, R) - 1) % R
        self.zh_coset_inv_limbs = lb.ints_to_mont_limbs([pow(zh_coset, R - 2, R)], spec)[0]

    def _core(self, x, twiddles):
        """x: (..., n, L) mont limbs, already bit-reversed; returns NTT."""
        f = self.f
        n = self.n
        for s in range(self.k):
            half = 1 << s
            blocks = n // (2 * half)
            shp = x.shape[:-2]
            x = x.reshape(*shp, blocks, 2 * half, x.shape[-1])
            even = x[..., :half, :]
            odd = x[..., half:, :]
            t = f.mul(odd, jnp.asarray(twiddles[s]))  # (..., blocks, half, L)
            x = jnp.concatenate([f.add(even, t), f.sub(even, t)], axis=-2)
            x = x.reshape(*shp, n, x.shape[-1])
        return x

    def _mxu_plan(self, kind: str):
        from . import ntt_mxu

        return ntt_mxu.get_plan(self.n, kind)

    def ntt(self, coeffs):
        """Coefficients -> evaluations on the size-n subgroup (natural order)."""
        if self.use_mxu:
            return self._mxu_plan("fwd").apply(coeffs)
        x = jnp.take(coeffs, jnp.asarray(self.bitrev), axis=-2)
        return self._core(x, self.tw_fwd)

    def intt(self, evals):
        """Evaluations -> coefficients."""
        if self.use_mxu:
            return self._mxu_plan("inv").apply(evals)
        x = jnp.take(evals, jnp.asarray(self.bitrev), axis=-2)
        x = self._core(x, self.tw_inv)
        return self.f.mul(x, jnp.asarray(self.n_inv_limbs))

    def coset_ntt(self, coeffs):
        """Evaluate on the coset g*H (g = Fr multiplicative generator)."""
        if self.use_mxu:
            return self._mxu_plan("fwd_coset").apply(coeffs)
        scaled = self.f.mul(coeffs, jnp.asarray(self.coset_pows))
        return self.ntt(scaled)

    def coset_intt(self, evals):
        if self.use_mxu:
            return self._mxu_plan("inv_coset").apply(evals)
        coeffs = self.intt(evals)
        return self.f.mul(coeffs, jnp.asarray(self.coset_pows_inv))


@functools.cache
def get_ntt(n: int) -> NTT:
    return NTT(n)
