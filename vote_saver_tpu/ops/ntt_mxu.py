"""MXU (matmul) NTT over Fr — Bailey 4-step with int8 systolic-array DFTs.

Replaces the VPU butterfly network of :mod:`ntt` for prover-scale domains.
The radix-2 path issues ``log2 n`` elementwise Montgomery-multiply stages —
VPU-bound.  Here the transform is decomposed as ``n = n1 * n2`` and each
sub-DFT is a *matrix product against a constant DFT matrix*, which is where
a TPU actually wants to be: the 255-bit field elements are split into 37
unsigned 7-bit digits, and the digit-convolution x matrix-contraction runs
as ONE ``lax.conv_general_dilated`` in int8 with exact int32 accumulation
(s8 x s8 -> s32 rides the MXU; measured >80 Top/s on v5e vs the ~1 Top/s
VPU budget of u32 limb products).

    X[o1 + n1*o2] = sum_{i2} W2[i2,o2] * T[o1,i2] * sum_{i1} W1[o1,i1] * x[i1*n2+i2]

Digit-product columns are reduced mod r by a second (tiny) int8 matmul
against balanced base-256 digits of ``2^(7u) mod r``, then a short byte
carry pass and one Montgomery multiply fold the <= 2^271 lazy value to a
canonical Montgomery-form element (see ``_fold_mod_r``).

Coset scaling (the g^j / g^-j factors of the Groth16 (AB-C)/Z_H division)
and the 1/n of the inverse transform are *folded into the constant
matrices* — coset NTTs cost exactly the same as plain ones.

The 4-step structure is also the multi-chip decomposition: step A is local
per column block, the middle transpose is one ``all_to_all``, step C is
local per row block (see parallel/sharded.py).  Replaces the crypto3-math
FFT hidden inside the reference prover (reference bin/cli/CMakeLists.txt:94,
README.md:273); SURVEY.md §7 hard-part 7 / ROADMAP item 5.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..params import R, FR_GENERATOR, FR_ROOT_OF_UNITY, FR_TWO_ADICITY, fr_spec
from . import limbs as lb_codec
from .field_ops import fr_ops

DIGIT_BITS = 7
NDIGITS = 37  # ceil(256 / 7) covers any value < 2^256 (limbs span 256 bits)


# ---------------------------------------------------------------------------
# Host precompute helpers
# ---------------------------------------------------------------------------


def _digits7_host(vals: np.ndarray) -> np.ndarray:
    """(..,) object ints -> (..., NDIGITS) int8 unsigned 7-bit digits."""
    flat = vals.reshape(-1)
    byts = np.frombuffer(
        b"".join(int(v).to_bytes(33, "little") for v in flat), dtype=np.uint8
    ).reshape(-1, 33)
    out = np.zeros((flat.size, NDIGITS), dtype=np.int8)
    for d in range(NDIGITS):
        s = DIGIT_BITS * d
        b, off = divmod(s, 8)
        v = (byts[:, b].astype(np.uint16) | (byts[:, b + 1].astype(np.uint16) << 8)) >> off
        out[:, d] = (v & 127).astype(np.int8)
    return out.reshape(vals.shape + (NDIGITS,))


def _balanced256_host(v: int, nd: int) -> list[int]:
    """v >= 0 -> nd balanced base-256 digits in [-128, 127]."""
    digs = []
    carry = 0
    for d in range(nd):
        t = ((v >> (8 * d)) & 255) + carry
        if t > 127:
            digs.append(t - 256)
            carry = 1
        else:
            digs.append(t)
            carry = 0
    assert carry == 0 and v < (1 << (8 * nd))
    return digs


@functools.cache
def _fold_matrix(ncols: int, shift_bits: int) -> np.ndarray:
    """(ncols*5, 33) int8: row (kc, t) holds balanced base-256 digits of
    2^(7*(kc+t)+shift) mod r — the mod-r fold of digit-product column
    (kc, t).  The 2^shift pre-scale is cancelled by the single Montgomery
    word-step in _fold_mod_r (shift = limb_bits)."""
    rows = []
    for kc in range(ncols):
        for t in range(5):
            rows.append(
                _balanced256_host(pow(2, DIGIT_BITS * (kc + t) + shift_bits, R), 33)
            )
    return np.asarray(rows, dtype=np.int8)


# ---------------------------------------------------------------------------
# Device-side digit pipeline
# ---------------------------------------------------------------------------


def _digits7_device(x):
    """(..., L) limb array (16- or 32-bit layout) -> (..., NDIGITS) int8."""
    spec = fr_spec()
    lb = spec.limb_bits
    L = spec.num_limbs
    mask = np.uint32(127) if lb == 16 else np.uint64(127)
    digs = []
    for d in range(NDIGITS):
        s = DIGIT_BITS * d
        l, off = s // lb, s % lb
        v = x[..., l] >> off
        if off + DIGIT_BITS > lb and l + 1 < L:
            v = v | (x[..., l + 1] << (lb - off))
        digs.append((v & mask).astype(jnp.int8))
    return jnp.stack(digs, axis=-1)


def _fold_mod_r(cols):
    """Digit-product columns (..., ncols) int32 (each < 2^31, value =
    sum_k cols_k 2^(7k)) -> canonical limbs (..., L) of (value mod r).

    Pipeline: 5-way 7-bit split -> int8 matmul against the balanced fold
    matrix (pre-scaled by 2^limb_bits) -> signed byte carry pass -> limb
    packing -> ONE Montgomery word-step divides the 2^limb_bits back out
    and shrinks the <=2^16*r lazy value below 2r -> conditional subtract.
    """
    f = fr_ops()
    spec = f.spec
    lbits = spec.limb_bits
    mask = f.mask
    ncols = cols.shape[-1]
    # 5-way split, (kc, t)-pair order matching _fold_matrix rows (kc-major)
    parts = [((cols >> (DIGIT_BITS * t)) & 127).astype(jnp.int8) for t in range(5)]
    stacked = jnp.stack(parts, axis=-1).reshape(*cols.shape[:-1], ncols * 5)
    fold = jnp.asarray(_fold_matrix(ncols, lbits))  # (ncols*5, 33)
    g = jax.lax.dot_general(
        stacked, fold, (((stacked.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # (..., 33) signed byte coefficients; value V >= 0, < 365*127*r
    nbytes = 36
    out_bytes = []
    carry = jnp.zeros(g.shape[:-1], jnp.int32)
    for d in range(nbytes):
        t = (g[..., d] if d < g.shape[-1] else 0) + carry
        out_bytes.append(t & 255)
        carry = t >> 8  # arithmetic shift: exact for signed coefficients
    # (final carry is 0: the value is nonnegative and < 2^(8*nbytes))
    bpl = lbits // 8
    L = spec.num_limbs
    dtype = f.dtype
    limbs = []
    for l in range((nbytes + bpl - 1) // bpl):
        acc = jnp.zeros(g.shape[:-1], dtype)
        for t in range(bpl):
            idx = l * bpl + t
            if idx < nbytes:
                # cast before shifting: b<<24 overflows int32 on the 32-bit
                # limb layout (bytes are canonical 0..255 by here)
                acc = acc + (out_bytes[idx].astype(dtype) << t * 8)
        limbs.append(acc)
    nl = len(limbs)
    # Montgomery word-step: m = -V * r^-1 mod 2^lb; (V + m*r) / 2^lb is exact
    # and < 2r (V < 2^16 * r), cancelling the fold matrix's 2^lb pre-scale.
    n = [dtype(int(v)) for v in f.n_limbs]
    m = (limbs[0] * f.n0_inv) & mask
    out = []
    c = (limbs[0] + ((m * n[0]) & mask)) >> lbits
    hi_prev = (m * n[0]) >> lbits
    for k in range(1, nl + 1):
        t = c + hi_prev
        if k < nl:
            t = t + limbs[k]
        if k < L:
            p = m * n[k]
            t = t + (p & mask)
            hi_prev = p >> lbits
        else:
            hi_prev = jnp.zeros_like(m)
        out.append(t & mask)
        c = t >> lbits
    # value now < 2r across L limbs (+ zero tail); one conditional subtract
    ext = jnp.stack(out[: L + 1], axis=-1)
    return f._cond_sub_n(ext)


def _fr_matmul(wd_flip, x_limbs):
    """Y = W @ X over Fr via one int8 conv.

    wd_flip: (m, m, NDIGITS) int8 — digit-flipped plain-form DFT matrix,
      [o, i, NDIGITS-1-d] = digit d of W[o, i].
    x_limbs: (N, m, L) Montgomery limbs.
    Returns (N, m, L) Montgomery limbs of sum_i W[o,i] * X[i] (mod r):
    plain x mont products reduce mod r straight to Montgomery form.
    """
    xd = _digits7_device(x_limbs)  # (N, m, D)
    c = jax.lax.conv_general_dilated(
        xd,
        jnp.asarray(wd_flip),
        window_strides=(1,),
        padding=[(NDIGITS - 1, NDIGITS - 1)],
        dimension_numbers=("NCH", "OIH", "NCH"),
        preferred_element_type=jnp.int32,
    )  # (N, m, 2D-1): column kc = sum_{dw+dx=kc} W_dw @ X_dx
    return _fold_mod_r(c)


# ---------------------------------------------------------------------------
# Transform plans
# ---------------------------------------------------------------------------


class MatmulNTTPlan:
    """One 4-step transform  out[o1 + n1*o2] =
    c * a^(o1 + n1*o2) * sum_i x[i] Omega^(i*(o1+n1*o2)) b^i
    with all scale factors folded into the three constant stages."""

    def __init__(self, n: int, omega: int, beta: int, alpha: int, c: int):
        assert n & (n - 1) == 0
        k = n.bit_length() - 1
        self.n = n
        self.n1 = 1 << (k // 2)
        self.n2 = n // self.n1
        n1, n2 = self.n1, self.n2
        assert max(n1, n2) <= 2048, "digit-column int32 headroom caps n at 4M"
        spec = fr_spec()

        w_n1 = pow(omega, n2, R)  # primitive n1-th root
        w_n2 = pow(omega, n1, R)
        # Step A matrix: W1[o1, i1] = w_n1^(i1*o1) * beta^(n2*i1)
        i1 = np.arange(n1)
        o1 = np.arange(n1)
        b_pow = np.array([pow(beta, int(n2 * v), R) for v in i1], dtype=object)
        w1 = np.empty((n1, n1), dtype=object)
        w_n1_pows = [pow(w_n1, int(e), R) for e in range(n1)]
        for o in range(n1):
            for i in range(n1):
                w1[o, i] = w_n1_pows[(o * i) % n1] * b_pow[i] % R
        # Step B twiddle (transposed for the (.., i2, o1, L) layout):
        # T[i2, o1] = Omega^(i2*o1) * beta^i2 * c * alpha^o1
        t12 = np.empty((n2, n1), dtype=object)
        a_pow_o1 = [pow(alpha, int(v), R) for v in range(n1)]
        for i2 in range(n2):
            base = pow(omega, int(i2), R)
            acc = pow(beta, int(i2), R) * c % R
            for o in range(n1):
                t12[i2, o] = acc * a_pow_o1[o] % R
                acc = acc * base % R
        # Step C matrix, stored transposed: W2T[o2, i2] = w_n2^(i2*o2) * alpha^(n1*o2)
        w2t = np.empty((n2, n2), dtype=object)
        w_n2_pows = [pow(w_n2, int(e), R) for e in range(n2)]
        a_pow = [pow(alpha, int(n1 * v), R) for v in range(n2)]
        for o2 in range(n2):
            for i2 in range(n2):
                w2t[o2, i2] = w_n2_pows[(o2 * i2) % n2] * a_pow[o2] % R
        self.w1d = np.ascontiguousarray(_digits7_host(w1)[:, :, ::-1])
        self.w2td = np.ascontiguousarray(_digits7_host(w2t)[:, :, ::-1])
        self.t12 = lb_codec.ints_to_mont_limbs(t12, spec)

    def apply(self, x):
        """x: (..., n, L) Montgomery limbs -> transformed (..., n, L)."""
        f = fr_ops()
        n1, n2 = self.n1, self.n2
        lead = x.shape[:-2]
        L = x.shape[-1]
        bf = 1
        for d in lead:
            bf *= d
        a = x.reshape(bf, n1, n2, L)
        # step A: contract i1 (columns)
        xa = jnp.swapaxes(a, 1, 2).reshape(bf * n2, n1, L)
        y = _fr_matmul(self.w1d, xa).reshape(bf, n2, n1, L)
        # step B: twiddle (T stored as (n2[i2], n1[o1], L))
        z = f.mul(y, jnp.asarray(self.t12))
        # step C: contract i2 (rows)
        zc = jnp.swapaxes(z, 1, 2).reshape(bf * n1, n2, L)
        r_ = _fr_matmul(self.w2td, zc).reshape(bf, n1, n2, L)
        # out[o1 + n1*o2] = R[o1, o2]
        out = jnp.swapaxes(r_, 1, 2).reshape(*lead, self.n, L)
        return out


@functools.cache
def get_plan(n: int, kind: str) -> MatmulNTTPlan:
    """kind: 'fwd' | 'fwd_coset' | 'inv' | 'inv_coset' (coset generator g;
    inverse includes the 1/n factor, matching ntt.NTT semantics)."""
    omega = pow(FR_ROOT_OF_UNITY, (1 << FR_TWO_ADICITY) // n, R)
    g = FR_GENERATOR
    n_inv = pow(n, R - 2, R)
    if kind == "fwd":
        return MatmulNTTPlan(n, omega, 1, 1, 1)
    if kind == "fwd_coset":
        return MatmulNTTPlan(n, omega, g, 1, 1)
    om_inv = pow(omega, R - 2, R)
    if kind == "inv":
        return MatmulNTTPlan(n, om_inv, 1, 1, n_inv)
    if kind == "inv_coset":
        return MatmulNTTPlan(n, om_inv, 1, pow(g, R - 2, R), n_inv)
    raise ValueError(kind)
