"""Matmul-fold Montgomery multiplication — MXU-assisted field mul (v2).

The v1 multiplier (field_ops.FieldOps.mul / pallas_field.FqEmit.mul) spends
~half its VPU ops in the L-step Montgomery fold-in.  Here the whole reduction
is ONE small constant matmul that rides the MXU (the same machinery as
ntt_mxu._fold_mod_r, generalised to any field and to the 2L-column product of
two elements):

  1. product phase: operands split into 8-bit digits, column c accumulates
     sum_{i+j=c} a_i*b_j as exact f32 FMAs (columns < 2^22);
  2. fold: each column splits into <=3 8-bit pieces; one bf16 matmul against
     a constant matrix whose row (c,t) holds the *balanced* base-256 digits
     of 2^(8(c+t)) * R_mont^-1 * 2^(2*lb) mod N — every product is an exact
     bf16 pair (both factors < 2^8), accumulation < 2^24 stays exact in f32;
  3. two Montgomery word-steps divide the 2^(2*lb) pre-scale back out and
     shrink the result below 2N; a conditional subtract canonicalises.

Output == (a * b * R_mont^-1) mod N bit-for-bit with the v1 path (enforced by
tests/test_fold_mul.py).  The entry point here is the XLA-level reference;
pallas_field wires the same emitter steps inside its fused curve kernels.

Replaces the scalar Montgomery ladder the reference inherits from
crypto3::multiprecision (reference common.hpp:32-40 usage sites); ROADMAP
round-2 item 2 (MXU exact-matmul multiplier).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..params import FieldSpec, fq_spec, fr_spec

DIGIT_BITS = 8
PIECE_BITS = 8


def _balanced256_host(v: int, nd: int) -> list[int]:
    """v >= 0 -> nd balanced base-256 digits in [-128, 127]."""
    digs = []
    carry = 0
    for _ in range(nd):
        t = (v & 255) + carry
        v >>= 8
        if t > 127:
            digs.append(t - 256)
            carry = 1
        else:
            digs.append(t)
            carry = 0
    assert carry == 0 and v == 0
    return digs


@functools.cache
def plan(spec: FieldSpec):
    """Static geometry + constant matrix for one field's fold pipeline."""
    assert spec.limb_bits == 16, "fold path is the 16-bit-limb TPU layout"
    N = spec.modulus
    L = spec.num_limbs
    lb = spec.limb_bits
    nd = 2 * L  # 8-bit digits per operand (L 16-bit limbs)
    ncols = 2 * nd - 1  # product columns
    # column bound: <= nd * 255^2 < 2^22 -> 3 pieces of 8 bits
    npieces = 3
    # bytes of the folded value G < rows * 255 * 127 * N  (rows = ncols*npieces)
    rows = ncols * npieces
    gmax = rows * 255 * 128 * N
    nbytes = (gmax.bit_length() + 7) // 8 + 1
    pre_shift = 2 * lb  # cancelled by two word-steps
    rinv = pow(spec.mont_r, N - 2, N)
    mat = np.zeros((rows, nbytes), dtype=np.int8)
    for c in range(ncols):
        for t in range(npieces):
            w = (pow(2, DIGIT_BITS * (c + t) + pre_shift, N) * rinv) % N
            mat[c * npieces + t] = _balanced256_host(w, nbytes)
    # sanity: f32-exactness of the matmul accumulation
    assert rows * 255 * 128 < (1 << 24)
    return dict(
        spec=spec, L=L, lb=lb, nd=nd, ncols=ncols, npieces=npieces,
        nbytes=nbytes, mat=mat,
        n_limbs=[int(v) for v in spec.to_limbs(N)],
        n0_inv=np.uint32(spec.n0_inv),
    )


# ---------------------------------------------------------------------------
# Emitter steps — shared by the XLA path below and the Pallas kernels.
# All operate on rows: lists of (B,)-shaped (or (..., B)) arrays.
# ---------------------------------------------------------------------------


def digit_rows(p, x):
    """(.., L, B) u32 16-bit limbs -> list of nd (.., B) f32 8-bit digits."""
    out = []
    for k in range(p["nd"]):
        limb = x[..., k // 2, :]
        d = (limb >> (8 * (k % 2))) & np.uint32(255)
        # Mosaic has no u32->f32 cast; hop through i32 (values < 256, exact)
        out.append(d.astype(jnp.int32).astype(jnp.float32))
    return out


def product_columns(p, da, db):
    """Schoolbook digit product: ncols exact-f32 columns (each < 2^22)."""
    nd = p["nd"]
    cols = [None] * p["ncols"]
    for i in range(nd):
        for j in range(nd):
            t = da[i] * db[j]
            c = i + j
            cols[c] = t if cols[c] is None else cols[c] + t
    return cols


def square_columns(p, da):
    """Symmetric product: ~half the FMAs of product_columns."""
    nd = p["nd"]
    cols = [None] * p["ncols"]

    def acc(c, t):
        cols[c] = t if cols[c] is None else cols[c] + t

    for i in range(nd):
        acc(2 * i, da[i] * da[i])
        for j in range(i + 1, nd):
            t = da[i] * da[j]
            acc(i + j, t + t)
    return cols


def fold_columns(p, cols, mat_t):
    """ncols f32 columns -> L+1 u32 limb rows of the reduced value (< 2N
    across L limbs; the +1 row is the csub headroom and is always 0).

    mat_t: the constant matrix TRANSPOSED, (nbytes, rows), bf16 (a kernel
    input on the Pallas path).
    """
    L, lb = p["L"], p["lb"]
    # pieces: (rows, B) bf16; integer-valued < 2^8 -> exact in bf16
    pieces = []
    for c in range(p["ncols"]):
        v = cols[c]
        for t in range(p["npieces"]):
            scale = np.float32(1.0 / (1 << (PIECE_BITS * t)))
            hi = jnp.floor(v * scale)
            lo = hi - jnp.floor(hi * np.float32(1.0 / 256.0)) * np.float32(256.0)
            pieces.append(lo)
    stacked = jnp.stack(pieces, axis=-2).astype(jnp.bfloat16)  # (.., rows, B)
    g = jax.lax.dot_general(
        mat_t, stacked,
        (((1,), (stacked.ndim - 2,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (nbytes, .., B) signed byte coefficients, |.| < 2^24, exact
    g = jnp.moveaxis(g, 0, -2).astype(jnp.int32)  # (.., nbytes, B)
    # byte carry pass (signed -> canonical bytes)
    outb = []
    carry = jnp.zeros_like(g[..., 0, :])
    for d in range(p["nbytes"]):
        t = g[..., d, :] + carry
        outb.append(t & 255)
        carry = t >> 8  # arithmetic shift, exact for signed
    # (value is nonnegative: each fold row is the balanced form of a value
    #  in [0, N) and the pieces are nonnegative, so the final carry is 0)
    # pack bytes -> 16-bit limb rows (possibly more than L+2)
    nl = (p["nbytes"] + 1) // 2
    limbs = []
    for k in range(nl):
        lo = outb[2 * k]
        hi = outb[2 * k + 1] if 2 * k + 1 < p["nbytes"] else jnp.zeros_like(lo)
        limbs.append((lo + (hi << 8)).astype(jnp.uint32))
    # two Montgomery word-steps: divide out the 2^(2*lb) pre-scale;
    # value < 2^(2*lb+2) * N -> after two steps < 2N (+ zero tail)
    mask = np.uint32((1 << lb) - 1)
    n = [np.uint32(v) for v in p["n_limbs"]]
    for _ in range(2):
        m = (limbs[0] * p["n0_inv"]) & mask
        c = (limbs[0] + m * n[0]) >> lb
        nxt = []
        for k in range(1, len(limbs)):
            t = limbs[k] + c
            if k < L:
                t = t + m * n[k]
            nxt.append(t & mask)
            c = t >> lb
        nxt.append(c)
        limbs = nxt
    return limbs[: L + 1]


def csub_rows(p, rows):
    """L+1 canonical limb rows, value < 2N -> L rows canonical (< N)."""
    L, lb = p["L"], p["lb"]
    n_ext = [np.uint32(v) for v in p["n_limbs"]] + [np.uint32(0)]
    borrow = jnp.zeros_like(rows[0])
    diff = []
    mask = np.uint32((1 << lb) - 1)
    for k in range(L + 1):
        t = rows[k] - n_ext[k] - borrow
        diff.append(t & mask)
        borrow = (t >> lb) & np.uint32(1)
    ge = borrow == 0
    return [jnp.where(ge, d, r) for d, r in zip(diff, rows)][:L]


# ---------------------------------------------------------------------------
# XLA-level entry point (kernel-layout free): (..., L) u32 in/out.
# ---------------------------------------------------------------------------


def mul_fold(name: str, a, b):
    """Montgomery product via the fold pipeline; (..., L) u32 arrays."""
    return mul_fold_spec(fq_spec() if name == "fq" else fr_spec(), a, b)


def mul_fold_spec(spec: FieldSpec, a, b):
    p = plan(spec)
    a = jnp.asarray(a, jnp.uint32)
    b = jnp.asarray(b, jnp.uint32)
    shape = jnp.broadcast_shapes(a.shape, b.shape)
    # fake unit B axis after the limb axis: (..., L, 1)
    a = jnp.broadcast_to(a, shape)[..., :, None]
    b = jnp.broadcast_to(b, shape)[..., :, None]
    da = digit_rows(p, a)
    db = digit_rows(p, b)
    cols = product_columns(p, da, db)
    mat_t = jnp.asarray(np.ascontiguousarray(p["mat"].T), jnp.bfloat16)
    rows = fold_columns(p, cols, mat_t)
    rows = csub_rows(p, rows)
    out = jnp.stack(rows, axis=-1)[..., 0, :]  # drop fake B
    return out.astype(jnp.uint32)
