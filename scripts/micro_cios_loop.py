"""Compile-time/runtime A/B: unrolled CIOS vs loop-CIOS Montgomery multiply.

The G2 madd Mosaic kernel costs ~410 s of every cold start (docs/TRACE_r04.md)
because each of its ~36 Fq multiplies is fully unrolled (L^2 = 256 limb
products + 256 reduction MACs as straight-line code).  The loop-CIOS variant
rolls the i-loop of the classic CIOS formulation into a lax.fori_loop whose
body is ~2L MACs: same arithmetic, ~L-fold smaller kernel code.

Measured variants (each at the production (L, 8, 128) tile, 14 tiles):
  v1        unrolled lazy-column CIOS (pallas_field.FqEmit.mul) - baseline
  loop      loop-CIOS, body compiled once via lax.fori_loop

Usage:  python scripts/micro_cios_loop.py [unroll] [variants...]
"""

import os
import pathlib
import random
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import bench

bench._enable_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vote_saver_tpu.params import Q, fq_spec
from vote_saver_tpu.ops import pallas_field as pf

S = int(os.environ.get("MS", "8"))
T = int(os.environ.get("MT", "128"))
NTILES = int(os.environ.get("MNT", "14"))
UNROLL = int(sys.argv[1]) if len(sys.argv) > 1 else 8
spec = fq_spec()
L = spec.num_limbs
MASK = np.uint32(spec.mask)
N0INV = np.uint32(spec.n0_inv)
N_INTS = [np.uint32(int(v)) for v in spec.to_limbs(spec.modulus)]


def _ripple_csub(emit, rows):
    return emit._stack(emit._csub_n(emit._ripple(rows)))


def loop_mul(emit, a, b):
    """Loop-CIOS product of (L, S, T) canonical values; body = 2L MACs.

    Mosaic cannot lower dynamic_slice on in-kernel values, so a's limbs are
    consumed by ROTATION: the loop carry holds (t, a_rot) and each iteration
    uses a_rot[0] then rotates by one (static slices + concat)."""
    zero = jnp.zeros_like(a[0])
    t0 = jnp.zeros((L + 1,) + a.shape[1:], jnp.uint32)

    def body(_i, carry):
        t, a_rot = carry
        ai = a_rot[0]
        rows = [t[j] for j in range(L + 1)]
        for j in range(L):
            p = ai * b[j]
            rows[j] = rows[j] + (p & MASK)
            rows[j + 1] = rows[j + 1] + (p >> 16)
        m = (rows[0] * N0INV) & MASK
        for j in range(L):
            p = m * N_INTS[j]
            rows[j] = rows[j] + (p & MASK)
            rows[j + 1] = rows[j + 1] + (p >> 16)
        carry_w = rows[0] >> 16
        shifted = [rows[1] + carry_w] + rows[2:] + [zero]
        return jnp.stack(shifted), jnp.concatenate([a_rot[1:], a_rot[:1]])

    t, _ = jax.lax.fori_loop(0, L, body, (t0, a))
    return _ripple_csub(emit, [t[j] for j in range(L)])


def make_call(variant: str):
    emit = pf.FqEmit(spec)

    def kernel(a_ref, b_ref, o_ref, o2_ref):
        a = a_ref[:]
        b = b_ref[:]
        if variant == "v1":
            mul = emit.mul
        elif variant == "loop":
            mul = lambda x, y: loop_mul(emit, x, y)
        else:
            raise SystemExit(f"unknown variant {variant}")

        chains = [a] + [
            jnp.concatenate([a[k:], a[:k]], axis=0) for k in (1, 2, 3)
        ]
        for _ in range(UNROLL):
            chains = [mul(c, b) for c in chains]
        o_ref[:] = chains[0]
        rest = chains[1]
        for c in chains[2:]:
            rest = emit.add(rest, c)
        o2_ref[:] = rest

    bspec = pl.BlockSpec((L, S, T), lambda i: (0, i, 0), memory_space=pltpu.VMEM)
    shp = jax.ShapeDtypeStruct((L, NTILES * S, T), jnp.uint32)
    return pl.pallas_call(
        kernel,
        grid=(NTILES,),
        in_specs=[bspec, bspec],
        out_specs=(bspec, bspec),
        out_shape=(shp, shp),
        interpret=pf._interpret(),
    )


def run(variant: str):
    B = NTILES * S * T
    rng = random.Random(7)
    xs = [rng.randrange(Q) for _ in range(B)]
    ys = [rng.randrange(Q) for _ in range(B)]
    a = np.array([spec.to_limbs(v) for v in xs], np.uint32).T.reshape(L, NTILES * S, T)
    b = np.array([spec.to_limbs(v) for v in ys], np.uint32).T.reshape(L, NTILES * S, T)
    a = jax.device_put(np.ascontiguousarray(a))
    b = jax.device_put(np.ascontiguousarray(b))
    call = make_call(variant)
    fn = jax.jit(call)
    t0 = time.time()
    out = fn(a, b)
    np.asarray(out[0])
    t_compile = time.time() - t0
    reps = 20
    x = a
    t0 = time.time()
    for _ in range(reps):
        x, _rest = fn(x, b)
    np.asarray(x)
    dt = (time.time() - t0) / reps
    # parity: chain 0 is chained reps*UNROLL deep on elt 0
    want = xs[0]
    rinv = spec.mont_r_inv
    for _ in range(reps * UNROLL):
        want = want * ys[0] % Q * rinv % Q
    got = spec.from_limbs(np.asarray(x)[:, 0, 0])
    ok = got == want
    mps = B * UNROLL * 4 / dt / 1e6
    print(
        f"{variant:6s} compile={t_compile:7.1f}s  {mps:7.1f} M mul/s  "
        f"({dt*1e3:.1f} ms/call)  parity={'OK' if ok else 'FAIL'}",
        flush=True,
    )


if __name__ == "__main__":
    for v in sys.argv[2:] or ("loop", "v1"):
        run(v)
