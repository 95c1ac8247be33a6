"""In-kernel chained field-mul throughput — the honest mul ceiling.

Times a Pallas kernel running UNROLL back-to-back *dependent* Montgomery
multiplies on a VMEM-resident (L, TILE) tile with the real emitters
(pallas_field.FqEmit / FqEmitFold).  No layout conversion, no HBM traffic
per mul — this is the number the fused curve kernels can actually reach,
and the decision input for the multiplier design (VERDICT round-3 item 1).

Usage: python scripts/micro_mul_chain.py [unroll] (on the TPU)
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_cache = pathlib.Path(__file__).resolve().parent.parent / ".jax_cache"
_cache.mkdir(exist_ok=True)
jax.config.update("jax_compilation_cache_dir", str(_cache))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from vote_saver_tpu.params import fq_spec, Q
from vote_saver_tpu.ops import pallas_field as pf

# Kernel layout matches the production curve kernels: (L, S, T) tiles with
# S sublanes x T lanes = full (8, 128) vreg density.  (An earlier version of
# this script used 2-D (L, TILE) blocks — 1 sublane per vreg, i.e. the v1
# layout mistake pallas_field's module docstring describes — and measured
# both multipliers ~8x below their real rate.)
S = 8
T = 128
NTILES = 14
UNROLL = int(sys.argv[1]) if len(sys.argv) > 1 else 16


def build(mode: str):
    spec = fq_spec()
    emit = pf._make_emit(spec, mode)
    L = emit.L
    extras, extra_specs, bind = pf._fold_inputs(emit)
    ne = len(extras)

    def kernel(*refs):
        bind(refs[2]) if ne else None
        x = refs[0][:]
        y = refs[1][:]
        for _ in range(UNROLL):
            x = emit.mul(x, y)
        refs[2 + ne][:] = x

    bspec = pl.BlockSpec((L, S, T), lambda i: (0, i, 0), memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        grid=(NTILES,),
        in_specs=[bspec, bspec] + list(extra_specs),
        out_specs=bspec,
        out_shape=jax.ShapeDtypeStruct((L, NTILES * S, T), jnp.uint32),
        interpret=pf._interpret(),
    )
    return lambda a, b: call(a, b, *extras), L


def main():
    import random

    spec = fq_spec()
    rng = random.Random(7)
    B = NTILES * S * T
    xs = [rng.randrange(Q) for _ in range(B)]
    ys = [rng.randrange(Q) for _ in range(B)]
    a = np.array([spec.to_limbs(v) for v in xs], np.uint32).T.reshape(
        spec.num_limbs, NTILES * S, T
    ).copy()
    b = np.array([spec.to_limbs(v) for v in ys], np.uint32).T.reshape(
        spec.num_limbs, NTILES * S, T
    ).copy()
    a, b = jax.device_put(a), jax.device_put(b)
    for mode in ("v1", "fold"):
        call, L = build(mode)
        fn = jax.jit(call)
        t0 = time.time()
        out = fn(a, b)
        np.asarray(out)  # axon tunnel: block_until_ready doesn't force exec
        compile_s = time.time() - t0
        reps = 20
        t0 = time.time()
        x = a
        for _ in range(reps):
            x = fn(x, b)
        out = x
        np.asarray(out)
        dt = (time.time() - t0) / reps
        muls = B * UNROLL
        print(f"chain[{mode}] unroll={UNROLL}: {muls/dt/1e6:8.1f} M mul/s "
              f"({dt*1e6:.0f} us/call; compile {compile_s:.1f}s)")
        # parity spot check (first element; `out` is chained reps*UNROLL deep)
        got = np.asarray(out)[:, 0, 0]
        want = xs[0]
        rinv = spec.mont_r_inv
        for _ in range(reps * UNROLL):
            want = want * ys[0] % Q * rinv % Q
        assert spec.from_limbs(got) == want, f"{mode} parity"


if __name__ == "__main__":
    main()
