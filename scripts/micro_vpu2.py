"""In-kernel VPU primitive throughput (honest version of micro_vpu.py).

micro_vpu.py's XLA fori_loop numbers are invalid: XLA reassociates the
repeated multiply into a power (24 Top/s "u32 mul" on a v5e is impossible).
Here each candidate op sequence runs UNROLLED inside one Pallas kernel on a
VMEM-resident (32, 512) tile with loop-index-dependent constants (nothing to
reassociate), grid-repeated over independent tiles. This is exactly the
execution shape of the fused field kernels, so the rates transfer.

Usage: python scripts/micro_vpu2.py   (on the TPU)
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS, TILE, NTILES, UNROLL = 32, 512, 64, 512


def build(kind: str):
    mask = np.uint32(0xFFFF)

    def kernel(x_ref, y_ref, o_ref):
        x = x_ref[:]
        y = y_ref[:]
        if kind == "u32_mul":
            for i in range(UNROLL):
                x = x * (y + np.uint32(i))  # 1 mul + 1 add per iter
        elif kind == "u32_mulmask":
            for i in range(UNROLL):
                x = (x * (y + np.uint32(i))) & mask  # mul+add+and
        elif kind == "u32_shift_add":
            for i in range(UNROLL):
                x = (x >> 1) + (y + np.uint32(i))  # shr+add+add
        elif kind == "f32_fma":
            for i in range(UNROLL):
                x = x * y + np.float32(i)  # one fma
        elif kind == "f32_mul_add":
            for i in range(UNROLL):
                x = x * (y + np.float32(i))  # mul + add
        elif kind == "cvt_f32_u32":
            for i in range(UNROLL // 2):
                f = (x + np.uint32(i)).astype(jnp.float32)
                x = f.astype(jnp.uint32)  # 2 cvts + add
        o_ref[:] = x.astype(o_ref.dtype)

    dt = jnp.float32 if kind.startswith("f32") else jnp.uint32
    bspec = pl.BlockSpec((ROWS, TILE), lambda i: (0, i), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(NTILES,),
        in_specs=[bspec, bspec],
        out_specs=bspec,
        out_shape=jax.ShapeDtypeStruct((ROWS, NTILES * TILE), dt),
    ), dt


OPS_PER_ITER = {
    "u32_mul": 2, "u32_mulmask": 3, "u32_shift_add": 3,
    "f32_fma": 1, "f32_mul_add": 2, "cvt_f32_u32": 1.5,
}


def main():
    print(f"backend: {jax.default_backend()}  {jax.devices()[0]}")
    lanes = ROWS * TILE * NTILES
    for kind, ops in OPS_PER_ITER.items():
        call, dt = build(kind)
        x = jnp.ones((ROWS, NTILES * TILE), dt)
        y = jnp.full((ROWS, NTILES * TILE), 3, dt)
        fn = jax.jit(lambda a, b: call(a, b))
        out = fn(x, y)
        jax.block_until_ready(out)
        t0 = time.time()
        reps = 10
        for _ in range(reps):
            out = fn(x, y)
        jax.block_until_ready(out)
        dt_s = (time.time() - t0) / reps
        iters = lanes * UNROLL
        print(f"{kind:16s} {iters/dt_s/1e9:9.1f} Giter/s  "
              f"(~{iters*ops/dt_s/1e9:9.1f} Gop/s at {ops} ops/iter)")


if __name__ == "__main__":
    main()
