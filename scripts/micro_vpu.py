"""Primitive-throughput microbenchmark for the TPU VPU/MXU.

Decides the field-multiplier design (docs/ROADMAP.md round-2 item 2): measures
elementwise u32 multiply / add / shift, f32 multiply-add, i32 multiply, and
int8 matmul (MXU) rates on the active backend, then reports the implied
ceiling for a 381-bit Montgomery multiply under each candidate design:

  A. current: 16-bit limbs in u32, lo/hi split, unrolled CIOS  (~6k u32 ops)
  B. 12-bit limbs in u32, no split, fold-matmul reduction      (~2.3k u32 ops)
  C. 8-bit digits in f32, FMA product phase, fold-matmul       (~2.6k f32 fma)

Usage: python scripts/micro_vpu.py   (run on the TPU; CPU numbers meaningless)
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / reps


def elementwise_rate(dtype, op, n=1 << 22, iters=256):
    """Gops/s for x = op(x, y) iterated; dependency chains are vector-wide so
    the loop is throughput-bound, not latency-bound."""
    x = jnp.arange(n, dtype=jnp.float32).astype(dtype)
    y = (jnp.arange(n, dtype=jnp.float32) * 3 + 1).astype(dtype)

    @jax.jit
    def run(x, y):
        def body(_, xy):
            x, y = xy
            return op(x, y), y

        x, y = jax.lax.fori_loop(0, iters, body, (x, y))
        return x

    dt = timed(run, x, y)
    return n * iters / dt / 1e9


def fma_rate(n=1 << 22, iters=256):
    x = jnp.arange(n, dtype=jnp.float32) * 1e-6
    y = x * 0.5 + 1.0

    @jax.jit
    def run(x, y):
        def body(_, xy):
            x, y = xy
            return x * y + x, y

        x, y = jax.lax.fori_loop(0, iters, body, (x, y))
        return x

    dt = timed(run, x, y)
    return n * iters / dt / 1e9  # Gfma/s (2 flops each)


def i8_matmul_rate(m=1 << 13, k=256, n=256, iters=32):
    a = jnp.ones((m, k), jnp.int8)
    b = jnp.ones((k, n), jnp.int8)

    @jax.jit
    def run(a, b):
        def body(_, acc):
            c = jax.lax.dot_general(
                a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
            )
            return acc + c[0, 0]

        return jax.lax.fori_loop(0, iters, body, jnp.int32(0))

    dt = timed(run, a, b)
    return m * k * n * iters / dt / 1e12  # Tmac/s


def main():
    print(f"backend: {jax.default_backend()}  {jax.devices()[0]}")
    u32 = jnp.uint32
    i32 = jnp.int32
    f32 = jnp.float32
    tests = [
        ("u32 mul", elementwise_rate(u32, lambda a, b: a * b)),
        ("u32 add", elementwise_rate(u32, lambda a, b: a + b)),
        ("u32 and+shr", elementwise_rate(u32, lambda a, b: (a & b) >> 7)),
        ("u32 mul+and (CIOS pair)", elementwise_rate(u32, lambda a, b: (a * b) & jnp.uint32(0xFFFF))),
        ("i32 mul", elementwise_rate(i32, lambda a, b: a * b)),
        ("f32 mul", elementwise_rate(f32, lambda a, b: a * b)),
        ("f32 fma", fma_rate()),
    ]
    for name, rate in tests:
        print(f"{name:28s} {rate:8.1f} Gop/s")
    mm = i8_matmul_rate()
    print(f"{'int8 matmul (MXU)':28s} {mm:8.2f} Tmac/s")

    # implied fq-mul ceilings (ops per multiply from kernel op counts)
    u32_rate = tests[0][1] * 1e9
    fma = tests[6][1] * 1e9
    print()
    print(f"design A (current, ~6000 u32 ops):   {u32_rate/6000/1e6:7.1f} M mul/s")
    print(f"design B (12-bit, ~2300 u32 ops):    {u32_rate/2300/1e6:7.1f} M mul/s")
    print(f"design C (8-bit f32, ~2600 fma):     {fma/2600/1e6:7.1f} M mul/s")


if __name__ == "__main__":
    main()
