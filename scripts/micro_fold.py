"""A/B the v1 (CIOS) vs fold (MXU-matmul) multiplier in the REAL kernels.

Parity on any backend; timing meaningful on the TPU:

    python scripts/micro_fold.py parity   # small B, checks both modes vs ints
    python scripts/micro_fold.py bench    # times mont_mul + g1_madd, both modes
"""

import os
import pathlib
import random
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax

if os.environ.get("JAX_PLATFORMS") == "cpu":
    # the axon TPU plugin ignores JAX_PLATFORMS; the config update sticks
    jax.config.update("jax_platforms", "cpu")

_cache = pathlib.Path(__file__).resolve().parent.parent / ".jax_cache"
_cache.mkdir(exist_ok=True)
jax.config.update("jax_compilation_cache_dir", str(_cache))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import numpy as np


def _mode(m):
    os.environ["VSTPU_MUL"] = m


def parity():
    import jax.numpy as jnp

    from vote_saver_tpu.params import fq_spec, Q
    from vote_saver_tpu.ops import pallas_field as pf

    spec = fq_spec()
    rng = random.Random(1)
    B = 128
    xs = [rng.randrange(Q) for _ in range(B)]
    ys = [rng.randrange(Q) for _ in range(B)]
    xs[:3] = [0, 1, Q - 1]
    ys[:3] = [Q - 1, Q - 1, Q - 1]
    a = np.array([spec.to_limbs(x) for x in xs], dtype=np.uint32)
    b = np.array([spec.to_limbs(y) for y in ys], dtype=np.uint32)
    want = [(x * y * spec.mont_r_inv) % Q for x, y in zip(xs, ys)]
    for m in ("v1", "fold"):
        _mode(m)
        got = np.asarray(pf.mont_mul_pallas("fq", a, b))
        got_i = [spec.from_limbs(r) for r in got]
        assert got_i == want, f"mode {m} mismatch"
        print(f"parity {m}: OK")

    # madd parity between modes (full Jacobian mixed add, random points)
    from vote_saver_tpu.refimpl import curves as rc

    n = 256
    pts = []
    p = rc.g1_gen
    for _ in range(n):
        pts.append(p)
        p = rc.g1_add(p, rc.g1_gen)
    js = [rc.g1_to_jacobian(q) for q in pts[n // 2:]] if hasattr(rc, "g1_to_jacobian") else None
    accx = np.array([spec.to_limbs(spec.to_mont(q[0])) for q in pts[: n // 2]], np.uint32)
    accy = np.array([spec.to_limbs(spec.to_mont(q[1])) for q in pts[: n // 2]], np.uint32)
    accz = np.array([spec.to_limbs(spec.to_mont(1))] * (n // 2), np.uint32)
    qx = np.array([spec.to_limbs(spec.to_mont(q[0])) for q in pts[n // 2:]], np.uint32)
    qy = np.array([spec.to_limbs(spec.to_mont(q[1])) for q in pts[n // 2:]], np.uint32)
    sign = np.zeros(n // 2, bool)
    active = np.ones(n // 2, bool)
    outs = {}
    for m in ("v1", "fold"):
        _mode(m)
        (ox, oy, oz), exc = pf.g1_madd_pallas((accx, accy, accz), (qx, qy), sign, active)
        outs[m] = (np.asarray(ox), np.asarray(oy), np.asarray(oz), np.asarray(exc))
    for i in range(3):
        assert np.array_equal(outs["v1"][i], outs["fold"][i]), f"madd coord {i}"
    assert np.array_equal(outs["v1"][3], outs["fold"][3])
    print("madd parity v1 == fold: OK")


def bench():
    import jax.numpy as jnp

    from vote_saver_tpu.params import fq_spec
    from vote_saver_tpu.ops import pallas_field as pf

    spec = fq_spec()
    B = 1 << 17
    rs = np.random.RandomState(0)
    a = rs.randint(0, 1 << 16, size=(B, spec.num_limbs)).astype(np.uint32)
    bb = rs.randint(0, 1 << 16, size=(B, spec.num_limbs)).astype(np.uint32)
    a[:, -1] = 0
    bb[:, -1] = 0
    a, bb = jax.device_put(a), jax.device_put(bb)
    for m in ("v1", "fold"):
        _mode(m)
        fn = jax.jit(lambda x, y: pf.mont_mul_pallas("fq", x, y))
        t0 = time.time()
        v = fn(a, bb)
        np.asarray(v[0])
        compile_s = time.time() - t0
        t0 = time.time()
        N = 20
        v = a
        for _ in range(N):
            v = fn(v, bb)
        np.asarray(v[0])
        dt = (time.time() - t0) / N
        print(f"mul[{m}]: {B/dt/1e6:8.1f} M mul/s   (compile {compile_s:.1f}s)")

    lanes = 14336
    accx = jax.device_put(rs.randint(0, 1 << 16, size=(lanes, spec.num_limbs)).astype(np.uint32))
    accy = accx
    accz = accx
    qx = accx
    qy = accx
    sign = jax.device_put(np.zeros(lanes, bool))
    active = jax.device_put(np.ones(lanes, bool))
    for m in ("v1", "fold"):
        _mode(m)
        fn = jax.jit(lambda c, q, s, act: pf.g1_madd_pallas(c, q, s, act))
        t0 = time.time()
        (ox, oy, oz), exc = fn((accx, accy, accz), (qx, qy), sign, active)
        np.asarray(exc)
        compile_s = time.time() - t0
        t0 = time.time()
        N = 20
        c = (accx, accy, accz)
        for _ in range(N):
            c, exc = fn(c, (qx, qy), sign, active)
        np.asarray(exc)
        dt = (time.time() - t0) / N
        print(f"madd[{m}]: {dt*1e3:7.2f} ms / {lanes} lanes "
              f"({lanes/dt/1e6:6.2f} M madd/s; compile {compile_s:.1f}s)")


if __name__ == "__main__":
    if sys.argv[1] == "parity":
        parity()
    else:
        bench()
