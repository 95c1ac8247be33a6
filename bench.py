"""Benchmark harness — prints ONE JSON line for the driver.

Primary metric (BASELINE.json): G1 MSM Mpoints/s on the scheduled-bucket
Pippenger kernel (ops/msm_sched.py) at n=2^16 — the Groth16 prover's dominant
cost.  Secondary numbers ride along in "extra": fused Pallas field-mul and
curve-add throughput, NTT Mbutterflies/s.

Timing is dependency-forced: inputs are device-resident, every rep fetches a
scalar of the result to host (the axon remote backend otherwise reports
async-dispatch time, ~100x optimistic — measured).  vs_baseline is 1.0: the
reference publishes no numbers (BASELINE.md — measured, not inherited).
"""

from __future__ import annotations

import json
import pathlib
import random
import sys
import time

_REPO = pathlib.Path(__file__).resolve().parent


def _enable_compile_cache():
    import jax

    cache = _REPO / ".jax_cache"
    cache.mkdir(exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", str(cache))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _bench_points(n: int):
    """n distinct affine G1 points via a random walk (cached on disk).

    Random 64-bit step multiples keep bucket partial-sum collisions (the madd
    doubling corner) at negligible probability, unlike consecutive multiples.
    """
    import numpy as np

    from vote_saver_tpu.refimpl import curves as rc

    cache = _REPO / ".bench_cache"
    cache.mkdir(exist_ok=True)
    f = cache / f"g1_points_{n}.npy"
    if f.exists():
        arr = np.load(f, allow_pickle=True)
        return [tuple(int(v) for v in p) for p in arr]
    rng = random.Random(0xD15C)
    deltas = [rc.g1_mul(rc.g1_gen, rng.randrange(1, 1 << 64)) for _ in range(16)]
    pts, cur = [], rc.g1_gen
    for i in range(n):
        pts.append(cur)
        cur = rc.g1_add(cur, deltas[i % 16])
    np.save(f, np.array([[p[0], p[1]] for p in pts], dtype=object))
    return pts


def main():
    import jax
    import numpy as np

    _enable_compile_cache()

    from vote_saver_tpu.params import R, fq_spec, fr_spec
    from vote_saver_tpu.ops import limbs as lb
    from vote_saver_tpu.ops import msm_sched as ms
    from vote_saver_tpu.ops import pallas_field as pf
    from vote_saver_tpu.ops.ntt import get_ntt

    t_start = time.time()
    backend = jax.default_backend()
    rng = random.Random(0xBE11C)
    extra = {"backend": backend}

    # ---- scheduled MSM (primary) -------------------------------------------
    n = 1 << 16
    w = 10
    log(f"[bench] building {n} walk points ...")
    pts = _bench_points(n)
    scalars = [rng.randrange(R) for _ in range(n)]
    t0 = time.time()
    sched = ms.build_schedule(scalars, w)
    t_sched = time.time() - t0
    pxy = jax.device_put(ms.g1_affine_to_device(pts))
    codes = jax.device_put(sched.codes)
    mi = jax.device_put(sched.merge_idx)
    fn = ms._msm_device_jit("g1", sched.num_windows, sched.window_bits)
    t0 = time.time()
    res, exc = fn(pxy, codes, mi)
    np.asarray(res[0])
    log(f"[bench] msm compile+first: {time.time()-t0:.1f}s on {backend}; "
        f"host schedule {t_sched*1e3:.0f}ms; exc={bool(np.asarray(exc))}")
    reps = 5
    t0 = time.time()
    for _ in range(reps):
        res, _e = fn(pxy, codes, mi)
        np.asarray(res[0])  # host fetch forces completion
    msm_dt = (time.time() - t0) / reps
    msm_mpps = n / msm_dt / 1e6
    extra.update(
        msm_n=n, msm_window=w, msm_ms=round(msm_dt * 1e3, 1),
        msm_sched_host_ms=round(t_sched * 1e3, 1),
        msm_steps=int(sched.codes.shape[0]), msm_lanes=sched.lanes,
    )

    # ---- fused field mul / curve add (secondary) ---------------------------
    try:
        spec = fq_spec()
        B = 1 << 17
        xs = np.random.RandomState(0).randint(0, 1 << 16, size=(B, spec.num_limbs)).astype(np.uint32)
        ys = np.random.RandomState(1).randint(0, 1 << 16, size=(B, spec.num_limbs)).astype(np.uint32)
        xs[:, -1] = 0
        ys[:, -1] = 0
        xs, ys = jax.device_put(xs), jax.device_put(ys)
        mul_pl = jax.jit(lambda a, b: pf.mont_mul_pallas("fq", a, b))
        v = mul_pl(xs, ys)
        np.asarray(v[0])
        t0 = time.time()
        N = 20
        v = xs
        for _ in range(N):
            v = mul_pl(v, ys)
        np.asarray(v[0])
        dt = (time.time() - t0) / N
        extra["fq_mul_mps"] = round(B / dt / 1e6, 1)
    except Exception as e:  # pragma: no cover
        log(f"[bench] fq mul skipped: {e}")

    # ---- NTT (secondary; skipped when the compile budget is spent) ---------
    if time.time() - t_start < 900:
        try:
            dom = 1 << 14
            ntt = get_ntt(dom)
            spec = fr_spec()
            coeffs = jax.device_put(
                lb.ints_to_mont_limbs([rng.randrange(R) for _ in range(dom)], spec)
            )
            fn_ntt = jax.jit(ntt.ntt)
            v = fn_ntt(coeffs)
            np.asarray(v[0])
            t0 = time.time()
            v = coeffs
            for _ in range(10):
                v = fn_ntt(v)
            np.asarray(v[0])
            ntt_dt = (time.time() - t0) / 10
            butterflies = dom // 2 * (dom.bit_length() - 1)
            extra["ntt_mbutterflies_per_s"] = round(butterflies / ntt_dt / 1e6, 2)
            extra["ntt_domain"] = dom
        except Exception as e:  # pragma: no cover
            log(f"[bench] ntt skipped: {e}")

    print(
        json.dumps(
            {
                "metric": "msm_g1_mpoints_per_s",
                "value": round(msm_mpps, 5),
                "unit": "Mpoints/s",
                "vs_baseline": 1.0,
                "extra": extra,
            }
        )
    )


if __name__ == "__main__":
    main()
