"""Window-width sweep for the standalone 2^16 G1 MSM (the BASELINE micro
metric).  Single-part uniform-scalar MSMs sit at a different point of the
steps-vs-lanes tradeoff than the prover's multi-part skewed ones — this
prints Mpoints/s per window width so the bench default can be pinned to
data.  Usage: python scripts/sweep_msm_w.py [w ...]"""

import pathlib
import random
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import bench

bench._enable_compile_cache()

import jax
import numpy as np

from vote_saver_tpu.params import R
from vote_saver_tpu.ops import msm_sched as ms
from vote_saver_tpu.ops import curve_ops as co
from vote_saver_tpu.refimpl import jacobian as rj


def main():
    ws = [int(a) for a in sys.argv[1:]] or [10, 11, 12, 13]
    rng = random.Random(0xBE11C)
    n = 1 << 16
    pts = bench._bench_points(n)
    scalars = [rng.randrange(R) for _ in range(n)]
    exp_f = bench._CACHE / f"msm_expected_{n}.txt"
    expected = tuple(int(v) for v in exp_f.read_text().split()) if exp_f.exists() else rj.msm_host(pts, scalars)
    pxy = jax.device_put(ms.g1_affine_to_device(pts))
    for w in ws:
        sched = ms.build_schedule(scalars, w)
        codes = jax.device_put(sched.codes)
        mp = jax.device_put(sched.merge_part)
        mg = jax.device_put(sched.merge_gather)
        fn = ms._msm_device_jit("g1", sched.num_windows, sched.window_bits)
        t0 = time.time()
        res, exc = fn(pxy, codes, mp, mg)
        np.asarray(res[0])
        t_first = time.time() - t0
        ts = []
        for _ in range(5):
            t0 = time.time()
            res, _e = fn(pxy, codes, mp, mg)
            np.asarray(res[0])
            ts.append(time.time() - t0)
        dt = sorted(ts)[len(ts) // 2]
        got = co.g1_from_device(tuple(np.asarray(c) for c in res))[0]
        ok = got == expected
        print(
            f"w={w:2d} steps={sched.codes.shape[0]:4d} lanes={sched.lanes:6d} "
            f"entries={sched.total_entries} first={t_first:6.1f}s "
            f"median={dt*1e3:7.1f}ms  {n/dt/1e6:6.3f} Mpoints/s  "
            f"match={ok} reps={[round(t*1e3) for t in ts]}",
            flush=True,
        )


if __name__ == "__main__":
    main()
