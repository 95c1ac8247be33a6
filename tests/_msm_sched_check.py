"""Subprocess body for test_msm_sched.py — runs under VSTPU_LIMB_BITS=16
(the scheduled MSM's pallas layout), checking scheduler parity, oracle
correctness, orphan spill, and the doubling-corner fallback.  Prints one
CHECK line per assertion group; exits nonzero on any failure."""

import os
import pathlib
import random
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

os.environ.setdefault("VSTPU_LIMB_BITS", "16")
os.environ.setdefault("VSTPU_PALLAS_INTERPRET", "1")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

from vote_saver_tpu import native_bridge as nb
from vote_saver_tpu.params import R
from vote_saver_tpu.ops import msm as msm_mod
from vote_saver_tpu.ops import msm_sched as ms
from vote_saver_tpu.ops import curve_ops as co
from vote_saver_tpu.refimpl import curves as rc
from vote_saver_tpu.refimpl import jacobian as rj


def walk_points(n, seed=3):
    rng = random.Random(seed)
    deltas = [rc.g1_mul(rc.g1_gen, rng.randrange(1, 1 << 64)) for _ in range(8)]
    pts, cur = [], rc.g1_gen
    for i in range(n):
        pts.append(cur)
        cur = rc.g1_add(cur, deltas[i % 8])
    return pts


def run_sched(pts, limbs_list, env):
    os.environ["VSTPU_SCHED"] = env
    ms._SHAPE_MEMO.clear()
    inf_mask = np.array([p is None for p in pts])
    sch = ms.build_schedule_multi(limbs_list, 5, inf_mask)
    pxy = jax.device_put(ms.g1_affine_to_device(pts))
    res, exc = ms.msm_scheduled_async("g1", pxy, sch)
    return co.g1_from_device(res), bool(np.asarray(exc)), sch


def main():
    assert nb.available(), "native library must build"
    n = 160
    rng = random.Random(11)
    pts = walk_points(n)
    pts[5] = None
    s1 = [rng.randrange(R) for _ in range(n)]
    s1[17] = 0
    s2 = [rng.randrange(R) for _ in range(n)]
    l1, l2 = msm_mod.scalars_to_limbs(s1), msm_mod.scalars_to_limbs(s2)
    exp1, exp2 = rj.msm_host(pts, s1), rj.msm_host(pts, s2)

    out, exc, sch_nat = run_sched(pts, [l1, l2], "native")
    assert not exc and out[0] == exp1 and out[1] == exp2, "native sched wrong"
    print("CHECK native-multi ok")

    out, exc, sch_py = run_sched(pts, [l1, l2], "python")
    assert not exc and out[0] == exp1 and out[1] == exp2, "python sched wrong"
    assert sch_nat.total_entries == sch_py.total_entries
    print("CHECK python-parity ok")

    # hot bucket -> orphan lanes + merge rounds execute
    s_hot = [s1[0]] * n
    lh = msm_mod.scalars_to_limbs(s_hot)
    out, exc, sch = run_sched(pts, [lh], "native")
    assert sch.merge_idx.shape[0] > 0, "expected orphan merge rounds"
    assert not exc and out[0] == rj.msm_host(pts, s_hot), "orphan path wrong"
    print("CHECK orphan-spill ok")

    # duplicate (point, scalar) pairs -> true doubling in a bucket -> exc flag
    base = walk_points(8, seed=5)
    dpts = base + base
    sc = [random.Random(7).randrange(R) for _ in range(8)]
    dsc = sc + sc
    ms._SHAPE_MEMO.clear()
    sch = ms.build_schedule(dsc, 5, np.array([False] * 16))
    pxy = jax.device_put(ms.g1_affine_to_device(dpts))
    _res, exc = ms.msm_scheduled_async("g1", pxy, sch)
    assert bool(np.asarray(exc)), "doubling corner must raise exc"
    out = ms.msm_g1(dpts, dsc, window_bits=5)  # recovers via the var-base fallback
    got = co.g1_from_device(tuple(c[None] for c in out))[0]
    assert got == rj.msm_host(dpts, dsc), "fallback wrong"
    print("CHECK doubling-fallback ok")


if __name__ == "__main__":
    main()
    print("ALL-OK")
    sys.exit(0)
