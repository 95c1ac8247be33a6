"""Dissect the prover's scheduled-MSM device time: schedule geometry and
per-phase (bucket scan / merge / suffix+total / horner) timing for the real
depth-6 B=16 shapes."""

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

from vote_saver_tpu.params import R, fr_spec
from vote_saver_tpu.ops import limbs as lb, msm_sched as ms
from vote_saver_tpu.protocol import phases


def timed(fn, *a):
    out = fn(*a)
    jax.block_until_ready(out)
    t0 = time.time()
    out = fn(*a)
    jax.block_until_ready(out)
    return out, time.time() - t0


def main():
    depth, B = 6, 16
    blobs = bench._election_artifacts(depth, 64, B)
    ctx = phases.prepare_vote_context(
        depth, 64, blobs["tree"], blobs["rt"], blobs["eid"],
        blobs["pk_eid"], blobs["pk_crs"], blobs["vk_crs"],
    )
    pk = ctx.pk
    spec = fr_spec()
    nvars = pk.num_vars if hasattr(pk, "num_vars") else len(pk.a_pts) - 0
    print(f"a_pts={len(pk.a_pts)} b1={len(pk.b1_pts)} b2={len(pk.b2_pts)} "
          f"l={len(pk.l_pts)} h={len(pk.h_pts)} domain={pk.domain} "
          f"num_primary={pk.num_primary}")
    rng = random.Random(3)
    m = len(pk.a_pts)
    w_limbs = [lb.ints_to_limbs([rng.randrange(R) for _ in range(m)], spec)
               for _ in range(B)]
    aux = [wl[pk.num_primary + 1:] for wl in w_limbs]
    h_limbs = [lb.ints_to_limbs([rng.randrange(R) for _ in range(pk.domain - 1)], spec)
               for _ in range(B)]

    for name, ll in (("w", w_limbs), ("aux", aux), ("h", h_limbs)):
        t0 = time.time()
        sch = ms.build_schedule_multi(ll)
        print(f"sched[{name}]: steps={sch.codes.shape[0]} lanes={sch.lanes} "
              f"windows={sch.num_windows} parts={sch.num_parts} "
              f"entries={sch.total_entries} merge_rounds={sch.merge_idx.shape[0]} "
              f"build={time.time()-t0:.2f}s")
        if name == "w":
            sch_w = sch
        elif name == "aux":
            sch_aux = sch
        else:
            sch_h = sch

    from vote_saver_tpu.protocol.groth16 import _devaff

    # full per-query timing
    for qname, group, sch in (("a", "g1", sch_w), ("b1", "g1", sch_w),
                              ("b2", "g2", sch_w), ("l", "g1", sch_aux),
                              ("h", "g1", sch_h)):
        pts = _devaff(pk, qname)
        fn = lambda: ms.msm_scheduled_async(group, pts, sch)
        (res, exc), dt = timed(fn)
        print(f"msm[{qname}] full: {dt:.2f}s")

    # phase split for the 'a' query: bucket scan only vs suffix vs horner
    sch = sch_w
    ops = ms._ops("g1")
    K, w, parts = sch.num_windows, sch.window_bits, sch.num_parts
    pts = _devaff(pk, "a")
    codes = jnp.asarray(sch.codes)
    merge = jnp.asarray(sch.merge_idx)

    madd = ms._madd("g1")
    bw = 1 << (w - 1)

    @jax.jit
    def bucket_only(pxy, codes):
        lanes = codes.shape[1]
        acc = ms._infinity(ops, lanes, False)
        exc0 = jnp.zeros((lanes,), jnp.uint32)
        px, py = pxy

        def body(carry, code_row):
            acc, exc = carry
            active = code_row != 0
            sign = (code_row >> 30) & 1
            pidx = jnp.maximum((code_row & ms._IDX_MASK) - 1, 0)
            qx = jnp.take(px, pidx, axis=0)
            qy = jnp.take(py, pidx, axis=0)
            acc, e = madd(acc, (qx, qy), sign.astype(bool), active)
            return (acc, exc | e), None

        (acc, exc), _ = jax.lax.scan(body, (acc, exc0), codes)
        return acc

    acc, dt = timed(bucket_only, pts, codes)
    print(f"a: bucket scan ({sch.codes.shape[0]} steps x {sch.lanes} lanes): {dt:.2f}s")

    @jax.jit
    def suffix_only(acc):
        return ms._suffix_and_total(ops, acc, K * parts, bw)

    sums, dt = timed(suffix_only, acc)
    print(f"a: suffix+total ({K*parts} windows x {bw} buckets): {dt:.2f}s")

    @jax.jit
    def horner_only(sums):
        return ms._horner(ops, sums, w, parts)

    _, dt = timed(horner_only, sums)
    print(f"a: horner: {dt:.2f}s")


if __name__ == "__main__":
    main()
