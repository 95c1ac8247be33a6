"""Dissect the prover's scheduled-MSM device time: schedule geometry and
per-phase (bucket scan / merge / suffix+total / horner) timing for the real
depth-6 B=16 shapes."""

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

from vote_saver_tpu.params import R, fr_spec
from vote_saver_tpu.ops import limbs as lb, msm_sched as ms
from vote_saver_tpu.protocol import phases


def _force(out):
    """block_until_ready is a no-op on the axon backend (async dispatch);
    only a host fetch actually drains the queue."""
    for leaf in jax.tree_util.tree_leaves(out):
        np.asarray(leaf)


def timed(fn, *a):
    out = fn(*a)
    _force(out)
    t0 = time.time()
    out = fn(*a)
    _force(out)
    return out, time.time() - t0


def main():
    depth, B = 6, 16
    W = int(sys.argv[1]) if len(sys.argv) > 1 else ms.default_window_bits()
    os.environ["VSTPU_MSM_W"] = str(W)
    print(f"=== window_bits={W} ===")
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
              f"entries={sch.total_entries} orphans={int((sch.merge_gather != 0).sum())} "
              f"build={time.time()-t0:.2f}s")
        if name == "w":
            sch_w = sch
        elif name == "aux":
            sch_aux = sch
        else:
            sch_h = sch

    from vote_saver_tpu.protocol.groth16 import _devaff

    # tunnel upload bandwidth probe: the per-batch codes matrices are the
    # big per-rep host->device transfer
    for nm, sch in (("w", sch_w), ("h", sch_h)):
        arr = np.ascontiguousarray(sch.codes)
        t0 = time.time()
        d = jax.device_put(arr)
        jax.block_until_ready(d)
        dt = time.time() - t0
        mb = arr.nbytes / 1e6
        print(f"upload codes[{nm}]: {mb:.1f} MB in {dt:.2f}s = {mb/dt:.1f} MB/s",
              flush=True)

    # full per-query timing
    for qname, group, sch in (("a", "g1", sch_w), ("b1", "g1", sch_w),
                              ("b2", "g2", sch_w), ("l", "g1", sch_aux),
                              ("h", "g1", sch_h)):
        pts = _devaff(pk, qname)
        fn = lambda: ms.msm_scheduled_async(group, pts, sch)
        (res, exc), dt = timed(fn)
        print(f"msm[{qname}] full: {dt:.2f}s")

    # phase split (bucket scan / suffix / horner); G2 split only on --g2 (its
    # bucket-scan program is a fresh ~400 s compile on the axon backend)
    splits = [("a", "g1")] + ([("b2", "g2")] if "--g2" in sys.argv else [])
    for qname, group in splits:
        sch = sch_w
        ops = ms._ops(group)
        g2 = group == "g2"
        K, w, parts = sch.num_windows, sch.window_bits, sch.num_parts
        pts = _devaff(pk, qname)
        codes = jnp.asarray(sch.codes)

        madd = ms._madd(group)
        bw = 1 << (w - 1)

        @jax.jit
        def bucket_only(pxy, codes):
            lanes = codes.shape[1]
            acc = ms._infinity(ops, lanes, g2)
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
        print(f"{qname}: bucket scan ({sch.codes.shape[0]} steps x "
              f"{sch.lanes} lanes): {dt:.2f}s", flush=True)

        addx = ms._addx(group)

        @jax.jit
        def suffix_only(acc):
            return ms._suffix_and_total(ops, addx, acc, K * parts, bw)

        (sums, _e), dt = timed(suffix_only, acc)
        print(f"{qname}: suffix+total ({K*parts} windows x {bw} buckets): "
              f"{dt:.2f}s", flush=True)

        @jax.jit
        def horner_only(sums):
            return ms._horner(ops, addx, sums, w, parts)

        _, dt = timed(horner_only, sums)
        print(f"{qname}: horner: {dt:.2f}s", flush=True)


if __name__ == "__main__":
    main()
