"""Sharded MSM / NTT / tally over a jax.sharding.Mesh.

Replaces nothing in the reference (it is single-threaded C++; SURVEY.md §2D)
— these are the TPU-native scale-out kernels: pjit/shard_map with XLA
collectives over ICI.  Tested on a virtual 8-device CPU mesh; the driver
dry-runs them via __graft_entry__.dryrun_multichip.

Sharding layout:
  * `points` axis: the CRS / MSM point arrays are partitioned chip-wise —
    each chip runs a local windowed MSM over its slice, partial sums are
    all-gathered (tiny: one Jacobian point each) and combined locally with a
    log-depth reduction.  Point addition is not an XLA reduction monoid, so
    all_gather + local tree is the collective of choice (the psum analog).
  * `voters` axis: ballots are data-parallel; each chip proves / encrypts /
    aggregates its voter slice; the tally all-reduce combines per-chip
    aggregate ciphertexts the same all-gather way.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import curve_ops as co
from ..ops import msm as msm_mod


def init_distributed() -> bool:
    """Multi-host bring-up behind a flag: set VSTPU_DISTRIBUTED=1 (plus the
    standard JAX coordinator variables) and every host joins one global
    runtime, making jax.devices() span hosts so the meshes here ride
    ICI within a slice and DCN across hosts.  No-op (False) when unset —
    single-process runs, tests and the CPU rig never pay the cost."""
    if not os.environ.get("VSTPU_DISTRIBUTED"):
        return False
    kw = {}
    if os.environ.get("VSTPU_COORD"):
        # explicit bring-up (tests / bare-metal): VSTPU_COORD=host:port,
        # VSTPU_NPROC, VSTPU_PROCID; otherwise auto-detect (SLURM/TPU pods)
        kw = dict(
            coordinator_address=os.environ["VSTPU_COORD"],
            num_processes=int(os.environ["VSTPU_NPROC"]),
            process_id=int(os.environ["VSTPU_PROCID"]),
        )
    jax.distributed.initialize(**kw)
    return True


def make_mesh(n_points: int, n_voters: int = 1, devices=None) -> Mesh:
    devices = np.asarray(devices if devices is not None else jax.devices())
    assert devices.size >= n_points * n_voters
    grid = devices[: n_points * n_voters].reshape(n_points, n_voters)
    return Mesh(grid, axis_names=("points", "voters"))


def sharded_msm(mesh: Mesh, points, scalar_digits):
    """MSM with points (and matching scalar digits) sharded over the `points`
    mesh axis; returns the full Jacobian sum replicated on every chip.

    points: G1 Jacobian pytree (n, L); scalar_digits: (n, W) int32 4-bit
    windows (LSB first).  n must be divisible by the axis size.
    """
    g1 = co.g1_ops()
    axis = "points"

    def local(pts, digs):
        part = msm_mod.msm_var_base(g1, pts, digs)  # local partial sum
        # gather all partial sums (one point per chip) and reduce locally
        gathered = tuple(
            jax.lax.all_gather(c[None, ...], axis, tiled=True) for c in part
        )
        total = g1.sum_reduce(gathered, axis=0)
        return total

    spec_pts = tuple(P(axis) for _ in points)
    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(spec_pts, P(axis)),
        out_specs=tuple(P() for _ in points),
        check_vma=False,
    )
    return fn(points, scalar_digits)


def sharded_tally(mesh: Mesh, ct_points):
    """Homomorphic ciphertext aggregation across the `voters` mesh axis.

    ct_points: G1 Jacobian pytree with leading dims (n_voters, n_slots) —
    per-voter ciphertext vectors (the reference aggregates these serially,
    common.hpp:1208-1216).  Returns the aggregate (n_slots,) ciphertext
    replicated everywhere.
    """
    g1 = co.g1_ops()
    axis = "voters"

    def local(cts):
        part = g1.sum_reduce(cts, axis=0)  # (n_slots, ...) local aggregate
        gathered = tuple(
            jax.lax.all_gather(c[None, ...], axis, tiled=True) for c in part
        )
        return g1.sum_reduce(gathered, axis=0)

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(tuple(P(axis) for _ in ct_points),),
        out_specs=tuple(P() for _ in ct_points),
        check_vma=False,
    )
    return fn(ct_points)


def pad_schedules(schedules):
    """Pad a list of per-shard msm_sched.Schedule objects to one common
    (steps, lanes) shape so their code/merge arrays stack for shard_map."""
    steps = max(s.codes.shape[0] for s in schedules)
    lanes = max(s.lanes for s in schedules)
    canon = schedules[0].merge_gather.shape[0]
    codes, parts_, gathers = [], [], []
    for s in schedules:
        assert s.merge_gather.shape[0] == canon
        c = np.zeros((steps, lanes), dtype=np.int32)
        c[: s.codes.shape[0], : s.codes.shape[1]] = s.codes
        m = np.zeros((s.merge_part.shape[0], lanes - canon), dtype=np.int32)
        m[:, : s.merge_part.shape[1]] = s.merge_part
        codes.append(c)
        parts_.append(m)
        gathers.append(s.merge_gather)
    return np.stack(codes), np.stack(parts_), np.stack(gathers)


def sharded_msm_scheduled(mesh: Mesh, group: str, points_xy, schedules):
    """The flagship scheduled-bucket Pippenger MSM across chips.

    Point-partition layout: shard d owns points [d*n/D, (d+1)*n/D) and a
    conflict-free schedule built from *its* scalar slice; every shard runs
    the full bucket-accumulate/combine pipeline locally (zero communication),
    then the D per-shard Jacobian partials are all-gathered (one point per
    chip per part) and tree-added.  Scales the kernel the reference runs
    single-threaded behind zk::prove (common.hpp:916,1132).

    points_xy: (x, y) affine limb arrays with leading dim n (= D * n_shard),
    from msm_sched.g{1,2}_affine_to_device.
    schedules: list of D msm_sched.Schedule, one per point shard, all with
    the same window_bits / num_windows / num_parts.
    Returns (jacobian coords (parts, ...), total exceptional-lane count).
    """
    axis = "points"
    d = mesh.shape[axis]
    assert len(schedules) == d
    s0 = schedules[0]
    codes, parts_, gathers = pad_schedules(schedules)
    fn = sharded_msm_scheduled_fn(
        mesh, group, s0.num_windows, s0.window_bits, s0.num_parts
    )
    return fn(points_xy, codes, parts_, gathers)


def sharded_msm_scheduled_fn(mesh: Mesh, group: str, K: int, w: int, parts: int):
    """The shard_map callable behind sharded_msm_scheduled, for callers that
    build global jax.Arrays themselves (the multi-process path: every host
    owns only its shard of points/codes, via jax.make_array_from_callback)."""
    from ..ops import msm_sched

    axis = "points"
    ops = co.g1_ops() if group == "g1" else co.g2_ops()

    def local(pxy, codes_l, part_l, gather_l):
        res, exc = msm_sched._msm_device(
            group, pxy, codes_l[0], part_l[0], gather_l[0], K, w, parts
        )
        gathered = tuple(
            jax.lax.all_gather(c[None, ...], axis, tiled=True) for c in res
        )
        total = ops.sum_reduce(gathered, axis=0)
        return total, jax.lax.psum(exc.astype(jnp.uint32), axis)

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=((P(axis), P(axis)), P(axis), P(axis), P(axis)),
        out_specs=(tuple(P() for _ in range(3)), P()),
        check_vma=False,
    )


def sharded_ntt4(mesh: Mesh, axis: str, plan, x):
    """Stage-parallel single-polynomial NTT: the 4-step decomposition of
    ops.ntt_mxu with the middle transpose as ONE all_to_all over the mesh.

    Step A (n2-sharded column DFTs) and step C (n1-sharded row DFTs) are
    local int8-MXU matmuls; the only cross-chip traffic is the n1<->n2
    transpose riding ICI.  This is the SURVEY §2D "NTT stage parallelism"
    axis (the reference hides its FFT inside crypto3-math,
    bin/cli/CMakeLists.txt:94).

    x: (n, L) Montgomery limbs (replicated input).  plan: ntt_mxu plan for
    the same n.  Returns the transformed (n, L), replicated.
    """
    from ..ops import ntt_mxu
    from ..ops.field_ops import fr_ops

    f = fr_ops()
    n1, n2, L = plan.n1, plan.n2, x.shape[-1]
    d = mesh.shape[axis]
    assert n2 % d == 0 and n1 % d == 0
    xm = x.reshape(n1, n2, L)
    t12 = jnp.asarray(plan.t12)  # (n2[i2], n1[o1], L)

    def local(xl, tl):
        # xl: (n1, n2/d, L) — conv batch = local columns, contract i1
        xa = jnp.swapaxes(xl, 0, 1)  # (n2loc, n1, L)
        y = ntt_mxu._fr_matmul(plan.w1d, xa)
        z = f.mul(y, tl)  # twiddle, local slice
        # cross-chip transpose: split o1, concatenate i2
        zt = jax.lax.all_to_all(z, axis, split_axis=1, concat_axis=0, tiled=True)
        # zt: (n2, n1/d, L) — conv batch = local rows o1, contract i2
        zc = jnp.swapaxes(zt, 0, 1)  # (n1loc, n2, L)
        r = ntt_mxu._fr_matmul(plan.w2td, zc)  # (n1loc, n2[o2], L)
        return r

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(None, axis, None), P(axis, None, None)),
        out_specs=P(axis, None, None),
        check_vma=False,
    )
    r = fn(xm, t12)  # (n1, n2, L): r[o1, o2] = out[o1 + n1*o2]
    return jnp.swapaxes(r, 0, 1).reshape(x.shape)


def sharded_ntt(mesh: Mesh, ntt, evals):
    """Batch-parallel NTT: independent polynomials sharded over `voters`.

    evals: (B, n, L) Montgomery limbs.  One polynomial per voter — the
    within-polynomial (stage-parallel) axis is sharded_ntt4 above.
    """
    fn = jax.shard_map(
        lambda x: ntt.intt(x),
        mesh=mesh,
        in_specs=P("voters"),
        out_specs=P("voters"),
        check_vma=False,
    )
    return fn(evals)
