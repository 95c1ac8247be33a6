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

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import curve_ops as co
from ..ops import msm as msm_mod


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


def sharded_ntt(mesh: Mesh, ntt, evals):
    """Batch-parallel NTT: independent polynomials sharded over `voters`.

    evals: (B, n, L) Montgomery limbs.  Stage-parallel (butterfly all-to-all)
    single-polynomial sharding is the round-2 extension; batch axis sharding
    is what the prover pipeline needs first (one polynomial per voter).
    """
    fn = jax.shard_map(
        lambda x: ntt.intt(x),
        mesh=mesh,
        in_specs=P("voters"),
        out_specs=P("voters"),
        check_vma=False,
    )
    return fn(evals)
