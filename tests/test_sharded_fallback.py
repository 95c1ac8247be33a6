"""The sharded prover's madd doubling-corner fallback (round-3 VERDICT weak
#10): when any shard's scheduled MSM flags the exceptional madd corner,
groth16._prove_msms_sharded must recompute that query with the
complete-formula var-base MSM instead of aborting — same recovery the
unsharded path has (groth16._prove_msms_scheduled)."""

import random

import jax
import numpy as np
import pytest

from vote_saver_tpu.params import R
from vote_saver_tpu.ops import msm as msm_mod
from vote_saver_tpu.parallel import sharded
from vote_saver_tpu.protocol import groth16
from vote_saver_tpu.refimpl import curves as rc
from vote_saver_tpu.refimpl import jacobian as rj

rng = random.Random(0xFA11)


def _tiny_pk(n_pts: int = 8) -> groth16.ProvingKey:
    """A ProvingKey stub with random point sets (only the MSM-relevant
    fields are populated)."""
    def pts(k):
        return [rc.g1_mul(rc.g1_gen, rng.randrange(R)) for _ in range(k)]

    def pts2(k):
        return [rc.g2_mul(rc.g2_gen, rng.randrange(R)) for _ in range(k)]

    ni = 2
    return groth16.ProvingKey(
        num_primary=ni, num_vars=n_pts, domain=n_pts,
        a_pts=pts(n_pts), b1_pts=pts(n_pts), b2_pts=pts2(n_pts),
        h_pts=pts(n_pts - 1), l_pts=pts(n_pts - ni - 1),
        alpha_g1=None, beta_g1=None, beta_g2=None, delta_g1=None,
        delta_g2=None, coo={}, num_constraints=n_pts - ni - 1,
    )


@pytest.mark.slow
def test_sharded_corner_falls_back_to_var_base(monkeypatch):
    assert len(jax.devices()) >= 8
    mesh = sharded.make_mesh(4, 1)
    pk = _tiny_pk()
    w_ints = [[rng.randrange(R) for _ in range(pk.num_vars)]]
    h_ints = [[rng.randrange(R) for _ in range(pk.domain - 1)]]
    w_limbs = [msm_mod.scalars_to_limbs(w_ints[0])]
    h_limbs = [msm_mod.scalars_to_limbs(h_ints[0])]

    # force the exceptional flag: every shard reports a doubling-corner hit
    def fake_sharded_msm(mesh_, group, pxy, schedules):
        from vote_saver_tpu.ops import curve_ops as co

        ops = co.g1_ops() if group == "g1" else co.g2_ops()
        parts = schedules[0].num_parts
        inf = ops.infinity_like(
            jax.numpy.zeros((parts,) + pxy[0].shape[1:], pxy[0].dtype)
        )
        return inf, jax.numpy.uint32(1)

    monkeypatch.setattr(sharded, "sharded_msm_scheduled", fake_sharded_msm)
    outs = groth16._prove_msms_sharded(pk, w_limbs, h_limbs, mesh)
    a, b1, b2, l, h = groth16._msms_from_device(outs)

    aux_ints = w_ints[0][pk.num_primary + 1 :]
    assert a[0] == rj.msm_host(pk.a_pts, w_ints[0])
    assert b1[0] == rj.msm_host(pk.b1_pts, w_ints[0])
    assert b2[0] == rj.msm_host(pk.b2_pts, w_ints[0], group="g2")
    assert l[0] == rj.msm_host(pk.l_pts, aux_ints)
    assert h[0] == rj.msm_host(pk.h_pts, h_ints[0])
