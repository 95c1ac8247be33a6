"""Matmul (MXU) NTT vs the radix-2 reference path — all four transform
variants, both on random and adversarial (digit-saturating) inputs, plus the
stage-parallel sharded form on the 8-device CPU mesh.

Covers ops/ntt_mxu.py (int8 digit-conv DFT + mod-r fold) and
parallel/sharded.sharded_ntt4 (all_to_all transpose).  The CPU rig runs the
32-bit limb layout (conftest), exercising the generic digit extraction.
"""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from vote_saver_tpu.ops import limbs as lb
from vote_saver_tpu.ops import ntt as ntt_mod
from vote_saver_tpu.ops import ntt_mxu
from vote_saver_tpu.params import R, fr_spec

N = 256


def _inputs():
    rng = random.Random(0xA17)
    vals = [rng.randrange(R) for _ in range(2 * N)]
    # adversarial block: saturate digit columns / fold boundaries
    vals[:8] = [0, 1, R - 1, R - 2, (1 << 254) - 1, R - (1 << 200), 2, R // 2]
    vals[N : N + 4] = [R - 1] * 4
    return np.array(vals, dtype=object).reshape(2, N)


@pytest.mark.parametrize("kind,ref", [
    ("fwd", "ntt"), ("inv", "intt"),
    ("fwd_coset", "coset_ntt"), ("inv_coset", "coset_intt"),
])
def test_matmul_ntt_matches_radix2(kind, ref):
    spec = fr_spec()
    x = jnp.asarray(lb.ints_to_mont_limbs(_inputs(), spec))
    plan = ntt_mxu.get_plan(N, kind)
    radix = ntt_mod.get_ntt(N)
    assert not radix.use_mxu  # CPU rig must compare against the radix-2 core
    got = np.asarray(plan.apply(x))
    want = np.asarray(getattr(radix, ref)(x))
    assert (got == want).all()


def test_fold_matrix_headroom():
    # every fold row is a valid balanced representation of 2^(7u+lb) mod r
    ncols = 73
    lb_ = fr_spec().limb_bits
    f = ntt_mxu._fold_matrix(ncols, lb_)
    assert f.dtype == np.int8
    for u in range(ncols * 5):
        kc, t = divmod(u, 5)
        v = sum(int(d) << (8 * i) for i, d in enumerate(f[u]))
        assert v == pow(2, 7 * (kc + t) + lb_, R)


def test_sharded_ntt4_matches_plan():
    from vote_saver_tpu.parallel import sharded

    spec = fr_spec()
    rng = random.Random(5)
    vals = [rng.randrange(R) for _ in range(N)]
    x = jnp.asarray(lb.ints_to_mont_limbs(vals, spec))
    plan = ntt_mxu.get_plan(N, "fwd_coset")
    want = np.asarray(plan.apply(x))
    mesh = sharded.make_mesh(4, 2)
    with mesh:
        got = np.asarray(sharded.sharded_ntt4(mesh, "points", plan, x))
    assert (got == want).all()
