"""Bit-exactness of the matmul-fold Montgomery multiplier (ops/fold_mul.py)
against Python-int ground truth, on the 16-bit TPU limb layout (constructed
explicitly — the CPU test rig otherwise runs 32-bit limbs)."""

import random

import numpy as np
import pytest

from vote_saver_tpu.params import FieldSpec, Q, R as FR_MOD
from vote_saver_tpu.ops import fold_mul as fm

SPECS = [FieldSpec("fq", Q, 16, 24), FieldSpec("fr", FR_MOD, 16, 16)]


def _to_limbs(spec, xs):
    return np.array([spec.to_limbs(x) for x in xs], dtype=np.uint32)


def _from_limbs(spec, arr):
    return [spec.from_limbs(row) for row in np.asarray(arr)]


@pytest.mark.parametrize("spec", SPECS, ids=[s.name for s in SPECS])
def test_mul_fold_matches_int_reference(spec):
    rng = random.Random(0xF01D + spec.num_limbs)
    n = 64
    N = spec.modulus
    xs = [rng.randrange(N) for _ in range(n)]
    ys = [rng.randrange(N) for _ in range(n)]
    # adversarial corners: 0, 1, N-1, values with all-0xFF / all-0x00 digits
    xs[:6] = [0, 1, N - 1, (1 << (8 * spec.num_limbs)) % N, N - 2, 2]
    ys[:6] = [N - 1, N - 1, N - 1, 1, N - 2, 0]
    got = fm.mul_fold_spec(spec, _to_limbs(spec, xs), _to_limbs(spec, ys))
    want = [(x * y * spec.mont_r_inv) % N for x, y in zip(xs, ys)]
    assert _from_limbs(spec, got) == want


@pytest.mark.parametrize("spec", SPECS, ids=[s.name for s in SPECS])
def test_square_columns_matches_product_columns(spec):
    import jax.numpy as jnp

    p = fm.plan(spec)
    rng = random.Random(0x5C0 + spec.num_limbs)
    xs = [rng.randrange(spec.modulus) for _ in range(8)]
    a = jnp.asarray(_to_limbs(spec, xs))[..., :, None]
    da = fm.digit_rows(p, a)
    sq = fm.square_columns(p, da)
    full = fm.product_columns(p, da, da)
    for c, (s, f) in enumerate(zip(sq, full)):
        assert np.array_equal(np.asarray(s), np.asarray(f)), f"column {c}"


def test_fold_headroom_invariants():
    """The exactness preconditions the docstring claims, re-checked here so a
    future geometry change fails loudly."""
    for spec in SPECS:
        p = fm.plan(spec)
        rows = p["ncols"] * p["npieces"]
        assert rows * 255 * 128 < (1 << 24)  # f32-exact matmul accumulation
        assert p["nd"] * 255 * 255 * 2 < (1 << (8 * p["npieces"]))  # piece cover
        # fold value bound: G < rows*255*128*N < 2^(2*lb)*N -> two word-steps
        assert rows * 255 * 128 < (1 << (2 * spec.limb_bits))
