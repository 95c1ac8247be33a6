"""Device limb-arithmetic vs the Python-int oracle (SURVEY.md §4 implication:
per-kernel unit tests against known vectors)."""

import random

import jax
import numpy as np
import pytest

from vote_saver_tpu.params import fr_spec, fq_spec, R, Q
from vote_saver_tpu.ops.field_ops import fr_ops, fq_ops
from vote_saver_tpu.ops.fq2_ops import Fq2Ops
from vote_saver_tpu.ops import limbs as lb
from vote_saver_tpu.refimpl import field as rf

rng = random.Random(0xFEED)


@pytest.mark.parametrize("which", ["fr", "fq"])
def test_mont_arith_matches_oracle(which):
    ops, spec, mod = (fr_ops(), fr_spec(), R) if which == "fr" else (fq_ops(), fq_spec(), Q)
    xs = [rng.randrange(mod) for _ in range(32)] + [0, 1, mod - 1, mod - 2]
    ys = [rng.randrange(mod) for _ in range(32)] + [mod - 1, 0, mod - 1, 1]
    ax, ay = lb.ints_to_mont_limbs(xs, spec), lb.ints_to_mont_limbs(ys, spec)
    assert list(lb.mont_limbs_to_ints(np.asarray(jax.jit(ops.mul)(ax, ay)), spec)) == [
        x * y % mod for x, y in zip(xs, ys)
    ]
    assert list(lb.mont_limbs_to_ints(np.asarray(jax.jit(ops.add)(ax, ay)), spec)) == [
        (x + y) % mod for x, y in zip(xs, ys)
    ]
    assert list(lb.mont_limbs_to_ints(np.asarray(jax.jit(ops.sub)(ax, ay)), spec)) == [
        (x - y) % mod for x, y in zip(xs, ys)
    ]
    assert list(lb.mont_limbs_to_ints(np.asarray(jax.jit(ops.neg)(ax)), spec)) == [
        (-x) % mod for x in xs
    ]


def test_inv_and_batch_inv():
    ops, spec = fr_ops(), fr_spec()
    xs = [rng.randrange(1, R) for _ in range(8)]
    ax = lb.ints_to_mont_limbs(xs, spec)
    assert list(lb.mont_limbs_to_ints(np.asarray(jax.jit(ops.inv)(ax)), spec)) == [
        pow(x, R - 2, R) for x in xs
    ]
    assert list(lb.mont_limbs_to_ints(np.asarray(jax.jit(ops.batch_inv)(ax)), spec)) == [
        pow(x, R - 2, R) for x in xs
    ]


def test_mont_roundtrip():
    ops, spec = fq_ops(), fq_spec()
    xs = [rng.randrange(Q) for _ in range(8)]
    std = lb.ints_to_limbs(xs, spec)
    rt = jax.jit(lambda a: ops.from_mont(ops.to_mont(a)))(std)
    assert list(lb.limbs_to_ints(np.asarray(rt), spec)) == xs


def test_fq2_ops_match_oracle():
    f2 = Fq2Ops()
    spec = fq_spec()
    xs = [(rng.randrange(Q), rng.randrange(Q)) for _ in range(16)]
    ys = [(rng.randrange(Q), rng.randrange(Q)) for _ in range(16)]
    ax = lb.ints_to_mont_limbs(xs, spec)  # (16, 2, L)
    ay = lb.ints_to_mont_limbs(ys, spec)
    got = lb.mont_limbs_to_ints(np.asarray(jax.jit(f2.mul)(ax, ay)), spec)
    want = [rf.fq2_mul(x, y) for x, y in zip(xs, ys)]
    assert [tuple(g) for g in got] == want
    got = lb.mont_limbs_to_ints(np.asarray(jax.jit(f2.sq)(ax)), spec)
    assert [tuple(g) for g in got] == [rf.fq2_sq(x) for x in xs]
    got = lb.mont_limbs_to_ints(np.asarray(jax.jit(f2.add)(ax, ay)), spec)
    assert [tuple(g) for g in got] == [rf.fq2_add(x, y) for x, y in zip(xs, ys)]
    got = lb.mont_limbs_to_ints(np.asarray(jax.jit(f2.inv)(ax)), spec)
    assert [tuple(g) for g in got] == [rf.fq2_inv(x) for x in xs]
