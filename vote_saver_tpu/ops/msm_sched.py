"""Scheduled-bucket Pippenger MSM — the flagship TPU kernel.

Replaces the reference's single-threaded multiexp behind ``zk::generate/prove``
(reference: bin/cli/include/nil/vote_saver/common.hpp:916,1132; wNAF/multiexp
params at common.hpp:38-39) with a TPU-native design:

  * signed w-bit digits (halves the bucket count; the negation rides the
    mixed-add kernel, not a separate pass);
  * bucket LANES: the accumulator holds every (window, bucket) pair on its own
    vector lane — ``K * 2^(w-1)`` lanes live in HBM between steps;
  * host-built conflict-free schedule: entry e = (window, bucket, point, sign)
    is assigned step = occurrence index of its bucket, so within one step every
    active lane gathers a distinct bucket — bucket accumulation becomes a
    ``lax.scan`` of gather + fused Pallas mixed-add (12 Fq muls) with NO
    scatters and NO sorts on device;
  * bucket combination: Hillis–Steele suffix sums over the bucket axis (full
    lane occupancy), a log-tree total per window, then a Horner scan over
    windows (w doublings + 1 add per step);
  * completeness: the mixed-add kernel flags the measure-zero "partial bucket
    sum == incoming point" doubling corner; the host wrapper falls back to the
    complete-formula variable-base MSM iff any lane ever flagged (adversarial
    inputs stay correct, the common case stays fast).

Host schedule cost is O(total-entries) vectorised numpy; device cost is
``~ceil(K*n / lanes)`` fused madd steps of full lane width.
"""

from __future__ import annotations

import dataclasses
import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..params import fq_spec
from . import curve_ops as co
from . import limbs as lb

_IDX_MASK = (1 << 30) - 1
_SIGN_BIT = 1 << 30


# ---------------------------------------------------------------------------
# Host side: signed digits + conflict-free schedule
# ---------------------------------------------------------------------------


def _bits_from_limbs(limbs: np.ndarray, limb_bits: int, nbits: int) -> np.ndarray:
    """(n, L) unsigned limbs -> (n, nbits) 0/1 int64 matrix (vectorised)."""
    n, L = limbs.shape
    shifts = np.arange(limb_bits, dtype=np.uint64)
    bits = (limbs[:, :, None].astype(np.uint64) >> shifts) & np.uint64(1)
    bits = bits.reshape(n, L * limb_bits).astype(np.int64)
    if bits.shape[1] < nbits:
        bits = np.pad(bits, ((0, 0), (0, nbits - bits.shape[1])))
    return bits[:, :nbits]


def signed_digits(scalars, window_bits: int, scalar_limbs=None, scalar_bits: int = 256) -> np.ndarray:
    """Scalars -> (n, K) int32 signed digits, d_j in [-2^(w-1), 2^(w-1)].

    sum_j d_j * 2^(w*j) == scalar.  Pass ``scalar_limbs`` ((n, L) plain LE
    limbs in the active layout) to skip the python int conversion — the hot
    prover path already holds limbs.  ``scalar_bits`` bounds the scalars
    (fewer windows for small-scalar MSMs, e.g. test rigs).
    """
    w = window_bits
    nbits = scalar_bits + w  # headroom for the final carry window
    K = nbits // w + (1 if nbits % w else 0)
    if scalar_limbs is None:
        from ..params import fr_spec

        scalar_limbs = lb.ints_to_limbs(
            np.asarray(scalars, dtype=object), fr_spec()
        )
        limb_bits = fr_spec().limb_bits
    else:
        from ..params import fr_spec

        limb_bits = fr_spec().limb_bits
    scalar_limbs = np.asarray(scalar_limbs)
    n = scalar_limbs.shape[0]
    bits = _bits_from_limbs(scalar_limbs, limb_bits, K * w)
    weights = 1 << np.arange(w, dtype=np.int64)
    digs = bits.reshape(n, K, w) @ weights  # (n, K) raw base-2^w digits
    out = np.zeros((n, K), dtype=np.int64)
    carry = np.zeros(n, dtype=np.int64)
    half = 1 << (w - 1)
    full = 1 << w
    for j in range(K):
        raw = digs[:, j] + carry
        over = raw > half
        out[:, j] = np.where(over, raw - full, raw)
        carry = over.astype(np.int64)
    assert not carry.any(), "scalar overflowed the digit windows"
    return out.astype(np.int32)


@dataclasses.dataclass
class Schedule:
    """Device-ready conflict-free bucket schedule with orphan sub-buckets.

    Digit distributions are skewed (the top window of a 255-bit scalar only
    populates a handful of buckets), so step count is capped: a bucket with
    more than `step budget` entries spills into orphan accumulator lanes
    (beyond the canonical K*2^(w-1)), which a few gathered-add merge rounds
    fold back before bucket combination.  Keeps lane occupancy high instead
    of letting one hot bucket serialise the whole MSM.
    """

    codes: np.ndarray  # (steps, lanes) int32: 0 = idle; else (pidx+1) | sign<<30
    merge_idx: np.ndarray  # (rounds, lanes) int32: 0 = none; else orphan lane+1
    window_bits: int
    num_windows: int  # windows per part
    lanes: int  # canonical + orphan lanes, padded to a multiple of 128
    total_entries: int
    num_parts: int = 1  # batched multi-MSM: independent scalar vectors
    # sharing one point set (e.g. voters over a common CRS)


def _pad_up(x: int, m: int) -> int:
    return -(-x // m) * m


# Shape memo: (n, w) -> [steps, lanes, rounds].  Schedule shapes are data-
# dependent (orphan counts, max loads); pad every schedule up to the largest
# shape seen for its size so repeat MSMs hit one compiled device program
# (remote TPU compiles cost ~60s; shapes grow monotonically and stabilise
# after the first call or two).
_SHAPE_MEMO: dict = {}


def _lane_pad() -> int:
    """Lane-count padding granularity: coarse on TPU (stable jit shapes,
    full lane tiles), fine on the CPU test/dryrun rig (complete-add lanes
    are expensive there and shapes recompile cheaply)."""
    return 1024 if jax.default_backend() == "tpu" else 128


def build_schedule(
    scalars=None,
    window_bits: int = 10,
    inf_mask=None,
    scalar_limbs=None,
    scalar_bits: int = 256,
) -> Schedule:
    """Assign every nonzero (window, point) digit to (step, bucket-lane).

    Shapes (steps, lanes, merge rounds) are padded to coarse multiples so
    repeated MSMs of the same size reuse one compiled device program.
    """
    w = window_bits
    from .. import native_bridge as nb

    if (
        nb.available()
        and os.environ.get("VSTPU_SCHED", "native") == "native"
        and scalar_bits >= 256
    ):
        if scalar_limbs is None:
            from ..params import fr_spec

            scalar_limbs = lb.ints_to_limbs(np.asarray(scalars, dtype=object), fr_spec())
        return _schedule_native([scalar_limbs], w, inf_mask)
    digs = signed_digits(scalars, w, scalar_limbs=scalar_limbs, scalar_bits=scalar_bits)
    return _schedule_from_digits(digs, w, inf_mask, num_parts=1)


def build_schedule_multi(scalar_limbs_list, window_bits: int = 10, inf_mask=None) -> Schedule:
    """One schedule for B independent scalar vectors over a SHARED point set
    (the prover's voters x CRS case): windows of part i live at window offset
    i*K, so bucket accumulation and combination run as one device program.

    Dispatches to the native two-pass scheduler (native/vs_native.cpp
    vs_sched_pass1/2 — no sort, threaded) when built; the numpy argsort path
    below doubles as its oracle (tests/test_curve_msm_ntt.py)."""
    w = window_bits
    from .. import native_bridge as nb

    if nb.available() and os.environ.get("VSTPU_SCHED", "native") == "native":
        return _schedule_native(scalar_limbs_list, w, inf_mask)
    digs = np.concatenate(
        [signed_digits(None, w, scalar_limbs=sl) for sl in scalar_limbs_list], axis=1
    )
    return _schedule_from_digits(digs, w, inf_mask, num_parts=len(scalar_limbs_list))


def _limbs_to_le_bytes(scalar_limbs: np.ndarray) -> np.ndarray:
    """(n, L) active-layout limbs -> (n, 32) uint8 LE scalar bytes (no copy
    of Python ints; pure vectorised reinterpretation)."""
    a = np.ascontiguousarray(scalar_limbs)
    if a.dtype == np.uint32:  # 16-bit limbs in uint32
        a = a.astype(np.uint16)
    elif a.dtype == np.uint64:  # 32-bit limbs in uint64
        a = a.astype(np.uint32)
    else:  # pragma: no cover
        raise TypeError(f"unexpected limb dtype {a.dtype}")
    out = a.view(np.uint8).reshape(a.shape[0], -1)
    assert out.shape[1] == 32
    return out


def _schedule_native(scalar_limbs_list, w: int, inf_mask) -> Schedule:
    from .. import native_bridge as nb

    parts = len(scalar_limbs_list)
    n = int(np.asarray(scalar_limbs_list[0]).shape[0])
    sc_bytes = np.concatenate([_limbs_to_le_bytes(sl) for sl in scalar_limbs_list])
    total, digits, counts = nb.sched_pass1(sc_bytes, parts, n, w, inf_mask)
    K = digits.shape[1]  # windows per part
    bw = 1 << (w - 1)
    canon = parts * K * bw
    loads = counts.sum(axis=0, dtype=np.int64)

    steps = max(16, -(-total * 13 // (10 * canon))) if total else 1
    max_load = int(loads.max()) if total else 0
    nsteps = _pad_up(max(min(steps, max_load), 1), 8)
    chunks = -(-loads // steps)
    orph_cnt = np.maximum(chunks - 1, 0)
    n_orphans = int(orph_cnt.sum())
    lanes = _pad_up(canon + max(n_orphans, 1), _lane_pad())
    rounds = _pad_up(int(orph_cnt.max()), 4) if n_orphans else 0

    memo = _SHAPE_MEMO.setdefault((n, w, parts), [nsteps, lanes, rounds])
    memo[0] = nsteps = max(memo[0], nsteps)
    memo[1] = lanes = max(memo[1], lanes)
    memo[2] = rounds = max(memo[2], rounds)

    orph_base = np.zeros(canon, dtype=np.int32)
    if n_orphans:
        orph_base[1:] = np.cumsum(orph_cnt, dtype=np.int64)[:-1].astype(np.int32)
    codes = nb.sched_pass2(
        digits, parts, n, w, inf_mask, counts, orph_base, steps, nsteps, lanes
    )

    merge_idx = np.zeros((rounds, lanes), dtype=np.int32)
    if n_orphans:
        lanes_w = np.nonzero(orph_cnt)[0]
        reps = orph_cnt[lanes_w]
        lane_rep = np.repeat(lanes_w, reps)
        base_rep = np.repeat(orph_base[lanes_w], reps)
        within = np.arange(len(lane_rep)) - np.repeat(
            np.concatenate([[0], np.cumsum(reps)[:-1]]), reps
        )
        merge_idx[within, lane_rep] = canon + base_rep + within + 1
    return Schedule(codes, merge_idx, w, K, lanes, total, parts)


def _schedule_from_digits(digs, w, inf_mask, num_parts):
    n, K = digs.shape  # K = windows_per_part * num_parts here
    bw = 1 << (w - 1)
    canon = K * bw

    point_idx, win_idx = np.meshgrid(np.arange(n), np.arange(K), indexing="ij")
    flat_d = digs.reshape(-1)
    flat_p = point_idx.reshape(-1)
    flat_w = win_idx.reshape(-1)
    keep = flat_d != 0
    if inf_mask is not None:
        keep &= ~np.asarray(inf_mask, dtype=bool)[flat_p]
    d = flat_d[keep]
    p = flat_p[keep]
    wn = flat_w[keep]
    lane = wn * bw + (np.abs(d) - 1)
    sign = (d < 0).astype(np.int64)
    total = int(lane.shape[0])

    order = np.argsort(lane, kind="stable")
    lane_s, p_s, sign_s = lane[order], p[order], sign[order]
    first_pos = np.searchsorted(lane_s, lane_s, side="left")
    occ = np.arange(total) - first_pos

    # step budget: ~1.3x the mean bucket load, at least 16
    steps = max(16, -(-total * 13 // (10 * canon))) if total else 1
    chunk = occ // steps  # 0 = canonical accumulator, >=1 spills to orphans
    step = occ % steps

    # allocate one orphan lane per distinct (bucket, chunk>=1) pair
    spill = chunk >= 1 if total else np.zeros(0, dtype=bool)
    max_chunk = int(chunk.max()) + 1 if spill.any() else 1
    pair_key = lane_s[spill] * max_chunk + chunk[spill]
    uniq, pair_inv = np.unique(pair_key, return_inverse=True)
    n_orphans = uniq.shape[0]
    lanes = _pad_up(canon + max(n_orphans, 1), _lane_pad())
    nsteps = _pad_up(max(int(step.max()) + 1 if total else 1, 1), 8)
    if n_orphans:
        first = np.unique(pair_key, return_index=True)[1]
        orph_canon = lane_s[spill][first]
        orph_chunk = chunk[spill][first]
        rounds = _pad_up(int(orph_chunk.max()), 4)
    else:
        rounds = 0

    # pad up to the largest shape seen for this (n, w) -> stable jit shapes
    memo = _SHAPE_MEMO.setdefault((n, w, num_parts), [nsteps, lanes, rounds])
    memo[0] = nsteps = max(memo[0], nsteps)
    memo[1] = lanes = max(memo[1], lanes)
    memo[2] = rounds = max(memo[2], rounds)

    entry_lane = lane_s.copy()
    entry_lane[spill] = canon + pair_inv

    codes = np.zeros((nsteps, lanes), dtype=np.int32)
    codes[step, entry_lane] = (p_s + 1) | (sign_s << 30)

    # merge schedule: orphan r of canonical lane c -> merge_idx[r, c]
    merge_idx = np.zeros((rounds, lanes), dtype=np.int32)
    if n_orphans:
        merge_idx[orph_chunk - 1, orph_canon] = canon + np.arange(n_orphans) + 1
    assert K % num_parts == 0
    return Schedule(codes, merge_idx, w, K // num_parts, lanes, total, num_parts)


def unify_schedule_shapes(*schedules: "Schedule") -> None:
    """Pad the given same-(K, w, parts) schedules to one common
    (steps, lanes, rounds) shape IN PLACE, so every query MSM built from
    them hits ONE compiled device program (each distinct schedule shape
    otherwise costs its own multi-minute compile on the TPU backend).
    Padding is zero codes / zero merge entries = idle lanes."""
    assert len({(s.num_windows, s.window_bits, s.num_parts) for s in schedules}) == 1
    steps = max(s.codes.shape[0] for s in schedules)
    lanes = max(s.lanes for s in schedules)
    rounds = max(s.merge_idx.shape[0] for s in schedules)
    for s in schedules:
        if (s.codes.shape, s.merge_idx.shape) == ((steps, lanes), (rounds, lanes)):
            continue
        c = np.zeros((steps, lanes), np.int32)
        c[: s.codes.shape[0], : s.codes.shape[1]] = s.codes
        m = np.zeros((rounds, lanes), np.int32)
        if s.merge_idx.size:
            m[: s.merge_idx.shape[0], : s.merge_idx.shape[1]] = s.merge_idx
        s.codes, s.merge_idx, s.lanes = c, m, lanes


def g1_affine_to_device(points):
    """Affine int points (None -> (0,0); excluded via schedule inf_mask)."""
    spec = fq_spec()
    xs = [p[0] if p is not None else 0 for p in points]
    ys = [p[1] if p is not None else 0 for p in points]
    return (
        lb.ints_to_mont_limbs(xs, spec),
        lb.ints_to_mont_limbs(ys, spec),
    )


def g2_affine_to_device(points):
    spec = fq_spec()
    zero2 = (0, 0)
    xs = [p[0] if p is not None else zero2 for p in points]
    ys = [p[1] if p is not None else zero2 for p in points]
    return (
        lb.ints_to_mont_limbs(xs, spec),
        lb.ints_to_mont_limbs(ys, spec),
    )


# ---------------------------------------------------------------------------
# Device side
# ---------------------------------------------------------------------------


def _madd(group: str):
    ops = _ops(group)
    if ops._pallas() is not None:
        from . import pallas_field as pf

        return pf.g1_madd_pallas if group == "g1" else pf.g2_madd_pallas
    return _madd_ops(ops)


def _madd_ops(ops: co.JacobianOps):
    """Complete-formula mixed add on the XLA path — lets the scheduled MSM
    run on layouts without the fused Pallas kernels (the 32-bit CPU rig /
    dryrun mesh).  Complete addition has no doubling corner, so the
    exceptional flag is identically zero."""

    def madd(acc, q_affine, sign, active):
        f = ops.f
        qx, qy = q_affine
        inf_pt = f.is_zero(qx) & f.is_zero(qy)  # (0,0) encodes infinity
        act = active & ~inf_pt
        qy = f.select(sign, f.neg(qy), qy)
        added = ops.add(acc, (qx, qy, ops._one_like(qx)))
        out = tuple(f.select(act, a, c) for a, c in zip(added, acc))
        return out, jnp.zeros(active.shape, jnp.uint32)

    return madd


def _ops(group: str) -> co.JacobianOps:
    return co.g1_ops() if group == "g1" else co.g2_ops()


def _infinity(ops, lanes, g2: bool):
    L = fq_spec().num_limbs
    dtype = ops.f.fq.dtype if g2 else ops.f.dtype
    shape = (lanes, 2, L) if g2 else (lanes, L)
    x = jnp.zeros(shape, dtype)
    return ops.infinity_like(x)


def _suffix_and_total(ops, acc, K: int, bw: int):
    """acc: Jacobian coords with leading dim (K*bw[, pad]) -> per-window
    weighted sums S_w = sum_b (b+1) * acc[w, b] as coords (K, ...).

    Two passes of the same masked Hillis-Steele doubling body, as ONE
    lax.scan body compiled once (not log2(bw) inlined rounds — the unrolled
    form dominated the scheduled MSM's XLA graph and its TPU compile time):
    pass 1 turns buckets into suffix sums S_b = sum_{j>=b} a_j, pass 2 sums
    those (position 0 then holds sum_b S_b = sum_b (b+1) a_b).  Out-of-range
    partners enter as infinity, which the complete add absorbs."""
    coords = tuple(c[: K * bw].reshape((K, bw) + c.shape[1:]) for c in acc)
    if bw > 1:
        steps = (bw - 1).bit_length()
        shifts = jnp.asarray([1 << s for s in range(steps)], jnp.int32)
        idx = jnp.arange(bw)
        inf = ops.infinity_like(coords[0])

        def body(cs, shift):
            valid = (idx + shift < bw).reshape(
                (1, bw) + (1,) * (cs[0].ndim - 2)
            )
            rolled = tuple(
                jnp.where(valid, jnp.roll(c, -shift, axis=1), i)
                for c, i in zip(cs, inf)
            )
            return ops.add(cs, rolled), None

        coords, _ = jax.lax.scan(body, coords, shifts)  # suffix sums
        coords, _ = jax.lax.scan(body, coords, shifts)  # sum of suffixes
    return tuple(c[:, 0] for c in coords)


def _horner(ops, window_sums, w: int, parts: int):
    """result[p] = sum_j 2^(w*j) * S_{p,j} via MSB-first Horner scan, batched
    over parts.  window_sums coords have leading dim parts*K.  The w
    doublings ride a fori_loop (one compiled double body, not w inlined)."""
    coords = tuple(
        c.reshape((parts, c.shape[0] // parts) + c.shape[1:]) for c in window_sums
    )
    rev = tuple(jnp.moveaxis(c[:, ::-1], 1, 0) for c in coords)  # (K, parts, ...)

    def body(acc, s):
        acc = jax.lax.fori_loop(0, w, lambda _i, a: ops.double(a), acc)
        return ops.add(acc, s), None

    acc = ops.infinity_like(coords[0][:, 0])
    acc, _ = jax.lax.scan(body, acc, rev)
    return acc  # coords with leading dim (parts,)


def _msm_device(group: str, points_xy, codes, merge_idx, K: int, w: int, parts: int = 1):
    """jit-able core: returns (jacobian coords (parts, ...), any_exceptional)."""
    ops = _ops(group)
    madd = _madd(group)
    g2 = group == "g2"
    lanes = codes.shape[1]
    bw = 1 << (w - 1)
    acc = _infinity(ops, lanes, g2)
    exc0 = jnp.zeros((lanes,), jnp.uint32)

    px, py = points_xy

    def body(carry, code_row):
        acc, exc = carry
        active = code_row != 0
        sign = (code_row >> 30) & 1
        pidx = jnp.maximum((code_row & _IDX_MASK) - 1, 0)
        qx = jnp.take(px, pidx, axis=0)
        qy = jnp.take(py, pidx, axis=0)
        acc, e = madd(acc, (qx, qy), sign.astype(bool), active)
        return (acc, exc | e), None

    (acc, exc), _ = jax.lax.scan(body, (acc, exc0), codes)

    # fold orphan sub-buckets back into their canonical lanes (complete adds)
    def merge_round(acc, idx_row):
        take = jnp.maximum(idx_row - 1, 0)
        gathered = tuple(jnp.take(c, take, axis=0) for c in acc)
        added = ops.add(acc, gathered)
        live = idx_row != 0
        mask = live.reshape((-1,) + (1,) * (acc[0].ndim - 1))
        return tuple(jnp.where(mask, a, c) for a, c in zip(added, acc)), None

    if merge_idx.shape[0]:
        acc, _ = jax.lax.scan(merge_round, acc, merge_idx)

    sums = _suffix_and_total(ops, acc, K * parts, bw)
    res = _horner(ops, sums, w, parts)
    return res, jnp.any(exc != 0)


@functools.cache
def _msm_device_jit(group: str, K: int, w: int, parts: int = 1):
    return jax.jit(
        lambda pxy, codes, merge_idx: _msm_device(
            group, pxy, codes, merge_idx, K, w, parts
        )
    )


def msm_scheduled_async(group: str, points_affine_dev, schedule: Schedule):
    """Launch the scheduled MSM; returns (result coords, exc device scalar)
    WITHOUT the host exception sync — callers batch several MSMs and check
    all exc flags with one device_get (each sync is a tunnel round trip)."""
    fn = _msm_device_jit(
        group, schedule.num_windows, schedule.window_bits, schedule.num_parts
    )
    return fn(
        points_affine_dev,
        jnp.asarray(schedule.codes),
        jnp.asarray(schedule.merge_idx),
    )


def msm_scheduled(group: str, points_affine_dev, schedule: Schedule, fallback=None):
    """Run the scheduled MSM; fall back via the given callable if the madd
    kernel hit its doubling corner (negligible probability, adversarially
    reachable — the fallback keeps completeness).

    points_affine_dev: (x, y) device arrays from g{1,2}_affine_to_device.
    fallback: zero-arg callable returning Jacobian coords with leading dim
    (num_parts,).  Returns Jacobian coords with leading dim (num_parts,).
    """
    res, exc = msm_scheduled_async(group, points_affine_dev, schedule)
    if bool(jax.device_get(exc)):  # pragma: no cover - adversarial corner
        if fallback is None:
            raise RuntimeError(
                "scheduled MSM hit the madd doubling corner and no fallback "
                "was provided"
            )
        return fallback()
    return res


def _var_base_fallback(group: str, points_host, scalars):
    def run():
        from . import msm as msm_mod

        conv = co.g1_to_device if group == "g1" else co.g2_to_device
        digits = msm_mod.scalars_to_window_digits(scalars)
        res = msm_mod.msm_var_base(_ops(group), conv(points_host), digits)
        return tuple(c[None] for c in res)

    return run


def msm_g1(points_affine_host, scalars, window_bits: int = 10, scalar_bits: int = 256):
    """Host-level convenience: affine int points + int scalars -> Jacobian
    device point (single, no leading dim)."""
    inf_mask = np.array([p is None for p in points_affine_host])
    sched = build_schedule(scalars, window_bits, inf_mask, scalar_bits=scalar_bits)
    pxy = jax.device_put(g1_affine_to_device(points_affine_host))
    res = msm_scheduled(
        "g1", pxy, sched, _var_base_fallback("g1", points_affine_host, scalars)
    )
    return tuple(c[0] for c in res)


def msm_g2(points_affine_host, scalars, window_bits: int = 10, scalar_bits: int = 256):
    inf_mask = np.array([p is None for p in points_affine_host])
    sched = build_schedule(scalars, window_bits, inf_mask, scalar_bits=scalar_bits)
    pxy = jax.device_put(g2_affine_to_device(points_affine_host))
    res = msm_scheduled(
        "g2", pxy, sched, _var_base_fallback("g2", points_affine_host, scalars)
    )
    return tuple(c[0] for c in res)
