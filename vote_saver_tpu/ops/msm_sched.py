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
    more than `steps` entries spills chunk-by-chunk into orphan accumulator
    lanes (a CONTIGUOUS run per bucket, beyond the canonical K*2^(w-1)),
    which a fixed segmented Hillis-Steele tree folds into each run's head;
    one gather round then adds the heads back into their canonical lanes.
    Keeps lane occupancy high instead of letting one hot bucket serialise
    the whole MSM, at log (not linear) merge depth.
    """

    codes: np.ndarray  # (steps, lanes) int32: 0 = idle; else (pidx+1) | sign<<30
    merge_part: np.ndarray  # (_MROUNDS, lanes-canon) int32: orphan-region
    # tree partner position+1 (0 = idle) per round
    merge_gather: np.ndarray  # (canon,) int32: orphan-run head position+1
    # in the orphan region (0 = no orphans for this bucket)
    window_bits: int
    num_windows: int  # windows per part
    lanes: int  # canonical + orphan lanes, padded to a multiple of 128
    total_entries: int
    num_parts: int = 1  # batched multi-MSM: independent scalar vectors
    # sharing one point set (e.g. voters over a common CRS)


def _pad_up(x: int, m: int) -> int:
    return -(-x // m) * m


# Schedule shapes are chosen ANALYTICALLY from (total entries, canonical
# lanes) and quantised to this geometric grid, so every batch of a given MSM
# family lands on ONE compiled device program — and, being process-
# independent, on the SAME persistent-cache entry across processes.  (The
# earlier largest-shape-seen memo recompiled the multi-minute MSM programs
# whenever a batch's data-dependent shape grew mid-run — the round-4/5 bench
# regressions — and keyed differently in every process.)
_STEP_GRID = [16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224,
              256, 320, 384, 448, 512, 640, 768, 1024, 1536, 2048, 3072,
              4096, 6144, 8192]
# Witness scalar vectors are EXTREMELY bucket-skewed: thousands of 0/1-valued
# wires (Pedersen/Merkle bit columns) put their single nonzero digit into the
# same (window 0, digit 1) bucket, so one bucket's load can be ~500x the mean.
# The chunk cap is therefore deep (2^10 chunks/bucket): a hot bucket spreads
# over hundreds of orphan-run lanes scanned in the SAME mean-sized step count,
# and the segmented tree folds the run in log2 depth.  (Escalating `steps` to
# the max load instead — or linear merge rounds — made the real-witness MSMs
# 5-20x slower than uniform-scalar ones in rounds 1-4.)
_MROUNDS = 10  # segmented-tree merge rounds
_MAX_CHUNKS = 1 << _MROUNDS  # per-bucket chunk cap; beyond it (adversarial
# scalar sets) `steps` escalates up the grid


def _grid_up(x: int) -> int:
    for g in _STEP_GRID:
        if g >= x:
            return g
    return _pad_up(x, _STEP_GRID[-1])


def _lane_pad() -> int:
    """Lane-count padding granularity: coarse on TPU (stable jit shapes,
    full lane tiles), fine on the CPU test/dryrun rig (complete-add lanes
    are expensive there and shapes recompile cheaply)."""
    return 1024 if jax.default_backend() == "tpu" else 128


def _fit_shape(loads: np.ndarray, total: int, canon: int):
    """(steps, lanes, orph_cnt): the grid-quantised schedule shape, escalated
    (rare — degenerate scalar sets) until every bucket fits _MAX_CHUNKS
    chunks and the orphan runs fit the orphan region."""
    lam = total / max(canon, 1)
    # 1.15x mean-load slack: tighter than 1.3x (slots = steps * lanes is the
    # device cost), with the overflow riding the orphan tree (budget
    # canon/16; Poisson tails at prover lambda ~30-60 stay well inside it)
    steps = _grid_up(max(16, int(lam * 1.15) + 2))
    # orphan region sized for witness-style bucket skew (see _MROUNDS note):
    # real depth-6 prover batches spill ~5-15k hot-bucket chunks against a
    # canonical 221k — canon/8 keeps every batch far from the escalation
    # edge, so shapes never flap between batches of one election
    lanes = _pad_up(canon + max(1024, canon // 8), _lane_pad())
    while True:
        chunks = -(-loads // steps) if total else np.zeros(canon, np.int64)
        orph_cnt = np.maximum(chunks - 1, 0)
        max_chunks = int(chunks.max()) if total else 0
        if int(orph_cnt.sum()) <= lanes - canon and max_chunks <= _MAX_CHUNKS:
            return steps, lanes, orph_cnt.astype(np.int64)
        steps = _grid_up(steps + 1)


def _merge_arrays(orph_cnt: np.ndarray, canon: int, lanes: int):
    """Segmented-tree merge plan.  Bucket b's orphan chunks occupy the
    contiguous orphan-region run [orph_base[b], orph_base[b]+orph_cnt[b]);
    _MROUNDS Hillis-Steele rounds (position o absorbs o + 2^r while inside
    the run) fold each run into its head; merge_gather then points each
    canonical lane at its run head.  Returns (part, gather, orph_base)."""
    orph_len = lanes - canon
    part = np.zeros((_MROUNDS, orph_len), np.int32)
    gather = np.zeros(canon, np.int32)
    orph_base = np.zeros(canon, np.int64)
    n_orph = int(orph_cnt.sum())
    if n_orph:
        orph_base[1:] = np.cumsum(orph_cnt, dtype=np.int64)[:-1]
        bsel = np.nonzero(orph_cnt)[0]
        reps = orph_cnt[bsel]
        base_rep = np.repeat(orph_base[bsel], reps)
        pos = np.arange(n_orph, dtype=np.int64)
        within = pos - base_rep
        cnt_rep = np.repeat(reps, reps)
        for r in range(_MROUNDS):
            sh = 1 << r
            m = within + sh < cnt_rep
            part[r, pos[m]] = (pos[m] + sh + 1).astype(np.int32)
        gather[bsel] = (orph_base[bsel] + 1).astype(np.int32)
    return part, gather, orph_base


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


def default_window_bits() -> int:
    """Prover MSM window width; VSTPU_MSM_W overrides for sweeps.

    The tradeoff is multi-part-aware: bucket-accumulation work scales with
    windows-per-scalar K ~ 256/w (favours large w), while the combination
    passes scale with lanes = parts * K * 2^(w-1) (favours small w — at the
    prover's B=16 multi-part shapes lanes dominate the device time)."""
    return int(os.environ.get("VSTPU_MSM_W", "10"))


def build_schedule_multi(scalar_limbs_list, window_bits: int | None = None, inf_mask=None) -> Schedule:
    """One schedule for B independent scalar vectors over a SHARED point set
    (the prover's voters x CRS case): windows of part i live at window offset
    i*K, so bucket accumulation and combination run as one device program.

    Dispatches to the native two-pass scheduler (native/vs_native.cpp
    vs_sched_pass1/2 — no sort, threaded) when built; the numpy argsort path
    below doubles as its oracle (tests/test_curve_msm_ntt.py)."""
    w = window_bits if window_bits is not None else default_window_bits()
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

    steps, lanes, orph_cnt = _fit_shape(loads, total, canon)
    part, gather, orph_base = _merge_arrays(orph_cnt, canon, lanes)
    codes = nb.sched_pass2(
        digits, parts, n, w, inf_mask, counts,
        orph_base.astype(np.int32), steps, steps, lanes
    )
    return Schedule(codes, part, gather, w, K, lanes, total, parts)


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

    loads = np.bincount(lane, minlength=canon).astype(np.int64)
    steps, lanes, orph_cnt = _fit_shape(loads, total, canon)
    part, gather, orph_base = _merge_arrays(orph_cnt, canon, lanes)

    order = np.argsort(lane, kind="stable")
    lane_s, p_s, sign_s = lane[order], p[order], sign[order]
    first_pos = np.searchsorted(lane_s, lane_s, side="left")
    occ = np.arange(total) - first_pos

    chunk = occ // steps  # 0 = canonical accumulator, >=1 spills to orphans
    step = occ % steps
    # orphan chunk c of bucket b lands at the contiguous run position
    # canon + orph_base[b] + (c-1) — the exact layout the native pass2 emits
    entry_lane = np.where(
        chunk == 0, lane_s, canon + orph_base[lane_s] + chunk - 1
    )

    codes = np.zeros((steps, lanes), dtype=np.int32)
    codes[step, entry_lane] = (p_s + 1) | (sign_s << 30)
    assert K % num_parts == 0
    return Schedule(codes, part, gather, w, K // num_parts, lanes, total, num_parts)


def unify_schedule_shapes(*schedules: "Schedule") -> None:
    """Pad the given same-(K, w, parts) schedules to one common
    (steps, lanes) shape IN PLACE, so every query MSM built from
    them hits ONE compiled device program (each distinct schedule shape
    otherwise costs its own multi-minute compile on the TPU backend).
    Padding is zero codes / zero merge entries = idle lanes."""
    assert len({(s.num_windows, s.window_bits, s.num_parts) for s in schedules}) == 1
    steps = max(s.codes.shape[0] for s in schedules)
    lanes = max(s.lanes for s in schedules)
    canon = schedules[0].merge_gather.shape[0]
    for s in schedules:
        assert s.merge_gather.shape[0] == canon
        if s.codes.shape == (steps, lanes):
            continue
        c = np.zeros((steps, lanes), np.int32)
        c[: s.codes.shape[0], : s.codes.shape[1]] = s.codes
        m = np.zeros((_MROUNDS, lanes - canon), np.int32)
        m[:, : s.merge_part.shape[1]] = s.merge_part
        s.codes, s.merge_part, s.lanes = c, m, lanes


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


def _addx(group: str, distinct: bool = False):
    """(p, q) -> (p + q, doubling-corner flag) — the combination-phase adder.

    distinct=False: the complete add (correct for EQUAL operands, which the
    suffix rounds hit systematically via empty bucket ranges); flag is
    identically zero.  distinct=True: the flagged distinct add on the Pallas
    path (12 Fq muls vs the complete formula's ~25 with its inline double) —
    ONLY valid when the accumulator lanes carry distinct offsets that make
    operand collisions measure-zero; the flag feeds the caller's
    complete-formula fallback for the adversarial remainder."""
    ops = _ops(group)
    lead = 2 if group == "g2" else 1
    if distinct and ops._pallas() is not None:
        from . import pallas_field as pf

        return pf.g1_addx_pallas if group == "g1" else pf.g2_addx_pallas

    def addc(p, q):
        out = ops.add(p, q)
        return out, jnp.zeros(p[0].shape[: p[0].ndim - lead], jnp.uint32)

    return addc


def _infinity(ops, lanes, g2: bool):
    L = fq_spec().num_limbs
    dtype = ops.f.fq.dtype if g2 else ops.f.dtype
    shape = (lanes, 2, L) if g2 else (lanes, L)
    x = jnp.zeros(shape, dtype)
    return ops.infinity_like(x)


def _suffix_and_total(ops, addx, acc, K: int, bw: int):
    """acc: Jacobian coords with leading dim (K*bw[, pad]) -> per-window
    weighted sums S_w = sum_b (b+1) * acc[w, b] as coords (K, ...), plus an
    exceptional-flag scalar.

    Two passes of the same masked Hillis-Steele doubling body, as ONE
    lax.scan body compiled once (not log2(bw) inlined rounds — the unrolled
    form dominated the scheduled MSM's XLA graph and its TPU compile time):
    pass 1 turns buckets into suffix sums S_b = sum_{j>=b} a_j, pass 2 sums
    those (position 0 then holds sum_b S_b = sum_b (b+1) a_b).  Out-of-range
    partners enter as infinity, which the adder absorbs.

    The adder (`addx`) must handle EQUAL operands: empty bucket ranges make
    adjacent suffix partials collide systematically (not measure-zero), so
    pass the complete add (flag identically zero) unless distinct per-lane
    offsets in the accumulator init de-duplicate the partials."""
    coords = tuple(c[: K * bw].reshape((K, bw) + c.shape[1:]) for c in acc)
    exc = jnp.zeros((), jnp.uint32)
    if bw > 1:
        steps = (bw - 1).bit_length()
        shifts = jnp.asarray([1 << s for s in range(steps)], jnp.int32)
        idx = jnp.arange(bw)
        inf = ops.infinity_like(coords[0])

        def body(carry, shift):
            cs, e = carry
            valid = (idx + shift < bw).reshape(
                (1, bw) + (1,) * (cs[0].ndim - 2)
            )
            rolled = tuple(
                jnp.where(valid, jnp.roll(c, -shift, axis=1), i)
                for c, i in zip(cs, inf)
            )
            added, flag = addx(cs, rolled)
            return (added, e | jnp.any(flag != 0).astype(jnp.uint32)), None

        (coords, exc), _ = jax.lax.scan(body, (coords, exc), shifts)
        (coords, exc), _ = jax.lax.scan(body, (coords, exc), shifts)
    return tuple(c[:, 0] for c in coords), exc


def _horner(ops, addx, window_sums, w: int, parts: int):
    """result[p] = sum_j 2^(w*j) * S_{p,j} via MSB-first Horner scan, batched
    over parts; returns (coords (parts, ...), exceptional flag).  The w
    doublings ride a fori_loop (one compiled double body, not w inlined)."""
    coords = tuple(
        c.reshape((parts, c.shape[0] // parts) + c.shape[1:]) for c in window_sums
    )
    rev = tuple(jnp.moveaxis(c[:, ::-1], 1, 0) for c in coords)  # (K, parts, ...)

    def body(carry, s):
        acc, e = carry
        acc = jax.lax.fori_loop(0, w, lambda _i, a: ops.double(a), acc)
        added, flag = addx(acc, s)
        return (added, e | jnp.any(flag != 0).astype(jnp.uint32)), None

    acc = ops.infinity_like(coords[0][:, 0])
    (acc, exc), _ = jax.lax.scan(body, (acc, jnp.zeros((), jnp.uint32)), rev)
    return acc, exc  # coords with leading dim (parts,)


def _msm_device(group: str, points_xy, codes, merge_part, merge_gather,
                K: int, w: int, parts: int = 1):
    """jit-able core: returns (jacobian coords (parts, ...), any_exceptional)."""
    ops = _ops(group)
    madd = _madd(group)
    g2 = group == "g2"
    lanes = codes.shape[1]
    canon = merge_gather.shape[0]
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

    # fold orphan runs into their heads (segmented tree over the orphan
    # region only — a few tiles) then the heads into their canonical lanes
    # (one full-width round); complete adds, so no flags can fire here
    def masked_add(coords, idx_row):
        take = jnp.maximum(idx_row - 1, 0)
        gathered = tuple(jnp.take(c, take, axis=0) for c in coords)
        added = ops.add(coords, gathered)
        live = (idx_row != 0).reshape((-1,) + (1,) * (coords[0].ndim - 1))
        return tuple(jnp.where(live, a, c) for a, c in zip(added, coords))

    can = tuple(c[:canon] for c in acc)
    if merge_part.shape[1]:
        orph = tuple(c[canon:] for c in acc)

        def tree_round(orph, part_row):
            return masked_add(orph, part_row), None

        orph, _ = jax.lax.scan(tree_round, orph, merge_part)
        take = jnp.maximum(merge_gather - 1, 0)
        heads = tuple(jnp.take(c, take, axis=0) for c in orph)
        added = ops.add(can, heads)
        live = (merge_gather != 0).reshape((-1,) + (1,) * (can[0].ndim - 1))
        can = tuple(jnp.where(live, a, c) for a, c in zip(added, can))

    addx = _addx(group)
    sums, exc_s = _suffix_and_total(ops, addx, can, K * parts, bw)
    res, exc_h = _horner(ops, addx, sums, w, parts)
    return res, jnp.any(exc != 0) | (exc_s != 0) | (exc_h != 0)


@functools.cache
def _msm_device_jit(group: str, K: int, w: int, parts: int = 1):
    return jax.jit(
        lambda pxy, codes, merge_part, merge_gather: _msm_device(
            group, pxy, codes, merge_part, merge_gather, K, w, parts
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
        jnp.asarray(schedule.merge_part),
        jnp.asarray(schedule.merge_gather),
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
