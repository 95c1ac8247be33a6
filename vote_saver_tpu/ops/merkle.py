"""Level-parallel Merkle tree over Pedersen digests.

Replaces crypto3::containers make_merkle_tree / merkle_proof (SURVEY.md §2B
`containers` row; reference common.hpp:956-958,1026-1027,616-636) with a
batched device build: every level is one Pedersen kernel call over all nodes
of that level (the reference builds the tree serially node-by-node).

Tree layout (matches our marshalling spec, docs/WIRE_FORMATS.md):
  * leaves are voter public keys (255-bit arrays);
  * level-0 node digest = H(leaf bits); parent = H(left ‖ right) (510 bits);
  * the serialized tree is all node digests, leaf level first, root last —
    2^(d+1)-1 digests for depth d.
"""

from __future__ import annotations

import jax
import numpy as np

from ..backend import use_device
from ..params import DIGEST_BITS, PUBLIC_KEY_BITS
from . import pedersen_ops as po


_hash_jit_cache: dict = {}


def _hash_rows(rows: np.ndarray, nbits: int) -> np.ndarray:
    """Batch Pedersen: device kernel on TPU, host oracle otherwise (the CPU
    XLA path pays tens of seconds of compile for nothing at small scale)."""
    if use_device():
        # one cached jit per input width: a fresh jax.jit object per call
        # would recompile remotely every time (~minutes through the tunnel)
        if nbits not in _hash_jit_cache:
            _hash_jit_cache[nbits] = jax.jit(
                lambda b: po.pedersen_hash_bits(b, nbits)
            )
        return np.asarray(_hash_jit_cache[nbits](rows))
    from ..refimpl import pedersen as rpd

    return np.array([rpd.pedersen_hash(list(map(int, r))) for r in rows], np.uint32)


def build_tree(leaf_bits: np.ndarray) -> list[np.ndarray]:
    """leaf_bits: (2^d, 255) 0/1 -> list of per-level digest arrays
    [level0 (2^d, 255), level1 (2^(d-1), 255), ..., root (1, 255)]."""
    n = leaf_bits.shape[0]
    assert n & (n - 1) == 0 and n >= 1
    levels = [_hash_rows(np.asarray(leaf_bits), PUBLIC_KEY_BITS)]
    while levels[-1].shape[0] > 1:
        cur = levels[-1]
        paired = cur.reshape(cur.shape[0] // 2, 2 * DIGEST_BITS)
        levels.append(_hash_rows(paired, 2 * DIGEST_BITS))
    return levels


def root(levels: list[np.ndarray]) -> np.ndarray:
    return levels[-1][0]


def flatten_tree(levels: list[np.ndarray]) -> np.ndarray:
    """All node digests, leaf level first -> (2^(d+1)-1, 255)."""
    return np.concatenate(levels, axis=0)


def unflatten_tree(flat: np.ndarray, depth: int) -> list[np.ndarray]:
    levels, off = [], 0
    n = 1 << depth
    while n >= 1:
        levels.append(flat[off : off + n])
        off += n
        n //= 2
    assert off == flat.shape[0]
    return levels


def copath(levels: list[np.ndarray], index: int) -> np.ndarray:
    """Sibling digests bottom-up for the given leaf index -> (depth, 255)."""
    sibs = []
    idx = index
    for lvl in levels[:-1]:
        sibs.append(lvl[idx ^ 1])
        idx //= 2
    return np.stack(sibs, axis=0)


def verify_path(leaf_digest: np.ndarray, index: int, sibs: np.ndarray, root_bits: np.ndarray) -> bool:
    """Host-side path check (test helper mirroring the in-circuit gadget)."""
    cur = np.asarray(leaf_digest)
    idx = index
    for s in np.asarray(sibs):
        pair = np.concatenate([s, cur] if idx & 1 else [cur, s])
        cur = _hash_rows(pair[None, :], 2 * DIGEST_BITS)[0]
        idx //= 2
    return bool(np.array_equal(cur, np.asarray(root_bits)))
