"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Tests never require real TPU hardware; multi-chip sharding paths are exercised
on 8 virtual CPU devices (the driver separately dry-runs the multichip path
via __graft_entry__.dryrun_multichip).  Must run before jax is imported.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# 32-bit limbs in uint64 on CPU (native width, ~10x faster than the TPU
# uint32/16-bit layout which CPU has no fast path for).
os.environ.setdefault("VSTPU_LIMB_BITS", "32")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# The axon TPU plugin ignores JAX_PLATFORMS; the config update is what sticks.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compile cache for the CPU test rig (separate from the TPU
# .jax_cache): the prover-pipeline programs cost multi-minute XLA compiles
# per process on the 2-core host; with analytic schedule shapes the keys are
# process-independent, so reruns hit.
import pathlib as _pathlib  # noqa: E402

_cache = _pathlib.Path(__file__).resolve().parent.parent / ".jax_cache_cpu"
_cache.mkdir(exist_ok=True)
try:
    jax.config.update("jax_compilation_cache_dir", str(_cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
except Exception:  # pragma: no cover
    pass

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def election():
    """One full depth-2 election (3 voters), shared by every e2e-ish test.

    The artifacts are deterministic (seeded FrRandom) and ~2 min to build on
    the 2-core rig, so they are cached on disk across pytest sessions — the
    same write-once artifact contract as the reference CLI
    (/root/reference/bin/cli/src/main.cpp:362-366,472-489).  Delete
    tests/.election_cache (or set VSTPU_TEST_CACHE=0) after changing any
    phase/marshal/prover code the blobs depend on; e2e tests re-derive and
    verify everything from the blobs, so a stale cache fails loudly.
    """
    import pathlib
    import pickle

    from vote_saver_tpu.protocol import phases
    from vote_saver_tpu.utils.rng import FrRandom

    cache = pathlib.Path(__file__).parent / ".election_cache" / "d2_v3.pkl"
    use_cache = os.environ.get("VSTPU_TEST_CACHE", "1") == "1"
    if use_cache and cache.exists():
        e = pickle.loads(cache.read_bytes())
        e["rng"] = FrRandom(0xE1EC8)
        return e

    rng = FrRandom(0xE1EC7)
    voters = [phases.init_voter_phase(i, rng) for i in range(3)]
    keys = phases.init_admin_phase_generate_keys(2, 64, rng)
    pk_crs, vk_crs, pk_eid, sk_eid, vk_eid = keys
    eid_blob, rt_blob, tree_blob = phases.init_admin_phase_generate_data(
        2, 64, [v[0] for v in voters], rng
    )
    votes = [5, 5, 17]
    ballots = phases.vote_phase_batch(
        2, 64, [0, 1, 2], votes, tree_blob, rt_blob, eid_blob,
        [v[1] for v in voters], pk_eid, pk_crs, vk_crs, rng,
    )
    e = dict(
        voters=voters, votes=votes, ballots=ballots,
        pk_crs=pk_crs, vk_crs=vk_crs, pk_eid=pk_eid, sk_eid=sk_eid,
        vk_eid=vk_eid, eid=eid_blob, rt=rt_blob, tree=tree_blob,
    )
    if use_cache:
        cache.parent.mkdir(exist_ok=True)
        cache.write_bytes(pickle.dumps(e))
    e["rng"] = rng
    return e
