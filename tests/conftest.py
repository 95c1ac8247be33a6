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
