"""Execution-provider selection: device (TPU) kernels vs host big-int path.

The TPU is the production target; on CPU-only hosts (CI, the virtual
multi-chip mesh) sequential host Pippenger beats lane-parallel XLA for the
curve workloads, so the protocol layer dispatches on this switch.  Override
with VSTPU_FORCE_BACKEND=device|host.
"""

from __future__ import annotations

import os


def use_device() -> bool:
    forced = os.environ.get("VSTPU_FORCE_BACKEND")
    if forced == "device":
        return True
    if forced == "host":
        return False
    import jax

    return jax.default_backend() == "tpu"
