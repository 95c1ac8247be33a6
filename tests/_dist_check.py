"""Worker for the 2-process jax.distributed check (tests/test_distributed.py).

Each process owns 4 virtual CPU devices; the two join one global runtime via
`sharded.init_distributed()` (VSTPU_DISTRIBUTED=1 + VSTPU_COORD/NPROC/PROCID)
and drive the flagship scheduled MSM over an 8-way `points` mesh that spans
both processes — globally-sharded inputs built with make_array_from_callback,
all-gather + psum riding the cross-process collective backend.  This is the
multi-host layout of BASELINE configs 4-5 (the reference is single-process;
SURVEY.md §2D "comm backend" axis).
"""

import os
import random
import sys

os.environ.setdefault("VSTPU_LIMB_BITS", "32")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=4").strip()

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from vote_saver_tpu.parallel import sharded  # noqa: E402
from vote_saver_tpu.ops import curve_ops as co, msm_sched  # noqa: E402
from vote_saver_tpu.refimpl import curves as rc, jacobian as rj  # noqa: E402


def main():
    assert sharded.init_distributed(), "VSTPU_DISTRIBUTED must be set"
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 8, jax.devices()

    mesh = sharded.make_mesh(8, 1)
    d = mesh.shape["points"]

    # deterministic inputs: every process derives the same full problem, but
    # each uploads only the shards its local devices own (via callback)
    rng = random.Random(0xD157)
    n = 4 * d
    pts = [rc.g1_mul(rc.g1_gen, rng.randrange(1, 1 << 60)) for _ in range(n)]
    ks = [rng.randrange(1 << 40) for _ in range(n)]
    shard = n // d
    scheds = [
        msm_sched.build_schedule(ks[i * shard : (i + 1) * shard], 5, scalar_bits=40)
        for i in range(d)
    ]
    codes, parts_, gathers = sharded.pad_schedules(scheds)
    px, py = msm_sched.g1_affine_to_device(pts)
    px, py = np.asarray(px), np.asarray(py)

    def gput(arr, spec):
        sh = NamedSharding(mesh, spec)
        return jax.make_array_from_callback(arr.shape, sh, lambda idx: arr[idx])

    gx, gy = gput(px, P("points")), gput(py, P("points"))
    gc = gput(codes, P("points"))
    gp, gg = gput(parts_, P("points")), gput(gathers, P("points"))

    fn = sharded.sharded_msm_scheduled_fn(
        mesh, "g1", scheds[0].num_windows, scheds[0].window_bits, scheds[0].num_parts
    )
    with mesh:
        res, excn = fn((gx, gy), gc, gp, gg)
    res = tuple(np.asarray(c) for c in res)  # replicated -> addressable
    got = co.g1_from_device(tuple(c[0] for c in res))
    want = rj.msm_host(pts, ks)
    assert got[0] == want, f"proc {jax.process_index()}: MSM mismatch"
    assert int(np.asarray(excn)) == 0
    print(f"DIST-OK proc={jax.process_index()} nproc={jax.process_count()}", flush=True)


if __name__ == "__main__":
    main()
