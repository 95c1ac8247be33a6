"""Stage-level trace of one vote batch on the live backend (uses the cached
bench artifacts; prints [trace] lines from the prover plus outer stages)."""

import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
os.environ.setdefault("VSTPU_TRACE", "1")

import bench  # noqa: E402  (repo-root bench.py: artifact helper + cache)

bench._enable_compile_cache()

from vote_saver_tpu.protocol import phases  # noqa: E402
from vote_saver_tpu.utils.rng import FrRandom  # noqa: E402


def main():
    depth, B = int(sys.argv[1]) if len(sys.argv) > 1 else 6, (
        int(sys.argv[2]) if len(sys.argv) > 2 else 16
    )
    blobs = bench._election_artifacts(depth, 64, B)
    t0 = time.time()
    ctx = phases.prepare_vote_context(
        depth, 64, blobs["tree"], blobs["rt"], blobs["eid"],
        blobs["pk_eid"], blobs["pk_crs"], blobs["vk_crs"],
    )
    print(f"[outer] ctx parse: {time.time()-t0:.2f}s", flush=True)
    rng = FrRandom(0xB0BA)
    idxs = list(range(B))
    votes = [i % 25 for i in range(B)]
    sks = [blobs[f"sk{i}"] for i in range(B)]
    for rep in range(3):
        t0 = time.time()
        phases.vote_with_context(ctx, idxs, votes, sks, rng)
        print(f"[outer] vote batch rep{rep}: {time.time()-t0:.2f}s", flush=True)


if __name__ == "__main__":
    main()
