"""BASELINE.json config runner — full election at scale, with recorded timing.

Runs one of the driver-assigned BASELINE configs end to end (keygen -> data ->
batched proving -> tally -> verify) and writes a JSON timing record.  Config 3
(1k voters, depth 10) is the VERDICT round-1 item-4 acceptance shape; the
reference can only run these shapes as serial per-voter loops
(reference bin/cli/src/main.cpp:201-323, test/cli.cpp:48-50).

    # config 3 on the virtual 8-device CPU mesh:
    python scripts/scale_run.py --config 3 --mesh-cpu --out SCALE_r02.json
    # config 2 on the real chip:
    python scripts/scale_run.py --config 2 --out SCALE_tpu.json

Artifacts cache under .bench_cache/scale_d{depth}_v{voters} so an interrupted
run resumes (the reference's idempotent-artifact contract, main.cpp:362-366).
"""

import argparse
import json
import os
import pathlib
import sys
import time

_REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_REPO))

CONFIGS = {
    1: dict(depth=2, voters=4, batch=4),
    2: dict(depth=6, voters=64, batch=16),
    3: dict(depth=10, voters=1024, batch=32),
    4: dict(depth=14, voters=10240, batch=32),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=int, default=3)
    ap.add_argument("--voters", type=int, help="override voter count")
    ap.add_argument("--batch", type=int, help="override prover batch size")
    ap.add_argument("--mesh-cpu", action="store_true",
                    help="8 virtual CPU devices + 32-bit limbs (the test rig)")
    ap.add_argument("--out", default="SCALE_run.json")
    ap.add_argument("--verify-sample", type=int, default=4,
                    help="how many ballots to vergrth16-verify individually")
    ap.add_argument("--stream", action="store_true",
                    help="software-pipelined vote batches (device-tail path)")
    args = ap.parse_args()

    if args.mesh_cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ.setdefault("VSTPU_LIMB_BITS", "32")
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count=8"
            ).strip()

    import jax

    if args.mesh_cpu:
        jax.config.update("jax_platforms", "cpu")

    from vote_saver_tpu.protocol import phases
    from vote_saver_tpu.utils.rng import FrRandom

    cfg = CONFIGS[args.config]
    depth = cfg["depth"]
    n_voters = args.voters or cfg["voters"]
    B = args.batch or cfg["batch"]
    eid_bits = 64
    rec = dict(
        config=args.config, depth=depth, voters=n_voters, batch=B,
        backend=jax.default_backend(), devices=jax.device_count(),
        times_s={},
    )
    t = rec["times_s"]
    cache = _REPO / ".bench_cache" / f"scale_d{depth}_v{n_voters}"
    cache.mkdir(parents=True, exist_ok=True)

    def step(name, fn):
        t0 = time.time()
        out = fn()
        t[name] = round(time.time() - t0, 2)
        print(f"[scale] {name}: {t[name]}s", flush=True)
        return out

    def cached(name, fn):
        """bytes-tuple cache on disk: resume an interrupted run."""
        marker = cache / f"{name}.ok"
        if marker.exists():
            n = int(marker.read_text())
            t[name] = json.loads((cache / f"{name}.time").read_text())
            return tuple((cache / f"{name}.{i}").read_bytes() for i in range(n))
        out = step(name, fn)
        for i, b in enumerate(out):
            (cache / f"{name}.{i}").write_bytes(b)
        (cache / f"{name}.time").write_text(json.dumps(t[name]))
        marker.write_text(str(len(out)))
        return out

    mesh = None
    if args.mesh_cpu:
        # the 8-virtual-device mesh drives the SHARDED prover
        # (groth16._prove_msms_sharded): point-sharded MSMs + collectives
        from vote_saver_tpu.parallel import sharded

        mesh = sharded.make_mesh(4, 2)
        rec["mesh"] = "points=4 x voters=2"

    rng = FrRandom(0x5CA1E)

    flat = cached(
        "voter_init",
        lambda: tuple(
            b for i in range(n_voters) for b in phases.init_voter_phase(i, rng)
        ),
    )
    voters = [(flat[2 * i], flat[2 * i + 1]) for i in range(n_voters)]
    pk_crs, vk_crs, pk_eid, sk_eid, vk_eid = cached(
        "admin_keygen",
        lambda: phases.init_admin_phase_generate_keys(depth, eid_bits, rng),
    )
    eid_b, rt_b, tree_b = cached(
        "admin_data",
        lambda: phases.init_admin_phase_generate_data(
            depth, eid_bits, [v[0] for v in voters], rng
        ),
    )
    ctx = step(
        "vote_ctx_parse",
        lambda: phases.prepare_vote_context(
            depth, eid_bits, tree_b, rt_b, eid_b, pk_eid, pk_crs, vk_crs
        ),
    )

    votes = [i % 25 for i in range(n_voters)]
    ballots = []
    t0 = time.time()
    warm = None
    if args.stream:
        # software-pipelined voting (phases.vote_with_context_stream):
        # byte-identical ballots, batch i+1 host work under batch i device
        # MSMs
        batches = [
            (
                list(range(off, min(off + B, n_voters))),
                [votes[i] for i in range(off, min(off + B, n_voters))],
                [voters[i][1] for i in range(off, min(off + B, n_voters))],
            )
            for off in range(0, n_voters, B)
        ]
        bt0 = time.time()
        for out in phases.vote_with_context_stream(ctx, batches, rng):
            ballots += out
            if warm is None:
                warm = round(time.time() - bt0, 2)  # includes compiles
            print(f"[scale] voted {len(ballots)}/{n_voters} "
                  f"({time.time()-bt0:.1f}s since last)", flush=True)
            bt0 = time.time()
        rec["vote_mode"] = "stream"
    else:
        for off in range(0, n_voters, B):
            idxs = list(range(off, min(off + B, n_voters)))
            bt0 = time.time()
            ballots += phases.vote_with_context(
                ctx, idxs, [votes[i] for i in idxs],
                [voters[i][1] for i in idxs], rng, mesh=mesh,
            )
            if warm is None:
                warm = round(time.time() - bt0, 2)  # includes compiles
            print(f"[scale] voted {len(ballots)}/{n_voters} "
                  f"({time.time()-bt0:.1f}s batch)", flush=True)
    t["vote_total"] = round(time.time() - t0, 2)
    t["vote_first_batch_incl_compile"] = warm
    rec["proofs_per_s"] = round(n_voters / t["vote_total"], 4)
    steady = t["vote_total"] - warm
    if n_voters > B and steady > 0:
        rec["proofs_per_s_steady"] = round((n_voters - B) / steady, 4)

    cts = [b[2] for b in ballots]
    ok_sample = step(
        "vergrth16_sample",
        lambda: all(
            phases.verify_ballot(ballots[i][0], ballots[i][1], ballots[i][2],
                                 vk_eid, vk_crs)
            for i in range(0, n_voters, max(1, n_voters // args.verify_sample))[: args.verify_sample]
        ),
    )
    assert ok_sample, "ballot verification failed"
    dec_proof, voting_res = step(
        "tally_admin",
        lambda: phases.tally_admin_phase(depth, cts, sk_eid, vk_eid, pk_crs, vk_crs),
    )
    ok = step(
        "tally_verify",
        lambda: phases.tally_voter_phase(
            depth, cts, vk_eid, pk_crs, vk_crs, voting_res, dec_proof
        ),
    )
    assert ok, "tally verification failed"

    import struct
    n = struct.unpack(">Q", voting_res[:8])[0]
    counts = [int.from_bytes(voting_res[8 + 32 * i: 8 + 32 * (i + 1)], "big")
              for i in range(n)]
    expect = [sum(1 for v in votes if v == c) for c in range(25)]
    assert counts == expect, f"tally mismatch: {counts} != {expect}"
    rec["tally_counts_ok"] = True
    rec["total_s"] = round(
        sum(v for k, v in t.items() if k != "vote_first_batch_incl_compile"), 2
    )

    out = _REPO / args.out
    out.write_text(json.dumps(rec, indent=1))
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
