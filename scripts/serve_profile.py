"""Profile one serving rollout and print the per-op device-time split.

The round-5 serving measurement (docs/results/round5/serve_bench.jsonl)
is 17.6M env-steps/sec against the 23M pure-rollout kernel rate — a
~24% wall overhead attributed (by subtraction, not measurement) to the
FK/grid prologue + output staging. This script measures the split: it
traces steady-state `RolloutServer.rollout()` calls with the jax
profiler and prints every device op's share, so "what still dominates"
is an artifact instead of an inference.

Usage: python scripts/serve_profile.py \
           --out docs/results/round5/serve_profile.json
"""

import argparse
import glob
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="docs/results/round5/serve_profile.json")
    ap.add_argument("--envs", type=int, default=4096)
    ap.add_argument("--engine", default="soa")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax

    from ppr_diffphys_tpu.data.amp_loader import DataLoader
    from ppr_diffphys_tpu.models.serve import RolloutServer
    from ppr_diffphys_tpu.utils.config import build_opts

    opts = build_opts(seqname="mi-pace", logroot="/tmp/ppr_serve_prof")
    srv = RolloutServer(opts, num_envs=args.envs, engine=args.engine)

    # warm (compile both paths' first call)
    out = srv.rollout()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = srv.rollout()
    jax.block_until_ready(out)
    steady_wall = time.perf_counter() - t0

    d = tempfile.mkdtemp(prefix="ppr_serve_prof_")
    with jax.profiler.trace(d):
        for _ in range(args.reps):
            out = srv.rollout()
            jax.block_until_ready(out)

    pbs = glob.glob(d + "/**/*.xplane.pb", recursive=True)
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    with open(sorted(pbs)[-1], "rb") as f:
        xs.ParseFromString(f.read())

    per_op, busy_ps = {}, 0
    for plane in xs.planes:
        if "TPU" not in plane.name or "SparseCore" in plane.name:
            continue
        names = {m.id: m.name for m in plane.event_metadata.values()}
        for line in plane.lines:
            if line.name not in ("XLA Ops", "XLA Op"):
                continue
            acc, tot = {}, 0
            for ev in line.events:
                tot += ev.duration_ps
                n = names.get(ev.metadata_id, "?")
                acc[n] = acc.get(n, 0) + ev.duration_ps
            if tot > busy_ps:
                busy_ps, per_op = tot, acc

    busy = busy_ps * 1e-12 / args.reps
    rows = sorted(per_op.items(), key=lambda kv: -kv[1])
    F = srv.frames
    sub = srv.model.steps_per_fr_interval
    env_steps = args.envs * (sub * (F - 1) + 1)
    result = {
        "envs": args.envs,
        "engine": args.engine,
        "steady_wall_sec": round(steady_wall, 4),
        "device_busy_sec_per_rep": round(busy, 4),
        "device_busy_frac": round(busy / steady_wall, 3),
        "env_steps_per_sec": round(env_steps / steady_wall, 1),
        "ops": [
            {
                "op": n[:96],
                "frac_of_busy": round(ps / busy_ps, 4),
                "ms_per_rep": round(ps * 1e-9 / args.reps, 3),
            }
            for n, ps in rows
            if ps / busy_ps >= 0.005
        ],
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
