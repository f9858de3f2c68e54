"""Serving (RolloutServer) throughput sweep on the real chip.

VERDICT round-3 #3: the 22.8M fwd headline predates the raised Mosaic
VMEM cap and serving pinned e_tile=128 while training auto-tiled to 512.
This sweeps the ACTUAL RolloutServer.rollout (whole-window single-program
megakernel, mi-pace laikago, checkpoint-swappable traced params) over
env tiles x engines and appends one JSON line per cell.

Usage: python scripts/serve_bench.py --out docs/results/round4/serve_bench.jsonl
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _init_devices():
    import threading

    def _die():
        sys.stderr.write("FATAL: jax device init hang (tunnel down?)\n")
        os._exit(3)

    wd = threading.Timer(180.0, _die)
    wd.daemon = True
    wd.start()
    import jax

    if os.environ.get("PPR_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["PPR_PLATFORM"])
    jax.devices()
    wd.cancel()
    return jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="docs/results/round4/serve_bench.jsonl")
    ap.add_argument("--envs", type=int, default=int(
        os.environ.get("PPR_SERVE_ENVS", 4096)))
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument(
        "--cells", default="soa:128,soa:256,soa:512,xla:0",
        help="comma list of engine:e_tile cells to run",
    )
    args = ap.parse_args()

    jax = _init_devices()
    dev = str(jax.devices()[0])

    import numpy as np

    from ppr_diffphys_tpu.models.serve import RolloutServer
    from ppr_diffphys_tpu.sim.pallas_soa import pick_window_e_tile
    from ppr_diffphys_tpu.utils.config import build_opts

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    opts = build_opts(seqname="mi-pace", logroot="/tmp/ppr_serve_bench")

    cells = []
    for c in args.cells.split(","):
        eng, sep, et = c.strip().partition(":")
        if not sep or not eng:
            sys.exit(f"--cells: malformed cell {c!r} (want engine:e_tile)")
        try:
            cells.append((eng, int(et)))
        except ValueError:
            sys.exit(f"--cells: e_tile in {c!r} is not an integer")
    results = []
    for engine, et in cells:
        t_build0 = time.time()
        try:
            srv = RolloutServer(
                opts, num_envs=args.envs, engine=engine, e_tile=et or 128
            )
            E, F = srv.num_envs, srv.frames
            sub = srv.model.steps_per_fr_interval
            out = srv.rollout()  # compile + warmup
            jax.block_until_ready(out)
            t_compile = time.time() - t_build0
            t0 = time.time()
            for _ in range(args.reps):
                out = srv.rollout()
            jax.block_until_ready(out)
            dt = (time.time() - t0) / args.reps
            steps = (F - 1) * sub
            row = {
                "metric": "serving_rollout_throughput",
                "engine": engine, "e_tile": et, "envs": E, "frames": F,
                "substeps": steps,
                "env_steps_per_sec": round(E * steps / dt, 1),
                "wall_sec": round(dt, 4),
                "compile_sec": round(t_compile, 1),
                "auto_tile_would_pick": pick_window_e_tile(
                    sub, srv.model.env.n_links, srv.model.env.n_qd),
                "device": dev,
                # last frame only: a diverged rollout shows there, and the
                # full (F,E,B,7) pull is ~0.5 GB over the tunnel
                "finite": bool(np.isfinite(np.asarray(out[-1])).all()),
            }
        except Exception as e:
            row = {"engine": engine, "e_tile": et, "error": repr(e)[:300]}
        results.append(row)
        with open(args.out, "a") as f:
            f.write(json.dumps(row) + "\n")
        print(json.dumps(row))

    ok = [r for r in results if "env_steps_per_sec" in r]
    if ok:
        best = max(ok, key=lambda r: r["env_steps_per_sec"])
        print(json.dumps({"best": best}))


if __name__ == "__main__":
    main()
