"""Full-sequence eval cost: padded-soa (round-4) vs xla (round-3) routing.

VERDICT round-3 #6 'Done' criterion: measured eval wall time before/after;
no ~9-min Mosaic compile on first eval. Mimics the production cadence:
compile + run the training step first (as main.py does), then time the
first full-sequence eval (compile) and the steady-state eval.

Usage: python scripts/eval_bench.py --out docs/results/round4/eval_bench.jsonl
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


def measure(jax, eval_engine, seqname="mi-pace"):
    import numpy as np

    from ppr_diffphys_tpu.data.amp_loader import DataLoader
    from ppr_diffphys_tpu.models.phys_model import phys_model
    from ppr_diffphys_tpu.utils.config import build_opts

    opts = build_opts(
        seqname=seqname, logroot="/tmp/ppr_eval_bench",
        eval_engine=eval_engine,
    )
    m = phys_model(opts, DataLoader(opts))

    # training step first (production cadence): compiles the interval
    # kernels the padded eval is meant to reuse
    m.reinit_envs(opts["num_envs"], frames_per_wdw=opts["frames_per_wdw"],
                  is_eval=False)
    t0 = time.time()
    out = m.forward()
    jax.block_until_ready(out["total_loss"])
    t_train_compile = time.time() - t0
    m._grad_accum.clear()

    m.reinit_envs(1, frames_per_wdw=m.total_frames, is_eval=True)
    t0 = time.time()
    out = m.forward()
    loss1 = float(out["loss_traj"])
    t_eval_first = time.time() - t0
    t0 = time.time()
    reps = 3
    for _ in range(reps):
        out = m.forward()
    jax.block_until_ready(out["total_loss"])
    t_eval_steady = (time.time() - t0) / reps
    return {
        "metric": "full_sequence_eval",
        "seqname": seqname,
        "eval_engine": eval_engine,
        "resolved": m.resolve_engine(is_train=False),
        "padded_envs": m.num_envs,
        "frames": m.total_frames,
        "train_first_iter_sec": round(t_train_compile, 2),
        "eval_first_sec": round(t_eval_first, 2),
        "eval_steady_sec": round(t_eval_steady, 3),
        "loss_traj": loss1,
        "finite": bool(np.isfinite(loss1)),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="docs/results/round4/eval_bench.jsonl")
    ap.add_argument("--seqname", default="mi-pace")
    args = ap.parse_args()
    jax = _init_devices()
    dev = str(jax.devices()[0])
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    # 'soa' (forced padded training-kernel eval) vs 'xla': after the
    # round-5 routing flip 'auto' resolves to 'xla', so measuring 'auto'
    # would time the XLA arm twice and the comparison this script exists
    # for (padded-soa vs XLA eval) would be unreproducible
    for ev in ("soa", "xla"):
        row = measure(jax, ev, seqname=args.seqname)
        row["device"] = dev
        with open(args.out, "a") as f:
            f.write(json.dumps(row) + "\n")
        print(json.dumps(row))


if __name__ == "__main__":
    main()
