"""Isolate which piece of the serving program breaks the remote compiler.

Round-4 serve_bench failed ALL cells (soa 128/256/512 AND xla) with
`tpu_compile_helper subprocess exit code 1` while eval_bench's padded
10-env programs compiled fine minutes later — so the suspect is either
(a) the shared serving prologue at large E (get_batch_input /
interpolation / eval_fk at 4096 envs), (b) the whole-window kernel, or
(c) a transient helper fault. This compiles the serving program in
stages at increasing env counts and appends one JSON line per stage, so
one run adjudicates.

Usage: python scripts/serve_diag.py --out docs/results/round4/serve_diag.jsonl
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

    jax.devices()
    wd.cancel()
    return jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="docs/results/round4/serve_diag.jsonl")
    args = ap.parse_args()
    jax = _init_devices()
    import jax.numpy as jnp
    import numpy as np

    from ppr_diffphys_tpu.data.amp_loader import DataLoader
    from ppr_diffphys_tpu.models.phys_model import phys_model
    from ppr_diffphys_tpu.ops import swap_lin_ang
    from ppr_diffphys_tpu.sim.integrator import SimState
    from ppr_diffphys_tpu.sim.kinematics import eval_fk
    from ppr_diffphys_tpu.utils.config import build_opts

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    opts = build_opts(seqname="mi-pace", logroot="/tmp/ppr_serve_diag")
    m = phys_model(opts, DataLoader(opts))

    def emit(row):
        with open(args.out, "a") as f:
            f.write(json.dumps(row) + "\n")
        print(json.dumps(row))

    def stage(name, fn):
        t0 = time.time()
        try:
            out = fn()
            jax.block_until_ready(out)
            emit({"stage": name, "ok": True,
                  "sec": round(time.time() - t0, 1)})
            return True
        except Exception as e:
            emit({"stage": name, "ok": False,
                  "sec": round(time.time() - t0, 1),
                  "error": repr(e)[:300]})
            return False

    sub = m.steps_per_fr_interval
    F = m.total_frames

    for E in (256, 1024, 4096):
        m.reinit_envs(E, frames_per_wdw=F, is_eval=True)

        # stage 1: the shared serving prologue (interp + FK) alone
        @jax.jit
        def prologue(params, frame_start):
            steps_fr = frame_start[:, None] + jnp.asarray(
                m.steps_idx_fr, jnp.float32)[None]
            batch = m.get_batch_input(params, steps_fr)
            q_init = jnp.concatenate(
                [batch["queried_q"][:, 0], batch["queried_ja"][:, 0]], -1)
            qd_init = swap_lin_ang(batch["queried_qd"][:, 0])
            body_q, body_qd = eval_fk(m.env, q_init, qd_init)
            return body_q, body_qd, batch["queried_ja"]

        fs = jnp.zeros((E,), jnp.float32)
        if not stage("prologue_E%d" % E, lambda: prologue(m.params, fs)):
            continue

        # stage 2: the whole-window kernel alone (synthetic inputs)
        from ppr_diffphys_tpu.sim.pallas_soa import (
            build_soa_window, flat_contact_pad, pick_window_e_tile,
            traced_planes,
        )

        et = pick_window_e_tile(sub, m.env.n_links, m.env.n_qd,
                                contacts_flat=flat_contact_pad(m.env))
        bq, bqd, ja = (np.asarray(x) for x in prologue(m.params, fs))
        S = sub * (F - 1) + 1
        ref = np.zeros((S, E, m.env.n_qd), np.float32)
        ref[:, :, 6:] = np.asarray(ja).transpose(1, 0, 2)
        act = np.zeros_like(ref)

        def win():
            kern = build_soa_window(
                m.integrator, m._sim_params(m.params), m.dt, sub, F,
                e_tile=min(et, E))
            planes = traced_planes(m.env, m._sim_params(m.params))
            out = jax.jit(lambda s, r, a, p: kern(s, r, a, p)[0])(
                SimState(jnp.asarray(bq), jnp.asarray(bqd)),
                jnp.asarray(ref), jnp.asarray(act), planes)
            return out

        stage("window_et%d_E%d" % (et, E), win)

        # stage 3: the full RolloutServer (what serve_bench runs)
        from ppr_diffphys_tpu.models.serve import RolloutServer

        def full():
            srv = RolloutServer(opts, num_envs=E, engine="soa", e_tile=0)
            return srv.rollout()

        stage("server_soa_E%d" % E, full)


if __name__ == "__main__":
    main()
