"""Headline benchmark: batched laikago rollout throughput (env-steps/sec).

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ...,
"vs_baseline": N} where vs_baseline is relative to the 1M env-steps/sec
north-star target (BASELINE.md). Runs on whatever accelerator jax sees
(the driver runs it on a real TPU chip).

The workload matches the reference's training physics: laikago ground
contacts (default 'hull' candidates, 1,454 points — exact while only hull
vertices penetrate, validated by builder.validate_hull_contacts; set
PPR_BENCH_CONTACTS=all for the reference's full 3,848-vertex set), PD control
toward rest angles, dt=5e-4 — i.e. the same physics the reference steps
through ~2,280 CUDA kernel launches per forward (dp_model.py:1209-1234),
here as one scanned XLA program.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def _profiled_busy(run_once, steady_wall=None):
    """Run ``run_once`` under a jax profiler trace and return measured
    device-time numbers parsed from the xplane protobuf:

    - ``device_busy_sec``: sum of op-event durations on the busiest TPU
      core line (TPU op events on a core line are serial, so the sum is
      the core's busy time);
    - ``device_busy_frac``: that busy time over the steady-state rep
      wall time measured outside the profiler (trace start/stop adds
      ~0.4 s of host overhead to the profiled rep itself) — a true
      utilization-of-wall measurement (<= 1);
    - ``top_op_frac``: fraction of device busy time in the hottest op
      (the fused megakernel, when the soa engine is on).

    Parsing uses tensorflow's vendored xplane_pb2 only (no converter —
    the installed tensorboard_plugin_profile is ABI-mismatched with
    TF 2.20's pywrap profiler).
    """
    import glob
    import tempfile

    import jax

    d = tempfile.mkdtemp(prefix="ppr_bench_prof_")
    t0 = time.perf_counter()
    with jax.profiler.trace(d):
        run_once()
    wall = time.perf_counter() - t0
    pbs = glob.glob(d + "/**/*.xplane.pb", recursive=True)
    if not pbs:
        return {}
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    with open(sorted(pbs)[-1], "rb") as f:
        xs.ParseFromString(f.read())

    busy_ps, top = 0, (0, "")
    for plane in xs.planes:
        if "TPU" not in plane.name or "SparseCore" in plane.name:
            continue
        names = {m.id: m.name for m in plane.event_metadata.values()}
        for line in plane.lines:
            if line.name not in ("XLA Ops", "XLA Op"):
                continue
            per_op = {}
            tot = 0
            for ev in line.events:
                tot += ev.duration_ps
                n = names.get(ev.metadata_id, "?")
                per_op[n] = per_op.get(n, 0) + ev.duration_ps
            if tot > busy_ps:
                busy_ps = tot
                top = max(per_op.items(), key=lambda kv: kv[1])[::-1] if per_op else (0, "")
    if busy_ps == 0:
        return {}
    busy = busy_ps * 1e-12
    out = {
        "device_busy_sec": round(busy, 4),
        "device_busy_frac": round(min(busy / (steady_wall or wall), 1.0), 3),
        "profiled_wall_sec": round(wall, 4),
    }
    if top[1]:
        out["top_op_frac"] = round(top[0] / busy_ps, 3)
        out["top_op"] = top[1][:64]
    return out


def _init_devices():
    """jax device init with a probe-and-retry before the fail-fast.

    The TPU tunnel can blip transiently; device discovery blocks forever
    when it is down. Probe it in a SUBPROCESS first (a hung in-process
    jax init cannot be cancelled): if the probe times out, wait ~60 s and
    probe once more before giving up, so one blip doesn't zero a round's
    bench record (VERDICT round-3 #1)."""
    import subprocess
    import threading

    probe = [sys.executable, "-c", "import jax; jax.devices()"]
    for attempt in (1, 2):
        try:
            subprocess.run(
                probe, timeout=120, check=True,
                stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
            )
            break
        except (subprocess.TimeoutExpired, subprocess.CalledProcessError):
            if attempt == 2:
                sys.stderr.write(
                    "FATAL: jax device init probe failed twice "
                    "(TPU tunnel down?)\n"
                )
                sys.stderr.flush()
                os._exit(3)
            sys.stderr.write(
                "device init probe failed; retrying in 60 s...\n")
            sys.stderr.flush()
            time.sleep(60)

    # probe succeeded — init in-process, with a watchdog as backstop
    def _die():
        sys.stderr.write(
            "FATAL: jax device init did not complete in 180 s "
            "(TPU tunnel down?)\n"
        )
        sys.stderr.flush()
        os._exit(3)

    _wd = threading.Timer(180.0, _die)
    _wd.daemon = True
    _wd.start()
    import jax

    jax.devices()
    _wd.cancel()


def main():
    _init_devices()
    import jax
    import jax.numpy as jnp

    from ppr_diffphys_tpu.sim.builder import ModelBuilder
    from ppr_diffphys_tpu.sim.import_urdf import parse_urdf
    from ppr_diffphys_tpu.sim.kinematics import eval_fk
    from ppr_diffphys_tpu.sim.integrator import (
        SemiImplicitIntegrator,
        SimState,
        default_sim_params,
    )

    urdf = os.environ.get(
        "PPR_URDF", "/root/reference/data/urdf_templates/laikago/laikago.urdf"
    )
    E = int(os.environ.get("PPR_BENCH_ENVS", 4096))
    STEPS = int(os.environ.get("PPR_BENCH_STEPS", 990))
    # 'hull' is numerically exact for ground-plane contacts (trajectories
    # match the all-vertex mode bit-for-bit in the operating regime) at
    # 2.6x fewer candidate points; see builder.make_ground_contacts
    CONTACT_MODE = os.environ.get("PPR_BENCH_CONTACTS", "hull")
    # 'soa' = the VMEM-resident pallas megakernel (sim/pallas_soa.py);
    # 'xla' = the lax.scan path shared with training
    ENGINE = os.environ.get("PPR_BENCH_ENGINE", "soa")
    # 'rollout' (default) = forward-only; 'train' = value_and_grad of a
    # state loss through the full rollout (the training workload; soa =
    # the differentiable pallas kernels, sim/pallas_soa_grad.py)
    MODE = os.environ.get("PPR_BENCH_MODE", "rollout")

    b = ModelBuilder()
    parse_urdf(
        urdf, b, xform_p=(0, 0.417, 0), floating=True, density=1000,
        armature=0.01, stiffness=220.0, damping=2.0, shape_ke=1e4,
        shape_kd=0, shape_kf=1e2, shape_mu=1, limit_ke=0, limit_kd=0,
    )
    model = b.finalize().make_ground_contacts(CONTACT_MODE)
    model.joint_attach_ke = 16000.0
    model.joint_attach_kd = 200.0

    integ = SemiImplicitIntegrator(model)
    params = default_sim_params(model)
    ke = jnp.concatenate([jnp.zeros(6), 220.0 * jnp.ones(model.n_dof)])
    kd = jnp.concatenate([jnp.zeros(6), 2.0 * jnp.ones(model.n_dof)])
    params = params._replace(joint_target_ke=ke, joint_target_kd=kd)

    q = np.array(model.joint_q_init, np.float32)
    rest = np.zeros(model.n_dof, np.float32)
    if model.n_dof == 12:
        rest[[2, 5, 8, 11]] = -0.8
    q[7:] = rest

    # per-env perturbed initial states
    rng = np.random.RandomState(0)
    qs = np.tile(q[None], (E, 1))
    qs[:, 0:3:2] += rng.uniform(-0.05, 0.05, (E, 2))
    body_q, body_qd = eval_fk(model, jnp.asarray(qs))
    state = SimState(body_q, body_qd)

    target = jnp.tile(jnp.concatenate([jnp.zeros(6), jnp.asarray(rest)])[None], (E, 1))
    act = jnp.zeros((E, model.n_qd))
    res = jnp.zeros((E, model.n_links, 6))

    kernel_detail = {}  # kernel-structure choices, spliced into detail

    def build_soa():
        from ppr_diffphys_tpu.sim.pallas_soa import (
            build_soa_rollout, flat_contact_pad,
        )

        INTERVAL = 33  # substeps per kernel invocation (one mocap frame)
        n_iv = STEPS // INTERVAL
        tgt_s = jnp.tile(target[None], (INTERVAL, 1, 1))
        act_s = jnp.zeros((INTERVAL, E, model.n_qd))
        # default e_tile=512: measured fastest on v5e (23.05M vs 22.85M
        # at 128 vs 22.56M at 256 env-steps/s; docs/results/round4/
        # bench_grid.jsonl, device_busy_frac 0.956)
        et = int(os.environ.get("PPR_BENCH_ETILE", "512"))
        kernel_detail.update(
            e_tile=et,
            contact_layout="flat" if flat_contact_pad(model) else "loop",
        )
        kern = build_soa_rollout(integ, params, 5e-4, INTERVAL, e_tile=et)

        def run_soa(state, n):
            for _ in range(n):
                state = kern(state, tgt_s, act_s)
            return state

        return jax.jit(run_soa, static_argnums=1), n_iv, n_iv * INTERVAL

    def build_xla():
        def run(state, n):
            def step(s, _):
                return integ.step_only(params, s, target, act, res, 5e-4), None

            out, _ = jax.lax.scan(step, state, None, length=n, unroll=4)
            return out

        return jax.jit(run, static_argnums=1), STEPS, STEPS

    def build_train():
        """Training workload: value_and_grad of a state loss through the
        rollout (gains/mass/initial-state gradients, as phys_model's
        train step computes them)."""
        from ppr_diffphys_tpu.sim.integrator import rollout as xla_rollout

        # 33 substeps = one 60 Hz mocap frame; PPR_BENCH_INTERVAL=83 is
        # the 24 Hz case (dt=5e-4, reference dp_model.py:416)
        INTERVAL = int(os.environ.get("PPR_BENCH_INTERVAL", "33"))
        n_iv = max(1, STEPS // INTERVAL // 3)  # keep iters ~O(100ms)
        S = INTERVAL * n_iv + 1
        tgt_s = jnp.tile(target[None], (S, 1, 1))
        act_s = jnp.zeros((S, E, model.n_qd))
        res_s = jnp.zeros((S, E, model.n_links, 6))
        norm_I = jnp.asarray(
            np.asarray(model.body_inertia)
            / np.asarray(model.body_mass)[:, None, None]
        )

        if ENGINE == "soa":
            from ppr_diffphys_tpu.sim.pallas_soa_grad import (
                make_diff_chain, pick_e_tile, pick_residuals_mode,
                plan_chunks, rollout_soa,
            )

            # the production training path (phys_model._soa_interval):
            # act-free kernels, auto env tile, VMEM-planned chunking
            from ppr_diffphys_tpu.sim.pallas_soa import flat_contact_pad

            cfl = flat_contact_pad(model)
            et = int(os.environ.get("PPR_BENCH_ETILE", "0")) or pick_e_tile(
                INTERVAL, model.n_links, model.n_qd,
                with_res=False, with_act=False, contacts_flat=cfl,
            )
            print("e_tile: %d%s" % (et, " (flat contacts)" if cfl else ""),
                  file=sys.stderr)
            chunks = plan_chunks(
                INTERVAL, model.n_links, model.n_qd, et,
                with_res=False, with_act=False, contacts_flat=cfl,
            )
            # record kernel-structure choices in the artifact so bench
            # rows are self-describing (which residuals mode / contact
            # layout each measurement actually ran). The mode resolves
            # PER CHUNK inside make_diff_interval, so on split plans the
            # full-interval resolution could differ from what executes —
            # record the union of the actual per-chunk picks
            modes = sorted({
                pick_residuals_mode(
                    sz, model.n_links, model.n_qd, et,
                    with_res=False, with_act=False, contacts_flat=cfl,
                )
                for sz in chunks
            })
            kernel_detail.update(
                e_tile=et,
                contact_layout="flat" if cfl else "loop",
                residuals="+".join(modes),
            )
            if len(chunks) > 1:
                print("vmem plan: %d chunks %s" % (len(chunks), chunks),
                      file=sys.stderr)
            ivf = make_diff_chain(
                integ, 5e-4, INTERVAL, chunk_sizes=chunks, e_tile=et,
                with_res=False, with_act=False,
            )
            roll = lambda p, s: rollout_soa(
                integ, p, s, tgt_s, act_s, res_s, 5e-4, INTERVAL,
                interval_fn=ivf,
            )
        else:
            roll = lambda p, s: xla_rollout(
                integ, p, s, tgt_s, act_s, res_s, 5e-4, INTERVAL
            )

        def loss(ke_, kd_, mass, bq0, bqd0):
            I = norm_I * mass[:, None, None]
            p = params._replace(
                body_mass=mass, body_inv_mass=1.0 / mass, body_inertia=I,
                body_inv_inertia=jnp.linalg.inv(I),
                joint_target_ke=ke_, joint_target_kd=kd_,
            )
            q_, qd_, _, _ = roll(p, SimState(bq0, bqd0))
            return jnp.mean(q_ ** 2) + jnp.mean(qd_ ** 2)

        g = jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 2, 3, 4)))
        args = (ke, kd, jnp.asarray(model.body_mass), state.body_q, state.body_qd)
        return (lambda s, n: g(*args)), 1, S

    if MODE == "train":
        run_jit, n_intervals, steps_eff = build_train()
        jax.block_until_ready(run_jit(state, n_intervals))
    elif ENGINE == "soa":
        run_jit, n_intervals, steps_eff = build_soa()
        try:  # warmup + compile; fall back to XLA if pallas cannot compile
            jax.block_until_ready(run_jit(state, n_intervals))
        except Exception as e:
            print("soa engine failed (%s); falling back to xla" % type(e).__name__,
                  file=sys.stderr)
            ENGINE = "xla"
            # the soa kernel-structure fields describe a kernel that will
            # not run — do not attach them to the fallback measurement
            kernel_detail.clear()
    if MODE != "train" and ENGINE != "soa":
        run_jit, n_intervals, steps_eff = build_xla()
        jax.block_until_ready(run_jit(state, n_intervals))

    t0 = time.perf_counter()
    reps = 3
    s = state
    for _ in range(reps):
        out = run_jit(s, n_intervals)
        if MODE != "train":
            s = out
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    STEPS = steps_eff

    # ---- trace-derived device busy time (VERDICT round-2 #9) -----------
    # One extra rep under the jax profiler; the xplane trace gives the
    # TPU core's op-level busy time, so the utilization below is a real
    # measurement (<= 1), not the saturated XLA-cost-analysis bound.
    prof = {}
    if os.environ.get("PPR_BENCH_PROFILE", "1") != "0":
        try:
            prof = _profiled_busy(
                lambda: jax.block_until_ready(run_jit(state, n_intervals)),
                steady_wall=dt,
            )
        except Exception as e:
            print("profiler capture failed: %r" % (e,), file=sys.stderr)

    # ---- roofline position (VERDICT round-4 #4) -------------------------
    # Which resource binds this workload? Three MEASURED/analytic axes,
    # each against its hardware peak (so every utilization is <= 1 by
    # construction of the basis, not by clamping):
    #
    # 1. compute: XLA cost analysis of the SoA PLANE substep — the exact
    #    math the pallas kernel body executes (component planes, one-hot
    #    MXU gathers/scatters), NOT the AoS step_only whose analysis
    #    overcounted transcendental expansions/dead ops (the old
    #    est_vpu_util_upper read 1.6). Train mode adds the backward
    #    kernel's work: one extra forward sweep (state re-materialization)
    #    plus the per-substep vjp, measured as cost(value_and_grad).
    #    Peak basis: v5e TensorCore VPU 4 x (8x128) lanes x 2 (fma)
    #    x ~0.94 GHz ~= 7.7 TFLOP/s fp32 (the one-hot matmuls are MXU
    #    work, so lumping them under the VPU peak still overstates
    #    pressure -> utilization stays an upper bound of the true value).
    # 2. HBM: analytic DMA bytes of the kernel grid (state/sequence
    #    blocks per grid step + constants per env tile; everything
    #    between substeps is VMEM-resident by construction) over the
    #    measured wall, against the v5e 819 GB/s HBM peak.
    # 3. device busy fraction from the profiler trace (prof block above).
    #
    # bound = the axis nearest its roof; when both compute and HBM sit
    # far below peak while busy_frac ~1, the binding resource is
    # in-kernel issue/serialization: (B,E) planes fill only B of each
    # 8-sublane register tile (laikago B=13 -> 13/16 after padding) and
    # the substep's dependency chain (joints -> integrate) serializes
    # many small VPU ops — documented in BENCHMARKS.md "Roofline".
    # The plane-basis flop count, the analytic HBM model ("everything
    # between substeps is VMEM-resident"), and the sublane-fill bound
    # classifier all describe the SoA pallas kernels — running them
    # against an XLA-engine measurement (requested, or the silent
    # soa->xla fallback above) would label an XLA scan with a diagnosis
    # of a kernel that never ran.
    util = {}
    if ENGINE != "soa":
        util["bound"] = (
            "n/a (xla engine: plane-basis roofline describes the soa "
            "kernels only)"
        )
    try:
        from ppr_diffphys_tpu.sim.pallas_soa import (
            build_soa_static, traced_planes as _tplanes,
        )

        if ENGINE != "soa":
            raise RuntimeError("skip: roofline basis is soa-only")
        substep_p, consts_p, meta_p = build_soa_static(integ, 5e-4)
        Cp = dict(consts_p)
        Cp.update(_tplanes(model, params))
        B = model.n_links
        bq0 = jnp.zeros((7, B, E))
        bqd0 = jnp.zeros((6, B, E))
        tgt_p = jnp.zeros((model.n_qd, E))

        def fwd_sub(bq, bqd, t):
            return substep_p(bq, bqd, t, None, Cp)

        ca_f = jax.jit(fwd_sub).lower(bq0, bqd0, tgt_p).compile()
        flops_fwd = float(ca_f.cost_analysis().get("flops", 0.0))
        flops_sub = flops_fwd
        if MODE == "train":
            # fwd+bwd flop convention: 3x the forward (fwd kernel + the
            # hand-scheduled reverse, whose transpose executes ~2x the
            # forward math). NOT measured via XLA cost analysis of
            # value_and_grad(substep) — that counts XLA's own AD strategy
            # for the plane program (loop transposes with big stacked
            # intermediates, ~45x fwd), which is exactly the code the
            # custom-VJP kernels replace; using it inflated utilization
            # past 1.0. An approximation either way — documented as such.
            flops_sub = 3.0 * flops_fwd

        achieved = flops_sub * STEPS / dt
        vpu_peak = 7.7e12

        # analytic HBM DMA bytes per rep: per-grid-step sequence blocks
        # (tgt in; train adds dtgt out + the (S,13,B,et) state scratch is
        # VMEM, not HBM) + per-env-tile state/const fetches.
        f32 = 4
        n_qd = model.n_qd
        const_bytes = sum(int(np.prod(c.shape)) for c in consts_p.values()) * f32
        tr_bytes = sum(
            int(np.prod(np.asarray(v).shape))
            for k, v in Cp.items() if k not in consts_p
        ) * f32
        state_bytes = 13 * B * E * f32
        seq_bytes = STEPS * n_qd * E * f32  # tgt blocks (act-free kernels)
        if MODE == "train":
            # fwd kernel + bwd kernel each stream tgt; bwd also writes
            # dtgt + dgains etc (small) + state ins/outs twice
            hbm_bytes = (
                2 * seq_bytes + seq_bytes  # tgt x2 + dtgt
                + 6 * state_bytes  # bq/bqd in x2 kernels + dq/dqd in + dbq/dbqd out
                + 2 * (const_bytes + tr_bytes) * (E // 512 or 1)
            )
        else:
            n_calls = max(1, STEPS // 33)
            hbm_bytes = (
                seq_bytes * 2  # tgt + act
                + 2 * state_bytes * n_calls  # state in+out per kernel call
                + (const_bytes + tr_bytes) * (E // 512 or 1) * n_calls
            )
        hbm_peak = 819e9
        hbm_gbps = hbm_bytes / dt / 1e9
        vpu_util = achieved / vpu_peak
        hbm_util = hbm_gbps * 1e9 / hbm_peak
        busy = prof.get("device_busy_frac", None)
        if vpu_util > 0.7 or hbm_util > 0.7:
            bound = "vpu-compute" if vpu_util >= hbm_util else "hbm-bandwidth"
        elif busy is None:
            # no profiler trace (PPR_BENCH_PROFILE=0): device idle vs
            # in-kernel serialization cannot be told apart — say so
            # instead of guessing (earlier sweep rows mislabeled this
            # case "host/dispatch")
            bound = "unprofiled (compute %.2f / hbm %.4f of peak)" % (
                vpu_util, hbm_util
            )
        elif busy > 0.85:
            bound = "in-kernel issue/serialization (plane sublane fill %d/%d)" % (
                B, -(-B // 8) * 8
            )
        else:
            bound = "host/dispatch (device idle %.2f busy)" % busy
        util = {
            "tflops_plane_basis": round(achieved / 1e12, 3),
            "vpu_util": round(vpu_util, 3),
            "hbm_gbps_analytic": round(hbm_gbps, 2),
            "hbm_util": round(hbm_util, 4),
            "flops_per_env_substep": round(flops_sub / E, 1),
            "bound": bound,
        }
    except Exception as e:
        if not str(e).startswith("skip:"):
            print("roofline analysis failed: %r" % (e,), file=sys.stderr)

    env_steps_per_sec = E * STEPS / dt
    print(
        json.dumps(
            {
                "metric": "batched_%s_%s_throughput" % (
                    os.path.basename(urdf).split(".")[0],
                    "training" if MODE == "train" else "rollout",
                ),
                "value": round(env_steps_per_sec, 1),
                "unit": "env-steps/sec",
                "vs_baseline": round(env_steps_per_sec / 1e6, 3),
                "detail": {
                    "envs": E,
                    "steps": STEPS,
                    "wall_sec": round(dt, 4),
                    "contacts": int(model.contact_count),
                    "contact_mode": CONTACT_MODE,
                    "engine": ENGINE,
                    "mode": MODE,
                    "device": str(jax.devices()[0]),
                    **kernel_detail,
                    **util,
                    **prof,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
