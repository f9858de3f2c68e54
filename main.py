"""Training CLI — reference-compatible (mirrors /root/reference/main.py).

python main.py --urdf_template laikago --seqname mi-pace --logname 0

Round-based loop: per round, checkpoint -> full-sequence eval + video ->
train iters on windowed envs with gradient accumulation, grad-safety and
tensorboard logging. Flags carry the reference names (main.py:15-47).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

if os.environ.get("PPR_PLATFORM"):
    # force a jax backend (e.g. PPR_PLATFORM=cpu on hosts without an
    # accelerator). The TPU plugin ignores JAX_PLATFORMS, so this must go
    # through the config API before any device use.
    import jax

    jax.config.update("jax_platforms", os.environ["PPR_PLATFORM"])

from absl import app, flags

flags.DEFINE_integer("local_rank", 0, "for distributed training")
flags.DEFINE_integer("ngpu", -1, "device budget: -1 = all visible chips (envs dp-shard over the mesh)")
flags.DEFINE_integer("accu_steps", 1, "gradient accumulation steps")
flags.DEFINE_string("seqname", "mi-pace", "name of the sequence")
flags.DEFINE_string("logroot", "logdir/", "root directory for output")
flags.DEFINE_string("logname", "dynamics", "experiment name")
flags.DEFINE_float("phys_learning_rate", 1e-4, "learning rate")
flags.DEFINE_integer("num_rounds", 5, "total update rounds")
flags.DEFINE_integer("warmup_iters", 0, "warmup iterations (DR+DP only)")
flags.DEFINE_string("urdf_template", "laikago", "robot template")
flags.DEFINE_integer("num_freq", 10, "fourier frequencies")
flags.DEFINE_integer("t_embed_dim", 128, "pose code dim")
flags.DEFINE_integer("iters_per_round", 20, "iters per round")
flags.DEFINE_float("ratio_phys_cycle", 1.0, "fraction of iters for physics")
flags.DEFINE_float("noise_std", 2e-3, "init-state noise std")
flags.DEFINE_float("traj_wt", 0.01, "traj matching weight")
flags.DEFINE_float("pos_state_wt", 0.01, "position matching weight")
flags.DEFINE_float("vel_state_wt", 1e-4, "velocity matching weight")
flags.DEFINE_float("pos_distill_wt", 0.0, "kinematics distillation weight")
flags.DEFINE_float("reg_torque_wt", 0.0, "torque regularization")
flags.DEFINE_float("reg_res_f_wt", 0.0, "residual force regularization")
flags.DEFINE_float("reg_foot_wt", 0.0, "foot contact regularization")
flags.DEFINE_float("reg_root_wt", 0.0, "root pose regularization")
flags.DEFINE_string("datadir", "/root/reference/data/motion_sequences", "mocap dir")
flags.DEFINE_string("urdf_dir", "/root/reference/data/urdf_templates", "urdf dir")
flags.DEFINE_integer("num_envs", 10, "training envs per step")
flags.DEFINE_integer("frames_per_wdw", 24, "frames per training window")
flags.DEFINE_boolean(
    "ref_quirks", False,
    "reproduce the reference's accidental training-dynamics quirks: "
    "upper-only rollout adjoint clamp (dp_model.py:1110) and env-0 "
    "sticky divergence threshold (dp_utils.py:99-101)")
flags.DEFINE_boolean(
    "wdw_schedule", False,
    "window-length curriculum: grow frames_per_wdw from 1 to "
    "~(total_frames-1)/2 over training with num_envs=max(1,100/frames) "
    "(the schedule the reference left as a TODO, main.py:87-91); long "
    "late windows train open-loop stability over eval-length horizons")
flags.DEFINE_boolean("render_vis", True, "render per-round videos")
flags.DEFINE_integer("seed", 0, "rng seed")
# ---- engine / performance knobs (TPU-native additions) ----------------
flags.DEFINE_string(
    "phys_engine", "auto",
    "physics engine: 'soa' = differentiable pallas megakernel, 'xla' = "
    "lax.scan, 'auto' = soa on TPU / xla elsewhere (the production "
    "default)")
flags.DEFINE_string(
    "eval_engine", "auto",
    "full-sequence eval engine: 'auto' = the lax.scan path (measured "
    "fastest on both first and steady eval walls, eval_bench.jsonl "
    "rounds 4+5), 'xla' = same explicitly, 'soa' = chain the padded "
    "training-interval soa kernels (no new Mosaic specialization)")
flags.DEFINE_string(
    "contact_mode", "hull",
    "ground-contact candidate set: 'hull' (convex hull per shape; exact "
    "for plane contacts, ~2.6x fewer points), 'all' (the reference's "
    "every-vertex set), or 'hull:<margin>'")
flags.DEFINE_integer(
    "soa_e_tile", 0,
    "pallas env (lane) tile width; 0 = auto (largest single-kernel tile)",
)
flags.DEFINE_integer(
    "soa_ksub", 0,
    "substeps per pallas kernel call; 0 = auto VMEM plan (splits 24 Hz "
    "83-substep intervals / big templates into chunks that fit VMEM)")
flags.DEFINE_boolean(
    "soa_with_res", False,
    "allocate residual-force buffers in the soa kernels (only needed if "
    "res_f is ever nonzero; the reference multiplies it by 0)")
flags.DEFINE_boolean(
    "soa_with_act", False,
    "allocate joint-activation buffers in the soa kernels (only needed "
    "if torques are ever nonzero; the reference multiplies them by 0)")
flags.DEFINE_integer("rollout_unroll", 4, "xla-engine scan unroll factor")
flags.DEFINE_string("ckpt_backend", "pickle", "checkpoint format: pickle|orbax")
flags.DEFINE_float(
    "hull_fallback_margin", 3e-3,
    "interior-vertex ground-penetration depth (m) beyond which hull "
    "contacts auto-fall-back to the reference-exact 'all' set")
flags.DEFINE_boolean(
    "contact_fallback", True, "enable the hull->all auto-fallback")
flags.DEFINE_string(
    "mesh_shape", "",
    "device mesh, e.g. 'dp=4,tp=2'; empty = auto dp over all chips")
# ---- 24 Hz recipe (docs/24hz_adjudication.md): checkpoint selection ----
flags.DEFINE_boolean(
    "eval_selection", True,
    "score every round's checkpoint by the full-sequence eval traj error "
    "and copy the best one to ckpt_phys_best.pth at the end (the "
    "variance-dominated 24 Hz sequences need selection, not just the "
    "final checkpoint)")
flags.DEFINE_integer(
    "num_seeds", 1,
    "train num_seeds runs (seed, seed+1, ...) and report/copy the best "
    "by full-sequence eval — the measured 24 Hz seed spread is ~3x "
    "(docs/24hz_adjudication.md); each run gets logname-s<k>")
flags.DEFINE_string("profile_dir", "", "capture a jax profiler trace of "
                    "training iters 2-4 into this directory")


def train_one(opts):
    """One training run; returns (best_eval_score, best_ckpt_path)."""
    from ppr_diffphys_tpu.models.phys_model import phys_model
    from ppr_diffphys_tpu.utils.vis import PhysVisualizer
    from ppr_diffphys_tpu.data.amp_loader import DataLoader

    logname = "%s-%s" % (opts["seqname"], opts["logname"])
    save_dir = os.path.join(opts["logroot"], logname)
    vis = PhysVisualizer(save_dir)
    dataloader = DataLoader(opts)

    # 24 Hz default: the measured recipe (docs/24hz_adjudication.md) is
    # 3x init noise for the 83-substep sequences; applies only when the
    # user left --noise_std at its default
    if flags.FLAGS["noise_std"].using_default_value:
        if int(round(dataloader.frame_interval / 5e-4)) > 60:
            opts["noise_std"] = 6e-3
            print("24 Hz sequence: defaulting --noise_std to 6e-3")

    model = phys_model(opts, dataloader)

    import tqdm

    best_score, best_it = None, None
    for it in tqdm.tqdm(range(model.total_iters)):
        model.progress = it / (opts["num_rounds"] * opts["iters_per_round"])

        if it % opts["iters_per_round"] == 0:
            model.save_checkpoint(it)

            # full-sequence eval + vis (reference main.py:78-81)
            model.reinit_envs(1, frames_per_wdw=model.total_frames, is_eval=True)
            eval_out = model.forward()
            eval_score = float(eval_out["loss_traj"])
            vis.write_log({"eval/traj": eval_score}, it)
            if opts.get("eval_selection", True) and (
                best_score is None or eval_score < best_score
            ):
                best_score, best_it = eval_score, it
            data = model.query()
            data["model"] = model.env
            vis.show(it, data, fps=1.0 / model.frame_interval,
                     render_video=opts["render_vis"])

            if opts["wdw_schedule"]:
                # reference main.py:87-91 (commented TODO there)
                fpw = int(
                    0.5 * (model.total_frames - 1) / model.total_iters * it + 1
                )
                fpw = max(2, min(fpw, model.total_frames))
                n_env = max(1, int(100 / fpw))
                print("wdw/envs: %d/%d" % (fpw, n_env))
                model.reinit_envs(n_env, frames_per_wdw=fpw, is_eval=False)
            else:
                model.reinit_envs(
                    opts["num_envs"], frames_per_wdw=opts["frames_per_wdw"],
                    is_eval=False,
                )

        if opts["profile_dir"]:
            import jax

            if it == 2:
                jax.profiler.start_trace(opts["profile_dir"])
            elif it == 5:
                jax.profiler.stop_trace()

        t = time.time()
        accu = []
        for _accu in range(opts["accu_steps"]):
            loss_dict = model.forward()
            accu.append(loss_dict["total_loss"])
        model.backward(None)
        grad_dict = model.update()
        # single device->host transfer for all logged scalars
        import jax

        loss_dict, accu = jax.device_get((loss_dict, accu))
        loss = float(sum(accu)) / float(opts["accu_steps"])
        loss_dict = {k: float(v) for k, v in loss_dict.items()}
        loss_dict.update(grad_dict)
        loss_dict["iter_time"] = time.time() - t
        loss_dict["loss"] = loss
        vis.write_log(loss_dict, it)

    best_path = None
    if best_it is not None:
        ext = "orbax" if opts.get("ckpt_backend") == "orbax" else "pth"
        src = os.path.join(save_dir, "ckpt_phys_%04d.%s" % (best_it, ext))
        best_path = os.path.join(save_dir, "ckpt_phys_best.%s" % ext)
        if os.path.exists(src):
            import shutil

            if os.path.isdir(src):
                shutil.copytree(src, best_path, dirs_exist_ok=True)
            else:
                shutil.copy(src, best_path)
        print(
            "best checkpoint by full-sequence eval: iter %d (traj %.4f) -> %s"
            % (best_it, best_score, best_path)
        )
    return best_score, best_path


def main(_):
    opts = flags.FLAGS.flag_values_dict()
    n_seeds = max(1, int(opts.get("num_seeds", 1)))
    if n_seeds == 1:
        train_one(opts)
        return

    # multi-seed selection (the 24 Hz recipe): N independent runs, best
    # full-sequence eval wins (docs/24hz_adjudication.md seed study)
    if not opts.get("eval_selection", True):
        raise SystemExit(
            "--num_seeds>1 requires --eval_selection: without per-round "
            "eval scores there is nothing to select the best seed by"
        )
    results = []
    base_logname = opts["logname"]
    base_seed = opts["seed"]
    for k in range(n_seeds):
        o = dict(opts)
        o["seed"] = base_seed + k
        o["logname"] = "%s-s%d" % (base_logname, k)
        score, path = train_one(o)
        results.append((score, o["seed"], path))
        print("seed %d: eval traj %s" % (
            o["seed"], "%.4f" % score if score is not None else "n/a"))
    results.sort(
        key=lambda r: (r[0] is None, r[0] if r[0] is not None else 0.0))
    score, seed, path = results[0]
    print(
        "multi-seed selection: best seed %d (eval traj %s), checkpoint %s"
        % (seed, "%.4f" % score if score is not None else "n/a", path)
    )


if __name__ == "__main__":
    app.run(main)
