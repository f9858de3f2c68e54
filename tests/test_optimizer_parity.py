"""Optimizer-dynamics parity: the optax chain (scale_by_adam +
add_decayed_weights + group-LR routing + torch-exact OneCycle schedule,
phys_model.add_optimizer) against torch AdamW(wd=1e-4) + OneCycleLR
(linear, pct_start=2/total, div=25, final_div=100) — the reference's
actual optimizer (dp_model.py:459-476) — run update-for-update on the
REAL phys_model parameter tree with identical synthetic gradients.

This is the training-dynamics leg of "losses match the Warp reference":
kernel-level physics parity is pinned by test_warp_parity; this pins that
a given gradient stream moves the parameters identically.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ppr_diffphys_tpu.models.phys_model import phys_model
from ppr_diffphys_tpu.data.amp_loader import DataLoader
from ppr_diffphys_tpu.utils.config import build_opts


@pytest.fixture(scope="module")
def model():
    opts = build_opts(
        seqname="mi-pace", logroot="/tmp/ppr_opt_parity", noise_std=0.0,
        num_rounds=5, iters_per_round=20,  # total_iters = 101, run.sh budget
    )
    return phys_model(opts, DataLoader(opts))


def _named_leaves(model):
    """[(dotted_name, np_value, peak_lr)] over every param leaf."""
    flat, _ = jax.tree_util.tree_flatten_with_path(model.params)
    lrs, _ = jax.tree_util.tree_flatten_with_path(model.param_lr_tree)
    out = []
    for (path, v), (_, lr) in zip(flat, lrs):
        out.append((model._leaf_name(path), np.asarray(v), float(lr)))
    return out


@pytest.mark.slow
def test_adamw_onecycle_updates_match_torch(model):
    import torch

    leaves = _named_leaves(model)
    trainable = [(n, v, lr) for n, v, lr in leaves if lr > 0]
    assert len(trainable) > 40  # 5 MLPs worth of tensors + explicit params
    base_lr = model.opts["phys_learning_rate"]
    # the 10x explicit-param routing must be represented
    peak_by_name = {n: lr for n, v, lr in trainable}
    assert peak_by_name["body_mass"] == pytest.approx(base_lr * 10)
    assert peak_by_name["global_q"] == pytest.approx(base_lr * 10)
    # MLP trunks at base lr (the 'with' override for base_quat only
    # applies in interface mode, where root_pose is a CameraMLP)
    assert all(
        lr == pytest.approx(base_lr)
        for n, _, lr in trainable if n.startswith("root_pose_mlp")
    )

    # ---- torch side: one param group per tensor, reference scheduler ----
    tparams = {
        n: torch.nn.Parameter(torch.tensor(v, dtype=torch.float64))
        for n, v, lr in trainable
    }
    opt = torch.optim.AdamW(
        [{"params": [tparams[n]]} for n, _, _ in trainable],
        lr=base_lr, weight_decay=1e-4,
    )
    total = max(2, model.total_iters)
    sched = torch.optim.lr_scheduler.OneCycleLR(
        opt,
        [lr for _, _, lr in trainable],
        total,
        pct_start=2.0 / total,
        cycle_momentum=False,
        anneal_strategy="linear",
        final_div_factor=1e2,
        div_factor=25,
    )

    # ---- optax side: the model's own chain --------------------------------
    params = model.params
    opt_state = model.tx.init(params)

    n_steps = 30  # past the 2-iter warmup, well into the linear anneal
    rng = np.random.RandomState(0)
    grad_streams = {
        n: [rng.randn(*v.shape).astype(np.float32) * 0.01 for _ in range(n_steps)]
        for n, v, lr in trainable
    }

    name_of = {}
    flat, treedef = jax.tree_util.tree_flatten_with_path(model.params)
    for i, (path, _) in enumerate(flat):
        name_of[i] = model._leaf_name(path)

    for step in range(n_steps):
        # identical synthetic grads on both sides
        gleaves = []
        for i, (path, v) in enumerate(flat):
            n = name_of[i]
            if n in grad_streams:
                gleaves.append(jnp.asarray(grad_streams[n][step]))
            else:
                gleaves.append(jnp.zeros_like(v))
        grads = jax.tree_util.tree_unflatten(treedef, gleaves)
        updates, opt_state = model.tx.update(grads, opt_state, params)
        import optax

        params = optax.apply_updates(params, updates)

        for n, _, _ in trainable:
            tparams[n].grad = torch.tensor(
                grad_streams[n][step], dtype=torch.float64
            )
        opt.step()
        sched.step()

    jflat, _ = jax.tree_util.tree_flatten_with_path(params)
    jax_by_name = {model._leaf_name(p): np.asarray(v) for p, v in jflat}
    worst = 0.0
    for n, v0, lr in trainable:
        j = jax_by_name[n]
        t = tparams[n].detach().numpy()
        scale = np.abs(t).max() + 1e-6
        err = np.abs(j - t).max() / scale
        worst = max(worst, err)
        assert err < 2e-5, (n, err)  # fp32-vs-fp64 accumulation tolerance
    print("optimizer parity worst rel err over %d steps: %.2e" % (n_steps, worst))

    # frozen leaves (torque/residual MLPs excluded? no — they train too;
    # genuinely frozen = anything with lr 0) stayed untouched
    for n, v, lr in leaves:
        if lr == 0.0:
            np.testing.assert_array_equal(jax_by_name[n], v)


@pytest.mark.slow
def test_lr_schedule_matches_torch_onecycle(model):
    """The closed-form schedule equals torch's OneCycleLR factor at every
    step of the run.sh budget."""
    import torch

    total = max(2, model.total_iters)
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.AdamW([p], lr=1.0, weight_decay=0.0)
    sched = torch.optim.lr_scheduler.OneCycleLR(
        opt, [1.0], total, pct_start=2.0 / total, cycle_momentum=False,
        anneal_strategy="linear", final_div_factor=1e2, div_factor=25,
    )
    for step in range(total):
        torch_lr = opt.param_groups[0]["lr"]
        ours = float(model._lr_schedule(step))
        assert ours == pytest.approx(torch_lr, rel=1e-5), (step, ours, torch_lr)
        opt.step()
        sched.step()


@pytest.mark.slow
def test_full_budget_parity_with_grad_safety():
    """101 steps (the full run.sh budget) update-for-update against a
    torch mirror implementing the reference's check_grad EXACTLY
    (dp_model.py:936-999) inside the reference's update()/save_checkpoint
    cadence (dp_model.py:511-516, :905-921) — including one forced
    grad-norm ROLLBACK (step 45) and one forced median-queue CLIP event
    (body_mass, step 70). Pins: lower-median (torch.median) clip factor,
    cache restore two rounds back, and the scheduler advancing on the
    rolled-back iter (VERDICT round-3 #8)."""
    import torch
    from copy import deepcopy

    opts = build_opts(
        seqname="mi-pace", logroot="/tmp/ppr_opt_parity101", noise_std=0.0,
        num_rounds=5, iters_per_round=20,
    )
    m = phys_model(opts, DataLoader(opts))
    leaves = _named_leaves(m)
    trainable = [(n, v, lr) for n, v, lr in leaves if lr > 0]
    base_lr = m.opts["phys_learning_rate"]
    total = max(2, m.total_iters)
    assert total == 101

    # ---- torch mirror -----------------------------------------------------
    tparams = {
        n: torch.nn.Parameter(torch.tensor(v, dtype=torch.float64))
        for n, v, lr in trainable
    }
    opt = torch.optim.AdamW(
        [{"params": [tparams[n]]} for n, _, _ in trainable],
        lr=base_lr, weight_decay=1e-4,
    )
    sched = torch.optim.lr_scheduler.OneCycleLR(
        opt, [lr for _, _, lr in trainable], total, pct_start=2.0 / total,
        cycle_momentum=False, anneal_strategy="linear",
        final_div_factor=1e2, div_factor=25,
    )
    t_model_cache = [None, None]
    t_opt_cache = [None, None]
    t_sched_cache = [None, None]
    t_queue = {}

    def t_save_checkpoint():
        t_model_cache[0] = t_model_cache[1]
        t_opt_cache[0] = t_opt_cache[1]
        t_sched_cache[0] = t_sched_cache[1]
        t_model_cache[1] = {n: p.detach().clone() for n, p in tparams.items()}
        t_opt_cache[1] = deepcopy(opt.state_dict())
        t_sched_cache[1] = deepcopy(sched.state_dict())

    def t_check_grad(thresh=10.0):
        # verbatim reference algorithm (dp_model.py:936-999)
        plist = [p for p in tparams.values() if p.grad is not None]
        grad_norm = torch.nn.utils.clip_grad_norm_(plist, thresh)
        if grad_norm > thresh:
            opt.zero_grad()
            if t_model_cache[0] is not None:
                with torch.no_grad():
                    for n, p in tparams.items():
                        p.copy_(t_model_cache[0][n])
                opt.load_state_dict(deepcopy(t_opt_cache[0]))
                sched.load_state_dict(deepcopy(t_sched_cache[0]))
            return {}
        gd = {}
        for n, p in tparams.items():
            if p.grad is None:
                continue
            grad = p.grad.reshape(-1).norm(2, -1)
            gd["grad/" + n] = grad
            q = t_queue.setdefault(n, [])
            if len(q) > 10:
                med = torch.stack(q[:-1]).median()
                gd["grad_med/" + n] = med
                if grad > 5.0 * med:
                    torch.nn.utils.clip_grad_norm_(p, med)
                else:
                    q.append(grad)
                    q.pop(0)
            else:
                q.append(grad)
        return gd

    def t_update():
        gd = t_check_grad()
        opt.step()
        sched.step()
        opt.zero_grad()
        return gd

    # ---- identical grad streams with two forced events ---------------------
    rng = np.random.RandomState(7)
    flat, treedef = jax.tree_util.tree_flatten_with_path(m.params)
    name_of = [m._leaf_name(p) for p, _ in flat]
    train_names = {n for n, _, _ in trainable}
    ROLLBACK_STEP, CLIP_STEP = 45, 70

    events = {"rollback": False, "clip": False}
    for step in range(total):
        if step % opts["iters_per_round"] == 0:
            m.save_checkpoint(step)
            t_save_checkpoint()

        gleaves, norms = [], {}
        sq = 0.0
        for (path, v), n in zip(flat, name_of):
            if n not in train_names:
                gleaves.append(jnp.zeros_like(v))
                continue
            g = rng.randn(*np.shape(v)).astype(np.float32) * 0.003
            if step == ROLLBACK_STEP:
                g = g * 10.0  # global norm blows past thresh=10
            if step == CLIP_STEP and n == "body_mass":
                g = g * 100.0  # tensor-level outlier, global norm still ok
            gleaves.append(jnp.asarray(g))
            norms[n] = float(np.linalg.norm(g.astype(np.float64)))
            sq += norms[n] ** 2
            tparams[n].grad = torch.tensor(g, dtype=torch.float64)
        gnorm = float(np.sqrt(sq))

        m._grad_accum = [
            (jax.tree_util.tree_unflatten(treedef, gleaves), norms, gnorm)
        ]
        gd = m.update()
        tgd = t_update()

        if step == ROLLBACK_STEP:
            assert gd == {} and tgd == {}, (gd.keys(), tgd.keys())
            events["rollback"] = True
        if step == CLIP_STEP:
            med = gd.get("grad_med/body_mass")
            assert med is not None and gd["grad/body_mass"] > 5.0 * med
            assert float(tgd["grad_med/body_mass"]) == pytest.approx(
                med, rel=1e-9
            )
            events["clip"] = True
    assert events["rollback"] and events["clip"]

    # ---- end-state parity ---------------------------------------------------
    jflat, _ = jax.tree_util.tree_flatten_with_path(m.params)
    jax_by_name = {m._leaf_name(p): np.asarray(v) for p, v in jflat}
    worst = 0.0
    for n, v0, lr in trainable:
        j = jax_by_name[n]
        t = tparams[n].detach().numpy()
        scale = np.abs(t).max() + 1e-6
        err = np.abs(j - t).max() / scale
        worst = max(worst, err)
        assert err < 5e-5, (n, err)
    print("101-step grad-safety parity worst rel err: %.2e" % worst)

    # schedule counts advanced in lockstep (incl. the rolled-back iter,
    # which restored the count from the cache then advanced it once)
    import optax

    counts = [
        int(s.count) for s in m.opt_state
        if isinstance(s, optax.ScaleByScheduleState)
    ]
    assert counts == [int(sched.last_epoch)], (counts, sched.last_epoch)


def test_median_queue_scale_matches_reference_clip(model):
    """The median-queue outlier scale equals the factor
    torch.nn.utils.clip_grad_norm_(p, med) applies in the reference
    (dp_model.py:988-991): med / grad_norm."""
    model.grad_queue = {}
    norms = {"body_mass": 1.0}
    zeros = jax.tree.map(jnp.zeros_like, model.params)
    for _ in range(12):
        model.check_grad_dict(zeros, dict(norms), gnorm=0.1)
    scales, gd = model.check_grad_dict(zeros, {"body_mass": 50.0}, gnorm=0.5)
    assert scales["body_mass"] == pytest.approx(1.0 / 50.0, rel=1e-3)
    assert gd["grad_med/body_mass"] == pytest.approx(1.0)
    # scale lands on the right leaf of the scales tree
    tree = model._scales_tree(scales)
    assert float(tree["body_mass"]) == pytest.approx(1.0 / 50.0, rel=1e-3)
