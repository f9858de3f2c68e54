"""Multi-chip sharding tests on the virtual 8-device CPU mesh
(SURVEY.md §4(d): vmap/pjit equivalence stands in for multi-node)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ppr_diffphys_tpu.parallel.sharding import (
    make_mesh,
    env_sharding,
    param_shardings,
    shard_train_step,
)


def _make_model(num_envs):
    from ppr_diffphys_tpu.utils.config import build_opts
    from ppr_diffphys_tpu.models.phys_model import phys_model
    from ppr_diffphys_tpu.data.amp_loader import DataLoader

    opts = build_opts(
        seqname="mi-pace", num_rounds=1, iters_per_round=2,
        logroot="/tmp/ppr_par_test", noise_std=0.0,
    )
    dl = DataLoader(opts)
    m = phys_model(opts, dl)
    m.reinit_envs(num_envs, frames_per_wdw=2, is_eval=False)
    return m


def test_mesh_construction():
    mesh = make_mesh({"dp": 4, "tp": 2})
    assert mesh.shape == {"dp": 4, "tp": 2}
    mesh1 = make_mesh(None)
    assert mesh1.shape["dp"] == len(jax.devices())


def test_dp_sharded_loss_matches_single_device():
    """The env-sharded train step computes the same loss/grads as the
    unsharded one (the rollout is embarrassingly parallel over envs; only
    the loss reductions cross shards via psum)."""
    m = _make_model(num_envs=8)
    mesh = make_mesh({"dp": 4, "tp": 2})

    def loss_fn(params, frame_start, key, progress, weights):
        out, _ = m._forward_pure(params, frame_start, key, progress, weights, True)
        return out["total_loss"]

    args = (
        m.params,
        jnp.arange(8, dtype=jnp.float32) % 3,
        jax.random.PRNGKey(0),
        jnp.float32(0.0),
        m._weights_vec(),
    )
    ref = float(jax.jit(loss_fn)(*args))

    def vg(params, fs, key, pr, w):
        return jax.value_and_grad(loss_fn)(params, fs, key, pr, w)

    step = shard_train_step(vg, mesh, m.params)
    with jax.set_mesh(mesh):
        loss, grads = step(*args)
    assert float(loss) == pytest.approx(ref, rel=2e-4)
    gnorm = float(
        jnp.sqrt(sum(jnp.sum(x * x) for x in jax.tree_util.tree_leaves(grads)))
    )
    assert np.isfinite(gnorm) and gnorm > 0


def test_tp_param_shardings():
    m = _make_model(num_envs=2)
    mesh = make_mesh({"dp": 4, "tp": 2})
    ps = param_shardings(mesh, m.params)
    # trunk kernels sharded on output features; small vectors replicated
    from jax.sharding import PartitionSpec as P

    trunk = ps["vel_mlp"]["trunk"]["linear_1"]["kernel"]
    assert trunk.spec == P(None, "tp")
    assert ps["global_q"].spec == P()


def test_graft_dryrun():
    # run in a subprocess: the dryrun flips global jax config (platforms),
    # which can abort when mixed with this process's cached executables
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "__graft_entry__.py"), "--n", "8"],
        env=env, cwd=repo, capture_output=True, text=True, timeout=1500,
    )
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    assert "dryrun_multichip OK" in out.stdout


def test_production_training_sharded_matches_single_device():
    """VERDICT.md Weak #1 closure: the *production* train loop
    (model.forward() -> model.update(), incl. optimizer apply) runs
    dp-sharded by default when multiple devices are visible, and its loss
    trajectory matches a single-device run.

    Uses num_envs=8 over the virtual 8-CPU mesh (dp=8) vs ngpu=1.
    """
    from ppr_diffphys_tpu.utils.config import build_opts
    from ppr_diffphys_tpu.models.phys_model import phys_model
    from ppr_diffphys_tpu.data.amp_loader import DataLoader

    def run(ngpu):
        opts = build_opts(
            seqname="mi-pace", num_rounds=1, iters_per_round=3,
            logroot="/tmp/ppr_prod_shard", logname=str(ngpu),
            noise_std=0.0, ngpu=ngpu,
        )
        m = phys_model(opts, DataLoader(opts))
        m.reinit_envs(8, frames_per_wdw=3, is_eval=False)
        losses = []
        for it in range(3):
            m.set_progress(it)
            out = m.forward()
            m.update()
            losses.append(float(out["total_loss"]))
        return m, losses

    m8, losses8 = run(-1)
    # the train-step jit must actually be sharded over the 8-device mesh
    mesh = m8._mesh_for(8)
    assert mesh is not None and mesh.shape["dp"] == 8, mesh
    assert any(k[0] == "grad" for k in m8._jit_cache)

    m1, losses1 = run(1)
    assert m1._mesh_for(8) is None
    np.testing.assert_allclose(losses8, losses1, rtol=1e-4)
    # params after 3 sharded updates match the single-device run
    for k in ("global_q", "body_mass", "target_ke"):
        np.testing.assert_allclose(
            np.asarray(m8.params[k]), np.asarray(m1.params[k]), rtol=1e-4, atol=1e-6
        )
