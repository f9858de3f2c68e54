"""Training CLI (main.py) end-to-end: the product surface a reference
user drives (reference main.py / run.sh). Subprocess-level so the absl
flag wiring, round loop, eval-selection and artifact layout are all
exercised exactly as shipped."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_main_cli_end_to_end(tmp_path):
    env = dict(os.environ)
    # force the CPU backend through the config API (the TPU plugin
    # ignores JAX_PLATFORMS): main.py's PPR_PLATFORM knob
    env["PPR_PLATFORM"] = "cpu"
    env.pop("JAX_PLATFORMS", None)
    out = subprocess.run(
        [
            sys.executable, "main.py",
            "--seqname", "mi-pace", "--logname", "cli",
            "--logroot", str(tmp_path),
            "--num_rounds", "2", "--iters_per_round", "2",
            "--noise_std", "0",
        ],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1800,
    )
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]

    d = os.path.join(str(tmp_path), "mi-pace-cli")
    files = set(os.listdir(d))
    # round checkpoints + the eval-selected best (24 Hz recipe,
    # --eval_selection default; reference saves ckpt_phys_%04d + latest,
    # dp_model.py:912-930)
    for need in (
        "ckpt_phys_0000.pth", "ckpt_phys_latest.pth", "ckpt_phys_best.pth",
    ):
        assert need in files, (need, sorted(files))
    # per-round eval videos (target/sim/control_ref/all streams)
    assert any(f.startswith("sim-") and f.endswith(".mp4") for f in files)
    assert any(f.startswith("all-") and f.endswith(".mp4") for f in files)
    # tensorboard event file
    assert any(f.startswith("events.out.tfevents") for f in files), sorted(files)
    assert "best checkpoint by full-sequence eval" in out.stdout + out.stderr


@pytest.mark.slow
def test_main_cli_multi_seed_selection(tmp_path):
    """--num_seeds trains independent seeds and reports the best by
    full-sequence eval (the shipped 24 Hz recipe, docs/24hz_adjudication.md)."""
    env = dict(os.environ)
    env["PPR_PLATFORM"] = "cpu"
    env.pop("JAX_PLATFORMS", None)
    out = subprocess.run(
        [
            sys.executable, "main.py",
            "--seqname", "mi-pace", "--logname", "ms",
            "--logroot", str(tmp_path),
            "--num_rounds", "1", "--iters_per_round", "1",
            "--noise_std", "0", "--num_seeds", "2",
        ],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1800,
    )
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    text = out.stdout + out.stderr
    assert "multi-seed selection: best seed" in text
    # one logdir per seed, each with its eval-selected checkpoint
    for k in (0, 1):
        d = os.path.join(str(tmp_path), "mi-pace-ms-s%d" % k)
        assert os.path.isdir(d), sorted(os.listdir(str(tmp_path)))
        assert "ckpt_phys_best.pth" in os.listdir(d)
