"""Mocap-mode multi-video `outseq` masking (VERDICT round-3 #7).

The reference zeroes traj/pos/vel losses for window frames that fall in
a different video than the window's first frame (`fid_reindex`,
dp_model.py:677-682). The shipped DataLoader is single-video, so this
synthesizes a two-video AMP loader over the real mi-pace rows and runs a
window across the boundary:

- the outseq mask matches fid_reindex's video assignment;
- perturbing the OUT-of-video rows leaves every loss bitwise unchanged;
- perturbing an IN-video row changes the loss (mask has no false
  positives — canary proving test power).
"""

import numpy as np
import pytest

from ppr_diffphys_tpu.utils.config import build_opts


class TwoVideoLoader:
    """Duck-typed DataLoader over given AMP rows with a two-video
    offset table."""

    def __init__(self, amp_info, frame_interval, boundary):
        self.amp_info = np.asarray(amp_info, np.float64)
        self.frame_interval = frame_interval
        self.data_info = {
            "offset": np.asarray([0, boundary, len(self.amp_info)])
        }


BOUNDARY = 30
START = 28.0  # window frames 28,29 | 30,31 -> last two masked
FPW = 4


@pytest.fixture(scope="module")
def amp_rows():
    from ppr_diffphys_tpu.data.amp_loader import DataLoader

    opts = build_opts(seqname="mi-pace")
    dl = DataLoader(opts)
    return dl.amp_info.copy(), dl.frame_interval


def _eval_losses(amp, frame_interval):
    from ppr_diffphys_tpu.models.phys_model import phys_model

    opts = build_opts(
        seqname="mi-pace", num_rounds=1, iters_per_round=1,
        logroot="/tmp/ppr_mvid", noise_std=0.0,
    )
    m = phys_model(opts, TwoVideoLoader(amp, frame_interval, BOUNDARY))
    m.reinit_envs(1, frames_per_wdw=FPW, is_eval=True)
    out = m.forward(frame_start=np.array([START]))
    return m, {k: float(v) for k, v in out.items()}


def test_outseq_mask_matches_fid_reindex(amp_rows):
    """The sampler's video assignment over the boundary window equals
    the reference's fid_reindex semantics (frames >= offset[1] belong to
    video 1, everything else to video 0)."""
    amp, fi = amp_rows
    m, _ = _eval_losses(amp, fi)
    steps_fr = START + np.asarray(m.steps_idx_fr)
    vid = np.asarray(
        m.samplers["joint_angle_mlp"].frame_to_vid(steps_fr[m.frame2step])
    )
    expect = (steps_fr[m.frame2step] >= BOUNDARY).astype(vid.dtype)
    np.testing.assert_array_equal(vid, expect)
    outseq = vid != vid[0]
    np.testing.assert_array_equal(outseq, [False, False, True, True])


def test_out_of_video_rows_do_not_affect_losses(amp_rows):
    amp, fi = amp_rows
    _, base = _eval_losses(amp, fi)

    # perturb EVERY row of video 2 (the masked frames' mocap targets)
    amp_pert = amp.copy()
    amp_pert[BOUNDARY:, 0:3] += 0.7
    amp_pert[BOUNDARY:, 61:73] += 0.3
    _, masked = _eval_losses(amp_pert, fi)
    for k in ("loss_traj", "loss_pos_state", "loss_vel_state", "total_loss"):
        assert masked[k] == base[k], (k, masked[k], base[k])

    # canary: an IN-video in-window row (frame 29) must change the loss
    amp_canary = amp.copy()
    amp_canary[BOUNDARY - 1, 0:3] += 0.7
    _, canary = _eval_losses(amp_canary, fi)
    assert canary["loss_traj"] != base["loss_traj"]
