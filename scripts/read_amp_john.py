"""Inspect an 18-dim AMP variant file (root pos + orn-as-3 + 4x3 feet
keypoints) and export the feet trajectory as a point-cloud OBJ
(reference scripts/read_amp_john.py:6-37 — an ad-hoc layout used for a
different capture pipeline than the 85-dim files of
data/motion_sequences).

python scripts/read_amp_john.py <amp.txt> <outdir>
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from ppr_diffphys_tpu.utils.io import vis_kps  # noqa: E402


def parse_amp(amp_info):
    return {
        "pos": amp_info[..., 0:3],  # root position
        "orn": amp_info[..., 3:6],  # root orientation
        "kp": amp_info[..., 6:18],  # keypoints (4x3)
    }


def main():
    path, outdir = sys.argv[1], sys.argv[2]
    with open(path, "r") as f:
        amp_info = json.load(f)
        frame_interval = amp_info["FrameDuration"]
        amp_info = np.asarray(amp_info["Frames"])

    msm = parse_amp(amp_info)
    root_traj = np.concatenate([msm["pos"], msm["orn"]], -1)  # (T, 6)
    feet_traj = msm["kp"].reshape(len(amp_info), -1, 3).transpose(0, 2, 1)

    os.makedirs(outdir, exist_ok=True)
    np.savetxt(os.path.join(outdir, "out-root_traj.txt"), root_traj)
    vis_kps(feet_traj, os.path.join(outdir, "feet.obj"))
    print("frames: %d, interval: %s" % (len(amp_info), frame_interval))


if __name__ == "__main__":
    main()
