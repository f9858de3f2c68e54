"""Dump root/feet trajectories from an AMP mocap file for inspection
(reference scripts/read_amp.py).

python scripts/read_amp.py data/motion_sequences/mi-pace/amp-mi-pace.txt /tmp
"""

import json
import sys
import os

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from ppr_diffphys_tpu.data.amp_loader import parse_amp  # noqa: E402

path = sys.argv[1]
outdir = sys.argv[2]

with open(path, "r") as f:
    amp_info = json.load(f)
    frame_interval = amp_info["FrameDuration"]
    amp_info = np.asarray(amp_info["Frames"])

msm = parse_amp(amp_info)
root_traj = np.concatenate([msm["pos"], msm["orn"]], -1)
feet_traj = msm["kp"]

np.savetxt("%s/out-root_traj.txt" % outdir, root_traj)
np.savetxt("%s/out-feet_traj.txt" % outdir, feet_traj)
print("frames: %d, interval: %s" % (len(amp_info), frame_interval))
