"""Render intermediate trajectory OBJ exports across training iterations
into an mp4 (reference-compatible: /root/reference/render_intermediate.py).

python render_intermediate.py --testdir logdir/mi-pace-run0/ --data_class sim
"""

import glob
import os
import sys

import numpy as np
from absl import app, flags

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

flags.DEFINE_string("testdir", "logdir/mi-pace-dynamics/", "log dir")
flags.DEFINE_string("data_class", "sim", "sim or distilled")
flags.DEFINE_integer("image_size", 512, "rendered image size")
flags.DEFINE_float("fps", 10.0, "output frame rate")


def load_obj_with_colors(path):
    verts, colors, faces = [], [], []
    with open(path) as f:
        for line in f:
            if line.startswith("v "):
                parts = line.split()
                verts.append([float(x) for x in parts[1:4]])
                if len(parts) >= 7:
                    colors.append([float(x) * 255 for x in parts[4:7]])
            elif line.startswith("f "):
                faces.append([int(t.split("/")[0]) - 1 for t in line.split()[1:4]])
    verts = np.asarray(verts)
    faces = np.asarray(faces, np.int32)
    colors = (
        np.asarray(colors, np.uint8)
        if colors
        else np.full((len(verts), 3), 192, np.uint8)
    )
    return verts, faces, colors


def main(_):
    opts = flags.FLAGS
    from ppr_diffphys_tpu.utils.render import SoftwareRenderer
    from ppr_diffphys_tpu.utils.io import save_vid

    pattern = os.path.join(opts.testdir, "%s_traj-*.obj" % opts.data_class)
    paths = sorted(glob.glob(pattern))
    if not paths:
        print("no files matching", pattern)
        return

    renderer = SoftwareRenderer(opts.image_size, opts.image_size)
    frames = []
    for path in paths:
        verts, faces, colors = load_obj_with_colors(path)
        # camera: look at the strip from the front-top
        center = verts.mean(0)
        extent = max(np.abs(verts - center).max(), 1e-3)
        from scipy.spatial.transform import Rotation as R

        m = np.eye(4, dtype=np.float32)
        m[:3, :3] = R.from_rotvec([np.pi / 6, 0, 0]).as_matrix() @ np.diag([1.0, -1.0, -1.0])
        m[:3, 3] = [0, 0, 2.5 * extent]
        m[:3, 3] -= m[:3, :3] @ center
        renderer.set_camera(m)
        img = renderer.render(verts, faces, colors)
        frames.append(img)
        print("rendered", os.path.basename(path))

    out = os.path.join(opts.testdir, "%s_traj" % opts.data_class)
    save_vid(out, frames, suffix=".mp4", fps=opts.fps)
    print("saved %s.mp4" % out)


if __name__ == "__main__":
    app.run(main)
