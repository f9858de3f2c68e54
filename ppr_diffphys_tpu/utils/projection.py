"""2D reprojection utilities (reference diffphys/dp_utils.py:184-243).

Used by the (optional) 2D trajectory loss and lab4d-side visual checks:
``parse_rtk`` splits the packed [R|t ; intrinsics] 4x4, ``project_bodies``
projects maximal body positions into the image, ``plot_curves`` draws the
trajectories with OpenCV.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def parse_rtk(rtk):
    """rtk (..., 4, 4): rows 0-2 = [R|t], row 3 = fx, fy, px, py.
    Returns (rtmat (...,4,4), kmat (...,3,3))."""
    rtmat = jnp.zeros_like(rtk)
    rtmat = rtmat.at[..., :3, :].set(rtk[..., :3, :])
    rtmat = rtmat.at[..., 3, 3].set(1.0)
    kmat = jnp.zeros(rtk.shape[:-2] + (3, 3))
    kmat = kmat.at[..., 0, 0].set(rtk[..., 3, 0])
    kmat = kmat.at[..., 1, 1].set(rtk[..., 3, 1])
    kmat = kmat.at[..., 0, 2].set(rtk[..., 3, 2])
    kmat = kmat.at[..., 1, 2].set(rtk[..., 3, 3])
    kmat = kmat.at[..., 2, 2].set(1.0)
    return rtmat, kmat


def project_bodies(bodies, rtk):
    """bodies (..., K, 7) maximal body states; rtk (..., 4, 4).
    Returns pixel coordinates (..., K, 2)."""
    point = bodies[..., :3]
    rtmat, kmat = parse_rtk(rtk)
    rtmat = rtmat[..., None, :, :]
    kmat = kmat[..., None, :, :]
    point = jnp.concatenate([point, jnp.ones_like(point[..., :1])], -1)
    point = rtmat @ point[..., None]
    point = kmat @ point[..., :3, :]
    return point[..., :2, 0] / point[..., 2:3, 0]


def plot_curves(pts1, pts2):
    """Draw two (bs, T, K, 2) pixel trajectories (reference :217-226)."""
    import cv2

    img_size = int(max(pts1.max(), pts2.max())) + 1
    img = 255 * np.ones((pts1.shape[0], img_size, img_size, 3), np.uint8)
    plot_curve(img, pts1, (255, 0, 0))
    plot_curve(img, pts2, (0, 255, 0))
    return img


def plot_curve(img, pts, color=(0, 0, 255)):
    import cv2

    pts = np.asarray(pts).astype(np.int32)
    for i in range(pts.shape[0]):
        for j in range(pts.shape[1]):
            for k in range(pts.shape[2]):
                pt1 = tuple(pts[i, j, k])
                cv2.circle(img[i], pt1, 2, color, -1)
                if j + 1 < pts.shape[1]:
                    pt2 = tuple(pts[i, j + 1, k])
                    cv2.circle(img[i], pt2, 2, color, -1)
                    cv2.line(img[i], pt1, pt2, color, 1)
