"""LIDAR-vs-depth error visualization — the headless equivalent of the
reference GUI's visual diff modes (ErrorVisualizationCallback /
SegmentedVisualizationCallback, rendered as GL point clouds in
/root/reference/src/DynSLAM/DynSLAMGUI.cpp:94-100,256-300).

Each projected LIDAR point is splatted onto the camera image colored by
its disparity delta vs the evaluated depth map: green = within
delta_max, red = error, blue = the depth map was missing there.
"""

from __future__ import annotations

import numpy as np


def render_depth_error(
    lidar: np.ndarray,  # (N, >=3) velodyne points
    depth_m: np.ndarray,  # (H, W) evaluated depth (rendered or input)
    rgb: np.ndarray,  # (H, W, 3) uint8 backdrop
    velo_to_cam: np.ndarray,
    proj_left: np.ndarray,
    proj_right: np.ndarray,
    bf: float,
    delta_max: float = 3.0,
    min_depth: float = 0.5,
    max_depth: float = 20.0,
    splat: int = 1,
) -> np.ndarray:
    """Returns an (H, W, 3) uint8 overlay (dimmed rgb + error splats)."""
    h, w = depth_m.shape
    pts = np.concatenate(
        [lidar[:, :3], np.ones((len(lidar), 1), lidar.dtype)], axis=1
    )
    cam = pts @ velo_to_cam.T
    z = cam[:, 2]
    pl = cam @ proj_left.T
    pr = cam @ proj_right.T
    ul = pl[:, 0] / pl[:, 2]
    vl = pl[:, 1] / pl[:, 2]
    ur = pr[:, 0] / pr[:, 2]
    col = np.round(ul).astype(np.int32)
    row = np.round(vl).astype(np.int32)
    lidar_disp = ul - ur
    ok = (
        (z >= min_depth) & (z <= max_depth)
        & (col >= 0) & (col < w) & (row >= 0) & (row < h)
        & (lidar_disp >= 0)
    )
    col, row, lidar_disp = col[ok], row[ok], lidar_disp[ok]

    d = depth_m[row, col]
    missing = np.abs(d) < 1e-5
    with np.errstate(divide="ignore"):
        disp = np.where(missing, np.inf, bf / np.maximum(d, 1e-5))
    delta = np.abs(disp - lidar_disp)
    err = ~missing & (delta > delta_max)
    good = ~missing & ~err

    out = (rgb.astype(np.float32) * 0.45).astype(np.uint8).copy()
    colors = np.zeros((len(col), 3), np.uint8)
    colors[good] = (40, 220, 40)
    colors[err] = (230, 40, 40)
    colors[missing] = (60, 90, 230)
    for dy in range(-splat, splat + 1):
        for dx in range(-splat, splat + 1):
            yy = np.clip(row + dy, 0, h - 1)
            xx = np.clip(col + dx, 0, w - 1)
            out[yy, xx] = colors
    return out
