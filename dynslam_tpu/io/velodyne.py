"""KITTI Velodyne LIDAR IO — reads `.bin` dumps of N x 4 float32
(X, Y, Z, reflectance) rows. Ref: Evaluation/VelodyneIO.{h,cpp}.
"""

from __future__ import annotations

import os

import numpy as np


class VelodyneIO:
    def __init__(self, folder: str, fname_format: str = "%06d.bin"):
        self.folder = folder
        self.fname_format = fname_format

    def frame_path(self, frame_idx: int) -> str:
        return os.path.join(self.folder, self.fname_format % frame_idx)

    def frame_available(self, frame_idx: int) -> bool:
        return os.path.exists(self.frame_path(frame_idx))

    def read_frame(self, frame_idx: int) -> np.ndarray:
        """Returns (N, 4) float32 [x, y, z, reflectance] in velodyne frame."""
        try:
            from dynslam_tpu.native import fastio

            return fastio.read_velodyne(self.frame_path(frame_idx))
        except ImportError:
            pass
        data = np.fromfile(self.frame_path(frame_idx), dtype=np.float32)
        if data.size % 4 != 0:
            raise ValueError(
                f"corrupt velodyne frame {self.frame_path(frame_idx)!r}: "
                f"{data.size} floats is not a multiple of 4"
            )
        return data.reshape(-1, 4)


def write_frame(path: str, points: np.ndarray) -> None:
    """Write (N, 4) float32 points (used by the synthetic data generator)."""
    pts = np.asarray(points, dtype=np.float32)
    assert pts.ndim == 2 and pts.shape[1] == 4
    os.makedirs(os.path.dirname(path), exist_ok=True)
    pts.tofile(path)
