"""Depth providers: the reference's pluggable stereo->depth contract.

- `DepthProvider` ABC mirrors `src/DynSLAM/DepthProvider.h:45-76`
  (disparity_from_stereo + depth_from_stereo, int16 mm output).
- `PrecomputedDepthProvider` mirrors `PrecomputedDepthProvider.{h,cpp}`:
  reads per-frame `.pfm` float disparity (DispNet) or OpenCV XML
  `CV_16SC1` depth-mm dumps (ELAS).
- `StereoMatcherDepthProvider` runs the TPU census cost-volume matcher
  (ops/stereo.py) — the libelas replacement.
"""

from __future__ import annotations

import abc
import os

import numpy as np

from dynslam_tpu.config import StereoCalibration, StereoMatcherParams
from dynslam_tpu.ops import depth as depth_ops
from dynslam_tpu.utils.pfm import read_pfm


class DepthProvider(abc.ABC):
    """stereo pair -> disparity -> int16 depth (mm), 0 = invalid."""

    def __init__(self, input_is_depth: bool, min_depth_m: float, max_depth_m: float):
        self.input_is_depth = input_is_depth
        self.min_depth_m = min_depth_m
        self.max_depth_m = max_depth_m

    @abc.abstractmethod
    def disparity_map_from_stereo(
        self, left_rgb: np.ndarray, right_rgb: np.ndarray
    ) -> np.ndarray:
        """Returns float disparity (px) or — if input_is_depth — int16 mm."""

    @abc.abstractmethod
    def get_name(self) -> str: ...

    def depth_from_stereo(
        self,
        left_rgb: np.ndarray,
        right_rgb: np.ndarray,
        calib: StereoCalibration,
        scale: float = 1.0,
    ) -> np.ndarray:
        """Full stereo -> int16 depth-mm path (DepthProvider::DepthFromStereo)."""
        raw = self.disparity_map_from_stereo(left_rgb, right_rgb)
        return self.depth_from_disparity_map(raw, calib, scale)

    def depth_from_disparity_map(
        self, disparity: np.ndarray, calib: StereoCalibration, scale: float = 1.0
    ) -> np.ndarray:
        if self.input_is_depth:
            # already metric depth in mm (ELAS XML dumps)
            return np.asarray(disparity, dtype=np.int16)
        max_mm = int(self.max_depth_m * 1000)
        if max_mm >= 32767:
            raise RuntimeError(
                f"Unsupported maximum depth of {self.max_depth_m} m "
                f"({max_mm} mm, larger than the int16 limit)."
            )
        out = depth_ops.depth_mm_from_disparity(
            np.asarray(disparity, dtype=np.float32),
            calib.bf,
            min_depth_m=self.min_depth_m,
            max_depth_m=self.max_depth_m,
            scale=scale,
        )
        return np.asarray(out)


class PrecomputedDepthProvider(DepthProvider):
    """Reads per-frame disparity/depth from disk.
    Ref: PrecomputedDepthProvider.cpp:22-75."""

    def __init__(
        self,
        folder: str,
        fname_format: str,
        input_is_depth: bool,
        min_depth_m: float = 0.5,
        max_depth_m: float = 20.0,
    ):
        super().__init__(input_is_depth, min_depth_m, max_depth_m)
        self.folder = folder
        self.fname_format = fname_format
        self._frame_idx = 0

    def set_frame(self, frame_idx: int) -> None:
        self._frame_idx = frame_idx

    def frame_path(self, frame_idx: int) -> str:
        return os.path.join(self.folder, self.fname_format % frame_idx)

    def read_precomputed(self, frame_idx: int) -> np.ndarray:
        path = self.frame_path(frame_idx)
        if path.endswith(".pfm"):
            # DispNet float disparity; negative values mark invalid
            disp = read_pfm(path)
            return np.where(np.isfinite(disp), disp, 0.0).astype(np.float32)
        elif path.endswith(".xml"):
            # OpenCV XML storage with a single CV_16SC1 depth-mm matrix (ELAS)
            import cv2

            fs = cv2.FileStorage(path, cv2.FILE_STORAGE_READ)
            try:
                try:
                    keys = fs.root().keys()
                except Exception:
                    keys = []
                node = fs.getNode(keys[0]) if keys else None
                if node is None or node.mat() is None:
                    raise ValueError(f"no matrix found in XML depth file {path!r}")
                return node.mat().astype(np.int16)
            finally:
                fs.release()
        elif path.endswith(".npy"):
            return np.load(path)
        else:
            raise ValueError(f"unsupported precomputed depth format: {path!r}")

    def disparity_map_from_stereo(self, left_rgb, right_rgb) -> np.ndarray:
        return self.read_precomputed(self._frame_idx)

    def get_depth(
        self, frame_idx: int, calib: StereoCalibration, scale: float = 1.0
    ) -> np.ndarray:
        """Random-access depth for a specific frame (used by evaluation,
        PrecomputedDepthProvider.h:44-66)."""
        raw = self.read_precomputed(frame_idx)
        return self.depth_from_disparity_map(raw, calib, scale)

    def get_name(self) -> str:
        return "precomputed-dispnet" if not self.input_is_depth else "precomputed-elas"


class StereoMatcherDepthProvider(DepthProvider):
    """Computes disparity with the TPU census cost-volume matcher
    (ops/stereo.py) — the in-framework libelas equivalent."""

    def __init__(
        self,
        params: StereoMatcherParams | None = None,
        min_depth_m: float = 0.5,
        max_depth_m: float = 20.0,
    ):
        super().__init__(False, min_depth_m, max_depth_m)
        self.params = params or StereoMatcherParams()

    def disparity_map_from_stereo(self, left_rgb, right_rgb) -> np.ndarray:
        from dynslam_tpu.ops import stereo

        disp = stereo.compute_disparity(
            np.asarray(left_rgb), np.asarray(right_rgb), self.params
        )
        return np.asarray(disp)

    def get_name(self) -> str:
        return "tpu-census-bm"


class InGraphDepthProvider(DepthProvider):
    """Placeholder provider for the FUSED pipelines, whose single-
    dispatch steps run the census matcher ON DEVICE inside the frame
    executable (pipeline/fused.py, pipeline/fused_dynamic.py): Input's
    eager host-side depth would be computed twice and thrown away, so
    this returns zeros at negligible cost."""

    def __init__(self, min_depth_m: float = 0.5, max_depth_m: float = 20.0):
        super().__init__(True, min_depth_m, max_depth_m)

    def disparity_map_from_stereo(self, left_rgb, right_rgb):
        return np.zeros(left_rgb.shape[:2], np.int16)

    def get_name(self) -> str:
        return "ingraph"
