"""Prefetching input wrapper — the host-side IO/compute overlap that the
reference gets from `std::async` (DynSlam.cpp:33-112): while the device
crunches frame k, a background thread reads and decodes frame k+1's
stereo pair + depth (and warms the segmentation dumps' page cache).

`PrefetchingInput` is a drop-in `Input`: `read_next_frame()` consumes the
prefetched result when available and immediately schedules the next one.
"""

from __future__ import annotations

from concurrent.futures import Future, ThreadPoolExecutor
from typing import Optional

from dynslam_tpu.io.depth_providers import PrecomputedDepthProvider
from dynslam_tpu.io.input import Input


class PrefetchingInput:
    def __init__(self, inner: Input, prefetch_seg_folder: Optional[str] = None):
        self._inner = inner
        self._pool = ThreadPoolExecutor(max_workers=1,
                                        thread_name_prefix="dynslam-io")
        self._pending: Optional[Future] = None
        self._seg_folder = prefetch_seg_folder
        self._schedule(inner.frame_idx)

    # -- delegation -------------------------------------------------------
    def __getattr__(self, name):
        return getattr(self._inner, name)

    # -- prefetch machinery -----------------------------------------------
    def _load(self, frame_idx: int):
        inner = self._inner
        left = inner.read_left_color(frame_idx)
        right = inner.read_right_color(frame_idx)
        depth = None
        if isinstance(inner.depth_provider, PrecomputedDepthProvider):
            depth = inner.depth_provider.get_depth(
                frame_idx, inner.stereo_calibration, inner.input_scale
            )
        if self._seg_folder:
            import os

            # warm the page cache for the frame's mask files
            base = os.path.join(self._seg_folder, f"{frame_idx:06d}.png")
            k = 0
            while os.path.exists(f"{base}.{k:04d}.result.txt") and k < 32:
                with open(f"{base}.{k:04d}.mask.txt", "rb") as f:
                    f.read()
                k += 1
        return left, right, depth

    def _schedule(self, frame_idx: int) -> None:
        if self._inner.has_more_images():
            self._pending = self._pool.submit(self._load, frame_idx)
        else:
            self._pending = None

    def read_next_frame(self) -> bool:
        inner = self._inner
        if self._pending is None:
            return inner.read_next_frame()
        left, right, depth = self._pending.result()

        if depth is None:
            # live stereo: the provider needs both images
            if isinstance(inner.depth_provider, PrecomputedDepthProvider):
                inner.depth_provider.set_frame(inner.frame_idx)
            depth = inner.depth_provider.depth_from_stereo(
                left, right, inner.stereo_calibration, inner.input_scale
            )

        inner._left_color, inner._right_color = left, right
        inner._depth_mm = depth
        inner.frame_idx += 1
        self._schedule(inner.frame_idx)
        return True

    def close(self) -> None:
        self._pool.shutdown(wait=False, cancel_futures=True)
