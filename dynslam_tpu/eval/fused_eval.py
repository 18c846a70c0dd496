"""Evaluation wiring for the FUSED single-dispatch pipelines.

The reference's per-frame loop ends with `evaluation_->EvaluateFrame` +
`LogMemoryUse` (/root/reference/src/DynSLAM/DynSlam.cpp:154-161) — the
SAME loop whose FPS it reports. The staged path mirrors that synchronously
(eval/evaluation.py); the fused pipelines must not: a synchronous eval
fetch (~35 ms relay round trip) every frame would stall the one-frame-deep
dispatch pipeline. This module keeps the eval itself ON DEVICE
(`evaluate_depth_packed_jit` consumes the step's device-resident raycast
depth + input depth directly) and defers the tiny packed-result fetch to a
background thread, writing the CSV rows one or two frames late — the same
rows, in frame order, the staged path writes inline.
"""

from __future__ import annotations

import sys
from collections import deque
from concurrent.futures import ThreadPoolExecutor
from typing import Optional

import jax.numpy as jnp
import numpy as np

from dynslam_tpu.eval.evaluation import (
    MAX_LIDAR_POINTS, Evaluation, evaluate_depth_packed_jit, lidar_bucket,
)
from dynslam_tpu.eval.records import MemoryUsageEntry
from dynslam_tpu.ops.tsdf import BLOCK3, BYTES_PER_VOXEL


def _fetch(dev) -> np.ndarray:
    """The worker's device->host result fetch (module-level so tests can
    simulate a transiently failing relay)."""
    return np.asarray(dev)


class FusedEvaluation(Evaluation):
    """Per-frame evaluation + CSV logging driven by device-resident fused
    outputs with deferred (background-thread) result fetches.

    Protocol: `submit(frame, rendered_dev, input_dev, assoc, used, decayed)`
    once per frame — dispatches the jitted eval on device futures and
    queues a background fetch; CSV rows (depth results AND the memory
    entry) are written when the fetch joins, at most `max_outstanding`
    frames later, and all at `close()`. Frame order is preserved by the
    FIFO queue.
    """

    #: frames allowed in flight before the oldest fetch is joined
    max_outstanding = 2

    def __init__(self, dataset_root, input_config, input_, calib, config,
                 csv_out_dir: str = "csv"):
        super().__init__(dataset_root, input_config, input_, calib, config,
                         csv_out_dir=csv_out_dir)
        if self.params.evaluation_delay:
            raise ValueError(
                "--fused evaluation supports evaluation_delay=0 only "
                "(the staged path handles delayed evaluation)"
            )
        self.input_ = input_
        self._dataset_id = input_.get_dataset_identifier()
        self._frame_offset = input_.frame_offset
        self._pending: deque = deque()
        #: the single eval worker: one thread keeps CSV rows in frame
        #: order without locks; depth ~ max_outstanding
        self._exec = ThreadPoolExecutor(max_workers=1,
                                        thread_name_prefix="fused-eval")
        #: background fetches that failed and fell back to a synchronous
        #: retry (surfaced again at close())
        self.failed_fetches = 0
        self._n_deltas = len(self._all_deltas)
        #: device-resident all-static association map, uploaded ONCE —
        #: submit(assoc=None) frames (the static pipeline: every frame)
        #: otherwise pay a ~0.5 MB host->device transfer per frame
        self._zero_assoc = None
        self._velo_to_cam = jnp.asarray(self.calib.velo_to_left_cam,
                                        jnp.float32)
        self._proj_left = jnp.asarray(self.calib.proj_left_color, jnp.float32)
        self._proj_right = jnp.asarray(self.calib.proj_right_color,
                                       jnp.float32)
        self._bf = jnp.float32(self.baseline_m * self.focal_px)

    # ------------------------------------------------------------------
    def submit(
        self,
        eval_frame: int,
        rendered_depth_dev,  # (H, W) f32 device (composited raycast depth)
        input_depth_dev,  # (H, W) f32 device
        assoc: Optional[np.ndarray],  # (H, W) int8 or None (all-static)
        used_blocks,  # i32 host int or device scalar (post-decay blocks)
        decayed_blocks,  # i32 host int or device scalar (cumulative)
    ) -> None:
        """Evaluate one finished frame from device-resident depth maps.
        The ENTIRE job — LIDAR file read, point upload, eval dispatch,
        and the blocking result fetch — runs on the single eval worker
        thread, so the frame loop pays only the enqueue (the reference
        evaluates synchronously inside its loop, DynSlam.cpp:154-161;
        the measured cost here was ~8 ms upload + dispatch per frame on
        the timed thread). The single worker keeps frame order."""
        if not self.params.enabled:
            return
        fut = self._exec.submit(
            self._eval_job, eval_frame, rendered_depth_dev,
            input_depth_dev, assoc, used_blocks, decayed_blocks,
        )
        self._pending.append((eval_frame, fut))
        self._drain_over(self.max_outstanding)

    def _eval_job(self, eval_frame, rendered_depth_dev, input_depth_dev,
                  assoc, used_blocks, decayed_blocks):
        """Worker-side: returns ("mem", used, decayed) for LIDAR-less
        frames or ("eval", packed_np)."""
        input_frame_idx = self._frame_offset + eval_frame
        if not self.velodyne.frame_available(input_frame_idx):
            # skip the depth eval (Evaluation.cpp:54-59) but keep the
            # per-frame memory entry, like the reference's LogMemoryUse
            return ("mem", int(np.asarray(used_blocks)),
                    int(np.asarray(decayed_blocks)))
        lidar = self.velodyne.read_frame(input_frame_idx)
        n = min(len(lidar), MAX_LIDAR_POINTS)
        cap = lidar_bucket(n)  # proportional upload, see evaluation.py
        pts = np.zeros((cap, 3), np.float32)
        pts[:n] = lidar[:n, :3]
        valid = np.zeros(cap, bool)
        valid[:n] = True
        if assoc is None:
            if self._zero_assoc is None:
                self._zero_assoc = jnp.zeros(
                    (self.config.frame_height, self.config.frame_width),
                    jnp.int8,
                )
            assoc = self._zero_assoc

        packed = evaluate_depth_packed_jit(
            jnp.asarray(pts), jnp.asarray(valid),
            self._velo_to_cam, self._proj_left, self._proj_right,
            jnp.asarray(rendered_depth_dev, jnp.float32),
            jnp.asarray(input_depth_dev, jnp.float32),
            jnp.asarray(assoc),
            self._bf,
            jnp.float32(self.config.min_depth_m),
            jnp.float32(self.config.max_depth_m),
            jnp.asarray(used_blocks, jnp.int32),
            jnp.asarray(decayed_blocks, jnp.int32),
            width=self.config.frame_width,
            height=self.config.frame_height,
            delta_maxes=self._all_deltas,
            kitti_style=self._kitti_flags,
        )
        try:
            return ("eval", _fetch(packed))
        except Exception:
            # transient relay/backend error on the background fetch:
            # retry synchronously so the frame's rows still land — but
            # LOUDLY (the reference's per-frame error barrier ethos,
            # DynSlam.cpp:163-172): a systematically failing fetch
            # degrades every frame to a synchronous stall
            self.failed_fetches += 1
            print(f"[WARNING: eval fetch thread failed for frame "
                  f"{eval_frame}; retrying synchronously "
                  f"({self.failed_fetches} failures so far)]",
                  file=sys.stderr)
            return ("eval", np.asarray(packed))

    # ------------------------------------------------------------------
    def _write_memory_row(self, eval_frame: int, used: int,
                          decayed: int) -> None:
        block_bytes = BLOCK3 * BYTES_PER_VOXEL
        self.csv_memory.write(MemoryUsageEntry(
            eval_frame, used * block_bytes, decayed * block_bytes,
            self.config.decay,
        ))

    def _join_oldest(self) -> None:
        eval_frame, fut = self._pending.popleft()
        kind, *payload = fut.result()
        if kind == "mem":
            self._write_memory_row(eval_frame, *payload)
            return
        packed = payload[0]
        nc = self._n_deltas * 3 * 2 * 4
        counts = packed[:nc].reshape(self._n_deltas, 3, 2, 4)
        epi, neg, n_ok = (int(x) for x in packed[nc:nc + 3])
        used, decayed = (int(x) for x in packed[nc + 3:nc + 5])
        self._write_memory_row(eval_frame, used, decayed)
        self.warn_gt_stats(epi, neg, n_ok)
        self.write_frame_rows(eval_frame, self._dataset_id, counts)

    def _drain_over(self, keep: int) -> None:
        while len(self._pending) > keep:
            self._join_oldest()

    def drain(self) -> None:
        """Join every outstanding fetch and write its rows (frame order)."""
        self._drain_over(0)

    def close(self) -> None:
        self.drain()
        self._exec.shutdown(wait=True)
        if self.failed_fetches:
            print(f"[WARNING: {self.failed_fetches} eval background "
                  f"fetches failed over the run (each degraded that "
                  f"frame to a synchronous fetch)]", file=sys.stderr)
        super().close()
