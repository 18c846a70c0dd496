"""LIDAR-ground-truth depth evaluation — the reference's `Evaluation`
harness (src/DynSLAM/Evaluation/Evaluation.{h,cpp}) with the callback
chain collapsed into one vectorized jitted pass.

Per frame (EvaluateFrameSeparate, Evaluation.cpp:85-147):
- project every Velodyne point into the left+right color cameras
  (ProjectLidar, :215-238; depth clamp [0.5, 20] m) -> GT disparity
- fetch the fused (raycast) depth and the input depth at the pixel,
  convert to disparities via b*f/z
- classify {missing, error, correct} per delta_max in the sweep
  {0.5, 1..12} px plus the KITTI-2015 rule (err iff delta > 3 px AND
  delta > 5% GT), with compare-on-intersection semantics
  (EvaluationCallback.cpp:47-102)
- route each point to the static vs dynamic-reconstructed bucket via the
  instance masks + track states (SegmentedCallback.cpp:12-63)
- write CSV rows in the reference schema (static/dynamic/unified files
  with config-encoding names) + the per-frame memory entry.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dynslam_tpu.config import DynSlamConfig
from dynslam_tpu.eval.csv_writer import CsvWriter
from dynslam_tpu.eval.records import (
    DepthEvaluation,
    DepthFrameEvaluation,
    DepthResult,
    MemoryUsageEntry,
    TrackerFrameEntry,
    base_csv_name,
)
from dynslam_tpu.io.calib import KittiCalibration
from dynslam_tpu.io.input import Input, InputConfig
from dynslam_tpu.io.velodyne import VelodyneIO

#: association codes for the segmented evaluation
ASSOC_STATIC = 0
ASSOC_DYNAMIC = 1
ASSOC_SKIP = 2

MAX_LIDAR_POINTS = 1 << 17  # 131072; KITTI velodyne frames are ~120k
#: smallest padded LIDAR upload (points) — scans pad to the next power
#: of two in [MIN, MAX]: a fixed 131072-row buffer costs a ~1.6 MB
#: host->device transfer per frame (~33 ms through the relay, measured)
#: when the scan holds ~19k points; bucketing keeps the per-frame upload
#: proportional, at one eval executable per distinct bucket
MIN_LIDAR_BUCKET = 1 << 14


def lidar_bucket(n: int) -> int:
    """Next power-of-two buffer size in [MIN_LIDAR_BUCKET,
    MAX_LIDAR_POINTS] holding n points."""
    b = MIN_LIDAR_BUCKET
    while b < n and b < MAX_LIDAR_POINTS:
        b <<= 1
    return b


@partial(
    jax.jit,
    static_argnames=("width", "height", "delta_maxes", "kitti_style",
                     "compare_on_intersection"),
)
def evaluate_depth_jit(
    lidar: jnp.ndarray,  # (M, 3) xyz velodyne frame (padded)
    lidar_valid: jnp.ndarray,  # (M,) bool
    velo_to_cam: jnp.ndarray,  # (4, 4)
    proj_left: jnp.ndarray,  # (3, 4)
    proj_right: jnp.ndarray,  # (3, 4)
    rendered_depth_m: jnp.ndarray,  # (H, W), 0 = missing
    input_depth_m: jnp.ndarray,  # (H, W), 0 = missing
    assoc_map: jnp.ndarray,  # (H, W) int8 association codes
    bf: jnp.ndarray,  # scalar baseline*focal
    min_depth: jnp.ndarray,
    max_depth: jnp.ndarray,
    width: int,
    height: int,
    delta_maxes: tuple,
    kitti_style: tuple,
    compare_on_intersection: bool = True,
):
    """Returns counts[n_delta, 3 buckets(all/static/dynamic), 2 sources
    (fused/input), 4 fields(error, missing, correct, missing_separate)]."""
    ones = jnp.ones((lidar.shape[0], 1))
    velo_h = jnp.concatenate([lidar, ones], axis=1)  # (M, 4)
    cam = velo_h @ velo_to_cam.T
    z = cam[:, 2]
    in_range = (z >= min_depth) & (z <= max_depth) & lidar_valid

    pl = cam @ proj_left.T
    pr = cam @ proj_right.T
    ul = pl[:, 0] / pl[:, 2]
    vl = pl[:, 1] / pl[:, 2]
    ur = pr[:, 0] / pr[:, 2]

    col = jnp.round(ul).astype(jnp.int32)
    row = jnp.round(vl).astype(jnp.int32)
    in_img = (col >= 0) & (col < width) & (row >= 0) & (row < height)
    lidar_disp = ul - ur
    ok = in_range & in_img & (lidar_disp >= 0.0)

    # GT-quality accounting (Evaluation.cpp:262-275): row disagreements
    # beyond 1.2 px between the two projections are epipolar violations
    # (imperfectly aligned LIDAR, e.g. passing large trucks); negative GT
    # disparities make the reference throw — we count and drop instead
    row_r = jnp.round(pr[:, 1] / pr[:, 2]).astype(jnp.int32)
    epi_errors = jnp.sum(
        in_range & in_img & (row != row_r)
        & (jnp.abs(vl - pr[:, 1] / pr[:, 2]) > 1.2)
    )
    neg_disp = jnp.sum(in_range & in_img & (lidar_disp < 0.0))
    n_valid_pts = jnp.sum(ok)

    colc = jnp.clip(col, 0, width - 1)
    rowc = jnp.clip(row, 0, height - 1)
    # ONE per-point image lookup instead of three: computed-index
    # gathers cost ~120 ns/element on TPU (PERFORMANCE.md), so at ~20k
    # LIDAR points the three f32/int8 gathers were ~2/3 of the eval
    # kernel. Pack (rendered mm: 15 bits | input mm: 15 | assoc: 2)
    # into one int32 image (a cheap elementwise VPU pass) and gather
    # once. Depths quantize to 1 mm FOR THIS COMPARISON (disparity
    # error <= bf/d^2 * 1e-3 px, ~0.1 px at 2 m against 1-5 px delta
    # thresholds); 15 bits hold max_depth*1.05 up to 32.7 m; mm == 0
    # reproduces the abs(d) < 1e-5 missing test for any d below the
    # physical min_depth.
    rend_mm = jnp.clip(jnp.round(rendered_depth_m * 1000.0),
                       0, 32767).astype(jnp.int32)
    inp_mm = jnp.clip(jnp.round(input_depth_m * 1000.0),
                      0, 32767).astype(jnp.int32)
    packed_img = (rend_mm << 17) | (inp_mm << 2) \
        | assoc_map.astype(jnp.int32)
    at = packed_img[rowc, colc]
    rend_d = (at >> 17).astype(jnp.float32) * 1e-3
    inp_d = ((at >> 2) & 0x7FFF).astype(jnp.float32) * 1e-3
    assoc = at & 3

    missing_rend = rend_d == 0.0
    missing_inp = inp_d == 0.0
    rend_disp = bf / jnp.where(missing_rend, jnp.inf, rend_d)
    inp_disp = bf / jnp.where(missing_inp, jnp.inf, inp_d)
    rend_delta = jnp.abs(rend_disp - lidar_disp)
    inp_delta = jnp.abs(inp_disp - lidar_disp)

    buckets = [
        ok & (assoc != ASSOC_SKIP),  # unified (evaluated points)
        ok & (assoc == ASSOC_STATIC),
        ok & (assoc == ASSOC_DYNAMIC),
    ]

    rows = []
    for dmax, kitti in zip(delta_maxes, kitti_style):
        def is_err(delta):
            if kitti:
                return (delta > dmax) & (delta > 0.05 * lidar_disp)
            return delta > dmax

        joint_missing = missing_inp | missing_rend
        per_bucket = []
        for b in buckets:
            bf_ = b.astype(jnp.int32)
            ms = jnp.stack([jnp.sum(bf_ * missing_rend),
                            jnp.sum(bf_ * missing_inp)])
            if compare_on_intersection:
                missing_r = joint_missing
                missing_i = joint_missing
            else:
                missing_r = missing_rend
                missing_i = missing_inp
            err_r = jnp.sum(bf_ * (~missing_r & is_err(rend_delta)))
            cor_r = jnp.sum(bf_ * (~missing_r & ~is_err(rend_delta)))
            mis_r = jnp.sum(bf_ * missing_r)
            err_i = jnp.sum(bf_ * (~missing_i & is_err(inp_delta)))
            cor_i = jnp.sum(bf_ * (~missing_i & ~is_err(inp_delta)))
            mis_i = jnp.sum(bf_ * missing_i)
            per_bucket.append(jnp.stack([
                jnp.stack([err_r, mis_r, cor_r, ms[0]]),
                jnp.stack([err_i, mis_i, cor_i, ms[1]]),
            ]))
        rows.append(jnp.stack(per_bucket))
    # (n_delta, 3, 2, 4) counts + GT-quality stats
    return jnp.stack(rows), jnp.stack([epi_errors, neg_disp, n_valid_pts])


@partial(
    jax.jit,
    static_argnames=("width", "height", "delta_maxes", "kitti_style",
                     "compare_on_intersection"),
)
def evaluate_depth_packed_jit(
    lidar, lidar_valid, velo_to_cam, proj_left, proj_right,
    rendered_depth_m, input_depth_m, assoc_map, bf, min_depth, max_depth,
    used_blocks, decayed_blocks,
    width: int, height: int, delta_maxes: tuple, kitti_style: tuple,
    compare_on_intersection: bool = True,
):
    """The fused-pipeline eval dispatch: `evaluate_depth_jit` plus the
    memory telemetry folded into ONE flat f32 vector, so the host fetch
    is a single relay round trip (layout: counts.ravel() ++ gt_stats ++
    [used_blocks, decayed_blocks])."""
    counts, gt_stats = evaluate_depth_jit(
        lidar, lidar_valid, velo_to_cam, proj_left, proj_right,
        rendered_depth_m, input_depth_m, assoc_map, bf, min_depth,
        max_depth, width=width, height=height, delta_maxes=delta_maxes,
        kitti_style=kitti_style,
        compare_on_intersection=compare_on_intersection,
    )
    return jnp.concatenate([
        counts.reshape(-1).astype(jnp.float32),
        gt_stats.astype(jnp.float32),
        jnp.stack([jnp.asarray(used_blocks, jnp.float32),
                   jnp.asarray(decayed_blocks, jnp.float32)]),
    ])


def build_association_map(
    height: int, width: int, seg_result, tracker,
    det_states: Optional[Dict[int, object]] = None,
) -> np.ndarray:
    """Rasterize the segmented-evaluation routing (SegmentedCallback):
    inside a copy mask: car/bus with a non-Uncertain track -> DYNAMIC,
    otherwise SKIP for dynamic classes; everything else STATIC.

    `det_states` optionally supplies the {id(detection): TrackState}
    mapping directly (the fused dynamic pipeline evaluates a frame whose
    tracks may already hold a NEWER detection, so `last_frame` lookup
    would miss)."""
    from dynslam_tpu.instances.track import TrackState

    assoc = np.zeros((height, width), np.int8)
    if seg_result is None:
        return assoc

    det_to_state: Dict[int, object] = det_states if det_states is not None \
        else {}
    if tracker is not None and det_states is None:
        for track in tracker.active_tracks.values():
            det_to_state[id(track.last_frame.detection)] = track.state

    for det in seg_result.instance_detections:
        m = det.copy_mask.to_full_frame(height, width)
        if not det.is_possibly_dynamic():
            continue  # stays static
        if det.is_reconstructable():
            state = det_to_state.get(id(det))
            if state is not None and state != TrackState.UNCERTAIN:
                assoc[m] = ASSOC_DYNAMIC
            else:
                assoc[m] = ASSOC_SKIP
        else:
            assoc[m] = ASSOC_SKIP
    return assoc


class Evaluation:
    """Per-frame evaluation + CSV logging (the L6 harness)."""

    def __init__(
        self,
        dataset_root: str,
        input_config: InputConfig,
        input_: Input,
        calib: KittiCalibration,
        config: DynSlamConfig,
        csv_out_dir: str = "csv",
    ):
        self.config = config
        self.params = config.evaluation
        self.calib = calib
        self.velodyne = VelodyneIO(
            os.path.join(dataset_root, input_config.velodyne_folder),
            input_config.velodyne_fname_format or "%06d.bin",
        )
        self.baseline_m = config.calibration.baseline_m
        self.focal_px = float(calib.proj_left_color[0, 0])

        name_kw = dict(
            max_decay_weight=config.decay.max_decay_weight,
            dataset_id=input_.get_dataset_identifier(),
            frame_offset=input_.frame_offset,
            depth_provider_name=(
                input_.depth_provider.get_name() if input_.depth_provider
                else "none"
            ),
            voxel_size_meters=config.scene.voxel_size_m,
            max_depth_meters=config.max_depth_m,
            is_dynamic=config.dynamic_mode,
            direct_refinement=False,
            use_depth_weighting=config.map.use_depth_weighting,
            fusion_every=config.fusion_every,
            base_folder=csv_out_dir,
        )
        base = base_csv_name(**name_kw)
        self.csv_unified = CsvWriter(base + "-unified-depth-result.csv")
        self.csv_static = CsvWriter(base + "-static-depth-result.csv")
        self.csv_dynamic = CsvWriter(base + "-dynamic-depth-result.csv")
        self.csv_memory = CsvWriter(base + "-memory.csv")
        self.csv_tracker = CsvWriter(base + "-tracker.csv")
        self._delta_maxes = tuple(float(d) for d in self.params.delta_maxes)
        self._kitti_flags = tuple([False] * len(self._delta_maxes)) + (
            (True,) if self.params.kitti_style else ()
        )
        self._all_deltas = self._delta_maxes + (
            (3.0,) if self.params.kitti_style else ()
        )
        self.last_frame_results: Optional[Dict[str, DepthFrameEvaluation]] = None

    # ------------------------------------------------------------------
    def evaluate_frame(self, input_: Input, dyn_slam) -> None:
        """EvaluateFrame semantics (Evaluation.cpp:34-147): evaluates the
        frame `evaluation_delay` frames ago (0 = current)."""
        if not self.params.enabled:
            return
        delay = self.params.evaluation_delay
        eval_frame = dyn_slam.current_frame_no - delay
        if eval_frame < 0:
            return
        input_frame_idx = input_.frame_offset + eval_frame
        if not self.velodyne.frame_available(input_frame_idx):
            return  # skip frames lacking LIDAR (Evaluation.cpp:54-59)

        lidar = self.velodyne.read_frame(input_frame_idx)
        # pose of the evaluated frame (pose_history[k+1], Evaluation.cpp:93)
        pose_w2c = dyn_slam.pose_history[eval_frame + 1]
        cam_to_world = np.linalg.inv(pose_w2c)

        rendered = dyn_slam.get_static_map_raycast_depth_preview(
            cam_to_world=cam_to_world, compositing=True
        )
        if delay == 0:
            _, input_depth_mm = input_.get_images()
        else:
            _, input_depth_mm = input_.get_frame_images(input_frame_idx)

        # delayed frames are routed with the LATEST segmentation +
        # reconstructor, exactly like the reference (GetLatestSeg,
        # Evaluation.cpp:111-127) — so the decay-gate recipe
        # (evaluation_delay 80-120) still populates the dynamic CSV
        assoc = build_association_map(
            self.config.frame_height, self.config.frame_width,
            dyn_slam.get_latest_seg_result(),
            dyn_slam.instance_reconstructor.tracker
            if dyn_slam.instance_reconstructor is not None else None,
        )

        counts = self.evaluate_depth(
            lidar, rendered, input_depth_mm.astype(np.float32) / 1000.0, assoc
        )
        self.write_frame_rows(
            eval_frame, input_.get_dataset_identifier(), counts
        )

    def write_frame_rows(
        self, eval_frame: int, dataset_id: str, counts: np.ndarray
    ) -> Dict[str, DepthFrameEvaluation]:
        """Turn one frame's count tensor into typed records and write the
        CSV rows (the tail of EvaluateFrameSeparate) — shared by the
        staged per-frame path and the fused pipelines' deferred fetches."""
        results = {}
        for bi, name in enumerate(("unified", "static", "dynamic")):
            evals: List[DepthEvaluation] = []
            for di, dmax in enumerate(self._all_deltas):
                kitti = self._kitti_flags[di]
                c = counts[di, bi]
                fused = DepthResult(
                    int(c[0, 0] + c[0, 1] + c[0, 2]), int(c[0, 0]),
                    int(c[0, 1]), int(c[0, 2]), int(c[0, 3]),
                )
                inp = DepthResult(
                    int(c[1, 0] + c[1, 1] + c[1, 2]), int(c[1, 0]),
                    int(c[1, 1]), int(c[1, 2]), int(c[1, 3]),
                )
                evals.append(DepthEvaluation(dmax, fused, inp, kitti))
            results[name] = DepthFrameEvaluation(
                eval_frame, dataset_id, self.config.max_depth_m, evals,
            )

        self.csv_unified.write(results["unified"])
        if self.params.semantic_evaluation:
            self.csv_static.write(results["static"])
            self.csv_dynamic.write(results["dynamic"])
        self.last_frame_results = results
        return results

    def warn_gt_stats(self, epi: int, neg: int, n_ok: int) -> None:
        """GT-quality warnings (Evaluation.cpp:300-303; the reference
        aborts on negative disparity, we drop + warn)."""
        self.last_epi_errors = epi
        self.last_negative_disp = neg
        if epi > 5:
            import sys

            print(
                f"WARNING: Found {epi} possible epipolar violations in the "
                f"ground truth, out of {n_ok} valid LIDAR points.",
                file=sys.stderr,
            )
        if neg > 0:
            import sys

            print(
                f"WARNING: {neg} negative-disparity ground-truth points "
                "dropped (the reference aborts here).", file=sys.stderr,
            )

    def evaluate_depth(
        self,
        lidar: np.ndarray,
        rendered_depth_m: np.ndarray,
        input_depth_m: np.ndarray,
        assoc: np.ndarray,
    ) -> np.ndarray:
        n = min(len(lidar), MAX_LIDAR_POINTS)
        cap = lidar_bucket(n)
        pts = np.zeros((cap, 3), np.float32)
        pts[:n] = lidar[:n, :3]
        valid = np.zeros(cap, bool)
        valid[:n] = True

        counts, gt_stats = evaluate_depth_jit(
            jnp.asarray(pts), jnp.asarray(valid),
            jnp.asarray(self.calib.velo_to_left_cam, jnp.float32),
            jnp.asarray(self.calib.proj_left_color, jnp.float32),
            jnp.asarray(self.calib.proj_right_color, jnp.float32),
            jnp.asarray(rendered_depth_m, jnp.float32),
            jnp.asarray(input_depth_m, jnp.float32),
            jnp.asarray(assoc),
            jnp.float32(self.baseline_m * self.focal_px),
            jnp.float32(self.config.min_depth_m),
            jnp.float32(self.config.max_depth_m),
            width=self.config.frame_width,
            height=self.config.frame_height,
            delta_maxes=self._all_deltas,
            kitti_style=self._kitti_flags,
        )
        epi, neg, n_ok = (int(x) for x in np.asarray(gt_stats))
        self.warn_gt_stats(epi, neg, n_ok)
        return np.asarray(counts)

    # ------------------------------------------------------------------
    def log_memory_use(self, dyn_slam) -> None:
        """Per-frame memory CSV (Evaluation.h:234-243)."""
        self.csv_memory.write(
            MemoryUsageEntry(
                dyn_slam.current_frame_no,
                dyn_slam.static_scene.get_used_memory_bytes(),
                dyn_slam.static_scene.get_saved_decay_memory_bytes(),
                self.config.decay,
            )
        )

    def log_tracker(self, frame_id: int, active: int, reconstructed: int,
                    dropped_cum: int, oversize_cum: int = 0,
                    truncated_px_cum: int = 0) -> None:
        """Per-frame tracker telemetry row (fused-path drop/truncation
        visibility; VERDICT r3 item 5 + r4 item 4 — new file, reference
        schemas untouched)."""
        self.csv_tracker.write(TrackerFrameEntry(
            frame_id, active, reconstructed, dropped_cum, oversize_cum,
            truncated_px_cum,
        ))

    def close(self) -> None:
        for wtr in (self.csv_unified, self.csv_static, self.csv_dynamic,
                    self.csv_memory, self.csv_tracker):
            wtr.close()
