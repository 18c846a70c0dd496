"""Pipeline factory — the `BuildDynSlamKittiOdometry` equivalent
(DynSLAMGUI.cpp:1109-1283): wires Input, depth provider, segmentation,
sparse scene flow, map engine, instance reconstructor, and evaluation
from a dataset root + a DynSlamConfig.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional, Tuple

from dynslam_tpu.config import DynSlamConfig
from dynslam_tpu.io.calib import read_kitti_calibration
from dynslam_tpu.io.depth_providers import (
    PrecomputedDepthProvider,
    StereoMatcherDepthProvider,
)
from dynslam_tpu.io.input import (
    Input,
    InputConfig,
    kitti_odometry_config,
    kitti_odometry_dispnet_config,
    kitti_odometry_lowres_config,
    kitti_tracking_config,
    kitti_tracking_dispnet_config,
)
from dynslam_tpu.io.segmentation import PrecomputedSegmentationProvider
from dynslam_tpu.pipeline.dynslam import DynSlam
from dynslam_tpu.pipeline.mapping import MapEngine, engine_config_from
from dynslam_tpu.pipeline.sparse_sf import SparseSFProvider

#: the reference hardcodes the KITTI baseline (DynSLAMGUI.cpp:1185)
KITTI_BASELINE_M = 0.537150654273


def probe_frame_size(dataset_root: str, icfg: InputConfig,
                     scale: float = 1.0) -> Tuple[int, int]:
    """(width, height) probed from frame 0/1 (GetFrameSize,
    DynSLAMGUI.cpp:1094-1105)."""
    import cv2

    for probe in (1, 0):
        p = os.path.join(
            dataset_root, icfg.left_color_folder, icfg.fname_format % probe
        )
        img = cv2.imread(p)
        if img is not None:
            return int(img.shape[1] / scale), int(img.shape[0] / scale)
    raise FileNotFoundError(
        f"no frames found under {dataset_root}/{icfg.left_color_folder}"
    )


def _resolve_dataset(
    dataset_root: str,
    config: DynSlamConfig,
    kitti_tracking_sequence: Optional[int],
    baseline_m: Optional[float],
):
    """Dataset preset + calibration + frame-size resolution shared by
    the staged and fused factories. Returns (config, icfg, live_scale,
    calib) with the config's frame geometry/intrinsics filled in."""
    # dataset preset (Input.h:61-160)
    if kitti_tracking_sequence is not None:
        icfg = (
            kitti_tracking_dispnet_config(kitti_tracking_sequence)
            if config.use_dispnet
            else kitti_tracking_config(kitti_tracking_sequence)
        )
    else:
        icfg = (
            kitti_odometry_dispnet_config()
            if config.use_dispnet
            else kitti_odometry_config()
        )

    # prefer pre-scaled folders produced by scripts/scale_sequence.py
    # (the reference recipe: depth/seg recomputed at the low resolution,
    # Input.h:128-139) over live nearest-resize of the full-res inputs
    live_scale = config.scale
    if (
        kitti_tracking_sequence is None
        and config.scale != 1.0
        and not config.use_dispnet
    ):
        lowres = kitti_odometry_lowres_config(1.0 / config.scale)
        if os.path.isdir(
            os.path.join(dataset_root, lowres.left_color_folder)
        ):
            icfg = lowres
            live_scale = 1.0  # folders are already downscaled

    calib = read_kitti_calibration(
        os.path.join(dataset_root, icfg.calibration_fname)
    )
    width, height = probe_frame_size(dataset_root, icfg, live_scale)
    intr = calib.left_color_intrinsics
    if config.scale != 1.0:
        intr = intr.scaled(1.0 / config.scale)
    stereo_calib = calib.stereo_calibration(baseline_m)

    config = dataclasses.replace(
        config,
        frame_width=width,
        frame_height=height,
        intrinsics=intr,
        right_intrinsics=calib.right_color_intrinsics,
        calibration=stereo_calib,
    )
    return config, icfg, live_scale, calib


def build_dynslam(
    dataset_root: str,
    config: Optional[DynSlamConfig] = None,
    kitti_tracking_sequence: Optional[int] = None,
    use_live_stereo: bool = False,
    frame_offset: int = 0,
    with_instances: bool = True,
    with_evaluation: bool = False,
    csv_out_dir: Optional[str] = None,
    min_detection_size_px: Optional[int] = None,
    baseline_m: Optional[float] = None,
    use_ground_truth_poses: bool = False,
    use_prefetch: bool = False,
) -> Tuple[DynSlam, Input]:
    """Build a fully wired pipeline for a KITTI-layout sequence."""
    config = config or DynSlamConfig()
    config, icfg, live_scale, calib = _resolve_dataset(
        dataset_root, config, kitti_tracking_sequence, baseline_m
    )
    intr = config.intrinsics
    stereo_calib = config.calibration

    # depth provider
    if use_live_stereo:
        depth_provider = StereoMatcherDepthProvider(
            config.stereo, config.min_depth_m, config.max_depth_m
        )
    else:
        depth_provider = PrecomputedDepthProvider(
            os.path.join(dataset_root, icfg.depth_folder),
            icfg.depth_fname_format,
            input_is_depth=icfg.read_depth,
            min_depth_m=config.min_depth_m,
            max_depth_m=config.max_depth_m,
        )

    input_ = Input(
        dataset_root, icfg, depth_provider,
        (config.frame_width, config.frame_height), stereo_calib,
        frame_offset, live_scale,
    )
    if use_prefetch:
        from dynslam_tpu.io.prefetch import PrefetchingInput

        input_ = PrefetchingInput(
            input_,
            prefetch_seg_folder=(
                os.path.join(dataset_root, icfg.segmentation_folder)
                if config.dynamic_mode else None
            ),
        )

    # map engine
    engine = MapEngine(engine_config_from(config), config.decay, intr)

    # sparse scene flow / VO
    sf_provider = SparseSFProvider(
        (intr.fx, intr.cx, intr.cy), stereo_calib, config.vo
    )

    # segmentation + instances
    seg_provider = None
    instance_reconstructor = None
    if config.dynamic_mode:
        seg_provider = PrecomputedSegmentationProvider(
            os.path.join(dataset_root, icfg.segmentation_folder),
            frame_offset, live_scale,
            min_detection_size_px=(
                min_detection_size_px
                if min_detection_size_px is not None
                else config.tracker.min_detection_size_px
            ),
        )
        if with_instances:
            from dynslam_tpu.instances.reconstructor import InstanceReconstructor

            instance_reconstructor = InstanceReconstructor(config)

    evaluation = None
    if with_evaluation:
        from dynslam_tpu.eval.evaluation import Evaluation

        evaluation = Evaluation(
            dataset_root, icfg, input_, calib, config,
            csv_out_dir=csv_out_dir or os.path.join(dataset_root, "csv"),
        )

    gt_poses = None
    if use_ground_truth_poses:
        from dynslam_tpu.io.calib import read_kitti_poses

        gt_path = os.path.join(dataset_root, icfg.odometry_fname)
        gt_poses = read_kitti_poses(gt_path)
        if frame_offset:
            gt_poses = gt_poses[frame_offset:]

    dyn = DynSlam(
        config,
        engine,
        segmentation_provider=seg_provider,
        sparse_sf_provider=sf_provider,
        instance_reconstructor=instance_reconstructor,
        evaluation=evaluation,
        ground_truth_poses=gt_poses,
    )
    return dyn, input_


def build_fused(
    dataset_root: str,
    config: Optional[DynSlamConfig] = None,
    kitti_tracking_sequence: Optional[int] = None,
    frame_offset: int = 0,
    min_detection_size_px: Optional[int] = None,
    baseline_m: Optional[float] = None,
    use_prefetch: bool = False,
    with_evaluation: bool = False,
    csv_out_dir: Optional[str] = None,
):
    """Build the FUSED single-dispatch pipeline for a KITTI-layout
    sequence: FusedPipeline (static) or FusedDynamicPipeline (dynamic
    mode) — the bench/perf configuration, runnable from the app. The
    fused steps run the census matcher in-graph, so Input carries a
    zero-cost InGraphDepthProvider; segmentation still comes from the
    precomputed MNC dumps (dynamic mode).

    `with_evaluation` attaches a FusedEvaluation (deferred-fetch LIDAR
    eval + memory CSV, eval/fused_eval.py) as `pipe.evaluation` — the
    dynamic pipeline drives it internally; the static pipeline's caller
    submits each frame's outputs (main.run_fused).

    Returns (pipeline, input, seg_provider_or_None).
    """
    config = config or DynSlamConfig()
    config, icfg, live_scale, calib = _resolve_dataset(
        dataset_root, config, kitti_tracking_sequence, baseline_m
    )
    stereo_calib = config.calibration

    from dynslam_tpu.io.depth_providers import InGraphDepthProvider

    input_ = Input(
        dataset_root, icfg, InGraphDepthProvider(
            config.min_depth_m, config.max_depth_m
        ),
        (config.frame_width, config.frame_height), stereo_calib,
        frame_offset, live_scale,
    )
    if use_prefetch:
        from dynslam_tpu.io.prefetch import PrefetchingInput

        input_ = PrefetchingInput(
            input_,
            prefetch_seg_folder=(
                os.path.join(dataset_root, icfg.segmentation_folder)
                if config.dynamic_mode else None
            ),
        )

    seg_provider = None
    if config.dynamic_mode:
        seg_provider = PrecomputedSegmentationProvider(
            os.path.join(dataset_root, icfg.segmentation_folder),
            frame_offset, live_scale,
            min_detection_size_px=(
                min_detection_size_px
                if min_detection_size_px is not None
                else config.tracker.min_detection_size_px
            ),
        )
        from dynslam_tpu.pipeline.fused_dynamic import FusedDynamicPipeline

        pipe = FusedDynamicPipeline(config, stereo_calib)
    else:
        from dynslam_tpu.pipeline.fused import FusedPipeline
        from dynslam_tpu.pipeline.mapping import engine_config_from

        pipe = FusedPipeline(
            engine_config_from(config), config.stereo, config.vo,
            config.decay, stereo_calib,
        )
    pipe.evaluation = None
    if with_evaluation:
        from dynslam_tpu.eval.fused_eval import FusedEvaluation

        pipe.evaluation = FusedEvaluation(
            dataset_root, icfg, input_, calib, config,
            csv_out_dir=csv_out_dir or os.path.join(dataset_root, "csv"),
        )
    return pipe, input_, seg_provider
