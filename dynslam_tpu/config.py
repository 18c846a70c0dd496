"""Configuration dataclasses for the whole framework.

Mirrors the reference's configuration surface — the ~20 gflags
(`src/DynSLAM/DynSLAMGUI.cpp:26-72`), `ITMLibSettings` fields
(`src/DynSLAM/InfiniTamDriver.*`), viso2 parameters
(`src/DynSLAM/DynSLAMGUI.cpp:1234-1251`), and the instance-volume constants
(`src/DynSLAM/InstRecLib/InstanceReconstructor.cpp:365-401`) — as frozen
dataclasses, plus TPU-specific capacity knobs (pool sizes, local-grid dims)
that replace CUDA allocation parameters.

Everything here is static configuration: values feed jitted functions as
Python constants, so two configs with different capacities compile to
different executables (static shapes, per XLA semantics).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Tuple


@dataclass(frozen=True)
class StereoCalibration:
    """Stereo rig geometry. Ref: DepthProvider.h:22-28.

    The reference hardcodes the KITTI baseline 0.537150654273 m
    (DynSLAMGUI.cpp:1185) and takes focal length from calib P2.
    """

    baseline_m: float = 0.537150654273
    focal_length_px: float = 707.0912

    @property
    def bf(self) -> float:
        """baseline * focal — converts disparity(px) <-> depth(m)."""
        return self.baseline_m * self.focal_length_px


@dataclass(frozen=True)
class Intrinsics:
    """Pinhole intrinsics (fx, fy, cx, cy) in pixels."""

    fx: float = 707.0912
    fy: float = 707.0912
    cx: float = 601.8873
    cy: float = 183.1104

    def as_tuple(self) -> Tuple[float, float, float, float]:
        return (self.fx, self.fy, self.cx, self.cy)

    def scaled(self, s: float) -> "Intrinsics":
        return Intrinsics(self.fx * s, self.fy * s, self.cx * s, self.cy * s)


@dataclass(frozen=True)
class SceneParams:
    """TSDF scene parameters. Ref: ITMLibSettings::sceneParams usage
    (InstanceReconstructor.cpp:372-379; static voxel size 0.05 per the
    `voxelsize-0.0500` CSV naming, DynSLAMGUI.cpp:1264).
    """

    voxel_size_m: float = 0.05
    #: truncation band in meters (ITM `mu`)
    mu_m: float = 0.30
    #: max accumulated fusion weight per voxel (ITM `maxW`)
    max_weight: int = 100
    #: depth range accepted for fusion (Input.h:71-72: [0.5, 20] m)
    view_frustum_min_m: float = 0.5
    view_frustum_max_m: float = 20.0

    @property
    def block_size_m(self) -> float:
        return self.voxel_size_m * VOXEL_BLOCK_SIZE


#: Voxels per block edge (ITM SDF_BLOCK_SIZE). 8**3 = 512 voxels/block
#: (InfiniTamDriver.h:237-250).
VOXEL_BLOCK_SIZE = 8
VOXEL_BLOCK_SIZE3 = VOXEL_BLOCK_SIZE ** 3


@dataclass(frozen=True)
class VoxelDecayParams:
    """Voxel garbage-collection ("decay") parameters.
    Ref: VoxelDecayParams.h:6-17, defaults DynSLAMGUI.cpp:36-42.
    """

    enabled: bool = True
    min_decay_age: int = 200
    max_decay_weight: int = 1


@dataclass(frozen=True)
class MapParams:
    """TPU map-engine capacities (replaces CUDA alloc params such as
    ITMLibSettings::sdfLocalBlockNum). All static for XLA."""

    #: total voxel-block pool capacity (global map, grows monotonically
    #: between decay reclaims)
    pool_capacity: int = 2 ** 17  # 131072 blocks = 67M voxels
    #: frustum-local dense block-index cache dims (x, y, z), in blocks.
    #: Covers local_dims * block_size meters around the camera; replaces
    #: InfiniTAM's voxel hash for both fusion and raycast lookups.
    local_dims: Tuple[int, int, int] = (160, 48, 160)
    #: max freshly allocated blocks per frame
    max_new_blocks_per_frame: int = 8192
    #: max blocks fused per frame (frustum-visible set cap)
    max_visible_blocks: int = 16384
    #: fusion weight ~ 1/depth ("depth weighting", InfiniTamDriver.h:100,138)
    use_depth_weighting: bool = False
    #: DF-guided coarse steps and near-surface fine steps in the raycaster
    raycast_coarse_steps: int = 16
    raycast_fine_steps: int = 14


@dataclass(frozen=True)
class InstanceMapParams:
    """Per-object volume parameters.
    Ref: InstanceReconstructor.cpp:365-401 — voxel 0.035 m, mu 1.0,
    sdfLocalBlockNum = 5*5*10/voxelSize; we use a batched pool with a
    fixed object axis instead of one engine per track.
    """

    voxel_size_m: float = 0.035
    mu_m: float = 1.0
    max_weight: int = 100
    #: max simultaneously reconstructed objects (object axis of the pool)
    max_objects: int = 8
    #: fused-pipeline mask slots per frame (silhouette cut/remove + object
    #: RANSAC capacity). The reference processes EVERY detection
    #: (InstanceReconstructor.cpp:765-800); busy KITTI tracking frames
    #: exceed 8 possibly-dynamic detections, so this defaults above
    #: max_objects. Hard ceiling 32 (uint32 mask bit-planes; uint8/16
    #: kept when K allows — narrower planes shrink the per-frame mask
    #: upload); overflow is counted + logged, never silent
    #: (largest-first priority).
    max_detections: int = 16
    #: block capacity per object (cars are mostly surface; 5x5x10 m bound)
    blocks_per_object: int = 2048
    #: dense local grid per object, in blocks; the volume frame is the
    #: camera frame at first observation, so the window must reach the
    #: object's position: 64x24x80 blocks = ~17.9x6.7x22.4 m at 0.035
    local_dims: Tuple[int, int, int] = (64, 24, 80)
    max_new_blocks_per_frame: int = 1024
    raycast_coarse_steps: int = 20
    raycast_fine_steps: int = 16
    #: fused-pipeline per-object fusion window (rows, cols), clamped to
    #: the frame. Cut-out views are zero outside the object mask, so
    #: fusing from a bbox-centred crop allocates the identical block set
    #: and fuses identical voxels up to float rounding of borderline
    #: pixels whenever the mask fits the crop (4-aligned origins keep
    #: the stride-4 allocation phase) at a fraction of the full-frame
    #: fusion cost. Masks whose bbox EXCEEDS the crop take the
    #: full-frame fallback executable (below) for that frame.
    fusion_crop: Tuple[int, int] = (256, 512)
    #: oversized masks (bbox > fusion_crop): True = fuse the full masked
    #: frame through a separate fallback dispatch (reference parity —
    #: the reference always fuses the full view,
    #: InstanceReconstructor.cpp:569-700); False = fuse the truncated
    #: crop, with the lost pixels counted, logged, and CSV'd.
    oversize_mask_fallback: bool = True


@dataclass(frozen=True)
class VisualOdometryParams:
    """Sparse scene-flow / egomotion parameters — the libviso2 equivalents.
    Ref: DynSLAMGUI.cpp:1234-1251 (nms_n=3, multi_stage, refinement,
    ransac_iters=500, inlier 2.0 px, bucket max 15).
    """

    nms_radius: int = 3
    #: features kept per bucket (viso2 bucket.max_features=15)
    bucket_max_features: int = 15
    bucket_width: int = 50
    bucket_height: int = 50
    #: max matched features carried through the pipeline (static shape)
    max_matches: int = 2048
    #: subpixel refinement runs on at most this many (compacted) valid
    #: matches — typical circular-match survival is well below it, so
    #: this halves the LK gather volume with no accuracy change
    refine_cap: int = 1024
    #: max detected corners per image before bucketing
    max_candidates: int = 2048
    ransac_iters: int = 500
    inlier_threshold_px: float = 2.0
    gn_iters: int = 8
    #: Tukey-biweight IRLS rounds after the initial inlier-weighted GN
    #: (rejects heavy-tailed inlier-set matches that bias forward scale)
    irls_rounds: int = 8
    #: Tukey scale in pixels (residual norm over the 4 stacked components)
    tukey_c_px: float = 0.5
    #: half-window of the feature descriptor patch
    descriptor_radius: int = 5
    #: stereo match: max disparity searched, epipolar band half-height
    max_disparity: int = 192
    epipolar_band_px: float = 1.5
    #: temporal match search radius in px
    flow_radius_px: float = 100.0


@dataclass(frozen=True)
class StereoMatcherParams:
    """Dense disparity (ELAS/DispNet replacement) — census cost-volume
    semi-dense matcher parameters."""

    max_disparity: int = 128
    census_radius: int = 3
    aggregation_radius: int = 2
    #: left-right consistency max difference in px
    lr_max_diff: float = 1.5
    #: uniqueness ratio: best cost must beat runner-up by this factor
    uniqueness: float = 0.95
    subpixel: bool = True
    #: ELAS-role gap interpolation: horizontal invalid runs up to this
    #: many px are filled with the background (smaller) flanking
    #: disparity; 0 disables (libelas's support triangulation makes its
    #: maps near-dense — the raw census matcher leaves holes)
    fill_gaps: int = 0


@dataclass(frozen=True)
class TrackerParams:
    """Instance tracker + track state machine constants.
    Ref: InstanceTracker.h:21-26, Track.h:88-98, Track.cpp:167-209.
    """

    score_threshold: float = 0.10
    inactive_frame_threshold: int = 50
    #: min masked scene-flow vectors to attempt motion estimation
    min_flow_vectors: int = 18
    #: RANSAC iterations for per-OBJECT motion (the fused dynamic step
    #: runs one estimator per mask slot every frame; object flow sets are
    #: small, so fewer hypotheses than camera egomotion suffice)
    object_ransac_iters: int = 200
    #: Tukey-IRLS rounds for per-OBJECT motion. The camera estimator's 8
    #: rounds exist to kill forward-scale drift over long pose chains;
    #: object twists feed the per-frame track state machine and are not
    #: chained, and the reference's object ExtractMotion is plain viso2
    #: L2 with no IRLS at all (VisoSparseSFProvider.cpp:70-82) — 2
    #: redescending rounds keep clean-data estimates identical while
    #: bounding the serial GN chain the fused step runs per mask slot
    object_irls_rounds: int = 2
    #: final-refine GN steps for per-OBJECT motion (same argument as
    #: object_irls_rounds: the estimate is warm-started from the best
    #: RANSAC hypothesis and consumed per-frame, so half the camera's
    #: refinement depth converges on the tiny per-mask match sets while
    #: halving the serial GN chain per mask slot)
    object_gn_iters: int = 4
    trans_error_threshold_low: float = 0.030
    trans_error_threshold_high: float = 0.550
    max_uncertain_frames_static: int = 5
    max_uncertain_frames_dynamic: int = 1
    #: detections smaller than this many px on a side are dropped
    #: (PrecomputedSegmentationProvider.cpp:92)
    min_detection_size_px: int = 45
    #: mask rescale factors (PrecomputedSegmentationProvider.cpp:21-26)
    copy_mask_scale: float = 1.0
    delete_mask_scale: float = 1.2
    conservative_mask_scale: float = 0.97


@dataclass(frozen=True)
class EvaluationParams:
    """LIDAR depth-evaluation protocol. Ref: Evaluation.cpp:105-127."""

    enabled: bool = True
    semantic_evaluation: bool = True
    evaluation_delay: int = 0
    #: delta_max sweep: 0.5 then 1..12 px, plus KITTI-style (3px AND 5%)
    delta_maxes: Tuple[float, ...] = (0.5, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12)
    kitti_style: bool = True
    min_depth_m: float = 0.5
    max_depth_m: float = 20.0


@dataclass(frozen=True)
class DynSlamConfig:
    """Top-level pipeline configuration (the gflags surface,
    DynSLAMGUI.cpp:26-72)."""

    frame_width: int = 1242
    frame_height: int = 375
    calibration: StereoCalibration = field(default_factory=StereoCalibration)
    intrinsics: Intrinsics = field(default_factory=Intrinsics)
    right_intrinsics: Intrinsics = field(default_factory=Intrinsics)

    scene: SceneParams = field(default_factory=SceneParams)
    decay: VoxelDecayParams = field(default_factory=VoxelDecayParams)
    map: MapParams = field(default_factory=MapParams)
    instance_map: InstanceMapParams = field(default_factory=InstanceMapParams)
    vo: VisualOdometryParams = field(default_factory=VisualOdometryParams)
    stereo: StereoMatcherParams = field(default_factory=StereoMatcherParams)
    tracker: TrackerParams = field(default_factory=TrackerParams)
    evaluation: EvaluationParams = field(default_factory=EvaluationParams)

    #: enable separate reconstruction of dynamic objects (dynamic_mode flag)
    dynamic_mode: bool = True
    #: reconstruct all recognized cars, moving or parked (always_separate)
    always_reconstruct_objects: bool = True
    #: fuse/segment only every k-th frame (DynSlam.h:308-318)
    fusion_every: int = 1
    #: use external (scene-flow) odometry instead of ICP (DynSlam.cpp:89-100)
    external_odometry: bool = True
    #: 5-pass bilateral depth filter before fusion (the reference's
    #: settings->useBilateralFilter, InfiniTamDriver.cpp:222)
    use_bilateral_filter: bool = False
    #: depth provider clamps: 0 = invalid (DepthProvider.h:94-137)
    min_depth_m: float = 0.5
    max_depth_m: float = 20.0
    use_dispnet: bool = False
    #: image downscale factor for low-res experiments (scale flag)
    scale: float = 1.0
    #: staged-path per-object direct (photometric) motion refinement
    #: (ops/direct_align.py). The reference ships the equivalent module
    #: disabled with its call sites commented out
    #: (InstanceReconstructor.cpp:460-566) and reports it does not
    #: improve pose estimates (Direct/README.md:7); off by default here
    #: for the same reason, wired behind --direct_refinement.
    use_direct_refinement: bool = False

    def replace(self, **kw) -> "DynSlamConfig":
        return dataclasses.replace(self, **kw)


def tiny_test_config(width: int = 128, height: int = 96) -> DynSlamConfig:
    """Small config for CPU unit tests: tiny frames, tiny pools, scaled
    intrinsics. Keeps compile times low on the 8-device virtual CPU mesh."""
    intr = Intrinsics(fx=100.0, fy=100.0, cx=width / 2.0, cy=height / 2.0)
    return DynSlamConfig(
        frame_width=width,
        frame_height=height,
        calibration=StereoCalibration(baseline_m=0.5, focal_length_px=100.0),
        intrinsics=intr,
        right_intrinsics=intr,
        scene=SceneParams(voxel_size_m=0.05, mu_m=0.3, view_frustum_max_m=20.0),
        map=MapParams(
            pool_capacity=4096,
            local_dims=(48, 32, 48),
            max_new_blocks_per_frame=2048,
        ),
        instance_map=InstanceMapParams(
            max_objects=4,
            blocks_per_object=256,
            local_dims=(16, 12, 20),
            max_new_blocks_per_frame=256,
        ),
        vo=VisualOdometryParams(
            max_matches=512,
            max_candidates=1024,
            ransac_iters=100,
            max_disparity=48,
        ),
        stereo=StereoMatcherParams(max_disparity=32),
    )
