"""The fused single-dispatch frame step must match the staged
MapEngine + SparseSFProvider path (same ops, one trace) — pins that
pipeline/fused.py is a dispatch-count optimization, not a fork of the
pipeline's semantics."""

import jax.numpy as jnp
import numpy as np
import pytest

from dynslam_tpu.config import (
    DynSlamConfig, Intrinsics, MapParams, SceneParams, StereoCalibration,
    StereoMatcherParams, VisualOdometryParams, VoxelDecayParams,
)
from dynslam_tpu.io.synthetic import (
    SyntheticScene, render_stereo_frame, straight_trajectory,
)
from dynslam_tpu.ops import depth as depth_ops
from dynslam_tpu.ops import stereo as stereo_ops
from dynslam_tpu.pipeline.fused import FusedPipeline
from dynslam_tpu.pipeline.mapping import MapEngine, engine_config_from
from dynslam_tpu.pipeline.sparse_sf import SparseSFProvider

W, H = 192, 96
N_FRAMES = 4


@pytest.fixture(scope="module")
def setup():
    intr = Intrinsics(160.0, 160.0, W / 2.0, H / 2.0)
    calib = StereoCalibration(0.5, 160.0)
    cfg = DynSlamConfig(
        frame_width=W, frame_height=H, intrinsics=intr, calibration=calib,
        dynamic_mode=False,
        scene=SceneParams(voxel_size_m=0.08, mu_m=0.32),
        map=MapParams(pool_capacity=16384, local_dims=(80, 32, 80),
                      max_new_blocks_per_frame=4096),
        vo=VisualOdometryParams(max_candidates=1024, max_matches=512,
                                ransac_iters=60, max_disparity=64),
        stereo=StereoMatcherParams(max_disparity=64),
        decay=VoxelDecayParams(enabled=True, min_decay_age=200,
                               max_decay_weight=1),
    )
    scene = SyntheticScene.default_scene(seed=3)
    poses = straight_trajectory(N_FRAMES, speed=0.5, yaw_rate=0.004)
    frames = []
    for i in range(N_FRAMES):
        fr = render_stereo_frame(scene, poses[i], intr, calib, W, H, frame=i)
        lg = np.clip(fr["left_gray"] * 255, 0, 255).astype(np.float32)
        rg = np.clip(fr["right_gray"] * 255, 0, 255).astype(np.float32)
        frames.append((lg, rg))
    return cfg, intr, calib, frames


def run_staged(cfg, intr, calib, frames):
    """The bench.py staged loop, verbatim semantics."""
    engine = MapEngine(engine_config_from(cfg), cfg.decay, intr,
                       use_pallas_fusion=False, use_pallas_raycast=False)
    sf = SparseSFProvider((intr.fx, intr.cx, intr.cy), calib, cfg.vo)
    pose = jnp.eye(4, dtype=jnp.float32)
    poses, raycasts = [], []
    for i, (lg, rg) in enumerate(frames):
        lg = jnp.asarray(lg)
        rg = jnp.asarray(rg)
        disp = stereo_ops.compute_disparity_jit(lg, rg, cfg.stereo)
        depth_m = depth_ops.depth_m_from_mm(
            depth_ops.depth_mm_from_disparity(disp, calib.bf)
        )
        rgb = jnp.broadcast_to(
            jnp.clip(lg, 0, 255).astype(jnp.uint8)[..., None], (H, W, 3)
        )
        sf.compute_sparse_sf(lg, rg)
        pose = sf.get_latest_motion_device() @ pose
        engine.set_pose(pose)
        engine.set_view_device(rgb, depth_m)
        if i > 0:
            engine.integrate()
            engine.prepare_next_step()
            engine.decay()
            poses.append(np.asarray(pose))
            raycasts.append(engine.get_raycast())
        else:
            engine.frame_idx += 1
    return poses, raycasts, engine


def test_fused_matches_staged(setup):
    cfg, intr, calib, frames = setup
    staged_poses, staged_rc, engine = run_staged(cfg, intr, calib, frames)

    fused = FusedPipeline(
        engine_config_from(cfg), cfg.stereo, cfg.vo, cfg.decay, calib,
        use_pallas=False,
    )
    fused_poses, fused_rc = [], []
    for i, (lg, rg) in enumerate(frames):
        fused.process_frame(lg, rg)
        if i > 0:
            fused_poses.append(fused.get_pose())
            fused_rc.append(fused.get_raycast())

    for sp, fp in zip(staged_poses, fused_poses):
        np.testing.assert_allclose(fp, sp, atol=1e-5)
    # depth maps: same kernels, same order -> near-bitwise agreement
    for src, frc in zip(staged_rc, fused_rc):
        np.testing.assert_allclose(
            np.asarray(frc.depth), np.asarray(src.depth), atol=1e-4
        )
        hit_s = np.asarray(src.hit)
        hit_f = np.asarray(frc.hit)
        assert (hit_s == hit_f).mean() > 0.999

    # telemetry parity
    assert fused.get_used_block_count() == engine.get_used_block_count()
    assert fused.get_dropped_allocation_count() == \
        engine.get_dropped_allocation_count()


def test_fused_maps_scene(setup):
    """Sanity: the fused map actually reconstructs the synthetic scene."""
    cfg, intr, calib, frames = setup
    fused = FusedPipeline(
        engine_config_from(cfg), cfg.stereo, cfg.vo, cfg.decay, calib,
        use_pallas=False,
    )
    for lg, rg in frames:
        fused.process_frame(lg, rg)
    assert fused.get_used_block_count() > 50
    d = np.asarray(fused.get_raycast().depth)
    assert (d > 0).mean() > 0.2
    assert bool(fused.last_outputs.vo_success)
