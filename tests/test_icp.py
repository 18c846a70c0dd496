"""ICP depth tracker (trackingController->Track equivalent): pose
recovery against a raycast reference, and the external_odometry=False
pipeline mode."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from dynslam_tpu.config import Intrinsics, StereoCalibration
from dynslam_tpu.io.synthetic import (SyntheticScene, render_frame,
                                      write_kitti_sequence)
from dynslam_tpu.ops import icp, tsdf
from dynslam_tpu.utils import se3

W, H = 200, 120
INTR = Intrinsics(160.0, 160.0, W / 2.0, H / 2.0)


def _cfg():
    return tsdf.TsdfConfig(
        pool_capacity=8192, local_dims=(64, 32, 64), max_new_blocks=4096,
        max_visible_blocks=4096, voxel_size=0.06, mu=0.3,
        raycast_coarse_steps=24, raycast_fine_steps=20,
        width=W, height=H, fx=INTR.fx, fy=INTR.fy, cx=INTR.cx, cy=INTR.cy,
    )


def _depth_at(scene, c2w, frame=0):
    fr = render_frame(scene, c2w, INTR, W, H, frame=frame)
    d = fr["depth_m"].astype(np.float32)
    return np.where((d > 0.5) & (d < 19.0), d, 0.0)


def test_icp_recovers_small_motion():
    scene = SyntheticScene.default_scene(seed=5)
    cfg = _cfg()
    eye = np.eye(4, dtype=np.float32)

    # fuse two frames at identity, raycast = the reference
    state = tsdf.create_state(cfg)
    rgb = jnp.zeros((H, W, 3), jnp.uint8)
    for t in range(2):
        depth = jnp.asarray(_depth_at(scene, eye))
        origin = tsdf.compute_origin(cfg, jnp.asarray(eye))
        grid = tsdf.build_local_grid(cfg, state, origin)
        state, grid, _ = tsdf.allocate(cfg, state, grid, origin, depth,
                                       jnp.asarray(eye), jnp.int32(t))
        slots, mask = tsdf.visible_blocks(cfg, state, grid, origin,
                                          jnp.asarray(eye))
        state = tsdf.integrate(cfg, state, slots, mask, rgb, depth,
                               jnp.asarray(eye), jnp.int32(t))
    intr = jnp.asarray([cfg.fx, cfg.fy, cfg.cx, cfg.cy], jnp.float32)
    rc = tsdf.raycast(cfg, state, grid, origin, jnp.asarray(eye), intr)

    # true camera motion: forward 0.2 m + 0.5 degree yaw (inter-frame
    # step; in the pipeline ICP additionally gets a motion seed)
    gt_c2w = np.eye(4, dtype=np.float32)
    gt_c2w[:3, :3] = np.asarray(se3.so3_exp(jnp.asarray([0.0, 0.0087, 0.0])))
    gt_c2w[:3, 3] = [0.02, 0.0, 0.20]
    gt_w2c = np.linalg.inv(gt_c2w)
    depth_cur = jnp.asarray(_depth_at(scene, gt_c2w))

    res = icp.icp_track(
        depth_cur, rc.points, rc.hit,
        jnp.asarray(eye), jnp.asarray(eye), intr,
    )
    assert bool(res.success), (int(res.num_inliers), float(res.mean_residual))
    got = np.asarray(res.world_to_cam)
    t_err = np.linalg.norm(got[:3, 3] - gt_w2c[:3, 3])
    r_err = float(se3.rotation_angle(jnp.asarray(got[:3, :3]
                                                 @ gt_w2c[:3, :3].T)))
    # accuracy floor: the raycast surface carries ~half-voxel (0.03 m)
    # reconstruction bias that ICP faithfully locks onto
    assert t_err < 0.06, f"translation error {t_err:.4f} m"
    assert r_err < 0.01, f"rotation error {r_err:.5f} rad"


def test_pipeline_icp_mode(tmp_path):
    """external_odometry=False: the engine's depth tracker drives the pose
    chain (DynSlam.cpp:89-100 alternative path)."""
    from dynslam_tpu.io.calib import read_kitti_poses
    from dynslam_tpu.pipeline.builder import build_dynslam
    from tests.test_pipeline import small_config

    root = str(tmp_path / "seq")
    write_kitti_sequence(root, num_frames=6, width=160, height=96)
    cfg = dataclasses.replace(small_config(), external_odometry=False)
    dyn, inp = build_dynslam(root, cfg, with_instances=False)
    while dyn.process_frame(inp):
        pass
    gt = read_kitti_poses(root + "/ground-truth-poses.txt")
    errs = []
    for k in range(6):
        est_c2w = np.linalg.inv(dyn.pose_history[k + 1])
        errs.append(np.linalg.norm(est_c2w[:3, 3] - gt[k][:3, 3]))
    rmse = float(np.sqrt(np.mean(np.square(errs))))
    assert rmse < 0.08, f"ICP-mode trajectory RMSE {rmse:.3f} m"


def test_fused_icp_fallback_recovers_motion():
    """VERDICT r3 item 5: on VO failure the fused step's delta comes from
    ICP against the previous model render (not a blind coast). Unit-level
    check of pipeline/fused.py's motion_with_icp_fallback."""
    from types import SimpleNamespace

    from dynslam_tpu.ops.egomotion import MotionEstimate
    from dynslam_tpu.pipeline.fused import motion_with_icp_fallback

    scene = SyntheticScene.default_scene(seed=5)
    cfg = _cfg()
    eye = np.eye(4, dtype=np.float32)
    state = tsdf.create_state(cfg)
    rgb = jnp.zeros((H, W, 3), jnp.uint8)
    for t in range(2):
        depth = jnp.asarray(_depth_at(scene, eye))
        origin = tsdf.compute_origin(cfg, jnp.asarray(eye))
        grid = tsdf.build_local_grid(cfg, state, origin)
        state, grid, _ = tsdf.allocate(cfg, state, grid, origin, depth,
                                       jnp.asarray(eye), jnp.int32(t))
        slots, mask = tsdf.visible_blocks(cfg, state, grid, origin,
                                          jnp.asarray(eye))
        state = tsdf.integrate(cfg, state, slots, mask, rgb, depth,
                               jnp.asarray(eye), jnp.int32(t))
    intr = jnp.asarray([cfg.fx, cfg.fy, cfg.cx, cfg.cy], jnp.float32)
    rc = tsdf.raycast(cfg, state, grid, origin, jnp.asarray(eye), intr)

    gt_c2w = np.eye(4, dtype=np.float32)
    gt_c2w[:3, 3] = [0.02, 0.0, 0.20]
    cur_depth = jnp.asarray(_depth_at(scene, gt_c2w))

    carry = SimpleNamespace(
        prev_rc_points=rc.points,
        prev_rc_hit=rc.hit,
        pose_w2c=jnp.eye(4, dtype=jnp.float32),
        held_motion=jnp.eye(4, dtype=jnp.float32),  # deliberately wrong
    )
    est_failed = MotionEstimate(
        tr=jnp.zeros(6), matrix=jnp.eye(4),
        inliers=jnp.zeros(cur_depth.size, bool),
        num_inliers=jnp.int32(0), success=jnp.bool_(False),
    )
    delta = np.asarray(
        motion_with_icp_fallback(est_failed, carry, cur_depth, intr)
    )
    gt_delta = np.linalg.inv(gt_c2w)  # w2c of the new frame @ old c2w (= I)
    # a blind coast on held_motion (identity) would err by the full 0.2 m
    assert np.linalg.norm(delta[:3, 3] - gt_delta[:3, 3]) < 0.05
    # and on VO success the estimator's matrix passes straight through
    est_ok = est_failed._replace(
        success=jnp.bool_(True), matrix=jnp.asarray(gt_delta)
    )
    delta_ok = np.asarray(
        motion_with_icp_fallback(est_ok, carry, cur_depth, intr)
    )
    np.testing.assert_allclose(delta_ok, gt_delta, atol=1e-6)
