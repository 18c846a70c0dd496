"""Tests for feature detection, circular matching, and RANSAC egomotion
(BASELINE config 2 analogue: trajectory error vs ground truth)."""

import numpy as np
import jax.numpy as jnp
import pytest

from dynslam_tpu.config import (
    Intrinsics,
    StereoCalibration,
    VisualOdometryParams,
)
from dynslam_tpu.io.synthetic import (
    SyntheticScene,
    render_stereo_frame,
    straight_trajectory,
)
from dynslam_tpu.ops import features as feat_ops
from dynslam_tpu.pipeline.sparse_sf import SparseSFProvider
from dynslam_tpu.utils import se3

W, H = 160, 120
INTR = Intrinsics(130.0, 130.0, W / 2, H / 2)
CALIB = StereoCalibration(0.35, 130.0)
PARAMS = VisualOdometryParams(
    max_candidates=1024, max_matches=512, ransac_iters=60, max_disparity=64
)


def _render_seq(n, with_dynamic=False, speed=0.3, yaw_rate=0.004):
    scene = SyntheticScene.default_scene(seed=5, with_dynamic=with_dynamic)
    poses = straight_trajectory(n, speed=speed, yaw_rate=yaw_rate)
    frames = [
        render_stereo_frame(scene, poses[i], INTR, CALIB, W, H, frame=i)
        for i in range(n)
    ]
    return frames, poses


def _to_u8(g):
    return np.clip(g * 255, 0, 255).astype(np.float32)


class TestDetection:
    def test_detects_blobs_and_corners(self):
        img = np.full((96, 128), 100.0, np.float32)
        # bright blob
        img[30:33, 40:43] = 220.0
        # checkerboard corner
        img[60:70, 80:90] = 180.0
        img[50:60, 90:100] = 180.0
        feats = feat_ops.detect_features(jnp.asarray(img), PARAMS)
        pos = np.asarray(feats.pos)[np.asarray(feats.valid)]
        assert len(pos) >= 2
        d_blob = np.abs(pos - [41, 31]).sum(1).min()
        d_corner = np.abs(pos - [90, 60]).sum(1).min()
        assert d_blob <= 3
        assert d_corner <= 3

    def test_flat_image_no_features(self):
        feats = feat_ops.detect_features(jnp.full((96, 128), 77.0), PARAMS)
        assert np.asarray(feats.valid).sum() == 0

    def test_border_margin(self):
        frames, _ = _render_seq(1)
        feats = feat_ops.detect_features(
            jnp.asarray(_to_u8(frames[0]["left_gray"])), PARAMS
        )
        pos = np.asarray(feats.pos)[np.asarray(feats.valid)]
        assert (pos[:, 0] >= 4.5).all() and (pos[:, 0] < W - 4.5).all()
        assert (pos[:, 1] >= 4.5).all() and (pos[:, 1] < H - 4.5).all()


class TestCircularMatch:
    def test_match_count_and_disparity_sign(self):
        frames, _ = _render_seq(2)
        f = lambda img: feat_ops.detect_features(jnp.asarray(_to_u8(img)), PARAMS)
        flow, valid = feat_ops.circular_match(
            f(frames[1]["left_gray"]), f(frames[1]["right_gray"]),
            f(frames[0]["left_gray"]), f(frames[0]["right_gray"]),
            PARAMS,
        )
        flow, valid = np.asarray(flow), np.asarray(valid)
        m = flow[valid]
        assert len(m) >= 30
        # disparities positive in both frames
        assert (m[:, 0] - m[:, 2] > 0).all()
        assert (m[:, 4] - m[:, 6] > 0).all()

    def test_matched_disparity_close_to_gt(self):
        frames, _ = _render_seq(2)
        f = lambda img: feat_ops.detect_features(jnp.asarray(_to_u8(img)), PARAMS)
        flow, valid = feat_ops.circular_match(
            f(frames[1]["left_gray"]), f(frames[1]["right_gray"]),
            f(frames[0]["left_gray"]), f(frames[0]["right_gray"]),
            PARAMS,
        )
        m = np.asarray(flow)[np.asarray(valid)]
        gt_disp = frames[1]["disparity"]
        errs = []
        for row in m:
            u, v = int(round(row[0])), int(round(row[1]))
            if gt_disp[v, u] > 0:
                errs.append(abs((row[0] - row[2]) - gt_disp[v, u]))
        assert np.median(errs) < 1.5


class TestEgomotion:
    def test_two_frame_motion(self):
        frames, poses = _render_seq(2)
        prov = SparseSFProvider((INTR.fx, INTR.cx, INTR.cy), CALIB, PARAMS)
        prov.compute_sparse_sf(_to_u8(frames[0]["left_gray"]),
                               _to_u8(frames[0]["right_gray"]))
        assert not prov.flow_available()
        prov.compute_sparse_sf(_to_u8(frames[1]["left_gray"]),
                               _to_u8(frames[1]["right_gray"]))
        assert prov.flow_available() and prov.motion_available()
        delta = prov.get_latest_motion()
        # GT: T_cur<-prev in camera coords = inv(cam2world_cur) @ cam2world_prev
        gt = np.linalg.inv(poses[1]) @ poses[0]
        t_err = np.linalg.norm(delta[:3, 3] - gt[:3, 3])
        r_err = np.asarray(
            se3.rotation_angle(jnp.asarray(delta[:3, :3] @ gt[:3, :3].T))
        )
        assert t_err < 0.04  # 4 cm on a 30 cm step
        assert r_err < 0.01  # ~0.6 deg

    def test_trajectory_rmse(self):
        """Integrate 10 frames of VO; translation RMSE vs GT must stay small
        (scaled-down BASELINE config 2)."""
        n = 10
        frames, poses = _render_seq(n, speed=0.25, yaw_rate=0.01)
        prov = SparseSFProvider((INTR.fx, INTR.cx, INTR.cy), CALIB, PARAMS)
        est_pose = np.eye(4)  # world-to-cam chain like the reference
        est_traj = [np.eye(4)]
        for i in range(n):
            prov.compute_sparse_sf(_to_u8(frames[i]["left_gray"]),
                                   _to_u8(frames[i]["right_gray"]))
            if i > 0:
                est_pose = prov.get_latest_motion() @ est_pose
                est_traj.append(est_pose.copy())
        errs = []
        for i in range(n):
            gt_w2c = np.linalg.inv(poses[i])
            # camera center error: |inv(est)[:3,3] - pose[:3,3]|
            errs.append(
                np.linalg.norm(np.linalg.inv(est_traj[i])[:3, 3] - poses[i][:3, 3])
            )
        rmse = np.sqrt(np.mean(np.square(errs)))
        # ~2%/frame scale drift is the floor at this tiny focal length
        # (f=130 px); KITTI geometry (f=707) is ~5x more favorable
        assert rmse < 0.15, f"trajectory RMSE too high: {rmse}"

    def test_extract_motion_subset_and_degenerate(self):
        frames, poses = _render_seq(2)
        prov = SparseSFProvider((INTR.fx, INTR.cx, INTR.cy), CALIB, PARAMS)
        for i in range(2):
            prov.compute_sparse_sf(_to_u8(frames[i]["left_gray"]),
                                   _to_u8(frames[i]["right_gray"]))
        matches = prov.get_flow().matches
        assert len(matches) >= 30
        tr = prov.extract_motion(matches[:30])
        assert tr is not None and tr.shape == (6,)
        T = np.asarray(se3.twist_to_transform(jnp.asarray(tr)))
        gt = np.linalg.inv(poses[1]) @ poses[0]
        assert np.linalg.norm(T[:3, 3] - gt[:3, 3]) < 0.06
        # degenerate: too few matches
        assert prov.extract_motion(matches[:4]) is None

    def test_static_camera_identity(self):
        frames, _ = _render_seq(1)
        prov = SparseSFProvider((INTR.fx, INTR.cx, INTR.cy), CALIB, PARAMS)
        g = (_to_u8(frames[0]["left_gray"]), _to_u8(frames[0]["right_gray"]))
        prov.compute_sparse_sf(*g)
        prov.compute_sparse_sf(*g)
        delta = prov.get_latest_motion()
        np.testing.assert_allclose(delta, np.eye(4), atol=5e-3)


def test_detect_pair_matches_single():
    """The batched L/R detection must be numerically identical to two
    single-image calls (it is the same trace, vmapped)."""
    import jax.numpy as jnp

    from dynslam_tpu.config import VisualOdometryParams
    from dynslam_tpu.ops import features as feat_ops

    rng = np.random.default_rng(9)
    lg = jnp.asarray(rng.uniform(0, 255, (96, 160)), jnp.float32)
    rg = jnp.asarray(rng.uniform(0, 255, (96, 160)), jnp.float32)
    params = VisualOdometryParams(max_candidates=256)
    pl_, pr_ = feat_ops.detect_features_pair(lg, rg, params)
    sl = feat_ops.detect_features(lg, params)
    sr = feat_ops.detect_features(rg, params)
    for a, b in ((pl_, sl), (pr_, sr)):
        np.testing.assert_allclose(np.asarray(a.pos), np.asarray(b.pos),
                                   rtol=0, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(a.valid),
                                      np.asarray(b.valid))
        np.testing.assert_allclose(np.asarray(a.desc), np.asarray(b.desc),
                                   rtol=0, atol=1e-4)


def test_descriptor_windows_match_gathers():
    """The gather-free descriptor path (row-slab windows + one-hot MXU
    contraction + static offset slice) must reproduce per-sample clipped
    gathers exactly on valid lanes, and zero invalid lanes. Features with
    a subpixel offset near +-0.5 are skipped only in the cross-check
    (rounding pos back is ambiguous there; the internal integer peak is
    what both paths sample at)."""
    import jax.numpy as jnp

    from dynslam_tpu.config import VisualOdometryParams
    from dynslam_tpu.ops import features as feat_ops

    rng = np.random.default_rng(31)
    h, w = 120, 200
    g = jnp.asarray(rng.uniform(0, 255, (h, w)), jnp.float32)
    f = feat_ops.detect_features(g, VisualOdometryParams(max_candidates=512))
    sob = np.asarray(
        feat_ops._conv2d(g, np.stack([feat_ops._SOBEL_X, feat_ops._SOBEL_Y]))
    )
    pos = np.asarray(f.pos)
    valid = np.asarray(f.valid)
    desc = np.asarray(f.desc)
    # unambiguous integer peak recovery: subpixel offset well inside +-0.5
    fr = pos - np.round(pos)
    sure = valid & (np.abs(fr) < 0.45).all(axis=1)
    assert sure.sum() > 50
    xi = np.round(pos[sure, 0]).astype(int)
    yi = np.round(pos[sure, 1]).astype(int)
    feats = []
    for dy, dx in feat_ops._DESC_OFFSETS:
        yy = np.clip(yi + dy, 0, h - 1)
        xx = np.clip(xi + dx, 0, w - 1)
        feats.append(sob[0, yy, xx])
        feats.append(sob[1, yy, xx])
    ref = np.stack(feats, -1)
    np.testing.assert_allclose(desc[sure], ref, rtol=0, atol=1e-3)
    if (~valid).any():
        assert np.abs(desc[~valid]).max() == 0.0
