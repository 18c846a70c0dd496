"""Direct photometric alignment tests (reference component parity: the
Direct/ module, shipped disabled; here wired behind --direct_refinement
on the staged path, off by default like the reference)."""

import numpy as np
import jax.numpy as jnp
import pytest

from dynslam_tpu.config import Intrinsics, StereoCalibration
from dynslam_tpu.io.synthetic import SyntheticScene, render_frame
from dynslam_tpu.ops.direct_align import refine_pose
from dynslam_tpu.utils import se3

W, H = 128, 96
INTR = Intrinsics(110.0, 110.0, W / 2, H / 2)


def _frames(T_rel):
    """Render ref at identity and target at pose T_rel (cam-to-world)."""
    scene = SyntheticScene.default_scene(seed=9)
    ref = render_frame(scene, np.eye(4), INTR, W, H)
    tgt = render_frame(scene, np.linalg.inv(T_rel), INTR, W, H)
    depth = np.where((ref["depth_m"] > 0.5) & (ref["depth_m"] < 19),
                     ref["depth_m"], 0.0)
    return ref["gray"] * 255, depth, tgt["gray"] * 255


class TestDirectAlign:
    @pytest.mark.slow
    def test_recovers_small_motion(self):
        # T_target<-ref: camera moved 10 cm forward + small yaw
        xi_gt = np.array([0.0, 0.01, 0.0, 0.02, 0.0, -0.10])
        T_gt = np.asarray(se3.exp_se3(jnp.asarray(xi_gt)))
        # _frames(T) renders the target so that T_target<-ref == T
        ref_g, ref_d, tgt_g = _frames(T_gt)
        res = refine_pose(ref_g, ref_d, tgt_g, INTR.as_tuple())
        t_err = np.linalg.norm(np.asarray(res.T)[:3, 3] - T_gt[:3, 3])
        assert t_err < 0.03, f"translation error {t_err}"
        assert float(res.valid_fraction) > 0.3

    def test_identity_stays_identity(self):
        ref_g, ref_d, _ = _frames(np.eye(4))
        res = refine_pose(ref_g, ref_d, ref_g, INTR.as_tuple())
        np.testing.assert_allclose(np.asarray(res.T), np.eye(4), atol=5e-3)
        assert float(res.residual_rms) < 2.0

    def test_warm_start_improves(self):
        xi_gt = np.array([0.0, 0.0, 0.0, 0.0, 0.0, -0.25])
        T_gt = np.asarray(se3.exp_se3(jnp.asarray(xi_gt)))
        ref_g, ref_d, tgt_g = _frames(T_gt)
        cold = refine_pose(ref_g, ref_d, tgt_g, INTR.as_tuple())
        warm = refine_pose(ref_g, ref_d, tgt_g, INTR.as_tuple(),
                           T_init=T_gt * 1.0)
        assert float(warm.residual_rms) <= float(cold.residual_rms) + 1e-3


class TestDirectRefinementWiring:
    """--direct_refinement: the staged InstanceReconstructor refines a
    track's object motion (T_cur<-prev) from its consecutive instance
    views (the reference's commented-out Direct/ call sites,
    InstanceReconstructor.cpp:460-566)."""

    def test_refines_track_motion(self):
        from dynslam_tpu.config import Intrinsics, tiny_test_config
        from dynslam_tpu.instances.reconstructor import InstanceReconstructor
        from dynslam_tpu.instances.track import Track, TrackFrame

        cfg = tiny_test_config(W, H).replace(
            use_direct_refinement=True,
            intrinsics=Intrinsics(INTR.fx, INTR.fy, INTR.cx, INTR.cy),
        )
        rec = InstanceReconstructor(cfg)

        # "object" views: two renders related by a known motion (the
        # object's virtual-camera delta in the track convention,
        # track.py:18-22). Full-frame masks: this pins the WIRING and
        # pose conventions; alignment quality on hard-bordered cut views
        # is the regime where even the reference found the module does
        # not help (Direct/README.md:7).
        xi_gt = np.array([0.0, 0.005, 0.0, 0.01, 0.0, -0.08])
        T_gt = np.asarray(se3.exp_se3(jnp.asarray(xi_gt)), np.float32)
        ref_g, ref_d, tgt_g = _frames(T_gt)
        box = np.ones((H, W), bool)
        mk = lambda g, d: (
            np.repeat(np.where(box, g, 0.0)[..., None], 3, -1
                      ).astype(np.uint8),
            np.where(box, d, 0.0).astype(np.float32),
        )
        ref_rgb, ref_dm = mk(ref_g, ref_d)
        tgt_rgb, _ = mk(tgt_g, ref_d)

        track = Track(0, cfg.tracker)
        f0 = TrackFrame(frame_idx=1, detection=None,
                        masked_flow=np.zeros((0, 8), np.float32),
                        camera_pose=np.eye(4, dtype=np.float32),
                        instance_rgb=ref_rgb, instance_depth_m=ref_dm)
        # perturbed initial estimate: 5 cm off along x
        T0 = T_gt.copy()
        T0[0, 3] += 0.05
        f1 = TrackFrame(frame_idx=2, detection=None,
                        masked_flow=np.zeros((0, 8), np.float32),
                        camera_pose=np.eye(4, dtype=np.float32),
                        instance_rgb=tgt_rgb, instance_depth_m=ref_dm,
                        relative_pose=T0)
        track.add_frame(f0)
        track.add_frame(f1)

        err_before = np.linalg.norm(T0[:3, 3] - T_gt[:3, 3])
        rec._direct_refine_motion(track, 1)
        assert rec.direct_refinements == 1
        T1 = f1.relative_pose
        err_after = np.linalg.norm(T1[:3, 3] - T_gt[:3, 3])
        assert np.all(np.isfinite(T1))
        assert err_after < err_before, (
            f"refinement made it worse: {err_before} -> {err_after}"
        )
        assert f1.relative_pose_tr is not None and \
            np.all(np.isfinite(f1.relative_pose_tr))

    def test_disabled_by_default(self):
        from dynslam_tpu.config import DynSlamConfig

        assert DynSlamConfig().use_direct_refinement is False
