"""Direct photometric alignment tests (reference component parity: the
Direct/ module, shipped disabled; here functional but equally unwired)."""

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
