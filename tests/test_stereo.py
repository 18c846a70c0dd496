"""Stereo matcher tests against synthetic ground truth (BASELINE config 1
analogue: disparity parity on a rendered stereo pair)."""

import numpy as np
import pytest

from dynslam_tpu.config import Intrinsics, StereoCalibration, StereoMatcherParams
from dynslam_tpu.io.synthetic import SyntheticScene, render_stereo_frame, to_uint8_rgb
from dynslam_tpu.ops.stereo import census_transform, compute_disparity

W, H = 160, 120


@pytest.fixture(scope="module")
def stereo_pair():
    scene = SyntheticScene.default_scene(seed=3)
    intr = Intrinsics(130.0, 130.0, W / 2, H / 2)
    calib = StereoCalibration(0.35, 130.0)
    fr = render_stereo_frame(scene, np.eye(4), intr, calib, W, H)
    return fr


class TestCensus:
    def test_shape_and_determinism(self, rng):
        import jax.numpy as jnp

        g = jnp.asarray(rng.uniform(0, 255, (32, 40)).astype(np.float32))
        c = census_transform(g, 3)
        assert c.shape == (2, 32, 40)
        np.testing.assert_array_equal(np.asarray(c), np.asarray(census_transform(g, 3)))

    def test_flat_region_zero_signature(self):
        import jax.numpy as jnp

        g = jnp.full((16, 16), 100.0)
        c = np.asarray(census_transform(g, 2))
        # interior: all equal -> no "darker" bits
        assert (c[:, 4:-4, 4:-4] == 0).all()


class TestDisparity:
    def test_accuracy_vs_ground_truth(self, stereo_pair):
        params = StereoMatcherParams(max_disparity=64)
        left = to_uint8_rgb(stereo_pair["left_gray"])
        right = to_uint8_rgb(stereo_pair["right_gray"])
        disp = np.asarray(compute_disparity(left, right, params))
        gt = stereo_pair["disparity"]

        both = (disp > 0) & (gt > 0) & (gt < 60)
        # coverage: at least half the valid-GT pixels matched
        assert both.sum() / ((gt > 0) & (gt < 60)).sum() > 0.5
        err = np.abs(disp[both] - gt[both])
        # sub-pixel median accuracy, few outliers (KITTI-style 3px)
        assert np.median(err) < 0.7
        assert (err > 3.0).mean() < 0.12

    def test_invalid_left_border(self, stereo_pair):
        params = StereoMatcherParams(max_disparity=48)
        disp = np.asarray(
            compute_disparity(
                stereo_pair["left_gray"], stereo_pair["right_gray"], params
            )
        )
        # disparity never exceeds search range or column index
        cols = np.arange(W)[None, :].repeat(H, 0)
        nz = disp > 0
        assert (disp[nz] <= cols[nz] + 0.5).all()
        assert disp.max() < 48

    def test_textureless_sky_invalid(self):
        # uniform images: everything should be rejected, not hallucinated
        left = np.full((64, 96), 120, np.uint8)
        right = np.full((64, 96), 120, np.uint8)
        disp = np.asarray(compute_disparity(left, right, StereoMatcherParams(max_disparity=32)))
        assert (disp == 0).mean() > 0.95


class TestGapFill:
    def test_fill_disparity_gaps(self):
        import jax.numpy as jnp

        from dynslam_tpu.ops.stereo import fill_disparity_gaps

        d = np.zeros((4, 64), np.float32)
        d[0, 10] = 20.0
        d[0, 15] = 12.0   # 4-px gap between -> fill with min(20, 12) = 12
        d[1, 10] = 8.0    # then invalid to the right edge (53 px) -> stays
        d[2, :] = 0.0     # fully invalid row stays invalid
        d[3, 20] = 5.0
        d[3, 50] = 7.0    # 29-px gap > max_gap -> stays invalid
        out = np.asarray(fill_disparity_gaps(jnp.asarray(d), 8))
        assert (out[0, 11:15] == 12.0).all()
        assert out[0, 10] == 20.0 and out[0, 15] == 12.0
        assert (out[0, :10] == 0).all() and (out[0, 16:] == 0).all()
        assert (out[1, 11:] == 0).all()
        assert (out[2] == 0).all()
        assert (out[3, 21:50] == 0).all()

    def test_fill_improves_density_not_accuracy(self, stereo_pair):
        """On the synthetic pair, gap-filling must raise coverage without
        degrading median accuracy."""
        import dataclasses

        left = to_uint8_rgb(stereo_pair["left_gray"])
        right = to_uint8_rgb(stereo_pair["right_gray"])
        gt = stereo_pair["disparity"]
        params = StereoMatcherParams(max_disparity=64)
        d0 = np.asarray(compute_disparity(left, right, params))
        pf = dataclasses.replace(params, fill_gaps=16)
        d1 = np.asarray(compute_disparity(left, right, pf))
        assert (d1 > 0).mean() > (d0 > 0).mean()
        m = (d1 > 0) & (gt > 0)
        err = np.abs(d1 - gt)[m]
        assert np.median(err) < 1.0
