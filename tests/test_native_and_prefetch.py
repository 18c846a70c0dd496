"""Native fastio parity tests + prefetching input equivalence."""

import numpy as np
import pytest

from dynslam_tpu.io.synthetic import write_kitti_sequence

fastio = pytest.importorskip("dynslam_tpu.native.fastio")


class TestFastIO:
    def test_mask_parity_with_numpy(self, tmp_path, rng):
        mask = (rng.random((64, 80)) > 0.4).astype(np.uint8)
        p = str(tmp_path / "m.txt")
        np.savetxt(p, mask, fmt="%.18e")
        out = fastio.read_text_mask(p, 64, 80)
        np.testing.assert_array_equal(out, mask)

    def test_mask_integer_format(self, tmp_path, rng):
        mask = (rng.random((8, 10)) > 0.5).astype(np.uint8)
        p = str(tmp_path / "m.txt")
        np.savetxt(p, mask, fmt="%d")
        np.testing.assert_array_equal(fastio.read_text_mask(p, 8, 10), mask)

    def test_mask_shape_mismatch_raises(self, tmp_path):
        p = str(tmp_path / "m.txt")
        np.savetxt(p, np.ones((4, 4)), fmt="%d")
        with pytest.raises(ValueError, match="expected 5x5"):
            fastio.read_text_mask(p, 5, 5)

    def test_mask_garbage_raises(self, tmp_path):
        p = tmp_path / "m.txt"
        p.write_text("1 0 hello 1\n")
        with pytest.raises(ValueError, match="bad token"):
            fastio.read_text_mask(str(p), 2, 2)

    def test_pfm_parity(self, tmp_path, rng):
        from dynslam_tpu.utils.pfm import write_pfm

        img = rng.normal(size=(37, 53)).astype(np.float32)
        p = str(tmp_path / "x.pfm")
        write_pfm(p, img)
        np.testing.assert_array_equal(fastio.read_pfm(p), img)

    def test_pfm_big_endian(self, tmp_path, rng):
        img = rng.normal(size=(6, 9)).astype(np.float32)
        p = str(tmp_path / "be.pfm")
        with open(p, "wb") as f:
            f.write(b"Pf\n9 6\n1.0\n")  # positive scale = big endian
            np.flipud(img).astype(">f4").tofile(f)
        np.testing.assert_array_equal(fastio.read_pfm(p), img)

    def test_velodyne_parity(self, tmp_path, rng):
        pts = rng.normal(size=(1000, 4)).astype(np.float32)
        p = str(tmp_path / "v.bin")
        pts.tofile(p)
        np.testing.assert_array_equal(fastio.read_velodyne(p), pts)

    def test_velodyne_corrupt(self, tmp_path):
        p = tmp_path / "v.bin"
        p.write_bytes(b"\x00" * 13)
        with pytest.raises(ValueError, match="corrupt"):
            fastio.read_velodyne(str(p))

    def test_missing_file(self):
        with pytest.raises(FileNotFoundError):
            fastio.read_text_mask("/nonexistent/m.txt", 2, 2)


class TestPrefetchingInput:
    def test_equivalent_to_plain_input(self, tmp_path):
        from dynslam_tpu.config import StereoCalibration
        from dynslam_tpu.io import (
            Input, PrecomputedDepthProvider, kitti_odometry_config,
            read_kitti_calibration,
        )
        from dynslam_tpu.io.prefetch import PrefetchingInput

        root = str(tmp_path / "seq")
        write_kitti_sequence(root, num_frames=4, width=96, height=64)
        cfg = kitti_odometry_config()
        calib = read_kitti_calibration(root + "/calib.txt")
        sc = calib.stereo_calibration()

        def make():
            prov = PrecomputedDepthProvider(
                root + "/" + cfg.depth_folder, cfg.depth_fname_format,
                input_is_depth=True,
            )
            return Input(root, cfg, prov, (96, 64), sc)

        plain = make()
        pre = PrefetchingInput(make())
        n = 0
        while plain.has_more_images():
            assert pre.has_more_images()
            assert plain.read_next_frame() and pre.read_next_frame()
            rgb_a, d_a = plain.get_images()
            rgb_b, d_b = pre.get_images()
            np.testing.assert_array_equal(rgb_a, rgb_b)
            np.testing.assert_array_equal(d_a, d_b)
            n += 1
        assert n == 4
        assert not pre.has_more_images()
        pre.close()
