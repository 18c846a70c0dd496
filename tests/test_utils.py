"""Tests for SE(3), PFM IO, timers, and CSV records."""

import numpy as np
import jax.numpy as jnp
import pytest

from dynslam_tpu.config import VoxelDecayParams
from dynslam_tpu.eval import (
    CsvWriter,
    DepthEvaluation,
    DepthFrameEvaluation,
    DepthResult,
    MemoryUsageEntry,
)
from dynslam_tpu.eval.records import base_csv_name
from dynslam_tpu.utils import se3, timers
from dynslam_tpu.utils.pfm import read_pfm, write_pfm


class TestSE3:
    def test_exp_log_so3_roundtrip(self, rng):
        for _ in range(10):
            w = jnp.asarray(rng.normal(size=3) * 0.5)
            R = se3.exp_so3(w)
            np.testing.assert_allclose(np.asarray(se3.log_so3(R)), w, atol=2e-4)

    def test_exp_so3_orthonormal(self, rng):
        w = jnp.asarray(rng.normal(size=3))
        R = np.asarray(se3.exp_so3(w))
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-6)
        assert np.linalg.det(R) == pytest.approx(1.0, abs=1e-6)

    def test_exp_log_se3_roundtrip(self, rng):
        xi = jnp.asarray(rng.normal(size=6) * 0.3)
        T = se3.exp_se3(xi)
        np.testing.assert_allclose(np.asarray(se3.log_se3(T)), xi, atol=2e-4)

    def test_small_angle(self):
        xi = jnp.asarray([1e-9, 0.0, 0.0, 1.0, 2.0, 3.0])
        T = np.asarray(se3.exp_se3(xi))
        np.testing.assert_allclose(T[:3, 3], [1.0, 2.0, 3.0], atol=1e-6)
        np.testing.assert_allclose(T[:3, :3], np.eye(3), atol=1e-6)

    def test_inverse(self, rng):
        T = se3.exp_se3(jnp.asarray(rng.normal(size=6)))
        np.testing.assert_allclose(
            np.asarray(se3.inverse(T) @ T), np.eye(4), atol=1e-5
        )

    def test_twist_to_transform_identity(self):
        T = np.asarray(se3.twist_to_transform(jnp.zeros(6)))
        np.testing.assert_allclose(T, np.eye(4), atol=1e-7)

    def test_project_backproject(self, rng):
        fx, fy, cx, cy = 500.0, 510.0, 320.0, 240.0
        pts = np.abs(rng.normal(size=(50, 3))) + np.array([0, 0, 2.0])
        u, v, z = se3.project(jnp.asarray(pts), fx, fy, cx, cy)
        back = se3.backproject(u, v, z, fx, fy, cx, cy)
        np.testing.assert_allclose(np.asarray(back), pts, rtol=1e-5)

    def test_transform_points(self, rng):
        T = se3.exp_se3(jnp.asarray(rng.normal(size=6) * 0.2))
        pts = jnp.asarray(rng.normal(size=(17, 3)))
        out = se3.transform_points(T, pts)
        expect = np.asarray(pts) @ np.asarray(T)[:3, :3].T + np.asarray(T)[:3, 3]
        np.testing.assert_allclose(np.asarray(out), expect, atol=1e-5)

    def test_coerce_projects_to_so3(self, rng):
        T = np.eye(4)
        T[:3, :3] = np.eye(3) + rng.normal(size=(3, 3)) * 0.05
        R = np.asarray(se3.coerce(jnp.asarray(T)))[:3, :3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)


class TestPFM:
    def test_roundtrip_gray(self, tmp_path, rng):
        img = rng.normal(size=(37, 53)).astype(np.float32)
        path = str(tmp_path / "x.pfm")
        write_pfm(path, img)
        np.testing.assert_array_equal(read_pfm(path), img)

    def test_roundtrip_rgb(self, tmp_path, rng):
        img = rng.normal(size=(16, 24, 3)).astype(np.float32)
        path = str(tmp_path / "x.pfm")
        write_pfm(path, img)
        np.testing.assert_array_equal(read_pfm(path), img)

    def test_rejects_garbage(self, tmp_path):
        path = tmp_path / "bad.pfm"
        path.write_bytes(b"P6\n1 1\n255\n\x00\x00\x00")
        with pytest.raises(ValueError):
            read_pfm(str(path))


class TestTimers:
    def test_tic_toc(self):
        t = timers.Timers()
        t.tic("stage")
        ms = t.toc("stage")
        assert ms >= 0.0
        assert t.count("stage") == 1

    def test_nested_stack(self):
        t = timers.Timers()
        t.tic("outer")
        t.tic("inner")
        t.toc()  # pops inner
        t.toc("outer")
        assert set(t.names()) == {"outer", "inner"}
        assert "outer" in t.report()


class TestRecords:
    def test_depth_result_invariant(self):
        with pytest.raises(AssertionError):
            DepthResult(10, 1, 1, 1, 0)

    def test_csv_schema(self, tmp_path):
        r = DepthResult(100, 10, 20, 70, 15)
        ev = DepthEvaluation(3.0, r, r, kitti_style=True)
        frame = DepthFrameEvaluation(7, "odo-06", 20.0, [ev])
        path = str(tmp_path / "out.csv")
        w = CsvWriter(path)
        w.write(frame)
        w.write(frame)
        w.close()
        lines = open(path).read().strip().split("\n")
        assert len(lines) == 3
        assert lines[0].startswith("frame,fusion-total-3.00-kitti,")
        assert lines[1] == "7,100,10,20,70,15,100,10,20,70,15"

    def test_memory_entry(self):
        e = MemoryUsageEntry(3, 1024, 512, VoxelDecayParams(True, 200, 1))
        assert e.get_data() == "3,1024,512,1,200,1"
        assert e.get_header().startswith("frame_id,memory_usage_bytes")

    def test_base_csv_name_matches_reference_format(self):
        name = base_csv_name(
            max_decay_weight=1,
            dataset_id="kitti-odometry-06",
            frame_offset=0,
            depth_provider_name="precomputed-elas",
            voxel_size_meters=0.05,
            max_depth_meters=20.0,
            is_dynamic=True,
            direct_refinement=False,
            use_depth_weighting=False,
        )
        assert name == (
            "csv/k-1-kitti-odometry-06-offset-0-depth-precomputed-elas"
            "-voxelsize-0.0500-max-depth-m-20.00-dynamic-mode-NO-direct-ref"
            "-NO-fusion-weights"
        )

    def test_correct_pixel_ratio(self):
        r = DepthResult(100, 10, 20, 70, 15)
        assert r.correct_pixel_ratio(True) == pytest.approx(0.70)
        assert r.correct_pixel_ratio(False) == pytest.approx(70 / 80)
