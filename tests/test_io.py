"""Tests for the dataset IO layer: synthetic KITTI sequences read back
through Input, calib parsing, depth providers, velodyne, tracklets,
segmentation dumps."""

import numpy as np
import pytest

from dynslam_tpu.config import Intrinsics, StereoCalibration
from dynslam_tpu.io import (
    Input,
    PrecomputedDepthProvider,
    VelodyneIO,
    kitti_odometry_config,
    kitti_odometry_dispnet_config,
    kitti_tracking_config,
    read_kitti_calibration,
    read_kitti_poses,
)
from dynslam_tpu.io.segmentation import (
    BoundingBox,
    Mask,
    PrecomputedSegmentationProvider,
    build_masks,
)
from dynslam_tpu.io.synthetic import (
    SyntheticScene,
    render_stereo_frame,
    straight_trajectory,
    write_kitti_sequence,
)
from dynslam_tpu.io.tracklets import read_grouped_tracklets
from dynslam_tpu.ops.depth import depth_mm_from_disparity

W, H = 128, 96


@pytest.fixture(scope="module")
def seq_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("kitti_synth")
    write_kitti_sequence(
        str(root), num_frames=4, width=W, height=H,
        with_dynamic=True, write_dispnet=True,
    )
    return str(root)


class TestSyntheticRendering:
    def test_stereo_consistency(self):
        """Left/right images must be photo-consistent: warping right by GT
        disparity reproduces left where depth is smooth."""
        scene = SyntheticScene.default_scene()
        intr = Intrinsics(100.0, 100.0, W / 2, H / 2)
        calib = StereoCalibration(0.5, 100.0)
        fr = render_stereo_frame(scene, np.eye(4), intr, calib, W, H)
        d = fr["disparity"]
        valid = d > 0
        # sample interior pixels, warp
        errs = []
        for v in range(10, H - 10, 7):
            for u in range(40, W - 10, 5):
                if not valid[v, u]:
                    continue
                ur = u - d[v, u]
                if ur < 1 or ur >= W - 1:
                    continue
                u0 = int(np.floor(ur))
                a = ur - u0
                rv = (1 - a) * fr["right_gray"][v, u0] + a * fr["right_gray"][v, u0 + 1]
                errs.append(abs(rv - fr["left_gray"][v, u]))
        errs = np.array(errs)
        # median photometric error small (occlusion edges excluded by median)
        assert np.median(errs) < 0.08

    def test_depth_range(self):
        scene = SyntheticScene.default_scene()
        intr = Intrinsics(100.0, 100.0, W / 2, H / 2)
        fr = render_stereo_frame(
            scene, np.eye(4), intr, StereoCalibration(0.5, 100.0), W, H
        )
        d = fr["depth_m"]
        assert (d[d > 0] > 0.1).all()
        # ground plane must be visible in lower half
        assert (d[H - 5, :] > 0).sum() > W // 2


class TestCalib:
    def test_roundtrip(self, seq_root):
        calib = read_kitti_calibration(seq_root + "/calib.txt")
        assert calib.proj_left_color[0, 0] == pytest.approx(0.8 * W)
        sc = calib.stereo_calibration()
        assert sc.baseline_m == pytest.approx(0.5, abs=1e-6)
        intr = calib.left_color_intrinsics
        assert intr.cx == pytest.approx(W / 2)
        # velo->cam is a rigid transform
        R = calib.velo_to_left_cam[:3, :3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-9)

    def test_poses(self, seq_root):
        poses = read_kitti_poses(seq_root + "/ground-truth-poses.txt")
        assert poses.shape == (4, 4, 4)
        np.testing.assert_allclose(poses[0], np.eye(4), atol=1e-9)
        # forward motion along +z
        assert poses[1][2, 3] > 0.2

    def test_missing_projection_raises(self, tmp_path):
        p = tmp_path / "calib.txt"
        p.write_text("P0: " + " ".join(["1"] * 12) + "\n")
        with pytest.raises(ValueError, match="missing P1"):
            read_kitti_calibration(str(p))


class TestInput:
    def test_read_sequence_elas_xml(self, seq_root):
        cfg = kitti_odometry_config()
        calib = read_kitti_calibration(seq_root + "/calib.txt")
        sc = calib.stereo_calibration()
        provider = PrecomputedDepthProvider(
            seq_root + "/" + cfg.depth_folder, cfg.depth_fname_format,
            input_is_depth=cfg.read_depth,
        )
        inp = Input(seq_root, cfg, provider, (W, H), sc)
        assert inp.has_more_images()
        assert inp.read_next_frame()
        rgb, depth = inp.get_images()
        assert rgb.shape == (H, W, 3) and rgb.dtype == np.uint8
        assert depth.shape == (H, W) and depth.dtype == np.int16
        # depth values are mm in [500, 20000] or 0
        nz = depth[depth != 0]
        assert nz.min() >= 500 and nz.max() <= 20000
        assert inp.current_frame == 1

    def test_read_sequence_dispnet_pfm(self, seq_root):
        cfg = kitti_odometry_dispnet_config()
        calib = read_kitti_calibration(seq_root + "/calib.txt")
        sc = calib.stereo_calibration()
        provider = PrecomputedDepthProvider(
            seq_root + "/" + cfg.depth_folder, cfg.depth_fname_format,
            input_is_depth=cfg.read_depth,
        )
        inp = Input(seq_root, cfg, provider, (W, H), sc)
        assert inp.read_next_frame()
        _, depth_pfm = inp.get_images()

        # PFM disparity -> depth must agree with the XML mm depth dump
        cfg2 = kitti_odometry_config()
        provider2 = PrecomputedDepthProvider(
            seq_root + "/" + cfg2.depth_folder, cfg2.depth_fname_format,
            input_is_depth=True,
        )
        depth_xml = provider2.get_depth(0, sc)
        both = (depth_pfm != 0) & (depth_xml != 0)
        assert both.mean() > 0.5
        diff = np.abs(depth_pfm[both].astype(int) - depth_xml[both].astype(int))
        assert np.percentile(diff, 95) <= 1  # 1 mm rounding tolerance

    def test_random_access_matches_streaming(self, seq_root):
        cfg = kitti_odometry_config()
        calib = read_kitti_calibration(seq_root + "/calib.txt")
        sc = calib.stereo_calibration()
        provider = PrecomputedDepthProvider(
            seq_root + "/" + cfg.depth_folder, cfg.depth_fname_format,
            input_is_depth=True,
        )
        inp = Input(seq_root, cfg, provider, (W, H), sc)
        inp.read_next_frame()
        inp.read_next_frame()
        rgb_stream, depth_stream = inp.get_images()
        rgb_rand, depth_rand = inp.get_frame_images(1)
        np.testing.assert_array_equal(rgb_stream, rgb_rand)
        np.testing.assert_array_equal(depth_stream, depth_rand)

    def test_has_more_images_end(self, seq_root):
        cfg = kitti_odometry_config()
        inp = Input(seq_root, cfg, None, (W, H), StereoCalibration(), frame_offset=4)
        assert not inp.has_more_images()

    def test_tracking_preset_paths(self):
        cfg = kitti_tracking_config(2)
        assert cfg.left_color_folder == "image_02/0002/"
        assert cfg.calibration_fname == "calib/0002.txt"
        assert cfg.tracklet_folder == "label_02/0002.txt"


class TestDepthConversion:
    def test_disparity_to_depth_semantics(self):
        bf = 0.5 * 100.0  # 50 m*px
        disp = np.array([[0.0, 2.5, 100.0, 1.0, 1e-6]], dtype=np.float32)
        out = np.asarray(depth_mm_from_disparity(disp, bf))
        assert out[0, 0] == 0  # zero disparity -> invalid
        assert out[0, 1] == 20000  # 50/2.5 = 20 m = max -> kept
        assert out[0, 2] == 500  # 0.5 m = min -> kept
        assert out[0, 3] == 0  # 50 m > max -> invalid
        assert out[0, 4] == 0  # sub-epsilon disparity -> invalid

    def test_out_of_range_max_depth_raises(self):
        p = PrecomputedDepthProvider("/nonexistent", "%06d.pfm", False,
                                     max_depth_m=40.0)
        with pytest.raises(RuntimeError, match="int16"):
            p.depth_from_disparity_map(np.ones((4, 4), np.float32),
                                       StereoCalibration())


class TestVelodyne:
    def test_read_frame(self, seq_root):
        vio = VelodyneIO(seq_root + "/velodyne")
        assert vio.frame_available(0)
        assert not vio.frame_available(99)
        pts = vio.read_frame(0)
        assert pts.shape[1] == 4 and pts.dtype == np.float32
        assert len(pts) > 100
        # KITTI velodyne: x forward — most sampled points in front
        assert (pts[:, 0] > 0).mean() > 0.9

    def test_corrupt_raises(self, tmp_path):
        p = tmp_path / "000000.bin"
        p.write_bytes(b"\x00" * 13)
        with pytest.raises(ValueError, match="corrupt"):
            VelodyneIO(str(tmp_path)).read_frame(0)


class TestTracklets:
    def test_parse(self, tmp_path):
        p = tmp_path / "0000.txt"
        p.write_text(
            "0 1 Car 0 0 -1.57 100 150 300 250 1.5 1.7 4.2 2.0 1.6 15.0 -1.2\n"
            "0 2 Pedestrian 0 1 0.0 10 20 30 60 1.8 0.6 0.9 -3.0 1.6 8.0 0.5\n"
            "1 1 Car 0 0 -1.5 110 150 310 250 1.5 1.7 4.2 2.1 1.6 15.5 -1.2\n"
        )
        grouped = read_grouped_tracklets(str(p), cars_only=True)
        assert set(grouped) == {0, 1}
        assert len(grouped[0]) == 1  # pedestrian filtered
        t = grouped[0][0]
        assert t.track_id == 1 and t.type == "Car"
        assert t.location_cam_m[2] == pytest.approx(15.0)
        grouped_all = read_grouped_tracklets(str(p), cars_only=False)
        assert len(grouped_all[0]) == 2


class TestSegmentation:
    def test_bbox_iou(self):
        a = BoundingBox(0, 0, 9, 9)
        b = BoundingBox(5, 5, 14, 14)
        assert a.iou(b) == pytest.approx(25.0 / 175.0)
        assert a.iou(BoundingBox(20, 20, 30, 30)) == 0.0

    def test_mask_rescale_grows_bbox(self):
        bbox = BoundingBox(10, 10, 29, 29)
        m = Mask(bbox, np.ones((20, 20), np.uint8))
        m.rescale(1.2)
        assert m.bbox.width == 24 and m.bbox.height == 24
        assert m.bbox.x0 == 8  # 10 - floor(4/2)
        assert m.data.shape == (24, 24)

    def test_build_masks_small_bbox_extra_growth(self):
        bbox = BoundingBox(0, 0, 49, 49)  # 2500 < 2025*1.375
        cm, dm, km = build_masks(bbox, np.ones((50, 50), np.uint8), min_area=45 * 45)
        assert dm.bbox.width == int(50 * 1.2 * 1.2)
        assert km.bbox.width == int(50 * 0.97)
        assert cm.bbox.width == 50

    def test_read_mnc_dumps(self, seq_root):
        prov = PrecomputedSegmentationProvider(seq_root + "/seg_image_2/mnc", min_detection_size_px=8)
        result = prov.segment_frame(None)
        assert len(result.instance_detections) == 1
        det = result.instance_detections[0]
        assert det.class_name == "car"
        assert det.is_reconstructable() and det.is_possibly_dynamic()
        assert det.class_probability == pytest.approx(0.98)
        # delete mask strictly contains copy mask footprint
        assert det.delete_mask.bbox.area >= det.copy_mask.bbox.area

    def test_full_frame_rasterization(self, seq_root):
        prov = PrecomputedSegmentationProvider(seq_root + "/seg_image_2/mnc", min_detection_size_px=8)
        det = prov.segment_frame(None).instance_detections[0]
        full = det.copy_mask.to_full_frame(H, W)
        assert full.shape == (H, W)
        assert 16 <= full.sum() < H * W / 2
