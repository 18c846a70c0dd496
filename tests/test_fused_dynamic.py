"""Fused single-dispatch DYNAMIC pipeline (pipeline/fused_dynamic.py):
one executable per frame covering the reference's default mode
(DynSlam.cpp:18-175 with dynamic_mode=true) — silhouette cut, per-object
motion RANSAC on device, pooled instance fusion, static mapping on the
cut view — with the host tracker running one frame behind on the packed
output fetch."""

import numpy as np
import pytest

from dynslam_tpu.instances.track import TrackState
from dynslam_tpu.io.segmentation import PrecomputedSegmentationProvider
from dynslam_tpu.io.synthetic import write_kitti_sequence
from dynslam_tpu.ops import depth as depth_ops
from dynslam_tpu.pipeline.builder import build_dynslam
from dynslam_tpu.pipeline.fused_dynamic import (
    FusedDynamicPipeline, pack_layout,
)
from tests.test_dynamic_pipeline import dynamic_config

W, H = 160, 120
N_FRAMES = 6


def test_pack_layout_is_contiguous():
    layout, total = pack_layout(4)
    cur = 0
    for name, (off, size) in layout.items():
        assert off == cur, name
        cur += size
    assert cur == total == 38 + 9 * 4 + 2


@pytest.fixture(scope="module")
def seq(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("kitti_fdyn"))
    write_kitti_sequence(root, num_frames=N_FRAMES, width=W, height=H,
                         with_dynamic=True)
    return root


@pytest.fixture(scope="module")
def staged(seq):
    """Reference behavior: the staged dynamic path on the same frames."""
    dyn, inp = build_dynslam(seq, dynamic_config(), with_instances=True,
                             min_detection_size_px=8)
    while dyn.process_frame(inp):
        pass
    return dyn


@pytest.fixture(scope="module")
def fused(seq):
    cfg = dynamic_config()
    dyn2, inp = build_dynslam(seq, cfg, with_instances=True,
                              min_detection_size_px=8)
    cfg = dyn2.config  # width/height/intrinsics resolved by the builder
    segp = PrecomputedSegmentationProvider(
        seq + "/seg_image_2/mnc", min_detection_size_px=8
    )
    pipe = FusedDynamicPipeline(cfg, cfg.calibration, use_pallas=False)
    frames = 0
    while inp.has_more_images():
        inp.read_next_frame()
        rgb, _depth = inp.get_images()
        right_rgb = inp.get_stereo_color()[1]
        lg = np.asarray(depth_ops.rgb_to_gray(rgb))
        rg = np.asarray(depth_ops.rgb_to_gray(right_rgb))
        dets = segp.segment_frame(rgb).instance_detections
        pipe.process_frame(lg, rg, rgb, dets)
        frames += 1
    pipe.finalize()
    assert frames == N_FRAMES
    return pipe


class TestFusedDynamic:
    def test_car_tracked_dynamic_with_volume(self, fused):
        tracks = list(fused.tracker.active_tracks.values())
        assert len(tracks) == 1
        t = tracks[0]
        assert t.class_name == "car"
        assert t.state == TrackState.DYNAMIC
        assert t.has_reconstruction()
        # one-frame-lagged cut start costs one fusion vs the staged path
        assert t.fused_frames >= 2
        assert t.reconstruction.get_used_block_count() > 100
        assert fused.reconstructed_objects() == [t.id]

    def test_static_map_built_with_car_cut_out(self, fused, staged):
        n_fused = fused.get_used_block_count()
        n_staged = staged.static_scene.get_used_block_count()
        assert n_fused > 200
        # same scene, same cut -> similar static-map size. The staged map
        # fuses the PRECOMPUTED depth while the fused step runs the live
        # census matcher in-graph, so allow a generous band.
        assert 0.5 * n_staged < n_fused < 2.0 * n_staged
        # finalize()'s tail flush ran with no detections, so the pending
        # view buffer must be drained (every cut view was fused)
        pd = np.asarray(fused.carry.pending_depth)
        assert not (pd > 0).any()

    def test_trajectory_matches_staged_vo(self, fused, staged):
        """Same VO ops, same PRNG folding -> near-identical pose chains
        (the staged path also runs external VO odometry here)."""
        ours = fused.pose_history
        ref = staged.pose_history
        # frames 0..N-1 live at indices 1..N (index 0 = identity prior);
        # finalize adds one tail-flush entry beyond that
        assert len(ours) >= N_FRAMES + 1
        for k in range(1, N_FRAMES + 1):
            d = np.linalg.norm(ours[k][:3, 3] - ref[k][:3, 3])
            assert d < 0.08, f"pose_history[{k}]: {d:.3f} m"

    def test_object_motion_estimated_on_device(self, fused):
        t = list(fused.tracker.active_tracks.values())[0]
        rels = [f.relative_pose for f in t.frames if f.relative_pose is not None]
        assert len(rels) >= 2
        # the synthetic car drives forward ~0.75 m/frame relative motion
        # magnitudes must be sane (not identity, not garbage)
        mags = [np.linalg.norm(r[:3, 3]) for r in rels]
        assert all(m < 5.0 for m in mags)
        assert max(mags) > 0.05

    def test_instance_raycast_renders_car(self, fused):
        t = list(fused.tracker.active_tracks.values())[0]
        k = len(t.frames) - 1
        chain = t.get_frame_pose(k)
        cam_w2c = t.frames[k].camera_pose
        # render from the camera that observed the last fused frame
        vol_c2w = np.linalg.inv(chain)
        rc = fused.raycast_instance(t.reconstruction.slot, vol_c2w)
        assert (np.asarray(rc.depth) > 0).sum() > 50
