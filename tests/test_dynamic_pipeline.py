"""Full dynamic pipeline e2e (BASELINE config 5 analogue): synthetic
sequence with a moving car + MNC-format masks -> car tracked as DYNAMIC,
reconstructed in its own volume, cut out of the static map, composited
into previews."""

import numpy as np
import pytest

from dynslam_tpu.config import (
    DynSlamConfig,
    InstanceMapParams,
    MapParams,
    SceneParams,
    StereoMatcherParams,
    TrackerParams,
    VisualOdometryParams,
)
from dynslam_tpu.instances.track import TrackState
from dynslam_tpu.io.synthetic import write_kitti_sequence
from dynslam_tpu.pipeline.builder import build_dynslam
from dynslam_tpu.pipeline.mapping import PreviewType

W, H = 160, 120


def dynamic_config():
    return DynSlamConfig(
        dynamic_mode=True,
        scene=SceneParams(voxel_size_m=0.08, mu_m=0.32),
        map=MapParams(pool_capacity=16384, local_dims=(80, 32, 80),
                      max_new_blocks_per_frame=4096),
        instance_map=InstanceMapParams(
            blocks_per_object=1024, local_dims=(48, 24, 64),
            max_new_blocks_per_frame=512, max_detections=8,
        ),
        vo=VisualOdometryParams(max_candidates=1024, max_matches=512,
                                ransac_iters=60, max_disparity=64),
        stereo=StereoMatcherParams(max_disparity=64),
        tracker=TrackerParams(min_flow_vectors=8),
    )


@pytest.fixture(scope="module")
def run(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("kitti_dyn"))
    write_kitti_sequence(root, num_frames=6, width=W, height=H,
                         with_dynamic=True)
    dyn, inp = build_dynslam(root, dynamic_config(), with_instances=True,
                             min_detection_size_px=8)
    frames_done = 0
    while dyn.process_frame(inp):
        frames_done += 1
    return dyn, inp, frames_done, root


class TestDynamicPipeline:
    def test_car_tracked_dynamic_with_volume(self, run):
        dyn, _, n, _ = run
        assert n == 6
        tracks = list(dyn.instance_reconstructor.tracker.active_tracks.values())
        assert len(tracks) == 1
        t = tracks[0]
        assert t.class_name == "car"
        assert t.state == TrackState.DYNAMIC
        assert t.has_reconstruction()
        assert t.reconstruction.get_used_block_count() > 100
        assert t.fused_frames >= 3

    def test_silhouette_removed_from_static_view(self, run):
        dyn, inp, *_ = run
        # the fused view (post-cut) must have holes where the car was
        view_depth = np.asarray(dyn.static_scene._view_depth_m)
        det = dyn.get_latest_seg_result().instance_detections[0]
        mask = det.delete_mask.to_full_frame(H, W)
        assert (view_depth[mask] == 0).mean() > 0.95
        _, depth_mm = inp.get_images()
        assert (depth_mm[mask] > 0).mean() > 0.5  # input had data there

    def test_composited_preview_includes_instance(self, run):
        dyn, *_ = run
        plain = dyn.get_static_map_raycast_preview(
            preview=PreviewType.COLOR, compositing=False)
        comp = dyn.get_static_map_raycast_preview(
            preview=PreviewType.COLOR, compositing=True)
        assert comp.shape == plain.shape
        # compositing adds tinted pixels where the car volume renders
        assert (comp != plain).any(axis=-1).sum() > 20

    def test_composited_depth_adds_car_surface(self, run):
        dyn, *_ = run
        d_plain = dyn.get_static_map_raycast_depth_preview(compositing=False)
        d_comp = dyn.get_static_map_raycast_depth_preview(compositing=True)
        added = (d_comp > 0) & (d_plain == 0)
        assert added.sum() > 20

    def test_instance_previews(self, run):
        dyn, *_ = run
        ir = dyn.instance_reconstructor
        tid = list(ir.tracker.active_tracks)[0]
        rgb = ir.get_instance_preview_rgb(tid)
        dep = ir.get_instance_preview_depth(tid)
        assert rgb is not None and dep is not None
        assert (dep > 0).sum() > 50  # masked car pixels present
        assert ir.get_instance_preview_rgb(999) is None
