"""End-to-end static pipeline tests — the reference's
`--dynamic_mode=false` "vanilla outdoor InfiniTAM" slice (BASELINE
config 3): synthetic KITTI sequence -> depth -> VO -> fusion -> raycast."""

import numpy as np
import pytest

from dynslam_tpu.config import (
    DynSlamConfig,
    MapParams,
    SceneParams,
    StereoMatcherParams,
    VisualOdometryParams,
    VoxelDecayParams,
)
from dynslam_tpu.io.calib import read_kitti_poses
from dynslam_tpu.io.synthetic import write_kitti_sequence
from dynslam_tpu.pipeline.builder import build_dynslam
from dynslam_tpu.pipeline.mapping import PreviewType

W, H = 160, 120
N_FRAMES = 5


def small_config(dynamic=False):
    return DynSlamConfig(
        dynamic_mode=dynamic,
        scene=SceneParams(voxel_size_m=0.08, mu_m=0.32),
        map=MapParams(
            pool_capacity=16384,
            local_dims=(80, 32, 80),
            max_new_blocks_per_frame=4096,
        ),
        vo=VisualOdometryParams(
            max_candidates=1024, max_matches=512, ransac_iters=60,
            max_disparity=64,
        ),
        stereo=StereoMatcherParams(max_disparity=64),
        decay=VoxelDecayParams(enabled=True, min_decay_age=200,
                               max_decay_weight=1),
    )


@pytest.fixture(scope="module")
def seq_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("kitti_e2e")
    write_kitti_sequence(
        str(root), num_frames=N_FRAMES, width=W, height=H,
        with_dynamic=False, write_velodyne=True,
    )
    return str(root)


class TestStaticPipeline:
    def test_full_static_run(self, seq_root):
        dyn, input_ = build_dynslam(
            seq_root, small_config(), with_instances=False,
        )
        n = 0
        while dyn.process_frame(input_):
            n += 1
        assert n == N_FRAMES

        # trajectory: est world-to-cam chain vs GT cam-to-world
        gt = read_kitti_poses(seq_root + "/ground-truth-poses.txt")
        errs = []
        for k in range(N_FRAMES):
            est_c2w = np.linalg.inv(dyn.pose_history[k + 1])
            errs.append(np.linalg.norm(est_c2w[:3, 3] - gt[k][:3, 3]))
        rmse = np.sqrt(np.mean(np.square(errs)))
        assert rmse < 0.12, f"VO trajectory RMSE {rmse}"

        # the map contains geometry and renders from the latest pose
        assert dyn.static_scene.get_used_block_count() > 100
        rc_depth = dyn.get_static_map_raycast_depth_preview(compositing=False)
        assert (rc_depth > 0).mean() > 0.3

        # previews render in all modes
        for p in (PreviewType.COLOR, PreviewType.DEPTH, PreviewType.NORMAL,
                  PreviewType.WEIGHT, PreviewType.GRAY):
            img = dyn.get_static_map_raycast_preview(preview=p,
                                                     compositing=False)
            assert img.shape == (H, W, 3)
            assert img.max() > 0

        # raycast depth matches the input depth of the last frame
        _, depth_mm = input_.get_images()
        gt_d = depth_mm.astype(np.float32) / 1000.0
        both = (rc_depth > 0) & (gt_d > 0)
        err = np.abs(rc_depth[both] - gt_d[both])
        assert np.median(err) < 0.1, f"median raycast-vs-input {np.median(err)}"

        # timing + memory telemetry exist
        rep = dyn.get_timing_report()
        assert "6-static-fusion" in rep and "3-scene-flow-vo" in rep
        assert dyn.static_scene.get_used_memory_bytes() > 0

    def test_fusion_every_k(self, seq_root):
        cfg = small_config().replace(fusion_every=2)
        dyn, input_ = build_dynslam(seq_root, cfg, with_instances=False)
        while dyn.process_frame(input_):
            pass
        # frames 2 and 4 fused (frame 0 skipped as first): fused < N
        assert dyn.static_scene.fused_frames == 2

    def test_decay_catchup_finalize(self, seq_root):
        dyn, input_ = build_dynslam(seq_root, small_config(),
                                    with_instances=False)
        for _ in range(3):
            dyn.process_frame(input_)
        used_before = dyn.static_scene.get_used_block_count()
        dyn.finalize()  # decay catchup: weight-1 voxels die regardless of age
        assert dyn.static_scene.get_saved_decay_memory_bytes() > 0
        assert dyn.static_scene.get_used_block_count() < used_before

    def test_live_stereo_matcher_pipeline(self, seq_root):
        """Depth from our census matcher instead of precomputed files."""
        dyn, input_ = build_dynslam(
            seq_root, small_config(), use_live_stereo=True,
            with_instances=False,
        )
        for _ in range(2):
            assert dyn.process_frame(input_)
        assert dyn.static_scene.get_used_block_count() > 50
        d = dyn.get_static_map_raycast_depth_preview(compositing=False)
        assert (d > 0).mean() > 0.2
