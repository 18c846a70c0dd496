"""Evaluation harness tests: projection/accuracy semantics on crafted
inputs + the full CSV-producing path on a synthetic sequence."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from dynslam_tpu.eval import evaluation as ev
from dynslam_tpu.io.calib import read_kitti_calibration


def run_eval_core(rendered, input_d, lidar_pts, assoc=None,
                  deltas=(1.0,), kitti=(False,), W=64, H=48,
                  fx=50.0, baseline=0.5):
    """Helper: identity velo->cam, simple projections."""
    P_left = np.array([[fx, 0, W / 2, 0], [0, fx, H / 2, 0], [0, 0, 1, 0]])
    P_right = P_left.copy()
    P_right[0, 3] = -fx * baseline
    n = len(lidar_pts)
    pts = np.zeros((ev.MAX_LIDAR_POINTS, 3), np.float32)
    pts[:n] = lidar_pts
    valid = np.zeros(ev.MAX_LIDAR_POINTS, bool)
    valid[:n] = True
    if assoc is None:
        assoc = np.zeros((H, W), np.int8)
    out = ev.evaluate_depth_jit(
        jnp.asarray(pts), jnp.asarray(valid),
        jnp.eye(4, dtype=jnp.float32),
        jnp.asarray(P_left, jnp.float32), jnp.asarray(P_right, jnp.float32),
        jnp.asarray(rendered, jnp.float32), jnp.asarray(input_d, jnp.float32),
        jnp.asarray(assoc), jnp.float32(baseline * fx),
        jnp.float32(0.5), jnp.float32(20.0),
        width=W, height=H, delta_maxes=deltas, kitti_style=kitti,
    )
    counts, gt_stats = out
    run_eval_core.last_gt_stats = np.asarray(gt_stats)
    return np.asarray(counts)


class TestEvalCore:
    def test_perfect_depth_all_correct(self):
        W, H, fx = 64, 48, 50.0
        z = 5.0
        rendered = np.full((H, W), z, np.float32)
        pts = [(0.0, 0.0, z), (0.5, 0.2, z), (-0.4, -0.1, z)]
        counts = run_eval_core(rendered, rendered, pts)
        # bucket 0 (unified), source 0 (fused): all correct
        assert counts[0, 0, 0].tolist() == [0, 0, 3, 0]
        assert counts[0, 0, 1].tolist() == [0, 0, 3, 0]

    def test_wrong_depth_counts_error(self):
        W, H = 64, 48
        rendered = np.full((H, W), 4.0, np.float32)  # GT is 5 m
        input_d = np.full((H, W), 5.0, np.float32)
        counts = run_eval_core(rendered, input_d, [(0.0, 0.0, 5.0)])
        # disparity error = bf/4 - bf/5 = 25/4-25/5 = 1.25 px > 1.0
        assert counts[0, 0, 0].tolist() == [1, 0, 0, 0]  # fused: error
        assert counts[0, 0, 1].tolist() == [0, 0, 1, 0]  # input: correct

    def test_kitti_style_needs_both_conditions(self):
        W, H = 64, 48
        # 5% of lidar_disp = 0.25 px; error 1.25 px: with delta_max=2 (not
        # exceeded) -> correct; with kitti delta 1.0 -> error only if also
        # > 5% GT (it is) -> error
        rendered = np.full((H, W), 4.0, np.float32)
        input_d = np.full((H, W), 5.0, np.float32)
        counts = run_eval_core(rendered, input_d, [(0.0, 0.0, 5.0)],
                               deltas=(2.0, 1.0), kitti=(False, True))
        assert counts[0, 0, 0].tolist() == [0, 0, 1, 0]
        assert counts[1, 0, 0].tolist() == [1, 0, 0, 0]

    def test_compare_on_intersection(self):
        W, H = 64, 48
        rendered = np.zeros((H, W), np.float32)  # fused missing everywhere
        input_d = np.full((H, W), 5.0, np.float32)
        counts = run_eval_core(rendered, input_d, [(0.0, 0.0, 5.0)])
        # both counted missing (intersection semantics), but
        # missing_separate only for the truly missing source
        assert counts[0, 0, 0].tolist() == [0, 1, 0, 1]
        assert counts[0, 0, 1].tolist() == [0, 1, 0, 0]

    def test_depth_range_and_image_bounds_filter(self):
        W, H = 64, 48
        d = np.full((H, W), 5.0, np.float32)
        pts = [
            (0.0, 0.0, 0.2),   # too close
            (0.0, 0.0, 30.0),  # too far
            (100.0, 0.0, 5.0), # projects outside image
            (0.0, 0.0, 5.0),   # valid
        ]
        counts = run_eval_core(d, d, pts)
        total = counts[0, 0, 0, :3].sum()
        assert total == 1

    def test_segmented_buckets(self):
        W, H = 64, 48
        d = np.full((H, W), 5.0, np.float32)
        assoc = np.zeros((H, W), np.int8)
        assoc[:, : W // 2] = ev.ASSOC_DYNAMIC
        assoc[:, W - 4:] = ev.ASSOC_SKIP
        pts = [(-0.8, 0.0, 5.0), (0.0, 0.0, 5.0), (1.3, 0.0, 5.0)]
        # projections: u = x/z*fx + 32 -> 24 (dynamic), 32 (static), 45...
        counts = run_eval_core(d, d, pts, assoc=assoc)
        unified = counts[0, 0, 0, :3].sum()
        static = counts[0, 1, 0, :3].sum()
        dynamic = counts[0, 2, 0, :3].sum()
        assert static == 2 and dynamic == 1
        assert unified == 3  # skip region had no points


class TestEvaluationEndToEnd:
    def test_full_pipeline_with_eval(self, tmp_path):
        from dynslam_tpu.io.synthetic import write_kitti_sequence
        from dynslam_tpu.pipeline.builder import build_dynslam
        from tests.test_pipeline import small_config

        root = str(tmp_path / "seq")
        write_kitti_sequence(root, num_frames=4, width=160, height=120,
                             with_dynamic=False, write_velodyne=True)
        csv_dir = str(tmp_path / "csv_out")
        dyn, inp = build_dynslam(
            root, small_config(), with_instances=False, with_evaluation=True,
            csv_out_dir=csv_dir,
        )
        while dyn.process_frame(inp):
            pass
        dyn.evaluation.close()

        files = os.listdir(csv_dir)
        assert any("unified-depth-result" in f for f in files)
        assert any("-memory.csv" in f for f in files)
        assert any("voxelsize-0.0800" in f for f in files)

        uni = [f for f in files if "unified" in f][0]
        lines = open(os.path.join(csv_dir, uni)).read().strip().split("\n")
        assert lines[0].startswith("frame,fusion-total-0.50,")
        assert len(lines) >= 4  # header + >= 3 evaluated frames

        # sanity: most GT-backed fused points should be correct at 3 px
        # on the synthetic scene (input depth IS the GT render)
        res = dyn.evaluation.last_frame_results["unified"]
        at3 = [e for e in res.evaluations if e.delta_max == 3.0 and not e.kitti_style][0]
        r = at3.input_result
        assert r.correct_count > 0
        assert r.correct_pixel_ratio(include_missing=False) > 0.9

        mem = [f for f in files if "memory" in f][0]
        mlines = open(os.path.join(csv_dir, mem)).read().strip().split("\n")
        assert mlines[0].startswith("frame_id,memory_usage_bytes")
        assert int(mlines[-1].split(",")[1]) > 0


class TestGtAccounting:
    def test_epipolar_violation_and_negative_disparity_counts(self):
        """Evaluation.cpp:262-275 accounting: row-mismatched projections
        count as epipolar violations; negative GT disparity is counted
        (the reference aborts; we drop + warn)."""
        W, H, fx, baseline = 64, 48, 50.0, 0.5
        rendered = np.full((H, W), 5.0, np.float32)
        input_d = np.full((H, W), 5.0, np.float32)
        # clean point at 5 m on the axis
        pts = [(0.0, 0.0, 5.0)]
        run_eval_core(rendered, input_d, np.asarray(pts, np.float32))
        epi, neg, ok = run_eval_core.last_gt_stats
        assert (epi, neg, ok) == (0, 0, 1)

        # negative disparity: fake it with a right projection left of the
        # left one — flip the baseline sign via a point behind... instead
        # craft via the projection matrices by reusing the helper with a
        # negative baseline
        run_eval_core(rendered, input_d, np.asarray(pts, np.float32),
                      baseline=-0.5)
        epi, neg, ok = run_eval_core.last_gt_stats
        assert neg == 1 and ok == 0


def test_delayed_eval_routes_with_latest_seg(tmp_path):
    """Evaluation.cpp:111-127: delayed frames are routed with the LATEST
    segmentation/reconstructor, so the dynamic CSV stays populated under
    evaluation_delay > 0 (the decay-gate recipe)."""
    import dataclasses

    from dynslam_tpu.config import EvaluationParams
    from dynslam_tpu.io.synthetic import write_kitti_sequence
    from dynslam_tpu.pipeline.builder import build_dynslam
    from tests.test_dynamic_pipeline import dynamic_config

    root = str(tmp_path / "seq")
    write_kitti_sequence(root, num_frames=7, width=160, height=120,
                         with_dynamic=True)
    cfg = dataclasses.replace(
        dynamic_config(),
        evaluation=EvaluationParams(enabled=True, evaluation_delay=3,
                                    semantic_evaluation=True),
    )
    out = str(tmp_path / "out" / "csv")
    dyn, inp = build_dynslam(root, cfg, with_instances=True,
                             min_detection_size_px=8, with_evaluation=True,
                             csv_out_dir=out)
    while dyn.process_frame(inp):
        pass
    dyn.evaluation.close()
    import csv, glob

    dyn_csv = glob.glob(os.path.join(out, "*dynamic-depth*"))[0]
    rows = list(csv.DictReader(open(dyn_csv)))
    assert len(rows) > 0
    total_dyn = sum(int(r["fusion-total-0.50"]) for r in rows)
    assert total_dyn > 0, "dynamic bucket empty under evaluation_delay"


def test_bilateral_filter_flag_reaches_update_view(monkeypatch, tmp_path):
    """--use_bilateral_filter wires through to MapEngine.update_view
    (InfiniTamDriver.cpp:222 useBilateralFilter)."""
    import dataclasses

    from dynslam_tpu.io.synthetic import write_kitti_sequence
    from dynslam_tpu.pipeline.builder import build_dynslam
    from dynslam_tpu.pipeline.mapping import MapEngine
    from tests.test_pipeline import small_config

    seen = []
    orig = MapEngine.update_view

    def spy(self, rgb, depth_mm, bilateral=False):
        seen.append(bilateral)
        return orig(self, rgb, depth_mm, bilateral=bilateral)

    monkeypatch.setattr(MapEngine, "update_view", spy)

    root = str(tmp_path / "seq")
    write_kitti_sequence(root, num_frames=2, width=96, height=64)
    cfg = dataclasses.replace(small_config(), use_bilateral_filter=True)
    dyn, inp = build_dynslam(root, cfg, with_instances=False)
    dyn.process_frame(inp)
    assert seen and all(seen)


def test_error_viz_overlay():
    """Headless LIDAR-vs-depth diff (GUI ErrorVisualizationCallback)."""
    import numpy as np

    from dynslam_tpu.eval.error_viz import render_depth_error

    W, H, fx, baseline = 64, 48, 50.0, 0.5
    P_left = np.array([[fx, 0, W / 2, 0], [0, fx, H / 2, 0], [0, 0, 1, 0]])
    P_right = P_left.copy()
    P_right[0, 3] = -fx * baseline
    depth = np.full((H, W), 5.0, np.float32)
    depth[:, :20] = 0.0  # missing band
    rgb = np.full((H, W, 3), 100, np.uint8)
    # 3 points: correct (5 m), wrong (map says 5, GT 2.5), into the hole
    lidar = np.array([
        [0.5, 0.0, 5.0],   # right half, matches
        [0.3, 0.2, 2.5],   # disparity off by 2x -> error
        [-1.6, 0.0, 5.0],  # projects into the missing band
    ], np.float32)
    out = render_depth_error(lidar, depth, rgb, np.eye(4), P_left, P_right,
                             bf=fx * baseline)
    assert out.shape == (H, W, 3)
    flat = out.reshape(-1, 3)
    assert (flat == (40, 220, 40)).all(axis=1).any()   # green splat
    assert (flat == (230, 40, 40)).all(axis=1).any()   # red splat
    assert (flat == (60, 90, 230)).all(axis=1).any()   # blue splat
