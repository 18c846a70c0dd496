"""Tracklet-based tracking evaluation + headless renderer tests (reuses
the dynamic-pipeline fixture)."""

import os

import numpy as np
import pytest

from dynslam_tpu.eval.tracking_eval import TrackingEvaluation
from dynslam_tpu.io.tracklets import read_grouped_tracklets
from dynslam_tpu.viz.renderer import render_chase_sequence, render_orbit
from tests.test_dynamic_pipeline import run  # fixture  # noqa: F401


class TestTrackingEvaluation:
    def test_synthetic_tracklets_written(self, run):  # noqa: F811
        *_, root = run
        grouped = read_grouped_tracklets(os.path.join(root, "tracklets.txt"))
        assert len(grouped) >= 4
        t = grouped[1][0]
        assert t.type == "Car" and t.location_cam_m[2] > 3.0

    def test_motion_error_vs_gt(self, run, tmp_path):  # noqa: F811
        dyn, _, n, root = run
        grouped = read_grouped_tracklets(os.path.join(root, "tracklets.txt"))
        csv_path = str(tmp_path / "tracking.csv")
        te = TrackingEvaluation(grouped, csv_path=csv_path)
        # last processed frame index
        recs = te.evaluate_frame(dyn, n - 1)
        te.close()
        assert len(recs) == 1
        r = recs[0]
        # the reference's metric takes the delta's translation directly,
        # which amplifies rotation noise by the object's ~10 m lever arm
        # from the camera origin; just bound it loosely here...
        assert 0.0 < r.trans_error < 2.0, r
        assert r.rot_error < 0.2
        # ...and check the physically meaningful quantity tightly: the
        # displacement error AT the object center
        track = list(dyn.instance_reconstructor.tracker.active_tracks.values())[0]
        grouped2 = grouped[n - 1]
        c = np.asarray(grouped2[0].location_cam_m)
        D_est = track.last_frame.relative_pose_world
        import numpy as _np
        c2w_cur = _np.linalg.inv(dyn.pose_history[n])
        c2w_prev = _np.linalg.inv(dyn.pose_history[n - 1])
        from dynslam_tpu.eval.tracking_eval import _tracklet_pose_cam
        gt_id = grouped2[0].track_id
        prev_t = [t for t in grouped[n - 2] if t.track_id == gt_id][0]
        w2c_prev = _np.linalg.inv(c2w_prev)
        D_gt = (w2c_prev @ c2w_cur @ _tracklet_pose_cam(grouped2[0])
                @ _np.linalg.inv(_tracklet_pose_cam(prev_t)))
        cp = _np.asarray(prev_t.location_cam_m)
        disp_err = _np.linalg.norm(
            (D_est[:3, :3] @ cp + D_est[:3, 3]) - (D_gt[:3, :3] @ cp + D_gt[:3, 3])
        )
        assert disp_err < 0.45, f"object-center displacement error {disp_err}"
        lines = open(csv_path).read().strip().split("\n")
        assert lines[0] == "frame_id,track_id,trans_error,rot_error"
        assert len(lines) == 2

    def test_no_gt_no_records(self, run):  # noqa: F811
        dyn, _, n, _ = run
        te = TrackingEvaluation({})
        assert te.evaluate_frame(dyn, n - 1) == []


class TestHeadlessRenderer:
    def test_orbit_render(self, run, tmp_path):  # noqa: F811
        dyn, *_ = run
        paths = render_orbit(dyn.static_scene, str(tmp_path / "orbit"),
                             n_frames=4, radius=10.0)
        assert len(paths) == 4
        import cv2

        imgs = [cv2.imread(p) for p in paths]
        assert all(im is not None and im.max() > 0 for im in imgs)
        # orbit views differ from each other
        assert (imgs[0] != imgs[2]).any()

    def test_chase_render(self, run, tmp_path):  # noqa: F811
        dyn, *_ = run
        paths = render_chase_sequence(dyn, str(tmp_path / "chase"), every=3)
        assert len(paths) >= 2
        assert all(os.path.getsize(p) > 500 for p in paths)
