"""Instance layer tests: tracker association, track state machine,
silhouette ops, and the full dynamic pipeline on a synthetic sequence
with a moving car (BASELINE config 5 analogue)."""

import numpy as np
import jax.numpy as jnp
import pytest

from dynslam_tpu.config import TrackerParams
from dynslam_tpu.instances.track import Track, TrackFrame, TrackState
from dynslam_tpu.instances.tracker import InstanceTracker
from dynslam_tpu.io.segmentation import BoundingBox, InstanceDetection, Mask
from dynslam_tpu.ops import masks as mask_ops

PARAMS = TrackerParams()


def make_detection(x0, y0, x1, y1, class_id=7, prob=0.95):
    bbox = BoundingBox(x0, y0, x1, y1)
    data = np.ones((bbox.height, bbox.width), np.uint8)
    return InstanceDetection(
        prob, class_id,
        Mask(bbox, data.copy()),
        Mask(BoundingBox(x0, y0, x1, y1), data.copy()),
        Mask(BoundingBox(x0, y0, x1, y1), data.copy()),
    )


def make_frame(frame_idx, det, flow=None, camera_pose=None):
    return TrackFrame(
        frame_idx=frame_idx,
        detection=det,
        masked_flow=flow if flow is not None else np.zeros((0, 8), np.float32),
        camera_pose=camera_pose if camera_pose is not None else np.eye(4),
    )


class FakeSFProvider:
    """Returns a fixed twist (or None) from extract_motion."""

    def __init__(self, tr=None):
        self.tr = tr
        self.last_initial = None

    def extract_motion(self, flow, initial_estimate=None, irls_rounds=None, gn_iters=None):
        self.last_initial = initial_estimate
        return None if self.tr is None else np.asarray(self.tr, np.float64)


class TestScoring:
    def test_same_frame_zero(self):
        t = Track(0, PARAMS)
        t.add_frame(make_frame(3, make_detection(0, 0, 49, 49)))
        assert t.score_match(make_frame(3, make_detection(0, 0, 49, 49))) == 0.0

    def test_class_mismatch_zero(self):
        t = Track(0, PARAMS)
        t.add_frame(make_frame(0, make_detection(0, 0, 49, 49, class_id=7)))
        f = make_frame(1, make_detection(0, 0, 49, 49, class_id=15))
        assert t.score_match(f) == 0.0

    def test_iou_prob_time_discount(self):
        t = Track(0, PARAMS)
        t.add_frame(make_frame(0, make_detection(0, 0, 49, 49, prob=0.9)))
        same = make_frame(1, make_detection(0, 0, 49, 49, prob=0.8))
        assert t.score_match(same) == pytest.approx(1.0 * 0.9 * 0.8)
        gap2 = make_frame(2, make_detection(0, 0, 49, 49, prob=0.8))
        assert t.score_match(gap2) == pytest.approx(0.9 * 0.8 * 0.5)
        gap3 = make_frame(3, make_detection(0, 0, 49, 49, prob=0.8))
        assert t.score_match(gap3) == pytest.approx(0.9 * 0.8 * 0.25)


class TestTracker:
    def test_association_and_new_tracks(self):
        tr = InstanceTracker(PARAMS)
        tr.process_instance_views(0, [make_frame(0, make_detection(10, 10, 60, 60)),
                                      make_frame(0, make_detection(100, 10, 150, 60))])
        assert len(tr.tracks) == 2
        # overlapping detection joins its track; distant one makes a new track
        tr.process_instance_views(1, [make_frame(1, make_detection(12, 10, 62, 60)),
                                      make_frame(1, make_detection(300, 200, 350, 250))])
        assert len(tr.tracks) == 3
        assert len(tr.get_track(0).frames) == 2

    def test_prune_inactive(self):
        tr = InstanceTracker(PARAMS)
        tr.process_instance_views(0, [make_frame(0, make_detection(10, 10, 60, 60))])
        tr.process_instance_views(
            PARAMS.inactive_frame_threshold + 2,
            [make_frame(PARAMS.inactive_frame_threshold + 2,
                        make_detection(200, 100, 260, 160))],
        )
        assert 0 not in tr.tracks
        assert len(tr.tracks) == 1


class TestStateMachine:
    def _track_with_frames(self, n_flow=30):
        t = Track(0, PARAMS)
        flow = np.zeros((n_flow, 8), np.float32)
        t.add_frame(make_frame(0, make_detection(0, 0, 49, 49), flow))
        t.add_frame(make_frame(1, make_detection(0, 0, 49, 49), flow))
        return t

    def test_uncertain_to_static(self):
        t = self._track_with_frames()
        # object flow equals camera flow: rel = cam delta; ego(inv) @ rel = I
        cam_delta_tr = np.array([0, 0, 0, 0.0, 0, -0.3])
        sf = FakeSFProvider(cam_delta_tr)
        ego_inv = np.eye(4); ego_inv[2, 3] = 0.3  # inverse of cam delta
        t.update(ego_inv, sf)
        assert t.state == TrackState.STATIC
        # static snaps motion to identity
        np.testing.assert_allclose(t.last_frame.relative_pose, np.eye(4))

    def test_uncertain_to_dynamic(self):
        t = self._track_with_frames()
        obj_tr = np.array([0, 0, 0, 0.0, 0, -1.0])  # strong residual motion
        sf = FakeSFProvider(obj_tr)
        t.update(np.eye(4), sf)
        assert t.state == TrackState.DYNAMIC

    def test_uncertain_stays_on_ambiguous(self):
        t = self._track_with_frames()
        obj_tr = np.array([0, 0, 0, 0.0, 0, -0.2])  # between thresholds
        t.update(np.eye(4), FakeSFProvider(obj_tr))
        assert t.state == TrackState.UNCERTAIN

    def test_too_few_flow_vectors_no_estimate(self):
        t = self._track_with_frames(n_flow=5)
        t.update(np.eye(4), FakeSFProvider(np.zeros(6)))
        assert t.last_frame.relative_pose is None
        assert t.state == TrackState.UNCERTAIN

    def test_dynamic_constant_velocity_then_uncertain(self):
        t = self._track_with_frames()
        t.update(np.eye(4), FakeSFProvider([0, 0, 0, 0, 0, -1.0]))
        assert t.state == TrackState.DYNAMIC
        # next frame: no estimate -> constant-velocity hold (1 frame allowed)
        flow = np.zeros((30, 8), np.float32)
        t.add_frame(make_frame(2, make_detection(0, 0, 49, 49), flow))
        t.update(np.eye(4), FakeSFProvider(None))
        assert t.state == TrackState.DYNAMIC
        assert t.last_frame.relative_pose is not None
        np.testing.assert_allclose(t.last_frame.relative_pose[2, 3], -1.0,
                                   atol=1e-6)
        # second gap exceeds the 1-frame dynamic threshold -> uncertain
        t.add_frame(make_frame(3, make_detection(0, 0, 49, 49), flow))
        t.update(np.eye(4), FakeSFProvider(None))
        assert t.state == TrackState.UNCERTAIN

    def test_static_tolerates_five_gaps(self):
        t = self._track_with_frames()
        cam_tr = np.array([0, 0, 0, 0, 0, -0.3])
        ego_inv = np.eye(4); ego_inv[2, 3] = 0.3
        t.update(ego_inv, FakeSFProvider(cam_tr))
        assert t.state == TrackState.STATIC
        for k in range(2, 7):  # 5 frames without estimates: stays static
            t.add_frame(make_frame(k, make_detection(0, 0, 49, 49),
                                   np.zeros((30, 8), np.float32)))
            t.update(np.eye(4), FakeSFProvider(None))
        assert t.state == TrackState.STATIC
        t.add_frame(make_frame(7, make_detection(0, 0, 49, 49),
                               np.zeros((30, 8), np.float32)))
        t.update(np.eye(4), FakeSFProvider(None))
        assert t.state == TrackState.UNCERTAIN

    def test_warm_start_passed(self):
        t = self._track_with_frames()
        sf = FakeSFProvider([0, 0, 0, 0, 0, -1.0])
        t.update(np.eye(4), sf)
        t.add_frame(make_frame(2, make_detection(0, 0, 49, 49),
                               np.zeros((30, 8), np.float32)))
        t.update(np.eye(4), sf)
        np.testing.assert_allclose(sf.last_initial, [0, 0, 0, 0, 0, -1.0])

    def test_pose_chain_with_gap_reset(self):
        t = Track(0, PARAMS)
        for k in range(4):
            t.add_frame(make_frame(k, make_detection(0, 0, 49, 49)))
        step = np.eye(4); step[2, 3] = -0.5
        t.frames[1].relative_pose = step.copy()
        t.frames[2].relative_pose = None  # gap
        t.frames[3].relative_pose = step.copy()
        # chain restarts after the gap
        pose = t.get_frame_pose(3)
        np.testing.assert_allclose(pose, step)
        assert t.get_first_fusable_frame_index() == 0


class TestSilhouetteOps:
    def test_cut_and_remove(self):
        rgb = jnp.full((8, 10, 3), 200, jnp.uint8)
        depth = jnp.full((8, 10), 5.0)
        copy = jnp.zeros((8, 10), bool).at[2:5, 3:6].set(True)
        delete = jnp.zeros((8, 10), bool).at[1:6, 2:7].set(True)
        irgb, idepth, mrgb, mdepth = mask_ops.cut_out_instance(
            rgb, depth, copy, delete
        )
        assert int(jnp.sum(idepth > 0)) == 9
        assert int(jnp.sum(mdepth == 0)) == 25
        assert int(mrgb[3, 4, 0]) == 0 and int(mrgb[0, 0, 0]) == 200

    def test_composite_depth_zmerge(self):
        a = jnp.asarray([[0.0, 2.0, 3.0]])
        b = jnp.asarray([[1.0, 0.0, 2.5]])
        out = np.asarray(mask_ops.composite_depth(a, b))
        np.testing.assert_allclose(out, [[1.0, 2.0, 2.5]])

    def test_composite_color_occlusion(self):
        tc = jnp.full((1, 2, 3), 100, jnp.uint8)
        td = jnp.asarray([[2.0, 1.0]])
        ic = jnp.full((1, 2, 3), 50, jnp.uint8)
        idp = jnp.asarray([[1.0, 3.0]])  # in front / behind
        oc, od = mask_ops.composite_color(tc, td, ic, idp,
                                          jnp.asarray([255.0, 0.0, 0.0]))
        oc, od = np.asarray(oc), np.asarray(od)
        assert od[0, 0] == 1.0 and od[0, 1] == 1.0
        assert oc[0, 0, 0] > 100  # tinted red instance in front
        assert (oc[0, 1] == 100).all()  # static wins behind


class TestDetectionsFromInstanceIds:
    """io/segmentation.detections_from_instance_ids: the GT-mask ->
    InstanceDetection path used by bench --dynamic and the dynamic soak
    (the precomputed-MNC-dump role for synthetic data)."""

    def test_two_objects_masks_and_bboxes(self):
        from dynslam_tpu.io.segmentation import detections_from_instance_ids

        objid = np.zeros((60, 80), np.int16)
        objid[10:30, 5:25] = 3   # 20x20 car
        objid[40:55, 50:75] = 7  # 15x25 car
        dets = detections_from_instance_ids(objid, min_size_px=8)
        assert len(dets) == 2
        for d in dets:
            assert d.class_id == 7 and d.is_possibly_dynamic()
        d0 = next(d for d in dets if d.copy_mask.bbox.x0 == 5)
        assert (d0.copy_mask.bbox.y0, d0.copy_mask.bbox.x1,
                d0.copy_mask.bbox.y1) == (10, 24, 29)
        # full-frame copy mask reproduces the instance-id region exactly
        full = d0.copy_mask.to_full_frame(60, 80)
        assert (full.astype(bool) == (objid == 3)).all()
        # delete mask is the reference's grown cut mask: a superset
        dfull = d0.delete_mask.to_full_frame(60, 80).astype(bool)
        assert (dfull & (objid == 3)).sum() == (objid == 3).sum()
        assert dfull.sum() >= full.sum()

    def test_background_and_tiny_blobs_ignored(self):
        from dynslam_tpu.io.segmentation import detections_from_instance_ids

        objid = np.zeros((40, 40), np.int16)
        objid[0:2, 0:2] = 5      # 4 px — below the 16 px floor
        objid[20:22, 20:22] = -2  # negative ids are background
        assert detections_from_instance_ids(objid) == []
