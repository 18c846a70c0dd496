"""3D object-tracking evaluation against KITTI GT tracklets — the
reference's tracklet evaluation (Evaluation.cpp:358-433 + the
TrackletEvaluation record). NOTE: the reference ships this DISABLED in
its final runs (`eval_tracklets_(false)`, Evaluation.h:193-197); it is
implemented and tested here, and equally off by default.

Per frame, each active track's estimated world-frame object motion
(`relative_pose_world`) is compared to the GT motion derived from the
tracklet poses (object-in-camera location + rotation_y, lifted to world
with the camera pose chain). Association is bbox IoU between the track's
detection and the tracklet's 2D box. Errors follow the KITTI convention:
translation error = |t_est - t_gt| of the frame-to-frame delta, rotation
error = angle(R_est R_gt^T).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from dynslam_tpu.eval.csv_writer import CsvWriter
from dynslam_tpu.eval.records import TrackletEvaluation
from dynslam_tpu.io.segmentation import BoundingBox
from dynslam_tpu.io.tracklets import TrackletFrame


def _tracklet_pose_cam(t: TrackletFrame) -> np.ndarray:
    """Object-to-camera transform from a tracklet (rotation about cam y)."""
    c, s = np.cos(t.rotation_y), np.sin(t.rotation_y)
    T = np.eye(4)
    T[:3, :3] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
    T[:3, 3] = t.location_cam_m
    return T


def _bbox_iou(a: BoundingBox, tb) -> float:
    b = BoundingBox(int(tb[0]), int(tb[1]), int(tb[2]), int(tb[3]))
    return a.iou(b)


class TrackingEvaluation:
    def __init__(
        self,
        grouped_tracklets: Dict[int, List[TrackletFrame]],
        csv_path: Optional[str] = None,
        min_iou: float = 0.5,
    ):
        self.gt = grouped_tracklets
        self.min_iou = min_iou
        self.csv = CsvWriter(csv_path) if csv_path else None
        self.results: List[TrackletEvaluation] = []

    def _match_gt(self, det_bbox: BoundingBox, frame_idx: int):
        best, best_iou = None, self.min_iou
        for t in self.gt.get(frame_idx, []):
            iou = _bbox_iou(det_bbox, t.bbox_2d)
            if iou > best_iou:
                best, best_iou = t, iou
        return best

    def evaluate_frame(self, dyn_slam, frame_idx: int) -> List[TrackletEvaluation]:
        """Evaluate every active track with a motion estimate at frame_idx.
        Requires poses for frame_idx-1 and frame_idx."""
        out = []
        recon = dyn_slam.instance_reconstructor
        if recon is None or frame_idx < 1:
            return out
        c2w_cur = np.linalg.inv(dyn_slam.pose_history[frame_idx + 1])
        c2w_prev = np.linalg.inv(dyn_slam.pose_history[frame_idx])

        for track in recon.tracker.active_tracks.values():
            lf = track.last_frame
            if lf.frame_idx != frame_idx or lf.relative_pose_world is None:
                continue
            gt_cur = self._match_gt(lf.detection.copy_mask.bbox, frame_idx)
            # previous GT observation of the same GT track id
            gt_prev = None
            if gt_cur is not None:
                for t in self.gt.get(frame_idx - 1, []):
                    if t.track_id == gt_cur.track_id:
                        gt_prev = t
                        break
            if gt_cur is None or gt_prev is None:
                continue

            # relative_pose_world (= ego_inv @ rel) is the object's
            # frame-to-frame motion expressed in the PREVIOUS camera frame;
            # express the GT tracklet motion there too
            w2c_prev = np.linalg.inv(c2w_prev)
            T_prev_obj_cur = w2c_prev @ c2w_cur @ _tracklet_pose_cam(gt_cur)
            T_prev_obj_prev = _tracklet_pose_cam(gt_prev)
            delta_gt = T_prev_obj_cur @ np.linalg.inv(T_prev_obj_prev)
            delta_est = lf.relative_pose_world

            trans_error = float(
                np.linalg.norm(delta_est[:3, 3] - delta_gt[:3, 3])
            )
            R = delta_est[:3, :3] @ delta_gt[:3, :3].T
            rot_error = float(
                np.arccos(np.clip((np.trace(R) - 1.0) / 2.0, -1.0, 1.0))
            )
            rec = TrackletEvaluation(frame_idx, track.id, trans_error,
                                     rot_error)
            out.append(rec)
            self.results.append(rec)
            if self.csv is not None:
                self.csv.write(rec)
        return out

    def close(self) -> None:
        if self.csv is not None:
            self.csv.close()
