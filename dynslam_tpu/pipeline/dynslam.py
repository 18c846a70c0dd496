"""DynSlam — the per-frame pipeline orchestrator
(`DynSlam::ProcessFrame`, src/DynSLAM/DynSlam.{h,cpp}).

Per frame (DynSlam.cpp:18-175):
  1. read stereo + depth from the Input layer
  2. semantic segmentation (dynamic mode)
  3. sparse scene flow + visual odometry; pose chain update
     (new_pose = delta @ pose_history[-1]; engine gets the inverse)
  4. update the map engine's view
  5. instance processing: cut dynamic objects out of the view and fuse
     them into per-object volumes
  6. static fusion + raycast prepare + voxel decay (every `fusion_every`)
  7. evaluation hook + memory telemetry

Host concurrency note: the reference overlaps segmentation IO and VO with
std::async (DynSlam.cpp:33-112); here the jitted kernels dispatch
asynchronously on the device and the host only blocks when it reads
results, so the same overlap happens without host threads.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from dynslam_tpu.config import DynSlamConfig
from dynslam_tpu.io.input import Input
from dynslam_tpu.io.segmentation import SegmentationProvider
from dynslam_tpu.ops import depth as depth_ops
from dynslam_tpu.pipeline.mapping import MapEngine, PreviewType
from dynslam_tpu.pipeline.sparse_sf import SparseSFProvider
from dynslam_tpu.utils import timers


class DynSlam:
    def __init__(
        self,
        config: DynSlamConfig,
        static_scene: MapEngine,
        segmentation_provider: Optional[SegmentationProvider] = None,
        sparse_sf_provider: Optional[SparseSFProvider] = None,
        instance_reconstructor=None,  # InstanceReconstructor (instances/)
        evaluation=None,  # eval.Evaluation
        ground_truth_poses: Optional[np.ndarray] = None,
    ):
        self.config = config
        self.static_scene = static_scene
        self.segmentation_provider = segmentation_provider
        self.sparse_sf_provider = sparse_sf_provider
        self.instance_reconstructor = instance_reconstructor
        self.evaluation = evaluation
        #: (N, 4, 4) cam-to-world GT poses — when set, egomotion comes from
        #: here instead of VO (the reference's groundTruthPoseFpath mode,
        #: DynSLAMGUI.cpp:1214; scene flow still runs for object motion)
        self.ground_truth_poses = ground_truth_poses

        #: world-to-camera poses, one per processed frame; frame k's pose is
        #: pose_history[k + 1] (index 0 = identity prior, DynSlam.h:213)
        self.pose_history: List[np.ndarray] = [np.eye(4, dtype=np.float32)]
        self.current_frame_no = 0
        self._timers = timers.global_timers()
        self._last_seg = None

    # ------------------------------------------------------------------
    def process_frame(self, input_: Input) -> bool:
        """Returns False when the sequence is exhausted."""
        if not input_.has_more_images():
            return False
        t = self._timers
        t.tic("0-total-frame")

        t.tic("1-read-input")
        input_.read_next_frame()
        rgb, depth_mm = input_.get_images()
        t.toc("1-read-input")

        first_frame = self.current_frame_no == 0
        fuse_this_frame = self.current_frame_no % self.config.fusion_every == 0

        # -- semantic segmentation (async A in the reference) ------------
        seg_result = None
        if self.config.dynamic_mode and self.segmentation_provider is not None \
                and fuse_this_frame:
            t.tic("2-segmentation")
            seg_result = self.segmentation_provider.segment_frame(rgb)
            self._last_seg = seg_result
            t.toc("2-segmentation")

        # -- sparse scene flow + visual odometry (async B) ---------------
        t.tic("3-scene-flow-vo")
        if self.sparse_sf_provider is not None:
            left_gray = np.asarray(depth_ops.rgb_to_gray(rgb))
            right_rgb = input_.get_stereo_color()[1]
            right_gray = np.asarray(depth_ops.rgb_to_gray(right_rgb))
            self.sparse_sf_provider.compute_sparse_sf(left_gray, right_gray)
            if not self.sparse_sf_provider.flow_available() and not first_frame:
                print("Warning: could not compute scene flow.")
            delta = self.sparse_sf_provider.get_latest_motion()
        else:
            delta = np.eye(4)
        if self.ground_truth_poses is not None:
            k = min(self.current_frame_no, len(self.ground_truth_poses) - 1)
            gt_w2c = np.linalg.inv(self.ground_truth_poses[k])
            delta = gt_w2c @ np.linalg.inv(self.pose_history[-1])
        # ICP depth tracking against the map render (the engine's
        # trackingController->Track capability, InfiniTamDriver.h:120-124):
        # primary odometry when external_odometry=False (constant-velocity
        # seed, sparse VO as fallback); fallback refinement when the
        # sparse VO fails mid-sequence in the default mode
        vo_failed = (
            self.sparse_sf_provider is not None
            and not first_frame
            and not self.sparse_sf_provider.motion_available()
        )
        want_icp = (not self.config.external_odometry) or vo_failed
        if (
            want_icp
            and self.current_frame_no >= 2
            and self.static_scene._last_raycast is not None
            and self.ground_truth_poses is None
        ):
            seed = (
                getattr(self, "_last_delta", np.eye(4, dtype=np.float32))
                if not self.config.external_odometry else delta
            )
            res = self.static_scene.track_icp(
                depth_mm.astype(np.float32) / 1000.0,
                init_world_to_cam=seed @ self.pose_history[-1],
            )
            if bool(res.success):
                delta = np.asarray(res.world_to_cam) @ np.linalg.inv(
                    self.pose_history[-1]
                )
        self._last_delta = np.asarray(delta, np.float32)
        # the reference's GetLastEgomotion is old_c2w^-1 @ new_c2w = the
        # INVERSE of the VO delta (InfiniTamDriver.h:126,133); with it the
        # track state machine's error term ego @ rel is the object's
        # residual world motion — identity for static objects
        self.last_egomotion = np.linalg.inv(delta).astype(np.float32)
        new_pose = (delta @ self.pose_history[-1]).astype(np.float32)
        self.static_scene.set_pose(new_pose)
        self.pose_history.append(new_pose)
        t.toc("3-scene-flow-vo")

        # -- map view update ---------------------------------------------
        t.tic("4-update-view")
        self.static_scene.update_view(
            rgb, depth_mm, bilateral=self.config.use_bilateral_filter
        )
        t.toc("4-update-view")

        # -- dynamic-object pipeline -------------------------------------
        if (
            self.config.dynamic_mode
            and self.instance_reconstructor is not None
            and seg_result is not None
            and self.sparse_sf_provider is not None
            and self.sparse_sf_provider.flow_available()
        ):
            t.tic("5-instances")
            self.instance_reconstructor.process_frame(
                self, self.static_scene, seg_result,
                self.sparse_sf_provider.get_flow(), self.sparse_sf_provider,
            )
            t.toc("5-instances")

        # -- static fusion + raycast + decay -----------------------------
        if not first_frame and fuse_this_frame:
            t.tic("6-static-fusion")
            self.static_scene.integrate()
            t.toc("6-static-fusion")
            t.tic("7-raycast-prepare")
            self.static_scene.prepare_next_step()
            t.toc("7-raycast-prepare")
            t.tic("8-decay")
            self.static_scene.decay()
            t.toc("8-decay")
        else:
            # keep engine frame counter aligned with pipeline frames
            self.static_scene.frame_idx += 1

        # -- evaluation + telemetry --------------------------------------
        if self.evaluation is not None:
            t.tic("9-evaluation")
            self.evaluation.evaluate_frame(input_, self)
            self.evaluation.log_memory_use(self)
            if self.instance_reconstructor is not None:
                tr = self.instance_reconstructor.tracker
                self.evaluation.log_tracker(
                    self.current_frame_no, len(tr.active_tracks),
                    sum(1 for x in tr.active_tracks.values()
                        if x.has_reconstruction()),
                    0,  # the staged path processes every detection
                )
            t.toc("9-evaluation")

        self.current_frame_no += 1
        t.toc("0-total-frame")
        return True

    # ------------------------------------------------------------------
    # accessors mirroring DynSlam.h:76-268
    def get_pose_history(self) -> List[np.ndarray]:
        return self.pose_history

    def get_last_egomotion(self) -> np.ndarray:
        """Camera delta T_cur<-prev of the latest frame
        (DynSlam::GetLastEgomotion)."""
        return getattr(self, "last_egomotion", np.eye(4, dtype=np.float32))

    def get_current_pose(self) -> np.ndarray:
        return self.pose_history[-1]

    def get_static_map_raycast_preview(
        self, cam_to_world: Optional[np.ndarray] = None,
        preview: PreviewType = PreviewType.COLOR,
        compositing: bool = True,
    ) -> np.ndarray:
        img = self.static_scene.get_image(preview, cam_to_world)
        if compositing and self.instance_reconstructor is not None:
            img = self.instance_reconstructor.composite_instances(
                img, preview, cam_to_world, self
            )
        return img

    def get_static_map_raycast_depth_preview(
        self, cam_to_world: Optional[np.ndarray] = None,
        compositing: bool = True,
    ) -> np.ndarray:
        """Depth render feeding the evaluation (DynSlam.h:124-132)."""
        d = self.static_scene.get_float_image(cam_to_world)
        if compositing and self.instance_reconstructor is not None:
            d = self.instance_reconstructor.composite_instance_depth_maps(
                d, cam_to_world, self
            )
        return d

    def get_latest_seg_result(self):
        return self._last_seg

    def get_timing_report(self) -> str:
        return self._timers.report()

    def last_frame_ms(self) -> float:
        return self._timers.latest_ms("0-total-frame")

    def save_static_map(self, out_path: str) -> int:
        """Mesh the static map to OBJ (SaveStaticMap, DynSlam.cpp:189);
        returns the triangle count."""
        from dynslam_tpu.viz.meshing import save_engine_mesh

        return save_engine_mesh(self.static_scene, out_path)

    def save_dynamic_object(self, track_id: int, out_path: str) -> None:
        """Mesh one reconstructed object (SaveDynamicObject,
        DynSlam.cpp:199)."""
        assert self.instance_reconstructor is not None
        self.instance_reconstructor.save_object_to_mesh(track_id, out_path)

    def finalize(self) -> None:
        """End-of-sequence housekeeping: decay catch-up on the static map
        (the reference's 'K' key / sequence-end behavior)."""
        self.static_scene.decay_catchup()
