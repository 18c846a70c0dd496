"""InstanceReconstructor — the dynamic-object engine
(`src/DynSLAM/InstRecLib/InstanceReconstructor.{h,cpp}`).

Per frame (ProcessFrame, InstanceReconstructor.cpp:172-207):
  1. build instance views for possibly-dynamic detections, with the masked
     scene flow (ExtractSceneFlow semantics: flow inside the delete mask,
     previous position inside the copy bbox, :802-849)
  2. associate to tracks (InstanceTracker)
  3. per track: motion estimate + state machine, then silhouette
     processing — Uncertain/dynamic objects are cut out of the main view;
     reconstructable ones (car/bus) also become masked instance views
     (:226-285). Views stay on device (ops/masks.py) — no CPU ping-pong.
  4. reconstructions: init a small per-object volume (voxel 0.035, mu 1.0)
     or fuse the newest frame at the chained relative pose; reap stale
     volumes (:315-401, :569-700)

Compositing of instance raycasts into static previews replaces the
reference's software z-buffer loops with jitted z-merges (:851-990).
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from dynslam_tpu.config import DynSlamConfig
from dynslam_tpu.instances.track import Track, TrackFrame, TrackState
from dynslam_tpu.instances.tracker import InstanceTracker
from dynslam_tpu.instances.volume_pool import InstanceVolumePool
from dynslam_tpu.io.segmentation import InstanceSegmentationResult
from dynslam_tpu.ops import masks as mask_ops
from dynslam_tpu.ops import tsdf
from dynslam_tpu.pipeline.mapping import MapEngine, PreviewType

#: matplotlib tab10 palette for track tints
#: (InstanceReconstructor kMatplotlib2Palette)
PALETTE = np.array(
    [
        [0x1F, 0x77, 0xB4], [0xFF, 0x7F, 0x0E], [0x2C, 0xA0, 0x2C],
        [0xD6, 0x27, 0x28], [0x94, 0x67, 0xBD], [0x8C, 0x56, 0x4B],
        [0xE3, 0x77, 0xC2], [0x7F, 0x7F, 0x7F], [0xBC, 0xBD, 0x22],
        [0x17, 0xBE, 0xCF],
    ],
    dtype=np.float32,
)


class InstanceReconstructor:
    def __init__(self, config: DynSlamConfig):
        self.config = config
        self.tracker = InstanceTracker(config.tracker)
        self.frame_idx = 0
        #: direct-refinement invocations that replaced a motion estimate
        #: (nonzero only with config.use_direct_refinement)
        self.direct_refinements = 0

        imp = config.instance_map
        self._instance_cfg = tsdf.TsdfConfig(
            pool_capacity=imp.blocks_per_object,
            local_dims=imp.local_dims,
            max_new_blocks=imp.max_new_blocks_per_frame,
            max_visible_blocks=min(imp.blocks_per_object,
                                   imp.max_new_blocks_per_frame * 2),
            voxel_size=imp.voxel_size_m,
            mu=imp.mu_m,
            max_weight=float(imp.max_weight),
            min_depth=config.min_depth_m,
            max_depth=config.max_depth_m,
            use_depth_weighting=config.map.use_depth_weighting,
            raycast_coarse_steps=imp.raycast_coarse_steps,
            raycast_fine_steps=imp.raycast_fine_steps,
            width=config.frame_width,
            height=config.frame_height,
            fx=config.intrinsics.fx,
            fy=config.intrinsics.fy,
            cx=config.intrinsics.cx,
            cy=config.intrinsics.cy,
        )
        #: batched per-object volumes (SURVEY §7.1): all tracks' fusions
        #: per frame run as ONE vmapped call — flat cost vs track count
        self.volume_pool = InstanceVolumePool(
            self._instance_cfg, config.decay, capacity=imp.max_objects
        )

    # ------------------------------------------------------------------
    def _extract_scene_flow(self, detection, matches: np.ndarray,
                            check_sf_start: bool = True) -> np.ndarray:
        """Masked flow: current position inside the delete mask; optionally
        the previous position inside the copy bbox
        (ExtractSceneFlow, InstanceReconstructor.cpp:802-849)."""
        if len(matches) == 0:
            return np.zeros((0, 8), np.float32)
        h, w = self.config.frame_height, self.config.frame_width
        full = detection.delete_mask.to_full_frame(h, w)
        u = np.clip(matches[:, 0].astype(int), 0, w - 1)
        v = np.clip(matches[:, 1].astype(int), 0, h - 1)
        sel = full[v, u]
        if check_sf_start:
            bb = detection.copy_mask.bbox
            up = matches[:, 4].astype(int)
            vp = matches[:, 5].astype(int)
            sel &= (up >= bb.x0) & (up <= bb.x1) & (vp >= bb.y0) & (vp <= bb.y1)
        return matches[sel]

    # ------------------------------------------------------------------
    def process_frame(self, dyn_slam, static_engine: MapEngine,
                      seg_result: InstanceSegmentationResult,
                      scene_flow, sf_provider) -> None:
        self.frame_idx = dyn_slam.current_frame_no
        matches = scene_flow.matches

        # 1. instance views for possibly-dynamic detections
        new_frames: List[TrackFrame] = []
        camera_pose = dyn_slam.get_current_pose()
        for det in seg_result.instance_detections:
            if not det.is_possibly_dynamic():
                continue
            new_frames.append(
                TrackFrame(
                    frame_idx=self.frame_idx,
                    detection=det,
                    masked_flow=self._extract_scene_flow(det, matches),
                    camera_pose=np.asarray(camera_pose),
                )
            )

        # 2. association
        self.tracker.process_instance_views(self.frame_idx, new_frames)

        # 3. per-track updates + silhouette processing on the device view
        egomotion = dyn_slam.get_last_egomotion()
        rgb = static_engine._view_rgb
        depth = static_engine._view_depth_m

        for track in list(self.tracker.active_tracks.values()):
            if track.end_time != self.frame_idx:
                continue
            track.update(egomotion, sf_provider)
            rgb, depth = self._process_silhouette(track, rgb, depth)

        static_engine.set_view_device(rgb, depth)

        # 4. reconstruction upkeep
        self._process_reconstructions(static_engine)

    # ------------------------------------------------------------------
    def _process_silhouette(self, track: Track, rgb, depth):
        """Cut/remove the newest detection from the main view
        (ProcessSilhouette, InstanceReconstructor.cpp:226-285)."""
        import jax.numpy as jnp

        det = track.last_frame.detection
        h, w = self.config.frame_height, self.config.frame_width
        should_reconstruct = det.is_reconstructable()
        possibly_dynamic = det.is_possibly_dynamic()
        always_separate = self.config.always_reconstruct_objects

        delete_mask = jnp.asarray(det.delete_mask.to_full_frame(h, w))
        if track.state == TrackState.UNCERTAIN:
            if possibly_dynamic:
                rgb, depth = mask_ops.remove_silhouette(rgb, depth, delete_mask)
        elif track.state == TrackState.DYNAMIC or always_separate:
            if should_reconstruct:
                copy_mask = jnp.asarray(det.copy_mask.to_full_frame(h, w))
                inst_rgb, inst_depth, rgb, depth = mask_ops.cut_out_instance(
                    rgb, depth, copy_mask, delete_mask
                )
                track.last_frame.instance_rgb = inst_rgb
                track.last_frame.instance_depth_m = inst_depth
            elif possibly_dynamic:
                # e.g. a pedestrian: remove but don't reconstruct
                rgb, depth = mask_ops.remove_silhouette(rgb, depth, delete_mask)
        # STATIC: leave in the main view
        return rgb, depth

    # ------------------------------------------------------------------
    def _process_reconstructions(self, static_engine: MapEngine) -> None:
        """InitializeReconstruction / FuseFrame / reap gating
        (ProcessReconstructions, InstanceReconstructor.cpp:315-361)."""
        for track in self.tracker.active_tracks.values():
            if not track.last_frame.detection.is_reconstructable():
                continue

            if track.end_time != self.frame_idx:
                gap = self.frame_idx - track.end_time
                if track.needs_cleanup and track.has_reconstruction() and gap >= 2:
                    track.reap_reconstruction()
                    track.needs_cleanup = False
                continue

            if not track.has_reconstruction():
                eligible = track.eligible_for_reconstruction() and (
                    track.state == TrackState.DYNAMIC
                    or (track.state == TrackState.STATIC
                        and self.config.always_reconstruct_objects)
                )
                if eligible:
                    self._initialize_reconstruction(track)
            else:
                self._fuse_frame(track, len(track.frames) - 1)
        # all tracks' staged fusions -> one vmapped batch
        self.volume_pool.flush()

    def _initialize_reconstruction(self, track: Track) -> None:
        """New pooled volume + catch-up fusion of all fusable frames
        (InstanceReconstructor.cpp:363-401). Falls back to a standalone
        engine when the pool is exhausted (> max_objects concurrent)."""
        track.reconstruction = self.volume_pool.acquire_volume() or MapEngine(
            self._instance_cfg, self.config.decay
        )
        first = track.get_first_fusable_frame_index()
        if first > -1:
            for i in range(first, len(track.frames)):
                self._fuse_frame(track, i)

    def _direct_refine_motion(self, track: Track, frame_idx: int) -> None:
        """Optional dense photometric refinement of the frame's object
        motion (T_cur<-prev) between consecutive instance views — the
        reference's disabled Direct/ module call sites
        (InstanceReconstructor.cpp:460-566). Runs only when
        config.use_direct_refinement; the refined delta replaces
        frame.relative_pose before the pose chain is consumed by fusion."""
        import jax.numpy as jnp

        from dynslam_tpu.ops import direct_align
        from dynslam_tpu.utils import se3

        frame = track.frames[frame_idx]
        if frame_idx < 1 or frame.relative_pose is None:
            return
        prev = track.frames[frame_idx - 1]
        if prev.instance_rgb is None or frame.instance_rgb is None:
            return
        ref_gray = jnp.mean(
            jnp.asarray(prev.instance_rgb, jnp.float32), axis=-1
        )
        tgt_gray = jnp.mean(
            jnp.asarray(frame.instance_rgb, jnp.float32), axis=-1
        )
        res = direct_align.refine_pose(
            ref_gray, prev.instance_depth_m, tgt_gray,
            self.config.intrinsics.as_tuple(),
            T_init=frame.relative_pose,
        )
        T = np.asarray(res.T)
        if not np.all(np.isfinite(T)) or float(res.valid_fraction) <= 0.0:
            return  # degenerate view pair: keep the sparse estimate
        frame.relative_pose = T.astype(np.float32)
        frame.relative_pose_tr = np.asarray(
            se3.log_se3(jnp.asarray(T)), np.float32
        )
        self.direct_refinements += 1

    def _fuse_frame(self, track: Track, frame_idx: int) -> None:
        """Fuse one track frame at its chained relative pose
        (FuseFrame, InstanceReconstructor.cpp:569-700)."""
        if track.state == TrackState.UNCERTAIN:
            return
        frame = track.frames[frame_idx]
        if frame.instance_rgb is None:
            return
        if self.config.use_direct_refinement:
            self._direct_refine_motion(track, frame_idx)
        rel_pose = track.get_frame_pose(frame_idx)
        if rel_pose is None:
            return
        engine = track.reconstruction
        engine.set_view_device(frame.instance_rgb, frame.instance_depth_m)
        engine.set_pose(rel_pose.astype(np.float32))
        engine.integrate()
        if self.config.decay.enabled:
            engine.decay()
        track.needs_cleanup = True
        track.count_fused_frame()
        # free the previous frame's view memory (the reference discards it
        # post-fusion too, InstanceReconstructor.cpp:688-694)
        if frame_idx >= 1:
            track.frames[frame_idx - 1].instance_rgb = None
            track.frames[frame_idx - 1].instance_depth_m = None

    # ------------------------------------------------------------------
    # compositing (InstanceReconstructor.cpp:851-990)
    def _instance_render_pose(self, track: Track, view_w2c: np.ndarray):
        """cam_to_world (in the VOLUME frame) for rendering the track's
        volume from a camera at world-to-cam `view_w2c`:
        p_view = view_w2c @ C2W_k @ chain_k @ p_vol  =>
        volume-frame w2c = view_w2c @ C2W_k @ chain_k."""
        k = len(track.frames) - 1
        chain = track.get_frame_pose(k)
        if chain is None:
            return None
        cam_pose_w2c = track.frames[k].camera_pose
        vol_w2c = view_w2c @ np.linalg.inv(cam_pose_w2c) @ chain
        return np.linalg.inv(vol_w2c)

    def _active_renderable_tracks(self):
        return [
            t for t in self.tracker.active_tracks.values()
            if t.has_reconstruction() and t.end_time == self.frame_idx
        ]

    def _batched_track_raycasts(self, view_w2c: np.ndarray):
        """One batched raycast over every renderable track's volume
        (replaces the serial per-track render of CompositeInstances,
        InstanceReconstructor.cpp:933-990). Returns (tracks, stacked
        Raycast) or (empty, None). Tracks whose reconstruction handle is
        not a pool slot (e.g. the fused pipeline's) fall back to per-track
        renders by the caller."""
        tracks, slots, poses = [], [], []
        for track in self._active_renderable_tracks():
            pose = self._instance_render_pose(track, view_w2c)
            if pose is None:
                continue
            tracks.append((track, pose))
            handle = track.reconstruction
            if hasattr(handle, "pool") and hasattr(handle, "slot"):
                slots.append(handle.slot)
                poses.append(pose)
        if not tracks:
            return [], None
        if len(slots) == len(tracks):
            pool = tracks[0][0].reconstruction.pool
            return tracks, pool.raycast_many(slots, poses)
        return tracks, None

    def composite_instance_depth_maps(self, depth: np.ndarray,
                                      cam_to_world: Optional[np.ndarray],
                                      dyn_slam) -> np.ndarray:
        """Z-merge instance raycast depth into the static depth render
        (CompositeInstanceDepthMaps, :911-931) — all tracks rendered in
        one dispatch and merged in one executable."""
        import jax.numpy as jnp

        view_w2c = (
            np.linalg.inv(cam_to_world)
            if cam_to_world is not None
            else dyn_slam.get_current_pose()
        )
        tracks, rc_b = self._batched_track_raycasts(view_w2c)
        if not tracks:
            return depth
        if rc_b is not None:
            n = len(tracks)
            return np.asarray(mask_ops.composite_depth_many(
                jnp.asarray(depth), rc_b.depth, jnp.ones(n, bool)
            ))
        out = jnp.asarray(depth)
        for track, pose in tracks:
            rc = track.reconstruction.get_raycast(pose)
            out = mask_ops.composite_depth(out, rc.depth)
        return np.asarray(out)

    def composite_instances(self, color: np.ndarray, preview: PreviewType,
                            cam_to_world: Optional[np.ndarray],
                            dyn_slam) -> np.ndarray:
        """Composite instance renders into the static color preview with
        per-track tints (CompositeInstances, :933-990) — one batched
        raycast + one merge executable for all visible tracks."""
        import jax.numpy as jnp

        view_w2c = (
            np.linalg.inv(cam_to_world)
            if cam_to_world is not None
            else dyn_slam.get_current_pose()
        )
        tracks, rc_b = self._batched_track_raycasts(view_w2c)
        if not tracks:
            return color
        static_depth = jnp.asarray(
            dyn_slam.static_scene.get_raycast(
                cam_to_world if cam_to_world is not None else None
            ).depth
        )
        out_color = jnp.asarray(color)
        if rc_b is not None:
            n = len(tracks)
            tints = jnp.stack([
                jnp.asarray(PALETTE[t.id % len(PALETTE)], jnp.float32)
                for t, _ in tracks
            ])
            out_color, _ = mask_ops.composite_color_many(
                out_color, static_depth, rc_b.color, rc_b.depth, tints,
                jnp.ones(n, bool),
            )
            return np.asarray(out_color)
        for track, pose in tracks:
            rc = track.reconstruction.get_raycast(pose)
            tint = jnp.asarray(PALETTE[track.id % len(PALETTE)])
            out_color, static_depth = mask_ops.composite_color(
                out_color, static_depth, rc.color, rc.depth, tint
            )
        return np.asarray(out_color)

    # -- previews (GetInstancePreviewRGB/Depth, :287-313) -----------------
    def get_instance_preview_rgb(self, track_id: int):
        if not self.tracker.has_track(track_id):
            return None
        f = self.tracker.get_track(track_id).last_frame
        return None if f.instance_rgb is None else np.asarray(f.instance_rgb)

    def get_instance_preview_depth(self, track_id: int):
        if not self.tracker.has_track(track_id):
            return None
        f = self.tracker.get_track(track_id).last_frame
        return (
            None if f.instance_depth_m is None else np.asarray(f.instance_depth_m)
        )

    def save_object_to_mesh(self, track_id: int, path: str) -> None:
        """Marching-cubes export of one object volume
        (SaveObjectToMesh, InstanceReconstructor.cpp:736-763)."""
        from dynslam_tpu.viz.meshing import save_engine_mesh

        track = self.tracker.get_track(track_id)
        assert track.has_reconstruction(), "track has no reconstruction"
        save_engine_mesh(track.reconstruction, path)
