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
    assert cur == total == 38 + 9 * 4 + 2 + 2  # + used/decayed telemetry


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


class TestCropFusion:
    """Bbox-crop instance fusion (config.instance_map.fusion_crop): with
    a 4-aligned crop origin covering the mask, fusing the crop with a
    shifted principal point allocates the identical block set and fuses
    identical voxels up to float-reassociation rounding of borderline
    pixels (cut views are zero outside the mask; stride-4 allocation
    keeps its pixel phase)."""

    def _cfg(self, w, h):
        import dataclasses

        from dynslam_tpu.ops import tsdf

        return tsdf.TsdfConfig(
            pool_capacity=512, local_dims=(24, 16, 32), max_new_blocks=256,
            max_visible_blocks=256, voxel_size=0.05, mu=0.3,
            max_weight=100.0, min_depth=0.5, max_depth=20.0,
            use_depth_weighting=False, raycast_coarse_steps=8,
            raycast_fine_steps=8, width=w, height=h,
            fx=120.0, fy=120.0, cx=w / 2.0, cy=h / 2.0,
        ), dataclasses

    def test_crop_fusion_bit_identical_to_full_frame(self):
        import jax.numpy as jnp

        from dynslam_tpu.ops import tsdf

        W, H = 320, 160
        CH, CW = 64, 128
        cfg, dataclasses = self._cfg(W, H)
        cfg_crop = dataclasses.replace(cfg, width=CW, height=CH)

        # a masked "car" view: depth only inside a blob, zero elsewhere
        depth = np.zeros((H, W), np.float32)
        rng = np.random.default_rng(3)
        depth[70:110, 180:260] = 6.0 + 0.3 * rng.random((40, 80))
        rgb = np.zeros((H, W, 3), np.uint8)
        rgb[70:110, 180:260] = rng.integers(0, 255, (40, 80, 3))
        w2c = np.eye(4, dtype=np.float32)
        c2w = np.eye(4, dtype=np.float32)
        fidx = jnp.int32(1)

        def fuse(cfg_f, d, im, intr4):
            st = tsdf.create_state(cfg_f)
            org = tsdf.compute_origin(cfg_f, jnp.asarray(c2w))
            grid = tsdf.build_local_grid(cfg_f, st, org)
            st, grid, _ = tsdf.allocate(
                cfg_f, st, grid, org, jnp.asarray(d), jnp.asarray(c2w),
                fidx, intr4=intr4,
            )
            slots, mask = tsdf.visible_blocks(
                cfg_f, st, grid, org, jnp.asarray(w2c), intr4=intr4
            )
            return tsdf.integrate(
                cfg_f, st, slots, mask, jnp.asarray(im), jnp.asarray(d),
                jnp.asarray(w2c), fidx, intr4=intr4,
            )

        full = fuse(cfg, depth, rgb, None)
        # 4-aligned crop covering the blob (rows 70:110, cols 180:260)
        u0, v0 = 168, 60
        crop_d = depth[v0: v0 + CH, u0: u0 + CW]
        crop_im = rgb[v0: v0 + CH, u0: u0 + CW]
        intr4 = jnp.asarray(
            [cfg.fx, cfg.fy, cfg.cx - u0, cfg.cy - v0], jnp.float32
        )
        crop = fuse(cfg_crop, crop_d, crop_im, intr4)

        n_full = int(tsdf.memory_stats(cfg, full)[0])
        assert n_full > 10
        assert int(tsdf.memory_stats(cfg_crop, crop)[0]) == n_full
        # pool contents bit-identical (same slot order: same scan order)
        assert (np.asarray(full.tsdf_w) == np.asarray(crop.tsdf_w)).all()
        assert (np.asarray(full.color) == np.asarray(crop.color)).all()
        assert (
            np.asarray(full.block_coords) == np.asarray(crop.block_coords)
        ).all()

    @pytest.mark.slow
    def test_pipeline_small_crop_matches_full_crop(self, seq):
        """End-to-end: the same sequence through a (64, 128)-crop
        pipeline reconstructs the identical instance volume as the
        full-frame-crop one (masks fit the small crop)."""
        import dataclasses

        import jax.numpy as jnp

        from dynslam_tpu.ops import depth as depth_ops
        from dynslam_tpu.pipeline.builder import build_dynslam

        def run(crop):
            cfg = dynamic_config()
            dyn2, inp = build_dynslam(seq, cfg, with_instances=True,
                                      min_detection_size_px=8)
            cfg = dyn2.config
            if crop is not None:
                cfg = dataclasses.replace(
                    cfg, instance_map=dataclasses.replace(
                        cfg.instance_map, fusion_crop=crop
                    )
                )
            segp = PrecomputedSegmentationProvider(
                seq + "/seg_image_2/mnc", min_detection_size_px=8
            )
            pipe = FusedDynamicPipeline(cfg, cfg.calibration,
                                        use_pallas=False)
            while inp.has_more_images():
                inp.read_next_frame()
                rgb, _ = inp.get_images()
                right_rgb = inp.get_stereo_color()[1]
                lg = np.asarray(depth_ops.rgb_to_gray(rgb))
                rg = np.asarray(depth_ops.rgb_to_gray(right_rgb))
                dets = segp.segment_frame(rgb).instance_detections
                pipe.process_frame(lg, rg, rgb, dets)
            pipe.finalize()
            return pipe

        small = run((64, 128))
        assert small.crop_h == 64 and small.crop_w == 128
        big = run(None)  # default crop >= frame -> full-frame fusion
        t_s = list(small.tracker.active_tracks.values())[0]
        t_b = list(big.tracker.active_tracks.values())[0]
        assert t_s.has_reconstruction() and t_b.has_reconstruction()
        st_s = t_s.reconstruction.state
        st_b = t_b.reconstruction.state
        # identical allocation (same blocks, same count) ...
        n_s = t_s.reconstruction.get_used_block_count()
        assert n_s == t_b.reconstruction.get_used_block_count() > 50
        coords_s = {tuple(c) for c, v in zip(
            np.asarray(st_s.block_coords), np.asarray(st_s.valid)) if v}
        coords_b = {tuple(c) for c, v in zip(
            np.asarray(st_b.block_coords), np.asarray(st_b.valid)) if v}
        assert coords_s == coords_b
        # ... and voxel-identical contents up to float reassociation:
        # the shifted principal point changes `x/z*fx + cx` rounding for
        # borderline pixels, so allow a few boundary blocks to differ
        slot_b = {tuple(c): i for i, c in enumerate(
            np.asarray(st_b.block_coords)) if np.asarray(st_b.valid)[i]}
        ws, wb = np.asarray(st_s.tsdf_w), np.asarray(st_b.tsdf_w)
        mismatched = sum(
            1 for i, c in enumerate(np.asarray(st_s.block_coords))
            if np.asarray(st_s.valid)[i]
            and not (ws[i] == wb[slot_b[tuple(c)]]).all()
        )
        assert mismatched <= max(2, n_s // 50), mismatched


@pytest.mark.slow
def test_dispatch_lag2_matches_lag1(seq):
    """dispatch_lag=2 (device never waits on the packed fetch): same
    tracking outcome as lag 1 — the car goes DYNAMIC, reconstructs into
    a volume of similar size (transitions shift by one frame so one
    fewer view may fuse), VO trajectory identical, pending buffers fully
    drained by finalize's two-deep flush."""
    import jax.numpy as jnp  # noqa: F401

    from dynslam_tpu.ops import depth as depth_ops

    def run(lag):
        cfg = dynamic_config()
        dyn2, inp = build_dynslam(seq, cfg, with_instances=True,
                                  min_detection_size_px=8)
        cfg = dyn2.config
        segp = PrecomputedSegmentationProvider(
            seq + "/seg_image_2/mnc", min_detection_size_px=8
        )
        pipe = FusedDynamicPipeline(cfg, cfg.calibration, use_pallas=False,
                                    dispatch_lag=lag)
        while inp.has_more_images():
            inp.read_next_frame()
            rgb, _ = inp.get_images()
            right_rgb = inp.get_stereo_color()[1]
            lg = np.asarray(depth_ops.rgb_to_gray(rgb))
            rg = np.asarray(depth_ops.rgb_to_gray(right_rgb))
            dets = segp.segment_frame(rgb).instance_detections
            pipe.process_frame(lg, rg, rgb, dets)
        pipe.finalize()
        return pipe

    p2 = run(2)
    p1 = run(1)
    t1 = list(p1.tracker.active_tracks.values())[0]
    t2 = list(p2.tracker.active_tracks.values())[0]
    assert t2.state == TrackState.DYNAMIC
    assert t2.has_reconstruction()
    # one-frame-later transitions cost at most one fused view
    assert t2.fused_frames >= t1.fused_frames - 1 >= 1
    n1 = t1.reconstruction.get_used_block_count()
    n2 = t2.reconstruction.get_used_block_count()
    assert n2 > 0.5 * n1
    # identical VO (the protocols only reorder host work)
    for k in range(1, N_FRAMES + 1):
        d = np.linalg.norm(
            p1.pose_history[k][:3, 3] - p2.pose_history[k][:3, 3]
        )
        assert d < 1e-4, f"pose_history[{k}]: {d}"
    # finalize drained both pending levels
    assert not (np.asarray(p2.carry.pending_depth) > 0).any()
    assert not (np.asarray(p2.carry.prev_pending_depth) > 0).any()
    # static maps agree (same cut decisions one frame shifted)
    assert 0.8 * p1.get_used_block_count() < p2.get_used_block_count() \
        < 1.25 * p1.get_used_block_count()


@pytest.mark.slow
def test_many_detections_tracked_uint16_planes():
    """VERDICT r3 item 5: K mask slots follow max_detections past the
    old hard 8-cap (uint16 bit-planes); a frame with 10 cars tracks all
    10, overflow beyond K is counted + logged (largest-first priority),
    never silent."""
    import dataclasses

    from dynslam_tpu.config import InstanceMapParams
    from dynslam_tpu.io.segmentation import detections_from_instance_ids

    Wt, Ht = 320, 96
    objid = np.zeros((Ht, Wt), np.int16)
    for i in range(10):
        x0 = 4 + i * 31
        objid[30:54, x0: x0 + 24] = i + 1
    dets10 = detections_from_instance_ids(objid, min_size_px=8)
    assert len(dets10) == 10

    cfg = dataclasses.replace(
        dynamic_config(),
        instance_map=InstanceMapParams(
            blocks_per_object=512, local_dims=(32, 16, 48),
            max_new_blocks_per_frame=256, max_objects=4, max_detections=16,
        ),
    )
    cfg = dataclasses.replace(cfg, frame_width=Wt, frame_height=Ht)
    pipe = FusedDynamicPipeline(cfg, cfg.calibration, use_pallas=False)
    assert pipe.K == 16 and pipe.S == 4

    db, cb = pipe.pack_mask_bits(dets10, Ht, Wt, pipe.K)
    assert db.dtype == np.uint16 and cb.dtype == np.uint16
    # bit j set exactly inside detection j's delete mask
    for j in (0, 9):
        m = dets10[j].delete_mask.to_full_frame(Ht, Wt)
        assert ((db >> j) & 1 == 1)[m].all()
        assert not ((db >> j) & 1 == 1)[~m].any()

    rng = np.random.default_rng(0)
    lg = rng.uniform(0, 255, (Ht, Wt)).astype(np.float32)
    pipe.process_frame(lg, lg, None, [])          # bootstrap
    pipe.process_frame(lg, lg, None, dets10)      # all 10 fit the slots
    assert len(pipe.tracker.active_tracks) == 10
    assert pipe._dropped_detections == 0

    # 20 detections > K=16: 4 dropped, counted (and logged to stderr)
    objid20 = np.zeros((Ht, Wt), np.int16)
    for i in range(20):
        x0 = 2 + i * 15
        objid20[10 + (i % 2) * 44: 32 + (i % 2) * 44, x0: x0 + 12] = i + 1
    dets20 = detections_from_instance_ids(objid20, min_size_px=4)
    assert len(dets20) == 20
    pipe.process_frame(lg, lg, None, dets20)
    assert pipe._dropped_detections == 4


@pytest.mark.slow
def test_k_past_16_uses_uint32_planes():
    """VERDICT r4 weak 6: the K ceiling is 32 (uint32 bit-planes), not a
    uint16 dtype artifact — max_detections=20 yields 20 live mask slots
    and a 20-car frame tracks every one with zero drops."""
    import dataclasses

    from dynslam_tpu.config import InstanceMapParams
    from dynslam_tpu.io.segmentation import detections_from_instance_ids

    Wt, Ht = 320, 96
    objid20 = np.zeros((Ht, Wt), np.int16)
    for i in range(20):
        x0 = 2 + i * 15
        objid20[10 + (i % 2) * 44: 32 + (i % 2) * 44, x0: x0 + 12] = i + 1
    dets20 = detections_from_instance_ids(objid20, min_size_px=4)
    assert len(dets20) == 20

    cfg = dataclasses.replace(
        dynamic_config(),
        instance_map=InstanceMapParams(
            blocks_per_object=512, local_dims=(32, 16, 48),
            max_new_blocks_per_frame=256, max_objects=4, max_detections=20,
        ),
    )
    cfg = dataclasses.replace(cfg, frame_width=Wt, frame_height=Ht)
    pipe = FusedDynamicPipeline(cfg, cfg.calibration, use_pallas=False)
    assert pipe.K == 20 and pipe.S == 4

    db, cb = pipe.pack_mask_bits(dets20, Ht, Wt, pipe.K)
    assert db.dtype == np.uint32 and cb.dtype == np.uint32
    for j in (16, 19):  # slots past the old uint16 ceiling
        m = dets20[j].delete_mask.to_full_frame(Ht, Wt)
        assert ((db >> np.uint32(j)) & 1 == 1)[m].all()
        assert not ((db >> np.uint32(j)) & 1 == 1)[~m].any()

    rng = np.random.default_rng(2)
    lg = rng.uniform(0, 255, (Ht, Wt)).astype(np.float32)
    pipe.process_frame(lg, lg, None, [])        # bootstrap
    pipe.process_frame(lg, lg, None, dets20)    # all 20 fit the slots
    assert len(pipe.tracker.active_tracks) == 20
    assert pipe._dropped_detections == 0
    pipe.process_frame(lg, lg, None, dets20)
    pipe.finalize()
    # the high slots' cuts actually removed pixels from the static view
    # (pending buffers drained through fusion without error)
    assert np.all(np.isfinite(np.asarray(pipe.carry.pose_w2c)))


def _run_fused_with_instance_map(seq_root, **imp_kw):
    import dataclasses

    from dynslam_tpu.config import InstanceMapParams

    cfg = dynamic_config()
    base = dataclasses.asdict(cfg.instance_map)
    base.update(blocks_per_object=1024, local_dims=(48, 24, 64),
                max_new_blocks_per_frame=512, **imp_kw)
    cfg = dataclasses.replace(cfg, instance_map=InstanceMapParams(**base))
    dyn, inp = build_dynslam(seq_root, cfg, with_instances=True,
                             min_detection_size_px=8)
    cfg = dyn.config
    segp = PrecomputedSegmentationProvider(
        seq_root + "/seg_image_2/mnc", min_detection_size_px=8
    )
    pipe = FusedDynamicPipeline(cfg, cfg.calibration, use_pallas=False)
    while inp.has_more_images():
        inp.read_next_frame()
        rgb, _ = inp.get_images()
        right_rgb = inp.get_stereo_color()[1]
        lg = np.asarray(depth_ops.rgb_to_gray(rgb))
        rg = np.asarray(depth_ops.rgb_to_gray(right_rgb))
        dets = segp.segment_frame(rgb).instance_detections
        pipe.process_frame(lg, rg, rgb, dets)
    pipe.finalize()
    return pipe


def _slot_blocks(pipe):
    tracks = [t for t in pipe.tracker.active_tracks.values()
              if t.has_reconstruction()]
    assert len(tracks) == 1
    return tracks[0].reconstruction.get_used_block_count()


@pytest.mark.slow
def test_oversize_mask_fullframe_fallback(seq):
    """VERDICT r4 item 4: a car mask whose bbox exceeds the fusion crop
    must not lose fused voxels — the full-frame fallback executable fuses
    the whole masked view (the reference always fuses the full view,
    InstanceReconstructor.cpp:569-700). With the fallback disabled the
    loss is counted, logged, and lands in the tracker CSV."""
    # B: crop clamps to the whole frame -> reference behavior, no
    # truncation possible
    full = _run_fused_with_instance_map(seq, fusion_crop=(H, W))
    assert full.oversize_masks == 0 and full.truncated_pixels == 0
    n_full = _slot_blocks(full)
    assert n_full > 100

    # A: crop smaller than the car's mask bbox + fallback (default on)
    crop = (24, 32)
    fb = _run_fused_with_instance_map(seq, fusion_crop=crop)
    assert fb.oversize_masks > 0, (
        "fixture car mask never exceeded the crop — shrink the crop"
    )
    assert fb.truncated_pixels == 0
    n_fb = _slot_blocks(fb)
    assert n_fb == n_full, (
        f"full-frame fallback lost voxels: {n_fb} vs {n_full} blocks"
    )

    # C: same crop, fallback disabled -> truncation, counted
    tr = _run_fused_with_instance_map(seq, fusion_crop=crop,
                                      oversize_mask_fallback=False)
    assert tr.oversize_masks > 0
    assert tr.truncated_pixels > 0
    n_tr = _slot_blocks(tr)
    assert n_tr < n_full, (
        f"truncated crop should fuse fewer blocks: {n_tr} vs {n_full}"
    )


def test_bit31_survives_the_int32_bit_math():
    """Slot 31's mask bit rides the int32 sign position; _bits_i32 must
    bitcast (not value-convert) uint32 planes so the per-slot tests
    still select exactly slot 31's pixels (CLAUDE.md trap 7)."""
    import jax.numpy as jnp

    from dynslam_tpu.io.segmentation import detections_from_instance_ids
    from dynslam_tpu.pipeline.fused_dynamic import _bits_i32

    Wt, Ht = 320, 96
    objid = np.zeros((Ht, Wt), np.int16)
    for i in range(32):
        x0 = (i % 16) * 20 + 2
        y0 = 8 + (i // 16) * 44
        objid[y0: y0 + 14, x0: x0 + 14] = i + 1
    dets = detections_from_instance_ids(objid, min_size_px=4)
    assert len(dets) == 32
    db, _ = FusedDynamicPipeline.pack_mask_bits(dets, Ht, Wt, 32)
    assert db.dtype == np.uint32
    m31 = dets[31].delete_mask.to_full_frame(Ht, Wt)
    assert ((db >> np.uint32(31)) & 1 == 1).sum() == m31.sum()

    bits = _bits_i32(jnp.asarray(db))
    sel31 = np.asarray(((bits >> 31) & 1) == 1)
    np.testing.assert_array_equal(sel31, m31)
    # AND against a bit-31 mask built the way the step builds rem_bits
    jidx = jnp.arange(32, dtype=jnp.int32)
    rem = jnp.sum(jnp.where(jidx == 31, 1 << jidx, 0))
    np.testing.assert_array_equal(np.asarray((bits & rem) != 0), m31)


def test_unaligned_frame_edge_mask_covered_by_crop():
    """A mask touching the bottom/right edge of a 4-UNALIGNED frame must
    fuse through the normal crop path. The step pads the frame to
    4-aligned dims before cropping; without the pad, NO 4-aligned window
    origin can cover the last h%4 rows / w%4 cols (at KITTI 1242x375
    that is 3 rows + 2 cols), so every mask touching the frame bottom
    falsely took the ~110 ms full-frame oversize fallback."""
    import dataclasses

    from dynslam_tpu.config import InstanceMapParams
    from dynslam_tpu.io.segmentation import detections_from_instance_ids

    Wt, Ht = 158, 117  # 158 % 4 == 2, 117 % 4 == 1
    objid = np.zeros((Ht, Wt), np.int16)
    objid[90:117, 120:158] = 1  # touches the bottom AND right edges
    dets = detections_from_instance_ids(objid, min_size_px=8)
    assert len(dets) == 1
    bb = dets[0].copy_mask.bbox
    assert bb.y1 == Ht - 1 and bb.x1 == Wt - 1

    cfg = dataclasses.replace(
        dynamic_config(),
        instance_map=InstanceMapParams(
            blocks_per_object=512, local_dims=(32, 16, 48),
            max_new_blocks_per_frame=256, max_objects=2,
            max_detections=4, fusion_crop=(64, 96),
        ),
    )
    cfg = dataclasses.replace(cfg, frame_width=Wt, frame_height=Ht)
    pipe = FusedDynamicPipeline(cfg, cfg.calibration, use_pallas=False)

    rng = np.random.default_rng(3)
    lg = rng.uniform(0, 255, (Ht, Wt)).astype(np.float32)
    pipe.process_frame(lg, lg, None, [])  # bootstrap
    pipe.process_frame(lg, lg, None, dets)

    # host coverage math: the padded clamp covers the edge pixels
    trunc = pipe._dispatch_meta[5]["trunc_px"]
    assert int(trunc.sum()) == 0, "edge mask flagged oversize"
    # device crop origin reached the PADDED clamp (hp, wp = 120, 160):
    # u0 = wp - CW = 64, v0 = hp - CH = 56. The unpadded clamps aligned
    # down to (60, 52), whose windows end at col 155 / row 115 — short
    # of the mask's col 157 / row 116.
    org = np.asarray(pipe.carry.pending_org[0])
    assert org.tolist() == [64, 56], org


@pytest.mark.slow
def test_overlapping_masks_cut_exclusively():
    """VERDICT r3 item 6: two OVERLAPPING car masks. The staged path cuts
    sequentially (ProcessSilhouette_CPU, InstanceReconstructor.cpp:59-170):
    a later track's copy reads a view earlier tracks already deleted
    from, so every overlapped pixel lands in exactly ONE instance view.
    The fused path must honor the same semantics (earlier slot wins)."""
    import dataclasses

    from dynslam_tpu.config import InstanceMapParams
    from dynslam_tpu.io.segmentation import detections_from_instance_ids

    Wt, Ht = 256, 96
    oa = np.zeros((Ht, Wt), np.int16)
    oa[30:60, 60:110] = 1
    ob = np.zeros((Ht, Wt), np.int16)
    ob[30:60, 98:150] = 2  # overlaps A in columns 98..109
    det_a = detections_from_instance_ids(oa, min_size_px=8)[0]
    det_b = detections_from_instance_ids(ob, min_size_px=8)[0]

    cfg = dataclasses.replace(
        dynamic_config(),
        instance_map=InstanceMapParams(
            blocks_per_object=512, local_dims=(32, 16, 48),
            max_new_blocks_per_frame=256, max_objects=2, max_detections=4,
        ),
    )
    cfg = dataclasses.replace(cfg, frame_width=Wt, frame_height=Ht)
    pipe = FusedDynamicPipeline(cfg, cfg.calibration, use_pallas=False)
    # fusion crop clamps to the frame -> crops are full-frame (org = 0)
    assert (pipe.crop_h, pipe.crop_w) == (Ht, Wt)

    rng = np.random.default_rng(1)
    lg = rng.uniform(0, 255, (Ht, Wt)).astype(np.float32)
    rgb = np.full((Ht, Wt, 3), 200, np.uint8)
    pipe.process_frame(lg, lg, rgb, [])            # bootstrap
    pipe.process_frame(lg, lg, rgb, [det_a, det_b])  # speculative cuts
    assert (np.asarray(pipe.carry.pending_org) == 0).all()
    pr = np.asarray(pipe.carry.pending_rgb)  # (K, H, W, 3)
    in_a = pr[0, :, :, 0] > 0
    in_b = pr[1, :, :, 0] > 0

    cm_a = det_a.copy_mask.to_full_frame(Ht, Wt)
    cm_b = det_b.copy_mask.to_full_frame(Ht, Wt)
    dm_a = det_a.delete_mask.to_full_frame(Ht, Wt)
    overlap = cm_b & dm_a
    assert overlap.sum() > 50, "fixture masks must overlap"
    # slot 0 copies its whole mask; slot 1 loses the overlap to slot 0
    assert (in_a == cm_a).all()
    assert not in_b[overlap].any()
    assert in_b[cm_b & ~dm_a].all()
    # the invariant: no pixel is double-fused into two instance views
    assert not (in_a & in_b).any()
