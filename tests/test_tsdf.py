"""TSDF engine tests (BASELINE config 3/4 analogues): fuse known synthetic
depth, raycast back, verify geometry; decay GC semantics; memory stats."""

import numpy as np
import jax.numpy as jnp
import pytest

from dynslam_tpu.config import Intrinsics, StereoCalibration
from dynslam_tpu.io.synthetic import (
    SyntheticScene,
    render_frame,
    straight_trajectory,
)
from dynslam_tpu.ops import tsdf

W, H = 128, 96
INTR = Intrinsics(110.0, 110.0, W / 2, H / 2)
CFG = tsdf.TsdfConfig(
    pool_capacity=8192,
    local_dims=(64, 32, 64),
    max_new_blocks=4096,
    max_visible_blocks=6144,
    voxel_size=0.08,
    mu=0.32,
    raycast_coarse_steps=24,
    raycast_fine_steps=20,
    width=W,
    height=H,
    fx=INTR.fx,
    fy=INTR.fy,
    cx=INTR.cx,
    cy=INTR.cy,
)


def _used(state):
    """Allocated block count excluding the reserved scratch row."""
    return int(tsdf.memory_stats(CFG, state)[0])


def _fuse_frame(state, depth_m, rgb, pose_c2w, frame_idx):
    c2w = jnp.asarray(pose_c2w, jnp.float32)
    w2c = jnp.asarray(np.linalg.inv(pose_c2w), jnp.float32)
    origin = tsdf.compute_origin(CFG, c2w)
    grid = tsdf.build_local_grid(CFG, state, origin)
    state, grid, stats = tsdf.allocate(
        CFG, state, grid, origin, jnp.asarray(depth_m, jnp.float32), c2w,
        jnp.int32(frame_idx),
    )
    slots, mask = tsdf.visible_blocks(CFG, state, grid, origin, w2c)
    state = tsdf.integrate(
        CFG, state, slots, mask, jnp.asarray(rgb, jnp.uint8),
        jnp.asarray(depth_m, jnp.float32), w2c, jnp.int32(frame_idx),
    )
    return state, grid, origin, stats


def _scene_frames(n, with_dynamic=False):
    scene = SyntheticScene.default_scene(seed=7, with_dynamic=with_dynamic)
    poses = straight_trajectory(n, speed=0.3)
    frames = []
    for i in range(n):
        fr = render_frame(scene, poses[i], INTR, W, H, frame=i, supersample=1)
        depth = np.where(
            (fr["depth_m"] >= 0.5) & (fr["depth_m"] <= 20.0), fr["depth_m"], 0.0
        )
        rgb = np.stack([np.clip(fr["gray"] * 255, 0, 255).astype(np.uint8)] * 3, -1)
        frames.append((depth, rgb, poses[i]))
    return frames


class TestAllocation:
    def test_allocates_only_band_blocks(self):
        state = tsdf.create_state(CFG)
        frames = _scene_frames(1)
        depth, rgb, pose = frames[0]
        state, grid, origin, (n_new, n_dropped) = _fuse_frame(state, depth, rgb, pose, 0)
        used = _used(state)
        assert used > 50, "should allocate blocks along visible surfaces"
        assert used < CFG.pool_capacity / 2, "should not allocate everywhere"
        assert int(n_dropped) == 0

    def test_no_realloc_on_same_view(self):
        state = tsdf.create_state(CFG)
        depth, rgb, pose = _scene_frames(1)[0]
        state, *_ = _fuse_frame(state, depth, rgb, pose, 0)
        used1 = _used(state)
        state, _, _, (n_new, _) = _fuse_frame(state, depth, rgb, pose, 1)
        used2 = _used(state)
        assert used2 == used1
        assert int(n_new) == 0

    def test_empty_depth_allocates_nothing(self):
        state = tsdf.create_state(CFG)
        zero = np.zeros((H, W), np.float32)
        rgb = np.zeros((H, W, 3), np.uint8)
        state, _, _, (n_new, _) = _fuse_frame(state, zero, rgb, np.eye(4), 0)
        assert _used(state) == 0 and int(n_new) == 0


class TestFusionRaycast:
    def test_raycast_reproduces_depth(self):
        """Fuse 3 frames of GT depth; raycast from frame 1's pose must
        reproduce the GT depth to within ~voxel size."""
        state = tsdf.create_state(CFG)
        frames = _scene_frames(3)
        for i, (depth, rgb, pose) in enumerate(frames):
            state, grid, origin, _ = _fuse_frame(state, depth, rgb, pose, i)

        depth_gt, _, pose = frames[1]
        c2w = jnp.asarray(pose, jnp.float32)
        origin = tsdf.compute_origin(CFG, c2w)
        grid = tsdf.build_local_grid(CFG, state, origin)
        rc = tsdf.raycast(
            CFG, state, grid, origin, c2w,
            jnp.asarray([INTR.fx, INTR.fy, INTR.cx, INTR.cy], jnp.float32),
        )
        d = np.asarray(rc.depth)
        both = (d > 0) & (depth_gt > 0)
        gt_valid = (depth_gt > 0) & (depth_gt < 19.0)
        coverage = both.sum() / gt_valid.sum()
        assert coverage > 0.75, f"raycast coverage too low: {coverage}"
        err = np.abs(d[both] - depth_gt[both])
        assert np.median(err) < CFG.voxel_size, f"median {np.median(err)}"
        assert np.percentile(err, 90) < 3 * CFG.voxel_size

    def test_raycast_from_shifted_pose(self):
        """Novel-view raycast (free-cam preview, GetImage semantics)."""
        state = tsdf.create_state(CFG)
        frames = _scene_frames(2)
        for i, (depth, rgb, pose) in enumerate(frames):
            state, grid, origin, _ = _fuse_frame(state, depth, rgb, pose, i)
        shifted = frames[0][2].copy()
        shifted[0, 3] += 0.15  # move right 15 cm
        c2w = jnp.asarray(shifted, jnp.float32)
        origin = tsdf.compute_origin(CFG, c2w)
        grid = tsdf.build_local_grid(CFG, state, origin)
        rc = tsdf.raycast(
            CFG, state, grid, origin, c2w,
            jnp.asarray([INTR.fx, INTR.fy, INTR.cx, INTR.cy], jnp.float32),
        )
        assert float(jnp.mean(rc.hit)) > 0.4

    def test_color_fused(self):
        state = tsdf.create_state(CFG)
        depth, rgb, pose = _scene_frames(1)[0]
        state, grid, origin, _ = _fuse_frame(state, depth, rgb, pose, 0)
        rc = tsdf.raycast(
            CFG, state, grid, origin, jnp.asarray(pose, jnp.float32),
            jnp.asarray([INTR.fx, INTR.fy, INTR.cx, INTR.cy], jnp.float32),
        )
        hit = np.asarray(rc.hit)
        col = np.asarray(rc.color)
        # rendered colors correlate with the input image where hit
        src = rgb[..., 0].astype(float)
        dst = col[..., 0].astype(float)
        sel = hit & (depth > 0)
        cc = np.corrcoef(src[sel], dst[sel])[0, 1]
        assert cc > 0.45, f"color correlation too low: {cc}"  # voxel-res color vs px texture

    def test_weights_accumulate_and_cap(self):
        state = tsdf.create_state(CFG)
        depth, rgb, pose = _scene_frames(1)[0]
        for i in range(3):
            state, *_ = _fuse_frame(state, depth, rgb, pose, i)
        w = np.asarray(state.weight)
        assert w.max() == 3.0
        cfg_low = CFG
        assert w.max() <= cfg_low.max_weight


class TestDecay:
    def test_decay_age_gate(self):
        state = tsdf.create_state(CFG)
        depth, rgb, pose = _scene_frames(1)[0]
        state, *_ = _fuse_frame(state, depth, rgb, pose, 0)
        used0 = _used(state)
        # young blocks: nothing decays
        state, n = tsdf.decay(CFG, state, jnp.int32(5), jnp.float32(1.0),
                              jnp.int32(100))
        assert int(n) == 0
        assert _used(state) == used0
        # past min age: weight-1 voxels die, single-view blocks all die
        state, n = tsdf.decay(CFG, state, jnp.int32(200), jnp.float32(1.0),
                              jnp.int32(100))
        assert int(n) == used0
        assert _used(state) == 0
        assert int(state.decayed_blocks) == used0

    def test_decay_spares_heavy_voxels(self):
        state = tsdf.create_state(CFG)
        depth, rgb, pose = _scene_frames(1)[0]
        for i in range(3):  # weight 3 > max_decay_weight 1
            state, *_ = _fuse_frame(state, depth, rgb, pose, i)
        used0 = _used(state)
        state, n = tsdf.decay(CFG, state, jnp.int32(500), jnp.float32(1.0),
                              jnp.int32(100))
        # band-edge voxels may only have been touched once; most blocks stay
        assert _used(state) > used0 * 0.5

    def test_force_all_ignores_age(self):
        state = tsdf.create_state(CFG)
        depth, rgb, pose = _scene_frames(1)[0]
        state, *_ = _fuse_frame(state, depth, rgb, pose, 0)
        state, n = tsdf.decay(CFG, state, jnp.int32(1), jnp.float32(1.0),
                              jnp.int32(10_000), force_all=True)
        assert _used(state) == 0

    def test_freed_slots_reusable(self):
        state = tsdf.create_state(CFG)
        depth, rgb, pose = _scene_frames(1)[0]
        state, *_ = _fuse_frame(state, depth, rgb, pose, 0)
        state, _ = tsdf.decay(CFG, state, jnp.int32(1), jnp.float32(1.0),
                              jnp.int32(0), force_all=True)
        state, _, _, (n_new, n_dropped) = _fuse_frame(state, depth, rgb, pose, 2)
        assert _used(state) > 50
        assert int(n_dropped) == 0


class TestMemoryStats:
    def test_stats(self):
        state = tsdf.create_state(CFG)
        depth, rgb, pose = _scene_frames(1)[0]
        state, *_ = _fuse_frame(state, depth, rgb, pose, 0)
        used, used_b, dec, saved_b = tsdf.memory_stats(CFG, state)
        assert int(used) > 0
        assert int(used_b) == int(used) * 512 * tsdf.BYTES_PER_VOXEL
        assert int(dec) == 0
        state, _ = tsdf.decay(CFG, state, jnp.int32(1), jnp.float32(1.0),
                              jnp.int32(0), force_all=True)
        _, _, dec2, saved2 = tsdf.memory_stats(CFG, state)
        assert int(dec2) == int(used)
        assert int(saved2) == int(used_b)
