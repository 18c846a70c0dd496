"""Batched instance-volume pool: parity with per-engine fusion, one
vmapped call per frame regardless of track count, slot lifecycle."""

import jax
import jax.numpy as jnp
import numpy as np

import dynslam_tpu.instances.volume_pool as vp
from dynslam_tpu.config import VoxelDecayParams
from dynslam_tpu.ops import tsdf
from dynslam_tpu.pipeline.mapping import MapEngine


def _cfg():
    return tsdf.TsdfConfig(
        pool_capacity=1024,
        local_dims=(24, 16, 32),
        max_new_blocks=512,
        max_visible_blocks=1024,
        voxel_size=0.07,
        mu=0.5,
        raycast_coarse_steps=16,
        raycast_fine_steps=12,
        width=96,
        height=64,
        fx=80.0,
        fy=80.0,
        cx=48.0,
        cy=32.0,
        raycast_cand_k=128,
    )


def _view(seed):
    cfg = _cfg()
    h, w = cfg.height, cfg.width
    rng = np.random.default_rng(seed)
    vv, uu = np.mgrid[0:h, 0:w].astype(np.float32)
    depth = np.clip(2.5 + 0.4 * seed + np.sin(uu / 20.0 + seed), 1.0, 9.0)
    rgb = rng.integers(0, 255, (h, w, 3)).astype(np.uint8)
    return jnp.asarray(rgb), jnp.asarray(depth.astype(np.float32))


def test_pool_parity_with_map_engine():
    cfg = _cfg()
    decay = VoxelDecayParams(enabled=False)
    pool = vp.InstanceVolumePool(cfg, decay, capacity=4)
    vol = pool.acquire_volume()
    engine = MapEngine(cfg, decay, use_pallas_fusion=False,
                       use_pallas_raycast=False)

    rgb, depth = _view(1)
    pose = np.eye(4, dtype=np.float32)
    for obj in (vol, engine):
        obj.set_view_device(rgb, depth)
        obj.set_pose(pose)
        obj.integrate()
    pool.flush()

    np.testing.assert_array_equal(
        np.asarray(vol.state.tsdf_w), np.asarray(engine.state.tsdf_w)
    )
    np.testing.assert_array_equal(
        np.asarray(vol.state.color), np.asarray(engine.state.color)
    )
    assert vol.get_used_block_count() == engine.get_used_block_count() > 0

    # raycast through the pool slice matches the engine's
    rc_p = vol.get_raycast(pose)
    rc_e = engine.get_raycast(pose)
    np.testing.assert_allclose(
        np.asarray(rc_p.depth), np.asarray(rc_e.depth), atol=1e-5
    )


def test_pool_batches_multiple_tracks(monkeypatch):
    cfg = _cfg()
    pool = vp.InstanceVolumePool(
        cfg, VoxelDecayParams(enabled=False), capacity=8
    )
    calls = []
    orig = vp._fuse_batch

    def spy(c, states, rgbs, *a, **k):
        calls.append(rgbs.shape[0])
        return orig(c, states, rgbs, *a, **k)

    monkeypatch.setattr(vp, "_fuse_batch", spy)

    vols = [pool.acquire_volume() for _ in range(4)]
    for i, v in enumerate(vols):
        rgb, depth = _view(i)
        v.set_view_device(rgb, depth)
        v.set_pose(np.eye(4, dtype=np.float32))
        v.integrate()
    pool.flush()

    # 4 simultaneous cars: ONE vmapped call of batch 4, not 4 calls
    assert calls == [4]
    used = [v.get_used_block_count() for v in vols]
    assert all(u > 0 for u in used)
    assert len(set(used)) > 1  # different scenes -> different volumes

    # inactive-slot padding left untouched slots bit-fresh
    v5 = pool.acquire_volume()
    assert v5.get_used_block_count() == 0


def test_pool_lifecycle_release_reset():
    cfg = _cfg()
    pool = vp.InstanceVolumePool(
        cfg, VoxelDecayParams(enabled=False), capacity=2
    )
    a = pool.acquire_volume()
    b = pool.acquire_volume()
    assert pool.acquire_volume() is None  # exhausted

    rgb, depth = _view(2)
    a.set_view_device(rgb, depth)
    a.set_pose(np.eye(4, dtype=np.float32))
    a.integrate()
    pool.flush()
    assert a.get_used_block_count() > 0

    n = a.reap(100.0)  # aggressive reap empties the volume
    assert n > 0 and a.get_used_block_count() == 0

    a.release()
    c = pool.acquire_volume()  # slot is reusable and fresh
    assert c is not None and c.get_used_block_count() == 0


def test_raycast_many_matches_serial():
    """Batched multi-track rendering (raycast_many + composite_*_many)
    must be pixel-identical to the serial per-slot path."""
    from dynslam_tpu.ops import masks as mask_ops

    cfg = _cfg()
    pool = vp.InstanceVolumePool(
        cfg, VoxelDecayParams(enabled=False), capacity=8
    )
    vols = [pool.acquire_volume() for _ in range(3)]
    for i, v in enumerate(vols):
        rgb, depth = _view(i)
        v.set_view_device(rgb, depth)
        v.set_pose(np.eye(4, dtype=np.float32))
        v.integrate()
    pool.flush()

    pose = np.eye(4, dtype=np.float32)
    pose[2, 3] = -0.3
    slots = [v.slot for v in vols]
    rc_b = pool.raycast_many(slots, [pose] * 3)
    assert rc_b.depth.shape[0] == 3

    serial = [pool.raycast(s, pose) for s in slots]
    for k in range(3):
        db = np.asarray(rc_b.depth[k])
        ds = np.asarray(serial[k].depth)
        # the batched executable fuses float ops differently, so a few
        # pixels sitting exactly on an SDF crossing move by <1 cm
        assert (db > 0).sum() == (ds > 0).sum()
        diff = np.abs(db - ds)
        assert (diff > 1e-5).mean() < 1e-3 and diff.max() < 0.01
        cb = np.asarray(rc_b.color[k]).astype(int)
        cs = np.asarray(serial[k].color).astype(int)
        assert (np.abs(cb - cs).max(-1) > 0).mean() < 1e-3

    # composite merges identical to the sequential loop
    h, w = cfg.height, cfg.width
    static_d = jnp.asarray(
        np.random.default_rng(0).uniform(0, 6, (h, w)).astype(np.float32)
    )
    # merge logic itself is sequential-loop-identical (same rc inputs)
    merged_b = mask_ops.composite_depth_many(
        static_d, rc_b.depth, jnp.ones(3, bool)
    )
    merged_s = static_d
    for k in range(3):
        merged_s = mask_ops.composite_depth(merged_s, rc_b.depth[k])
    np.testing.assert_allclose(
        np.asarray(merged_b), np.asarray(merged_s), atol=0
    )

    tints = jnp.asarray(
        np.random.default_rng(1).uniform(0, 255, (3, 3)).astype(np.float32)
    )
    base_c = jnp.zeros((h, w, 3), jnp.uint8)
    col_b, _ = mask_ops.composite_color_many(
        base_c, static_d, rc_b.color, rc_b.depth, tints, jnp.ones(3, bool)
    )
    col_s, d_s = base_c, static_d
    for k in range(3):
        col_s, d_s = mask_ops.composite_color(
            col_s, d_s, rc_b.color[k], rc_b.depth[k], tints[k]
        )
    np.testing.assert_array_equal(np.asarray(col_b), np.asarray(col_s))
