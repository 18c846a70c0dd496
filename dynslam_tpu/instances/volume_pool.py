"""Batched per-object TSDF volumes — one pooled `TsdfState` with an
object axis instead of one engine per track.

The reference allocates a fresh InfiniTAM instance per reconstructed
object (`new InfiniTamDriver`, InstanceReconstructor.cpp:363-401) and
fuses each serially. SURVEY §7.1 prescribes a batched object axis for
TPU (many tiny separate dispatches leave the chip idle): here all
per-object volumes live in ONE stacked state of capacity
`InstanceMapParams.max_objects`, and every fusion staged during a frame
executes as a single `vmap`ped allocate->integrate(->decay) call padded
to a power-of-two batch — instance processing cost is flat in the number
of simultaneously tracked vehicles.

Raycasts (needed only for the few composited tracks) slice one object
row out of the pool (row gathers are HBM-speed) and reuse the normal
raycast paths, including the Pallas tiled kernel on TPU.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dynslam_tpu.config import VoxelDecayParams
from dynslam_tpu.ops import tsdf


@partial(jax.jit, static_argnames=("cfg", "do_decay"))
def _fuse_batch(cfg: tsdf.TsdfConfig, states, rgbs, depths, w2cs,
                frame_ids, active, max_decay_weight, min_decay_age,
                do_decay: bool):
    """vmapped per-object fusion; inactive rows come back bit-identical."""

    def one(state, rgb, depth, w2c, fidx, act):
        depth = jnp.where(act, depth, 0.0)
        c2w = jnp.linalg.inv(w2c)
        origin = tsdf.compute_origin(cfg, c2w)
        grid = tsdf.build_local_grid(cfg, state, origin)
        new_state, grid, _ = tsdf.allocate(
            cfg, state, grid, origin, depth, c2w, fidx
        )
        slots, mask = tsdf.visible_blocks(cfg, new_state, grid, origin, w2c)
        new_state = tsdf.integrate(
            cfg, new_state, slots, mask & act, rgb, depth, w2c, fidx
        )
        if do_decay:
            new_state, _ = tsdf.decay(
                cfg, new_state, fidx, max_decay_weight, min_decay_age
            )
        return jax.tree_util.tree_map(
            lambda n, o: jnp.where(act, n, o), new_state, state
        )

    return jax.vmap(one)(states, rgbs, depths, w2cs, frame_ids, active)


@partial(jax.jit, static_argnames=("cfg", "use_pallas", "B"))
def _raycast_batch(cfg: tsdf.TsdfConfig, use_pallas: bool, B: int,
                   states, c2ws):
    """B object raycasts in one executable (slot loop unrolled; the
    scalar-prefetch Pallas grid can't be vmapped, but count-gated tiles
    keep inactive volumes nearly free)."""
    intr = jnp.asarray([cfg.fx, cfg.fy, cfg.cx, cfg.cy], jnp.float32)

    def one(state, c2w):
        origin = tsdf.compute_origin(cfg, c2w)
        grid = tsdf.build_local_grid(cfg, state, origin)
        if use_pallas:
            from dynslam_tpu.ops.pallas_raycast import raycast_tiled

            slots, mask = tsdf.visible_blocks(
                cfg, state, grid, origin, jnp.linalg.inv(c2w)
            )
            return raycast_tiled(cfg, state, slots, mask, origin, c2w, intr)
        return tsdf.raycast(cfg, state, grid, origin, c2w, intr)

    rcs = [
        one(jax.tree_util.tree_map(lambda x: x[s], states), c2ws[s])
        for s in range(B)
    ]
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *rcs)


class InstanceVolumePool:
    """Fixed-capacity pool of per-object volumes with batched fusion."""

    def __init__(self, cfg: tsdf.TsdfConfig, decay_params: VoxelDecayParams,
                 capacity: int):
        assert capacity & (capacity - 1) == 0, "capacity must be a power of 2"
        self.cfg = cfg
        self.decay_params = decay_params
        self.capacity = capacity
        one = tsdf.create_state(cfg)
        self._fresh = one
        self.states = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x[None], (capacity,) + x.shape).copy(),
            one,
        )
        self._free: List[int] = list(range(capacity))
        #: per-slot fused-frame counter (the decay clock, like
        #: MapEngine.frame_idx)
        self.frame_idx = np.zeros(capacity, np.int64)
        self._staged: Dict[int, tuple] = {}
        import jax as _jax

        self._use_pallas_raycast = _jax.default_backend() not in ("cpu",)

    # -- lifecycle -------------------------------------------------------
    def acquire_volume(self) -> Optional["PooledVolume"]:
        if not self._free:
            return None
        slot = self._free.pop()
        self._reset_slot(slot)
        return PooledVolume(self, slot)

    def release(self, slot: int) -> None:
        self._staged.pop(slot, None)
        if slot not in self._free:
            self._free.append(slot)

    def _reset_slot(self, slot: int) -> None:
        self.states = jax.tree_util.tree_map(
            lambda p, f: p.at[slot].set(f), self.states, self._fresh
        )
        self.frame_idx[slot] = 0

    def _slice(self, slot: int) -> tsdf.TsdfState:
        return jax.tree_util.tree_map(lambda x: x[slot], self.states)

    def _write(self, slot: int, state: tsdf.TsdfState) -> None:
        self.states = jax.tree_util.tree_map(
            lambda p, s: p.at[slot].set(s), self.states, state
        )

    # -- batched fusion ---------------------------------------------------
    def stage_fuse(self, slot: int, rgb, depth_m, world_to_cam) -> None:
        """Queue one fusion; flushes first if the slot already has one
        staged (catch-up fusion chains are sequential per volume)."""
        if slot in self._staged:
            self.flush()
        self._staged[slot] = (rgb, depth_m, world_to_cam)

    def flush(self) -> None:
        """Execute all staged fusions as one vmapped call (padded to the
        next power of two with idle slots)."""
        if not self._staged:
            return
        ids = list(self._staged.keys())
        B = 1
        while B < len(ids):
            B *= 2
        pads = [s for s in range(self.capacity) if s not in self._staged]
        ids_p = ids + pads[: B - len(ids)]
        active = np.zeros(B, bool)
        active[: len(ids)] = True

        h, w = self.cfg.height, self.cfg.width
        zeros_rgb = jnp.zeros((h, w, 3), jnp.uint8)
        zeros_d = jnp.zeros((h, w), jnp.float32)
        eye = jnp.eye(4, dtype=jnp.float32)
        rgbs, depths, w2cs, fids = [], [], [], []
        for k, s in enumerate(ids_p):
            if k < len(ids):
                rgb, depth, w2c = self._staged[s]
                rgbs.append(jnp.asarray(rgb, jnp.uint8))
                depths.append(jnp.asarray(depth, jnp.float32))
                w2cs.append(jnp.asarray(w2c, jnp.float32))
            else:
                rgbs.append(zeros_rgb)
                depths.append(zeros_d)
                w2cs.append(eye)
            fids.append(self.frame_idx[s])

        idx = jnp.asarray(ids_p, jnp.int32)
        states_b = jax.tree_util.tree_map(lambda x: x[idx], self.states)
        new_b = _fuse_batch(
            self.cfg, states_b,
            jnp.stack(rgbs), jnp.stack(depths), jnp.stack(w2cs),
            jnp.asarray(fids, jnp.int32), jnp.asarray(active),
            jnp.float32(self.decay_params.max_decay_weight),
            jnp.int32(self.decay_params.min_decay_age),
            bool(self.decay_params.enabled),
        )
        # ids_p entries are distinct -> deterministic scatter-back
        self.states = jax.tree_util.tree_map(
            lambda p, n: p.at[idx].set(n), self.states, new_b
        )
        for s in ids:
            self.frame_idx[s] += 1
        self._staged.clear()

    # -- batched raycast ----------------------------------------------------
    def raycast_many(self, slot_ids, cam_to_worlds) -> tsdf.Raycast:
        """Render several object volumes in ONE dispatch; returns a stacked
        Raycast with a leading axis matching `slot_ids` order.

        The per-track `raycast()` loop in compositing paid one executable
        dispatch (+ one TPU-relay round trip) per visible track
        (InstanceReconstructor.cpp:933-990 renders serially too). Here the
        slot loop is unrolled INSIDE one jitted call — padded to a power of
        two so at most 4 executables ever compile — and the Pallas tiled
        kernel's per-tile early termination makes empty-volume padding
        nearly free."""
        self.flush()
        n = len(slot_ids)
        assert n > 0
        B = 1
        while B < n:
            B *= 2
        ids = list(slot_ids) + [slot_ids[0]] * (B - n)
        poses = list(cam_to_worlds) + [cam_to_worlds[0]] * (B - n)
        idx = jnp.asarray(ids, jnp.int32)
        states_b = jax.tree_util.tree_map(lambda x: x[idx], self.states)
        rc = _raycast_batch(
            self.cfg, self._use_pallas_raycast, B, states_b,
            jnp.stack([jnp.asarray(p, jnp.float32) for p in poses]),
        )
        return jax.tree_util.tree_map(lambda x: x[:n], rc)

    # -- per-slot operations ----------------------------------------------
    def raycast(self, slot: int, cam_to_world) -> tsdf.Raycast:
        self.flush()
        state = self._slice(slot)
        c2w = jnp.asarray(cam_to_world, jnp.float32)
        origin = tsdf.compute_origin(self.cfg, c2w)
        grid = tsdf.build_local_grid(self.cfg, state, origin)
        intr = jnp.asarray(
            [self.cfg.fx, self.cfg.fy, self.cfg.cx, self.cfg.cy], jnp.float32
        )
        if self._use_pallas_raycast:
            from dynslam_tpu.ops.pallas_raycast import raycast_tiled

            slots, mask = tsdf.visible_blocks(
                self.cfg, state, grid, origin, jnp.linalg.inv(c2w)
            )
            return raycast_tiled(
                self.cfg, state, slots, mask, origin, c2w, intr
            )
        return tsdf.raycast(self.cfg, state, grid, origin, c2w, intr)

    def reap(self, slot: int, max_weight: float) -> int:
        self.flush()
        state, n = tsdf.decay(
            self.cfg, self._slice(slot), jnp.int32(self.frame_idx[slot]),
            jnp.float32(max_weight), jnp.int32(0), force_all=True,
        )
        self._write(slot, state)
        return int(n)

    def used_block_count(self, slot: int) -> int:
        self.flush()
        return int(tsdf.memory_stats(self.cfg, self._slice(slot))[0])


class PooledVolume:
    """MapEngine-shaped adapter over one pool slot (the surface
    InstanceReconstructor/Track use: set_view_device, set_pose, integrate,
    decay, get_raycast, reap, reset, memory stats, .state/.cfg)."""

    def __init__(self, pool: InstanceVolumePool, slot: int):
        self.pool = pool
        self.slot = slot
        self._view = None
        self._pose_w2c = np.eye(4, dtype=np.float32)
        self.fused_frames = 0

    @property
    def cfg(self) -> tsdf.TsdfConfig:
        return self.pool.cfg

    @property
    def state(self) -> tsdf.TsdfState:
        self.pool.flush()
        return self.pool._slice(self.slot)

    def set_view_device(self, rgb, depth_m) -> None:
        self._view = (rgb, depth_m)

    def set_pose(self, world_to_cam) -> None:
        self._pose_w2c = world_to_cam

    def integrate(self) -> None:
        assert self._view is not None, "set_view_device first"
        self.pool.stage_fuse(
            self.slot, self._view[0], self._view[1], self._pose_w2c
        )
        self.fused_frames += 1

    def decay(self, blocking: bool = False):
        # folded into the pooled fusion call (stage_fuse -> flush)
        return 0

    def decay_catchup(self) -> int:
        return self.pool.reap(
            self.slot, float(self.pool.decay_params.max_decay_weight)
        ) if self.pool.decay_params.enabled else 0

    def get_raycast(self, cam_to_world=None) -> tsdf.Raycast:
        pose = cam_to_world if cam_to_world is not None else np.linalg.inv(
            self._pose_w2c
        )
        return self.pool.raycast(self.slot, pose)

    def reap(self, max_weight: float) -> int:
        return self.pool.reap(self.slot, max_weight)

    def reset(self) -> None:
        self.pool._staged.pop(self.slot, None)
        self.pool._reset_slot(self.slot)
        self.fused_frames = 0

    def release(self) -> None:
        self.pool.release(self.slot)

    def get_used_block_count(self) -> int:
        return self.pool.used_block_count(self.slot)

    def get_used_memory_bytes(self) -> int:
        self.pool.flush()
        return int(tsdf.memory_stats(self.cfg, self.state)[1])
