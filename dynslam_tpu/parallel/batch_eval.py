"""Multi-chip batch evaluation of the SLAM pipeline itself.

The reference evaluates sequences one at a time on one GPU
(`Evaluation::EvaluateFrame` called from the per-frame loop,
/root/reference/src/DynSLAM/Evaluation/Evaluation.h). The honest TPU
scale axis (SURVEY.md §2.3) is data parallelism over *sequences*: the
mapping core (allocate -> integrate -> raycast -> depth-consistency
metric) is pure functions over a `TsdfState` pytree, so we vmap it over
a leading sequence axis and shard that axis across the mesh's "data"
dimension. Each device then runs an independent SLAM map; no collectives
are needed until the final metric reduction, which XLA lowers to ICI
all-reduces automatically.

Shapes: frames are stacked time-major `(T, S, H, W, ...)` so `lax.scan`
carries the `S`-sharded map states across time without re-sharding.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dynslam_tpu.ops import tsdf


def stacked_states(cfg: tsdf.TsdfConfig, n_sequences: int) -> tsdf.TsdfState:
    """n_sequences fresh map states stacked on a leading axis."""
    one = tsdf.create_state(cfg)
    return jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[None], (n_sequences,) + x.shape), one
    )


def _fusion_eval_step(cfg: tsdf.TsdfConfig, state: tsdf.TsdfState,
                      rgb, depth_m, cam_to_world, world_to_cam, frame_idx):
    """One mapping step + depth-consistency evaluation for ONE sequence.

    Mirrors the reference's per-frame Integrate + raycast-preview +
    EvaluateDepth shape (InfiniTamDriver.h:137-158, Evaluation.cpp), with
    the input depth standing in for LIDAR on the synthetic dry run.
    Returns (state, metrics) with metrics = (mean_abs_err, hit_fraction).
    """
    origin = tsdf.compute_origin(cfg, cam_to_world)
    grid = tsdf.build_local_grid(cfg, state, origin)
    state, grid, _ = tsdf.allocate(
        cfg, state, grid, origin, depth_m, cam_to_world, frame_idx
    )
    slots, mask = tsdf.visible_blocks(cfg, state, grid, origin, world_to_cam)
    state = tsdf.integrate(
        cfg, state, slots, mask, rgb, depth_m, world_to_cam, frame_idx
    )
    rc = tsdf.raycast(
        cfg, state, grid, origin, cam_to_world,
        jnp.asarray([cfg.fx, cfg.fy, cfg.cx, cfg.cy], jnp.float32),
    )
    ok = rc.hit & (depth_m > 0)
    err = jnp.sum(jnp.where(ok, jnp.abs(rc.depth - depth_m), 0.0))
    n = jnp.maximum(jnp.sum(ok), 1)
    return state, (err / n, jnp.mean(rc.hit.astype(jnp.float32)))


def make_batch_eval(cfg: tsdf.TsdfConfig, mesh: Mesh):
    """jit-compiled evaluator of S sequences in parallel over the mesh.

    Call as `run(states, frames)` where `states` is `stacked_states(cfg, S)`
    and `frames` is a dict of time-major stacked arrays:
      rgb          (T, S, H, W, 3) uint8
      depth        (T, S, H, W)    f32
      cam_to_world (T, S, 4, 4)    f32
      world_to_cam (T, S, 4, 4)    f32
    Returns (final_states, per-frame-per-sequence metrics (T, S, 2)).
    """
    seq_sharding = NamedSharding(mesh, P("data"))

    step = jax.vmap(partial(_fusion_eval_step, cfg),
                    in_axes=(0, 0, 0, 0, 0, None))

    def run(states, frames):
        states = jax.lax.with_sharding_constraint(states, seq_sharding)

        def scan_body(carry, xs):
            st, t = carry
            st = jax.lax.with_sharding_constraint(st, seq_sharding)
            st, (err, hits) = step(
                st, xs["rgb"], xs["depth"],
                xs["cam_to_world"], xs["world_to_cam"], t,
            )
            return (st, t + 1), jnp.stack([err, hits], axis=-1)

        (states, _), metrics = jax.lax.scan(
            scan_body, (states, jnp.int32(0)), frames
        )
        return states, metrics

    return jax.jit(run)


def _dynamic_fusion_eval_step(
    cfg: tsdf.TsdfConfig, icfg: tsdf.TsdfConfig,
    state: tsdf.TsdfState, inst: tsdf.TsdfState,
    rgb, depth_m, obj_mask, cam_to_world, world_to_cam, frame_idx,
):
    """One DYNAMIC-mode mapping step for ONE sequence: silhouette cut,
    static fusion on the cut view, per-object fusion of the masked view
    into the sequence's instance volume, and the composited
    (z-merged) raycast the evaluation scores against — the device side
    of pipeline/fused_dynamic.py reduced to one object per sequence.
    Returns ((state, inst), metrics)."""
    depth_cut = jnp.where(obj_mask, 0.0, depth_m)
    rgb_cut = jnp.where(obj_mask[..., None], jnp.uint8(0), rgb)
    depth_obj = jnp.where(obj_mask, depth_m, 0.0)

    origin = tsdf.compute_origin(cfg, cam_to_world)
    grid = tsdf.build_local_grid(cfg, state, origin)
    state, grid, _ = tsdf.allocate(
        cfg, state, grid, origin, depth_cut, cam_to_world, frame_idx
    )
    slots, mask = tsdf.visible_blocks(cfg, state, grid, origin, world_to_cam)
    state = tsdf.integrate(
        cfg, state, slots, mask, rgb_cut, depth_cut, world_to_cam, frame_idx
    )
    rc = tsdf.raycast(
        cfg, state, grid, origin, cam_to_world,
        jnp.asarray([cfg.fx, cfg.fy, cfg.cx, cfg.cy], jnp.float32),
    )

    # instance volume (static object in this dry run: identity chain)
    iorigin = tsdf.compute_origin(icfg, cam_to_world)
    igrid = tsdf.build_local_grid(icfg, inst, iorigin)
    inst, igrid, _ = tsdf.allocate(
        icfg, inst, igrid, iorigin, depth_obj, cam_to_world, frame_idx
    )
    islots, imask = tsdf.visible_blocks(
        icfg, inst, igrid, iorigin, world_to_cam
    )
    inst = tsdf.integrate(
        icfg, inst, islots, imask, rgb, depth_obj, world_to_cam, frame_idx
    )
    irc = tsdf.raycast(
        icfg, inst, igrid, iorigin, cam_to_world,
        jnp.asarray([icfg.fx, icfg.fy, icfg.cx, icfg.cy], jnp.float32),
    )

    # composited depth (CompositeInstanceDepthMaps z-merge semantics)
    comp = jnp.where(
        (irc.depth > 0) & ((rc.depth <= 0) | (irc.depth < rc.depth)),
        irc.depth, rc.depth,
    )
    ok = (comp > 0) & (depth_m > 0)
    err = jnp.sum(jnp.where(ok, jnp.abs(comp - depth_m), 0.0))
    n = jnp.maximum(jnp.sum(ok), 1)
    dyn_ok = obj_mask & (comp > 0) & (depth_m > 0)
    dyn_err = jnp.sum(jnp.where(dyn_ok, jnp.abs(comp - depth_m), 0.0))
    dyn_n = jnp.maximum(jnp.sum(dyn_ok), 1)
    return (state, inst), (err / n, dyn_err / dyn_n,
                           jnp.mean((comp > 0).astype(jnp.float32)))


def make_dynamic_batch_eval(cfg: tsdf.TsdfConfig, icfg: tsdf.TsdfConfig,
                            mesh: Mesh):
    """jit-compiled DYNAMIC-step evaluator of S sequences over the mesh:
    `run((states, insts), frames)` with frames additionally carrying
    `obj_mask (T, S, H, W) bool`. Returns ((states, insts),
    metrics (T, S, 3) = (unified_err, dynamic_err, comp_coverage))."""
    seq_sharding = NamedSharding(mesh, P("data"))

    step = jax.vmap(partial(_dynamic_fusion_eval_step, cfg, icfg),
                    in_axes=(0, 0, 0, 0, 0, 0, 0, None))

    def run(states, frames):
        states = jax.lax.with_sharding_constraint(states, seq_sharding)

        def scan_body(carry, xs):
            (st, it), t = carry
            st = jax.lax.with_sharding_constraint(st, seq_sharding)
            it = jax.lax.with_sharding_constraint(it, seq_sharding)
            (st, it), (err, derr, cov) = step(
                st, it, xs["rgb"], xs["depth"], xs["obj_mask"],
                xs["cam_to_world"], xs["world_to_cam"], t,
            )
            return ((st, it), t + 1), jnp.stack([err, derr, cov], axis=-1)

        (states, _), metrics = jax.lax.scan(
            scan_body, (states, jnp.int32(0)), frames
        )
        return states, metrics

    return jax.jit(run)


def shard_frames(mesh: Mesh, frames) -> dict:
    """Place every time-major frame stack with its sequence axis (axis 1)
    on the "data" mesh dimension."""
    s = NamedSharding(mesh, P(None, "data"))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), frames)
