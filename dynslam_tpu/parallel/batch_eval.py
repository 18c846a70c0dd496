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


def shard_frames(mesh: Mesh, frames) -> dict:
    """Place every time-major frame stack with its sequence axis (axis 1)
    on the "data" mesh dimension."""
    s = NamedSharding(mesh, P(None, "data"))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), frames)
