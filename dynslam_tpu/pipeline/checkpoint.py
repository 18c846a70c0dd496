"""Checkpoint / resume of the pipeline's persistent state.

The reference has NO state serialization (SURVEY.md §5 — closest feature
is `--frame_offset`); this is an addition the array-based design makes
trivial: the static map is a pytree of arrays, the trajectory is a list
of 4x4 poses. Per-object volumes and track states are intentionally NOT
checkpointed (tracks die within 50 frames; the reference can't resume
them either) — resuming mid-sequence restarts object tracking, exactly
like launching the reference with --frame_offset.

Format: one .npz per checkpoint (portable, no orbax dependency needed
for arrays this size).
"""

from __future__ import annotations

import numpy as np

from dynslam_tpu.ops import tsdf

FORMAT_VERSION = 1


def save_checkpoint(path: str, dyn_slam) -> None:
    """Persist the static map + trajectory + counters."""
    import jax.numpy as jnp

    state = dyn_slam.static_scene.state
    np.savez_compressed(
        path,
        version=FORMAT_VERSION,
        tsdf_w=np.asarray(state.tsdf_w),
        color=np.asarray(state.color),
        block_coords=np.asarray(state.block_coords),
        alloc_frame=np.asarray(state.alloc_frame),
        last_seen=np.asarray(state.last_seen),
        valid=np.asarray(state.valid),
        decayed_blocks=np.asarray(state.decayed_blocks),
        pose_history=np.stack(dyn_slam.pose_history),
        current_frame_no=dyn_slam.current_frame_no,
        engine_frame_idx=dyn_slam.static_scene.frame_idx,
        fused_frames=dyn_slam.static_scene.fused_frames,
    )


def load_checkpoint(path: str, dyn_slam) -> int:
    """Restore into a freshly built pipeline (engine config must match the
    checkpoint's pool shapes). Returns the frame number to resume from;
    the caller should also seek the Input with frame_offset."""
    import jax.numpy as jnp

    data = np.load(path)
    assert int(data["version"]) == FORMAT_VERSION, "unknown checkpoint version"
    engine = dyn_slam.static_scene
    expect = engine.state.tsdf_w.shape
    got = data["tsdf_w"].shape
    assert got == expect, f"pool shape mismatch: ckpt {got} vs engine {expect}"

    engine.state = tsdf.TsdfState(
        tsdf_w=jnp.asarray(data["tsdf_w"]),
        color=jnp.asarray(data["color"]),
        block_coords=jnp.asarray(data["block_coords"]),
        alloc_frame=jnp.asarray(data["alloc_frame"]),
        last_seen=jnp.asarray(data["last_seen"]),
        valid=jnp.asarray(data["valid"]),
        decayed_blocks=jnp.asarray(data["decayed_blocks"]),
    )
    dyn_slam.pose_history = [p for p in data["pose_history"]]
    dyn_slam.current_frame_no = int(data["current_frame_no"])
    engine.frame_idx = int(data["engine_frame_idx"])
    engine.fused_frames = int(data["fused_frames"])
    engine.set_pose(dyn_slam.pose_history[-1])
    return dyn_slam.current_frame_no


# ---------------------------------------------------------------------------
# fused-pipeline checkpointing (FusedPipeline / FusedDynamicPipeline):
# the donated carry is a pytree — save its leaves in flattening order and
# restore them into a structurally identical template built from zeros.
# ---------------------------------------------------------------------------

FUSED_FORMAT_VERSION = 2


def save_fused_checkpoint(path: str, pipeline) -> None:
    """Persist a fused pipeline's device carry + host counters. Works for
    both FusedPipeline (static bench/headline config) and
    FusedDynamicPipeline. Dynamic-path host tracker state is intentionally
    NOT saved (tracks die within 50 frames; see module doc)."""
    import jax

    assert pipeline.carry is not None, "nothing to checkpoint yet"
    leaves = jax.tree_util.tree_leaves(pipeline.carry)
    arrs = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    np.savez_compressed(
        path,
        version=FUSED_FORMAT_VERSION,
        n_leaves=len(leaves),
        frames=int(getattr(pipeline, "_frames", 0)),
        current_frame_no=int(getattr(pipeline, "current_frame_no", 0)),
        pose_history=np.stack(
            getattr(pipeline, "pose_history", [np.eye(4, dtype=np.float32)])
        ),
        **arrs,
    )


def load_fused_checkpoint(path: str, pipeline) -> int:
    """Restore a carry saved by `save_fused_checkpoint` into a freshly
    constructed pipeline (same config => same carry structure). Returns
    the frame number to resume from."""
    import jax
    import jax.numpy as jnp

    data = np.load(path)
    assert int(data["version"]) == FUSED_FORMAT_VERSION, \
        "unknown fused checkpoint version"
    h, w = pipeline.cfg.height, pipeline.cfg.width
    zeros = jnp.zeros((h, w), jnp.float32)
    template = pipeline._fresh_carry(zeros, zeros)
    t_leaves, treedef = jax.tree_util.tree_flatten(template)
    n = int(data["n_leaves"])
    assert n == len(t_leaves), (
        f"checkpoint has {n} leaves, pipeline carry has {len(t_leaves)} "
        "(config mismatch)"
    )
    new_leaves = []
    for i, t in enumerate(t_leaves):
        a = data[f"leaf_{i}"]
        assert a.shape == t.shape and a.dtype == t.dtype, (
            f"leaf {i}: ckpt {a.shape}/{a.dtype} vs "
            f"pipeline {t.shape}/{t.dtype} (config mismatch)"
        )
        new_leaves.append(jnp.asarray(a))
    pipeline.carry = jax.tree_util.tree_unflatten(treedef, new_leaves)
    if hasattr(pipeline, "_frames") or "frames" in data:
        pipeline._frames = int(data["frames"])
    if hasattr(pipeline, "pose_history"):
        pipeline.pose_history = [p for p in data["pose_history"]]
    if hasattr(pipeline, "current_frame_no"):
        pipeline.current_frame_no = int(data["current_frame_no"])
    return int(data["current_frame_no"])
