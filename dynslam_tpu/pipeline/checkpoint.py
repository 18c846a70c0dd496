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
