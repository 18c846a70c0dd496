"""Silhouette masking kernels — replace the reference's per-pixel CPU
loops `ProcessSilhouette_CPU` / `RemoveSilhouette_CPU`
(InstanceReconstructor.cpp:59-170) and their host<->device ping-pong
(the reference downloads rgb/depth each frame, edits on CPU, re-uploads,
InstanceReconstructor.cpp:180-197; here views never leave the device).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def cut_out_instance(
    rgb: jnp.ndarray,  # (H, W, 3) uint8 main view
    depth_m: jnp.ndarray,  # (H, W) f32 main view
    copy_mask: jnp.ndarray,  # (H, W) bool — pixels copied to the instance
    delete_mask: jnp.ndarray,  # (H, W) bool — pixels removed from the main view
):
    """One fused op = ProcessSilhouette_CPU + RemoveSilhouette_CPU:
    returns (inst_rgb, inst_depth, main_rgb, main_depth)."""
    inst_rgb = jnp.where(copy_mask[..., None], rgb, 0)
    inst_depth = jnp.where(copy_mask, depth_m, 0.0)
    main_rgb = jnp.where(delete_mask[..., None], 0, rgb)
    main_depth = jnp.where(delete_mask, 0.0, depth_m)
    return inst_rgb, inst_depth, main_rgb, main_depth


@jax.jit
def remove_silhouette(
    rgb: jnp.ndarray, depth_m: jnp.ndarray, delete_mask: jnp.ndarray
):
    """RemoveSilhouette_CPU: zero out masked pixels in the main view."""
    return (
        jnp.where(delete_mask[..., None], 0, rgb),
        jnp.where(delete_mask, 0.0, depth_m),
    )


@jax.jit
def composite_depth(target: jnp.ndarray, source: jnp.ndarray) -> jnp.ndarray:
    """Z-merge two depth maps, 0 = empty (CompositeDepth,
    InstanceReconstructor.cpp:851-871)."""
    both = (target > 0) & (source > 0)
    return jnp.where(
        both, jnp.minimum(target, source),
        jnp.where(target > 0, target, source),
    )


@jax.jit
def composite_depth_many(
    target: jnp.ndarray,  # (H, W) f32
    inst_depths: jnp.ndarray,  # (S, H, W) f32, 0 = empty
    active: jnp.ndarray,  # (S,) bool
) -> jnp.ndarray:
    """All instance depth layers z-merged into the static render in ONE
    executable — the per-track `composite_depth` loop paid one dispatch
    (and one ~6 ms relay round trip) per visible track. The unrolled
    select chain is bit-identical to the sequential merge."""
    out = target
    for s in range(inst_depths.shape[0]):
        src = jnp.where(active[s], inst_depths[s], 0.0)
        out = composite_depth(out, src)
    return out


@jax.jit
def composite_color_many(
    target_color: jnp.ndarray,  # (H, W, 3) uint8
    target_depth: jnp.ndarray,  # (H, W) f32
    inst_colors: jnp.ndarray,  # (S, H, W, 3) uint8
    inst_depths: jnp.ndarray,  # (S, H, W) f32
    tints: jnp.ndarray,  # (S, 3) f32
    active: jnp.ndarray,  # (S,) bool
):
    """Batched `composite_color` over the track axis (one executable,
    sequential-merge-identical: slot order = the caller's track order, and
    the z-test is strict so earlier slots win ties exactly like the loop).
    Returns (color, depth)."""
    out_c, out_d = target_color, target_depth
    for s in range(inst_depths.shape[0]):
        d = jnp.where(active[s], inst_depths[s], 0.0)
        out_c, out_d = composite_color(out_c, out_d, inst_colors[s], d,
                                       tints[s])
    return out_c, out_d


@jax.jit
def composite_color(
    target_color: jnp.ndarray,  # (H, W, 3) uint8
    target_depth: jnp.ndarray,  # (H, W) f32
    inst_color: jnp.ndarray,
    inst_depth: jnp.ndarray,
    tint: jnp.ndarray,  # (3,) f32 0..255
    tint_strength: float = 0.6,
):
    """Software z-buffer color merge with per-track tint (CompositeColor,
    InstanceReconstructor.cpp:874-911). Returns (color, depth)."""
    on_top = (inst_depth > 0) & ((target_depth == 0) | (target_depth > inst_depth))
    color_boost = 0.5
    strength = 1.0 + color_boost - tint_strength
    tinted = jnp.clip(
        inst_color.astype(jnp.float32) * strength + tint[None, None, :] * tint_strength,
        0, 255,
    ).astype(jnp.uint8)
    out_color = jnp.where(on_top[..., None], tinted, target_color)
    out_depth = jnp.where(on_top, inst_depth, target_depth)
    return out_color, out_depth
