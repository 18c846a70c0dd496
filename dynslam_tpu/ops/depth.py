"""Depth-map computation kernels.

TPU-native equivalents of the reference's per-pixel CPU loops:
- `DepthProvider::DepthFromDisparityMap` (DepthProvider.h:94-137):
  disparity(px) -> int16 depth in millimeters with range clamping
  (out-of-range and zero-disparity pixels become 0 = invalid).
- InfiniTAM's `viewBuilder->UpdateView` mm->m conversion + 5-step
  bilateral filter (InfiniTamDriver.cpp:222-223).

Everything here is jit-compiled and shape-static; the host passes
numpy/jnp arrays, never loops over pixels.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

MM_PER_M = 1000.0
INT16_MAX = 32767


@partial(jax.jit, static_argnames=("min_depth_m", "max_depth_m", "scale"))
def depth_mm_from_disparity(
    disparity_px: jnp.ndarray,
    bf: float,
    min_depth_m: float = 0.5,
    max_depth_m: float = 20.0,
    scale: float = 1.0,
) -> jnp.ndarray:
    """Disparity map (H, W) float -> int16 depth map in mm.

    depth = baseline*focal / disparity, clamped to [min, max] depth with
    0 marking invalid — exact semantics of DepthProvider.h:94-137 (including
    treating |disp| < 1e-5 as invalid and the low-res `scale` factor).
    """
    min_mm = jnp.int32(min_depth_m * MM_PER_M)
    max_mm = jnp.int32(max_depth_m * MM_PER_M)
    depth_m = bf / jnp.where(jnp.abs(disparity_px) < 1e-5, jnp.inf, disparity_px)
    depth_mm = (MM_PER_M * scale * depth_m)
    # reference casts via int32 before range check
    depth_mm_i = jnp.where(
        jnp.isfinite(depth_mm),
        jnp.clip(depth_mm, -2.0**31, 2.0**31 - 1).astype(jnp.int32),
        0,
    )
    invalid = (depth_mm_i > max_mm) | (depth_mm_i < min_mm)
    return jnp.where(invalid, 0, depth_mm_i).astype(jnp.int16)


@jax.jit
def depth_m_from_mm(depth_mm: jnp.ndarray) -> jnp.ndarray:
    """int16 mm depth -> float32 meters, 0 stays 0 (invalid)."""
    return depth_mm.astype(jnp.float32) / MM_PER_M


@jax.jit
def disparity_from_depth_m(depth_m: jnp.ndarray, bf: float) -> jnp.ndarray:
    """float depth (m) -> disparity (px); invalid (<=0) depth -> 0."""
    return jnp.where(depth_m > 1e-6, bf / jnp.maximum(depth_m, 1e-6), 0.0)


@partial(jax.jit, static_argnames=("radius", "steps"))
def bilateral_filter_depth(
    depth_m: jnp.ndarray,
    radius: int = 2,
    sigma_space: float = 1.5,
    sigma_depth: float = 0.03,
    steps: int = 5,
) -> jnp.ndarray:
    """Edge-preserving smoothing of a float depth map; invalid (0) pixels
    neither contribute nor get filled.

    Equivalent of InfiniTAM's 5-pass bilateral filter applied in
    `ViewBuilder::UpdateView` when `useBilateralFilter` is set. Implemented
    as `steps` shifted-accumulate passes (fixed stencil — no gathers), which
    XLA fuses into a handful of vectorized loops.
    """
    offsets = [
        (dy, dx)
        for dy in range(-radius, radius + 1)
        for dx in range(-radius, radius + 1)
    ]
    import math

    # host math, not jnp: under jit even constant jnp ops become tracers
    spatial_w = [
        math.exp(-(dy * dy + dx * dx) / (2.0 * sigma_space**2))
        for dy, dx in offsets
    ]

    def one_pass(d, _):
        valid = d > 0
        acc = jnp.zeros_like(d)
        wacc = jnp.zeros_like(d)
        for (dy, dx), sw in zip(offsets, spatial_w):
            shifted = jnp.roll(d, (dy, dx), axis=(0, 1))
            sh_valid = jnp.roll(valid, (dy, dx), axis=(0, 1))
            w = sw * jnp.exp(-jnp.square(shifted - d) / (2.0 * sigma_depth**2))
            w = jnp.where(sh_valid & valid, w, 0.0)
            acc = acc + w * shifted
            wacc = wacc + w
        out = jnp.where(wacc > 1e-8, acc / jnp.maximum(wacc, 1e-8), d)
        return jnp.where(valid, out, 0.0), None

    out, _ = jax.lax.scan(one_pass, depth_m, None, length=steps)
    return out


@jax.jit
def rgb_to_gray(rgb: jnp.ndarray) -> jnp.ndarray:
    """uint8 RGB (H, W, 3) -> uint8 grayscale, OpenCV weights
    (the reference converts with cv::cvtColor before viso2,
    DynSlam.cpp:61-68)."""
    f = rgb.astype(jnp.float32)
    gray = 0.299 * f[..., 0] + 0.587 * f[..., 1] + 0.114 * f[..., 2]
    return jnp.clip(gray + 0.5, 0, 255).astype(jnp.uint8)
