"""Direct (dense photometric) pose refinement — the TPU-native equivalent
of the reference's `src/DynSLAM/Direct/` module (~5k LoC of semidense
image alignment from Liu et al.'s fisheye DVO).

IMPORTANT parity note: the reference ships this code DISABLED — excluded
from the build (CMakeLists.txt:115-129) with its call sites commented out
(InstanceReconstructor.cpp:460-566), and its README states it "does NOT
help improve pose estimates" (Direct/README.md:7). It is reimplemented
here for component parity and gated off by default exactly like the
reference (`DynSlamConfig` has no direct-refinement path wired in; call
`refine_pose` explicitly to experiment).

Algorithm: coarse-to-fine Gauss-Newton on the photometric error of
reference-frame pixels (with depth) warped into the target frame, with a
pseudo-Huber robust weight — the reference's Gauss-Newton/pyramid/robust
loss structure (Direct/image_alignment device code), expressed as jitted
fixed-iteration XLA instead of per-pixel CPU loops.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from dynslam_tpu.utils import se3


class DirectAlignResult(NamedTuple):
    xi: jnp.ndarray  # (6,) refined twist (se3, exp-map parameterization)
    T: jnp.ndarray  # (4, 4) refined T_target<-ref
    residual_rms: jnp.ndarray  # robust RMS photometric error at the solution
    valid_fraction: jnp.ndarray  # fraction of pixels contributing


def _bilinear(img, x, y):
    h, w = img.shape
    x = jnp.clip(x, 0.0, w - 1.001)
    y = jnp.clip(y, 0.0, h - 1.001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    ax, ay = x - x0, y - y0
    return (
        img[y0, x0] * (1 - ax) * (1 - ay)
        + img[y0, x0 + 1] * ax * (1 - ay)
        + img[y0 + 1, x0] * (1 - ax) * ay
        + img[y0 + 1, x0 + 1] * ax * ay
    )


def _downsample(img):
    h, w = img.shape
    return img[: h // 2 * 2, : w // 2 * 2].reshape(h // 2, 2, w // 2, 2).mean(
        (1, 3)
    )


def _downsample_depth(d):
    """Depth pyramid: average valid samples only."""
    h, w = d.shape
    q = d[: h // 2 * 2, : w // 2 * 2].reshape(h // 2, 2, w // 2, 2)
    valid = (q > 0).sum((1, 3))
    s = q.sum((1, 3))
    return jnp.where(valid > 0, s / jnp.maximum(valid, 1), 0.0)


@partial(jax.jit, static_argnames=("iters", "huber_delta"))
def _align_level(
    ref_gray: jnp.ndarray,
    ref_depth: jnp.ndarray,
    tgt_gray: jnp.ndarray,
    intr: jnp.ndarray,  # (4,) fx fy cx cy at this level
    xi0: jnp.ndarray,
    iters: int = 10,
    huber_delta: float = 8.0,
):
    h, w = ref_gray.shape
    fx, fy, cx, cy = intr[0], intr[1], intr[2], intr[3]
    vv = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    uu = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    valid = ref_depth > 0
    z = jnp.where(valid, ref_depth, 1.0)
    X = (uu - cx) / fx * z
    Y = (vv - cy) / fy * z
    pts = jnp.stack([X, Y, z], -1).reshape(-1, 3)
    ref_i = ref_gray.reshape(-1)
    vmask = valid.reshape(-1)

    def residuals(xi):
        T = se3.exp_se3(xi)
        pc = pts @ T[:3, :3].T + T[:3, 3]
        zc = jnp.maximum(pc[:, 2], 0.05)
        u = pc[:, 0] / zc * fx + cx
        v = pc[:, 1] / zc * fy + cy
        in_img = (u >= 1) & (u < w - 2) & (v >= 1) & (v < h - 2) & (pc[:, 2] > 0.05)
        warped = _bilinear(tgt_gray, u, v)
        r = jnp.where(vmask & in_img, warped - ref_i, 0.0)
        return r, (vmask & in_img)

    def step(xi, _):
        r, ok = residuals(xi)
        # pseudo-Huber IRLS weights (the reference's robust loss family)
        wgt = 1.0 / jnp.sqrt(1.0 + (r / huber_delta) ** 2)
        wgt = jnp.where(ok, wgt, 0.0)

        J = jax.jacfwd(lambda x: residuals(x)[0])(xi)  # (N, 6)
        A = (J * wgt[:, None]).T @ J + 1e-5 * jnp.eye(6)
        g = (J * wgt[:, None]).T @ r
        delta = jnp.linalg.solve(A, g)
        ok_step = jnp.all(jnp.isfinite(delta)) & (jnp.linalg.norm(delta) < 1.0)
        return jnp.where(ok_step, xi - delta, xi), None

    xi, _ = jax.lax.scan(step, xi0, None, length=iters)
    r, ok = residuals(xi)
    n = jnp.maximum(jnp.sum(ok), 1)
    rms = jnp.sqrt(jnp.sum(r * r) / n)
    return xi, rms, jnp.sum(ok) / vmask.shape[0]


def refine_pose(
    ref_gray,
    ref_depth_m,
    tgt_gray,
    intrinsics: Tuple[float, float, float, float],
    T_init=None,
    levels: int = 3,
    iters_per_level: int = 8,
) -> DirectAlignResult:
    """Refine T_target<-ref by coarse-to-fine photometric alignment."""
    ref_gray = jnp.asarray(ref_gray, jnp.float32)
    tgt_gray = jnp.asarray(tgt_gray, jnp.float32)
    ref_depth = jnp.asarray(ref_depth_m, jnp.float32)
    xi = (
        se3.log_se3(jnp.asarray(T_init, jnp.float32))
        if T_init is not None
        else jnp.zeros(6, jnp.float32)
    )

    pyr = [(ref_gray, ref_depth, tgt_gray, jnp.asarray(intrinsics, jnp.float32))]
    for _ in range(levels - 1):
        g, d, t, K = pyr[-1]
        pyr.append(
            (
                _downsample(g),
                _downsample_depth(d),
                _downsample(t),
                jnp.asarray(
                    [K[0] / 2, K[1] / 2, (K[2] + 0.5) / 2 - 0.5,
                     (K[3] + 0.5) / 2 - 0.5]
                ),
            )
        )

    rms = jnp.float32(0.0)
    frac = jnp.float32(0.0)
    for g, d, t, K in reversed(pyr):
        xi, rms, frac = _align_level(g, d, t, K, xi, iters=iters_per_level)

    return DirectAlignResult(
        xi=xi, T=se3.exp_se3(xi), residual_rms=rms, valid_fraction=frac
    )
