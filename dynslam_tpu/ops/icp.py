"""Projective point-to-plane ICP depth tracking — the TPU-native
equivalent of InfiniTAM's ITMDepthTracker used through
`trackingController->Track(...)` (/root/reference/src/DynSLAM/
InfiniTamDriver.h:120-124). DynSLAM itself runs external sparse-VO
odometry by default (DynSlam.cpp:89-100), but the engine exposes depth
tracking as a capability; here it doubles as a VO fallback
(config.external_odometry=False, or on sparse-VO failure).

Formulation (fixed shapes, one jitted function):
- reference = the previous frame's raycast (points + normals derived on
  device), i.e. frame-to-model tracking like InfiniTAM;
- current depth is back-projected at a fixed stride, transformed by the
  pose estimate, projectively associated into the reference view, and a
  Huber-weighted point-to-plane system J^T W J dx = -J^T W r (6x6) is
  accumulated with one masked reduction per Gauss-Newton step
  (`lax.fori_loop`, ~10 iterations);
- the 6-vector step uses a left-multiplied world-frame twist on
  cam_to_world: d(p_world)/d(xi) = [I | -[p]x].

Returns the refined world_to_cam pose plus convergence diagnostics
(inlier count, mean |residual|) so callers can gate on tracking quality
the way ITMDepthTracker does.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from dynslam_tpu.utils import se3


class IcpResult(NamedTuple):
    world_to_cam: jnp.ndarray  # (4, 4) refined pose
    num_inliers: jnp.ndarray  # scalar int32
    mean_residual: jnp.ndarray  # scalar f32 (m)
    success: jnp.ndarray  # scalar bool


def normals_from_points(points: jnp.ndarray, hit: jnp.ndarray) -> jnp.ndarray:
    """Image-space normals from a raycast point map (device version of
    InfiniTAM's ImageNormals): cross products of central differences."""
    du = jnp.roll(points, -1, axis=1) - jnp.roll(points, 1, axis=1)
    dv = jnp.roll(points, -1, axis=0) - jnp.roll(points, 1, axis=0)
    n = jnp.cross(dv, du)
    norm = jnp.linalg.norm(n, axis=-1, keepdims=True)
    n = jnp.where(norm > 1e-9, n / jnp.maximum(norm, 1e-9), 0.0)
    return jnp.where(hit[..., None], n, 0.0)


def _exp_twist(xi: jnp.ndarray) -> jnp.ndarray:
    """(6,) [w | v] -> 4x4 via the rotation exponential + first-order
    translation (sufficient at ICP step sizes)."""
    R = se3.so3_exp(xi[:3])
    T = jnp.eye(4, dtype=jnp.float32)
    T = T.at[:3, :3].set(R)
    T = T.at[:3, 3].set(xi[3:])
    return T


@partial(jax.jit, static_argnames=("stride", "iters"))
def icp_track(
    depth_m: jnp.ndarray,  # (H, W) current depth, 0 = invalid
    ref_points: jnp.ndarray,  # (H, W, 3) previous raycast points (world)
    ref_hit: jnp.ndarray,  # (H, W) bool
    ref_world_to_cam: jnp.ndarray,  # (4, 4) pose the reference was cast from
    init_world_to_cam: jnp.ndarray,  # (4, 4) initial estimate (e.g. prev)
    intrinsics: jnp.ndarray,  # (4,) fx, fy, cx, cy
    stride: int = 4,
    iters: int = 10,
    dist_threshold: float = 0.25,
    huber_delta: float = 0.02,
) -> IcpResult:
    h, w = depth_m.shape
    fx, fy, cx, cy = (intrinsics[0], intrinsics[1], intrinsics[2],
                      intrinsics[3])

    ref_normals = normals_from_points(ref_points, ref_hit)
    # pack reference (points | normals) for the association gathers
    ref_pn = jnp.concatenate([ref_points, ref_normals], axis=-1)  # (H, W, 6)

    d = depth_m[::stride, ::stride]
    hs, ws = d.shape
    vv = (jax.lax.broadcasted_iota(jnp.float32, (hs, ws), 0)) * stride
    uu = (jax.lax.broadcasted_iota(jnp.float32, (hs, ws), 1)) * stride
    valid_d = (d > 0.1).reshape(-1)
    pc = jnp.stack(
        [(uu - cx) / fx * d, (vv - cy) / fy * d, d], axis=-1
    ).reshape(-1, 3)  # current camera-frame points

    Rr, tr = ref_world_to_cam[:3, :3], ref_world_to_cam[:3, 3]

    def gn_step(_, carry):
        c2w = carry
        pw = pc @ c2w[:3, :3].T + c2w[:3, 3]  # world
        # project into the reference view
        pr = pw @ Rr.T + tr
        z = jnp.maximum(pr[:, 2], 1e-3)
        u = pr[:, 0] / z * fx + cx
        v = pr[:, 1] / z * fy + cy
        ui = jnp.clip(jnp.round(u).astype(jnp.int32), 0, w - 1)
        vi = jnp.clip(jnp.round(v).astype(jnp.int32), 0, h - 1)
        in_img = (u >= 0) & (u <= w - 1) & (v >= 0) & (v <= h - 1) \
            & (pr[:, 2] > 0.1)
        pn = ref_pn[vi, ui]  # (N, 6) one gather stream
        q = pn[:, :3]
        n = pn[:, 3:]
        n_ok = jnp.sum(n * n, axis=1) > 0.5  # zero normals = miss
        diff = pw - q
        dist2 = jnp.sum(diff * diff, axis=1)
        r = jnp.sum(n * diff, axis=1)
        ok = valid_d & in_img & n_ok & (dist2 < dist_threshold ** 2)
        # Huber IRLS weights
        ar = jnp.abs(r)
        wgt = jnp.where(ar <= huber_delta, 1.0,
                        huber_delta / jnp.maximum(ar, 1e-9))
        wgt = jnp.where(ok, wgt, 0.0)

        J = jnp.concatenate([jnp.cross(pw, n), n], axis=1)  # (N, 6): [w | v]
        A = (J * wgt[:, None]).T @ J + 1e-5 * jnp.eye(6)
        b = (J * wgt[:, None]).T @ r
        dx = jnp.linalg.solve(A, b)
        finite = jnp.all(jnp.isfinite(dx)) & (jnp.linalg.norm(dx) < 1.0)
        dx = jnp.where(finite, dx, jnp.zeros(6))
        return _exp_twist(-dx) @ c2w

    c2w0 = jnp.linalg.inv(init_world_to_cam)
    c2w = jax.lax.fori_loop(0, iters, gn_step, c2w0)
    # second pass from the first's solution widens the capture basin at
    # negligible cost (the association set re-forms around the new pose)
    c2w = jax.lax.fori_loop(0, iters // 2, gn_step, c2w)

    # final diagnostics
    pw = pc @ c2w[:3, :3].T + c2w[:3, 3]
    pr = pw @ Rr.T + tr
    z = jnp.maximum(pr[:, 2], 1e-3)
    u = pr[:, 0] / z * fx + cx
    v = pr[:, 1] / z * fy + cy
    ui = jnp.clip(jnp.round(u).astype(jnp.int32), 0, w - 1)
    vi = jnp.clip(jnp.round(v).astype(jnp.int32), 0, h - 1)
    in_img = (u >= 0) & (u <= w - 1) & (v >= 0) & (v <= h - 1) \
        & (pr[:, 2] > 0.1)
    pn = ref_pn[vi, ui]
    diff = pw - pn[:, :3]
    r = jnp.abs(jnp.sum(pn[:, 3:] * diff, axis=1))
    ok = valid_d & in_img & (jnp.sum(pn[:, 3:] ** 2, axis=1) > 0.5) \
        & (jnp.sum(diff * diff, axis=1) < dist_threshold ** 2)
    num = jnp.sum(ok)
    mean_r = jnp.sum(jnp.where(ok, r, 0.0)) / jnp.maximum(num, 1)
    success = (num > 100) & (mean_r < 0.05) & jnp.all(jnp.isfinite(c2w))
    w2c = jnp.linalg.inv(c2w)
    w2c = jnp.where(success, w2c, init_world_to_cam)
    return IcpResult(w2c, num, mean_r, success)
