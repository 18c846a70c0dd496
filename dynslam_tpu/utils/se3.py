"""SE(3) utilities on jnp arrays.

Replaces the reference's Eigen/ITMPose/Sophus usage (`ITMPose` with
SetM/SetInvM/Coerce, InfiniTamDriver.cpp:36-47) and libviso2's
`transformationVectorToMatrix` (Track.cpp:194). Twists follow the viso2
parameterization where relevant: (rx, ry, rz, tx, ty, tz) with rotation
R = Rx(rx) @ Ry(ry) @ Rz(rz) — NOT the exponential map — because the
reference's motion estimator composes Euler-angle rotations
(libviso2 `transformationVectorToMatrix`).

All functions are jit/vmap-safe and dtype-polymorphic (float32 on TPU,
float64 in host/test code).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def hat(w: jnp.ndarray) -> jnp.ndarray:
    """so(3) hat operator: (3,) -> (3,3) skew-symmetric."""
    zero = jnp.zeros((), dtype=w.dtype)
    return jnp.array(
        [
            [zero, -w[2], w[1]],
            [w[2], zero, -w[0]],
            [-w[1], w[0], zero],
        ]
    )


def exp_so3(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues: rotation vector (3,) -> rotation matrix (3,3)."""
    theta2 = jnp.sum(w * w)
    theta = jnp.sqrt(theta2 + 1e-32)
    K = hat(w / theta)
    s, c = jnp.sin(theta), jnp.cos(theta)
    R = jnp.eye(3, dtype=w.dtype) + s * K + (1.0 - c) * (K @ K)
    # small-angle fallback: I + hat(w)
    small = theta2 < 1e-12
    return jnp.where(small, jnp.eye(3, dtype=w.dtype) + hat(w), R)


def log_so3(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix (3,3) -> rotation vector (3,)."""
    cos_theta = jnp.clip((jnp.trace(R) - 1.0) / 2.0, -1.0, 1.0)
    theta = jnp.arccos(cos_theta)
    w_hat = (R - R.T) / 2.0
    w = jnp.stack([w_hat[2, 1], w_hat[0, 2], w_hat[1, 0]])
    sin_theta = jnp.sin(theta)
    scale = jnp.where(jnp.abs(sin_theta) < 1e-7, 1.0, theta / (sin_theta + 1e-32))
    return w * scale


def exp_se3(xi: jnp.ndarray) -> jnp.ndarray:
    """se(3) twist (6,) = (w, v) -> 4x4 transform (true exponential map)."""
    w, v = xi[:3], xi[3:]
    theta2 = jnp.sum(w * w)
    theta = jnp.sqrt(theta2 + 1e-32)
    K = hat(w / theta)
    s, c = jnp.sin(theta), jnp.cos(theta)
    R = jnp.eye(3, dtype=xi.dtype) + s * K + (1.0 - c) * (K @ K)
    V = (
        jnp.eye(3, dtype=xi.dtype)
        + (1.0 - c) / theta * K
        + (theta - s) / theta * (K @ K)
    )
    small = theta2 < 1e-12
    R = jnp.where(small, jnp.eye(3, dtype=xi.dtype) + hat(w), R)
    V = jnp.where(small, jnp.eye(3, dtype=xi.dtype) + 0.5 * hat(w), V)
    return make_transform(R, V @ v)


def log_se3(T: jnp.ndarray) -> jnp.ndarray:
    """4x4 transform -> se(3) twist (6,) = (w, v)."""
    R, t = T[:3, :3], T[:3, 3]
    w = log_so3(R)
    theta2 = jnp.sum(w * w)
    theta = jnp.sqrt(theta2 + 1e-32)
    K = hat(w / theta)
    half = theta / 2.0
    cot_term = half * jnp.cos(half) / (jnp.sin(half) + 1e-32)
    V_inv = (
        jnp.eye(3, dtype=T.dtype)
        - 0.5 * hat(w)
        + (1.0 - cot_term) * (K @ K)
    )
    V_inv = jnp.where(theta2 < 1e-12, jnp.eye(3, dtype=T.dtype) - 0.5 * hat(w), V_inv)
    return jnp.concatenate([w, V_inv @ t])


def so3_exp(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues rotation exponential of a (3,) axis-angle vector."""
    theta2 = jnp.sum(w * w)
    theta = jnp.sqrt(jnp.maximum(theta2, 1e-24))
    K = hat(w / theta)
    R = (
        jnp.eye(3, dtype=w.dtype)
        + jnp.sin(theta) * K
        + (1.0 - jnp.cos(theta)) * (K @ K)
    )
    # small-angle limit: I + hat(w)
    return jnp.where(theta2 < 1e-12, jnp.eye(3, dtype=w.dtype) + hat(w), R)


def euler_to_rot(rx, ry, rz) -> jnp.ndarray:
    """viso2-style rotation: R = Rx @ Ry @ Rz (libviso2 matcher convention)."""
    sx, cx = jnp.sin(rx), jnp.cos(rx)
    sy, cy = jnp.sin(ry), jnp.cos(ry)
    sz, cz = jnp.sin(rz), jnp.cos(rz)
    Rx = jnp.array([[1.0, 0.0, 0.0], [0.0, cx, -sx], [0.0, sx, cx]])
    Ry = jnp.array([[cy, 0.0, sy], [0.0, 1.0, 0.0], [-sy, 0.0, cy]])
    Rz = jnp.array([[cz, -sz, 0.0], [sz, cz, 0.0], [0.0, 0.0, 1.0]])
    return Rx @ Ry @ Rz


def twist_to_transform(tr: jnp.ndarray) -> jnp.ndarray:
    """viso2 `transformationVectorToMatrix`: (rx,ry,rz,tx,ty,tz) -> 4x4."""
    R = euler_to_rot(tr[0], tr[1], tr[2])
    return make_transform(R, tr[3:6])


def np_twist_to_transform(tr) -> "np.ndarray":
    """Host-numpy twin of `twist_to_transform` — used by the fused dynamic
    pipeline's tracker bookkeeping, where a per-track jax dispatch would
    cost a TPU-relay round trip each."""
    import numpy as np

    rx, ry, rz, tx, ty, tz = (float(v) for v in tr)
    sx, cx = np.sin(rx), np.cos(rx)
    sy, cy = np.sin(ry), np.cos(ry)
    sz, cz = np.sin(rz), np.cos(rz)
    Rx = np.array([[1.0, 0.0, 0.0], [0.0, cx, -sx], [0.0, sx, cx]])
    Ry = np.array([[cy, 0.0, sy], [0.0, 1.0, 0.0], [-sy, 0.0, cy]])
    Rz = np.array([[cz, -sz, 0.0], [sz, cz, 0.0], [0.0, 0.0, 1.0]])
    T = np.eye(4)
    T[:3, :3] = Rx @ Ry @ Rz
    T[:3, 3] = (tx, ty, tz)
    return T


def make_transform(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    T = jnp.eye(4, dtype=R.dtype)
    T = T.at[:3, :3].set(R)
    T = T.at[:3, 3].set(t)
    return T


def inverse(T: jnp.ndarray) -> jnp.ndarray:
    """Fast SE(3) inverse (R^T, -R^T t)."""
    R = T[:3, :3]
    t = T[:3, 3]
    return make_transform(R.T, -R.T @ t)


def transform_points(T: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply 4x4 transform to (..., 3) points."""
    return pts @ T[:3, :3].T + T[:3, 3]


def project(pts_cam: jnp.ndarray, fx, fy, cx, cy):
    """Pinhole projection of camera-frame points (..., 3) -> (u, v, z)."""
    z = pts_cam[..., 2]
    safe_z = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
    u = pts_cam[..., 0] / safe_z * fx + cx
    v = pts_cam[..., 1] / safe_z * fy + cy
    return u, v, z


def backproject(u, v, depth, fx, fy, cx, cy) -> jnp.ndarray:
    """Pixel (u, v) + depth -> camera-frame point (..., 3)."""
    x = (u - cx) / fx * depth
    y = (v - cy) / fy * depth
    return jnp.stack([x, y, depth], axis=-1)


def rotation_angle(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation angle of a 3x3 matrix, KITTI-style (Utils.h:250-264)."""
    return jnp.arccos(jnp.clip((jnp.trace(R) - 1.0) / 2.0, -1.0, 1.0))


def translation_error(T_a: jnp.ndarray, T_b: jnp.ndarray) -> jnp.ndarray:
    """Norm of the translation of the relative pose a^-1 b."""
    rel = inverse(T_a) @ T_b
    return jnp.linalg.norm(rel[:3, 3])


def coerce(T: jnp.ndarray) -> jnp.ndarray:
    """Re-orthonormalize the rotation part (ITMPose::Coerce equivalent)
    via SVD projection onto SO(3)."""
    R = T[:3, :3]
    u, _, vt = jnp.linalg.svd(R)
    d = jnp.sign(jnp.linalg.det(u @ vt))
    s = jnp.diag(jnp.array([1.0, 1.0, d], dtype=T.dtype))
    return make_transform(u @ s @ vt, T[:3, 3])


batched_transform_points = jax.vmap(transform_points, in_axes=(0, 0))
