"""Stereo egomotion estimation: vmapped RANSAC + Gauss-Newton on
reprojection error — the TPU-native equivalent of libviso2's
`VisualOdometryStereo::estimateMotion` (used for both camera egomotion
and per-object motion, VisoSparseSFProvider.cpp:70-82, Track.cpp:167-209).

Parameterization matches viso2: twist tr = (rx, ry, rz, tx, ty, tz) with
R = Rx(rx) Ry(ry) Rz(rz); the estimated transform maps previous-frame
camera coordinates to current-frame ones (X_cur = R X_prev + t), so the
caller composes `new_pose = delta @ old_pose` (DynSlam.cpp:89-94).

RANSAC is a fixed-shape computation: `ransac_iters` 3-point hypotheses are
solved in parallel with `vmap`med Gauss-Newton (6x6 normal equations),
inliers are counted for every hypothesis at once, and the best support set
is refined with weighted GN over all matches. Data-dependent match counts
are handled with validity masks, never dynamic shapes.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from dynslam_tpu.config import VisualOdometryParams
from dynslam_tpu.utils import se3


class MotionEstimate(NamedTuple):
    tr: jnp.ndarray  # (6,) viso2-style twist
    matrix: jnp.ndarray  # (4, 4) T_cur<-prev
    inliers: jnp.ndarray  # (N,) bool
    num_inliers: jnp.ndarray  # scalar int32
    success: jnp.ndarray  # scalar bool


def triangulate_prev(flow: jnp.ndarray, fx, cu, cv, baseline):
    """Previous-frame 3D points from the stereo pair (viso2 convention):
    d = u1p - u2p;  X = (u1p-cu) b/d;  Y = (v1p-cv) b/d;  Z = f b/d."""
    u1p, v1p, u2p = flow[:, 4], flow[:, 5], flow[:, 6]
    d = jnp.maximum(u1p - u2p, 1e-3)
    X = (u1p - cu) * baseline / d
    Y = (v1p - cv) * baseline / d
    Z = fx * baseline / d
    return jnp.stack([X, Y, Z], axis=-1)


def _residuals(tr, pts_prev, flow, fx, cu, cv, baseline):
    """Stacked reprojection residuals (N, 4): current left (u, v) and
    current right (u, v)."""
    R = se3.euler_to_rot(tr[0], tr[1], tr[2])
    t = tr[3:6]
    p = pts_prev @ R.T + t
    z = jnp.maximum(p[:, 2], 1e-3)
    ul = fx * p[:, 0] / z + cu
    vl = fx * p[:, 1] / z + cv
    ur = fx * (p[:, 0] - baseline) / z + cu
    vr = vl
    return jnp.stack(
        [ul - flow[:, 0], vl - flow[:, 1], ur - flow[:, 2], vr - flow[:, 3]],
        axis=-1,
    )


def _chol_solve6(A, g):
    """Solve the 6x6 SPD normal equations by fully unrolled Cholesky —
    batched tiny `jnp.linalg.solve` lowers to XLA's pivoting LU, a TPU
    slow path that dominated RANSAC (500 hypotheses x GN iters). Unrolled
    scalar-plane math is pure VPU work. sqrt is clamped so degenerate
    (rank-deficient) samples give large-but-finite deltas, which the
    caller's divergence guard rejects like the previous NaN path."""
    L = [[None] * 6 for _ in range(6)]
    for i in range(6):
        for j in range(i + 1):
            s = A[..., i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                L[i][j] = jnp.sqrt(jnp.maximum(s, 1e-12))
            else:
                L[i][j] = s / L[j][j]
    y = [None] * 6
    for i in range(6):
        s = g[..., i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    x = [None] * 6
    for i in range(5, -1, -1):
        s = y[i]
        for k in range(i + 1, 6):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return jnp.stack(x, axis=-1)


def _gn_solve(tr0, pts_prev, flow, weights, fx, cu, cv, baseline, iters):
    """Damped Gauss-Newton with per-match weights (0 disables a match)."""

    def resid_flat(tr):
        return (_residuals(tr, pts_prev, flow, fx, cu, cv, baseline)
                * weights[:, None]).reshape(-1)

    def step(tr, _):
        r = resid_flat(tr)
        J = jax.jacfwd(resid_flat)(tr)  # (4N, 6)
        A = J.T @ J + 1e-6 * jnp.eye(6)
        g = J.T @ r
        delta = _chol_solve6(A, g)
        # guard against divergence on degenerate samples
        ok = jnp.all(jnp.isfinite(delta)) & (jnp.linalg.norm(delta) < 10.0)
        tr_new = jnp.where(ok, tr - delta, tr)
        return tr_new, None

    tr, _ = jax.lax.scan(step, tr0, None, length=iters)
    return tr


@partial(jax.jit, static_argnames=("params",))
def estimate_motion(
    flow: jnp.ndarray,  # (N, 8) RawFlow rows
    valid: jnp.ndarray,  # (N,) bool
    calib_vec: jnp.ndarray,  # (4,): fx, cu, cv, baseline
    key: jnp.ndarray,  # PRNG key for hypothesis sampling
    initial_tr: jnp.ndarray,  # (6,) warm start
    params: VisualOdometryParams,
) -> MotionEstimate:
    fx, cu, cv, baseline = calib_vec[0], calib_vec[1], calib_vec[2], calib_vec[3]
    N = flow.shape[0]
    pts_prev = triangulate_prev(flow, fx, cu, cv, baseline)
    vweights = valid.astype(jnp.float32)
    n_valid = jnp.sum(vweights)

    # viso2-style column weighting: pixels near the principal column get
    # more weight (their disparity is more reliable for translation)
    col_w = 1.0 / (jnp.abs(flow[:, 4] - cu) / jnp.abs(cu) + 0.05)

    # --- hypothesis sampling: 3 DISTINCT valid matches per iteration -----
    # Gumbel top-3 = sampling without replacement (viso2 draws distinct
    # matches; duplicates make degenerate hypotheses and waste iterations)
    logits = jnp.where(valid, 0.0, -jnp.inf)
    keys = jax.random.split(key, params.ransac_iters)

    def sample_idx(k):
        # top-3 via 3 argmax+mask passes — identical selection to
        # lax.top_k(g, 3) but avoids its full-sort lowering on TPU
        g = jax.random.gumbel(k, (N,)) + logits
        lane = jax.lax.iota(jnp.int32, N)
        ids = []
        for _ in range(3):
            i = jnp.argmax(g)
            ids.append(i)
            g = jnp.where(lane == i, -jnp.inf, g)
        return jnp.stack(ids)

    sample_ids = jax.vmap(sample_idx)(keys)  # (iters, 3)

    # gather just the 3 sampled rows per hypothesis and run GN on them —
    # masking the FULL (N, 8) flow per hypothesis paid N/3 ~ 700x the
    # needed residual/jacobian work
    flow3 = flow[sample_ids]  # (iters, 3, 8)
    pts3 = pts_prev[sample_ids]  # (iters, 3, 3)
    w3 = valid[sample_ids].astype(jnp.float32)  # (iters, 3)

    def solve_hypothesis(pts3_i, flow3_i, w3_i):
        return _gn_solve(
            initial_tr, pts3_i, flow3_i, w3_i, fx, cu, cv, baseline, iters=6
        )

    trs = jax.vmap(solve_hypothesis)(pts3, flow3, w3)  # (iters, 6)

    # --- score all hypotheses ------------------------------------------
    def count_inliers(tr):
        r = _residuals(tr, pts_prev, flow, fx, cu, cv, baseline)
        err2 = jnp.sum(r * r, axis=-1)
        inl = (err2 < params.inlier_threshold_px**2 * 4.0) & valid
        return jnp.sum(inl), inl

    counts, inl_masks = jax.vmap(count_inliers)(trs)
    best = jnp.argmax(counts)
    best_inl = inl_masks[best]

    # --- final weighted refinement on the inlier set --------------------
    w_base = best_inl.astype(jnp.float32) * col_w
    tr_final = _gn_solve(
        trs[best], pts_prev, flow, w_base, fx, cu, cv, baseline,
        iters=params.gn_iters,
    )

    # Tukey-biweight IRLS rounds: the inlier set retains heavy-tailed
    # wrong-ish matches (e.g. LK corrections clipped at the search bound,
    # truncated-noise far points) that plain L2 — and even Huber — still
    # feels; their net pull is a systematic forward-scale shrinkage
    # (~-1.8 %/frame at the 320x96/f=260 gate config). A redescending
    # weight fully rejects them: measured -1.76 -> -0.27 %/frame.
    # Collapse guard: if the reweight leaves <6 supported matches (tiny
    # per-object match sets), keep the previous round's weights.
    c2 = params.tukey_c_px * params.tukey_c_px

    def irls_round(carry, _):
        tr, w_prev = carry
        r = _residuals(tr, pts_prev, flow, fx, cu, cv, baseline)
        rn2 = jnp.sum(r * r, axis=-1) / c2
        w = w_base * jnp.square(jnp.maximum(0.0, 1.0 - rn2))
        ok = jnp.sum(w > 0.0) >= 6
        w = jnp.where(ok, w, w_prev)
        tr2 = _gn_solve(tr, pts_prev, flow, w, fx, cu, cv, baseline, iters=4)
        return (tr2, w), None

    (tr_final, _), _ = jax.lax.scan(
        irls_round, (tr_final, w_base), None, length=params.irls_rounds
    )
    _, final_inl = count_inliers(tr_final)
    num_inl = jnp.sum(final_inl)

    T = se3.twist_to_transform(tr_final)
    success = (
        (n_valid >= 6)
        & (num_inl >= 6)
        & jnp.all(jnp.isfinite(tr_final))
    )
    tr_final = jnp.where(success, tr_final, jnp.zeros(6))
    T = jnp.where(success, T, jnp.eye(4))
    return MotionEstimate(tr_final, T, final_inl, num_inl, success)
