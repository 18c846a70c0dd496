"""Sparse feature detection, description, and circular stereo-temporal
matching — the TPU-native equivalent of libviso2's matcher
(used via `VisualOdometryStereo::process` + `getRawMatches`,
VisoSparseSFProvider.cpp:14-68).

Design: everything is fixed-shape and jitted.
- detection: blob + corner 5x5 filters (StereoScan-style), NMS by
  max-pooling, per-class top-k -> (K, 2) positions + class ids + validity
- description: 16-point Sobel sampling (4x4 grid, stride 2) -> 32-dim f32
- matching: dense descriptor distances on the MXU
  (|a|^2 + |b|^2 - 2 a.b), masked by epipolar/flow-window constraints and
  feature class, then a 4-image circular consistency check:
  cur-left -> prev-left -> prev-right -> cur-right -> cur-left.

The output "raw flow" rows follow the reference's RawFlow layout
(SparseSFProvider.h:16-42): (u1c, v1c, u2c, v2c, u1p, v1p, u2p, v2p).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from dynslam_tpu.config import VisualOdometryParams

# StereoScan / viso2-style 5x5 detection filters
_BLOB_KERNEL = np.array(
    [
        [-1, -1, -1, -1, -1],
        [-1, 1, 1, 1, -1],
        [-1, 1, 8, 1, -1],
        [-1, 1, 1, 1, -1],
        [-1, -1, -1, -1, -1],
    ],
    dtype=np.float32,
)
_CORNER_KERNEL = np.array(
    [
        [-1, -1, 0, 1, 1],
        [-1, -1, 0, 1, 1],
        [0, 0, 0, 0, 0],
        [1, 1, 0, -1, -1],
        [1, 1, 0, -1, -1],
    ],
    dtype=np.float32,
)
_SOBEL_X = np.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], dtype=np.float32)
_SOBEL_Y = _SOBEL_X.T.copy()

#: descriptor sampling offsets: 4x4 grid, stride 2 (viso2-like sparse patch)
_DESC_OFFSETS = [(dy, dx) for dy in (-3, -1, 1, 3) for dx in (-3, -1, 1, 3)]
DESC_DIM = 2 * len(_DESC_OFFSETS)  # dx + dy responses


class Features(NamedTuple):
    """Fixed-size feature set; invalid slots have valid=False."""

    pos: jnp.ndarray  # (K, 2) float32 (u, v)
    desc: jnp.ndarray  # (K, DESC_DIM) float32
    cls: jnp.ndarray  # (K,) int32 in [0, 4)
    score: jnp.ndarray  # (K,)
    valid: jnp.ndarray  # (K,) bool


def _conv2d(img: jnp.ndarray, kernels: np.ndarray) -> jnp.ndarray:
    """img (H, W), kernels (C, kh, kw) -> (C, H, W), SAME padding."""
    lhs = img[None, None]
    rhs = jnp.asarray(kernels)[:, None]
    out = jax.lax.conv_general_dilated(
        lhs, rhs, window_strides=(1, 1), padding="SAME"
    )
    return out[0]


@partial(jax.jit, static_argnames=("params",))
def detect_features_pair(
    left_gray: jnp.ndarray, right_gray: jnp.ndarray,
    params: VisualOdometryParams,
):
    """Detect on both stereo images with BATCHED compute: one vmapped
    trace merges the detection/Sobel convolutions and the bucketed
    top-k selections of the two images into single batched XLA ops.
    Returns (Features_left, Features_right)."""
    both = jax.vmap(lambda g: detect_features.__wrapped__(g, params))(
        jnp.stack([left_gray, right_gray])
    )
    pick = lambda i: jax.tree_util.tree_map(lambda x: x[i], both)
    return pick(0), pick(1)


@partial(jax.jit, static_argnames=("params",))
def detect_features(gray: jnp.ndarray, params: VisualOdometryParams) -> Features:
    """Detect up to params.max_candidates features on a float32 gray image."""
    h, w = gray.shape
    K = params.max_candidates
    per_class = K // 4

    resp = _conv2d(gray, np.stack([_BLOB_KERNEL, _CORNER_KERNEL]))  # (2, H, W)
    # 4 classes: blob max/min, corner max/min (matching viso2's 4 classes)
    responses = jnp.stack([resp[0], -resp[0], resp[1], -resp[1]])

    # exclude borders (descriptor sampling + filter support)
    margin = 5
    row = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    border = (row < margin) | (row >= h - margin) | (col < margin) | (col >= w - margin)
    responses = jnp.where(border[None], -jnp.inf, responses)

    n = params.nms_radius
    # separable max-pool: max over a (2n+1)^2 window == row-max of
    # col-maxes (exact), 2(2n+1) taps/px instead of (2n+1)^2
    local_max = jax.lax.reduce_window(
        responses, -jnp.inf, jax.lax.max, (1, 1, 2 * n + 1), (1, 1, 1),
        "SAME",
    )
    local_max = jax.lax.reduce_window(
        local_max, -jnp.inf, jax.lax.max, (1, 2 * n + 1, 1), (1, 1, 1),
        "SAME",
    )
    is_peak = (responses >= local_max) & (responses > params_tau(params))

    masked = jnp.where(is_peak, responses, -jnp.inf)

    # viso2-style bucketed selection (bucket.max_features per cell,
    # DynSLAMGUI.cpp:1238-1251): per-class, keep the best features of each
    # spatial bucket, then take the global top per_class among bucket
    # winners. Spreads features across the image (better-conditioned
    # egomotion) AND turns one 466k-element sort into small tile sorts.
    bs = 32  # bucket side in px
    hp = -(-h // bs) * bs
    wp = -(-w // bs) * bs
    n_tiles = (hp // bs) * (wp // bs)
    # per-bucket keep count: viso2's 15-per-50x50 scales to ~8 per 32x32;
    # raised when there are too few buckets to fill per_class twice over
    bk = min(bs * bs, max(8, -(-2 * per_class // n_tiles)))
    padded = jnp.full((4, hp, wp), -jnp.inf).at[:, :h, :w].set(masked)
    tiles = padded.reshape(4, hp // bs, bs, wp // bs, bs)
    tiles = tiles.transpose(0, 1, 3, 2, 4).reshape(4, -1, bs * bs)
    tscore, tidx = jax.lax.top_k(tiles, bk)  # (4, T, bk)
    n_tiles_x = wp // bs
    tile_id = jax.lax.broadcasted_iota(jnp.int32, tscore.shape, 1)
    ty = (tile_id // n_tiles_x) * bs + tidx // bs
    tx = (tile_id % n_tiles_x) * bs + tidx % bs
    cand_flat = (ty * w + jnp.minimum(tx, w - 1)).reshape(4, -1)
    cand_score = tscore.reshape(4, -1)

    k_eff = min(per_class, cand_score.shape[1])
    scores_k, sel = jax.lax.top_k(cand_score, k_eff)
    flat_k = jnp.take_along_axis(cand_flat, sel, axis=1)
    if k_eff < per_class:
        pad = per_class - k_eff
        scores = jnp.concatenate(
            [scores_k, jnp.full((4, pad), -jnp.inf)], axis=1
        )
        flat_idx = jnp.concatenate(
            [flat_k, jnp.zeros((4, pad), flat_k.dtype)], axis=1
        )
    else:
        scores, flat_idx = scores_k, flat_k
    yi = flat_idx // w
    xi_ = flat_idx % w

    # subpixel localization: 1D parabola through the response peak in x
    # and y (crucial at low resolution — integer disparity would quantize
    # triangulated depth; viso2 gets this from match.refinement=1)
    flat_resp = responses.reshape(4, h * w)

    def resp_at(dy, dx):
        yy = jnp.clip(yi + dy, 0, h - 1)
        xx = jnp.clip(xi_ + dx, 0, w - 1)
        return jnp.take_along_axis(flat_resp, yy * w + xx, axis=1)

    r0 = scores

    def safe(r):
        return jnp.where(jnp.isfinite(r), r, r0)

    rl, rr = safe(resp_at(0, -1)), safe(resp_at(0, 1))
    rt, rb = safe(resp_at(-1, 0)), safe(resp_at(1, 0))

    def parab(minus, center, plus):
        denom = minus - 2.0 * center + plus
        off = jnp.where(
            jnp.abs(denom) > 1e-6, 0.5 * (minus - plus) / denom, 0.0
        )
        return jnp.clip(off, -0.5, 0.5)

    xs = xi_.astype(jnp.float32) + parab(rl, r0, rr)
    ys = yi.astype(jnp.float32) + parab(rt, r0, rb)

    pos = jnp.stack([xs.reshape(-1), ys.reshape(-1)], axis=-1)
    cls = jnp.repeat(jnp.arange(4, dtype=jnp.int32), per_class)
    score = scores.reshape(-1)
    valid = jnp.isfinite(score)

    # descriptors: sparse Sobel samples at the integer peak — extracted
    # GATHER-FREE (per-element gathers cost ~120 ns each on TPU,
    # PERFORMANCE.md): per-feature 8x8 row slabs of both Sobel channels
    # (contiguous row DMA, channels side by side so ONE slab + ONE
    # one-hot MXU contraction serve both), then the 4x4 stride-2 offset
    # grid is a STATIC slice of the window (offsets are integers and
    # margin=5 keeps every valid peak's window interior — identical
    # values to per-sample clipped gathers; invalid lanes are zeroed,
    # they are masked out of matching by `valid` anyway)
    sob = _conv2d(gray, np.stack([_SOBEL_X, _SOBEL_Y]))  # (2, H, W)
    xi = xi_.reshape(-1)
    yi = yi.reshape(-1)
    WD = 8  # window side: offsets span [-3, 3], anchored at peak - 3
    y0 = jnp.clip(yi - 3, 0, h - WD)
    x0 = jnp.clip(xi - 3, 0, w - WD)
    sob2 = jnp.concatenate([sob[0], sob[1]], axis=1)  # (H, 2W)
    rows = jax.vmap(
        lambda y: jax.lax.dynamic_slice(sob2, (y, 0), (WD, 2 * w))
    )(y0)  # (K, 8, 2w)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, 2 * w, 2 * WD), 1)
    coff = jnp.concatenate([
        jnp.arange(WD, dtype=jnp.int32),
        w + jnp.arange(WD, dtype=jnp.int32),
    ])
    onehot = (col == (x0[:, None, None] + coff[None, None, :])).astype(
        jnp.float32
    )  # (K, 2w, 16)
    wins = jax.lax.dot_general(
        rows, onehot,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (K, 8, 16): rows, then [sobel-x cols 0:8 | sobel-y cols 8:16]
    wx = wins[:, 0:7:2, 0:7:2]  # (K, 4, 4) at the stride-2 grid
    wy = wins[:, 0:7:2, 8:15:2]
    desc = jnp.stack([wx, wy], axis=-1).reshape(wins.shape[0], DESC_DIM)
    desc = jnp.where(valid[:, None], desc, 0.0)

    pos = jnp.where(valid[:, None], pos, -1e6)
    return Features(pos, desc, cls, score, valid)


def params_tau(params: VisualOdometryParams) -> float:
    """Detection threshold on |filter response| (uint8-scale images)."""
    return 25.0


def _pairwise_dist2(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Squared L2 distances (Ka, Kb) via one MXU matmul."""
    a2 = jnp.sum(a * a, axis=-1, keepdims=True)
    b2 = jnp.sum(b * b, axis=-1, keepdims=True)
    ab = jnp.dot(a, b.T, preferred_element_type=jnp.float32)
    return a2 + b2.T - 2.0 * ab


@partial(jax.jit, static_argnames=("radius",))
def refine_stereo_disparity(
    left_img: jnp.ndarray,
    right_img: jnp.ndarray,
    u_left: jnp.ndarray,
    v_left: jnp.ndarray,
    u_right: jnp.ndarray,
    radius: int = 3,
) -> jnp.ndarray:
    """Subpixel-refine the right-image x coordinate of stereo matches by a
    parabolic fit on patch SAD at x-shifts {-1, 0, +1} (viso2's
    match.refinement=1 equivalent). Per-image peak interpolation alone
    leaves a left/right phase bias that corrupts triangulated depth; this
    measures the *relative* displacement directly."""
    h, w = left_img.shape
    ul = jnp.round(u_left).astype(jnp.int32)
    vl = jnp.round(v_left).astype(jnp.int32)
    ur = jnp.round(u_right).astype(jnp.int32)

    def patch(img, uc, vc, dx_extra):
        acc = []
        for dy in range(-radius, radius + 1):
            for dx in range(-radius, radius + 1):
                yy = jnp.clip(vc + dy, 0, h - 1)
                xx = jnp.clip(uc + dx + dx_extra, 0, w - 1)
                acc.append(img[yy, xx])
        return jnp.stack(acc, axis=-1)  # (M, P)

    pl = patch(left_img, ul, vl, 0)
    sads = []
    for s in (-1, 0, 1):
        pr = patch(right_img, ur, vl, s)
        sads.append(jnp.sum(jnp.abs(pl - pr), axis=-1))
    sm, s0, sp = sads
    denom = sm - 2.0 * s0 + sp
    off = jnp.where(denom > 1e-6, 0.5 * (sm - sp) / jnp.maximum(denom, 1e-6), 0.0)
    off = jnp.clip(off, -1.0, 1.0)
    # the SAD offset is phase-referenced to the ROUNDED left patch; add the
    # left feature's subpixel remainder so u_left - u_right stays consistent
    return ur.astype(jnp.float32) + off + (u_left - ul.astype(jnp.float32))


def _bilinear(img: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample img at fractional (x, y); clamped borders."""
    h, w = img.shape
    x = jnp.clip(x, 0.0, w - 1.001)
    y = jnp.clip(y, 0.0, h - 1.001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    ax = x - x0
    ay = y - y0
    v00 = img[y0, x0]
    v01 = img[y0, x0 + 1]
    v10 = img[y0 + 1, x0]
    v11 = img[y0 + 1, x0 + 1]
    return (
        v00 * (1 - ax) * (1 - ay)
        + v01 * ax * (1 - ay)
        + v10 * (1 - ax) * ay
        + v11 * ax * ay
    )


#: per-match LK window extent (pixels). Samples live in
#: [center - 6.4, center + 6.4] (drift <= 1.5, offsets 3 * (1+s) with
#: s <= 0.3, +1 bilinear corner), so an 18-window anchored 8 px before
#: the rounded center covers every read with exact interior gradients.
_LK_WIN = 18


def _extract_windows(img: jnp.ndarray, x0: jnp.ndarray, y0: jnp.ndarray):
    """Per-match (K, 18, 18) image windows with top-left int corners
    (x0, y0), gather-free: contiguous ROW slabs stream at HBM speed
    (unlike per-element gathers, ~20-120 ns each on TPU), and the column
    crop is a batched one-hot MXU contraction."""
    h, w = img.shape
    W = _LK_WIN
    y0 = jnp.clip(y0, 0, h - W)
    x0 = jnp.clip(x0, 0, w - W)
    rows = jax.vmap(
        lambda y: jax.lax.dynamic_slice(img, (y, 0), (W, w))
    )(y0)  # (K, W, w) — contiguous row gather
    cid = jax.lax.broadcasted_iota(jnp.int32, (1, w, W), 1)
    sel = (cid == x0[:, None, None]
           + jax.lax.broadcasted_iota(jnp.int32, (1, w, W), 2))
    onehot = sel.astype(jnp.float32)  # (K, w, W)
    return jax.lax.dot_general(
        rows, onehot,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (K, W, W)


def _tent(pos: jnp.ndarray) -> jnp.ndarray:
    """(K, P) fractional positions -> (K, P, W) bilinear row/col weights
    (the tent function is exactly the 2-tap bilinear kernel)."""
    grid = jnp.arange(_LK_WIN, dtype=jnp.float32)
    return jnp.maximum(0.0, 1.0 - jnp.abs(pos[..., None] - grid))


def _sample_windows(wins, lx, ly):
    """Sample stacked per-match windows at fractional local positions.
    wins: (K, W, W, C) value/gradient channels; lx, ly: (K, P).
    Returns (K, P, C). Bilinear = separable tent weights contracted on
    the MXU — no gathers anywhere."""
    lx = jnp.clip(lx, 0.0, _LK_WIN - 1.001)
    ly = jnp.clip(ly, 0.0, _LK_WIN - 1.001)
    wy = _tent(ly)  # (K, P, W)
    wx = _tent(lx)  # (K, P, W)
    # (K, P, W) x (K, W, W*C) -> (K, P, W*C)
    K, W = wins.shape[0], _LK_WIN
    C = wins.shape[-1]
    rowmix = jax.lax.dot_general(
        wy, wins.reshape(K, W, W * C),
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).reshape(K, -1, W, C)
    return jnp.sum(rowmix * wx[..., None], axis=2)  # (K, P, C)


@partial(jax.jit, static_argnames=("radius", "iters"))
def refine_flow_quad(
    cur_l: jnp.ndarray,
    cur_r: jnp.ndarray,
    prev_l: jnp.ndarray,
    prev_r: jnp.ndarray,
    flow: jnp.ndarray,
    radius: int = 3,
    iters: int = 3,
) -> jnp.ndarray:
    """Consistent-reference subpixel refinement of matched quadruplets.

    The observation reference is the ROUNDED current-left pixel; its patch
    is aligned into the current-right, previous-left, and previous-right
    images by iterative Lucas-Kanade — unbiased where 3-point SAD
    parabolas are not. All four coordinates then describe the *same*
    physical patch, so detector-phase errors cancel in both disparity and
    temporal flow (the role of viso2's match.refinement). Stereo
    alignments are 1-dof (x only) on the reference row — the pairs are
    rectified. Returns refined (K, 8) flow.

    TPU shape: per-match 18x18 windows are extracted ONCE per image
    (contiguous row slabs + a one-hot column contraction, no element
    gathers — see `_extract_windows`); every LK iteration then samples
    values and analytic gradients from the windows with separable
    bilinear tent weights on the MXU. Zero per-element gathers anywhere.
    """
    h, w = cur_l.shape
    A = _LK_WIN // 2 - 1  # window anchor offset before the rounded center
    # every sample (drift 1.5 + offsets radius*(1+0.3) + 1 bilinear
    # corner) must stay inside the window with exact interior gradients
    assert radius * 1.3 + 2.5 <= A, "patch radius too large for _LK_WIN"
    ui = jnp.round(flow[:, 0]).astype(jnp.int32)
    vi = jnp.round(flow[:, 1]).astype(jnp.int32)

    offs = [
        (float(dy), float(dx))
        for dy in range(-radius, radius + 1)
        for dx in range(-radius, radius + 1)
    ]
    # patch sampling offsets as arrays, for the scale dof
    off_dy = jnp.asarray([dy for dy, dx in offs], jnp.float32)
    off_dx = jnp.asarray([dx for dy, dx in offs], jnp.float32)

    # ---- batched window extraction: all four images in ONE vmapped
    # trace (like detect_features_pair, merging the row-slab gathers and
    # one-hot contractions into batched XLA ops)
    vp0i = jnp.round(flow[:, 5]).astype(jnp.int32)
    u2c0i = jnp.round(flow[:, 2]).astype(jnp.int32)
    u1p0i = jnp.round(flow[:, 4]).astype(jnp.int32)
    u2p0i = jnp.round(flow[:, 6]).astype(jnp.int32)
    imgs4 = jnp.stack([cur_l, cur_r, prev_l, prev_r])
    x0s = jnp.stack([ui, u2c0i, u1p0i, u2p0i])
    y0s = jnp.stack([vi, vi, vp0i, vp0i])
    ax4 = jnp.clip(x0s - A, 0, w - _LK_WIN)
    ay4 = jnp.clip(y0s - A, 0, h - _LK_WIN)
    win4 = jax.vmap(_extract_windows)(imgs4, ax4, ay4)  # (4, K, 18, 18)
    # central differences with ONE-SIDED edges (jnp.gradient semantics):
    # jnp.roll would wrap around the window, and border features (whose
    # anchor got clipped by ax4/ay4) do sample the edge rows/cols
    gx4 = jnp.gradient(win4, axis=3)
    gy4 = jnp.gradient(win4, axis=2)
    wins4 = jnp.stack([win4, gx4, gy4], axis=-1)  # (4, K, 18, 18, 3)

    def windows_of(i):
        return (wins4[i], ax4[i].astype(jnp.float32),
                ay4[i].astype(jnp.float32))

    def sample_patch_scaled(wins3, ax, ay, x, y, s):
        """Patch (values + analytic gradients) whose offsets are scaled
        by (1+s) — absorbs the radial-expansion field of forward motion,
        which otherwise biases the translational estimate of large flows
        toward zero. Returns (t, gx, gy), each (K, P)."""
        xs = x[:, None] + off_dx[None, :] * (1.0 + s)[:, None]
        ys = y[:, None] + off_dy[None, :] * (1.0 + s)[:, None]
        out = _sample_windows(wins3, xs - ax[:, None], ys - ay[:, None])
        return out[..., 0], out[..., 1], out[..., 2]

    ui_f = ui.astype(jnp.float32)
    vi_f = vi.astype(jnp.float32)
    ref_w, ref_ax, ref_ay = windows_of(0)
    ref, _, _ = sample_patch_scaled(
        ref_w, ref_ax, ref_ay, ui_f, vi_f, jnp.zeros_like(ui_f)
    )

    def lk(wins3, ax, ay, x0, y0, solve_y: bool):
        """Align ref into the windows starting at (x0, y0); returns
        (x, y). Solves for (dx[, dy, dscale]) per match."""

        def step(carry, _):
            x, y, s = carry
            t, gx, gy = sample_patch_scaled(wins3, ax, ay, x, y, s)
            # d(patch)/d(scale) = offsets . gradient
            gs = gx * off_dx[None, :] + gy * off_dy[None, :]
            r = t - ref
            if solve_y:
                g = jnp.stack([gx, gy, gs], axis=1)  # (K, 3, P)
                A3 = jnp.einsum("kip,kjp->kij", g, g) + 1e-4 * jnp.eye(3)
                bvec = jnp.einsum("kip,kp->ki", g, r)
                delta = -jnp.linalg.solve(A3, bvec[..., None])[..., 0]
                dx, dy, ds = delta[:, 0], delta[:, 1], delta[:, 2]
            else:
                dx = -jnp.sum(gx * r, -1) / (jnp.sum(gx * gx, -1) + 1e-6)
                dy = jnp.zeros_like(dx)
                ds = jnp.zeros_like(dx)
            dx = jnp.clip(dx, -1.0, 1.0)
            dy = jnp.clip(dy, -1.0, 1.0)
            ds = jnp.clip(ds, -0.1, 0.1)
            return (x + dx, y + dy, jnp.clip(s + ds, -0.3, 0.3)), None

        s0 = jnp.zeros_like(x0)
        (x, y, s), _ = jax.lax.scan(step, (x0, y0, s0), None, length=iters)
        # reject divergence: stay within 1.5 px of the integer match
        x = jnp.clip(x, x0 - 1.5, x0 + 1.5)
        y = jnp.clip(y, y0 - 1.5, y0 + 1.5)
        return x, y

    vp0 = vp0i.astype(jnp.float32)

    cr_w, cr_ax, cr_ay = windows_of(1)
    u2c, _ = lk(cr_w, cr_ax, cr_ay, u2c0i.astype(jnp.float32), vi_f, False)

    plw, pl_ax, pl_ay = windows_of(2)
    u1p, v1p = lk(plw, pl_ax, pl_ay, u1p0i.astype(jnp.float32), vp0, True)

    # prev-right: x free, row fixed to the prev-left refined row (rectified)
    prw, pr_ax, pr_ay = windows_of(3)

    def lk_x_at_row(wins3, ax, ay, x0, row):
        def step(carry, _):
            x = carry
            t, gx, _ = sample_patch_scaled(
                wins3, ax, ay, x, row, jnp.zeros_like(x)
            )
            r = t - ref
            dx = -jnp.sum(gx * r, -1) / (jnp.sum(gx * gx, -1) + 1e-6)
            return x + jnp.clip(dx, -1.0, 1.0), None

        x, _ = jax.lax.scan(step, x0, None, length=iters)
        return jnp.clip(x, x0 - 1.5, x0 + 1.5)

    u2p = lk_x_at_row(prw, pr_ax, pr_ay, u2p0i.astype(jnp.float32), v1p)

    return jnp.stack(
        [
            ui.astype(jnp.float32),
            vi_f,
            u2c,
            vi_f,  # rectified current pair: same row
            u1p,
            v1p,
            u2p,
            v1p,  # rectified previous pair: same row
        ],
        axis=-1,
    )


@partial(jax.jit, static_argnames=("params",))
def circular_match(
    cur_left: Features,
    cur_right: Features,
    prev_left: Features,
    prev_right: Features,
    params: VisualOdometryParams,
):
    """4-image circular matching. Returns (flow (K, 8), valid (K,)) where
    rows are RawFlow-ordered: u1c v1c u2c v2c u1p v1p u2p v2p.

    All four directed matches run BATCHED: one (4, K, 32) x (4, 32, K)
    MXU distance computation and one batched mask/argmin over the pair
    axis, instead of four separate op sequences (same batching win as
    detect_features_pair)."""
    A = (cur_left, prev_left, prev_right, cur_right)
    Bf = (prev_left, prev_right, cur_right, cur_left)
    fa_desc = jnp.stack([f.desc for f in A])
    fb_desc = jnp.stack([f.desc for f in Bf])
    fa_pos = jnp.stack([f.pos for f in A])
    fb_pos = jnp.stack([f.pos for f in Bf])
    fa_cls = jnp.stack([f.cls for f in A])
    fb_cls = jnp.stack([f.cls for f in Bf])
    fa_val = jnp.stack([f.valid for f in A])
    fb_val = jnp.stack([f.valid for f in Bf])

    a2 = jnp.sum(fa_desc * fa_desc, axis=-1)[..., None]
    b2 = jnp.sum(fb_desc * fb_desc, axis=-1)[:, None, :]
    ab = jnp.einsum("pkd,pld->pkl", fa_desc, fb_desc,
                    preferred_element_type=jnp.float32)
    d2 = a2 + b2 - 2.0 * ab  # (4, K, K)

    du = fa_pos[:, :, None, 0] - fb_pos[:, None, :, 0]
    dv = fa_pos[:, :, None, 1] - fb_pos[:, None, :, 1]
    band = params.epipolar_band_px
    maxd = params.max_disparity
    ok_flow = (du * du + dv * dv) <= params.flow_radius_px ** 2
    ok_l2r = (jnp.abs(dv) <= band) & (du > 0.1) & (du <= maxd)
    ok_r2l = (jnp.abs(dv) <= band) & (du < -0.1) & (du >= -maxd)
    # modes per pair: flow, stereo_l2r, flow, stereo_r2l
    code = jnp.asarray([0, 1, 0, 2])[:, None, None]
    ok = jnp.where(code == 0, ok_flow,
                   jnp.where(code == 1, ok_l2r, ok_r2l))
    ok &= fa_cls[:, :, None] == fb_cls[:, None, :]
    ok &= fa_val[:, :, None] & fb_val[:, None, :]
    cost = jnp.where(ok, d2, jnp.inf)
    best = jnp.argmin(cost, axis=2).astype(jnp.int32)  # (4, K)
    okm = jnp.isfinite(jnp.min(cost, axis=2))
    i_pl, i_pr, i_cr, i_cl = best[0], best[1], best[2], best[3]
    ok1, ok2, ok3, ok4 = okm[0], okm[1], okm[2], okm[3]

    j = i_pl  # prev-left index per cur-left feature
    k = i_pr[j]
    l = i_cr[k]
    m = i_cl[l]

    K = cur_left.pos.shape[0]
    idx = jnp.arange(K, dtype=jnp.int32)
    circle_ok = m == idx
    chain_ok = ok1 & ok2[j] & ok3[k] & ok4[l]

    u1c, v1c = cur_left.pos[:, 0], cur_left.pos[:, 1]
    u2c, v2c = cur_right.pos[l, 0], cur_right.pos[l, 1]
    u1p, v1p = prev_left.pos[j, 0], prev_left.pos[j, 1]
    u2p, v2p = prev_right.pos[k, 0], prev_right.pos[k, 1]

    # both stereo pairs must have positive, bounded disparity
    disp_c = u1c - u2c
    disp_p = u1p - u2p
    geo_ok = (
        (disp_c > 0.1)
        & (disp_p > 0.1)
        & (disp_c <= params.max_disparity)
        & (disp_p <= params.max_disparity)
        & (jnp.abs(v1c - v2c) <= params.epipolar_band_px)
        & (jnp.abs(v1p - v2p) <= params.epipolar_band_px)
    )

    valid = circle_ok & chain_ok & geo_ok & cur_left.valid
    flow = jnp.stack([u1c, v1c, u2c, v2c, u1p, v1p, u2p, v2p], axis=-1)
    flow = jnp.where(valid[:, None], flow, 0.0)
    return flow, valid
