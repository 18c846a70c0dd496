"""Dense stereo disparity — the TPU-native replacement for libelas /
DispNet (the reference consumes their offline dumps,
PrecomputedDepthProvider.cpp:22-75; see BASELINE config 1).

Algorithm (classic semi-dense block matching, redesigned for XLA):
  1. census transform (7x7 window -> 48-bit signature in two int32 lanes)
  2. per-disparity Hamming cost via XOR + `lax.population_count`
  3. box aggregation with `lax.reduce_window` (runs on the VPU; XLA fuses
     the shift/xor/popcount chain into it)
  4. winner-take-all over the disparity axis with parabolic subpixel
     refinement, a uniqueness-ratio check (excluding the +-1 neighbors),
     left-right consistency, and a 3x3 median clean-up pass.

Everything is one jitted function over static shapes; the disparity loop
is a `lax.map` over the disparity axis (bounded memory, no Python loop).
Invalid pixels get disparity 0, which the depth converter
(ops/depth.py) already treats as missing — same convention as the
reference's PFM/XML readers.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from dynslam_tpu.config import StereoMatcherParams


def _to_gray_f32(img: jnp.ndarray) -> jnp.ndarray:
    if img.ndim == 3:
        f = img.astype(jnp.float32)
        return 0.299 * f[..., 0] + 0.587 * f[..., 1] + 0.114 * f[..., 2]
    return img.astype(jnp.float32)


def census_transform(gray: jnp.ndarray, radius: int) -> jnp.ndarray:
    """(H, W) -> (2, H, W) int32 census signature (hi/lo bit lanes).

    Bit k is set when the window pixel is darker than the center. Border
    pixels compare against zero-padded neighbors (standard behavior).
    """
    h, w = gray.shape
    offsets = [
        (dy, dx)
        for dy in range(-radius, radius + 1)
        for dx in range(-radius, radius + 1)
        if not (dy == 0 and dx == 0)
    ]
    assert len(offsets) <= 64, "census window too large for 2 int32 lanes"
    padded = jnp.pad(gray, radius)
    lanes = [jnp.zeros((h, w), jnp.int32), jnp.zeros((h, w), jnp.int32)]
    for k, (dy, dx) in enumerate(offsets):
        neigh = jax.lax.dynamic_slice(padded, (radius + dy, radius + dx), (h, w))
        bit = (neigh < gray).astype(jnp.int32)
        lane, pos = divmod(k, 32)
        lanes[lane] = lanes[lane] | (bit << pos)
    return jnp.stack(lanes)


def _box_sum_i32(x: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Integer sum over a (2r+1)^2 window, SAME padding — separable (two
    1-D passes, 2k adds/px instead of k^2)."""
    k = 2 * radius + 1
    x = jax.lax.reduce_window(x, 0, jax.lax.add, (k, 1), (1, 1), "SAME")
    return jax.lax.reduce_window(x, 0, jax.lax.add, (1, k), (1, 1), "SAME")


@partial(jax.jit, static_argnames=("params",))
def compute_disparity_jit(
    left_gray: jnp.ndarray,
    right_gray: jnp.ndarray,
    params: StereoMatcherParams,
) -> jnp.ndarray:
    h, w = left_gray.shape
    D = params.max_disparity
    cl = census_transform(left_gray, params.census_radius)
    cr = census_transform(right_gray, params.census_radius)

    col = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)

    def cost_at(d):
        # right census shifted right by d: right pixel (x - d) matches left x
        shifted = jnp.roll(cr, d, axis=2)
        ham = jax.lax.population_count(
            (cl ^ shifted).astype(jnp.uint32)
        ).astype(jnp.int32).sum(axis=0)
        # columns x < d have no right-image counterpart
        ham = jnp.where(col < d, 96, ham)
        # aggregated cost <= 96 * (2r+1)^2 < 32767: store the volume as
        # int16 — the (D, H, W) volume is read several times downstream
        # and the sweep is HBM-bound, so halving its bytes matters
        return _box_sum_i32(ham, params.aggregation_radius).astype(jnp.int16)

    # chunked disparity sweep: vmap vectorizes CH disparities per map step
    # (128 tiny sequential kernels would leave the VPU idle)
    CH = 16 if D % 16 == 0 else (8 if D % 8 == 0 else 1)
    if CH > 1:
        costs = jax.lax.map(
            lambda d0: jax.vmap(cost_at)(d0 + jnp.arange(CH)),
            jnp.arange(0, D, CH),
        ).reshape(D, h, w)
    else:
        costs = jax.lax.map(cost_at, jnp.arange(D))  # (D, H, W)

    best_d = jnp.argmin(costs, axis=0)  # (H, W) int
    c0 = jnp.min(costs, axis=0).astype(jnp.float32)

    # neighbor costs (subpixel parabola) + runner-up (uniqueness) via ONE
    # chunked masked-reduce pass over the volume — take_along_axis with
    # computed indices is a TPU element-gather slow path (~19 ms for the
    # three taps at KITTI size); masked mins are pure VPU streaming
    BIG = jnp.int16(32767)

    def chunk_stats(d0):
        sl = jax.lax.dynamic_slice_in_dim(costs, d0, CH, 0)  # (CH, H, W)
        dd = d0 + jnp.arange(CH)[:, None, None]
        bd = best_d[None]
        cm_c = jnp.min(jnp.where(dd == bd - 1, sl, BIG), axis=0)
        cp_c = jnp.min(jnp.where(dd == bd + 1, sl, BIG), axis=0)
        sec_c = jnp.min(jnp.where(jnp.abs(dd - bd) > 1, sl, BIG), axis=0)
        return cm_c, cp_c, sec_c

    cm_ch, cp_ch, sec_ch = jax.lax.map(chunk_stats, jnp.arange(0, D, CH))
    cm = jnp.min(cm_ch, axis=0).astype(jnp.float32)
    cp = jnp.min(cp_ch, axis=0).astype(jnp.float32)
    second = jnp.min(sec_ch, axis=0).astype(jnp.float32)
    # border taps (best_d = 0 or D-1) behave like the old clipped take:
    # reuse the center cost there
    cm = jnp.where(best_d == 0, c0, cm)
    cp = jnp.where(best_d == D - 1, c0, cp)

    # parabolic subpixel: offset in [-0.5, 0.5]
    denom = cm - 2.0 * c0 + cp
    offset = jnp.where(
        denom > 1e-6, 0.5 * (cm - cp) / jnp.maximum(denom, 1e-6), 0.0
    )
    offset = jnp.clip(offset, -0.5, 0.5)
    disp = best_d.astype(jnp.float32) + offset

    # uniqueness: best must beat runner-up (excluding +-1 neighbors)
    unique_ok = c0 <= params.uniqueness * second

    # left-right consistency: cost_R(x, d) = cost_L(x + d, d). The right
    # argmin runs as a chunked running min (the (D, H, W) right volume is
    # never materialized)
    def lr_chunk(carry, d0):
        best_c, best_i = carry
        sl = jax.lax.dynamic_slice_in_dim(costs, d0, CH, 0)
        dd = d0 + jnp.arange(CH)[:, None, None]

        def one(args):
            cost_plane, d = args
            rolled = jnp.roll(cost_plane, -d, axis=1)
            return jnp.where(col >= w - d, BIG, rolled)

        rolled = jax.vmap(one)((sl, d0 + jnp.arange(CH)))  # (CH, H, W)
        c_min = jnp.min(rolled, axis=0)
        i_min = d0 + jnp.argmin(rolled, axis=0).astype(jnp.int32)
        upd = c_min < best_c  # strict: ties keep the lower disparity
        return (jnp.where(upd, c_min, best_c),
                jnp.where(upd, i_min, best_i)), None

    (_, best_d_r), _ = jax.lax.scan(
        lr_chunk,
        (jnp.full((h, w), BIG, jnp.int16), jnp.zeros((h, w), jnp.int32)),
        jnp.arange(0, D, CH),
    )

    # sample best_d_r at x - best_d (the integer winner, NOT the subpixel
    # round — they can differ by one column near discontinuities, which
    # is within lr_max_diff tolerance anyway): gather-free masked-roll
    # accumulation over the same disparity chunks (best_d selects which
    # rolled copy each pixel reads)
    def warp_chunk(carry, d0):
        acc = carry
        dd = d0 + jnp.arange(CH)[:, None, None]
        rolled = jax.vmap(
            lambda d: jnp.roll(best_d_r, d, axis=1)
        )(d0 + jnp.arange(CH))  # (CH, H, W)
        sel = (dd == best_d[None])
        return acc + jnp.sum(jnp.where(sel, rolled, 0), axis=0), None

    disp_r_at, _ = jax.lax.scan(
        warp_chunk, jnp.zeros((h, w), jnp.int32), jnp.arange(0, D, CH)
    )
    lr_ok = jnp.abs(disp - disp_r_at.astype(jnp.float32)) \
        <= params.lr_max_diff

    # borders where the search window ran off the image
    in_range = (col >= D) | (best_d < col)
    valid = unique_ok & lr_ok & in_range & (best_d > 0)
    disp = jnp.where(valid, disp, 0.0)

    # 3x3 median filter (sorting network over 9 shifted copies)
    if params.subpixel:
        neigh = []
        padded = jnp.pad(disp, 1, mode="edge")
        for dy in range(3):
            for dx in range(3):
                neigh.append(jax.lax.dynamic_slice(padded, (dy, dx), (h, w)))
        stacked = jnp.stack(neigh)
        disp = jnp.sort(stacked, axis=0)[4]

    if params.fill_gaps > 0:
        disp = fill_disparity_gaps(disp, params.fill_gaps)

    return disp.astype(jnp.float32)


@partial(jax.jit, static_argnames=("max_gap",))
def fill_disparity_gaps(disp: jnp.ndarray, max_gap: int) -> jnp.ndarray:
    """ELAS-role gap interpolation: horizontal invalid runs up to
    `max_gap` px are filled with the SMALLER (background) of the two
    flanking valid disparities — the KITTI background-interpolation
    convention that libelas's support-point triangulation approximates
    (the reference's live path relies on ELAS producing near-dense
    maps). Longer runs (sky, occlusion fans) stay invalid.

    Gather-free: nearest-valid value/distance on each side via
    log2(W) shift-doubling passes on the VPU."""
    h, w = disp.shape
    big = jnp.float32(1e9)
    valid = disp > 0

    def sh_from_left(x, k, pad):
        return jnp.concatenate(
            [jnp.full((h, k), pad, x.dtype), x[:, :-k]], axis=1
        )

    def sh_from_right(x, k, pad):
        return jnp.concatenate(
            [x[:, k:], jnp.full((h, k), pad, x.dtype)], axis=1
        )

    v0 = jnp.where(valid, disp, 0.0)
    d0 = jnp.where(valid, 0.0, big)

    def nearest(shift):
        vals, dist = v0, d0
        k = 1
        while k < w:
            sv = shift(vals, k, 0.0)
            sd = shift(dist, k, big) + k
            take = sd < dist
            vals = jnp.where(take, sv, vals)
            dist = jnp.where(take, sd, dist)
            k *= 2
        return vals, dist

    lv, ldist = nearest(sh_from_left)
    rv, rdist = nearest(sh_from_right)
    fill = jnp.minimum(jnp.where(lv > 0, lv, big),
                       jnp.where(rv > 0, rv, big))
    run_ok = (ldist + rdist - 1 <= max_gap) & (lv > 0) & (rv > 0)
    return jnp.where(~valid & run_ok, fill, disp)


def compute_disparity(left, right, params: StereoMatcherParams | None = None):
    """Host entry: RGB/gray uint8 or float arrays -> float32 disparity."""
    params = params or StereoMatcherParams()
    lg = _to_gray_f32(jnp.asarray(left))
    rg = _to_gray_f32(jnp.asarray(right))
    return compute_disparity_jit(lg, rg, params)
