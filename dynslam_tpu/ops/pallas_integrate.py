"""Pallas TSDF fusion kernel — the hot `IntegrateIntoScene` path
(/root/reference/src/DynSLAM/InfiniTamDriver.h:137-146) as a hand-written
TPU kernel.

Why: the XLA version is bound by per-voxel random-access image gathers
(measured ~120 ns/element through this environment's TPU, ~8.4M per
frame). This kernel removes every per-element gather:

- **Compact-then-kernel**: visible voxel rows are gathered into a dense
  (V, 4, 128) array by XLA *row* gathers (contiguous rows stream at
  HBM speed — unlike element gathers), processed by the kernel
  B blocks per grid step through auto-pipelined BlockSpecs, and row-
  scattered back. No in-kernel DMA choreography needed.
- the image stays **resident in VMEM** as five pre-split bf16 planes
  (depth hi/lo bytes + r/g/b, ~5 MB padded at KITTI size); each block
  dynamic-slices a window around its projected footprint (`pl.ds`,
  8/128-aligned starts);
- per-voxel pixel sampling is a **one-hot MXU contraction** in the
  "outer-dim" layout: the column one-hot is built as (win_w, 4, 128)
  — voxel planes stay in their native (4, 128) sublane x lane layout,
  broadcasts run along the cheap outer dim, and no relayout/transpose
  ever touches a (4, 128) plane. The window contracts against it on
  the MXU ((win_h, win_w) x (win_w, 4, 128) -> (win_h, 4, 128)), and a
  row one-hot masked sum over the outer dim finishes the sample. 8-bit
  integer planes are exact in bf16 and accumulate in f32, so sampling
  is bit-exact while running at the MXU's native bf16 rate.
- a per-block **occlusion gate** (window max depth vs block min z)
  copies provably-unchanged blocks through without touching the MXU,
  and the three color-plane contractions only run for blocks with at
  least one voxel in the color shell (|eta| < mu/4).

Two tiers share the kernel: the 128x256 window covers a full 8^3
block's footprint for center depths >= ~4 m (at KITTI focal lengths);
the remaining *near* blocks run a second pallas_call whose window is
the WHOLE padded image, so any footprint is covered exactly — no XLA
element-gather pass anywhere. The kernel is the TPU default
(MapEngine.use_pallas_fusion auto).

Parity with ops/tsdf.py::integrate is tested in interpret mode on CPU
(tests/test_pallas_integrate.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from dynslam_tpu.ops import tsdf as T
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: per-block image window (rows, cols) of the far-tier kernel; a block
#: (0.4 m at voxel 0.05) at depth z spans ~ fx * 0.4 / z px
WIN_H = 128
WIN_W = 256
#: blocks fused per grid step (far tier)
BLOCKS_PER_STEP = 8
#: fixed row capacity of the near tier (full-image window kernel)
NEAR_FULL_CAP = 1024
#: debug knob for cost attribution (profiling only): "copy" forces every
#: block through the copy path, "fast" through the free-space path.
#: Env override for hardware runs: DYNSLAM_INTEGRATE_FORCE=copy
import os as _os  # noqa: E402

_FORCE_MODE = _os.environ.get("DYNSLAM_INTEGRATE_FORCE") or None
#: blocks per grid step in the near tier (bigger per-block temporaries)
NEAR_BLOCKS_PER_STEP = 4


#: depth-stat tile size (rows, cols): per-tile min/max of the depth hi
#: byte let the kernel bound every block's SAMPLED pixels (footprint),
#: not its whole window — a window that grazes sky/invalid pixels no
#: longer forces the full sampling path
TILE_H = 16
TILE_W = 128

#: small fast-path window (rows, cols): blocks whose in-image bbox
#: provably fits take a 64x128 window — the per-block cost (column
#: one-hot build + the two depth dots + the row sample) scales with the
#: window, so this is ~2.5x cheaper than the 128x256 full path. The
#: 128-lane alignment that forced the 256-wide window is sidestepped by
#: a second, column-shifted-by-64 copy of every image plane (stacked on
#: the row axis): one of the two copies always has a 128-aligned window
#: with >= 32 px of column margin around any <= 64 px-wide footprint.
#: Eligibility is an EXACT bbox-containment test against the chosen
#: window, so no voxel is ever silently excluded.
SMALL_H = 64
SMALL_W = 128
#: mid fast-path rows: vertical footprints bind before horizontal ones
#: (fy * 0.4 m / z plus perspective slack), so a 128-row variant of the
#: same 128-wide shifted-copy window catches the z ~ 7-10 m band the
#: 64-row window misses — still half the full path's one-hot build and
#: depth dots
MID_H = 128


def _kernel_factory(cfg: T.TsdfConfig, win_h: int, win_w: int, B: int,
                    img_h: int, img_w: int, r_tiles: int, c_tiles: int):
    mu = cfg.mu
    voxel = cfg.voxel_size
    # the empty-window skip (no nonzero depth byte above the low 8 bits)
    # is only provable when no valid measurement can hide in the low
    # byte: d < 0.256 m must already fail the d >= min_depth test
    can_skip_empty = cfg.min_depth >= 0.256
    # analytic free-space fast path: when every pixel in the window is a
    # valid in-range measurement strictly beyond the block (min depth
    # > max voxel z + mu), every in-window voxel provably gets the same
    # observation (sdf_obs = 1, w_obs = 1, no color change) — apply it
    # without any MXU sampling. Only exact when w_obs doesn't depend on
    # the sampled depth, i.e. depth weighting is off. This is the common
    # case: most visible blocks sit in carved free space between the
    # camera and the surface.
    use_fast_free = not cfg.use_depth_weighting

    def kernel(
        cx_ref,  # scalar prefetch: (V,) int32 block coord x
        cy_ref,  # scalar prefetch: (V,) int32
        cz_ref,  # scalar prefetch: (V,) int32
        valid_ref,  # scalar prefetch: (V,) int32
        count_ref,  # scalar prefetch: (1,) int32 — number of live rows
        pose_ref,  # (3, 4) f32, SMEM
        intr_ref,  # (1, 4) f32, SMEM
        tmin_ref,  # (nty, ntx) f32, SMEM: per-tile min of the depth hi byte
        tmax_ref,  # (nty, ntx) f32, SMEM: per-tile max
        vox_ref,  # (3, 4, 128) f32 planar in-block voxel offsets, VMEM
        hi_ref,  # (2*Hp, Wp) bf16: depth mm >> 8; rows [Hp:) hold the
        # column-shifted-by-64 copy for the small fast path (VMEM)
        lo_ref,  # (2*Hp, Wp) bf16: depth mm & 0xFF (same stacking)
        r_ref,  # (2*Hp, Wp) bf16: red
        g_ref,  # (2*Hp, Wp) bf16: green
        b_ref,  # (2*Hp, Wp) bf16: blue
        tsdfw_ref,  # (B, 4, 128) int32 — this step's compacted rows
        color_ref,  # (B, 4, 128) int32
        out_tsdfw_ref,  # (B, 4, 128) int32
        out_color_ref,  # (B, 4, 128) int32
    ):
        i = pl.program_id(0)
        h = hi_ref.shape[0] // 2  # per-copy padded rows (planes stacked)
        w = hi_ref.shape[1]
        fx = intr_ref[0, 0]
        fy = intr_ref[0, 1]
        cx = intr_ref[0, 2]
        cy = intr_ref[0, 3]

        def _window_at(su, sv, nb):
            """Aligned window anchor from summed projected coords of nb
            blocks. Mosaic needs statically-aligned dynamic-slice starts
            (8 sublane / 128 lane); bias by half the alignment granule
            BEFORE flooring so the slack splits evenly — guaranteed
            margins are win_h/2 - 4 rows and win_w/2 - 64 cols on BOTH
            sides (an unbiased floor skews the window left/up, silently
            dropping right-edge voxels near the tier's reach)."""
            uc = su * (1.0 / (512.0 * nb))
            vc = sv * (1.0 / (512.0 * nb))
            v0 = jnp.clip(vc.astype(jnp.int32) - win_h // 2 + 4, 0,
                          h - win_h)
            v0 = pl.multiple_of((v0 // 8) * 8, 8)
            u0 = jnp.clip(uc.astype(jnp.int32) - win_w // 2 + 64, 0,
                          w - win_w)
            u0 = pl.multiple_of((u0 // 128) * 128, 128)
            return v0, u0

        def _apply_update(bi, d, d_mm, upd):
            """TSDF blend for one block given sampled depth (mm); writes
            the packed voxel row and returns the color-blend context."""
            dd = d_mm / 1000.0
            d_ok = (dd >= cfg.min_depth) & (dd <= cfg.max_depth)
            eta = dd - d["z"]
            update = upd & d_ok & (eta > -mu)
            sdf_obs = jnp.clip(eta / mu, -1.0, 1.0)
            if cfg.use_depth_weighting:
                w_obs = jnp.clip(
                    (cfg.max_depth / jnp.maximum(dd, 0.5)) ** 2, 0.25, 5.0
                )
            else:
                w_obs = jnp.ones_like(dd)
            w_obs = jnp.where(update, w_obs, 0.0)
            packed_old = tsdfw_ref[bi]  # (4, 128)
            w_old = T.unpack_weight(packed_old)
            t_old = T.unpack_sdf(packed_old)
            denom = jnp.maximum(w_old + w_obs, 1e-6)
            w_new = jnp.minimum(w_old + w_obs, cfg.max_weight)
            t_new = jnp.where(
                w_obs > 0, (t_old * w_old + sdf_obs * w_obs) / denom, t_old
            )
            out_tsdfw_ref[bi] = T.pack_voxel(t_new, w_new)
            c_upd = update & (jnp.abs(eta) < mu * 0.25)
            return c_upd, w_old, w_obs, denom

        def _blend_channel(bi, ctx, px_ch, shift, c_acc):
            c_upd, w_old, w_obs, denom = ctx
            old_ch = ((color_ref[bi] >> shift) & 0xFF).astype(jnp.float32)
            new_ch = jnp.where(
                c_upd, (old_ch * w_old + px_ch * w_obs) / denom, old_ch
            )
            return c_acc | (
                jnp.clip(new_ch + 0.5, 0, 255).astype(jnp.int32) << shift
            )

        def _windowed(bi, d, rs, v0, u0r, u_left, wh, ww):
            """One-hot sampling + blend of a (wh, ww) window read at ref
            rows [rs, rs+wh) x cols [u0r, u0r+ww) — rs selects the
            original (rs = v0) or the column-shifted copy (rs = h + v0),
            u_left is the window's left edge in ORIGINAL image columns.

            One-hot sampling runs in the outer-dim layout: both one-hots
            keep the voxel planes in their native (4, 128) minor dims
            and broadcast along the cheap OUTER dim, so no relayout
            ever touches a per-voxel plane."""
            lu = d["ui"] - u_left
            lv = d["vi"] - v0
            in_win = d["in_img"] & (lu >= 0) & (lu < ww) & (lv >= 0) \
                & (lv < wh)
            lu = jnp.clip(lu, 0, ww - 1)
            lv = jnp.clip(lv, 0, wh - 1)
            cid = jax.lax.broadcasted_iota(jnp.int32, (ww, 4, 128), 0)
            onehot_u = (cid == lu[None]).astype(jnp.bfloat16)

            def colsel(win):
                # (wh, ww) x (ww, 4, 128) -> (wh, 4, 128)
                return jax.lax.dot_general(
                    win, onehot_u,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

            rid = jax.lax.broadcasted_iota(jnp.int32, (wh, 4, 128), 0)
            onehot_v = (rid == lv[None]).astype(jnp.float32)

            def sample(cols):
                return jnp.sum(cols * onehot_v, axis=0)  # (4, 128)

            if _FORCE_MODE == "fixedwin":  # profiling: hoistable slices
                rs = pl.multiple_of(rs * 0, 8)
                u0r = pl.multiple_of(u0r * 0, 128)
            win_hi = hi_ref[pl.ds(rs, wh), pl.ds(u0r, ww)]
            if _FORCE_MODE == "onedepth":  # profiling: 1 slice + 1 dot
                d_mm = sample(colsel(win_hi) * 257.0)
            else:
                win_lo = lo_ref[pl.ds(rs, wh), pl.ds(u0r, ww)]
                d_mm = sample(colsel(win_hi) * 256.0 + colsel(win_lo))
            ctx = _apply_update(bi, d, d_mm, in_win)

            # color changes only in a thin shell (|eta| < mu/4): most
            # blocks skip the three color-plane contractions entirely
            @pl.when(jnp.logical_not(jnp.any(ctx[0])))
            def _keep_color():
                out_color_ref[bi] = color_ref[bi]

            @pl.when(jnp.any(ctx[0]))
            def _blend_color():
                c_acc = jnp.int32(0)
                for shift, ch_ref in ((16, r_ref), (8, g_ref), (0, b_ref)):
                    win_ch = ch_ref[pl.ds(rs, wh), pl.ds(u0r, ww)]
                    c_acc = _blend_channel(
                        bi, ctx, sample(colsel(win_ch)), shift, c_acc
                    )
                out_color_ref[bi] = c_acc

        def _single_full(bi, d):
            """Full-window path: any footprint the tier admits."""
            v0, u0 = _window_at(d["su"], d["sv"], 1)
            _windowed(bi, d, v0, v0, u0, u0, win_h, win_w)

        def _small_params(d, wh):
            """(fits, rs, v0, u0r, u_left) for the (wh, SMALL_W) fast
            path. `fits` is an EXACT containment test of the block's
            in-image bbox against the window actually chosen (after
            clipping), so eligibility can never drop a voxel the full
            path would have updated."""
            vcen = (d["vmin"] + d["vmax"]) // 2
            ucen = (d["umin"] + d["umax"]) // 2
            v0 = jnp.clip(((vcen - wh // 2 + 4) // 8) * 8,
                          0, h - wh)
            v0 = pl.multiple_of(v0, 8)
            # two 128-aligned column candidates: copy A (original) and
            # copy B (shifted left by 64) — one of them always centres
            # a <= 64 px footprint with >= 32 px margin
            u0a = jnp.clip((ucen // 128) * 128, 0, w - SMALL_W)
            u0a = pl.multiple_of(u0a, 128)
            u0b = jnp.clip(((ucen - 64) // 128) * 128, 0, w - SMALL_W)
            u0b = pl.multiple_of(u0b, 128)
            rows_ok = (d["vmin"] >= v0) & (d["vmax"] < v0 + wh)
            in_a = (d["umin"] >= u0a) & (d["umax"] < u0a + SMALL_W)
            in_b = (d["umin"] >= u0b + 64) \
                & (d["umax"] < u0b + 64 + SMALL_W)
            sel = in_b & jnp.logical_not(in_a)
            fits = rows_ok & (in_a | in_b) & (d["vmax"] >= d["vmin"])
            if _FORCE_MODE == "nosmall":  # profiling: A/B the fast path
                fits &= jnp.bool_(False)
            u0r = jnp.where(sel, u0b, u0a)
            u0r = pl.multiple_of(u0r, 128)
            u_left = jnp.where(sel, u0b + 64, u0a)
            rs = jnp.where(sel, h + v0, v0)
            rs = pl.multiple_of(rs, 8)
            return fits, rs, v0, u0r, u_left

        # NOTE: a paired-block variant (two depth-neighbor blocks sharing
        # one window, one (win_w, 8, 128) one-hot + one dot serving both)
        # was tried and measured SLOWER than two singles even when forced
        # on every pair: Mosaic pads (4, 128) planes to full (8, 128)
        # tiles, so the "joint" ops cost the same as the single-block
        # ones while the pair bookkeeping adds work.
        def _fuse_blocks():
          nty = tmin_ref.shape[0]
          ntx = tmin_ref.shape[1]
          big = jnp.int32(1 << 30)
          infos = []

          # ---- phase 1: projection + footprint-tile gates per block ----
          for bi in range(B):
            gi = i * B + bi
            bx = cx_ref[gi].astype(jnp.float32)
            by = cy_ref[gi].astype(jnp.float32)
            bz = cz_ref[gi].astype(jnp.float32)
            # planar layout: per-voxel quantities as clean (4, 128) planes
            pwx = (bx * float(T.BLOCK) + vox_ref[0] + 0.5) * voxel
            pwy = (by * float(T.BLOCK) + vox_ref[1] + 0.5) * voxel
            pwz = (bz * float(T.BLOCK) + vox_ref[2] + 0.5) * voxel
            x = (pose_ref[0, 0] * pwx + pose_ref[0, 1] * pwy
                 + pose_ref[0, 2] * pwz + pose_ref[0, 3])
            y = (pose_ref[1, 0] * pwx + pose_ref[1, 1] * pwy
                 + pose_ref[1, 2] * pwz + pose_ref[1, 3])
            z = (pose_ref[2, 0] * pwx + pose_ref[2, 1] * pwy
                 + pose_ref[2, 2] * pwz + pose_ref[2, 3])
            safe_z = jnp.maximum(z, 1e-3)
            u = x / safe_z * fx + cx
            v = y / safe_z * fy + cy
            ui = jnp.round(u).astype(jnp.int32)
            vi = jnp.round(v).astype(jnp.int32)
            # float-coordinate bounds against the TRUE image dims — the
            # exact rule of ops/tsdf.py::integrate (the window dims h/w
            # include lane/sublane padding, which must stay excluded)
            in_img = (u >= 0) & (u <= img_w - 1) & (v >= 0) \
                & (v <= img_h - 1) & (z > 1e-3)

            # footprint depth bounds from the precomputed tile stats:
            # the SAMPLED pixels of this block lie in the bbox of its
            # in-IMAGE voxels' (vi, ui) — a superset of any window's
            # sampled set, so the gates stay conservative no matter
            # which window the sampling phase picks. Scalar SMEM reads,
            # unrolled; bboxes wider than the unrolled sweep (shouldn't
            # happen inside a tier, but never trust geometry) fall
            # through to the full path.
            vmin_i = jnp.min(jnp.where(in_img, vi, big))
            vmax_i = jnp.max(jnp.where(in_img, vi, -1))
            umin_i = jnp.min(jnp.where(in_img, ui, big))
            umax_i = jnp.max(jnp.where(in_img, ui, -1))
            ty0 = jnp.clip(vmin_i // TILE_H, 0, nty - 1)
            ty1 = jnp.clip(vmax_i // TILE_H, 0, nty - 1)
            tx0 = jnp.clip(umin_i // TILE_W, 0, ntx - 1)
            tx1 = jnp.clip(umax_i // TILE_W, 0, ntx - 1)
            spans_ok = ((ty1 - ty0) < r_tiles) & ((tx1 - tx0) < c_tiles)
            fmin = jnp.float32(1e9)
            fmax = jnp.float32(-1.0)
            for ti in range(r_tiles):
                ty = jnp.minimum(ty0 + ti, nty - 1)
                row_ok = (ty0 + ti) <= ty1
                for tj in range(c_tiles):
                    tx = jnp.minimum(tx0 + tj, ntx - 1)
                    ok = row_ok & ((tx0 + tj) <= tx1)
                    fmin = jnp.where(
                        ok, jnp.minimum(fmin, tmin_ref[ty, tx]), fmin
                    )
                    fmax = jnp.where(
                        ok, jnp.maximum(fmax, tmax_ref[ty, tx]), fmax
                    )

            # occlusion / empty-footprint gate: a voxel can only update
            # when its eta = d - z > -mu. fmax * 256 + 255 bounds every
            # sampled depth from above, so if that bound is still below
            # the block's min z - mu (block fully behind the current
            # surface) the update is a provable no-op: copy rows through
            # and skip every MXU contraction
            ub_mm = fmax * 256.0 + 255.0
            zmin = jnp.min(jnp.where(in_img, z, jnp.inf))
            could_update = (
                (ub_mm * 1e-3 > zmin - mu) | jnp.logical_not(spans_ok)
            ) & (valid_ref[gi] > 0)
            if can_skip_empty:
                could_update &= (fmax > 0) | jnp.logical_not(spans_ok)
            if _FORCE_MODE == "copy":
                could_update &= jnp.bool_(False)

            @pl.when(jnp.logical_not(could_update))
            def _copy_through():
                out_tsdfw_ref[bi] = tsdfw_ref[bi]
                out_color_ref[bi] = color_ref[bi]

            if use_fast_free:
                # lower bound on any sampled depth: every pixel in the
                # footprint tiles has d >= fmin * 256 mm (fmin > 0 also
                # proves there is no invalid/zero pixel among them)
                lb_m = fmin * 0.256
                zmax = jnp.max(jnp.where(in_img, z, -jnp.inf))
                fast_free = (
                    spans_ok
                    & (fmin > 0)
                    & (lb_m > zmax + mu)
                    & (lb_m >= cfg.min_depth)
                    & (ub_mm * 1e-3 <= cfg.max_depth)
                )
                if _FORCE_MODE == "fast":
                    fast_free = fast_free | jnp.bool_(True)

                @pl.when(could_update & fast_free)
                def _fuse_free():
                    # under the fast conditions the update set is exactly
                    # the in-image voxels (every sampled pixel is valid,
                    # in range, and beyond the block: eta > mu)
                    w_obs = jnp.where(in_img, 1.0, 0.0)
                    packed_old = tsdfw_ref[bi]
                    w_old = T.unpack_weight(packed_old)
                    t_old = T.unpack_sdf(packed_old)
                    denom = jnp.maximum(w_old + w_obs, 1e-6)
                    w_new = jnp.minimum(w_old + w_obs, cfg.max_weight)
                    # sdf_obs == 1 for every updated voxel (eta > mu)
                    t_new = jnp.where(
                        w_obs > 0, (t_old * w_old + w_obs) / denom, t_old
                    )
                    out_tsdfw_ref[bi] = T.pack_voxel(t_new, w_new)
                    out_color_ref[bi] = color_ref[bi]

                full = could_update & jnp.logical_not(fast_free)
            else:
                full = could_update

            infos.append(dict(
                z=z, in_img=in_img, ui=ui, vi=vi,
                su=jnp.sum(u), sv=jnp.sum(v), full=full,
                vmin=vmin_i, vmax=vmax_i, umin=umin_i, umax=umax_i,
            ))

          # ---- phase 2: windowed sampling for the surviving blocks —
          # smallest window whose in-image bbox containment provably
          # holds (64x128, then 128x128, then the full window)
          for bi in range(B):
            fits_s, rs_s, v0_s, u0r_s, ul_s = _small_params(
                infos[bi], SMALL_H
            )
            fits_m, rs_m, v0_m, u0r_m, ul_m = _small_params(
                infos[bi], MID_H
            )
            pl.when(infos[bi]["full"] & fits_s)(
                lambda bi_=bi, d=infos[bi], rs_=rs_s, v0_=v0_s, u0r_=u0r_s,
                ul_=ul_s: _windowed(
                    bi_, d, rs_, v0_, u0r_, ul_, SMALL_H, SMALL_W
                )
            )
            pl.when(infos[bi]["full"] & jnp.logical_not(fits_s) & fits_m)(
                lambda bi_=bi, d=infos[bi], rs_=rs_m, v0_=v0_m, u0r_=u0r_m,
                ul_=ul_m: _windowed(
                    bi_, d, rs_, v0_, u0r_, ul_, MID_H, SMALL_W
                )
            )
            pl.when(
                infos[bi]["full"] & jnp.logical_not(fits_s)
                & jnp.logical_not(fits_m)
            )(
                lambda bi_=bi, d=infos[bi]: _single_full(bi_, d)
            )

        # the visible list is compacted (fixed-size nonzero), so steps past
        # ceil(count/B) hold only padding: skip their compute entirely
        # (their outputs scatter with mode=drop in XLA regardless)
        pl.when(i * B < count_ref[0])(_fuse_blocks)

    return kernel


def _reach_m(cfg: T.TsdfConfig, win_h: int) -> float:
    """Nearest block-center depth whose full 8^3 footprint fits a
    win_h-row window (footprint ~ fx * block_diag / z; usable extent is
    win_h - 8 after sublane-alignment slack)."""
    reach = cfg.fx * cfg.block_size * 1.75 / max(win_h - 8, 1)
    return max(reach, cfg.min_depth + cfg.block_size)


def _run_tier(cfg, win_h, win_w, B, interpret, img_hw, tile_unroll, planes,
              stats, pose34, intr, vox, coords, valids, count, tsdfw_rows,
              color_rows):
    """One pallas_call over compacted rows with a (win_h, win_w) window."""
    Vt = tsdfw_rows.shape[0]
    nty, ntx = stats[0].shape
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,  # coord x/y/z, valid, count
        grid=(Vt // B,),
        in_specs=[
            pl.BlockSpec((3, 4), lambda i, *_: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 4), lambda i, *_: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((nty, ntx), lambda i, *_: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((nty, ntx), lambda i, *_: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((3, 4, 128), lambda i, *_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + [
            # five bf16 image planes, whole-array resident in VMEM
            pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(5)
        ] + [
            pl.BlockSpec((B, 4, 128), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 4, 128), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((B, 4, 128), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 4, 128), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    return pl.pallas_call(
        _kernel_factory(cfg, win_h, win_w, B, img_hw[0], img_hw[1],
                        tile_unroll[0], tile_unroll[1]),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((Vt, 4, 128), jnp.int32),
            jax.ShapeDtypeStruct((Vt, 4, 128), jnp.int32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(
        coords[:, 0], coords[:, 1], coords[:, 2], valids, count, pose34,
        intr, stats[0], stats[1], vox, *planes, tsdfw_rows, color_rows,
    )


@partial(jax.jit, static_argnames=("cfg", "interpret"))
def integrate_pallas(
    cfg: T.TsdfConfig,
    state: T.TsdfState,
    slots: jnp.ndarray,  # (V,) int32, padded with pool_capacity
    slots_mask: jnp.ndarray,  # (V,) bool
    rgb: jnp.ndarray,  # (H, W, 3) uint8
    depth_m: jnp.ndarray,  # (H, W) f32
    world_to_cam: jnp.ndarray,  # (4, 4)
    frame_idx: jnp.ndarray,
    interpret: bool = False,
    intr4: jnp.ndarray = None,  # (4,) fx fy cx cy override (crop fusion)
) -> T.TsdfState:
    """Drop-in replacement for ops.tsdf.integrate (same update rule).
    Two kernel tiers, zero per-element gathers: far blocks (footprint
    fits a 128x256 window) stream 8/step; the remaining near blocks
    (cap NEAR_FULL_CAP, compacted) use the WHOLE padded image as their
    window, so any projected footprint is covered exactly. (A half-
    height mid tier for distant blocks was tried and NET-NEGATIVE: the
    per-block cost is dominated by the window-size-independent column
    one-hot build, so the extra pass's fixed cost outweighed it.)"""
    P = cfg.pool_capacity
    V = slots.shape[0]
    B = BLOCKS_PER_STEP
    assert V % B == 0, "max_visible_blocks must be a multiple of BLOCKS_PER_STEP"

    slots_c = jnp.where(
        slots_mask, jnp.clip(slots, 0, P - 1), P - 1
    ).astype(jnp.int32)
    coords = state.block_coords[slots_c]  # (V, 3)
    centers = (coords.astype(jnp.float32) + 0.5) * cfg.block_size
    z_center = centers @ world_to_cam[2, :3] + world_to_cam[2, 3]
    near = (z_center < _reach_m(cfg, WIN_H)) & slots_mask
    # near-tier capacity is NEAR_FULL_CAP rows; overflow blocks (a frame
    # with a huge close-range surface) fall back to the FAR tier instead
    # of silently receiving no update — the 128x256 window still covers
    # part of their footprint (in_win clamps), a strictly better
    # degradation than exclusion (ADVICE r2)
    near = near & (jnp.cumsum(near.astype(jnp.int32)) <= NEAR_FULL_CAP)
    far_mask = slots_mask & ~near

    # pre-split bf16 image planes, padded to sublane/lane-aligned dims
    # >= the far window. 8-bit integer planes are exact in bf16; padded
    # pixels hold depth 0 (invalid -> provably no update, matching the
    # XLA rule's in-image check)
    h, w = depth_m.shape
    hp = max(-(-h // TILE_H) * TILE_H, WIN_H)
    wp = max(-(-w // TILE_W) * TILE_W, WIN_W)
    depth_mm_i = jnp.clip(depth_m * 1000.0, 0, 65535).astype(jnp.int32)
    pad = lambda a: jnp.pad(a, ((0, hp - h), (0, wp - w)))
    base_planes = (
        pad((depth_mm_i >> 8).astype(jnp.bfloat16)),
        pad((depth_mm_i & 0xFF).astype(jnp.bfloat16)),
        pad(rgb[..., 0].astype(jnp.bfloat16)),
        pad(rgb[..., 1].astype(jnp.bfloat16)),
        pad(rgb[..., 2].astype(jnp.bfloat16)),
    )
    # stack a column-shifted-by-64 copy under each plane (rows [hp:)):
    # the kernel's SMALL fast path picks whichever copy 128-aligns its
    # 64x128 window around the block's footprint. Shifted-in columns
    # are zero (depth 0 = invalid), and they only ever enter a window
    # for columns >= wp, which the in-image test already excludes.
    planes = tuple(
        jnp.concatenate(
            [p, jnp.pad(p[:, 64:], ((0, 0), (0, 64)))], axis=0
        )
        for p in base_planes
    )

    # per-tile min/max of the depth hi byte (SMEM in the kernel): bound
    # any block's sampled pixels by the tiles covering its footprint
    nty, ntx = hp // TILE_H, wp // TILE_W
    hi_t = base_planes[0].astype(jnp.float32).reshape(
        nty, TILE_H, ntx, TILE_W
    )
    stats = (hi_t.min(axis=(1, 3)), hi_t.max(axis=(1, 3)))
    # max tiles a block's sampled bbox can span: in_win clamps sampled
    # voxels to the window, so the window extent is a strict bound
    # (+1 tile for arbitrary alignment against the tile grid)
    far_unroll = (
        min(WIN_H // TILE_H + 1, nty),
        min(WIN_W // TILE_W + 1, ntx),
    )

    pose34 = world_to_cam[:3, :].astype(jnp.float32)
    if intr4 is None:
        intr = jnp.asarray([[cfg.fx, cfg.fy, cfg.cx, cfg.cy]], jnp.float32)
    else:
        intr = intr4.astype(jnp.float32).reshape(1, 4)
    vox = jnp.asarray(
        T._VOX_OFFSETS_NP.T.reshape(3, 4, 128), jnp.float32
    )

    # ---- far tier: windowed kernel over the compacted visible prefix ---
    far_slots = jnp.where(far_mask, slots_c, P - 1)
    tsdfw_far = state.tsdf_w[far_slots].reshape(V, 4, 128)
    color_far = state.color[far_slots].reshape(V, 4, 128)
    count = jnp.sum(slots_mask).astype(jnp.int32).reshape(1)
    far_tsdfw, far_color = _run_tier(
        cfg, WIN_H, WIN_W, B, interpret, (h, w), far_unroll, planes, stats,
        pose34, intr, vox, coords, far_mask.astype(jnp.int32), count,
        tsdfw_far, color_far,
    )

    # ---- near tier: full-image window over compacted near rows ---------
    n_idx = T.compact_mask(near, NEAR_FULL_CAP, V)
    n_ok = n_idx < V
    n_idx_c = jnp.clip(n_idx, 0, V - 1)
    n_slots = jnp.where(n_ok, slots_c[n_idx_c], P - 1)
    tsdfw_near = state.tsdf_w[n_slots].reshape(NEAR_FULL_CAP, 4, 128)
    color_near = state.color[n_slots].reshape(NEAR_FULL_CAP, 4, 128)
    count_n = jnp.sum(near).astype(jnp.int32).reshape(1)
    near_tsdfw, near_color = _run_tier(
        cfg, hp, wp, NEAR_BLOCKS_PER_STEP, interpret, (h, w), (nty, ntx),
        planes, stats, pose34, intr, vox, coords[n_idx_c],
        n_ok.astype(jnp.int32), count_n, tsdfw_near, color_near,
    )

    # scatter both tiers back (disjoint row sets; invalid rows dropped)
    far_safe = jnp.where(far_mask, slots_c, P)
    near_safe = jnp.where(n_ok, n_slots, P)
    slot_safe = jnp.where(slots_mask, slots, P)
    return state._replace(
        tsdf_w=state.tsdf_w.at[far_safe].set(
            far_tsdfw.reshape(V, T.BLOCK3), mode="drop"
        ).at[near_safe].set(
            near_tsdfw.reshape(NEAR_FULL_CAP, T.BLOCK3), mode="drop"
        ),
        color=state.color.at[far_safe].set(
            far_color.reshape(V, T.BLOCK3), mode="drop"
        ).at[near_safe].set(
            near_color.reshape(NEAR_FULL_CAP, T.BLOCK3), mode="drop"
        ),
        last_seen=state.last_seen.at[slot_safe].set(frame_idx, mode="drop"),
    )
