"""Pallas TSDF fusion kernel — the hot `IntegrateIntoScene` path
(/root/reference/src/DynSLAM/InfiniTamDriver.h:137-146) as a hand-written
TPU kernel.

Why: the XLA version is bound by per-voxel random-access image gathers
(~8.4M per frame at ~11-20 ns each => ~90 ms, PERFORMANCE.md). This
kernel removes every per-element gather:

- **Compact-then-kernel**: visible voxel rows are gathered into a dense
  (V, 4, 128) array by XLA *row* gathers (contiguous rows stream at
  HBM speed, ~2 ms — unlike element gathers), processed by the kernel
  8 blocks per grid step through auto-pipelined BlockSpecs, and row-
  scattered back. No in-kernel DMA choreography needed.
- the packed depth|rgb image stays **resident in VMEM** (two int32
  planes, ~3.7 MB at KITTI size); each block dynamic-slices a 128x256
  window around its projected footprint (`pl.ds`, 8/128-aligned);
- per-voxel pixel sampling inside the window is a **one-hot MXU
  contraction**: a (4,128,WIN_H)x(WIN_H,WIN_W) row-selector matmul
  followed by a column-selector masked reduction on the VPU — no
  per-lane dynamic indexing (which Mosaic forbids on TPU).

The 128x256 window covers a full 8^3 block's footprint for depths
>= ~2.2 m; *nearer* blocks are excluded from the kernel and fused by a
fixed-size XLA pass (512-block cap), so close-range coverage is exact —
v1's near-block skip is gone and the kernel is now the TPU default
(MapEngine.use_pallas_fusion auto).

Parity with ops/tsdf.py::integrate is tested in interpret mode on CPU
(tests/test_pallas_integrate.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from dynslam_tpu.ops import tsdf as T
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: per-block image window (rows, cols); a block (0.4 m at voxel 0.05)
#: at depth z spans ~ fx * 0.4 / z px
WIN_H = 128
WIN_W = 256
#: blocks fused per grid step
BLOCKS_PER_STEP = 8
#: fixed capacity of the XLA near-block pass
NEAR_CAP = 512


def _kernel_factory(cfg: T.TsdfConfig):
    mu = cfg.mu
    voxel = cfg.voxel_size
    B = BLOCKS_PER_STEP

    def kernel(
        cx_ref,  # scalar prefetch: (V,) int32 block coord x
        cy_ref,  # scalar prefetch: (V,) int32
        cz_ref,  # scalar prefetch: (V,) int32
        valid_ref,  # scalar prefetch: (V,) int32
        count_ref,  # scalar prefetch: (1,) int32 — number of live rows
        pose_ref,  # (3, 4) f32, SMEM
        intr_ref,  # (1, 4) f32, SMEM
        vox_ref,  # (3, 4, 128) f32 planar in-block voxel offsets, VMEM
        img_ref,  # (2, H, W) int32: [0]=depth mm, [1]=rgb888 (VMEM)
        tsdfw_ref,  # (B, 4, 128) int32 — this step's compacted rows
        color_ref,  # (B, 4, 128) int32
        out_tsdfw_ref,  # (B, 4, 128) int32
        out_color_ref,  # (B, 4, 128) int32
    ):
        i = pl.program_id(0)
        h = img_ref.shape[1]
        w = img_ref.shape[2]
        fx = intr_ref[0, 0]
        fy = intr_ref[0, 1]
        cx = intr_ref[0, 2]
        cy = intr_ref[0, 3]

        def _fuse_blocks():
          for b in range(B):
            gi = i * B + b
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

            # window anchored at the projected block center; Mosaic needs
            # statically-aligned dynamic-slice starts (8 sublane/128 lane)
            uc = jnp.sum(u) * (1.0 / 512.0)
            vc = jnp.sum(v) * (1.0 / 512.0)
            v0 = jnp.clip(vc.astype(jnp.int32) - WIN_H // 2, 0, h - WIN_H)
            v0 = pl.multiple_of((v0 // 8) * 8, 8)
            u0 = jnp.clip(uc.astype(jnp.int32) - WIN_W // 2, 0, w - WIN_W)
            u0 = pl.multiple_of((u0 // 128) * 128, 128)
            win_d = img_ref[0, pl.ds(v0, WIN_H), pl.ds(u0, WIN_W)]
            win_c = img_ref[1, pl.ds(v0, WIN_H), pl.ds(u0, WIN_W)]

            ui = jnp.floor(u + 0.5).astype(jnp.int32)
            vi = jnp.floor(v + 0.5).astype(jnp.int32)
            in_img = (ui >= 0) & (ui <= w - 1) & (vi >= 0) & (vi <= h - 1) \
                & (z > 1e-3)
            lu = ui - u0
            lv = vi - v0
            in_win = in_img & (lu >= 0) & (lu < WIN_W) & (lv >= 0) \
                & (lv < WIN_H)
            lu = jnp.clip(lu, 0, WIN_W - 1)
            lv = jnp.clip(lv, 0, WIN_H - 1)

            # one-hot sampling: rows via an MXU contraction, columns via a
            # VPU masked reduce (the raycast kernel's proven pattern)
            row_ids = jax.lax.broadcasted_iota(
                jnp.int32, (4, 128, WIN_H), 2
            )
            onehot_v = (row_ids == lv[..., None]).astype(jnp.float32)

            def row_select(win):
                return jax.lax.dot_general(
                    onehot_v, win.astype(jnp.float32),
                    dimension_numbers=(((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (4, 128, WIN_W)

            rows_d = row_select(win_d)
            rows_c = row_select(win_c)
            col_ids = jax.lax.broadcasted_iota(
                jnp.int32, (4, 128, WIN_W), 2
            )
            onehot_u = (col_ids == lu[..., None]).astype(jnp.float32)
            d_mm = jnp.sum(rows_d * onehot_u, axis=-1)
            rgb_bits = jnp.sum(rows_c * onehot_u, axis=-1).astype(jnp.int32)

            d = d_mm / 1000.0
            d_ok = (d >= cfg.min_depth) & (d <= cfg.max_depth)
            eta = d - z
            update = in_win & d_ok & (eta > -mu) & (valid_ref[gi] > 0)
            sdf_obs = jnp.clip(eta / mu, -1.0, 1.0)
            if cfg.use_depth_weighting:
                w_obs = jnp.clip(
                    (cfg.max_depth / jnp.maximum(d, 0.5)) ** 2, 0.25, 5.0
                )
            else:
                w_obs = jnp.ones_like(d)
            w_obs = jnp.where(update, w_obs, 0.0)

            packed_old = tsdfw_ref[b]  # (4, 128)
            w_old = T.unpack_weight(packed_old)
            t_old = T.unpack_sdf(packed_old)
            denom = jnp.maximum(w_old + w_obs, 1e-6)
            w_new = jnp.minimum(w_old + w_obs, cfg.max_weight)
            t_new = jnp.where(
                w_obs > 0, (t_old * w_old + sdf_obs * w_obs) / denom, t_old
            )
            out_tsdfw_ref[b] = T.pack_voxel(t_new, w_new)

            c_old_bits = color_ref[b]  # (4, 128)
            c_upd = update & (jnp.abs(eta) < mu * 0.25)
            c_acc = jnp.int32(0)
            for shift in (16, 8, 0):
                old_ch = ((c_old_bits >> shift) & 0xFF).astype(jnp.float32)
                px_ch = ((rgb_bits >> shift) & 0xFF).astype(jnp.float32)
                new_ch = jnp.where(
                    c_upd, (old_ch * w_old + px_ch * w_obs) / denom, old_ch
                )
                c_acc = c_acc | (
                    jnp.clip(new_ch + 0.5, 0, 255).astype(jnp.int32) << shift
                )
            out_color_ref[b] = c_acc

        # the visible list is compacted (fixed-size nonzero), so steps past
        # ceil(count/B) hold only padding: skip their compute entirely
        # (their outputs scatter with mode=drop in XLA regardless)
        pl.when(i * B < count_ref[0])(_fuse_blocks)

    return kernel


def _near_mask(cfg: T.TsdfConfig, coords: jnp.ndarray,
               world_to_cam: jnp.ndarray) -> jnp.ndarray:
    """Blocks whose projected footprint can exceed the kernel window
    (center depth below the window's reach)."""
    centers = (coords.astype(jnp.float32) + 0.5) * cfg.block_size
    z = centers @ world_to_cam[2, :3] + world_to_cam[2, 3]
    # footprint ~ fx * block_diag / z; window usable extent is
    # (WIN_H - 8, WIN_W - 128) after alignment slack
    reach = cfg.fx * cfg.block_size * 1.75 / max(WIN_H - 8, 1)
    return z < max(reach, cfg.min_depth + cfg.block_size)


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
) -> T.TsdfState:
    """Drop-in replacement for ops.tsdf.integrate (same update rule).
    Far blocks go through the Pallas kernel; blocks nearer than the
    window's reach are fused by a fixed-size XLA pass (cap NEAR_CAP)."""
    P = cfg.pool_capacity
    V = slots.shape[0]
    B = BLOCKS_PER_STEP
    assert V % B == 0, "max_visible_blocks must be a multiple of BLOCKS_PER_STEP"

    slots_c = jnp.where(
        slots_mask, jnp.clip(slots, 0, P - 1), P - 1
    ).astype(jnp.int32)
    coords = state.block_coords[slots_c]  # (V, 3)
    near = _near_mask(cfg, coords, world_to_cam) & slots_mask

    # ---- near pass (XLA, exact, fixed size) ---------------------------
    (near_idx,) = jnp.nonzero(near, size=NEAR_CAP, fill_value=V)
    near_ok = near_idx < V
    near_slots = jnp.where(near_ok, slots_c[jnp.clip(near_idx, 0, V - 1)], P)
    state = T.integrate(
        cfg, state, near_slots, near_ok, rgb, depth_m, world_to_cam,
        frame_idx,
    )

    # ---- far pass (Pallas) --------------------------------------------
    far_mask = slots_mask & ~near
    far_slots = jnp.where(far_mask, slots_c, P - 1)

    depth_mm_i = jnp.clip(depth_m * 1000.0, 0, 65535).astype(jnp.int32)
    rgb_i = rgb.astype(jnp.int32)
    packed_img = jnp.stack(
        [depth_mm_i,
         (rgb_i[..., 0] << 16) | (rgb_i[..., 1] << 8) | rgb_i[..., 2]],
        axis=0,
    )  # (2, H, W)

    # compact row gathers (contiguous rows stream at HBM speed)
    tsdfw_rows = state.tsdf_w[far_slots].reshape(V, 4, 128)
    color_rows = state.color[far_slots].reshape(V, 4, 128)

    pose34 = world_to_cam[:3, :].astype(jnp.float32)
    intr = jnp.asarray([[cfg.fx, cfg.fy, cfg.cx, cfg.cy]], jnp.float32)
    valids = far_mask.astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,  # coord x/y/z, valid, count
        grid=(V // B,),
        in_specs=[
            pl.BlockSpec((3, 4), lambda i, *_: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 4), lambda i, *_: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((3, 4, 128), lambda i, *_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # whole image, resident
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

    vox = jnp.asarray(
        T._VOX_OFFSETS_NP.T.reshape(3, 4, 128), jnp.float32
    )
    coords_x = coords[:, 0]
    coords_y = coords[:, 1]
    coords_z = coords[:, 2]
    count = jnp.sum(slots_mask).astype(jnp.int32).reshape(1)
    new_tsdfw, new_color = pl.pallas_call(
        _kernel_factory(cfg),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((V, 4, 128), jnp.int32),
            jax.ShapeDtypeStruct((V, 4, 128), jnp.int32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(
        coords_x, coords_y, coords_z, valids, count, pose34, intr, vox,
        packed_img, tsdfw_rows, color_rows,
    )

    # scatter the compacted rows back (invalid/near rows dropped)
    far_safe = jnp.where(far_mask, slots_c, P)
    slot_safe = jnp.where(slots_mask, slots, P)
    return state._replace(
        tsdf_w=state.tsdf_w.at[far_safe].set(
            new_tsdfw.reshape(V, T.BLOCK3), mode="drop"
        ),
        color=state.color.at[far_safe].set(
            new_color.reshape(V, T.BLOCK3), mode="drop"
        ),
        last_seen=state.last_seen.at[slot_safe].set(frame_idx, mode="drop"),
    )
