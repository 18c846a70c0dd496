"""Tile-based Pallas raycaster — InfiniTAM's per-pixel TSDF raycast
(`trackingController->Prepare` / ITMVisualisationEngine semantics via
/root/reference/src/DynSLAM/InfiniTamDriver.h:148-158) rebuilt without
per-sample gathers.

The XLA raycaster in ops/tsdf.py is bound by random-access voxel gathers
(~20-25 ns/element, PERFORMANCE.md): ~9M gathers/frame => ~220 ms. This
module replaces gathers with block-granular DMA + MXU one-hot sampling:

1. **Candidate rasterization (XLA, scatter/compare only)**: every visible
   block's AABB is projected to the image; a separable tile-overlap test
   plus a per-tile `top_k` by camera depth yields, for each 8x128 image
   tile, the K nearest candidate blocks (near geometry wins when a tile
   overflows K; SHORT tiles keep a tile's rays at similar depths so
   horizon rows don't lose their far blocks to near-block flooding).
2. **Pallas kernel, grid = image tiles**: each tile DMAs its K candidate
   voxel-block rows (2 KB each) from HBM into VMEM, then runs ONE fused
   march loop with per-tile early termination:
   - *placement*: the next sample position per ray from the candidate
     AABB intervals — fixed dt inside blocks, leaps over uncovered gaps
     (the distance-field skip of the XLA path, done in-register);
   - *sampling*: each step's per-ray nearest-voxel lookups become ONE
     (TILE_H,128,K*4)x(K*4,128) one-hot contraction on the MXU against
     the stacked candidate blocks (row one-hot = linearized local block
     id, lane select on the VPU). Unallocated/zero-weight voxels read
     +1.0;
   - *crossing*: sign-change detection + linear interpolation against
     the previous sample; the first (nearest) crossing wins.
   Once every ray has either crossed or left candidate coverage, the
   remaining steps skip both the interval scans and the MXU sample.
   A post-pass samples color + voxel weight at the interpolated hit
   (fallback: the crossing sample), so no XLA-side hit gathers remain.

Bit layout notes: pool rows are viewed as (P*4, 128) so HBM slices stay
128-lane aligned; voxel v = (x*64 + y*8 + z) lives at row x>>1, lane
(x&1)*64 + y*8 + z.

Parity with ops/tsdf.py::raycast is tested in interpret mode on the CPU
backend (tests/test_pallas_raycast.py); MapEngine dispatches here for
full-frame raycasts on TPU.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from dynslam_tpu.ops import tsdf as T
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_H = 8
TILE_W = 128

#: light-tile candidate width: tiles with <= K_LIGHT candidates run the
#: march on [:K_LIGHT] slices of the candidate arrays (exact — the lists
#: are nearest-first with sentinel padding, so rows past the count
#: contribute nothing), cutting the per-step interval scans and the
#: one-hot MXU contraction 4x for qualifying tiles. NOTE (round-5
#: measurement): at bench-scale maps (>= ~15k blocks) only ~2% of tiles
#: still qualify — the tier pays for itself on small/instance maps and
#: early frames; the heavy tier dominates at scale, and K_MID=32 was
#: re-A/B'd there (still no win, 9.653 vs 9.682 FPS end-to-end).
K_LIGHT = 16

#: optional middle tier: tiles with K_LIGHT < count <= K_MID march on
#: [:K_MID] slices (same sentinel-exactness argument as K_LIGHT). 0
#: disables the tier (default — kept off until TPU A/B shows a win; the
#: third inlined march body grows the kernel ~50%). Env override for
#: hardware A/B runs: DYNSLAM_K_MID=32 python bench.py
import os as _os  # noqa: E402

K_MID = int(_os.environ.get("DYNSLAM_K_MID", "0"))

#: (A paired-sample march — two ray positions per serialized step with
#: the one-hots stacked on the sublane axis — was built and measured on
#: hardware: 6.6 vs 9.9 FPS end-to-end static. The doubled contraction
#: is real MXU work, not amortized fixed cost; the variant was removed.
#: See PERFORMANCE.md "measured dead ends".)

_BIG = 1e9


def _tile_counts(cfg: T.TsdfConfig):
    ty = -(-cfg.height // TILE_H)
    tx = -(-cfg.width // TILE_W)
    return ty, tx


# ---------------------------------------------------------------------------
# XLA-side candidate rasterization
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("cfg",))
def build_candidates(
    cfg: T.TsdfConfig,
    state: T.TsdfState,
    slots: jnp.ndarray,  # (V,) visible pool slots (from visible_blocks)
    mask: jnp.ndarray,  # (V,) bool
    origin: jnp.ndarray,  # (3,) local-window origin (block coords)
    world_to_cam: jnp.ndarray,
    intr4=None,  # (4,) fx fy cx cy override (crop viewports)
):
    """Per-tile candidate block lists: (cand_slot (T,K), linq (T,K*4),
    bx/by/bz (T*K,)). Sentinel entries use the reserved scratch row."""
    P = cfg.pool_capacity
    K = cfg.raycast_cand_k
    ty_n, tx_n = _tile_counts(cfg)
    n_tiles = ty_n * tx_n
    dxd, dyd, dzd = cfg.local_dims

    slots_c = jnp.clip(slots, 0, P - 1)
    coords = state.block_coords[slots_c]  # (V, 3)

    # project the 8 block corners
    corner = jnp.asarray(
        [[i, j, k] for i in (0, 1) for j in (0, 1) for k in (0, 1)],
        jnp.float32,
    )  # (8, 3)
    pts = (coords[:, None, :].astype(jnp.float32) + corner[None]) \
        * cfg.block_size  # (V, 8, 3)
    R, t = world_to_cam[:3, :3], world_to_cam[:3, 3]
    pc = pts @ R.T + t
    z = pc[..., 2]
    z_min = z.min(axis=1)
    z_max = z.max(axis=1)
    near = z_min < 0.05  # block reaches behind the near plane
    zc = jnp.maximum(z, 0.05)
    if intr4 is None:
        fx_p, fy_p, cx_p, cy_p = cfg.fx, cfg.fy, cfg.cx, cfg.cy
    else:
        fx_p, fy_p, cx_p, cy_p = intr4[0], intr4[1], intr4[2], intr4[3]
    u = pc[..., 0] / zc * fx_p + cx_p
    v = pc[..., 1] / zc * fy_p + cy_p
    u_min = jnp.where(near, -_BIG, u.min(axis=1))
    u_max = jnp.where(near, _BIG, u.max(axis=1))
    v_min = jnp.where(near, -_BIG, v.min(axis=1))
    v_max = jnp.where(near, _BIG, v.max(axis=1))

    # surface-bearing filter: a zero crossing needs a stored NEGATIVE
    # voxel — rays can't cross a surface inside a block whose observed
    # voxels are all positive (the front shell of the truncation band,
    # roughly half the allocated blocks on a planar scene). Dropping
    # those blocks turns their traversal into one gap leap instead of
    # ~2-3 bounded sphere steps each, starts rays at the first
    # surface-bearing interval, and pushes more tiles under the K_LIGHT
    # tier. Crossings at a kept block's entry face lose their true
    # previous sample to the leap clamp; the post-march Newton polish in
    # the kernel restores the hit accuracy (one extra SDF sample).
    # The row gather below is contiguous (streams at HBM speed,
    # PERFORMANCE.md) — ~(V, 512) i32.
    rows = state.tsdf_w[slots_c]  # (V, 512) packed sdf<<16 | weight
    has_neg = jnp.any(((rows & 0xFFFF) > 0) & ((rows >> 16) < 0), axis=1)

    ok = mask & has_neg & (z_max > cfg.min_depth * 0.5) \
        & (z_min < cfg.max_depth * 1.05 + cfg.mu)

    # separable tile-overlap masks
    tx0 = jnp.clip(jnp.floor(u_min / TILE_W), 0, tx_n - 1).astype(jnp.int32)
    tx1 = jnp.clip(jnp.floor(u_max / TILE_W), 0, tx_n - 1).astype(jnp.int32)
    ty0 = jnp.clip(jnp.floor(v_min / TILE_H), 0, ty_n - 1).astype(jnp.int32)
    ty1 = jnp.clip(jnp.floor(v_max / TILE_H), 0, ty_n - 1).astype(jnp.int32)
    off_img = (u_max < 0) | (u_min >= cfg.width) | (v_max < 0) \
        | (v_min >= cfg.height)
    ok = ok & ~off_img

    tx_ids = jnp.arange(tx_n, dtype=jnp.int32)
    ty_ids = jnp.arange(ty_n, dtype=jnp.int32)
    ovx = (tx_ids[None, :] >= tx0[:, None]) & (tx_ids[None, :] <= tx1[:, None])
    ovy = (ty_ids[None, :] >= ty0[:, None]) & (ty_ids[None, :] <= ty1[:, None])
    # (Ty, Tx, V)
    overlap = ovy.T[:, None, :] & ovx.T[None, :, :] & ok[None, None, :]

    # nearest-first selection, exact. Tiles are only 8 px tall (see
    # TILE_H): depth varies strongly across image ROWS near the horizon,
    # so short tiles keep each tile's rays at similar depths and near
    # blocks can't evict the far blocks horizon rays terminate on.
    # (Tried and rejected: approx_max_k — collapses clustered valid
    # entries into shared aggregation buckets; depth-bin and row-band
    # quota schemes — both starve tiles relative to plain nearest-K on
    # short tiles.)
    key = jnp.where(overlap, -z_min[None, None, :], -jnp.inf)
    key = key.reshape(n_tiles, -1)
    vals, idx = jax.lax.top_k(key, K)
    valid = jnp.isfinite(vals)
    cand_slot = jnp.where(valid, slots_c[idx], P - 1).astype(jnp.int32)

    cand_coords = coords[idx]  # (T, K, 3)
    local = cand_coords - origin[None, None, :]
    lin = (local[..., 0] * dyd + local[..., 1]) * dzd + local[..., 2]
    lin4 = lin[..., None] * 4 + jnp.arange(4, dtype=jnp.int32)
    linq = jnp.where(valid[..., None], lin4, -1)
    linq = linq.reshape(n_tiles, 1, K * 4).astype(jnp.int32)

    big_c = jnp.int32(1 << 22)
    bx = jnp.where(valid, cand_coords[..., 0], big_c).reshape(-1)
    by = jnp.where(valid, cand_coords[..., 1], big_c).reshape(-1)
    bz = jnp.where(valid, cand_coords[..., 2], big_c).reshape(-1)
    n_cand = jnp.sum(valid, axis=1).astype(jnp.int32)  # (T,)
    return cand_slot.reshape(-1), linq, bx, by, bz, n_cand


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------


def _kernel_factory(cfg: T.TsdfConfig, n_steps: int):
    K = cfg.raycast_cand_k
    voxel = cfg.voxel_size
    dxd, dyd, dzd = cfg.local_dims
    # in-band sampling floor. (A coarser 3.0-3.5-voxel floor was
    # hardware-probed: NO step-count reduction — the tile tail is not
    # dt-bound — while losing hit coverage / color parity. Keep 2.5.)
    dt = 2.5 * voxel
    mu_step = cfg.mu
    t_max_hard = cfg.max_depth * 1.05

    def kernel(
        cand_ref,  # prefetch (T*K,) int32 pool slots
        bx_ref,  # prefetch (T*K,) int32
        by_ref,
        bz_ref,
        ncand_ref,  # prefetch (T,) int32 valid-candidate count per tile
        params_ref,  # (6, 4) f32 SMEM
        linq_ref,  # (1, 1, K*4) int32 VMEM (this tile's row)
        tsdfw_hbm,  # (P*4, 128) int32, ANY
        color_hbm,  # (P*4, 128) int32, ANY
        t_out_ref,  # (TILE_H, TILE_W) f32
        color_out_ref,  # (TILE_H, TILE_W) int32
        weight_out_ref,  # (TILE_H, TILE_W) f32
        steps_out_ref,  # (ty_n, tx_n) int32 SMEM (whole array, constant
        # index map — (1,1) blocks violate Mosaic's block granularity);
        # each tile writes its own cell
        vox_s,  # (K*4, 128) int32 scratch
        col_s,  # (K*4, 128) int32 scratch
        tin_s,  # (K, TILE_H, TILE_W) f32
        tout_s,  # (K, TILE_H, TILE_W) f32
        t_s,  # (TILE_H, TILE_W) f32 — current sample position
        psdf_s,  # (TILE_H, TILE_W) f32 — previous sample's SDF
        pt_s,  # (TILE_H, TILE_W) f32 — previous sample position
        bh_s,  # (TILE_H, TILE_W) f32 — best (first) interpolated hit
        bc_s,  # (TILE_H, TILE_W) f32 — its crossing sample position
        entry_s,  # (TILE_H, TILE_W) f32 — gap-leap entry cache
        done_s,  # (1, 1) int32 SMEM — all rays settled flag
        sem,  # DMA sems (2 * K,)
    ):
        ty = pl.program_id(0)
        tx = pl.program_id(1)
        t_lin = ty * pl.num_programs(1) + tx

        # ---- start candidate-row DMAs (voxels + color) -------------------
        def start_dma(k, _):
            slot = cand_ref[t_lin * K + k]
            pltpu.make_async_copy(
                tsdfw_hbm.at[pl.ds(slot * 4, 4)],
                vox_s.at[pl.ds(k * 4, 4)], sem.at[k],
            ).start()
            pltpu.make_async_copy(
                color_hbm.at[pl.ds(slot * 4, 4)],
                col_s.at[pl.ds(k * 4, 4)], sem.at[K + k],
            ).start()
            return 0

        jax.lax.fori_loop(0, K, start_dma, 0, unroll=False)

        # ---- per-ray directions (z-normalized, world frame) --------------
        fx = params_ref[3, 0]
        fy = params_ref[3, 1]
        cx = params_ref[3, 2]
        cy = params_ref[3, 3]
        vpix = (ty * TILE_H
                + jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0)
                ).astype(jnp.float32)
        upix = (tx * TILE_W
                + jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1)
                ).astype(jnp.float32)
        rcx = (upix - cx) / fx
        rcy = (vpix - cy) / fy
        rdx = params_ref[0, 0] * rcx + params_ref[0, 1] * rcy + params_ref[0, 2]
        rdy = params_ref[1, 0] * rcx + params_ref[1, 1] * rcy + params_ref[1, 2]
        rdz = params_ref[2, 0] * rcx + params_ref[2, 1] * rcy + params_ref[2, 2]
        camx = params_ref[0, 3]
        camy = params_ref[1, 3]
        camz = params_ref[2, 3]
        t_min = params_ref[5, 0]

        def safe_inv(d):
            return 1.0 / jnp.where(jnp.abs(d) < 1e-9, 1e-9, d)

        ix = safe_inv(rdx)
        iy = safe_inv(rdy)
        iz = safe_inv(rdz)

        # ---- per-candidate ray/AABB intervals -----------------------------
        def aabb(k, t0):
            lox = bx_ref[t_lin * K + k].astype(jnp.float32) * (8.0 * voxel)
            loy = by_ref[t_lin * K + k].astype(jnp.float32) * (8.0 * voxel)
            loz = bz_ref[t_lin * K + k].astype(jnp.float32) * (8.0 * voxel)
            t1x = (lox - camx) * ix
            t2x = (lox + 8.0 * voxel - camx) * ix
            t1y = (loy - camy) * iy
            t2y = (loy + 8.0 * voxel - camy) * iy
            t1z = (loz - camz) * iz
            t2z = (loz + 8.0 * voxel - camz) * iz
            tin = jnp.maximum(
                jnp.maximum(jnp.minimum(t1x, t2x), jnp.minimum(t1y, t2y)),
                jnp.minimum(t1z, t2z),
            )
            tout = jnp.minimum(
                jnp.minimum(jnp.maximum(t1x, t2x), jnp.maximum(t1y, t2y)),
                jnp.maximum(t1z, t2z),
            )
            hitbox = (tin <= tout) & (tout > t_min)
            tin = jnp.where(hitbox, jnp.maximum(tin, t_min), _BIG)
            tout = jnp.where(hitbox, jnp.minimum(tout, t_max_hard), -_BIG)
            tin_s[k] = tin
            tout_s[k] = tout
            return jnp.minimum(t0, tin)

        t0 = jax.lax.fori_loop(
            0, K, aabb, jnp.full((TILE_H, TILE_W), _BIG, jnp.float32),
            unroll=False,
        )

        # ---- wait for DMAs, build sample tables ---------------------------
        def wait_dma(k, _):
            pltpu.make_async_copy(
                tsdfw_hbm.at[pl.ds(0, 4)],
                vox_s.at[pl.ds(k * 4, 4)], sem.at[k],
            ).wait()
            pltpu.make_async_copy(
                color_hbm.at[pl.ds(0, 4)],
                col_s.at[pl.ds(k * 4, 4)], sem.at[K + k],
            ).wait()
            return 0

        jax.lax.fori_loop(0, K, wait_dma, 0, unroll=False)

        packed = vox_s[:]
        wbits = packed & 0xFFFF
        sdf_tab = jnp.where(
            wbits > 0,
            (packed >> 16).astype(jnp.float32) * (1.0 / T.SDF_SCALE),
            1.0,
        )
        # bf16 SHIFTED copy for the march loop's per-step sampling:
        # storing (sdf - 1) makes the sampled SDF an affine readout of
        # the one-hot contraction alone — matched voxels give dot + 1 =
        # sdf, a miss gives 0 + 1 = +1.0 (the outside-candidates value)
        # — so the march never builds the (TILE_H, TILE_W, KE*4)
        # in-candidate indicator reduce (~20% of per-step VPU work at
        # K=64). Unobserved voxels hold sdf_tab = 1.0, i.e. 0 after the
        # shift: they read back +1.0 whether matched or not, exactly as
        # before. bf16 quantization of the shifted value costs <= 1/128
        # absolute near a crossing (sdf ~ 0 -> stored ~ -1), ~2 mm of
        # hit interpolation at mu = 0.30 m — same order as the unshifted
        # bf16 table.
        sdf_tab_bf = (sdf_tab - 1.0).astype(jnp.bfloat16)
        linq = linq_ref[:]  # (1, 1, K*4)
        ox = params_ref[4, 0]
        oy = params_ref[4, 1]
        oz = params_ref[4, 2]

        def sample_ids(t_s):
            """(lin row id, lane id) of the nearest voxel at cam + rd*t."""
            posx = camx + rdx * t_s
            posy = camy + rdy * t_s
            posz = camz + rdz * t_s
            px = jnp.floor(posx * (1.0 / voxel)).astype(jnp.int32)
            py = jnp.floor(posy * (1.0 / voxel)).astype(jnp.int32)
            pz = jnp.floor(posz * (1.0 / voxel)).astype(jnp.int32)
            lx = (px >> 3) - ox.astype(jnp.int32)
            ly = (py >> 3) - oy.astype(jnp.int32)
            lz = (pz >> 3) - oz.astype(jnp.int32)
            in_win = (
                (lx >= 0) & (lx < dxd) & (ly >= 0) & (ly < dyd)
                & (lz >= 0) & (lz < dzd) & (t_s < t_max_hard)
            )
            lin = ((lx * dyd + ly) * dzd + lz) * 4 + ((px & 7) >> 1)
            lin = jnp.where(in_win, lin, -1)
            lane = (px & 1) * 64 + (py & 7) * 8 + (pz & 7)
            return lin, lane

        lane_iota = jax.lax.broadcasted_iota(
            jnp.int32, (TILE_H, TILE_W, 128), 2
        )
        def sample_table(t_s, table, linq_k=None):
            """One-hot MXU sampling of `table` ((KE*4,128)) at the nearest
            voxel; returns (value, in_candidate). The contraction runs in
            the TABLE's dtype: the one-hot makes it an exact selection
            (no accumulation), so a bf16 table costs only bf16 value
            quantization — and the bf16 MXU pass is ~4x the f32 one."""
            lq = linq if linq_k is None else linq_k
            lin, lane = sample_ids(t_s)
            oh = (lin[:, :, None] == lq).astype(table.dtype)
            w1 = jax.lax.dot_general(
                oh, table, (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (TILE_H, TILE_W, 128)
            ohl = (lane_iota == lane[:, :, None]).astype(jnp.float32)
            val = jnp.sum(w1 * ohl, axis=2)
            inany = jnp.sum(oh.astype(jnp.float32), axis=2)
            return val, inany

        def sample_sdf(t_s, table_shifted, linq_k):
            """March-loop SDF readout: one one-hot MXU contraction of the
            SHIFTED table (sdf - 1), no indicator reduce — see the
            sdf_tab_bf comment."""
            lin, lane = sample_ids(t_s)
            oh = (lin[:, :, None] == linq_k).astype(table_shifted.dtype)
            w1 = jax.lax.dot_general(
                oh, table_shifted, (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (TILE_H, TILE_W, 128)
            ohl = (lane_iota == lane[:, :, None]).astype(jnp.float32)
            return jnp.sum(w1 * ohl, axis=2) + 1.0

        # ---- fused march: placement + sampling + crossing in ONE pass,
        # with per-tile early termination — once every ray has either
        # crossed the surface or left candidate coverage (t at the cap),
        # the remaining steps skip ALL work (the dominant cost: per-step
        # interval scans + the one-hot MXU sample)
        t_cap = t_max_hard + 2.0 * dt
        t_s[:] = jnp.minimum(t0, t_cap)
        psdf_s[:] = jnp.ones((TILE_H, TILE_W), jnp.float32)
        pt_s[:] = jnp.minimum(t0, t_cap) - dt
        bh_s[:] = jnp.full((TILE_H, TILE_W), _BIG, jnp.float32)
        bc_s[:] = jnp.full((TILE_H, TILE_W), _BIG, jnp.float32)
        entry_s[:] = jnp.full((TILE_H, TILE_W), _BIG, jnp.float32)
        done_s[0, 0] = 0
        steps_out_ref[ty, tx] = 0

        def run_march(KE: int):
            """The fused march over the first KE candidate rows. Exact
            for tiles with <= KE valid candidates: the lists are
            nearest-first with sentinel padding (tin=_BIG, tout=-_BIG,
            linq=-1), so rows past the count contribute nothing to the
            scans or the one-hot contraction."""
            table_k = sdf_tab_bf[: KE * 4]
            linq_k = linq[:, :, : KE * 4]

            def march(s, _):
                @pl.when(done_s[0, 0] == 0)
                def _step():
                    steps_out_ref[ty, tx] = steps_out_ref[ty, tx] + 1
                    t_cur = t_s[:]
                    sdf = sample_sdf(t_cur, table_k, linq_k)
                    prev_sdf = psdf_s[:]
                    # a leap leaves prev far behind: clamp the virtual
                    # previous sample
                    prev_t = jnp.maximum(pt_s[:], t_cur - 1.5 * dt)
                    # first crossing wins: samples are placed
                    # monotonically, so only record while no hit yet
                    crossing = (prev_sdf > 0.0) & (sdf <= 0.0) \
                        & (t_cur < t_max_hard) & (t_cur > 0.0) \
                        & (bh_s[:] >= _BIG)
                    frac = prev_sdf / jnp.maximum(prev_sdf - sdf, 1e-6)
                    hit_t = prev_t + (t_cur - prev_t) * frac
                    bh_s[:] = jnp.where(crossing, hit_t, bh_s[:])
                    bc_s[:] = jnp.where(crossing, t_cur, bc_s[:])
                    psdf_s[:] = sdf
                    pt_s[:] = t_cur

                    # place the next sample: sphere-trace inside covered
                    # intervals (the TSDF bounds the surface distance, so
                    # a positive sample allows a step of sdf * mu —
                    # exactly the XLA fine phase's rule; shrinking steps
                    # cannot leap over a crossing), floored at dt for
                    # sampling density, and leap to the next interval
                    # entry over gaps. Without this, dense maps keep rays
                    # inside covered intervals at fixed dt and they run
                    # out of steps ~2.5 m in.
                    tn = t_cur + jnp.maximum(sdf * (0.9 * mu_step), dt)
                    tin = tin_s[:KE]
                    tout = tout_s[:KE]
                    covered = jnp.any(
                        (tin <= tn[None]) & (tn[None] <= tout), axis=0
                    )

                    # uncovered: pull back to the FIRST interval entry
                    # after t_cur (not after tn — a step can overshoot a
                    # short grazing interval entirely, which silently
                    # skipped it), clamped forward so progress is
                    # strictly monotonic. The (KE, TILE_H, TILE_W)
                    # min-scan only runs on steps where SOME ray needs a
                    # leap (rare in dense maps — most steps every ray
                    # sphere-steps inside coverage); covered rays never
                    # read the cached value, so staleness is harmless.
                    @pl.when(jnp.logical_not(jnp.all(covered)))
                    def _gap_entry():
                        entry_s[:] = jnp.min(
                            jnp.where(
                                tin > t_cur[None] + 0.25 * dt, tin, _BIG
                            ),
                            axis=0,
                        )

                    t_nxt = jnp.minimum(
                        jnp.where(
                            covered, tn,
                            jnp.maximum(
                                entry_s[:] - 0.25 * dt, t_cur + 0.5 * dt
                            ),
                        ),
                        t_cap,
                    )
                    t_s[:] = t_nxt
                    settled = (bh_s[:] < _BIG) | (t_nxt >= t_cap - 1e-3)
                    done_s[0, 0] = jnp.all(settled).astype(jnp.int32)

                return 0

            jax.lax.fori_loop(0, n_steps, march, 0, unroll=False)

        k_mid = K_MID if K_LIGHT < K_MID < K else 0
        if K > K_LIGHT and k_mid:
            nc = ncand_ref[t_lin]

            @pl.when(nc <= K_LIGHT)
            def _march_light():
                run_march(K_LIGHT)

            @pl.when(jnp.logical_and(nc > K_LIGHT, nc <= k_mid))
            def _march_mid():
                run_march(k_mid)

            @pl.when(nc > k_mid)
            def _march_full():
                run_march(K)
        elif K > K_LIGHT:
            light = ncand_ref[t_lin] <= K_LIGHT

            @pl.when(light)
            def _march_light():
                run_march(K_LIGHT)

            @pl.when(jnp.logical_not(light))
            def _march_full():
                run_march(K)
        else:
            run_march(K)

        best_hit = bh_s[:]
        best_cross = bc_s[:]
        found = best_hit < t_max_hard

        # one-sample Newton polish of the interpolated hit: crossings
        # detected right after a gap leap interpolate against a stale
        # clamped previous sample (common once the surface-bearing
        # filter drops front-shell blocks — the crossing block's entry
        # face IS the first sample). The TSDF at the hit is a signed
        # distance (in units of mu): one extra sample turns it into a
        # direct correction along the ray. Accurate hits read sdf ~ 0
        # (no-op); out-of-candidate reads (+1.0) are rejected by the
        # in-band gate.
        sdf_h = sample_sdf(best_hit, sdf_tab_bf, linq)
        # clamp is dt-INDEPENDENT: the correction only needs to undo
        # crossing-localization error (~one sampling interval); letting
        # it scale with a coarser dt pushed polished hits into
        # unobserved voxels (weight-0 reads at the hit)
        corr = jnp.clip(sdf_h * mu_step, -2.5 * voxel, 2.5 * voxel)
        polish = found & (jnp.abs(sdf_h) < 0.5)
        best_hit = jnp.where(polish, best_hit + corr, best_hit)

        # ---- post-pass: color + weight at the hit --------------------------
        color_tab = col_s[:].astype(jnp.float32)
        w_tab = wbits.astype(jnp.float32) * (1.0 / T.WEIGHT_SCALE)
        c_hit, in_hit = sample_table(best_hit, color_tab)
        w_hit, _ = sample_table(best_hit, w_tab)
        c_fb, _ = sample_table(best_cross, color_tab)
        w_fb, _ = sample_table(best_cross, w_tab)
        # second fallback one sampling interval in FRONT of the
        # crossing: with the coarser dt the crossing sample can land in
        # an unobserved voxel behind the surface, while the front band
        # it stepped from is observed (it produced the positive
        # previous sample) — the voxel the fine-sampled XLA path would
        # read
        c_fb2, _ = sample_table(best_cross - dt, color_tab)
        w_fb2, _ = sample_table(best_cross - dt, w_tab)
        ok_hit = (in_hit > 0.5) & (w_hit > 0.0)
        ok_fb = w_fb > 0.0
        color = jnp.where(ok_hit, c_hit, jnp.where(ok_fb, c_fb, c_fb2))
        wgt = jnp.where(ok_hit, w_hit, jnp.where(ok_fb, w_fb, w_fb2))

        t_out_ref[:] = jnp.where(found, best_hit, 0.0)
        color_out_ref[:] = jnp.where(
            found, color, 0.0).astype(jnp.int32)
        weight_out_ref[:] = jnp.where(found, wgt, 0.0)

    return kernel


@partial(jax.jit,
         static_argnames=("cfg", "interpret", "with_tile_steps"))
def raycast_tiled(
    cfg: T.TsdfConfig,
    state: T.TsdfState,
    slots: jnp.ndarray,
    slots_mask: jnp.ndarray,
    origin: jnp.ndarray,
    cam_to_world: jnp.ndarray,
    intrinsics: jnp.ndarray,  # (4,) fx, fy, cx, cy
    interpret: bool = False,
    with_tile_steps: bool = False,
) -> T.Raycast:
    """Drop-in replacement for ops.tsdf.raycast at the configured frame
    size (free-camera / rescaled renders use the XLA path).
    `with_tile_steps=True` additionally returns the per-tile marched
    step counts (ty_n, tx_n) — profiling only."""
    P = cfg.pool_capacity
    K = cfg.raycast_cand_k
    ty_n, tx_n = _tile_counts(cfg)
    # sphere-trace steps + gap leaps need some headroom beyond the XLA
    # fine count to reach far surfaces (grazing rays advance slowly);
    # early termination makes unused steps nearly free (GT coverage
    # saturates by ~24 steps at KITTI scale)
    n_steps = max(cfg.raycast_fine_steps + 12, 8)
    h, w = cfg.height, cfg.width

    world_to_cam = jnp.linalg.inv(cam_to_world)
    # candidates must project with the SAME principal point the rays use
    # (crop viewports render with a shifted cx/cy)
    cand_slot, linq, bx, by, bz, n_cand = build_candidates(
        cfg, state, slots, slots_mask, origin, world_to_cam,
        intr4=intrinsics,
    )

    params = jnp.zeros((6, 4), jnp.float32)
    params = params.at[:3, :3].set(cam_to_world[:3, :3])
    params = params.at[:3, 3].set(cam_to_world[:3, 3])
    params = params.at[3].set(intrinsics)
    params = params.at[4, :3].set(origin.astype(jnp.float32))
    params = params.at[4, 3].set(cfg.voxel_size)
    params = params.at[5, 0].set(cfg.min_depth * 0.6)
    params = params.at[5, 1].set(cfg.max_depth * 1.05)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,  # cand_slot, bx, by, bz, n_cand
        grid=(ty_n, tx_n),
        in_specs=[
            pl.BlockSpec((6, 4), lambda i, j, *_: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, K * 4), lambda i, j, *_: (i * tx_n + j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((TILE_H, TILE_W), lambda i, j, *_: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_H, TILE_W), lambda i, j, *_: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_H, TILE_W), lambda i, j, *_: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ty_n, tx_n), lambda i, j, *_: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((K * 4, 128), jnp.int32),
            pltpu.VMEM((K * 4, 128), jnp.int32),
            pltpu.VMEM((K, TILE_H, TILE_W), jnp.float32),
            pltpu.VMEM((K, TILE_H, TILE_W), jnp.float32),
            pltpu.VMEM((TILE_H, TILE_W), jnp.float32),
            pltpu.VMEM((TILE_H, TILE_W), jnp.float32),
            pltpu.VMEM((TILE_H, TILE_W), jnp.float32),
            pltpu.VMEM((TILE_H, TILE_W), jnp.float32),
            pltpu.VMEM((TILE_H, TILE_W), jnp.float32),
            pltpu.VMEM((TILE_H, TILE_W), jnp.float32),
            pltpu.SMEM((1, 1), jnp.int32),
            pltpu.SemaphoreType.DMA((2 * K,)),
        ],
    )

    hp, wp = ty_n * TILE_H, tx_n * TILE_W
    t_img, color_bits, weight, tile_steps = pl.pallas_call(
        _kernel_factory(cfg, n_steps),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((hp, wp), jnp.float32),
            jax.ShapeDtypeStruct((hp, wp), jnp.int32),
            jax.ShapeDtypeStruct((hp, wp), jnp.float32),
            jax.ShapeDtypeStruct((ty_n, tx_n), jnp.int32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(
        cand_slot, bx, by, bz, n_cand, params, linq,
        state.tsdf_w.reshape(P * 4, 128), state.color.reshape(P * 4, 128),
    )
    t_img = t_img[:h, :w]
    color_bits = color_bits[:h, :w]
    weight = weight[:h, :w]

    # assemble the Raycast (elementwise only)
    fxv, fyv, cxv, cyv = (intrinsics[0], intrinsics[1], intrinsics[2],
                          intrinsics[3])
    vv = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    uu = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    rc = jnp.stack(
        [(uu - cxv) / fxv, (vv - cyv) / fyv, jnp.ones((h, w))], -1
    )
    rd = rc @ cam_to_world[:3, :3].T
    hit = t_img > 0.0
    points = cam_to_world[:3, 3][None, None, :] + rd * t_img[..., None]
    color = jnp.where(
        hit[..., None], T.unpack_rgb(color_bits), jnp.zeros(3, jnp.uint8)
    )
    rc = T.Raycast(
        depth=t_img, points=points, color=color, weight=weight, hit=hit,
        march_samples=jnp.sum(tile_steps) * (TILE_H * TILE_W),
    )
    if with_tile_steps:
        return rc, tile_steps
    return rc
