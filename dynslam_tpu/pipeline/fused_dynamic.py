"""Single-dispatch fused frame step for the DYNAMIC-object pipeline.

The reference's default mode is dynamic (DynSLAMGUI.cpp:26-31): per frame
it segments, cuts moving objects out of the main view, estimates each
object's motion from masked scene flow, and fuses objects into their own
TSDF volumes (DynSlam.cpp:121-133, InstanceReconstructor.cpp:172-207).
The staged path (pipeline/dynslam.py + instances/reconstructor.py) mirrors
that loop exactly but pays one TPU-relay dispatch (~6 ms host time) per
device stage — 15-20 per dynamic frame. This module folds the ENTIRE
dynamic per-frame computation into ONE jitted executable:

  stereo -> features/flow -> camera RANSAC -> PER-MASK object RANSAC
  (vmapped over K mask slots) -> silhouette cut -> per-object TSDF
  fusion (S pooled volumes, fused in-step) -> static allocate+fuse+
  raycast+decay on the cut view

Host<->device protocol (the reference's async structure, DynSlam.cpp:
33-112, shifted one frame): the host tracker — association, the
Uncertain/Static/Dynamic state machine, slot lifecycle — runs on a
compacted per-frame output vector (`packed`, one ~35 ms relay fetch that
doubles as the pipeline sync), so its decisions land one frame late:

- association of frame k's detections happens BEFORE dispatch k (it only
  needs host-side masks/bboxes, Track.cpp:17-71);
- the silhouette action (keep/remove/cut) for frame k uses each track's
  state as of frame k-1's update — one frame staler than the staged
  path. Reconstructable detections are cut SPECULATIVELY even while
  Uncertain (the crop is free — the crop vmap covers all K slots — and
  cut implies the same view removal Uncertain tracks get anyway), so
  whether a frame's view fuses is decided by the deferred tracker pass
  with FRESH state: transition frames lose no views.
- the view cut at frame k is fused into its object volume during
  dispatch k+1 (it stays on device in the carry's pending buffer), at
  the chain pose the host computes from frame k's fetched object motion
  — the same value the staged path uses, one dispatch later.

Per-object motion estimation runs ON DEVICE: K vmapped RANSAC estimators
(ops/egomotion.py — the same estimator the reference applies to objects,
VisoSparseSFProvider.cpp:70-82) over per-mask flow subsets selected with
a single bit-packed mask gather. The host receives only (twist, success,
inlier/flow counts) per mask and runs Track.update() with the
precomputed motion — bit-identical state-machine semantics (Track.cpp:
246-342).
"""

from __future__ import annotations

import dataclasses
import sys
import threading
from functools import partial
from typing import Dict, List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dynslam_tpu.config import (
    DynSlamConfig, StereoCalibration, StereoMatcherParams,
    VisualOdometryParams, VoxelDecayParams,
)
from dynslam_tpu.instances.track import Track, TrackFrame, TrackState
from dynslam_tpu.instances.tracker import InstanceTracker
from dynslam_tpu.io.segmentation import InstanceDetection
from dynslam_tpu.ops import depth as depth_ops
from dynslam_tpu.ops import egomotion as ego_ops
from dynslam_tpu.ops import features as feat_ops
from dynslam_tpu.ops import stereo as stereo_ops
from dynslam_tpu.ops import tsdf
from dynslam_tpu.pipeline.fused import (
    _refine_matches, motion_with_icp_fallback,
)
from dynslam_tpu.utils import se3

#: silhouette actions (ProcessSilhouette branches,
#: InstanceReconstructor.cpp:226-285)
ACTION_KEEP = 0
ACTION_REMOVE = 1
ACTION_CUT = 2

#: per-mask match rows fed to the object RANSAC (matches beyond the cap
#: are dropped; bucketed detection caps keep real masks well below it)
OBJ_MATCH_CAP = 256


class FusedDynCarry(NamedTuple):
    """Device-resident cross-frame state (static fields mirror
    pipeline/fused.py's FusedCarry; instance fields replace the staged
    InstanceVolumePool)."""

    state: tsdf.TsdfState
    pose_w2c: jnp.ndarray
    held_motion: jnp.ndarray
    prev_l: feat_ops.Features
    prev_r: feat_ops.Features
    prev_lg: jnp.ndarray
    prev_rg: jnp.ndarray
    frame_idx: jnp.ndarray
    dropped: jnp.ndarray
    origin: jnp.ndarray
    grid: jnp.ndarray
    #: previous frame's model render for the ICP fallback (fused.py)
    prev_rc_points: jnp.ndarray  # (H, W, 3) f32
    prev_rc_hit: jnp.ndarray  # (H, W) bool
    #: stacked per-object volumes, leaf shapes (S, ...)
    inst: tsdf.TsdfState
    inst_fidx: jnp.ndarray  # (S,) i32 per-slot fusion clock (decay age)
    #: views cut THIS frame — bbox-centred CROPS
    #: (config.instance_map.fusion_crop), zero outside the copy mask,
    #: with their 4-aligned frame origins. Consumed by the NEXT dispatch
    #: (dispatch_lag=1) or shifted into prev_pending_* and consumed one
    #: dispatch later (dispatch_lag=2)
    pending_depth: jnp.ndarray  # (K, CH, CW) f32
    pending_rgb: jnp.ndarray  # (K, CH, CW, 3) uint8
    pending_org: jnp.ndarray  # (K, 2) i32 crop origin (u0, v0)
    #: the one-frame-older cut views (dispatch_lag=2's fusion source;
    #: carried but unused at lag 1)
    prev_pending_depth: jnp.ndarray  # (K, CH, CW) f32
    prev_pending_rgb: jnp.ndarray  # (K, CH, CW, 3) uint8
    prev_pending_org: jnp.ndarray  # (K, 2) i32


class FusedDynOutputs(NamedTuple):
    raycast: tsdf.Raycast
    depth_m: jnp.ndarray
    pose_w2c: jnp.ndarray
    #: the ONE host fetch per frame: every scalar the tracker needs,
    #: flattened into a single f32 vector (fetching one array is one
    #: relay round trip; fetching five would be five)
    packed: jnp.ndarray


def pack_layout(K: int):
    """(name, offset, size) layout of the packed output vector."""
    off = {}
    cur = 0
    for name, size in [
        ("sync", 1), ("vo_success", 1), ("vo_inliers", 1),
        ("delta", 16), ("pose", 16),
        ("n_new", 1), ("n_freed", 1), ("dropped", 1),
        ("obj_tr", 6 * K), ("obj_success", K), ("obj_inliers", K),
        ("obj_count", K),
        # measured device work counters (bench voxel-ops/s): voxels in
        # blocks actually gated into fusion (static + instances) and ray
        # samples the raycast kernel actually marched
        ("fused_voxels", 1), ("march_samples", 1),
        # memory telemetry (LogMemoryUse, Evaluation.h:234-243):
        # post-decay allocated static blocks + cumulative decayed blocks
        ("used_blocks", 1), ("decayed_blocks", 1),
    ]:
        off[name] = (cur, size)
        cur += size
    return off, cur


def _tree_select(pred, a, b):
    return jax.tree_util.tree_map(
        lambda x, y: jnp.where(pred, x, y), a, b
    )


def _bits_i32(x: jnp.ndarray) -> jnp.ndarray:
    """Mask bit-planes -> int32 for the slot bit math. uint8/uint16
    zero-extend; uint32 (K > 16 slots) must BITCAST so slot 31's bit
    survives the conversion (CLAUDE.md trap 7: never let a payload bit
    ride the sign position through a value conversion)."""
    if x.dtype == jnp.uint32:
        return jax.lax.bitcast_convert_type(x, jnp.int32)
    return x.astype(jnp.int32)


@partial(jax.jit, static_argnames=("icfg", "use_pallas"))
def render_instance_crop(icfg, use_pallas, inst, slot, c2w, intr4):
    """Depth render of ONE pooled instance volume into a (icfg.height,
    icfg.width) crop viewport whose principal point is shifted by the
    crop origin — the eval compositor's fast path. An active instance
    covers a handful of image tiles, but a full-frame render pays the
    whole frame's tile grid in candidate prep + kernel launches per
    slot; rendering the detection-bbox window instead makes the eval
    render cost proportional to the object's screen area."""
    st = jax.tree_util.tree_map(lambda x: x[slot], inst)
    origin = tsdf.compute_origin(icfg, c2w)
    grid = tsdf.build_local_grid(icfg, st, origin)
    if use_pallas:
        from dynslam_tpu.ops.pallas_raycast import raycast_tiled

        slots, mask = tsdf.visible_blocks(
            icfg, st, grid, origin, jnp.linalg.inv(c2w), intr4=intr4
        )
        rc = raycast_tiled(icfg, st, slots, mask, origin, c2w, intr4)
    else:
        rc = tsdf.raycast(icfg, st, grid, origin, c2w, intr4)
    return rc.depth


@jax.jit
def merge_crop_depth(target: jnp.ndarray, crop: jnp.ndarray,
                     v0: jnp.ndarray, u0: jnp.ndarray) -> jnp.ndarray:
    """Z-merge a crop render into the full-frame depth at (v0, u0) —
    the same nearest-wins rule as ops/masks.py::composite_depth."""
    ch, cw = crop.shape
    region = jax.lax.dynamic_slice(target, (v0, u0), (ch, cw))
    src = jnp.where(crop > 0.0, crop, jnp.inf)
    dst = jnp.where(region > 0.0, region, jnp.inf)
    merged = jnp.minimum(src, dst)
    merged = jnp.where(jnp.isinf(merged), 0.0, merged)
    return jax.lax.dynamic_update_slice(target, merged, (v0, u0))


@partial(jax.jit, static_argnames=("k",))
def assoc_bits_to_map(copy_bits: jnp.ndarray, codes: jnp.ndarray, k: int):
    """Segmented-eval association map from the frame's copy-mask
    bit-planes + per-slot int8 codes — the device equivalent of
    eval/evaluation.py::build_association_map restricted to the K
    selected detections, sparing the per-frame host rasterization AND
    the ~0.5 MB (H, W) int8 upload (the planes are already on device
    for the step). Bit order == detection order whenever no slot
    overflow happened (select_detections only reorders past K); the
    caller falls back to the host rasterizer otherwise. Later slots
    overwrite earlier ones, matching the host loop's det-order
    overwrite."""
    bits = _bits_i32(copy_bits)
    out = jnp.zeros(copy_bits.shape, jnp.int8)
    for j in range(k):
        out = jnp.where(((bits >> j) & 1) == 1, codes[j], out)
    return out


def route_layout(K: int, S: int):
    """(name, offset, size) layout of the packed ROUTING input vector.

    Every per-frame host-side scalar/small-array input travels in ONE
    f32 vector: through the TPU relay each jitted-call argument that is
    still host memory costs a separate ~5 ms upload round trip
    (measured: 8 small args = 42.8 ms/call, 1 packed vector = 3.2 ms),
    which dominated dynamic-mode frame time before this packing."""
    off = {}
    cur = 0
    for name, size in [
        ("copy_bbox", K * 4), ("mask_gate", K), ("warm_tr", K * 6),
        ("action", K), ("slot_src", S), ("fuse_pose", S * 16),
        ("slot_reset", S), ("slot_reap_w", S),
        ("max_decay_weight", 1), ("min_decay_age", 1),
    ]:
        off[name] = (cur, size)
        cur += size
    return off, cur


def _fuse_one_instance(
    icfg, use_pallas, fresh, st, fidx, d, rgb, org_uv, intr_vec, w2c, act,
    reset, reap_w, inst_decay, max_decay_weight, min_decay_age,
):
    """Reset/reap/fuse one pooled object volume (the per-slot body of the
    staged InstanceVolumePool._fuse_batch, instances/volume_pool.py:36-58,
    plus the reap path). Inactive slots come back bit-identical at
    near-zero cost: zero depth allocates nothing and the count-gated
    Pallas fusion skips every grid step. The view is a bbox-centred crop
    (d: (CH, CW)); `org_uv` shifts the principal point so rays match the
    full frame's."""
    st = _tree_select(reset, fresh, st)
    fidx = jnp.where(reset, 0, fidx)
    # stale-track aggressive decay (Track::ReapReconstruction,
    # Track.h:222-229): delete all voxels with weight <= reap_w
    reaped, _ = tsdf.decay(
        icfg, st, fidx, reap_w, jnp.int32(0), force_all=True
    )
    st = _tree_select(reap_w > 0, reaped, st)

    d = jnp.where(act, d, 0.0)
    intr4 = jnp.asarray(
        [intr_vec[0], intr_vec[1],
         intr_vec[2] - org_uv[0].astype(jnp.float32),
         intr_vec[3] - org_uv[1].astype(jnp.float32)], jnp.float32,
    )
    R = w2c[:3, :3]
    t = w2c[:3, 3]
    c2w = jnp.eye(4, dtype=jnp.float32)
    c2w = c2w.at[:3, :3].set(R.T)
    c2w = c2w.at[:3, 3].set(-R.T @ t)
    origin = tsdf.compute_origin(icfg, c2w)
    grid = tsdf.build_local_grid(icfg, st, origin)
    st2, grid, _ = tsdf.allocate(
        icfg, st, grid, origin, d, c2w, fidx, intr4=intr4
    )
    slots, mask = tsdf.visible_blocks(
        icfg, st2, grid, origin, w2c, intr4=intr4
    )
    if use_pallas:
        from dynslam_tpu.ops.pallas_integrate import integrate_pallas

        st2 = integrate_pallas(icfg, st2, slots, mask & act, rgb, d, w2c,
                               fidx, intr4=intr4)
    else:
        st2 = tsdf.integrate(icfg, st2, slots, mask & act, rgb, d, w2c,
                             fidx, intr4=intr4)
    if inst_decay:
        st2, _ = tsdf.decay(
            icfg, st2, fidx + 1, max_decay_weight, min_decay_age
        )
    st = _tree_select(act, st2, st)
    nvox = jnp.sum((mask & act).astype(jnp.int32)) * 512
    return st, fidx + act.astype(jnp.int32), nvox


@partial(
    jax.jit,
    static_argnames=("icfg", "use_pallas", "inst_decay"),
    donate_argnames=("inst", "inst_fidx"),
)
def fuse_slot_fullframe(
    icfg, use_pallas, inst_decay, inst, inst_fidx, slot,
    depth_m, rgb, mask, w2c, reset, intr_vec,
    max_decay_weight, min_decay_age,
):
    """FULL-FRAME fallback fusion for ONE pooled slot — the oversized-mask
    path. The hot loop fuses bbox-centred crops; a mask whose bbox exceeds
    the crop would lose its out-of-crop pixels, where the reference always
    fuses the full masked view (InstanceReconstructor.cpp:569-700). The
    host dispatches this (rare) extra executable instead of routing the
    truncated crop; `icfg` here is the FULL-frame instance config."""
    st = jax.tree_util.tree_map(lambda x: x[slot], inst)
    fidx = inst_fidx[slot]
    fresh = tsdf.create_state(icfg)
    d = jnp.where(mask, depth_m, 0.0)
    rgbm = jnp.where(mask[..., None], rgb, jnp.uint8(0))
    st2, fidx2, _ = _fuse_one_instance(
        icfg, use_pallas, fresh, st, fidx, d, rgbm,
        jnp.zeros(2, jnp.int32), intr_vec, w2c, jnp.bool_(True), reset,
        jnp.float32(0.0), inst_decay, max_decay_weight, min_decay_age,
    )
    inst2 = jax.tree_util.tree_map(
        lambda full, s: full.at[slot].set(s), inst, st2
    )
    return inst2, inst_fidx.at[slot].set(fidx2)


@partial(
    jax.jit,
    static_argnames=(
        "cfg", "icfg", "stereo_params", "vo_params", "obj_params",
        "use_pallas", "decay_enabled", "inst_decay", "K", "S",
        "profile_skip", "fuse_from_prev",
    ),
    donate_argnames=("carry",),
)
def fused_dynamic_step(
    cfg: tsdf.TsdfConfig,
    icfg: tsdf.TsdfConfig,
    stereo_params: StereoMatcherParams,
    vo_params: VisualOdometryParams,
    obj_params: VisualOdometryParams,
    use_pallas: bool,
    decay_enabled: bool,
    inst_decay: bool,
    K: int,  # mask slots
    S: int,  # pooled volume slots
    carry: FusedDynCarry,
    left_gray: jnp.ndarray,  # (H, W) f32
    right_gray: jnp.ndarray,  # (H, W) f32
    rgb: jnp.ndarray,  # (H, W, 3) uint8
    delete_bits: jnp.ndarray,  # (H, W) uint8/16/32, bit j = delete mask j
    copy_bits: jnp.ndarray,  # (H, W) uint8/16/32, bit j = copy mask j
    routing: jnp.ndarray,  # (route_layout(K, S) total,) f32 — every
    # per-frame host scalar/small-array input packed into ONE upload
    # (copy_bbox, mask_gate, warm_tr, action, slot_src, fuse_pose,
    # slot_reset, slot_reap_w, max_decay_weight, min_decay_age)
    calib_vec: jnp.ndarray,
    intr_vec: jnp.ndarray,
    bf: jnp.ndarray,
    base_key: jnp.ndarray,
    profile_skip: tuple = (),
    fuse_from_prev: bool = False,
):
    """One full dynamic frame: returns (carry', FusedDynOutputs).

    `fuse_from_prev` (dispatch_lag=2 protocol): instance fusion reads
    the one-frame-OLDER pending buffer, letting the host dispatch frame
    k before fetching frame k-1's packed outputs — the device never
    idles on the fetch round trip; tracker decisions go one frame
    staler than the lag-1 protocol.

    `profile_skip` (cost attribution only, scripts/profile_dynamic.py):
    stage names traced OUT of the executable — "obj_ransac" (per-mask
    motion), "cut" (silhouette cut + pending-view copies), "instances"
    (pooled per-object fusion). Never set in production paths."""
    h, w = left_gray.shape
    RL, _ = route_layout(K, S)

    def route(name):
        o, n = RL[name]
        return jax.lax.dynamic_slice_in_dim(routing, o, n)

    copy_bbox = route("copy_bbox").reshape(K, 4)
    mask_gate = route("mask_gate") > 0.5
    warm_tr = route("warm_tr").reshape(K, 6)
    action = jnp.round(route("action")).astype(jnp.int32)
    slot_src = jnp.round(route("slot_src")).astype(jnp.int32)
    fuse_pose = route("fuse_pose").reshape(S, 4, 4)
    slot_reset = route("slot_reset") > 0.5
    slot_reap_w = route("slot_reap_w")
    max_decay_weight = route("max_decay_weight")[0]
    min_decay_age = jnp.round(route("min_decay_age")[0]).astype(jnp.int32)

    # --- stereo depth -----------------------------------------------------
    disp = stereo_ops.compute_disparity_jit(left_gray, right_gray,
                                            stereo_params)
    depth_mm = depth_ops.depth_mm_from_disparity(
        disp, bf, cfg.min_depth, cfg.max_depth
    )
    depth_m = depth_ops.depth_m_from_mm(depth_mm)

    # --- sparse scene flow + camera egomotion -----------------------------
    cur_l, cur_r = feat_ops.detect_features_pair(
        left_gray, right_gray, vo_params
    )
    flow, valid = feat_ops.circular_match(
        cur_l, cur_r, carry.prev_l, carry.prev_r, vo_params
    )
    flow, valid = _refine_matches(
        left_gray, right_gray, carry.prev_lg, carry.prev_rg,
        flow, valid, vo_params,
    )
    key = jax.random.fold_in(base_key, carry.frame_idx)
    est = ego_ops.estimate_motion(
        flow, valid, calib_vec, key, jnp.zeros(6, jnp.float32), vo_params
    )
    held = motion_with_icp_fallback(est, carry, depth_m, intr_vec)
    pose_w2c = held @ carry.pose_w2c

    # --- per-mask object motion (ExtractSceneFlow + ExtractMotion roles,
    # InstanceReconstructor.cpp:802-849 + VisoSparseSFProvider.cpp:70-82)
    ui = jnp.clip(jnp.round(flow[:, 0]), 0, w - 1).astype(jnp.int32)
    vi = jnp.clip(jnp.round(flow[:, 1]), 0, h - 1).astype(jnp.int32)
    # ONE computed gather for all K masks (bit-packed); ~N elements
    bits_at = _bits_i32(delete_bits[vi, ui])  # (N,)
    up, vp = flow[:, 4], flow[:, 5]

    def per_mask(j, k_j):
        sel = ((bits_at >> j) & 1) == 1
        bb = copy_bbox[j]
        sel = sel & (up >= bb[0]) & (up <= bb[2]) \
            & (vp >= bb[1]) & (vp <= bb[3])
        valid_j = valid & sel & mask_gate[j]
        count_j = jnp.sum(valid_j)
        # compact the mask's matches to OBJ_MATCH_CAP rows before the
        # solver: every RANSAC scoring / GN / IRLS pass is elementwise
        # over the row count, and per-object match sets are tiny (a
        # 200x150 px mask holds <= ~180 bucketed matches), so running
        # them over the full (N,) flow paid ~8x the needed work per
        # mask. Row sets identical; only the PRNG draw order differs.
        idx = tsdf.compact_mask(valid_j, OBJ_MATCH_CAP, 0)
        vmask = jnp.arange(OBJ_MATCH_CAP) < count_j
        est_j = ego_ops.estimate_motion(
            flow[idx], vmask, calib_vec, k_j, warm_tr[j], obj_params
        )
        return est_j.tr, est_j.success, est_j.num_inliers, count_j

    if "obj_ransac" in profile_skip:
        obj_tr = jnp.zeros((K, 6), jnp.float32)
        obj_success = jnp.zeros((K,), bool)
        obj_inliers = jnp.zeros((K,), jnp.int32)
        obj_count = jnp.zeros((K,), jnp.int32)
    else:
        obj_keys = jax.random.split(
            jax.random.fold_in(base_key, carry.frame_idx + (1 << 20)), K
        )
        obj_tr, obj_success, obj_inliers, obj_count = jax.vmap(per_mask)(
            jnp.arange(K), obj_keys
        )

    # --- silhouette processing (cut/remove on the device view) ------------
    # plane dtype is uint8 for K <= 8, uint16 to 16, uint32 to the hard
    # ceiling of 32 (the narrowest dtype is kept: wider planes grow the
    # per-frame mask upload); all bit math runs in int32 — shifts and
    # AND-masks at bit 31 are well-defined under two's-complement wrap,
    # and _bits_i32 bitcasts (not converts) uint32 planes in
    jidx = jnp.arange(K, dtype=jnp.int32)
    rem_bits = jnp.sum(jnp.where(action >= ACTION_REMOVE, 1 << jidx, 0))
    remove_mask = (_bits_i32(delete_bits) & rem_bits) != 0
    depth_cut = jnp.where(remove_mask, 0.0, depth_m)
    rgb_cut = jnp.where(remove_mask[..., None], jnp.uint8(0), rgb)
    # per-slot cut-out views with SEQUENTIAL-cut semantics for
    # overlapping masks: the staged path (ProcessSilhouette_CPU order,
    # InstanceReconstructor.cpp:59-170) copies each track's pixels from
    # a view earlier tracks already deleted from, so an overlapped pixel
    # lands in exactly ONE instance view — the earliest slot whose
    # delete mask covers it. Reproduced here by masking each crop with
    # earlier removing slots' delete bits (tests/test_fused_dynamic.py
    # pins no-double-fusion on two overlapping car masks).
    if "cut" in profile_skip:
        depth_cut, rgb_cut = depth_m, rgb
        new_pending_depth = carry.pending_depth
        new_pending_rgb = carry.pending_rgb
        new_pending_org = carry.pending_org
    else:
        # bbox-centred fusion crops (CH, CW): cut views are zero outside
        # the copy mask, so a crop covering the bbox loses nothing; the
        # 4-aligned origin keeps allocate's stride-4 pixel phase, so
        # crop fusion matches full-frame fusion up to float rounding of
        # borderline pixels for masks that fit the crop
        CH = carry.pending_depth.shape[1]
        CW = carry.pending_depth.shape[2]
        cbits_i = _bits_i32(copy_bits)
        dbits_i = _bits_i32(delete_bits)
        # pad to 4-aligned frame dims so aligned windows can reach the
        # bottom/right edges: at 1242x375 (neither % 4 == 0) the largest
        # aligned origin left the last 3 rows / 2 cols uncoverable by ANY
        # window, so every mask touching the frame bottom falsely took
        # the (~110 ms) full-frame oversize fallback. Zero-depth padding
        # never allocates or fuses, and padding at the bottom/right keeps
        # pixel coordinates (hence allocate's stride-4 phase) exact.
        hp, wp = -(-h // 4) * 4, -(-w // 4) * 4
        if (hp, wp) != (h, w):
            depth_c = jnp.pad(depth_m, ((0, hp - h), (0, wp - w)))
            rgb_c = jnp.pad(rgb, ((0, hp - h), (0, wp - w), (0, 0)))
            cbits_c = jnp.pad(cbits_i, ((0, hp - h), (0, wp - w)))
            dbits_c = jnp.pad(dbits_i, ((0, hp - h), (0, wp - w)))
        else:
            depth_c, rgb_c, cbits_c, dbits_c = depth_m, rgb, cbits_i, dbits_i

        def crop_one(j):
            bb = copy_bbox[j]
            u0 = jnp.clip(
                ((bb[0] + bb[2]) * 0.5).astype(jnp.int32) - CW // 2,
                0, wp - CW,
            )
            v0 = jnp.clip(
                ((bb[1] + bb[3]) * 0.5).astype(jnp.int32) - CH // 2,
                0, hp - CH,
            )
            u0 = (u0 // 4) * 4
            v0 = (v0 // 4) * 4
            dpc = jax.lax.dynamic_slice(depth_c, (v0, u0), (CH, CW))
            rgbc = jax.lax.dynamic_slice(rgb_c, (v0, u0, 0), (CH, CW, 3))
            bitc = jax.lax.dynamic_slice(cbits_c, (v0, u0), (CH, CW))
            dbitc = jax.lax.dynamic_slice(dbits_c, (v0, u0), (CH, CW))
            # sequential-cut exclusivity: pixels an EARLIER removing
            # slot's delete mask covers were already deleted when the
            # staged path reached this track's copy
            earlier = (dbitc & rem_bits & ((1 << j) - 1)) != 0
            selc = (((bitc >> j) & 1) == 1) & (action[j] == ACTION_CUT) \
                & ~earlier
            return (
                jnp.where(selc, dpc, 0.0),
                jnp.where(selc[..., None], rgbc, jnp.uint8(0)),
                jnp.stack([u0, v0]),
            )

        new_pending_depth, new_pending_rgb, new_pending_org = \
            jax.vmap(crop_one)(jidx)

    # --- fuse LAST frame's pending views into the pooled volumes ---------
    # vmapped over the S slots: 6.3x faster than an unrolled slot loop on
    # TPU (140.7 -> 22.3 ms standalone; batches the allocate scatters and
    # the Pallas fusion grids) with bit-identical pool contents, verified
    # on hardware
    if "instances" in profile_skip:
        inst, inst_fidx = carry.inst, carry.inst_fidx
        inst_nvox = jnp.zeros((S,), jnp.int32)
    else:
        fresh = tsdf.create_state(icfg)
        src_c = jnp.clip(slot_src, 0, K - 1)
        if fuse_from_prev:
            fd = carry.prev_pending_depth
            fr = carry.prev_pending_rgb
            fo = carry.prev_pending_org
        else:
            fd = carry.pending_depth
            fr = carry.pending_rgb
            fo = carry.pending_org
        inst, inst_fidx, inst_nvox = jax.vmap(
            lambda st, fx, d, rgb, o, p, a, rs, rw: _fuse_one_instance(
                icfg, use_pallas, fresh, st, fx, d, rgb, o, intr_vec, p,
                a, rs, rw, inst_decay, max_decay_weight, min_decay_age,
            )
        )(
            carry.inst, carry.inst_fidx,
            fd[src_c], fr[src_c], fo[src_c],
            fuse_pose, slot_src >= 0, slot_reset, slot_reap_w,
        )

    # --- static mapping on the CUT view (allocate+fuse+raycast+decay) -----
    R = pose_w2c[:3, :3]
    t = pose_w2c[:3, 3]
    c2w = jnp.eye(4, dtype=jnp.float32)
    c2w = c2w.at[:3, :3].set(R.T)
    c2w = c2w.at[:3, 3].set(-R.T @ t)

    origin_new = tsdf.compute_origin(cfg, c2w)
    keep = jnp.all(jnp.abs(origin_new - carry.origin) <= 4) \
        & (carry.frame_idx > 1) & jnp.bool_(not decay_enabled)
    origin = jnp.where(keep, carry.origin, origin_new)
    grid = jax.lax.cond(
        keep,
        lambda s: carry.grid,
        lambda s: tsdf.build_local_grid(cfg, s, origin),
        carry.state,
    )
    state, grid, (n_new, n_drop) = tsdf.allocate(
        cfg, carry.state, grid, origin, depth_cut, c2w, carry.frame_idx
    )
    slots, mask = tsdf.visible_blocks(cfg, state, grid, origin, pose_w2c)
    if "integrate" in profile_skip:
        pass  # cost attribution only: fuse nothing this frame
    elif use_pallas:
        from dynslam_tpu.ops.pallas_integrate import integrate_pallas

        state = integrate_pallas(
            cfg, state, slots, mask, rgb_cut, depth_cut, pose_w2c,
            carry.frame_idx,
        )
    else:
        state = tsdf.integrate(
            cfg, state, slots, mask, rgb_cut, depth_cut, pose_w2c,
            carry.frame_idx,
        )
    if "raycast" in profile_skip:
        rc = tsdf.Raycast(
            depth=jnp.zeros((h, w), jnp.float32),
            points=jnp.zeros((h, w, 3), jnp.float32),
            color=jnp.zeros((h, w, 3), jnp.uint8),
            weight=jnp.zeros((h, w), jnp.float32),
            hit=jnp.zeros((h, w), bool),
            march_samples=jnp.int32(0),
        )
    elif use_pallas:
        from dynslam_tpu.ops.pallas_raycast import raycast_tiled

        rc = raycast_tiled(cfg, state, slots, mask, origin, c2w, intr_vec)
    else:
        rc = tsdf.raycast(cfg, state, grid, origin, c2w, intr_vec)

    next_idx = carry.frame_idx + 1
    if decay_enabled:
        state, n_freed = tsdf.decay(
            cfg, state, next_idx, max_decay_weight, min_decay_age
        )
    else:
        n_freed = jnp.int32(0)

    carry2 = FusedDynCarry(
        state=state,
        pose_w2c=pose_w2c,
        held_motion=held,
        prev_l=cur_l,
        prev_r=cur_r,
        prev_lg=left_gray,
        prev_rg=right_gray,
        frame_idx=next_idx,
        dropped=carry.dropped + n_drop,
        origin=origin,
        grid=grid,
        prev_rc_points=rc.points,
        prev_rc_hit=rc.hit,
        inst=inst,
        inst_fidx=inst_fidx,
        pending_depth=new_pending_depth,
        pending_rgb=new_pending_rgb,
        pending_org=new_pending_org,
        prev_pending_depth=carry.pending_depth,
        prev_pending_rgb=carry.pending_rgb,
        prev_pending_org=carry.pending_org,
    )
    sync = (
        rc.depth[::64, ::64].sum()
        + n_freed.astype(jnp.float32)
        + est.num_inliers.astype(jnp.float32)
        + pose_w2c[2, 3]
        + jnp.sum(obj_tr)
        + jnp.sum(inst_fidx).astype(jnp.float32)
        + new_pending_depth[:, ::64, ::64].sum()
    )
    packed = jnp.concatenate([
        sync[None],
        est.success.astype(jnp.float32)[None],
        est.num_inliers.astype(jnp.float32)[None],
        held.reshape(-1),
        pose_w2c.reshape(-1),
        n_new.astype(jnp.float32)[None],
        n_freed.astype(jnp.float32)[None],
        (carry.dropped + n_drop).astype(jnp.float32)[None],
        obj_tr.reshape(-1),
        obj_success.astype(jnp.float32),
        obj_inliers.astype(jnp.float32),
        obj_count.astype(jnp.float32),
        (jnp.sum(mask.astype(jnp.int32)) * 512
         + jnp.sum(inst_nvox)).astype(jnp.float32)[None],
        (rc.march_samples if rc.march_samples is not None
         else jnp.int32(0)).astype(jnp.float32)[None],
        (jnp.sum(state.valid.astype(jnp.int32)) - 1
         ).astype(jnp.float32)[None],
        state.decayed_blocks.astype(jnp.float32)[None],
    ])
    outs = FusedDynOutputs(
        raycast=rc, depth_m=depth_m, pose_w2c=pose_w2c, packed=packed
    )
    return carry2, outs


class _SlotHandle:
    """Track.reconstruction adapter over one pooled slot of the fused
    dynamic carry (the role PooledVolume plays for the staged path).
    Mutations (reset/reap) are SCHEDULED into the next dispatch's routing
    instead of executing immediately."""

    def __init__(self, pipeline: "FusedDynamicPipeline", slot: int):
        self.pipeline = pipeline
        self.slot = slot
        self.fused_frames = 0

    @property
    def cfg(self):
        return self.pipeline.icfg

    @property
    def state(self):
        return jax.tree_util.tree_map(
            lambda x: x[self.slot], self.pipeline.carry.inst
        )

    def reset(self) -> None:
        if self.pipeline.verbose_tracker:
            print(f"[tracker] slot {self.slot}: RESET routed",
                  file=sys.stderr)
        self.pipeline._route_reset[self.slot] = True
        self.fused_frames = 0

    def reap(self, max_weight: float) -> None:
        if self.pipeline.verbose_tracker:
            print(f"[tracker] slot {self.slot}: REAP w<={max_weight}",
                  file=sys.stderr)
        self.pipeline._route_reap[self.slot] = float(max_weight)

    def release(self) -> None:
        self.pipeline._free_slots.append(self.slot)

    def get_raycast(self, cam_to_world) -> tsdf.Raycast:
        return self.pipeline.raycast_instance(self.slot, cam_to_world)

    def get_used_block_count(self) -> int:
        return int(tsdf.memory_stats(self.pipeline.icfg, self.state)[0])


class FusedDynamicPipeline:
    """Host wrapper: one device dispatch per frame + the exact reference
    tracker running behind on the packed output fetch.

    `dispatch_lag` picks the host<->device protocol:
    - 1: fetch frame k-1's packed outputs BEFORE dispatching frame k
      (tracker decisions one frame stale). The device idles for the
      fetch's residual latency each frame.
    - 2 (default — measured +2.1 FPS on hardware, r4): dispatch frame k
      FIRST, then fetch/process k-1 — the device never idles; tracker
      decisions (cut/remove actions, slot lifecycle) go one frame
      staler and each cut view fuses one dispatch later (the pending
      buffer is two deep). The speculative Uncertain-cut keeps
      transition frames' views; steady-state reconstruction matches
      lag 1 (tests pin it).
    """

    def __init__(
        self,
        config: DynSlamConfig,
        calib: StereoCalibration,
        use_pallas: Optional[bool] = None,
        seed: int = 0,
        dispatch_lag: int = 2,
    ):
        assert dispatch_lag in (1, 2)
        self.dispatch_lag = dispatch_lag
        from dynslam_tpu.pipeline.mapping import engine_config_from

        self.config = config
        self.cfg = engine_config_from(config)
        imp = config.instance_map
        self.icfg = tsdf.TsdfConfig(
            pool_capacity=imp.blocks_per_object,
            local_dims=imp.local_dims,
            max_new_blocks=imp.max_new_blocks_per_frame,
            max_visible_blocks=min(imp.blocks_per_object,
                                   imp.max_new_blocks_per_frame * 2),
            voxel_size=imp.voxel_size_m,
            mu=imp.mu_m,
            max_weight=float(imp.max_weight),
            min_depth=config.min_depth_m,
            max_depth=config.max_depth_m,
            use_depth_weighting=config.map.use_depth_weighting,
            raycast_coarse_steps=imp.raycast_coarse_steps,
            raycast_fine_steps=imp.raycast_fine_steps,
            width=config.frame_width,
            height=config.frame_height,
            fx=config.intrinsics.fx,
            fy=config.intrinsics.fy,
            cx=config.intrinsics.cx,
            cy=config.intrinsics.cy,
        )
        #: fusion variant of the instance config: frame dims = the crop
        #: (visible_blocks' frustum test runs in crop pixel space); the
        #: full-frame self.icfg stays the render/preview config
        self.crop_h = min(imp.fusion_crop[0], config.frame_height)
        self.crop_w = min(imp.fusion_crop[1], config.frame_width)
        self.icfg_fuse = dataclasses.replace(
            self.icfg, width=self.crop_w, height=self.crop_h
        )
        #: eval-render viewport (render_instance_crop): same crop dims;
        #: None when the crop would be the whole frame anyway
        self.icfg_render = (
            self.icfg_fuse
            if (self.crop_h, self.crop_w)
            != (config.frame_height, config.frame_width) else None
        )
        self.stereo_params = config.stereo
        self.vo_params = config.vo
        self.obj_params = dataclasses.replace(
            config.vo,
            ransac_iters=config.tracker.object_ransac_iters,
            irls_rounds=config.tracker.object_irls_rounds,
            gn_iters=config.tracker.object_gn_iters,
        )
        self.decay_params = config.decay
        # K mask slots (cut/remove/RANSAC) vs S volume slots: the
        # reference removes every possibly-dynamic detection from the
        # view even when it never reconstructs it, so K >= S by default
        self.K = min(max(imp.max_detections, imp.max_objects), 32)
        self.S = imp.max_objects
        self._layout, self._packed_len = pack_layout(self.K)
        self._route_layout_cache = route_layout(self.K, self.S)
        if use_pallas is None:
            use_pallas = jax.default_backend() not in ("cpu",)
        self.use_pallas = use_pallas
        self.calib_vec = jnp.asarray(
            [self.cfg.fx, self.cfg.cx, self.cfg.cy, calib.baseline_m],
            jnp.float32,
        )
        self.intr_vec = jnp.asarray(
            [self.cfg.fx, self.cfg.fy, self.cfg.cx, self.cfg.cy], jnp.float32
        )
        self.bf = jnp.float32(calib.bf)
        self.base_key = jax.random.PRNGKey(seed)

        self.tracker = InstanceTracker(config.tracker)
        #: per-frame state-transition / reset / reap logging (debug)
        self.verbose_tracker = False
        #: cost-attribution knob (scripts/profile_dynamic.py only)
        self.profile_skip: tuple = ()
        self._free_slots: List[int] = list(range(self.S))
        self.carry: Optional[FusedDynCarry] = None
        self.last_outputs: Optional[FusedDynOutputs] = None
        self.current_frame_no = 0
        self.pose_history: List[np.ndarray] = [np.eye(4, dtype=np.float32)]
        #: dispatch metadata for the deferred tracker pass:
        #: (frame_no, [(mask_slot_j, track), ...], {track_id: pending_j})
        self._dispatch_meta = None
        self._packed_prefetch = None
        self._reset_routing()
        self._dropped_detections = 0
        #: packed-output background fetches that failed and fell back to
        #: a synchronous retry (each one stalls the device for the fetch)
        self.failed_prefetches = 0
        #: cut masks whose bbox exceeded the fusion crop (each either
        #: full-frame-fallback fused or truncated, per
        #: instance_map.oversize_mask_fallback)
        self.oversize_masks = 0
        #: cumulative copy-mask pixels LOST to crop truncation (nonzero
        #: only with oversize_mask_fallback=False)
        self.truncated_pixels = 0
        #: eval.fused_eval.FusedEvaluation (set by the app when
        #: --enable_evaluation; the reference evaluates INSIDE the
        #: per-frame loop, DynSlam.cpp:154-161)
        self.evaluation = None
        #: staged eval payload for the last tracker-finished frame,
        #: dispatched once the instance volumes include that frame
        self._eval_pending = None
        #: frames past this index are finalize()'s fusion-only replays —
        #: never evaluated
        self._final_frame = None

    # ------------------------------------------------------------------
    def _reset_routing(self) -> None:
        S = self.S
        self._route_src = np.full(S, -1, np.int32)
        self._route_pose = np.tile(np.eye(4, dtype=np.float32), (S, 1, 1))
        self._route_reset = np.zeros(S, bool)
        self._route_reap = np.zeros(S, np.float32)

    def _fresh_carry(self, lg, rg) -> FusedDynCarry:
        prev_l, prev_r = feat_ops.detect_features_pair(
            lg, rg, self.vo_params
        )
        dx, dy, dz = self.cfg.local_dims
        h, w = self.cfg.height, self.cfg.width
        one = tsdf.create_state(self.icfg)
        inst = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(
                x[None], (self.S,) + x.shape
            ).copy(),
            one,
        )
        return FusedDynCarry(
            state=tsdf.create_state(self.cfg),
            pose_w2c=jnp.eye(4, dtype=jnp.float32),
            held_motion=jnp.eye(4, dtype=jnp.float32),
            prev_l=prev_l,
            prev_r=prev_r,
            prev_lg=lg,
            prev_rg=rg,
            frame_idx=jnp.int32(1),
            dropped=jnp.int32(0),
            origin=jnp.full((3,), 1 << 20, jnp.int32),
            grid=jnp.full((dx * dy * dz,), -1, jnp.int32),
            prev_rc_points=jnp.zeros((h, w, 3), jnp.float32),
            prev_rc_hit=jnp.zeros((h, w), bool),
            inst=inst,
            inst_fidx=jnp.zeros(self.S, jnp.int32),
            pending_depth=jnp.zeros(
                (self.K, self.crop_h, self.crop_w), jnp.float32
            ),
            pending_rgb=jnp.zeros(
                (self.K, self.crop_h, self.crop_w, 3), jnp.uint8
            ),
            pending_org=jnp.zeros((self.K, 2), jnp.int32),
            prev_pending_depth=jnp.zeros(
                (self.K, self.crop_h, self.crop_w), jnp.float32
            ),
            prev_pending_rgb=jnp.zeros(
                (self.K, self.crop_h, self.crop_w, 3), jnp.uint8
            ),
            prev_pending_org=jnp.zeros((self.K, 2), jnp.int32),
        )

    # ------------------------------------------------------------------
    @staticmethod
    def select_detections(
        detections: List[InstanceDetection], k: int
    ) -> List[InstanceDetection]:
        """Possibly-dynamic detections, largest-first capped at the K mask
        slots (deterministic, so bench callers can precompute bitmaps)."""
        cands = [d for d in detections if d.is_possibly_dynamic()]
        if len(cands) > k:
            cands.sort(key=lambda d: d.copy_mask.bbox.area, reverse=True)
            cands = cands[:k]
        return cands

    @staticmethod
    def pack_mask_bits(
        detections: List[InstanceDetection], h: int, w: int, k: int = 8
    ) -> "tuple[np.ndarray, np.ndarray]":
        """(delete_bits, copy_bits) bit-planes for ALREADY-selected
        detections (bit j = slot j): the NARROWEST dtype that fits the
        occupied slots — uint8 up to 8 detections, uint16 to 16, uint32
        to the hard ceiling of 32. Slots past len(detections) carry no
        bits and are gated off by action/mask_gate, so the dtype follows
        the frame's detection count, not K: a typical (<= 8 car) frame
        uploads half/quarter the bytes, and jit specializes the step per
        plane dtype (at most 3 executables; each busier tier compiles
        once on first use). Action-independent — the device applies the
        per-slot action gates — so these are precomputable."""
        assert k <= 32, "mask bit-planes support at most 32 slots"
        n = min(len(detections), k)
        dt = np.uint8 if n <= 8 else (np.uint16 if n <= 16 else np.uint32)
        delete_bits = np.zeros((h, w), dt)
        copy_bits = np.zeros((h, w), dt)
        for j, det in enumerate(detections):
            delete_bits |= (
                det.delete_mask.to_full_frame(h, w).astype(dt) << dt(j)
            )
            if det.is_reconstructable():
                copy_bits |= (
                    det.copy_mask.to_full_frame(h, w).astype(dt) << dt(j)
                )
        return delete_bits, copy_bits

    def process_frame(
        self,
        left_gray,
        right_gray,
        rgb=None,
        detections: Optional[List[InstanceDetection]] = None,
        masks_dev=None,
    ) -> None:
        """One frame. `detections` = this frame's instance segmentation
        (host data; the reference reads MNC dumps, DynSlam.cpp:121-133).
        `masks_dev` optionally supplies pre-uploaded (delete_bits,
        copy_bits) device arrays for the SAME `select_detections` subset
        (bench path: mask rasterization/upload precomputed, like the
        reference's precomputed MNC dumps)."""
        detections = detections or []
        lg = jnp.array(left_gray, jnp.float32, copy=True)
        rg = jnp.array(right_gray, jnp.float32, copy=True)
        if rgb is None:
            rgb = jnp.broadcast_to(
                jnp.clip(lg, 0, 255).astype(jnp.uint8)[..., None],
                (*lg.shape, 3),
            )
        else:
            rgb = jnp.asarray(rgb, jnp.uint8)

        if self.carry is None:
            # frame 0: features only — no flow yet, so the staged path
            # skips instance processing too (dynslam.py:154-160). Frame
            # 0's pose is identity (staged convention: pose_history[k+1]
            # = frame k's pose, index 0 = identity prior, DynSlam.h:213)
            self.carry = self._fresh_carry(lg, rg)
            self.pose_history.append(np.eye(4, dtype=np.float32))
            self.current_frame_no = 1
            return

        # 1. deferred tracker pass on the previous frame's outputs
        # (dispatch_lag=2 defers it until AFTER this frame's dispatch so
        # the device never waits on the fetch)
        if self.dispatch_lag == 1:
            self._finish_prev()

        frame_no = self.current_frame_no
        h, w = self.cfg.height, self.cfg.width

        # 2. associate this frame's detections (bbox/class only,
        # Track.cpp:17-71 needs no flow)
        n_dyn = sum(1 for d in detections if d.is_possibly_dynamic())
        dropped_now = max(0, n_dyn - self.K)
        self._dropped_detections += dropped_now
        if dropped_now:
            # never silent (VERDICT r3): the K mask slots keep the
            # largest detections; the reference processes every one
            print(f"[frame {frame_no}: {dropped_now} detections over the "
                  f"{self.K} mask slots dropped (largest-first kept)]",
                  file=sys.stderr)
        cands = self.select_detections(detections, self.K)
        new_frames = [
            TrackFrame(
                frame_idx=frame_no,
                detection=det,
                masked_flow=np.zeros((0, 8), np.float32),
                camera_pose=self.pose_history[-1],
            )
            for det in cands
        ]
        self.tracker.process_instance_views(frame_no, new_frames)

        # 3. per-slot actions from the CURRENT (frame k-1-updated) states
        assoc = []
        pending_j: Dict[int, int] = {}
        copy_bbox = np.zeros((self.K, 4), np.float32)
        mask_gate = np.zeros(self.K, bool)
        warm_tr = np.zeros((self.K, 6), np.float32)
        action = np.zeros(self.K, np.int32)
        #: copy-mask pixels the (CH, CW) fusion crop would lose, per slot
        #: (host bbox check; nonzero only for oversized masks)
        trunc_px = np.zeros(self.K, np.int64)
        always = self.config.always_reconstruct_objects
        for j, tf in enumerate(new_frames):
            track = self._track_of_frame(tf)
            det = tf.detection
            assoc.append((j, track, tf, len(track.frames) - 1))
            bb = det.copy_mask.bbox
            copy_bbox[j] = (bb.x0, bb.y0, bb.x1, bb.y1)
            mask_gate[j] = True
            # warm start from the latest frame with a known twist (at
            # lag 2 the immediately-previous frame's update is pending)
            for f in reversed(track.frames[:-1]):
                if f.relative_pose_tr is not None:
                    warm_tr[j] = f.relative_pose_tr
                    break
            if track.state == TrackState.UNCERTAIN:
                # SPECULATIVE cut for reconstructable classes: the view
                # removal is identical to ACTION_REMOVE (CUT implies
                # REMOVE on device), but the copy-mask crop lands in the
                # pending buffer so that IF the deferred tracker pass
                # certifies the track at this very frame (fresh state,
                # one fetch later), the transition frame's view still
                # fuses — eliminating the one-frame (lag 1) / two-frame
                # (lag 2) transition loss vs the staged path. Crops of
                # tracks that stay Uncertain are never routed to a slot
                # and simply age out of the pending buffer.
                if det.is_reconstructable():
                    act = ACTION_CUT
                elif det.is_possibly_dynamic():
                    act = ACTION_REMOVE
                else:
                    act = ACTION_KEEP
            elif track.state == TrackState.DYNAMIC or always:
                if det.is_reconstructable():
                    act = ACTION_CUT
                elif det.is_possibly_dynamic():
                    act = ACTION_REMOVE
                else:
                    act = ACTION_KEEP
            else:  # STATIC without always_separate: stays in the main view
                act = ACTION_KEEP
            action[j] = act
            if act == ACTION_CUT:
                pending_j[track.id] = j
                # oversized-mask check: would the bbox-centred fusion
                # crop lose copy-mask pixels? (the reference fuses the
                # full masked view whatever the size,
                # InstanceReconstructor.cpp:569-700). mask_exceeds_crop
                # is EXACTLY the device's crop-origin math (crop_one)
                # including the 4-aligned frame padding that lets
                # windows reach the bottom/right edges
                if self.mask_exceeds_crop(det, h, w):
                    hp, wp = -(-h // 4) * 4, -(-w // 4) * 4
                    u0 = min(max(int((bb.x0 + bb.x1) * 0.5)
                                 - self.crop_w // 2, 0), wp - self.crop_w)
                    v0 = min(max(int((bb.y0 + bb.y1) * 0.5)
                                 - self.crop_h // 2, 0), hp - self.crop_h)
                    u0 = (u0 // 4) * 4
                    v0 = (v0 // 4) * 4
                    full = det.copy_mask.to_full_frame(h, w)
                    inside = full[v0: v0 + self.crop_h,
                                  u0: u0 + self.crop_w].sum()
                    trunc_px[j] = int(full.sum()) - int(inside)

        if masks_dev is not None:
            delete_bits, copy_bits = masks_dev
        else:
            db, cb = self.pack_mask_bits(cands, h, w, self.K)
            # ONE upload for both bit-planes (each relay upload is ~5 ms)
            both = jnp.asarray(np.stack([db, cb]))
            delete_bits, copy_bits = both[0], both[1]

        # 4. dispatch (slot routing computed by _finish_prev); all small
        # per-frame host inputs travel in ONE packed f32 vector — each
        # separate host-memory argument costs a ~5 ms relay upload
        RL, total = self._route_layout_cache
        route = np.zeros(total, np.float32)

        def put(name, val):
            o, n = RL[name]
            route[o: o + n] = np.asarray(val, np.float32).ravel()

        put("copy_bbox", copy_bbox)
        put("mask_gate", mask_gate)
        put("warm_tr", warm_tr)
        put("action", action)
        put("slot_src", self._route_src)
        put("fuse_pose", self._route_pose)
        put("slot_reset", self._route_reset)
        put("slot_reap_w", self._route_reap)
        put("max_decay_weight", self.decay_params.max_decay_weight)
        put("min_decay_age", self.decay_params.min_decay_age)

        prev_meta = self._dispatch_meta
        prev_prefetch = self._packed_prefetch
        self.carry, self.last_outputs = fused_dynamic_step(
            self.cfg, self.icfg_fuse, self.stereo_params, self.vo_params,
            self.obj_params, self.use_pallas,
            self.decay_params.enabled
            and frame_no >= int(self.decay_params.min_decay_age),
            self.decay_params.enabled,
            self.K, self.S,
            self.carry, lg, rg, rgb,
            delete_bits, copy_bits, jnp.asarray(route),
            self.calib_vec, self.intr_vec, self.bf,
            self.base_key,
            profile_skip=self.profile_skip,
            fuse_from_prev=self.dispatch_lag == 2,
        )
        self._dispatch_meta = (
            frame_no, assoc, pending_j, detections, self.last_outputs,
            # oversized-mask fallback inputs: per-slot truncation counts,
            # the dispatch's action vector + selected detections (for the
            # exclusive full-frame mask), and the frame's device rgb
            {"trunc_px": trunc_px, "action": action, "cands": cands,
             "rgb": rgb, "copy_bits": copy_bits},
        )
        self._reset_routing()
        self.current_frame_no += 1
        self._start_packed_prefetch()
        # flush the staged eval BEFORE the lag-2 deferred pass below can
        # stage the next frame's payload over it (its render needed this
        # dispatch's instance fusions, which have now been issued)
        self._flush_eval()
        if self.dispatch_lag == 2 and prev_meta is not None:
            # now (device already busy with frame k) fetch + process
            # frame k-1; its routing lands in the NEXT dispatch, which
            # fuses the matching prev_pending buffer
            self._finish_one(prev_meta, prev_prefetch)

    @staticmethod
    def _exclusive_copy_mask(extra, j) -> np.ndarray:
        """Slot j's full-frame copy mask minus earlier removing slots'
        delete masks — the sequential-cut exclusivity the device's
        crop_one applies (ProcessSilhouette_CPU order,
        InstanceReconstructor.cpp:59-170). Host-side; oversized-mask
        fallback path only."""
        cands, action = extra["cands"], extra["action"]
        det = cands[j]
        h, w = extra["rgb"].shape[:2]
        full = det.copy_mask.to_full_frame(h, w).astype(bool)
        for i in range(j):
            if action[i] >= ACTION_REMOVE:
                full &= ~cands[i].delete_mask.to_full_frame(h, w
                                                            ).astype(bool)
        return full

    def _fuse_slot_fullframe(self, slot, depth_dev, rgb_dev, mask_np,
                             chain, reset) -> None:
        """Dispatch the full-frame fallback fusion for one slot and swap
        the updated instance pool into the carry (the buffers are donated
        to the executable)."""
        inst2, fidx2 = fuse_slot_fullframe(
            self.icfg, self.use_pallas, self.decay_params.enabled,
            self.carry.inst, self.carry.inst_fidx, jnp.int32(slot),
            depth_dev, rgb_dev, jnp.asarray(mask_np),
            jnp.asarray(chain, jnp.float32), jnp.bool_(reset),
            self.intr_vec,
            jnp.float32(self.decay_params.max_decay_weight),
            jnp.int32(self.decay_params.min_decay_age),
        )
        self.carry = self.carry._replace(inst=inst2, inst_fidx=fidx2)

    def mask_exceeds_crop(self, det, h: int, w: int) -> bool:
        """Host coverage check of the bbox-centred fusion window —
        EXACTLY crop_one's origin math (4-aligned origins on the
        4-aligned padded frame). True = this mask would lose pixels to
        the crop and take the full-frame fallback. Shared by the
        per-frame dispatch accounting and bench.py's prewarm decision."""
        bb = det.copy_mask.bbox
        hp, wp = -(-h // 4) * 4, -(-w // 4) * 4
        u0 = min(max(int((bb.x0 + bb.x1) * 0.5) - self.crop_w // 2, 0),
                 wp - self.crop_w)
        v0 = min(max(int((bb.y0 + bb.y1) * 0.5) - self.crop_h // 2, 0),
                 hp - self.crop_h)
        u0 = (u0 // 4) * 4
        v0 = (v0 // 4) * 4
        return not (bb.x0 >= u0 and bb.x1 <= u0 + self.crop_w - 1
                    and bb.y0 >= v0 and bb.y1 <= v0 + self.crop_h - 1)

    def prewarm_oversize_fallback(self) -> None:
        """Compile the full-frame fallback fusion executable ahead of
        time (a no-op dispatch on a throwaway instance pool). Without
        this, the first oversized mask of a run pays the ~40 s TPU
        compile mid-sequence; bench.py calls it during warmup."""
        one = tsdf.create_state(self.icfg)
        inst = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x[None], (self.S,) + x.shape).copy(),
            one,
        )
        h, w = self.cfg.height, self.cfg.width
        inst2, fidx2 = fuse_slot_fullframe(
            self.icfg, self.use_pallas, self.decay_params.enabled,
            inst, jnp.zeros(self.S, jnp.int32), jnp.int32(0),
            jnp.zeros((h, w), jnp.float32),
            jnp.zeros((h, w, 3), jnp.uint8),
            jnp.zeros((h, w), bool),
            jnp.eye(4, dtype=jnp.float32), jnp.bool_(False),
            self.intr_vec,
            jnp.float32(self.decay_params.max_decay_weight),
            jnp.int32(self.decay_params.min_decay_age),
        )
        np.asarray(fidx2)  # force the compile (relay-honest sync)

    def _start_packed_prefetch(self) -> None:
        """Fetch this dispatch's packed vector on a background thread,
        IMMEDIATELY after dispatch. Through the TPU relay a fetch is one
        ~35 ms round trip that otherwise lands on the critical path:
        _finish_prev (start of the NEXT process_frame) must block on it
        before the next dispatch, leaving the device idle for the full
        round trip every frame. Issuing the RPC now lets it ride along
        the device's compute of this very frame; _finish_prev then joins
        an already-arrived value."""
        out = self.last_outputs.packed
        holder: Dict[str, np.ndarray] = {}

        def fetch():
            holder["v"] = np.asarray(out)

        th = threading.Thread(target=fetch, daemon=True)
        th.start()
        self._packed_prefetch = (th, holder, out)

    def _track_of_frame(self, tf: TrackFrame) -> Track:
        for track in self.tracker.active_tracks.values():
            if track.frames and track.frames[-1] is tf:
                return track
        raise AssertionError("frame not associated")

    # ------------------------------------------------------------------
    def _finish_prev(self) -> None:
        """Fetch the latest unfinished dispatch's packed outputs (the
        pipeline sync) and run the deferred tracker pass for it (lag-1
        per-frame entry point; also the finalize flush)."""
        if self._dispatch_meta is None:
            return
        meta = self._dispatch_meta
        pf = self._packed_prefetch
        self._dispatch_meta = None
        self._packed_prefetch = None
        fb = (self.last_outputs.packed
              if self.last_outputs is not None else None)
        self._finish_one(meta, pf, fb)
        if self.dispatch_lag == 1:
            self.last_outputs = None

    def _finish_one(self, meta, prefetch, fallback_packed=None) -> None:
        """The reference tracker logic for one finished frame:
        Track.update with the device-estimated motions, then the
        ProcessReconstructions bookkeeping (InstanceReconstructor.cpp:
        315-361) that routes pending-view fusion into a later dispatch.
        Updates target the frame CAPTURED at dispatch time — at lag 2 a
        newer frame may already be associated on the same track."""
        frame_no, assoc, pending_j, dets_full, outputs, extra = meta
        if prefetch is not None:
            th, holder, out = prefetch
            th.join()
            # a failed background fetch (transient relay error) falls
            # back to a synchronous fetch instead of crashing the frame
            # — loudly, so a systematically failing fetch thread (which
            # stalls the device every frame) leaves a trace
            packed = holder.get("v")
            if packed is None:
                self.failed_prefetches += 1
                print(f"[WARNING: packed-output prefetch failed for "
                      f"frame {frame_no}; retrying synchronously]",
                      file=sys.stderr)
                packed = np.asarray(out)
        elif fallback_packed is not None:
            packed = np.asarray(fallback_packed)
        else:
            return
        L = self._layout

        def get(name):
            o, n = L[name]
            return packed[o: o + n]

        delta = get("delta").reshape(4, 4)
        egomotion = np.linalg.inv(delta).astype(np.float32)
        pose = get("pose").reshape(4, 4).astype(np.float32)
        self.pose_history.append(pose)
        self.last_egomotion = egomotion
        self.last_vo_success = bool(get("vo_success")[0] > 0.5)
        self.last_vo_inliers = int(get("vo_inliers")[0])
        obj_tr = get("obj_tr").reshape(self.K, 6)
        obj_success = get("obj_success") > 0.5
        obj_count = get("obj_count").astype(int)
        self.last_fused_voxels = int(get("fused_voxels")[0])
        self.last_march_samples = int(get("march_samples")[0])

        min_flow = self.config.tracker.min_flow_vectors
        for j, track, tf, _idx in assoc:
            if track.id not in self.tracker.tracks:
                continue  # pruned since dispatch (lag-2 ordering)
            # association ran pre-dispatch when this frame's pose was not
            # yet known; patch it in now (the staged path sets it from
            # get_current_pose() after VO, reconstructor.py:113-122)
            tf.camera_pose = pose
            if obj_success[j] and obj_count[j] >= min_flow:
                T = se3.np_twist_to_transform(obj_tr[j])
                tf.precomputed_motion = (T, obj_tr[j].copy())
            else:
                tf.precomputed_motion = (None, None)
            old_state = track.state
            track.update(egomotion, None, frame=tf)
            if self.verbose_tracker and track.state != old_state:
                print(f"[tracker] frame {frame_no} track {track.id}: "
                      f"{old_state.value} -> {track.state.value} "
                      f"(flow {int(obj_count[j])}, "
                      f"ok {bool(obj_success[j])})", file=sys.stderr)

        # ProcessReconstructions, with fusion routed into a later
        # dispatch instead of staged engines
        fmap = {track.id: (j, tf, idx) for j, track, tf, idx in assoc}
        for track in list(self.tracker.active_tracks.values()):
            ent = fmap.get(track.id)
            det_frame = ent[1] if ent is not None else (
                track.frames[-1] if track.frames else None
            )
            if det_frame is None or \
                    not det_frame.detection.is_reconstructable():
                continue
            if ent is None:
                # no detection at frame_no: the stale-track reap path.
                # (At lag 2 the track may already hold a NEWER frame, so
                # derive the gap from its last frame <= frame_no.)
                seen = [f.frame_idx for f in track.frames
                        if f.frame_idx <= frame_no]
                if not seen:
                    continue
                gap = frame_no - max(seen)
                if track.needs_cleanup and track.has_reconstruction() \
                        and gap >= 2:
                    track.reap_reconstruction()
                    track.needs_cleanup = False
                continue
            j, tf, idx = ent
            if not track.has_reconstruction():
                eligible = track.eligible_for_reconstruction() and (
                    track.state == TrackState.DYNAMIC
                    or (track.state == TrackState.STATIC
                        and self.config.always_reconstruct_objects)
                )
                if eligible and self._free_slots:
                    slot = self._free_slots.pop()
                    track.reconstruction = _SlotHandle(self, slot)
                    self._route_reset[slot] = True
            if track.has_reconstruction() and track.id in pending_j \
                    and track.state != TrackState.UNCERTAIN:
                chain = track.get_frame_pose(idx)
                if chain is not None:
                    slot = track.reconstruction.slot
                    jj = pending_j[track.id]
                    t_px = int(extra["trunc_px"][jj])
                    if t_px > 0:
                        self.oversize_masks += 1
                    if t_px > 0 and \
                            self.config.instance_map.oversize_mask_fallback:
                        # the crop would lose t_px mask pixels: fuse the
                        # FULL masked frame now via the fallback
                        # executable instead of routing the crop
                        reset = bool(self._route_reset[slot])
                        self._route_reset[slot] = False
                        print(f"[frame {frame_no}: slot {slot} mask "
                              f"exceeds the {self.crop_h}x{self.crop_w} "
                              f"fusion crop by {t_px} px -> full-frame "
                              f"fallback fusion]", file=sys.stderr)
                        self._fuse_slot_fullframe(
                            slot, outputs.depth_m, extra["rgb"],
                            self._exclusive_copy_mask(extra, jj),
                            chain, reset,
                        )
                    else:
                        if t_px > 0:
                            # fallback disabled: the fused volume LOSES
                            # these pixels this frame — counted + logged,
                            # never silent
                            self.truncated_pixels += t_px
                            print(f"[frame {frame_no}: slot {slot} mask "
                                  f"TRUNCATED by {t_px} px (fusion crop "
                                  f"{self.crop_h}x{self.crop_w}, "
                                  f"oversize_mask_fallback=False)]",
                                  file=sys.stderr)
                        self._route_src[slot] = jj
                        self._route_pose[slot] = chain.astype(np.float32)
                    track.reconstruction.fused_frames += 1
                    track.count_fused_frame()
                    track.needs_cleanup = True

        self.tracker.prune_tracks(frame_no)

        if self.evaluation is not None and (
            self._final_frame is None or frame_no <= self._final_frame
        ):
            self._stash_eval(
                frame_no, dets_full, outputs, pose,
                int(get("used_blocks")[0]), int(get("decayed_blocks")[0]),
                extra,
            )

    # ------------------------------------------------------------------
    def _stash_eval(self, frame_no, dets_full, outputs, pose_w2c,
                    used_blocks, decayed_blocks, extra=None) -> None:
        """Stage frame `frame_no`'s evaluation payload: the association
        map + per-slot instance render poses are host state as of this
        frame's tracker update; the render itself must wait until the
        dispatch that fuses this frame's cut views has run (lag
        dispatches later), so the instance volumes match what the
        reference evaluates (Evaluation.cpp:93-100 composited render
        AFTER the frame's fusion)."""
        from types import SimpleNamespace

        from dynslam_tpu.eval.evaluation import (
            ASSOC_DYNAMIC, ASSOC_SKIP, build_association_map,
        )

        h, w = self.cfg.height, self.cfg.width
        det_states = {}
        for track in self.tracker.active_tracks.values():
            for f in reversed(track.frames):
                if f.frame_idx <= frame_no:
                    det_states[id(f.detection)] = track.state
                    break
        pd = [d for d in (dets_full or [])
              if d.is_possibly_dynamic()]
        cb = extra.get("copy_bits") if extra is not None else None
        if cb is not None and len(pd) <= self.K:
            # device path: the copy-mask bit-planes uploaded for the step
            # ARE build_association_map's rasterization (bit j = det j in
            # original order when no slot overflow reordered them); only
            # the (K,) codes travel host->device
            codes = np.zeros(self.K, np.int8)
            for j, det in enumerate(pd):
                st = det_states.get(id(det))
                codes[j] = (
                    ASSOC_DYNAMIC
                    if det.is_reconstructable() and st is not None
                    and st != TrackState.UNCERTAIN
                    else ASSOC_SKIP
                )
            assoc = assoc_bits_to_map(cb, jnp.asarray(codes), self.K)
        else:
            assoc = build_association_map(
                h, w,
                SimpleNamespace(instance_detections=dets_full)
                if dets_full else None,
                self.tracker, det_states=det_states,
            )
        vol_c2w = np.tile(np.eye(4, dtype=np.float32), (self.S, 1, 1))
        active = np.zeros(self.S, bool)
        #: per-slot eval-render viewport origin (u0, v0), and whether the
        #: detection bbox (+motion margin) fits the crop — slots that
        #: don't (or tracks with no detection at this frame) render
        #: full-frame
        vol_org = np.zeros((self.S, 2), np.int32)
        vol_crop = np.zeros(self.S, bool)
        margin = min(48, self.crop_h // 4, self.crop_w // 4)
        for track in self.tracker.active_tracks.values():
            if not track.has_reconstruction() or not track.frames:
                continue
            idxs = [i for i, f in enumerate(track.frames)
                    if f.frame_idx <= frame_no]
            if not idxs:
                continue
            k = idxs[-1]
            chain = track.get_frame_pose(k)
            if chain is None:
                continue
            cam_pose = track.frames[k].camera_pose
            # p_view = pose_w2c @ C2W_k @ chain_k @ p_vol (composited
            # render poses, InstanceReconstructor.cpp:911-931)
            vol_w2c = pose_w2c @ np.linalg.inv(cam_pose) @ chain
            slot = track.reconstruction.slot
            vol_c2w[slot] = np.linalg.inv(vol_w2c).astype(np.float32)
            active[slot] = True
            if self.icfg_render is not None \
                    and track.frames[k].frame_idx == frame_no:
                bb = track.frames[k].detection.copy_mask.bbox
                ch, cw = self.crop_h, self.crop_w
                u0 = min(max(int((bb.x0 + bb.x1) * 0.5) - cw // 2, 0),
                         w - cw)
                v0 = min(max(int((bb.y0 + bb.y1) * 0.5) - ch // 2, 0),
                         h - ch)
                if (bb.x0 - margin >= u0 and bb.x1 + margin < u0 + cw
                        and bb.y0 - margin >= v0
                        and bb.y1 + margin < v0 + ch):
                    vol_org[slot] = (u0, v0)
                    vol_crop[slot] = True
        self.evaluation.log_tracker(
            frame_no, len(self.tracker.active_tracks), int(active.sum()),
            self._dropped_detections, self.oversize_masks,
            self.truncated_pixels,
        )
        self._eval_pending = (
            frame_no, outputs.raycast.depth, outputs.depth_m, assoc,
            vol_c2w, active, vol_org, vol_crop, used_blocks,
            decayed_blocks,
            frame_no + self.dispatch_lag,  # ready after this dispatch
        )

    def _flush_eval(self, force: bool = False) -> None:
        """Dispatch the staged frame's composited render + eval once the
        instance volumes include it (see _stash_eval); `force` renders
        with the volumes as-is (finalize, when no further dispatch will
        come)."""
        if self._eval_pending is None or self.evaluation is None:
            return
        (frame_no, rc_depth, depth_m, assoc, vol_c2w, active,
         vol_org, vol_crop, used_blocks, decayed_blocks,
         ready) = self._eval_pending
        last_dispatched = self.current_frame_no - 1
        if last_dispatched < ready and not force:
            return
        self._eval_pending = None
        rendered = rc_depth
        if active.any():
            from dynslam_tpu.instances.volume_pool import _raycast_batch
            from dynslam_tpu.ops import masks as mask_ops

            # crop-viewport renders for slots whose detection bbox (+
            # margin) fits the crop: the render cost follows the
            # object's screen area instead of the frame (the full-frame
            # path pays the whole tile grid per slot)
            fx, fy, cx, cy = (float(self.intr_vec[0]),
                              float(self.intr_vec[1]),
                              float(self.intr_vec[2]),
                              float(self.intr_vec[3]))
            for s in np.nonzero(active & vol_crop)[0]:
                u0, v0 = int(vol_org[s, 0]), int(vol_org[s, 1])
                intr4 = jnp.asarray(
                    [fx, fy, cx - u0, cy - v0], jnp.float32)
                crop = render_instance_crop(
                    self.icfg_render, self.use_pallas, self.carry.inst,
                    jnp.int32(s), jnp.asarray(vol_c2w[s]), intr4,
                )
                rendered = merge_crop_depth(
                    jnp.asarray(rendered), crop,
                    jnp.int32(v0), jnp.int32(u0),
                )

            # full-frame renders for the rest (oversize/stale-bbox
            # slots): raycast ONLY those slots, merge at the fixed S
            # lane count (padded) so the compositor never respecializes
            idx = np.nonzero(active & ~vol_crop)[0]
            if len(idx):
                states_a = jax.tree_util.tree_map(
                    lambda x: x[idx], self.carry.inst
                )
                rc_b = _raycast_batch(
                    self.icfg, self.use_pallas, len(idx), states_a,
                    jnp.asarray(vol_c2w[idx]),
                )
                h, w = rc_depth.shape
                depths = jnp.concatenate([
                    rc_b.depth,
                    jnp.zeros((self.S - len(idx), h, w),
                              rc_b.depth.dtype),
                ]) if len(idx) < self.S else rc_b.depth
                rendered = mask_ops.composite_depth_many(
                    jnp.asarray(rendered), depths,
                    jnp.arange(self.S) < len(idx),
                )
        self.evaluation.submit(
            frame_no, rendered, depth_m, assoc, used_blocks, decayed_blocks
        )

    # ------------------------------------------------------------------
    def finalize(self) -> None:
        """Flush the deferred tracker pass (and the final pending
        fusions) with fusion-only tail dispatches on a replay of the
        last frame's images (lag-2 needs two: the pending buffer is two
        deep)."""
        if self.carry is None or self._dispatch_meta is None:
            return
        # frames past the last real one are fusion-only replays — mark
        # them so the deferred tracker pass never evaluates them
        self._final_frame = self.current_frame_no - 1
        if self.dispatch_lag == 2:
            for _ in range(2):
                lg = self.carry.prev_lg
                rg = self.carry.prev_rg
                self.process_frame(np.asarray(lg), np.asarray(rg), None, [])
            self._finish_prev()
            self._flush_eval(force=True)
            if self.evaluation is not None:
                self.evaluation.drain()
            return
        self._finish_prev()
        if (self._route_src >= 0).any():
            # one fusion-only dispatch: empty masks, no detections
            lg = self.carry.prev_lg
            rg = self.carry.prev_rg
            self.process_frame(np.asarray(lg), np.asarray(rg), None, [])
            self._finish_prev()
        self._flush_eval(force=True)
        if self.evaluation is not None:
            self.evaluation.drain()

    # -- accessors ------------------------------------------------------
    def get_pose(self) -> np.ndarray:
        return np.asarray(self.carry.pose_w2c)

    def get_last_egomotion(self) -> np.ndarray:
        return getattr(
            self, "last_egomotion", np.eye(4, dtype=np.float32)
        )

    def get_used_block_count(self) -> int:
        return int(tsdf.memory_stats(self.cfg, self.carry.state)[0])

    def get_dropped_allocation_count(self) -> int:
        return int(self.carry.dropped)

    def get_dropped_detection_count(self) -> int:
        """Cumulative possibly-dynamic detections beyond the K mask slots
        (logged per frame; the reference processes every detection)."""
        return self._dropped_detections

    def reconstructed_objects(self) -> List[int]:
        """Track ids with a live reconstruction volume."""
        return [
            t.id for t in self.tracker.active_tracks.values()
            if t.has_reconstruction()
        ]

    def composited_preview(self) -> np.ndarray:
        """Static raycast color with per-track tinted instance renders
        z-merged in — the GUI's CompositeInstances role
        (InstanceReconstructor.cpp:933-990) for the fused path. Preview
        path only (serial per-track renders; the hot loop never
        composites)."""
        from dynslam_tpu.instances.reconstructor import PALETTE
        from dynslam_tpu.ops import masks as mask_ops

        rc = self.last_outputs.raycast
        out_color = jnp.asarray(rc.color)
        static_depth = jnp.asarray(rc.depth)
        view_w2c = np.asarray(self.carry.pose_w2c)
        for t in self.tracker.active_tracks.values():
            if not t.has_reconstruction() or not t.frames:
                continue
            k = len(t.frames) - 1
            chain = t.get_frame_pose(k)
            if chain is None:
                continue
            # p_view = view_w2c @ C2W_k @ chain_k @ p_vol
            cam_pose = t.frames[k].camera_pose
            vol_w2c = view_w2c @ np.linalg.inv(cam_pose) @ chain
            rc_i = self.raycast_instance(
                t.reconstruction.slot, np.linalg.inv(vol_w2c)
            )
            tint = jnp.asarray(
                PALETTE[t.id % len(PALETTE)], jnp.float32
            )
            out_color, static_depth = mask_ops.composite_color(
                out_color, static_depth, rc_i.color, rc_i.depth, tint
            )
        return np.asarray(out_color)

    def raycast_instance(self, slot: int, cam_to_world) -> tsdf.Raycast:
        """Render one pooled object volume (preview path)."""
        state = jax.tree_util.tree_map(lambda x: x[slot], self.carry.inst)
        c2w = jnp.asarray(cam_to_world, jnp.float32)
        origin = tsdf.compute_origin(self.icfg, c2w)
        grid = tsdf.build_local_grid(self.icfg, state, origin)
        intr = jnp.asarray(
            [self.icfg.fx, self.icfg.fy, self.icfg.cx, self.icfg.cy],
            jnp.float32,
        )
        if self.use_pallas:
            from dynslam_tpu.ops.pallas_raycast import raycast_tiled

            slots, mask = tsdf.visible_blocks(
                self.icfg, state, grid, origin, jnp.linalg.inv(c2w)
            )
            return raycast_tiled(
                self.icfg, state, slots, mask, origin, c2w, intr
            )
        return tsdf.raycast(self.icfg, state, grid, origin, c2w, intr)
