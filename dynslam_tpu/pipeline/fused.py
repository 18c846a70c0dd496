"""Single-dispatch fused frame step for the static-scene pipeline.

Each XLA dispatch through this environment's TPU relay costs ~6 ms of
host time; the staged MapEngine/SparseSFProvider path issues 15-20
executables per frame (~100 ms/frame of pure dispatch overhead — more
than half the frame budget at 5 FPS). This module traces the ENTIRE
static-scene per-frame pipeline — census stereo -> depth -> feature
detect / circular match / LK refine -> RANSAC egomotion -> pose chain
-> TSDF allocate + fuse -> full-frame raycast -> voxel decay — into ONE
jitted executable, so each frame costs exactly one dispatch and the
host stays a frame ahead of the device.

This is the per-frame loop of the reference's static mode
(/root/reference/src/DynSLAM/DynSlam.cpp:18-175 with dynamic_mode off);
dynamic mode keeps the staged path in pipeline/dynslam.py, which needs
host-side tracker decisions between device stages. All compute comes
from the same op modules the staged path uses (ops/stereo.py,
ops/features.py, ops/egomotion.py, ops/tsdf.py, the Pallas kernels) —
jit-of-jit inlines them into one trace, so numerical behavior is
identical by construction (tests/test_fused.py pins this).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dynslam_tpu.config import (
    StereoCalibration, StereoMatcherParams, VisualOdometryParams,
    VoxelDecayParams,
)
from dynslam_tpu.ops import depth as depth_ops
from dynslam_tpu.ops import egomotion as ego_ops
from dynslam_tpu.ops import features as feat_ops
from dynslam_tpu.ops import stereo as stereo_ops
from dynslam_tpu.ops import tsdf


class FusedCarry(NamedTuple):
    """Device-resident cross-frame state threaded through fused_step."""

    state: tsdf.TsdfState
    pose_w2c: jnp.ndarray  # (4, 4) world-to-camera (ITMPose convention)
    held_motion: jnp.ndarray  # (4, 4) last successful VO delta (coast on fail)
    prev_l: feat_ops.Features
    prev_r: feat_ops.Features
    prev_lg: jnp.ndarray  # (H, W) f32 previous left gray
    prev_rg: jnp.ndarray  # (H, W) f32 previous right gray
    frame_idx: jnp.ndarray  # i32 scalar
    dropped: jnp.ndarray  # i32 cumulative pool-full allocation drops
    origin: jnp.ndarray  # (3,) i32 local-window origin the grid is built for
    grid: jnp.ndarray  # (n_cells,) i32 persistent local index cache
    #: previous frame's model render (points world-frame + hit mask), the
    #: ICP fallback's reference (frame-to-model, InfiniTamDriver.h:120-124)
    prev_rc_points: jnp.ndarray  # (H, W, 3) f32
    prev_rc_hit: jnp.ndarray  # (H, W) bool


class FusedOutputs(NamedTuple):
    raycast: tsdf.Raycast
    depth_m: jnp.ndarray  # (H, W) f32 stereo depth of this frame
    pose_w2c: jnp.ndarray  # (4, 4) pose after this frame's VO delta
    vo_success: jnp.ndarray  # bool scalar
    vo_inliers: jnp.ndarray  # i32 scalar
    n_new_blocks: jnp.ndarray  # i32 scalar
    n_freed_blocks: jnp.ndarray  # i32 scalar
    #: i32 scalars MEASURED on device this frame (bench voxel-ops/s):
    #: voxels in blocks actually gated into fusion, and ray samples the
    #: raycast kernel actually marched (0 on the XLA raycast path)
    fused_voxels: jnp.ndarray
    march_samples: jnp.ndarray
    #: i32 scalars for the per-frame memory CSV (LogMemoryUse,
    #: Evaluation.h:234-243): post-decay allocated blocks + cumulative
    #: decayed blocks
    used_blocks: jnp.ndarray
    decayed_blocks: jnp.ndarray
    sync: jnp.ndarray  # f32 scalar depending on every stage — fetching it
    # (one ~35 ms relay round trip) is the reliable way to wait for the
    # frame: block_until_ready through the relay is both unreliable and
    # slow (~300 ms/call measured; CLAUDE.md trap 2)


def _refine_matches(lg, rg, prev_lg, prev_rg, flow, valid, params):
    """Compacted LK refinement — exact logic of
    SparseSFProvider.compute_sparse_sf (pipeline/sparse_sf.py:72-96)."""
    N = flow.shape[0]
    cap = min(params.refine_cap, N)
    if cap < N:
        (ridx,) = jnp.nonzero(valid, size=cap, fill_value=N)
        r_ok = ridx < N
        ridx_c = jnp.clip(ridx, 0, N - 1)
        refined = feat_ops.refine_flow_quad(
            lg, rg, prev_lg, prev_rg, flow[ridx_c]
        )
        flow = flow.at[jnp.where(r_ok, ridx, N)].set(refined, mode="drop")
        n_valid_rank = jnp.cumsum(valid.astype(jnp.int32))
        valid = valid & (n_valid_rank <= cap)
    else:
        flow = jnp.where(
            valid[:, None],
            feat_ops.refine_flow_quad(lg, rg, prev_lg, prev_rg, flow),
            flow,
        )
    return flow, valid


def motion_with_icp_fallback(est, carry, depth_m, intr_vec):
    """The frame's camera delta: sparse-VO when it succeeded, else ICP
    depth tracking against the previous frame's model render (the
    staged path's fallback, dynslam.py:106-134 / InfiniTamDriver.h:
    120-124), else coast on the held motion. The ICP branch only
    EXECUTES on VO-failure frames (lax.cond with small outputs), so
    success frames pay nothing."""

    def vo_branch(_):
        return est.matrix

    def icp_branch(_):
        from dynslam_tpu.ops.icp import icp_track

        res = icp_track(
            depth_m, carry.prev_rc_points, carry.prev_rc_hit,
            carry.pose_w2c, carry.held_motion @ carry.pose_w2c, intr_vec,
        )
        # delta = new_w2c @ old_c2w
        R = carry.pose_w2c[:3, :3]
        t = carry.pose_w2c[:3, 3]
        old_c2w = jnp.eye(4, dtype=jnp.float32)
        old_c2w = old_c2w.at[:3, :3].set(R.T)
        old_c2w = old_c2w.at[:3, 3].set(-R.T @ t)
        return jnp.where(
            res.success, res.world_to_cam @ old_c2w, carry.held_motion
        )

    return jax.lax.cond(est.success, vo_branch, icp_branch, None)


@partial(
    jax.jit,
    static_argnames=(
        "cfg", "stereo_params", "vo_params", "use_pallas", "decay_enabled",
    ),
    # the carry is consumed every frame: donating it lets XLA alias the
    # ~0.5 GB pool arrays into the outputs, so allocate/integrate/decay
    # scatter in place instead of copying the pool each frame. Callers
    # must never touch a carry after passing it (FusedPipeline rebinds).
    donate_argnames=("carry",),
)
def fused_step(
    cfg: tsdf.TsdfConfig,
    stereo_params: StereoMatcherParams,
    vo_params: VisualOdometryParams,
    use_pallas: bool,
    decay_enabled: bool,
    carry: FusedCarry,
    left_gray: jnp.ndarray,  # (H, W) f32
    right_gray: jnp.ndarray,  # (H, W) f32
    rgb: jnp.ndarray,  # (H, W, 3) uint8
    calib_vec: jnp.ndarray,  # (4,) fx, cu, cv, baseline (VO)
    intr_vec: jnp.ndarray,  # (4,) fx, fy, cx, cy (raycast)
    bf: jnp.ndarray,  # scalar baseline*focal
    max_decay_weight: jnp.ndarray,  # f32 scalar
    min_decay_age: jnp.ndarray,  # i32 scalar
    base_key: jnp.ndarray,  # PRNG key
):
    """One full frame: returns (carry', FusedOutputs)."""
    # --- stereo depth (ELAS-role census matcher) ------------------------
    disp = stereo_ops.compute_disparity_jit(left_gray, right_gray,
                                            stereo_params)
    depth_mm = depth_ops.depth_mm_from_disparity(
        disp, bf, cfg.min_depth, cfg.max_depth
    )
    depth_m = depth_ops.depth_m_from_mm(depth_mm)

    # --- sparse scene flow + egomotion (libviso2 role) -------------------
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
    pose_w2c = held @ carry.pose_w2c  # new = delta @ old (CLAUDE.md)

    # --- mapping: allocate + fuse + raycast + decay ----------------------
    R = pose_w2c[:3, :3]
    t = pose_w2c[:3, 3]
    c2w = jnp.eye(4, dtype=jnp.float32)
    c2w = c2w.at[:3, :3].set(R.T)
    c2w = c2w.at[:3, 3].set(-R.T @ t)

    # persistent local grid with origin hysteresis: keep the cached grid
    # (and its origin) while the camera stays within 4 blocks of the
    # anchor — allocate() keeps it incrementally fresh, so the O(P)
    # rebuild scatter only runs when the window actually moves. Decay
    # invalidates grid entries (freed slots), so any frame where decay
    # is traced in rebuilds unconditionally.
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
        cfg, carry.state, grid, origin, depth_m, c2w, carry.frame_idx
    )
    slots, mask = tsdf.visible_blocks(cfg, state, grid, origin, pose_w2c)
    if use_pallas:
        from dynslam_tpu.ops.pallas_integrate import integrate_pallas
        from dynslam_tpu.ops.pallas_raycast import raycast_tiled

        state = integrate_pallas(
            cfg, state, slots, mask, rgb, depth_m, pose_w2c, carry.frame_idx
        )
        rc = raycast_tiled(cfg, state, slots, mask, origin, c2w, intr_vec)
    else:
        state = tsdf.integrate(
            cfg, state, slots, mask, rgb, depth_m, pose_w2c, carry.frame_idx
        )
        rc = tsdf.raycast(cfg, state, grid, origin, c2w, intr_vec)

    next_idx = carry.frame_idx + 1
    if decay_enabled:
        state, n_freed = tsdf.decay(
            cfg, state, next_idx, max_decay_weight, min_decay_age
        )
    else:
        n_freed = jnp.int32(0)

    carry2 = FusedCarry(
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
    )
    sync = (
        rc.depth[::64, ::64].sum()
        + n_freed.astype(jnp.float32)
        + est.num_inliers.astype(jnp.float32)
        + pose_w2c[2, 3]
    )
    outs = FusedOutputs(
        raycast=rc,
        depth_m=depth_m,
        pose_w2c=pose_w2c,
        vo_success=est.success,
        vo_inliers=est.num_inliers,
        n_new_blocks=n_new,
        n_freed_blocks=n_freed,
        fused_voxels=jnp.sum(mask.astype(jnp.int32)) * 512,
        march_samples=(rc.march_samples if rc.march_samples is not None
                       else jnp.int32(0)),
        used_blocks=jnp.sum(state.valid.astype(jnp.int32)) - 1,
        decayed_blocks=state.decayed_blocks,
        sync=sync,
    )
    return carry2, outs


@partial(jax.jit, static_argnames=("vo_params",))
def _bootstrap_features(vo_params: VisualOdometryParams, left_gray, right_gray):
    return (
        *feat_ops.detect_features_pair(left_gray, right_gray, vo_params),
    )


class FusedPipeline:
    """Host wrapper: bootstrap on frame 0, one dispatch per frame after.

    Mirrors the bench/staged semantics: frame 0 only seeds features and
    the view (no fusion — there is no VO delta yet, matching
    DynSlam.cpp's first-frame handling); every later frame runs the full
    fused step. The carry never leaves the device; accessors sync lazily.
    """

    def __init__(
        self,
        cfg: tsdf.TsdfConfig,
        stereo_params: StereoMatcherParams,
        vo_params: VisualOdometryParams,
        decay_params: VoxelDecayParams,
        calib: StereoCalibration,
        use_pallas: Optional[bool] = None,
        seed: int = 0,
    ):
        self.cfg = cfg
        self.stereo_params = stereo_params
        self.vo_params = vo_params
        self.decay_params = decay_params
        # Origin hysteresis lets the camera drift up to 4 blocks from the
        # window anchor before the grid re-centers; the local window must
        # cover the view frustum at max_depth with that slack to spare or
        # leading-edge geometry would silently never be allocated
        # (ADVICE r2). compute_origin places the camera at 0.15*extent
        # from the rear face along the viewing direction.
        ext = np.asarray(cfg.local_dims, np.float64) * cfg.block_size
        slack = 4.0 * cfg.block_size
        horiz = min(ext[0], ext[2])
        fwd = 0.85 * horiz - slack
        lat = 0.5 * horiz - slack
        vert = 0.5 * ext[1] - slack
        need_lat = cfg.max_depth * max(cfg.cx, cfg.width - cfg.cx) / cfg.fx
        need_vert = cfg.max_depth * max(cfg.cy, cfg.height - cfg.cy) / cfg.fy
        assert fwd >= cfg.max_depth and lat >= need_lat and vert >= need_vert, (
            f"local_dims {cfg.local_dims} too small for max_depth "
            f"{cfg.max_depth} m + 4-block origin-hysteresis slack: forward "
            f"reach {fwd:.1f} m (need {cfg.max_depth:.1f}), lateral "
            f"{lat:.1f} m (need {need_lat:.1f}), vertical {vert:.1f} m "
            f"(need {need_vert:.1f})"
        )
        if use_pallas is None:
            use_pallas = jax.default_backend() not in ("cpu",)
        self.use_pallas = use_pallas
        self.calib_vec = jnp.asarray(
            [cfg.fx, cfg.cx, cfg.cy, calib.baseline_m], jnp.float32
        )
        self.intr_vec = jnp.asarray(
            [cfg.fx, cfg.fy, cfg.cx, cfg.cy], jnp.float32
        )
        self.bf = jnp.float32(calib.bf)
        self.base_key = jax.random.PRNGKey(seed)
        # device-resident once: fresh per-frame jnp scalars would each
        # cost a ~5 ms relay upload per dispatch
        self._mdw = jnp.float32(self.decay_params.max_decay_weight)
        self._mda = jnp.int32(self.decay_params.min_decay_age)
        self.carry: Optional[FusedCarry] = None
        self.last_outputs: Optional[FusedOutputs] = None

    def _fresh_carry(self, lg, rg) -> FusedCarry:
        prev_l, prev_r = _bootstrap_features(self.vo_params, lg, rg)
        dx, dy, dz = self.cfg.local_dims
        return FusedCarry(
            state=tsdf.create_state(self.cfg),
            pose_w2c=jnp.eye(4, dtype=jnp.float32),
            held_motion=jnp.eye(4, dtype=jnp.float32),
            prev_l=prev_l,
            prev_r=prev_r,
            prev_lg=lg,
            prev_rg=rg,
            frame_idx=jnp.int32(1),
            dropped=jnp.int32(0),
            # far-away origin sentinel: frame 1 always rebuilds
            origin=jnp.full((3,), 1 << 20, jnp.int32),
            grid=jnp.full((dx * dy * dz,), -1, jnp.int32),
            # empty model render: the ICP fallback can't associate, so
            # frame 1 falls through to the held motion automatically
            prev_rc_points=jnp.zeros((*lg.shape, 3), jnp.float32),
            prev_rc_hit=jnp.zeros(lg.shape, bool),
        )

    def process_frame(self, left_gray, right_gray, rgb=None) -> None:
        # static decay gate: no block can reach min_decay_age before
        # frame min_decay_age (alloc_frame >= 0), so the full-pool decay
        # pass is a provable no-op until then — trace it OUT of the
        # executable instead of paying its ~0.5 GB stream per frame.
        # (A traced lax.cond can't help: XLA copies the pool through the
        # untaken branch.) Costs one extra compile when the threshold is
        # first crossed.
        self._frames = getattr(self, "_frames", 0) + 1
        decay_on = self.decay_params.enabled and (
            self._frames >= int(self.decay_params.min_decay_age)
        )
        # COPY the inputs (never view them): the gray images become
        # carry.prev_lg/prev_rg, and the carry is donated — a view would
        # silently invalidate the CALLER'S arrays one frame later
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
            self.carry = self._fresh_carry(lg, rg)
            return
        self.carry, self.last_outputs = fused_step(
            self.cfg, self.stereo_params, self.vo_params, self.use_pallas,
            decay_on,
            self.carry, lg, rg, rgb, self.calib_vec, self.intr_vec, self.bf,
            self._mdw, self._mda,
            self.base_key,
        )

    # -- accessors (sync on use) ------------------------------------------
    def get_pose(self) -> np.ndarray:
        return np.asarray(self.carry.pose_w2c)

    def get_raycast(self) -> tsdf.Raycast:
        return self.last_outputs.raycast

    def get_used_block_count(self) -> int:
        return int(tsdf.memory_stats(self.cfg, self.carry.state)[0])

    def get_dropped_allocation_count(self) -> int:
        return int(self.carry.dropped)
