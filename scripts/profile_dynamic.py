#!/usr/bin/env python
"""Stage-level TPU profiling of the fused DYNAMIC step.

Times (a) the full fused_dynamic_step, (b) the vmapped instance-fusion
sub-step alone, (c) the vmapped per-mask object RANSAC alone, and (d)
the static fused_step on the same frames — so the dynamic-mode overhead
decomposes into measured parts instead of guesses.

Methodology per CLAUDE.md: chained carries + per-frame noisy images
defeat the relay's cross-process memoization; a dependent scalar fetch
at the end forces truth.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from bench import (  # noqa: E402
    H, W, N_FRAMES, detections_from_objid, render_frames_dynamic,
)
from dynslam_tpu.config import (  # noqa: E402
    DynSlamConfig, InstanceMapParams, Intrinsics, MapParams, SceneParams,
    StereoCalibration, StereoMatcherParams, VisualOdometryParams,
    VoxelDecayParams,
)
from dynslam_tpu.ops import egomotion as ego_ops  # noqa: E402
from dynslam_tpu.ops import tsdf  # noqa: E402
from dynslam_tpu.pipeline.fused_dynamic import (  # noqa: E402
    FusedDynamicPipeline, _fuse_one_instance,
)

REPS = 12


def timeit(name, fn, n=REPS):
    fn(0)  # compile + warm
    t0 = time.perf_counter()
    for i in range(n):
        out = fn(i + 1)
    float(np.asarray(out).ravel()[0])
    dt = (time.perf_counter() - t0) / n * 1000
    print(f"{name:38s} {dt:8.2f} ms")
    return dt


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr)
    left_np, right_np, objid = render_frames_dynamic()
    rng = np.random.default_rng()

    def noisy(a):
        return np.clip(
            a.astype(np.int16)
            + rng.integers(-1, 2, a.shape, dtype=np.int16), 0, 255,
        ).astype(np.uint8)

    intr = Intrinsics(707.0912, 707.0912, W / 2.0, 183.1104)
    calib = StereoCalibration(0.537150654273, 707.0912)
    cfg = DynSlamConfig(
        frame_width=W, frame_height=H, intrinsics=intr, calibration=calib,
        dynamic_mode=True,
        scene=SceneParams(voxel_size_m=0.05, mu_m=0.30),
        map=MapParams(pool_capacity=2 ** 17, local_dims=(160, 48, 160),
                      max_new_blocks_per_frame=8192),
        instance_map=InstanceMapParams(max_objects=4),
        stereo=StereoMatcherParams(max_disparity=128),
        vo=VisualOdometryParams(),
        decay=VoxelDecayParams(enabled=True, min_decay_age=200,
                               max_decay_weight=1),
    )
    engine = FusedDynamicPipeline(cfg, calib)
    dets = [
        engine.select_detections(detections_from_objid(objid[i]), engine.K)
        for i in range(N_FRAMES)
    ]
    masks_dev = []
    for i in range(N_FRAMES):
        db, cb = engine.pack_mask_bits(dets[i], H, W)
        masks_dev.append((jnp.asarray(db), jnp.asarray(cb)))

    # warm the pipeline so the carry holds a realistic map + live tracks
    for i in range(8):
        engine.process_frame(
            jnp.asarray(noisy(left_np[i]), jnp.float32),
            jnp.asarray(noisy(right_np[i]), jnp.float32),
            jnp.broadcast_to(
                jnp.asarray(left_np[i])[..., None], (H, W, 3)
            ),
            dets[i], masks_dev[i],
        )
    engine._finish_prev()
    carry = engine.carry
    print(f"warm: {len(engine.reconstructed_objects())} objects, "
          f"{engine.get_used_block_count()} static blocks", file=sys.stderr)

    # pre-upload noisy frame variants
    n_var = 6
    var = []
    for i in range(n_var):
        j = 8 + (i % (N_FRAMES - 8))
        var.append((
            jnp.asarray(noisy(left_np[j]), jnp.float32),
            jnp.asarray(noisy(right_np[j]), jnp.float32),
            jnp.broadcast_to(jnp.asarray(left_np[j])[..., None], (H, W, 3)),
            masks_dev[j],
        ))

    # ---- (a) full dynamic step (chained carry) -------------------------
    import dataclasses as dc

    from dynslam_tpu.pipeline.fused_dynamic import (
        fused_dynamic_step, route_layout,
    )

    K, S = engine.K, engine.S
    RL, total = route_layout(K, S)

    def build_route():
        route = np.zeros(total, np.float32)

        def put(name, val):
            o, n = RL[name]
            route[o: o + n] = np.asarray(val, np.float32).ravel()

        put("copy_bbox", np.tile((300, 100, 800, 300), (K, 1)))
        put("mask_gate", np.ones(K))
        put("action", np.full(K, 2))
        put("slot_src", np.array([0, 1, 2, -1])[:S])
        put("fuse_pose", np.tile(np.eye(4, dtype=np.float32), (S, 1, 1)))
        put("max_decay_weight", 1.0)
        put("min_decay_age", 200)
        return route

    args_static = (
        engine.cfg, engine.icfg, engine.stereo_params, engine.vo_params,
        engine.obj_params, engine.use_pallas, True, True, K, S,
    )

    state = {"carry": carry}

    def full_step(i):
        lg, rg, rgb, (db, cb) = var[i % n_var]
        state["carry"], outs = fused_dynamic_step(
            *args_static, state["carry"], lg, rg, rgb, db, cb,
            jnp.asarray(build_route()),
            engine.calib_vec, engine.intr_vec, engine.bf, engine.base_key,
        )
        return outs.packed
    t_full = timeit("full fused_dynamic_step", full_step)

    # ---- (b) instance fusion alone -------------------------------------
    icfg = engine.icfg
    fresh = tsdf.create_state(icfg)
    inst0 = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[None], (S,) + x.shape).copy(), fresh
    )
    fuse_pose = jnp.tile(jnp.eye(4, dtype=jnp.float32), (S, 1, 1))

    @jax.jit
    def fuse_only(inst, fidx, pd, prgb, act):
        out, fidx2, _ = jax.vmap(
            lambda st, fx, d, rgb, p, a: _fuse_one_instance(
                icfg, engine.use_pallas, fresh, st, fx, d, rgb, p, a,
                jnp.bool_(False), jnp.float32(0.0),
                True, jnp.float32(1.0), jnp.int32(200),
            )
        )(inst, fidx, pd, prgb, fuse_pose, act)
        return out, fidx2, jnp.sum(fidx2)

    fstate = {"inst": inst0, "fidx": jnp.zeros(S, jnp.int32)}

    def fuse_step(i):
        lg = var[i % n_var][0]
        pd = jnp.broadcast_to(
            jnp.where(lg > 40, 8.0, 0.0)[None], (S, H, W)
        )
        prgb = jnp.broadcast_to(
            var[i % n_var][2][None], (S, H, W, 3)
        )
        fstate["inst"], fstate["fidx"], s = fuse_only(
            fstate["inst"], fstate["fidx"], pd, prgb,
            jnp.ones(S, bool),
        )
        return s
    t_fuse = timeit("vmapped instance fusion (S slots)", fuse_step)

    # ---- (c) per-mask object RANSAC alone ------------------------------
    N = 2048
    flow0 = np.zeros((N, 8), np.float32)
    flow0[:, 0] = rng.uniform(0, W - 1, N)
    flow0[:, 1] = rng.uniform(0, H - 1, N)
    flow0[:, 2] = flow0[:, 0] - rng.uniform(5, 40, N)
    flow0[:, 3] = flow0[:, 1]
    flow0[:, 4] = flow0[:, 0] + rng.normal(0, 2, N)
    flow0[:, 5] = flow0[:, 1] + rng.normal(0, 1, N)
    flow0[:, 6] = flow0[:, 4] - (flow0[:, 0] - flow0[:, 2])
    flow0[:, 7] = flow0[:, 5]

    @jax.jit
    def obj_ransac(flow, key):
        keys = jax.random.split(key, K)

        def one(k_j, j):
            valid_j = (flow[:, 0] > j * 10) & (flow[:, 2] > 0)
            est = ego_ops.estimate_motion(
                flow, valid_j, engine.calib_vec, k_j,
                jnp.zeros(6, jnp.float32), engine.obj_params,
            )
            return est.tr
        trs = jax.vmap(one)(keys, jnp.arange(K))
        return jnp.sum(trs)

    def ransac_step(i):
        f = jnp.asarray(
            flow0 + rng.normal(0, 0.01, flow0.shape).astype(np.float32)
        )
        return obj_ransac(f, jax.random.PRNGKey(i))
    t_ransac = timeit(f"vmapped object RANSAC (K={K})", ransac_step)

    # ---- (d) static fused_step on the same frames ----------------------
    from dynslam_tpu.pipeline.fused import FusedPipeline
    from dynslam_tpu.pipeline.mapping import engine_config_from

    scfg = dc.replace(cfg, dynamic_mode=False)
    seng = FusedPipeline(
        engine_config_from(scfg), scfg.stereo, scfg.vo, scfg.decay, calib,
    )
    for i in range(4):
        lg, rg, rgb, _ = var[i % n_var]
        seng.process_frame(lg, rg, rgb)

    def static_step(i):
        lg, rg, rgb, _ = var[i % n_var]
        seng.process_frame(lg, rg, rgb)
        return seng.last_outputs.sync
    t_static = timeit("static fused_step", static_step)

    print(f"\ndynamic - static               = {t_full - t_static:7.2f} ms")
    print(f"  of which instance fusion     = {t_fuse:7.2f} ms")
    print(f"  of which object RANSAC       = {t_ransac:7.2f} ms")
    print(f"  unexplained (cut/pending/...)= "
          f"{t_full - t_static - t_fuse - t_ransac:7.2f} ms")


if __name__ == "__main__":
    main()
