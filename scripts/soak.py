#!/usr/bin/env python
"""Long-sequence soak at full KITTI resolution — the decay-gate recipe's
shape (scripts/decay_exp.sh in the reference: ~1100 frames, decay on)
exercised on a closed loop with turns.

Renders a LOOP trajectory once (cached), replays it N times with
per-frame noise (the TPU relay memoizes identical computations), and
runs the full live pipeline: stereo -> VO -> allocate/fuse -> raycast ->
decay. Asserts the HONEST long-run contract at the end (the system, like
the reference, has no loop closure: VO drift of a few cm/frame makes
revisited geometry re-allocate at shifted positions, and well-observed
drifted copies outlive weight-1 decay — so "zero new blocks per lap" is
not achievable on a closed loop and is NOT asserted):

  * steady FPS: last-lap FPS within 25% of the second lap's (no
    slowdown from map growth / pool pressure)
  * decay actively reclaims blocks once ages pass min_decay_age
  * used blocks never exceed the pool, and if the pool saturates the
    engine keeps running, counting dropped allocations instead of
    corrupting the map (graceful degradation)
  * while the pool has headroom, drops stay zero

Usage: python scripts/soak.py [--frames 1050] [--width 1242 --height 375]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LOOP_CACHE = "/tmp/dynslam_soak_loop_v1.npz"


def loop_trajectory(n: int, radius: float = 18.0) -> "np.ndarray":
    """Closed circular loop with constant yaw rate (always turning —
    worst case for the local-window anchor)."""
    import numpy as np

    poses = np.zeros((n, 4, 4))
    for i in range(n):
        th = 2.0 * np.pi * i / n
        c, s = np.cos(th), np.sin(th)
        # camera at the loop, z forward tangent to the circle
        R = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
        pos = np.array([radius * (1 - np.cos(th)), 0.0, radius * np.sin(th)])
        poses[i, :3, :3] = R
        poses[i, :3, 3] = pos
        poses[i, 3, 3] = 1.0
    return poses


def render_loop(n_loop: int, W: int, H: int):
    import numpy as np

    from dynslam_tpu.config import Intrinsics, StereoCalibration
    from dynslam_tpu.io.synthetic import SyntheticScene, render_stereo_frame

    if os.path.exists(LOOP_CACHE):
        data = np.load(LOOP_CACHE)
        if data["left"].shape == (n_loop, H, W):
            return data["left"], data["right"]

    intr = Intrinsics(707.0912, 707.0912, W / 2.0, 183.1104)
    calib = StereoCalibration(0.537150654273, 707.0912)
    scene = SyntheticScene.default_scene(seed=23)
    poses = loop_trajectory(n_loop)
    left, right = [], []
    t0 = time.time()
    for i in range(n_loop):
        fr = render_stereo_frame(scene, poses[i], intr, calib, W, H, frame=i)
        left.append(np.clip(fr["left_gray"] * 255, 0, 255).astype("uint8"))
        right.append(np.clip(fr["right_gray"] * 255, 0, 255).astype("uint8"))
        if i % 10 == 0:
            print(f"[soak] rendered {i + 1}/{n_loop} ({time.time() - t0:.0f}s)",
                  file=sys.stderr, flush=True)
    left = np.stack(left)
    right = np.stack(right)
    np.savez_compressed(LOOP_CACHE, left=left, right=right)
    return left, right


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=1050)
    ap.add_argument("--loop_frames", type=int, default=150)
    ap.add_argument("--width", type=int, default=1242)
    ap.add_argument("--height", type=int, default=375)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from dynslam_tpu.config import (DynSlamConfig, Intrinsics, MapParams,
                                    SceneParams, StereoCalibration,
                                    StereoMatcherParams, VisualOdometryParams,
                                    VoxelDecayParams)
    from dynslam_tpu.ops import depth as depth_ops
    from dynslam_tpu.ops import stereo as stereo_ops
    from dynslam_tpu.pipeline.mapping import MapEngine, engine_config_from
    from dynslam_tpu.pipeline.sparse_sf import SparseSFProvider

    W, H = args.width, args.height
    left_np, right_np = render_loop(args.loop_frames, W, H)
    rng = np.random.default_rng()

    intr = Intrinsics(707.0912, 707.0912, W / 2.0, 183.1104)
    calib = StereoCalibration(0.537150654273, 707.0912)
    cfg = DynSlamConfig(
        frame_width=W, frame_height=H, intrinsics=intr, calibration=calib,
        dynamic_mode=False,
        scene=SceneParams(voxel_size_m=0.05, mu_m=0.30),
        map=MapParams(pool_capacity=2 ** 17, local_dims=(160, 48, 160),
                      max_new_blocks_per_frame=8192),
        stereo=StereoMatcherParams(max_disparity=128),
        vo=VisualOdometryParams(),
        # the decay-gate recipe: weight-1 voxels older than 200 frames die
        decay=VoxelDecayParams(enabled=True, min_decay_age=200,
                               max_decay_weight=1),
    )
    engine = MapEngine(engine_config_from(cfg), cfg.decay, intr)
    sf = SparseSFProvider((intr.fx, intr.cx, intr.cy), calib, cfg.vo)

    pose = jnp.eye(4, dtype=jnp.float32)
    lap = args.loop_frames
    lap_stats = []
    blocks_series = []
    t_lap = time.perf_counter()
    prev_rc = None

    for i in range(args.frames):
        k = i % lap
        # fresh entropy per frame (relay memoization)
        noise = rng.integers(-1, 2, (H, W), dtype=np.int16)
        lg = jnp.asarray(
            np.clip(left_np[k].astype(np.int16) + noise, 0, 255), jnp.float32
        )
        rg = jnp.asarray(
            np.clip(right_np[k].astype(np.int16) + noise, 0, 255), jnp.float32
        )
        rgb = jnp.broadcast_to(lg.astype(jnp.uint8)[..., None], (H, W, 3))

        disp = stereo_ops.compute_disparity_jit(lg, rg, cfg.stereo)
        depth_m = depth_ops.depth_m_from_mm(
            depth_ops.depth_mm_from_disparity(disp, calib.bf)
        )
        sf.compute_sparse_sf(lg, rg)
        pose = sf.get_latest_motion_device() @ pose
        engine.set_pose(pose)
        engine.set_view_device(rgb, depth_m)
        if i > 0:
            engine.integrate()
            engine.prepare_next_step()
            engine.decay()
            if prev_rc is not None:
                np.asarray(prev_rc.depth[0, 0])
            prev_rc = engine.get_raycast()
        else:
            engine.frame_idx += 1

        if (i + 1) % lap == 0:
            used = engine.get_used_block_count()
            dropped = engine.get_dropped_allocation_count()
            dt = time.perf_counter() - t_lap
            fps = lap / dt
            lap_stats.append(dict(lap=i // lap, used=used, dropped=dropped,
                                  fps=round(fps, 2)))
            blocks_series.append(used)
            print(f"[soak] lap {i // lap}: {fps:.2f} FPS, {used} blocks, "
                  f"{dropped} dropped, decayed "
                  f"{int(engine.state.decayed_blocks)}",
                  file=sys.stderr, flush=True)
            t_lap = time.perf_counter()

    # ---- assertions (see module docstring for the contract) -------------
    ok = True
    msgs = []
    pool = cfg.map.pool_capacity
    if blocks_series and max(blocks_series) > pool:
        ok = False
        msgs.append(f"used blocks exceeded pool: {max(blocks_series)}")
    # drops are only acceptable once the pool actually saturated
    saturated = any(b >= pool - cfg.map.max_new_blocks_per_frame
                    for b in blocks_series)
    if lap_stats[-1]["dropped"] != 0 and not saturated:
        ok = False
        msgs.append(
            f"dropped allocations with pool headroom: "
            f"{lap_stats[-1]['dropped']}"
        )
    if args.frames > int(cfg.decay.min_decay_age) + lap \
            and int(engine.state.decayed_blocks) == 0:
        ok = False
        msgs.append("decay never reclaimed a block")
    if len(blocks_series) >= 3:
        fps2, fpsN = lap_stats[1]["fps"], lap_stats[-1]["fps"]
        if fpsN < 0.75 * fps2:
            ok = False
            msgs.append(f"FPS decayed {fps2} -> {fpsN}")
    print(json.dumps({
        "metric": "soak_frames", "frames": args.frames,
        "laps": lap_stats, "ok": ok, "failures": msgs,
    }))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
