#!/usr/bin/env python
"""End-to-end benchmark on KITTI-sized frames (1242x375), run on the
default JAX backend (the real TPU chip under the driver).

Pipeline measured per frame (the reference's per-frame loop,
DynSlam.cpp:18-175, minus disk IO): census stereo disparity -> depth,
sparse scene flow + RANSAC visual odometry, TSDF block allocation +
fusion, full-frame raycast, voxel decay. Synthetic frames are pre-rendered
(and cached) so the number reflects the framework, not numpy raytracing.

`python bench.py` measures BOTH modes: DYNAMIC first (its JSON line
prints first and lands in BENCH_DYNAMIC.json), then STATIC, whose JSON
line prints LAST (the driver's capture). `--static` measures static
only; `--dynamic` measures the full DYNAMIC mode — the
reference's default (DynSLAMGUI.cpp:26-31) — on a 3-moving-car scene:
per-object motion RANSAC, silhouette cuts, per-object TSDF fusion, all
inside the single-dispatch fused dynamic step. Instance masks are
precomputed and preloaded like the reference's MNC dumps.

Prints ONE JSON line:
  {"metric": "end_to_end_fps[_dynamic]_kitti_1242x375", "value": <fps>,
   "unit": "fps", "vs_baseline": <fps / 2.5>}
vs_baseline is against the reference system's ~2.5 Hz on its desktop GPU
(ICRA'18 paper figure; the repo itself publishes no numbers, BASELINE.md).
"""

import json
import os
import sys
import time

W, H = 1242, 375
#: steady-state window: 36 measured frames after warmup. KITTI
#: sequences run 1100+ frames; the FPS definition keeps the final
#: pipeline-drain (one frame of device time + one relay fetch) inside
#: the measured window, so a short window under-reports steady
#: throughput by drain/N — 36 frames bound that distortion to ~3%.
N_FRAMES = 40
WARMUP = 3
CACHE = "/tmp/dynslam_bench_frames_v2.npz"
CACHE_DYN = "/tmp/dynslam_bench_frames_dyn_v2.npz"
#: building rows: corridor must outlast N_FRAMES * 0.8 m/frame + 45 m
#: of forward texture for VO/raycast reach
SCENE_ROWS = 11


def render_frames():
    import numpy as np

    from dynslam_tpu.config import Intrinsics, StereoCalibration
    from dynslam_tpu.io.synthetic import (
        SyntheticScene, render_stereo_frame, straight_trajectory,
    )

    if os.path.exists(CACHE):
        try:
            data = np.load(CACHE)
            if data["left"].shape == (N_FRAMES, H, W):
                return data["left"], data["right"]
        except Exception:
            pass

    intr = Intrinsics(707.0912, 707.0912, W / 2.0, 183.1104)
    calib = StereoCalibration(0.537150654273, 707.0912)
    scene = SyntheticScene.default_scene(seed=11, n_rows=SCENE_ROWS)
    poses = straight_trajectory(N_FRAMES, speed=0.8, yaw_rate=0.003)
    left = []
    right = []
    t0 = time.time()
    for i in range(N_FRAMES):
        fr = render_stereo_frame(scene, poses[i], intr, calib, W, H, frame=i)
        left.append(np.clip(fr["left_gray"] * 255, 0, 255).astype("uint8"))
        right.append(np.clip(fr["right_gray"] * 255, 0, 255).astype("uint8"))
        print(f"[bench] rendered frame {i + 1}/{N_FRAMES} "
              f"({time.time() - t0:.0f}s)", file=sys.stderr)
    left = np.stack(left)
    right = np.stack(right)
    try:
        np.savez_compressed(CACHE, left=left, right=right)
    except Exception:
        pass
    return left, right


def render_frames_dynamic():
    import numpy as np

    from dynslam_tpu.config import Intrinsics, StereoCalibration
    from dynslam_tpu.io.synthetic import (
        SyntheticScene, render_stereo_frame, straight_trajectory,
    )

    if os.path.exists(CACHE_DYN):
        try:
            data = np.load(CACHE_DYN)
            if data["left"].shape == (N_FRAMES, H, W):
                return data["left"], data["right"], data["objid"]
        except Exception:
            pass

    intr = Intrinsics(707.0912, 707.0912, W / 2.0, 183.1104)
    calib = StereoCalibration(0.537150654273, 707.0912)
    scene = SyntheticScene.default_scene(
        with_dynamic=True, seed=11, n_dynamic=3, n_rows=SCENE_ROWS,
        recurring_oncoming=2,
    )
    dyn_ids = np.asarray(
        [i + 1 for i, b in enumerate(scene.boxes) if b.is_dynamic], np.int32
    )
    poses = straight_trajectory(N_FRAMES, speed=0.8, yaw_rate=0.003)
    left, right, objid = [], [], []
    t0 = time.time()
    for i in range(N_FRAMES):
        fr = render_stereo_frame(scene, poses[i], intr, calib, W, H, frame=i)
        left.append(np.clip(fr["left_gray"] * 255, 0, 255).astype("uint8"))
        right.append(np.clip(fr["right_gray"] * 255, 0, 255).astype("uint8"))
        oid = fr["object_id"]
        objid.append(
            np.where(np.isin(oid, dyn_ids), oid, 0).astype(np.int16)
        )
        print(f"[bench] rendered dynamic frame {i + 1}/{N_FRAMES} "
              f"({time.time() - t0:.0f}s)", file=sys.stderr)
    left, right, objid = np.stack(left), np.stack(right), np.stack(objid)
    try:
        np.savez_compressed(CACHE_DYN, left=left, right=right, objid=objid)
    except Exception:
        pass
    return left, right, objid


def detections_from_objid(objid, min_size_px=45):
    """GT masks -> InstanceDetection list (the MNC-dump role)."""
    from dynslam_tpu.io.segmentation import detections_from_instance_ids

    return detections_from_instance_ids(objid, min_size_px)


def main_dynamic():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dynslam_tpu.config import (
        DynSlamConfig, InstanceMapParams, Intrinsics, MapParams,
        SceneParams, StereoCalibration, StereoMatcherParams,
        VisualOdometryParams, VoxelDecayParams,
    )
    from dynslam_tpu.pipeline.fused_dynamic import FusedDynamicPipeline

    print(f"[bench] devices: {jax.devices()}", file=sys.stderr)
    left_np, right_np, objid = render_frames_dynamic()
    rng = np.random.default_rng()
    noise = lambda a: np.clip(
        a.astype(np.int16) + rng.integers(-1, 2, a.shape, dtype=np.int16),
        0, 255,
    ).astype(np.uint8)
    left_np, right_np = noise(left_np), noise(right_np)

    intr = Intrinsics(707.0912, 707.0912, W / 2.0, 183.1104)
    calib = StereoCalibration(0.537150654273, 707.0912)
    cfg = DynSlamConfig(
        frame_width=W, frame_height=H, intrinsics=intr, calibration=calib,
        dynamic_mode=True,
        scene=SceneParams(voxel_size_m=0.05, mu_m=0.30),
        map=MapParams(pool_capacity=2 ** 17, local_dims=(160, 48, 160),
                      max_new_blocks_per_frame=8192),
        instance_map=InstanceMapParams(max_objects=4, max_detections=4),
        stereo=StereoMatcherParams(max_disparity=128),
        vo=VisualOdometryParams(),
        decay=VoxelDecayParams(enabled=True, min_decay_age=200,
                               max_decay_weight=1),
    )
    # lag 2 (default): the device never idles on the packed fetch;
    # tracker decisions one frame staler — semantics pinned equivalent
    # by tests/test_fused_dynamic.py. --lag1 opts back in to the
    # fetch-before-dispatch protocol.
    lag = 1 if "--lag1" in sys.argv else 2
    engine = FusedDynamicPipeline(cfg, calib, dispatch_lag=lag)
    engine.verbose_tracker = "--verbose" in sys.argv
    print(f"[bench] dispatch_lag={lag}", file=sys.stderr)

    # precompute detections + mask bit-planes (the reference reads these
    # from precomputed MNC dumps, PrecomputedSegmentationProvider.cpp);
    # preload everything to the device like the images
    dets = [
        engine.select_detections(detections_from_objid(objid[i]), engine.K)
        for i in range(N_FRAMES)
    ]
    n_det = [len(d) for d in dets]
    print(f"[bench] detections/frame: {n_det}", file=sys.stderr)
    masks_dev = []
    for i in range(N_FRAMES):
        db, cb = engine.pack_mask_bits(dets[i], H, W, engine.K)
        masks_dev.append((jnp.asarray(db), jnp.asarray(cb)))
    left_dev = [jnp.asarray(x, jnp.float32) for x in left_np]
    right_dev = [jnp.asarray(x, jnp.float32) for x in right_np]
    rgb_dev = [
        jnp.broadcast_to(jnp.asarray(x)[..., None], (H, W, 3))
        for x in left_np
    ]

    frame_times = []
    t_steady = None
    for i in range(N_FRAMES):
        t0 = time.perf_counter()
        # process_frame's deferred tracker pass fetches the PREVIOUS
        # frame's packed outputs — that fetch is the pipeline sync, so
        # the host stays exactly one frame ahead of the device
        engine.process_frame(
            left_dev[i], right_dev[i], rgb_dev[i], dets[i], masks_dev[i]
        )
        if i == WARMUP:
            t_steady = time.perf_counter()
        dt = time.perf_counter() - t0
        frame_times.append(dt)
        print(f"[bench] frame {i}: {dt * 1000:.1f} ms", file=sys.stderr)

    # consume the final dispatch: forces the whole sequence's chain
    engine._finish_prev()
    fps = (N_FRAMES - WARMUP - 1) / (time.perf_counter() - t_steady)
    used = engine.get_used_block_count()
    vox = getattr(engine, "last_fused_voxels", 0) \
        + getattr(engine, "last_march_samples", 0)
    print(f"[bench] measured voxel-ops last frame: {vox / 1e6:.1f} M "
          f"(~{vox * fps / 1e6:.0f} M/s)", file=sys.stderr)
    objs = engine.reconstructed_objects()
    obj_blocks = {
        t.id: t.reconstruction.get_used_block_count()
        for t in engine.tracker.active_tracks.values()
        if t.has_reconstruction()
    }
    print(
        f"[bench] steady-state: {fps:.2f} FPS over "
        f"{N_FRAMES - WARMUP - 1} dynamic frames; static map {used} "
        f"blocks; {len(objs)} reconstructed objects {obj_blocks}",
        file=sys.stderr,
    )
    return {
        "metric": "end_to_end_fps_dynamic_kitti_1242x375",
        "value": round(fps, 3),
        "unit": "fps",
        "vs_baseline": round(fps / 2.5, 3),
        "reconstructed_objects": sum(1 for v in obj_blocks.values() if v),
    }


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dynslam_tpu.config import (
        DynSlamConfig, Intrinsics, MapParams, SceneParams, StereoCalibration,
        StereoMatcherParams, VisualOdometryParams, VoxelDecayParams,
    )
    from dynslam_tpu.pipeline.fused import FusedPipeline
    from dynslam_tpu.pipeline.mapping import engine_config_from

    print(f"[bench] devices: {jax.devices()}", file=sys.stderr)
    left_np, right_np = render_frames()
    # the TPU relay in this environment memoizes identical computations;
    # per-run noise (OS entropy, +-1 gray level) keeps every frame's
    # computation unique so the timing is honest, without affecting the
    # pipeline's behavior
    rng = np.random.default_rng()
    left_np = np.clip(
        left_np.astype(np.int16)
        + rng.integers(-1, 2, left_np.shape, dtype=np.int16),
        0, 255,
    ).astype(np.uint8)
    right_np = np.clip(
        right_np.astype(np.int16)
        + rng.integers(-1, 2, right_np.shape, dtype=np.int16),
        0, 255,
    ).astype(np.uint8)

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
        decay=VoxelDecayParams(enabled=True, min_decay_age=200,
                               max_decay_weight=1),
    )

    # fused single-dispatch pipeline (pipeline/fused.py): the whole
    # per-frame computation — stereo, VO, allocate+fuse, raycast, decay —
    # is ONE jitted executable, so host dispatch overhead is one relay
    # call (~6 ms) per frame instead of 15-20 (~100 ms)
    engine = FusedPipeline(
        engine_config_from(cfg), cfg.stereo, cfg.vo, cfg.decay, calib,
    )

    # preload frames to the device (gray once for stereo+VO)
    left_dev = [jnp.asarray(x, jnp.float32) for x in left_np]
    right_dev = [jnp.asarray(x, jnp.float32) for x in right_np]
    rgb_dev = [
        jnp.broadcast_to(jnp.asarray(x)[..., None], (H, W, 3))
        for x in left_np
    ]

    frame_times = []
    prev_sync = None
    t_steady = None
    vox_counters = []  # device scalars, fetched after the timed window

    for i in range(N_FRAMES):
        t0 = time.perf_counter()

        engine.process_frame(left_dev[i], right_dev[i], rgb_dev[i])
        if i > WARMUP:
            vox_counters.append((engine.last_outputs.fused_voxels,
                                 engine.last_outputs.march_samples))
        if i > 0:
            # one-frame-deep pipeline: FETCH the PREVIOUS frame's sync
            # scalar (depends on every stage of that frame) so host
            # dispatch of frame i overlaps device work of frame i-1.
            # block_until_ready is unreliable AND slow through the relay
            # (CLAUDE.md trap 2); a scalar fetch is one honest round trip.
            if prev_sync is not None:
                float(np.asarray(prev_sync))
            prev_sync = engine.last_outputs.sync

        if i == WARMUP:
            float(np.asarray(prev_sync))  # drain before the timed window
            t_steady = time.perf_counter()
        dt = time.perf_counter() - t0
        frame_times.append(dt)
        print(f"[bench] frame {i}: {dt * 1000:.1f} ms", file=sys.stderr)

    # force truth: the final frame's sync scalar transitively depends on
    # the whole sequence's compute chain
    float(np.asarray(prev_sync))
    fps = (N_FRAMES - WARMUP - 1) / (time.perf_counter() - t_steady)
    used = engine.get_used_block_count()
    # secondary metric (BASELINE.json): TSDF fusion+raycast voxel
    # throughput, MEASURED on device per frame — voxels in blocks gated
    # into fusion + ray samples the raycast kernel actually marched
    vox_per_frame = float(np.mean(
        [float(np.asarray(a)) + float(np.asarray(b))
         for a, b in vox_counters]
    ))
    print(f"[bench] {vox_per_frame * fps / 1e6:.0f} M voxel-ops/s "
          f"(measured fusion+raycast, {vox_per_frame / 1e6:.1f} M/frame)",
          file=sys.stderr)
    print(
        f"[bench] steady-state: {fps:.2f} FPS over {N_FRAMES - WARMUP - 1} frames; "
        f"map {used} blocks", file=sys.stderr,
    )
    return {
        "metric": "end_to_end_fps_kitti_1242x375",
        "value": round(fps, 3),
        "unit": "fps",
        "vs_baseline": round(fps / 2.5, 3),
    }


if __name__ == "__main__":
    if "--dynamic" in sys.argv:
        print(json.dumps(main_dynamic()))
    elif "--static" in sys.argv:
        print(json.dumps(main()))
    else:
        # the driver's capture command is plain `python bench.py`: run
        # BOTH modes so the official artifact covers the reference's
        # default (dynamic) too. The dynamic line prints first and is
        # also written to BENCH_DYNAMIC.json; the static line prints
        # LAST (the driver records the final JSON line).
        dyn_res = main_dynamic()
        try:
            with open(os.path.join(os.path.dirname(
                    os.path.abspath(__file__)), "BENCH_DYNAMIC.json"),
                    "w") as f:
                json.dump(dyn_res, f)
                f.write("\n")
        except Exception as e:
            print(f"[bench] BENCH_DYNAMIC.json write failed: {e}",
                  file=sys.stderr)
        print(json.dumps(dyn_res))
        print(json.dumps(main()))
