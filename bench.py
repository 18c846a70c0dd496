#!/usr/bin/env python
"""End-to-end benchmark on KITTI-sized frames (1242x375), run on the
default JAX backend (the real TPU chip under the driver).

The bench scenes are materialized ONCE as real KITTI-layout sequences
(PNG stereo pairs + calib + Velodyne + MNC-format mask dumps, cached
under /tmp) and the pipelines are built through the SAME builder the app
uses (`pipeline/builder.build_fused`). Per-frame work inside the timed
window matches `main.run_fused`'s per-frame work:

- static: census stereo -> depth, sparse scene flow + RANSAC VO, TSDF
  allocate+fuse, full-frame raycast, voxel decay — one fused dispatch.
- dynamic (the reference's default mode, DynSLAMGUI.cpp:26-31), at the
  DEFAULT instance config (max_objects=8, max_detections=16): all of the
  above on the cut view, plus per-frame MNC dump parsing + mask bit-plane
  packing + device upload (on a one-frame-ahead worker thread — the
  reference overlaps its segmentation read the same way via std::async,
  DynSlam.cpp:33-45), per-object motion RANSAC, silhouette cuts, pooled
  per-object TSDF fusion.
- eval-on variants additionally run the reference's in-loop evaluation
  (EvaluateFrame + LogMemoryUse, DynSlam.cpp:154-161): LIDAR projection
  against the (composited, for dynamic) raycast + input depth, CSV rows
  written during the timed run via the deferred-fetch FusedEvaluation.

Frames are preloaded to the device (the reference reads PNGs from a warm
page cache; disk IO is not the system under test) with per-run +-1 gray
noise — the TPU relay memoizes identical computations across processes,
so timing MUST use fresh-entropy inputs.

`python bench.py` measures all four modes, each in a timeout-bounded
subprocess (relay bad periods stall compiles 10-20 min; one wedged mode
must not cost the others): static eval-off FIRST (headline, printed
immediately as a crash guard), dynamic eval-off (-> BENCH_DYNAMIC.json),
dynamic eval-on, static eval-on (-> BENCH_EVAL.json), then the static
eval-off line again LAST (the driver records the final JSON line). Each
mode prints ONE JSON line
{"metric": ..., "value": fps, "unit": "fps", "vs_baseline": fps / 2.5}.
vs_baseline is against the reference system's ~2.5 Hz on its desktop GPU
(ICRA'18 paper figure; the repo itself publishes no numbers, BASELINE.md).

Flags: --dynamic / --static run one eval-off mode; add --eval for the
eval-on variant; --lag1 opts into the fetch-before-dispatch protocol;
--k4 runs the dynamic mode at the round-4 quarter instance config
(max_objects=4, max_detections=4) to measure the K delta; --verbose logs
tracker state transitions.
"""

import json
import os
import shutil
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
#: building rows: corridor must outlast N_FRAMES * 0.8 m/frame + 45 m
#: of forward texture for VO/raycast reach
SCENE_ROWS = 11
SEQ_DYN = "/tmp/dynslam_bench_seq_dyn_v1"
SEQ_STATIC = "/tmp/dynslam_bench_seq_static_v1"


def ensure_seq(dynamic: bool) -> str:
    """Materialize (once, cached) the bench scene as a KITTI-layout
    sequence incl. Velodyne + MNC dumps — the inputs the reference's own
    loop consumes."""
    from dynslam_tpu.config import Intrinsics, StereoCalibration
    from dynslam_tpu.io.synthetic import write_kitti_sequence

    root = SEQ_DYN if dynamic else SEQ_STATIC
    marker = os.path.join(root, ".bench_complete")
    if os.path.exists(marker):
        return root
    shutil.rmtree(root, ignore_errors=True)
    print(f"[bench] rendering the {'dynamic' if dynamic else 'static'} "
          f"bench sequence into {root} (one-time, ~20 s/frame)",
          file=sys.stderr)
    write_kitti_sequence(
        root, num_frames=N_FRAMES, width=W, height=H,
        intrinsics=Intrinsics(707.0912, 707.0912, W / 2.0, 183.1104),
        calib=StereoCalibration(0.537150654273, 707.0912),
        with_dynamic=dynamic, n_dynamic=3, write_velodyne=True,
        write_elas_xml=False, write_dispnet=False, seed=11,
        scene_kwargs=(
            dict(n_rows=SCENE_ROWS, recurring_oncoming=2) if dynamic
            else dict(n_rows=SCENE_ROWS)
        ),
        trajectory_kwargs=dict(speed=0.8, yaw_rate=0.003),
        progress=True,
    )
    open(marker, "w").close()
    return root


def load_frames(root: str):
    """Gray stereo frames from the sequence PNGs + per-run fresh-entropy
    noise (the relay memoizes identical computations; CLAUDE.md trap 1)."""
    import cv2
    import numpy as np

    left, right = [], []
    for f in range(N_FRAMES):
        left.append(cv2.imread(os.path.join(root, "image_2", f"{f:06d}.png"),
                               cv2.IMREAD_GRAYSCALE))
        right.append(cv2.imread(os.path.join(root, "image_3", f"{f:06d}.png"),
                                cv2.IMREAD_GRAYSCALE))
    left, right = np.stack(left), np.stack(right)
    rng = np.random.default_rng()  # unseeded: OS entropy
    noise = lambda a: np.clip(
        a.astype(np.int16) + rng.integers(-1, 2, a.shape, dtype=np.int16),
        0, 255,
    ).astype(np.uint8)
    return noise(left), noise(right)


def bench_config(dynamic: bool, k4: bool = False):
    from dynslam_tpu.config import (
        DynSlamConfig, InstanceMapParams, Intrinsics, MapParams,
        SceneParams, StereoCalibration, StereoMatcherParams,
        VisualOdometryParams, VoxelDecayParams,
    )

    imp = InstanceMapParams()  # the SHIPPED default: 8 objects, 16 slots
    if k4:
        imp = InstanceMapParams(max_objects=4, max_detections=4)
    return DynSlamConfig(
        frame_width=W, frame_height=H,
        intrinsics=Intrinsics(707.0912, 707.0912, W / 2.0, 183.1104),
        calibration=StereoCalibration(0.537150654273, 707.0912),
        dynamic_mode=dynamic,
        scene=SceneParams(voxel_size_m=0.05, mu_m=0.30),
        map=MapParams(pool_capacity=2 ** 17, local_dims=(160, 48, 160),
                      max_new_blocks_per_frame=8192),
        instance_map=imp,
        stereo=StereoMatcherParams(max_disparity=128),
        vo=VisualOdometryParams(),
        decay=VoxelDecayParams(enabled=True, min_decay_age=200,
                               max_decay_weight=1),
    )


def preload_device(left_np, right_np):
    import jax.numpy as jnp

    left_dev = [jnp.asarray(x, jnp.float32) for x in left_np]
    right_dev = [jnp.asarray(x, jnp.float32) for x in right_np]
    rgb_dev = [
        jnp.broadcast_to(jnp.asarray(x)[..., None], (H, W, 3))
        for x in left_np
    ]
    return left_dev, right_dev, rgb_dev


def count_csv_rows(csv_dir: str, suffix: str) -> int:
    import glob

    files = glob.glob(os.path.join(csv_dir, f"*{suffix}"))
    if not files:
        return 0
    with open(files[0]) as f:
        return max(0, sum(1 for _ in f) - 1)


def main_dynamic(eval_on: bool = False, _timed: bool = True):
    import jax
    import numpy as np
    import jax.numpy as jnp
    from concurrent.futures import ThreadPoolExecutor

    from dynslam_tpu.pipeline.builder import build_fused

    if eval_on and _timed:
        # compile pass: an eval-on run builds executables at
        # data-dependent frames (the composited render on the first
        # frame with an active instance, the per-dtype assoc map, the
        # LIDAR-bucket eval kernel, ...), and any mid-window compile
        # (~40 s) wrecks the steady-state figure. Run the whole
        # sequence once untimed — the jit cache persists across engine
        # instances — then measure a fresh engine.
        print("[bench] eval-on compile pass (untimed)", file=sys.stderr)
        main_dynamic(eval_on=True, _timed=False)
    print(f"[bench] devices: {jax.devices()}", file=sys.stderr)
    root = ensure_seq(dynamic=True)
    k4 = "--k4" in sys.argv
    cfg = bench_config(dynamic=True, k4=k4)
    csv_dir = "/tmp/dynslam_bench_csv_dyn"
    shutil.rmtree(csv_dir, ignore_errors=True)
    engine, input_, segp = build_fused(
        root, cfg, with_evaluation=eval_on, csv_out_dir=csv_dir,
    )
    # lag 2 (default): the device never idles on the packed fetch;
    # tracker decisions one frame staler — semantics pinned equivalent
    # by tests/test_fused_dynamic.py. --lag1 opts back in to the
    # fetch-before-dispatch protocol.
    lag = 1 if "--lag1" in sys.argv else 2
    engine.dispatch_lag = lag
    engine.verbose_tracker = "--verbose" in sys.argv
    print(f"[bench] dispatch_lag={lag} K={engine.K} S={engine.S} "
          f"eval={'ON' if eval_on else 'off'}", file=sys.stderr)

    left_np, right_np = load_frames(root)
    left_dev, right_dev, rgb_dev = preload_device(left_np, right_np)
    # host rgb for the segmentation provider (content unused; the dump
    # parse is keyed by the provider's frame counter)
    rgb_host = [np.broadcast_to(x[..., None], (H, W, 3)) for x in left_np]

    # one-frame-ahead segmentation worker (the reference's std::async
    # overlap, DynSlam.cpp:33-45): per frame, INSIDE the timed window —
    # parse the MNC dump (~the reference's ~16 ms/mask read,
    # PrecomputedSegmentationProvider.cpp:37-39), select the K largest,
    # rasterize the bit-planes, upload them (ONE relay upload)
    pool = ThreadPoolExecutor(max_workers=1)

    def seg_job(i):
        dets = segp.segment_frame(rgb_host[i]).instance_detections
        sel = engine.select_detections(dets, engine.K)
        db, cb = engine.pack_mask_bits(sel, H, W, engine.K)
        both = jnp.asarray(np.stack([db, cb]))
        return dets, (both[0], both[1])

    # compile the (rare) oversized-mask fallback executable BEFORE the
    # timed window IF any mask in the scene will trigger it (host bbox
    # scan, EXACTLY the dispatch-time coverage check) — its first call
    # otherwise pays a ~40 s mid-sequence compile. Since the 4-aligned
    # frame padding let crops reach the frame edges, the bench scenes
    # trigger none, and the prewarm compile (~40 s, and the relay
    # sometimes stalls big compiles ~10 min) would dominate bench wall
    # time for an executable that never runs.
    from dynslam_tpu.io.segmentation import PrecomputedSegmentationProvider
    scan = PrecomputedSegmentationProvider(root + "/seg_image_2/mnc")
    needs_fallback = any(
        engine.mask_exceeds_crop(d, H, W)
        for _ in range(N_FRAMES)
        for d in engine.select_detections(
            scan.segment_frame(None).instance_detections, engine.K)
    )
    if needs_fallback:
        engine.prewarm_oversize_fallback()

    fut = pool.submit(seg_job, 0)
    frame_times = []
    t_steady = None
    for i in range(N_FRAMES):
        t0 = time.perf_counter()
        dets, masks_dev = fut.result()
        if i + 1 < N_FRAMES:
            fut = pool.submit(seg_job, i + 1)
        # process_frame's deferred tracker pass fetches the PREVIOUS
        # frame's packed outputs — that fetch is the pipeline sync, so
        # the host stays exactly one frame ahead of the device
        engine.process_frame(
            left_dev[i], right_dev[i], rgb_dev[i], dets, masks_dev
        )
        if i == WARMUP:
            t_steady = time.perf_counter()
        dt = time.perf_counter() - t0
        frame_times.append(dt)
        print(f"[bench] frame {i}: {dt * 1000:.1f} ms", file=sys.stderr)

    # consume the final dispatch: forces the whole sequence's chain
    engine._finish_prev()
    fps = (N_FRAMES - WARMUP - 1) / (time.perf_counter() - t_steady)
    # post-clock bookkeeping (the reference drains nothing extra in its
    # FPS window either): tail fusion flush + eval close
    if eval_on:
        engine.finalize()
        engine.evaluation.close()
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
    res = {
        "metric": ("end_to_end_fps_dynamic_eval_kitti_1242x375" if eval_on
                   else "end_to_end_fps_dynamic_kitti_1242x375"),
        "value": round(fps, 3),
        "unit": "fps",
        "vs_baseline": round(fps / 2.5, 3),
        "reconstructed_objects": sum(1 for v in obj_blocks.values() if v),
        "instance_config": f"K={engine.K} S={engine.S}",
    }
    if eval_on:
        rows = count_csv_rows(csv_dir, "unified-depth-result.csv")
        print(f"[bench] eval CSV rows written during the run: {rows}",
              file=sys.stderr)
        res["eval_csv_rows"] = rows
    return res


def main_static(eval_on: bool = False, _timed: bool = True):
    import jax
    import numpy as np

    from dynslam_tpu.pipeline.builder import build_fused

    if eval_on and _timed:
        # compile pass — see main_dynamic: eval executables build at
        # data-dependent frames; compile untimed first, then measure
        print("[bench] eval-on compile pass (untimed)", file=sys.stderr)
        main_static(eval_on=True, _timed=False)
    print(f"[bench] devices: {jax.devices()}", file=sys.stderr)
    root = ensure_seq(dynamic=False)
    cfg = bench_config(dynamic=False)
    csv_dir = "/tmp/dynslam_bench_csv_static"
    shutil.rmtree(csv_dir, ignore_errors=True)
    engine, input_, _segp = build_fused(
        root, cfg, with_evaluation=eval_on, csv_out_dir=csv_dir,
    )
    print(f"[bench] eval={'ON' if eval_on else 'off'}", file=sys.stderr)
    left_np, right_np = load_frames(root)
    left_dev, right_dev, rgb_dev = preload_device(left_np, right_np)

    frame_times = []
    prev_sync = None
    t_steady = None
    vox_counters = []  # device scalars, fetched after the timed window

    for i in range(N_FRAMES):
        t0 = time.perf_counter()

        engine.process_frame(left_dev[i], right_dev[i], rgb_dev[i])
        if eval_on and engine.evaluation is not None \
                and engine.last_outputs is not None:
            # per-frame in-loop evaluation, exactly main.run_fused's
            # submit (the reference's EvaluateFrame, DynSlam.cpp:154-161)
            o = engine.last_outputs
            engine.evaluation.submit(
                i, o.raycast.depth, o.depth_m, None,
                o.used_blocks, o.decayed_blocks,
            )
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
    if eval_on and engine.evaluation is not None:
        engine.evaluation.close()
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
        f"[bench] steady-state: {fps:.2f} FPS over "
        f"{N_FRAMES - WARMUP - 1} frames; map {used} blocks",
        file=sys.stderr,
    )
    res = {
        "metric": ("end_to_end_fps_static_eval_kitti_1242x375" if eval_on
                   else "end_to_end_fps_kitti_1242x375"),
        "value": round(fps, 3),
        "unit": "fps",
        "vs_baseline": round(fps / 2.5, 3),
    }
    if eval_on:
        rows = count_csv_rows(csv_dir, "unified-depth-result.csv")
        print(f"[bench] eval CSV rows written during the run: {rows}",
              file=sys.stderr)
        res["eval_csv_rows"] = rows
    return res


def _write_json(path, obj):
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               path), "w") as f:
            json.dump(obj, f)
            f.write("\n")
    except Exception as e:
        print(f"[bench] {path} write failed: {e}", file=sys.stderr)


def _run_mode(flags, timeout_s):
    """Run one bench mode as a subprocess with a hard timeout.

    The TPU relay has bad periods where EVERY fresh compile stalls
    10-20 min (CLAUDE.md trap 9); a stalled in-process compile cannot be
    interrupted, so per-mode isolation + kill is the only reliable bound
    that keeps one wedged mode from costing the other modes' numbers.
    Returns the child's final stdout JSON line, or an error dict.
    """
    import subprocess

    cmd = [sys.executable, os.path.abspath(__file__)] + flags
    print(f"[bench] mode {' '.join(flags)} (timeout {timeout_s}s)",
          file=sys.stderr)
    try:
        proc = subprocess.run(
            cmd, stdout=subprocess.PIPE, stderr=None, timeout=timeout_s,
        )
    except subprocess.TimeoutExpired:
        return {"value": None, "error": f"mode timed out after {timeout_s}s"}
    lines = [l for l in proc.stdout.decode().splitlines() if l.strip()]
    if proc.returncode != 0 or not lines:
        return {"value": None, "error": f"mode exited rc={proc.returncode}"}
    try:
        return json.loads(lines[-1])
    except json.JSONDecodeError:
        return {"value": None, "error": "mode printed no JSON"}


def _eval_mode(flags, timeout_s, eval_off_fps):
    """Run an eval-on mode, retrying ONCE if the result is missing or
    implausibly slow vs its eval-off counterpart.

    Relay bad periods stall every fresh compile 10-20 min (CLAUDE.md
    trap 9) and can wedge a whole child run — the 0.587-FPS dynamic
    eval-on artifact of round 5 was such a run (37 CSV rows written,
    ~1.7 s/frame: a complete run with every executable stalled). The
    documented mitigation is a fresh retry; eval-on adds device work
    but never costs > ~2x eval-off, so < 50% of the eval-off figure
    indicts the run, not the code."""
    res = _run_mode(flags, timeout_s)
    floor = 0.5 * eval_off_fps if eval_off_fps else None
    suspect = res.get("value") is None or (
        floor is not None and res["value"] < floor)
    if suspect:
        print(f"[bench] eval-on result {res.get('value')} looks like a "
              f"relay stall (eval-off {eval_off_fps}); retrying once",
              file=sys.stderr)
        retry = _run_mode(flags, timeout_s)
        if retry.get("value") is not None and (
                res.get("value") is None or retry["value"] > res["value"]):
            retry["first_attempt_fps"] = res.get("value")
            retry["retried"] = True
            res = retry
    return res


if __name__ == "__main__":
    eval_flag = "--eval" in sys.argv
    if "--dynamic" in sys.argv:
        print(json.dumps(main_dynamic(eval_on=eval_flag)))
    elif "--static" in sys.argv:
        print(json.dumps(main_static(eval_on=eval_flag)))
    else:
        # the driver's capture command is plain `python bench.py`: run
        # all four modes, each as a TIMEOUT-BOUNDED subprocess so one
        # wedged compile (relay bad periods stall every compile
        # 10-20 min) cannot cost the others. Scenes are materialized
        # here first (pure CPU) so children never pay that. Priority
        # order: the static eval-off headline runs FIRST and its JSON
        # line prints immediately (crash guard if the driver kills a
        # later mode) AND again LAST — the driver records the final
        # line. Dynamic eval-off lands in BENCH_DYNAMIC.json with the
        # eval-on numbers as extra fields; eval-on pairs in
        # BENCH_EVAL.json.
        ensure_seq(dynamic=False)
        ensure_seq(dynamic=True)
        passthru = [f for f in sys.argv[1:] if f in ("--lag1", "--k4",
                                                     "--verbose")]
        MODE_TIMEOUT = 45 * 60
        sta_res = _run_mode(["--static"] + passthru, MODE_TIMEOUT)
        print(json.dumps(sta_res), flush=True)
        dyn_res = _run_mode(["--dynamic"] + passthru, MODE_TIMEOUT)
        print(json.dumps(dyn_res), flush=True)
        dyn_eval = _eval_mode(["--dynamic", "--eval"] + passthru,
                              MODE_TIMEOUT, dyn_res.get("value"))
        print(json.dumps(dyn_eval), flush=True)
        sta_eval = _eval_mode(["--static", "--eval"] + passthru,
                              MODE_TIMEOUT, sta_res.get("value"))
        print(json.dumps(sta_eval), flush=True)
        ts = int(time.time())
        if dyn_res.get("value") is not None:
            dyn_res["eval_on_fps"] = dyn_eval.get("value")
            dyn_res["eval_csv_rows"] = dyn_eval.get("eval_csv_rows", 0)
            dyn_res["static_eval_on_fps"] = sta_eval.get("value")
            dyn_res["host_ts"] = ts
            _write_json("BENCH_DYNAMIC.json", dyn_res)
        else:
            # a failed mode must not leave a stale artifact that reads
            # as fresh: overwrite with the error, keeping the prior
            # numbers visibly labeled as previous
            prev = None
            try:
                with open(os.path.join(
                        os.path.dirname(os.path.abspath(__file__)),
                        "BENCH_DYNAMIC.json")) as f:
                    prev = json.load(f)
            except Exception:
                pass
            _write_json("BENCH_DYNAMIC.json",
                        {**dyn_res, "host_ts": ts, "previous": prev})
        _write_json("BENCH_EVAL.json",
                    {"dynamic_eval_on": dyn_eval,
                     "static_eval_on": sta_eval,
                     "host_ts": ts})
        print(json.dumps(sta_res), flush=True)
