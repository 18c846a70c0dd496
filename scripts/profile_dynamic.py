#!/usr/bin/env python
"""Cost attribution for the fused DYNAMIC step on real TPU.

Runs the exact bench --dynamic configuration repeatedly, with individual
stages traced OUT of the executable (fused_dynamic_step's profile_skip),
and reports steady-state ms/frame per variant. The marginal cost of a
stage = full - variant-without-it (stages interact through XLA fusion,
so marginals need not sum to the total).

Variants:
  full        the production executable
  noinst      per-object pooled fusion traced out
  noransac    per-mask object RANSAC traced out
  nocut       silhouette cut + pending-view copies traced out
  nodyn       all three (≈ the static step + packing overhead)

Usage: python scripts/profile_dynamic.py [--frames 12] [--cpu]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VARIANTS = {
    "full": (),
    "noinst": ("instances",),
    "noransac": ("obj_ransac",),
    "nocut": ("cut",),
    "nodyn": ("instances", "obj_ransac", "cut"),
    # static-side attribution (the stages both modes share)
    "nointegrate": ("instances", "obj_ransac", "cut", "integrate"),
    "noraycast": ("instances", "obj_ransac", "cut", "raycast"),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=12)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--k4", action="store_true",
                    help="quarter instance config (max_objects=4, "
                         "max_detections=4) instead of the default 8/16")
    ap.add_argument("--variants", default=",".join(VARIANTS))
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    import bench
    from dynslam_tpu.io.segmentation import PrecomputedSegmentationProvider
    from dynslam_tpu.pipeline.fused_dynamic import FusedDynamicPipeline

    W, H, N = bench.W, bench.H, bench.N_FRAMES
    root = bench.ensure_seq(dynamic=True)
    # one dump parse for all variants (profiling isolates DEVICE stages;
    # the per-frame host seg cost is bench.py's concern)
    segp0 = PrecomputedSegmentationProvider(root + "/seg_image_2/mnc")
    all_dets = [
        segp0.segment_frame(None).instance_detections for _ in range(N)
    ]

    results = {}
    for name in args.variants.split(","):
        skip = VARIANTS[name]
        cfg = bench.bench_config(dynamic=True, k4=args.k4)
        engine = FusedDynamicPipeline(cfg, cfg.calibration)
        engine.profile_skip = skip

        ln, rn = bench.load_frames(root)  # fresh noise per variant
        dets = [
            engine.select_detections(all_dets[i], engine.K)
            for i in range(N)
        ]
        masks_dev = []
        for i in range(N):
            db, cb = engine.pack_mask_bits(dets[i], H, W, engine.K)
            masks_dev.append((jnp.asarray(db), jnp.asarray(cb)))
        left_dev = [jnp.asarray(x, jnp.float32) for x in ln]
        right_dev = [jnp.asarray(x, jnp.float32) for x in rn]
        rgb_dev = [
            jnp.broadcast_to(jnp.asarray(x)[..., None], (H, W, 3))
            for x in ln
        ]

        t_steady = None
        frames = min(args.frames, N)
        for i in range(frames):
            engine.process_frame(
                left_dev[i], right_dev[i], rgb_dev[i], dets[i], masks_dev[i]
            )
            if i == args.warmup:
                t_steady = time.perf_counter()
        engine._finish_prev()
        steady = frames - args.warmup - 1
        ms = (time.perf_counter() - t_steady) / steady * 1000.0
        results[name] = round(ms, 1)
        print(f"[profile] {name:10s} {ms:7.1f} ms/frame "
              f"(skip={skip})", file=sys.stderr, flush=True)

    full = results.get("full")
    if full:
        for name, ms in results.items():
            if name != "full":
                print(f"[profile] marginal {name:10s} {full - ms:+7.1f} ms",
                      file=sys.stderr)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
