"""Command-line entry point — the reference's `DynSLAMGUI.cpp main()`
(lines 1288-1315) with its ~20 gflags (lines 26-72) mapped to argparse,
minus the Pangolin GUI (headless: previews/meshes/CSVs are written to an
output directory instead; see scripts/demo_synthetic.py for a generated
sequence).

Usage:
  python -m dynslam_tpu.main --dataset_root /data/kitti/odometry/06 \
      --enable_evaluation --out /tmp/run06
"""

from __future__ import annotations

import argparse
import os
import sys


def build_arg_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    # dataset flags (DynSLAMGUI.cpp:26-34)
    p.add_argument("--dataset_root", required=True,
                   help="KITTI-layout sequence root")
    p.add_argument("--dataset_type", choices=["kitti-odometry", "kitti-tracking"],
                   default="kitti-odometry")
    p.add_argument("--kitti_tracking_sequence_id", type=int, default=-1)
    p.add_argument("--frame_offset", type=int, default=0)
    p.add_argument("--frame_limit", type=int, default=0,
                   help="stop after this many frames (0 = all)")
    # pipeline flags (DynSLAMGUI.cpp:29-55)
    p.add_argument("--dynamic_mode", action="store_true", default=True)
    p.add_argument("--no-dynamic_mode", dest="dynamic_mode",
                   action="store_false")
    p.add_argument("--direct_refinement", action="store_true", default=False,
                   help="refine per-object motion by dense photometric "
                        "alignment of consecutive instance views "
                        "(ops/direct_align.py; staged path only). The "
                        "reference ships this disabled and found it does "
                        "not help (Direct/README.md:7, "
                        "InstanceReconstructor.cpp:460-566)")
    p.add_argument("--use_bilateral_filter", action="store_true",
                   default=False,
                   help="bilateral-filter the input depth before fusion "
                        "(InfiniTAM's useBilateralFilter)")
    p.add_argument("--use_dispnet", action="store_true", default=False)
    p.add_argument("--fill_disparity_gaps", type=int, default=0,
                   help="live-stereo ELAS-role gap interpolation: fill "
                        "horizontal invalid runs up to N px with the "
                        "background flanking disparity (0 = off)")
    p.add_argument("--use_live_stereo", action="store_true", default=False,
                   help="census matcher depth instead of precomputed dumps")
    p.add_argument("--voxel_decay", action="store_true", default=True)
    p.add_argument("--no-voxel_decay", dest="voxel_decay",
                   action="store_false")
    p.add_argument("--min_decay_age", type=int, default=200)
    p.add_argument("--max_decay_weight", type=int, default=1)
    p.add_argument("--use_depth_weighting", action="store_true", default=False)
    p.add_argument("--fusion_every", type=int, default=1)
    p.add_argument("--scale", type=float, default=1.0)
    p.add_argument("--voxel_size", type=float, default=0.05)
    p.add_argument("--max_depth", type=float, default=None,
                   help="fusion depth cutoff in meters (reference "
                        "default 20; CSV names encode it)")
    # evaluation flags (DynSLAMGUI.cpp:56-72)
    p.add_argument("--enable_evaluation", action="store_true", default=False)
    p.add_argument("--semantic_evaluation", action="store_true", default=True)
    p.add_argument("--evaluation_delay", type=int, default=0)
    p.add_argument("--csv_out_dir", default=None)
    # outputs
    p.add_argument("--out", default="./dynslam_out")
    p.add_argument("--dump_previews_every", type=int, default=0,
                   help="write raycast preview PNGs every k frames")
    p.add_argument("--save_mesh", action="store_true", default=False)
    p.add_argument("--save_object_meshes", action="store_true", default=False,
                   help="export each reconstructed object's volume as OBJ "
                        "(SaveDynamicObject, DynSlam.cpp:199 — a GUI key op "
                        "in the reference, a flag here)")
    p.add_argument("--cpu", action="store_true", default=False)
    p.add_argument("--tiny", action="store_true", default=False,
                   help="small pools/feature counts (tests, small inputs)")
    p.add_argument("--prefetch", action="store_true", default=False,
                   help="background-thread input prefetching (std::async"
                        " IO-overlap equivalent)")
    p.add_argument("--min_detection_size", type=int, default=None,
                   help="min detection side in px (default: reference's 45)")
    p.add_argument("--fused", action="store_true", default=False,
                   help="run the FUSED single-dispatch pipeline (the "
                        "bench/perf configuration): whole-frame executable "
                        "incl. in-graph census stereo; precomputed depth "
                        "dumps are ignored. --enable_evaluation works here "
                        "too (deferred-fetch FusedEvaluation, same CSV "
                        "rows); only --evaluation_delay > 0 needs the "
                        "staged path")
    p.add_argument("--checkpoint_out", default=None,
                   help="write a map+trajectory checkpoint here at the end")
    p.add_argument("--resume_from", default=None,
                   help="resume the static map + trajectory from a checkpoint")
    p.add_argument("--debug_numerics", action="store_true", default=False,
                   help="enable jax_debug_nans (the per-frame CUDA error "
                        "barrier's numerical-safety analogue)")
    return p


def run_fused(args, cfg) -> int:
    """--fused: the single-dispatch pipelines (pipeline/fused.py /
    pipeline/fused_dynamic.py) driven from the app — the configuration
    bench.py measures, on a real dataset. One device executable per
    frame; the host stays one frame ahead of the device."""
    import time

    import numpy as np

    from dynslam_tpu.io.calib import write_kitti_poses
    from dynslam_tpu.ops import depth as depth_ops
    from dynslam_tpu.pipeline.builder import build_fused

    pipe, input_, segp = build_fused(
        args.dataset_root, cfg,
        kitti_tracking_sequence=(
            args.kitti_tracking_sequence_id
            if args.dataset_type == "kitti-tracking" else None
        ),
        frame_offset=args.frame_offset,
        min_detection_size_px=args.min_detection_size,
        use_prefetch=args.prefetch,
        with_evaluation=args.enable_evaluation,
        csv_out_dir=args.csv_out_dir or os.path.join(args.out, "csv"),
    )
    n = 0
    if args.resume_from:
        from dynslam_tpu.pipeline.checkpoint import load_fused_checkpoint

        n = load_fused_checkpoint(args.resume_from, pipe)
        input_.frame_idx = input_.frame_offset + n
        print(f"[resumed from {args.resume_from} at frame {n}]")

    poses = []
    t_steady = None
    n_start = n
    while input_.has_more_images():
        t0 = time.perf_counter()
        input_.read_next_frame()
        rgb, _ = input_.get_images()
        right_rgb = input_.get_stereo_color()[1]
        lg = np.asarray(depth_ops.rgb_to_gray(rgb))
        rg = np.asarray(depth_ops.rgb_to_gray(right_rgb))
        if segp is not None:
            dets = segp.segment_frame(rgb).instance_detections
            pipe.process_frame(lg, rg, rgb, dets)
        else:
            pipe.process_frame(lg, rg, rgb)
            # per-frame evaluation on the device-resident outputs (the
            # dynamic pipeline drives its own deferred eval internally)
            if pipe.evaluation is not None and pipe.last_outputs is not None:
                o = pipe.last_outputs
                pipe.evaluation.submit(
                    n, o.raycast.depth, o.depth_m, None,
                    o.used_blocks, o.decayed_blocks,
                )
        if pipe.last_outputs is not None:
            poses.append(pipe.last_outputs.pose_w2c)
            if args.dump_previews_every and n % args.dump_previews_every == 0 \
                    and n:
                import cv2

                rc = pipe.last_outputs.raycast
                color = (
                    pipe.composited_preview() if segp is not None
                    else np.asarray(rc.color)
                )
                cv2.imwrite(
                    os.path.join(args.out, f"frame{n:06d}_color.png"),
                    color[..., ::-1],
                )
                d = np.asarray(rc.depth)
                dv = np.clip(d / max(float(d.max()), 1e-3) * 255, 0, 255)
                cv2.imwrite(
                    os.path.join(args.out, f"frame{n:06d}_depth.png"),
                    dv.astype(np.uint8),
                )
        ms = (time.perf_counter() - t0) * 1000.0
        print(f"[Dispatched frame {n} in {ms:.1f} ms (one-frame-deep "
              f"async)]")
        n += 1
        if n - n_start == 3:
            t_steady = time.perf_counter()
        if args.frame_limit and n - n_start >= args.frame_limit:
            break

    if segp is not None:
        pipe.finalize()
    if pipe.evaluation is not None:
        pipe.evaluation.close()
    # force truth before reporting: sync on a final dependent output
    if pipe.last_outputs is not None:
        if hasattr(pipe.last_outputs, "sync"):
            float(np.asarray(pipe.last_outputs.sync))
        else:
            np.asarray(pipe.last_outputs.packed)
    if t_steady is not None and n - n_start > 3:
        fps = (n - n_start - 3) / (time.perf_counter() - t_steady)
        print(f"[steady-state: {fps:.2f} FPS over {n - n_start - 3} frames]")

    if args.checkpoint_out:
        from dynslam_tpu.pipeline.checkpoint import save_fused_checkpoint

        save_fused_checkpoint(args.checkpoint_out, pipe)
        print(f"[checkpoint written to {args.checkpoint_out}]")

    # frame 0 is the bootstrap (identity pose, staged convention), so
    # trajectory rows == frames processed
    est = np.stack(
        [np.eye(4)] + [np.linalg.inv(np.asarray(p)) for p in poses]
    ) if poses else np.eye(4)[None]
    write_kitti_poses(os.path.join(args.out, "trajectory.txt"), est)
    if args.save_mesh:
        from dynslam_tpu.viz.meshing import extract_mesh, write_obj

        verts, tris = extract_mesh(pipe.carry.state, pipe.cfg.voxel_size)
        write_obj(os.path.join(args.out, "static_map.obj"), verts, tris)
        print(f"[saved static map mesh: {len(tris)} triangles]")
    if segp is not None:
        for t in pipe.tracker.active_tracks.values():
            vol = (t.reconstruction.get_used_block_count()
                   if t.has_reconstruction() else 0)
            print(f"[track #{t.id} {t.class_name} {t.state.value}: "
                  f"{len(t.frames)} frames, {t.fused_frames} fused, "
                  f"{vol} blocks]")
        if args.save_object_meshes:
            from dynslam_tpu.viz.meshing import save_engine_mesh

            for t in pipe.tracker.active_tracks.values():
                if t.has_reconstruction():
                    op = os.path.join(
                        args.out, f"object_{t.id}_{t.class_name}.obj"
                    )
                    nt = save_engine_mesh(t.reconstruction, op)
                    print(f"[saved object #{t.id} mesh: {nt} triangles]")
    print(f"[map: {pipe.get_used_block_count()} blocks, "
          f"{pipe.get_dropped_allocation_count()} dropped allocations]")
    if hasattr(pipe, "get_dropped_detection_count"):
        nd = pipe.get_dropped_detection_count()
        if nd:
            print(f"[WARNING: {nd} detections exceeded the "
                  f"{pipe.K} mask slots over the run (largest kept); "
                  f"raise instance_map.max_detections]")
    if getattr(pipe, "oversize_masks", 0):
        print(f"[{pipe.oversize_masks} oversized masks exceeded the "
              f"fusion crop; {pipe.truncated_pixels} px truncated "
              f"(0 = every one took the full-frame fallback)]")
    return 0


def main(argv=None) -> int:
    args = build_arg_parser().parse_args(argv)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    if args.debug_numerics:
        import jax

        jax.config.update("jax_debug_nans", True)

    import dataclasses

    import numpy as np

    from dynslam_tpu.config import (
        DynSlamConfig, EvaluationParams, SceneParams, VoxelDecayParams,
    )
    from dynslam_tpu.io.calib import write_kitti_poses
    from dynslam_tpu.pipeline.builder import build_dynslam
    from dynslam_tpu.pipeline.mapping import PreviewType

    if args.tiny:
        from dynslam_tpu.config import (
            InstanceMapParams, MapParams, StereoMatcherParams,
            VisualOdometryParams,
        )

        base = DynSlamConfig(
            map=MapParams(pool_capacity=16384, local_dims=(80, 32, 80),
                          max_new_blocks_per_frame=4096),
            instance_map=InstanceMapParams(
                blocks_per_object=1024, local_dims=(48, 24, 64),
                max_new_blocks_per_frame=512,
            ),
            vo=VisualOdometryParams(max_candidates=1024, max_matches=512,
                                    ransac_iters=60, max_disparity=64),
            stereo=StereoMatcherParams(max_disparity=64),
        )
    else:
        base = DynSlamConfig()
    cfg = base.replace(
        dynamic_mode=args.dynamic_mode,
        use_dispnet=args.use_dispnet,
        fusion_every=args.fusion_every,
        use_bilateral_filter=args.use_bilateral_filter,
        scale=args.scale,
        scene=SceneParams(voxel_size_m=args.voxel_size),
        decay=VoxelDecayParams(args.voxel_decay, args.min_decay_age,
                               args.max_decay_weight),
        evaluation=EvaluationParams(
            enabled=args.enable_evaluation,
            semantic_evaluation=args.semantic_evaluation,
            evaluation_delay=args.evaluation_delay,
        ),
    )
    cfg = dataclasses.replace(
        cfg, map=dataclasses.replace(
            cfg.map, use_depth_weighting=args.use_depth_weighting
        ),
        stereo=dataclasses.replace(
            cfg.stereo, fill_gaps=args.fill_disparity_gaps
        ),
        use_direct_refinement=args.direct_refinement,
    )
    if args.max_depth is not None:
        cfg = dataclasses.replace(cfg, max_depth_m=args.max_depth)

    os.makedirs(args.out, exist_ok=True)
    if args.fused:
        if args.direct_refinement:
            raise SystemExit(
                "--fused does not support --direct_refinement; use the "
                "staged path for it"
            )
        if args.enable_evaluation and args.evaluation_delay:
            raise SystemExit(
                "--fused evaluation supports --evaluation_delay=0 only; "
                "use the staged path for delayed evaluation"
            )
        return run_fused(args, cfg)
    dyn, input_ = build_dynslam(
        args.dataset_root,
        cfg,
        kitti_tracking_sequence=(
            args.kitti_tracking_sequence_id
            if args.dataset_type == "kitti-tracking"
            else None
        ),
        use_live_stereo=args.use_live_stereo,
        frame_offset=args.frame_offset,
        with_instances=args.dynamic_mode,
        with_evaluation=args.enable_evaluation,
        csv_out_dir=args.csv_out_dir or os.path.join(args.out, "csv"),
        min_detection_size_px=args.min_detection_size,
        use_prefetch=args.prefetch,
    )

    n = 0
    if args.resume_from:
        from dynslam_tpu.pipeline.checkpoint import load_checkpoint

        n = load_checkpoint(args.resume_from, dyn)
        input_.frame_idx = input_.frame_offset + n
        print(f"[resumed from {args.resume_from} at frame {n}]")
    while dyn.process_frame(input_):
        ms = dyn.last_frame_ms()
        print(f"[Finished frame {n} in {ms:.1f} ms @ "
              f"{1000.0 / max(ms, 1e-3):.2f} FPS]")
        if args.dump_previews_every and n % args.dump_previews_every == 0 and n:
            import cv2

            for pv in (PreviewType.COLOR, PreviewType.DEPTH):
                img = dyn.get_static_map_raycast_preview(preview=pv)
                cv2.imwrite(
                    os.path.join(args.out, f"frame{n:06d}_{pv.value}.png"),
                    img[..., ::-1],
                )
            # LIDAR-vs-fused-depth error overlay (the GUI's visual diff
            # modes, headless — see eval/error_viz.py)
            if dyn.evaluation is not None \
                    and dyn.evaluation.velodyne.frame_available(
                        input_.frame_offset + n):
                from dynslam_tpu.eval.error_viz import render_depth_error

                ev = dyn.evaluation
                overlay = render_depth_error(
                    ev.velodyne.read_frame(input_.frame_offset + n),
                    dyn.get_static_map_raycast_depth_preview(),
                    input_.get_images()[0],
                    ev.calib.velo_to_left_cam, ev.calib.proj_left_color,
                    ev.calib.proj_right_color,
                    ev.baseline_m * ev.focal_px,
                )
                cv2.imwrite(
                    os.path.join(args.out, f"frame{n:06d}_lidar_error.png"),
                    overlay[..., ::-1],
                )
        if n and n % 50 == 0:
            # device memory telemetry (the reference's cudaMemGetInfo
            # readout, DynSLAMGUI.cpp:910-915)
            try:
                import jax

                stats = jax.local_devices()[0].memory_stats() or {}
                used = stats.get("bytes_in_use", 0) / 2 ** 20
                lim = stats.get("bytes_limit", 0) / 2 ** 20
                print(f"[device memory: {used:.0f} / {lim:.0f} MB in use]")
            except Exception:
                pass
        n += 1
        if args.frame_limit and n >= args.frame_limit:
            break

    if args.checkpoint_out:
        from dynslam_tpu.pipeline.checkpoint import save_checkpoint

        save_checkpoint(args.checkpoint_out, dyn)
        print(f"[checkpoint written to {args.checkpoint_out}]")
    dyn.finalize()
    if dyn.evaluation is not None:
        dyn.evaluation.close()

    est = np.stack([np.linalg.inv(p) for p in dyn.pose_history[1:]])
    write_kitti_poses(os.path.join(args.out, "trajectory.txt"), est)
    if args.save_mesh:
        tris = dyn.save_static_map(os.path.join(args.out, "static_map.obj"))
        print(f"[saved static map mesh: {tris} triangles]")

    if dyn.instance_reconstructor is not None:
        if cfg.use_direct_refinement:
            print(f"[direct refinement: "
                  f"{dyn.instance_reconstructor.direct_refinements} "
                  f"object motions refined]")
        for t in dyn.instance_reconstructor.tracker.active_tracks.values():
            vol = (t.reconstruction.get_used_block_count()
                   if t.has_reconstruction() else 0)
            print(f"[track #{t.id} {t.class_name} {t.state.value}: "
                  f"{len(t.frames)} frames, {t.fused_frames} fused, "
                  f"{vol} blocks]")
        if args.save_object_meshes:
            for t in dyn.instance_reconstructor.tracker.active_tracks.values():
                if t.has_reconstruction():
                    op = os.path.join(
                        args.out, f"object_{t.id}_{t.class_name}.obj"
                    )
                    dyn.save_dynamic_object(t.id, op)
                    print(f"[saved object #{t.id} mesh: {op}]")
    print(dyn.get_timing_report())
    print(f"[map: {dyn.static_scene.get_used_block_count()} blocks, "
          f"{dyn.static_scene.get_used_memory_bytes() / 1e6:.1f} MB; decay "
          f"saved {dyn.static_scene.get_saved_decay_memory_bytes() / 1e6:.1f} MB]")
    return 0


if __name__ == "__main__":
    sys.exit(main())
