#!/usr/bin/env python
"""VO forward-scale drift gauge (BASELINE config 2 at length).

Renders a synthetic forward-motion sequence (KITTI-shaped geometry scaled
down to 320x96 / f=260, the round-2 measurement configuration), runs the
sparse-scene-flow VO chain, and reports:

  - per-frame forward-scale drift: median of |t_est| / |t_gt| - 1 over
    frame deltas (the bias that compounds into trajectory error)
  - trajectory RMSE of camera-center error over the sequence

Round-2 state: ~1.5 %/frame scale bias, 0.84 m RMSE over 100 frames
(49 m path). Round-3 target (VERDICT item 3): <= 0.3 %/frame and
<= 0.5 m RMSE. Round-3 result with Tukey-IRLS final refinement
(irls_rounds=8, tukey_c_px=0.5): -0.27 %/frame, 0.141 m RMSE.

Usage: python scripts/vo_drift.py [--frames 100] [--cpu]
"""

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=100)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--speed", type=float, default=0.5)
    ap.add_argument("--yaw_rate", type=float, default=0.002)
    ap.add_argument("--width", type=int, default=320)
    ap.add_argument("--height", type=int, default=96)
    ap.add_argument("--focal", type=float, default=260.0)
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from dynslam_tpu.config import (
        Intrinsics, StereoCalibration, VisualOdometryParams,
    )
    from dynslam_tpu.io.synthetic import (
        SyntheticScene, render_stereo_frame, straight_trajectory,
    )
    from dynslam_tpu.pipeline.sparse_sf import SparseSFProvider

    W, H, f = args.width, args.height, args.focal
    intr = Intrinsics(f, f, W / 2, H / 2)
    calib = StereoCalibration(0.537, f)
    params = VisualOdometryParams(max_disparity=64)
    n = args.frames

    scene = SyntheticScene.default_scene(seed=5)
    poses = straight_trajectory(n, speed=args.speed, yaw_rate=args.yaw_rate)
    prov = SparseSFProvider((f, W / 2, H / 2), calib, params)

    est_pose = np.eye(4)
    est_traj = [np.eye(4)]
    scales = []
    for i in range(n):
        fr = render_stereo_frame(scene, poses[i], intr, calib, W, H, frame=i)
        lg = np.clip(fr["left_gray"] * 255, 0, 255).astype(np.float32)
        rg = np.clip(fr["right_gray"] * 255, 0, 255).astype(np.float32)
        prov.compute_sparse_sf(lg, rg)
        if i > 0:
            delta = prov.get_latest_motion()
            est_pose = delta @ est_pose
            est_traj.append(est_pose.copy())
            gt = np.linalg.inv(poses[i]) @ poses[i - 1]
            tn_gt = np.linalg.norm(gt[:3, 3])
            if tn_gt > 1e-6:
                scales.append(np.linalg.norm(delta[:3, 3]) / tn_gt - 1.0)
            if i % 20 == 0:
                err = np.linalg.norm(
                    np.linalg.inv(est_pose)[:3, 3] - poses[i][:3, 3]
                )
                print(f"[vo_drift] frame {i}: traj err {err:.3f} m, "
                      f"median scale drift so far "
                      f"{np.median(scales) * 100:+.2f} %/frame",
                      file=sys.stderr)

    errs = [
        np.linalg.norm(np.linalg.inv(est_traj[i])[:3, 3] - poses[i][:3, 3])
        for i in range(n)
    ]
    rmse = float(np.sqrt(np.mean(np.square(errs))))
    path_len = sum(
        np.linalg.norm((np.linalg.inv(poses[i]) @ poses[i - 1])[:3, 3])
        for i in range(1, n)
    )
    med = float(np.median(scales)) * 100
    print(f"[vo_drift] {n} frames, path {path_len:.1f} m")
    print(f"[vo_drift] median per-frame scale drift: {med:+.3f} %")
    print(f"[vo_drift] trajectory RMSE: {rmse:.3f} m "
          f"(final err {errs[-1]:.3f} m, {errs[-1] / path_len * 100:.1f} % "
          f"of path)")


if __name__ == "__main__":
    main()
