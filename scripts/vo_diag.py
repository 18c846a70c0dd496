#!/usr/bin/env python
"""Diagnose the VO forward-scale bias: compare measured prev/current
disparities (from LK-refined RawFlow rows) against the renderer's exact
ground truth disparity maps, per frame.

If the prev-pair disparity (u1p - u2p) is biased high relative to GT
while the current-pair disparity (u1 - u2c) is unbiased, triangulated
prev points sit too close and the estimated forward translation shrinks
proportionally — the -2.9 %/frame drift seen in scripts/vo_drift.py.

Usage: python scripts/vo_diag.py [--frames 12] [--cpu]
"""

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=12)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--speed", type=float, default=0.5)
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

    W, H, f = 320, 96, 260.0
    intr = Intrinsics(f, f, W / 2, H / 2)
    calib = StereoCalibration(0.537, f)
    params = VisualOdometryParams(max_disparity=64)
    n = args.frames

    scene = SyntheticScene.default_scene(seed=5)
    poses = straight_trajectory(n, speed=args.speed, yaw_rate=0.002)
    prov = SparseSFProvider((f, W / 2, H / 2), calib, params)

    prev_fr = None
    dprev_biases, dcur_biases = [], []
    flow_biases = []
    for i in range(n):
        fr = render_stereo_frame(scene, poses[i], intr, calib, W, H, frame=i)
        lg = np.clip(fr["left_gray"] * 255, 0, 255).astype(np.float32)
        rg = np.clip(fr["right_gray"] * 255, 0, 255).astype(np.float32)
        prov.compute_sparse_sf(lg, rg)
        if i > 0:
            sf = prov.get_flow()
            rows = sf.matches  # (M, 8): u1 v1 u2c v2c u1p v1p u2p v2p
            if rows.shape[0] == 0:
                prev_fr = fr
                continue
            u1, v1 = rows[:, 0], rows[:, 1]
            u2c = rows[:, 2]
            u1p, v1p = rows[:, 4], rows[:, 5]
            u2p = rows[:, 6]

            def gt_disp_at(frm, u, v):
                ui = np.clip(np.round(u).astype(int), 0, W - 1)
                vi = np.clip(np.round(v).astype(int), 0, H - 1)
                return frm["disparity"][vi, ui]

            d_cur = u1 - u2c
            d_prev = u1p - u2p
            g_cur = gt_disp_at(fr, u1, v1)
            g_prev = gt_disp_at(prev_fr, u1p, v1p)
            ok_c = g_cur > 1.0
            ok_p = g_prev > 1.0
            dcur_biases.append(np.median(d_cur[ok_c] - g_cur[ok_c]))
            dprev_biases.append(np.median(d_prev[ok_p] - g_prev[ok_p]))

            # temporal-flow radial bias: project GT-depth prev point with
            # GT motion; compare predicted current-left u with measured u1
            gt_delta = np.linalg.inv(poses[i]) @ poses[i - 1]  # prev->cur cam
            z_prev = np.where(g_prev > 0.5, calib.bf / np.maximum(g_prev, 1e-6), 0)
            X = (u1p - W / 2) / f * z_prev
            Y = (v1p - H / 2) / f * z_prev
            P = np.stack([X, Y, z_prev, np.ones_like(X)], -1)
            Pc = (gt_delta @ P.T).T
            ok_f = (Pc[:, 2] > 0.5) & (z_prev > 0)
            u_pred = Pc[ok_f, 0] / Pc[ok_f, 2] * f + W / 2
            # radial component relative to FOE (~image center here)
            r_meas = u1[ok_f] - W / 2
            r_pred = u_pred - W / 2
            flow_biases.append(np.median((r_meas - r_pred) * np.sign(r_pred)))
        prev_fr = fr

    print(f"[vo_diag] median disparity bias vs GT over {n-1} frames:")
    print(f"  current pair (u1 - u2c):  {np.median(dcur_biases):+.4f} px")
    print(f"  previous pair (u1p - u2p): {np.median(dprev_biases):+.4f} px")
    print(f"  radial flow bias (meas - pred along radial dir): "
          f"{np.median(flow_biases):+.4f} px")


if __name__ == "__main__":
    main()
