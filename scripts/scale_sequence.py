#!/usr/bin/env python
"""Produce the low-resolution variant of a KITTI-layout sequence — the
equivalent of the reference's `scripts/scale_sequence.py` +
`preprocess-sequence.sh` pipeline (resize images, recompute depth and
segmentation at the new resolution), feeding the
`kitti_odometry_lowres_config(factor)` preset (io/input.py:78).

Outputs, for --scale F (reference folder-naming convention):
  image_0_F.2f/ image_1_F.2f/      gray pair   (from color if absent)
  image_2_F.2f/ image_3_F.2f/      color pair
  precomputed-depth-elas-F.2f/Frames/%04d.xml
      depth recomputed at the low resolution with the in-framework
      census stereo matcher (the libelas substitute) — NOT resized,
      matching the reference which reruns ELAS at the new size
  seg_image_2-F.2f/mnc/
      MNC dumps rescaled (bbox coords scaled, masks nearest-resized)

Usage:
  python scripts/scale_sequence.py --dataset_root <seq> --scale 0.5 [--cpu]
"""

import argparse
import glob
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def resize_images(src: str, dst: str, scale: float, force: bool,
                  to_gray: bool = False) -> int:
    import cv2
    import numpy as np

    if not os.path.isdir(src):
        return 0
    if os.path.isdir(dst) and not force:
        print(f"[scale] {dst} exists; skipping (use --force)")
        return len(os.listdir(dst))
    os.makedirs(dst, exist_ok=True)
    n = 0
    for fname in sorted(os.listdir(src)):
        if not fname.endswith((".png", ".jpg")):
            continue
        img = cv2.imread(os.path.join(src, fname), cv2.IMREAD_UNCHANGED)
        out = cv2.resize(img, None, fx=scale, fy=scale,
                         interpolation=cv2.INTER_AREA)
        if to_gray and out.ndim == 3:
            out = cv2.cvtColor(out, cv2.COLOR_BGR2GRAY)
        cv2.imwrite(os.path.join(dst, fname), out)
        n += 1
    print(f"[scale] {dst}: {n} images")
    return n


def compute_depth(root: str, scale: float, force: bool, cpu: bool) -> None:
    import cv2
    import numpy as np

    if cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from dynslam_tpu.config import StereoMatcherParams
    from dynslam_tpu.io.calib import read_kitti_calibration
    from dynslam_tpu.ops import stereo as stereo_ops

    out_dir = os.path.join(root, f"precomputed-depth-elas-{scale:.2f}",
                           "Frames")
    if os.path.isdir(out_dir) and not force:
        print(f"[scale] {out_dir} exists; skipping")
        return
    os.makedirs(out_dir, exist_ok=True)

    calib = read_kitti_calibration(os.path.join(root, "calib.txt"))
    fx = float(calib.proj_left_color[0, 0]) * scale
    baseline = float(
        abs(calib.proj_right_color[0, 3] / calib.proj_right_color[0, 0])
    )
    bf = baseline * fx

    left_dir = os.path.join(root, f"image_2_{scale:.2f}")
    right_dir = os.path.join(root, f"image_3_{scale:.2f}")
    params = StereoMatcherParams(max_disparity=max(32, int(128 * scale)))
    for i, fname in enumerate(sorted(os.listdir(left_dir))):
        lg = cv2.imread(os.path.join(left_dir, fname),
                        cv2.IMREAD_GRAYSCALE).astype(np.float32)
        rg = cv2.imread(os.path.join(right_dir, fname),
                        cv2.IMREAD_GRAYSCALE).astype(np.float32)
        disp = np.asarray(stereo_ops.compute_disparity_jit(
            jnp.asarray(lg), jnp.asarray(rg), params
        ))
        with np.errstate(divide="ignore"):
            depth_mm = np.where(disp > 0.1, bf / np.maximum(disp, 0.1) * 1000.0,
                                0.0)
        depth_mm = np.clip(depth_mm, 0, 32767).astype(np.int16)
        frame_no = int(re.search(r"(\d+)", fname).group(1))
        fs = cv2.FileStorage(os.path.join(out_dir, f"{frame_no:04d}.xml"),
                             cv2.FILE_STORAGE_WRITE)
        fs.write("depth", depth_mm)
        fs.release()
        if i % 25 == 0:
            print(f"[scale] depth {i + 1} frames", flush=True)
    print(f"[scale] depth -> {out_dir}")


def rescale_segmentation(root: str, scale: float, force: bool) -> None:
    import cv2
    import numpy as np

    src_dir = os.path.join(root, "seg_image_2", "mnc")
    if not os.path.isdir(src_dir):
        print("[scale] no seg_image_2/mnc dumps found; skipping segmentation")
        return
    dst_dir = os.path.join(root, f"seg_image_2-{scale:.2f}", "mnc")
    if os.path.isdir(dst_dir) and not force:
        print(f"[scale] {dst_dir} exists; skipping")
        return
    os.makedirs(dst_dir, exist_ok=True)

    n = 0
    for res_path in sorted(glob.glob(os.path.join(src_dir,
                                                  "*.result.txt"))):
        mask_path = res_path.replace(".result.txt", ".mask.txt")
        if not os.path.exists(mask_path):
            continue
        with open(res_path) as f:
            line = f.readline().strip()
        bracket, rest = line.split("]", 1)
        x0, y0, x1, y1 = (int(float(v))
                          for v in bracket.strip("[").split()[:4])
        nx0, ny0 = int(round(x0 * scale)), int(round(y0 * scale))
        nx1 = max(nx0, int(round(x1 * scale)))
        ny1 = max(ny0, int(round(y1 * scale)))
        mask = np.loadtxt(mask_path, dtype=np.uint8, ndmin=2)
        new_mask = cv2.resize(mask, (nx1 - nx0 + 1, ny1 - ny0 + 1),
                              interpolation=cv2.INTER_NEAREST)
        base = os.path.basename(res_path).replace(".result.txt", "")
        with open(os.path.join(dst_dir, base + ".result.txt"), "w") as f:
            f.write(f"[{nx0} {ny0} {nx1} {ny1} 0],{rest}\n")
        np.savetxt(os.path.join(dst_dir, base + ".mask.txt"), new_mask,
                   fmt="%d")
        n += 1
    print(f"[scale] segmentation -> {dst_dir} ({n} detections)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset_root", required=True)
    ap.add_argument("--scale", type=float, required=True)
    ap.add_argument("--force", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    root = args.dataset_root
    f = args.scale

    # color pairs + gray pairs (gray derived from color when image_0/1
    # are absent, as in synthetic sequences)
    resize_images(os.path.join(root, "image_2"),
                  os.path.join(root, f"image_2_{f:.2f}"), f, args.force)
    resize_images(os.path.join(root, "image_3"),
                  os.path.join(root, f"image_3_{f:.2f}"), f, args.force)
    for gray, color in (("image_0", "image_2"), ("image_1", "image_3")):
        src = os.path.join(root, gray)
        if not os.path.isdir(src):
            src = os.path.join(root, color)
        resize_images(src, os.path.join(root, f"{gray}_{f:.2f}"), f,
                      args.force, to_gray=True)

    compute_depth(root, f, args.force, args.cpu)
    rescale_segmentation(root, f, args.force)
    print("[scale] done")


if __name__ == "__main__":
    main()
