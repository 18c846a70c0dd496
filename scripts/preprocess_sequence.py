"""Offline sequence preprocessing — the `preprocess-sequence.sh` role.

Takes a raw stereo sequence (KITTI odometry or tracking layout: just
images + calibration) and emits the precomputed dumps the reference
pipeline consumes (ref: scripts/preprocess-sequence.sh:161-215 runs
DispNet + MNC docker images to produce them):

- `precomputed-depth/Frames/%04d.xml`       OpenCV XML int16 depth-mm
  (the ELAS-role dump, read back by PrecomputedDepthProvider)
- `precomputed-depth-dispnet/%06d.pfm`      float disparity PFM
  (the DispNet-role dump)
- `seg_image_2/mnc/%06d.png.%04d.{result,mask}.txt` + `cls_%06d.png`
  (the MNC-role dump, optional: needs trained SegNet params)

Depth comes from the in-framework TPU census stereo matcher
(ops/stereo.py, the libelas equivalent); segmentation from the
in-framework SegNet-lite (models/segnet.py, the MNC equivalent) with
params trained via its train step (see tests/test_segnet.py) and saved
with `segnet.save_params`.

Usage:
  python scripts/preprocess_sequence.py --dataset_root /path/to/seq
  python scripts/preprocess_sequence.py --dataset_root /path/to/kitti-tracking \
      --dataset_type kitti-tracking --sequence_id 6 \
      --seg_params segnet.msgpack --cpu
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset_root", required=True)
    p.add_argument("--dataset_type", default="kitti-odometry",
                   choices=["kitti-odometry", "kitti-tracking"])
    p.add_argument("--sequence_id", type=int, default=0,
                   help="kitti-tracking sequence id")
    p.add_argument("--frames", type=int, default=-1,
                   help="limit the number of frames (-1 = all)")
    p.add_argument("--max_disparity", type=int, default=128)
    p.add_argument("--fill_gaps", type=int, default=8,
                   help="ELAS-role horizontal gap interpolation (px, 0=off)")
    p.add_argument("--min_depth_m", type=float, default=0.5)
    p.add_argument("--max_depth_m", type=float, default=20.0)
    p.add_argument("--no_xml", action="store_true",
                   help="skip the ELAS-role XML depth dump")
    p.add_argument("--no_pfm", action="store_true",
                   help="skip the DispNet-role PFM disparity dump")
    p.add_argument("--seg_params", default="",
                   help="SegNet params (segnet.save_params msgpack); "
                        "empty = skip segmentation dumps")
    p.add_argument("--seg_threshold", type=float, default=0.5)
    p.add_argument("--min_detection_size", type=int, default=45)
    p.add_argument("--overwrite", action="store_true",
                   help="regenerate dumps even if present (the reference "
                        "script skips sequences that already have them)")
    p.add_argument("--cpu", action="store_true", help="force the CPU backend")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from dynslam_tpu.config import StereoMatcherParams
    from dynslam_tpu.io import input as dyn_input
    from dynslam_tpu.io.calib import read_kitti_calibration
    from dynslam_tpu.io.segmentation import write_mnc_dump
    from dynslam_tpu.ops import stereo
    from dynslam_tpu.utils.pfm import write_pfm

    root = args.dataset_root
    if args.dataset_type == "kitti-tracking":
        cfg = dyn_input.kitti_tracking_config(args.sequence_id)
    else:
        cfg = dyn_input.kitti_odometry_config()

    left_dir = os.path.join(root, cfg.left_color_folder)
    right_dir = os.path.join(root, cfg.right_color_folder)
    if not (os.path.isdir(left_dir) and os.path.isdir(right_dir)):
        raise SystemExit(
            f"stereo folders missing: {left_dir!r} / {right_dir!r} "
            f"(expected the {args.dataset_type} layout)"
        )
    calib = read_kitti_calibration(os.path.join(root, cfg.calibration_fname))
    scal = calib.stereo_calibration()
    print(f"[preprocess] f={scal.focal_length_px:.1f} B={scal.baseline_m:.3f} m")

    n_frames = len([f for f in os.listdir(left_dir) if f.endswith(".png")])
    if args.frames > 0:
        n_frames = min(n_frames, args.frames)

    xml_dir = os.path.join(root, cfg.depth_folder)
    dispnet_cfg = (
        dyn_input.kitti_tracking_dispnet_config(args.sequence_id)
        if args.dataset_type == "kitti-tracking"
        else dyn_input.kitti_odometry_dispnet_config()
    )
    pfm_dir = os.path.join(root, dispnet_cfg.depth_folder)
    seg_dir = os.path.join(root, cfg.segmentation_folder)
    if not args.no_xml:
        os.makedirs(xml_dir, exist_ok=True)
    if not args.no_pfm:
        os.makedirs(pfm_dir, exist_ok=True)

    # "already segmented / already computed" fast path (the reference
    # script's check, preprocess-sequence.sh:186-193,241-247)
    if not args.overwrite:
        last_xml = os.path.join(xml_dir, cfg.depth_fname_format % (n_frames - 1))
        if not args.no_xml and os.path.exists(last_xml):
            print("[preprocess] depth dumps already present; "
                  "use --overwrite to regenerate")
            args.no_xml = args.no_pfm = True

    params = StereoMatcherParams(
        max_disparity=args.max_disparity, fill_gaps=args.fill_gaps
    )

    seg_provider = None
    if args.seg_params:
        import cv2

        from dynslam_tpu.models import segnet

        probe = cv2.imread(
            os.path.join(left_dir, cfg.fname_format % 0)
        )
        model = segnet.create_model()
        seg_params = segnet.load_params(
            args.seg_params, model, probe.shape[0], probe.shape[1]
        )
        seg_provider = segnet.LearnedSegmentationProvider(
            model, seg_params, threshold=args.seg_threshold,
            min_detection_size_px=args.min_detection_size,
        )
        os.makedirs(seg_dir, exist_ok=True)

    import cv2

    for f in range(n_frames):
        left = cv2.imread(os.path.join(left_dir, cfg.fname_format % f))[..., ::-1]
        right = cv2.imread(os.path.join(right_dir, cfg.fname_format % f))[..., ::-1]

        if not (args.no_xml and args.no_pfm):
            disp = np.asarray(stereo.compute_disparity(left, right, params))
            if not args.no_pfm:
                write_pfm(os.path.join(pfm_dir, "%06d.pfm" % f), disp)
            if not args.no_xml:
                with np.errstate(divide="ignore"):
                    depth_m = np.where(
                        disp > 0.0,
                        scal.focal_length_px * scal.baseline_m / np.maximum(disp, 1e-6),
                        0.0,
                    )
                depth_mm = np.where(
                    (depth_m >= args.min_depth_m) & (depth_m <= args.max_depth_m),
                    np.clip(depth_m * 1000.0, 0, 32767),
                    0,
                ).astype(np.int16)
                fs = cv2.FileStorage(
                    os.path.join(xml_dir, cfg.depth_fname_format % f),
                    cv2.FILE_STORAGE_WRITE,
                )
                fs.write("depth", depth_mm)
                fs.release()

        if seg_provider is not None:
            dets = seg_provider.raw_detections(left)
            write_mnc_dump(
                seg_dir, f, dets, preview=seg_provider.get_seg_preview()
            )

        if f % 25 == 0 or f == n_frames - 1:
            print(f"[preprocess] frame {f + 1}/{n_frames}", flush=True)

    print(f"[preprocess] done: {n_frames} frames under {root}")
    print("[preprocess] run e.g.:")
    print(f"  python -m dynslam_tpu.main --dataset_root {root}"
          + (" --use_dispnet" if args.no_xml else ""))


if __name__ == "__main__":
    main()
