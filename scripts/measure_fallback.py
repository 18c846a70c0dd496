#!/usr/bin/env python
"""Honest TPU timing of the oversized-mask full-frame fallback executable
(fuse_slot_fullframe) and of its host-side preparation, with fresh-entropy
inputs (the relay memoizes identical computations)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    import bench
    from dynslam_tpu.pipeline.fused_dynamic import (
        FusedDynamicPipeline, fuse_slot_fullframe,
    )

    W, H = bench.W, bench.H
    cfg = bench.bench_config(dynamic=True)
    engine = FusedDynamicPipeline(cfg, cfg.calibration)
    print(f"[measure] devices: {jax.devices()}", file=sys.stderr)

    rng = np.random.default_rng()

    from dynslam_tpu.ops import tsdf

    one = tsdf.create_state(engine.icfg)
    inst = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[None], (engine.S,) + x.shape).copy(),
        one,
    )
    fidx = jnp.zeros(engine.S, jnp.int32)

    # a close car: ~600x250 mask at z ~ 3-6 m
    for rep in range(6):
        t0 = time.perf_counter()
        depth = np.zeros((H, W), np.float32)
        mask = np.zeros((H, W), bool)
        mask[60:310, 300:900] = True
        depth[mask] = rng.uniform(3.0, 6.0, mask.sum()).astype(np.float32)
        rgb = rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
        t_host = time.perf_counter() - t0

        t0 = time.perf_counter()
        d_dev = jnp.asarray(depth)
        r_dev = jnp.asarray(rgb)
        m_dev = jnp.asarray(mask)
        t_up = time.perf_counter() - t0

        t0 = time.perf_counter()
        inst, fidx = fuse_slot_fullframe(
            engine.icfg, engine.use_pallas, True,
            inst, fidx, jnp.int32(rep % engine.S),
            d_dev, r_dev, m_dev,
            jnp.eye(4, dtype=jnp.float32), jnp.bool_(rep == 0),
            engine.intr_vec, jnp.float32(1.0), jnp.int32(200),
        )
        np.asarray(fidx)  # force completion
        t_dev = time.perf_counter() - t0
        print(f"[measure] rep {rep}: host prep {t_host * 1e3:.1f} ms, "
              f"upload {t_up * 1e3:.1f} ms, dispatch+run "
              f"{t_dev * 1e3:.1f} ms", file=sys.stderr)


if __name__ == "__main__":
    main()
