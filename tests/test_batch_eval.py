"""Sequence-parallel batch evaluation of the SLAM mapping core on a
multi-device CPU mesh (SURVEY §2.3 data-parallel-over-sequences axis)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # tool/multichip coverage: full lane + driver dryrun

from dynslam_tpu.ops import tsdf
from dynslam_tpu.parallel import batch_eval, sharding


def _tiny_cfg():
    return tsdf.TsdfConfig(
        pool_capacity=2048,
        local_dims=(32, 16, 32),
        max_new_blocks=1024,
        max_visible_blocks=1536,
        voxel_size=0.1,
        mu=0.4,
        raycast_coarse_steps=16,
        raycast_fine_steps=14,
        width=96,
        height=64,
        fx=80.0,
        fy=80.0,
        cx=48.0,
        cy=32.0,
    )


def _frames(cfg, n_frames, n_seq):
    h, w = cfg.height, cfg.width
    rng = np.random.default_rng(7)
    vv, uu = np.mgrid[0:h, 0:w].astype(np.float32)
    depth = np.empty((n_frames, n_seq, h, w), np.float32)
    c2w = np.tile(np.eye(4, dtype=np.float32), (n_frames, n_seq, 1, 1))
    for s in range(n_seq):
        for t in range(n_frames):
            depth[t, s] = np.clip(
                3.0 + 0.5 * s + np.sin(uu / 30.0) + vv / 80.0, 0.8, 15.0
            )
            c2w[t, s, 2, 3] = 0.05 * t
    return {
        "rgb": jnp.asarray(
            rng.integers(0, 255, (n_frames, n_seq, h, w, 3)), jnp.uint8
        ),
        "depth": jnp.asarray(depth),
        "cam_to_world": jnp.asarray(c2w),
        "world_to_cam": jnp.asarray(np.linalg.inv(c2w)),
    }


@pytest.mark.parametrize("n_seq", [4])
def test_batch_eval_parallel_sequences(n_seq):
    if len(jax.devices()) < 4:
        pytest.skip("needs >=4 virtual devices")
    mesh = sharding.make_mesh(4, model_axis=1)
    cfg = _tiny_cfg()
    states = batch_eval.stacked_states(cfg, n_seq)
    frames = batch_eval.shard_frames(mesh, _frames(cfg, 3, n_seq))
    run = batch_eval.make_batch_eval(cfg, mesh)
    with mesh:
        states, metrics = run(states, frames)
    metrics = np.asarray(metrics)
    assert metrics.shape == (3, n_seq, 2)
    assert np.isfinite(metrics).all()
    # every sequence fused geometry: maps hit and the depth error is small
    assert (metrics[-1, :, 1] > 0.5).all()  # hit fraction
    assert (metrics[-1, :, 0] < 0.25).all()  # mean abs depth err (m)
    # sequences see different scenes -> different block usage
    used = np.asarray(jnp.sum(states.valid, axis=1))
    assert len(set(used.tolist())) > 1


def test_batch_eval_matches_single_sequence():
    """Sharded 2-sequence run reproduces the unsharded single-sequence
    result for sequence 0 (bitwise state parity)."""
    mesh = sharding.make_mesh(2, model_axis=1)
    cfg = _tiny_cfg()
    frames = _frames(cfg, 2, 2)

    run = batch_eval.make_batch_eval(cfg, mesh)
    states = batch_eval.stacked_states(cfg, 2)
    with mesh:
        states, metrics = run(states, batch_eval.shard_frames(mesh, frames))

    # reference: plain single-sequence loop on one device
    st = tsdf.create_state(cfg)
    for t in range(2):
        st, (err, hits) = batch_eval._fusion_eval_step(
            cfg, st,
            frames["rgb"][t, 0], frames["depth"][t, 0],
            frames["cam_to_world"][t, 0], frames["world_to_cam"][t, 0],
            jnp.int32(t),
        )
    np.testing.assert_allclose(
        np.asarray(metrics)[-1, 0, 0], float(err), rtol=1e-5
    )
    np.testing.assert_array_equal(
        np.asarray(states.tsdf_w[0]), np.asarray(st.tsdf_w)
    )


def test_dynamic_batch_eval_matches_single_sequence():
    """The sharded DYNAMIC step (cut + static fuse + instance fuse +
    composited eval) reproduces the unsharded single-sequence result —
    the multichip dryrun's flagship-path coverage (VERDICT r3 item 8)."""
    import dataclasses

    mesh = sharding.make_mesh(2, model_axis=1)
    cfg = _tiny_cfg()
    icfg = dataclasses.replace(
        cfg, pool_capacity=512, local_dims=(16, 12, 16),
        max_new_blocks=256, max_visible_blocks=512,
    )
    frames = _frames(cfg, 2, 2)
    h, w = cfg.height, cfg.width
    m = np.zeros((2, 2, h, w), bool)
    m[:, :, h // 3: h // 2, w // 3: w // 2] = True
    frames["obj_mask"] = jnp.asarray(m)

    run = batch_eval.make_dynamic_batch_eval(cfg, icfg, mesh)
    states = (batch_eval.stacked_states(cfg, 2),
              batch_eval.stacked_states(icfg, 2))
    with mesh:
        states, metrics = run(states, batch_eval.shard_frames(mesh, frames))
    metrics = np.asarray(metrics)
    assert metrics.shape == (2, 2, 3)
    assert np.isfinite(metrics).all()
    assert (metrics[-1, :, 2] > 0.5).all()  # composited coverage

    st = tsdf.create_state(cfg)
    it = tsdf.create_state(icfg)
    for t in range(2):
        (st, it), (err, derr, cov) = batch_eval._dynamic_fusion_eval_step(
            cfg, icfg, st, it,
            frames["rgb"][t, 0], frames["depth"][t, 0],
            frames["obj_mask"][t, 0],
            frames["cam_to_world"][t, 0], frames["world_to_cam"][t, 0],
            jnp.int32(t),
        )
    np.testing.assert_allclose(metrics[-1, 0, 0], float(err), rtol=1e-5)
    np.testing.assert_allclose(metrics[-1, 0, 1], float(derr), rtol=1e-5)
    np.testing.assert_array_equal(
        np.asarray(states[0].tsdf_w[0]), np.asarray(st.tsdf_w)
    )
    np.testing.assert_array_equal(
        np.asarray(states[1].tsdf_w[0]), np.asarray(it.tsdf_w)
    )
