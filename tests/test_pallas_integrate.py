"""Parity test: the Pallas fusion kernel (interpret mode on CPU) must
match the XLA integrate wherever the per-block window covers the
projection (everywhere on this far-field test scene)."""

import numpy as np
import jax.numpy as jnp
import pytest

from dynslam_tpu.config import Intrinsics
from dynslam_tpu.io.synthetic import SyntheticScene, render_frame
from dynslam_tpu.ops import tsdf
from dynslam_tpu.ops.pallas_integrate import integrate_pallas

W, H = 256, 160
INTR = Intrinsics(140.0, 140.0, W / 2, H / 2)
CFG = tsdf.TsdfConfig(
    pool_capacity=4096, local_dims=(48, 24, 48), max_new_blocks=2048,
    max_visible_blocks=1024, voxel_size=0.08, mu=0.32,
    width=W, height=H, fx=INTR.fx, fy=INTR.fy, cx=INTR.cx, cy=INTR.cy,
)


@pytest.fixture(scope="module")
def prepared():
    scene = SyntheticScene.default_scene(seed=7)
    fr = render_frame(scene, np.eye(4), INTR, W, H, supersample=1)
    depth = np.where(
        (fr["depth_m"] >= 2.5) & (fr["depth_m"] <= 19), fr["depth_m"], 0.0
    ).astype(np.float32)
    g = np.clip(fr["gray"] * 255, 0, 255).astype(np.uint8)
    rgb = np.stack([g, g // 2, g // 3], -1)

    state = tsdf.create_state(CFG)
    c2w = jnp.eye(4)
    origin = tsdf.compute_origin(CFG, c2w)
    grid = tsdf.build_local_grid(CFG, state, origin)
    state, grid, _ = tsdf.allocate(
        CFG, state, grid, origin, jnp.asarray(depth), c2w, jnp.int32(0)
    )
    slots, mask = tsdf.visible_blocks(CFG, state, grid, origin, jnp.eye(4))
    return state, slots, mask, jnp.asarray(rgb), jnp.asarray(depth)


class TestPallasIntegrateParity:
    def test_matches_xla_integrate(self, prepared):
        state, slots, mask, rgb, depth = prepared
        w2c = jnp.eye(4)
        ref = tsdf.integrate(CFG, state, slots, mask, rgb, depth, w2c,
                             jnp.int32(1))
        out = integrate_pallas(CFG, state, slots, mask, rgb, depth, w2c,
                               jnp.int32(1), interpret=True)

        sel = np.asarray(slots[np.asarray(mask)])
        ref_t = np.asarray(ref.tsdf_w)[sel]
        out_t = np.asarray(out.tsdf_w)[sel]
        match = (ref_t == out_t).mean()
        assert match > 0.995, f"packed voxel mismatch: {1 - match:.4f}"

        ref_c = np.asarray(ref.color)[sel]
        out_c = np.asarray(out.color)[sel]
        # colors averaged in f32 then packed: allow off-by-one per channel
        for shift in (16, 8, 0):
            dc = np.abs(((ref_c >> shift) & 0xFF).astype(int)
                        - ((out_c >> shift) & 0xFF).astype(int))
            assert (dc <= 1).mean() > 0.995

        # untouched rows stay untouched
        untouched = np.ones(CFG.pool_capacity, bool)
        untouched[sel] = False
        np.testing.assert_array_equal(
            np.asarray(out.tsdf_w)[untouched], np.asarray(state.tsdf_w)[untouched]
        )

    def test_weights_accumulate(self, prepared):
        state, slots, mask, rgb, depth = prepared
        w2c = jnp.eye(4)
        s1 = integrate_pallas(CFG, state, slots, mask, rgb, depth, w2c,
                              jnp.int32(1), interpret=True)
        s2 = integrate_pallas(CFG, s1, slots, mask, rgb, depth, w2c,
                              jnp.int32(2), interpret=True)
        w1 = np.asarray(s1.weight).max()
        w2 = np.asarray(s2.weight).max()
        assert w1 == 1.0 and w2 == 2.0
