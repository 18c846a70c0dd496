"""DispNet-lite model + multi-chip sharding tests (8 virtual CPU devices
via conftest)."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from dynslam_tpu.models import dispnet
from dynslam_tpu.parallel import sharding


@pytest.fixture(scope="module")
def model_and_params():
    model = dispnet.create_model(max_disparity=32.0)
    params = dispnet.init_params(model, jax.random.PRNGKey(0), 64, 96)
    return model, params


class TestDispNet:
    def test_forward_shape_and_range(self, model_and_params, rng):
        model, params = model_and_params
        left = jnp.asarray(rng.uniform(0, 255, (2, 64, 96, 3)), jnp.float32)
        right = jnp.asarray(rng.uniform(0, 255, (2, 64, 96, 3)), jnp.float32)
        disp = model.apply(params, left, right)
        assert disp.shape == (2, 64, 96)
        assert float(jnp.min(disp)) >= 0.0
        assert float(jnp.max(disp)) <= 32.0

    def test_training_reduces_loss(self, model_and_params, rng):
        model, params = model_and_params
        opt = optax.adam(3e-3)
        opt_state = opt.init(params)
        step = jax.jit(dispnet.make_train_step(model, opt))
        batch = {
            "left": jnp.asarray(rng.uniform(0, 255, (2, 64, 96, 3)), jnp.float32),
            "right": jnp.asarray(rng.uniform(0, 255, (2, 64, 96, 3)), jnp.float32),
            "disparity": jnp.full((2, 64, 96), 7.0),
            "valid": jnp.ones((2, 64, 96), bool),
        }
        losses = []
        for _ in range(8):
            params, opt_state, loss = step(params, opt_state, batch)
            losses.append(float(loss))
        assert losses[-1] < losses[0] * 0.7, losses


class TestSharding:
    def test_mesh_layout(self):
        mesh = sharding.make_mesh(8, model_axis=2)
        assert mesh.shape == {"data": 4, "model": 2}

    def test_sharded_train_step_matches_single_device(self, model_and_params, rng):
        model, params = model_and_params
        opt = optax.adam(1e-3)
        opt_state = opt.init(params)
        batch = {
            "left": jnp.asarray(rng.uniform(0, 255, (8, 64, 96, 3)), jnp.float32),
            "right": jnp.asarray(rng.uniform(0, 255, (8, 64, 96, 3)), jnp.float32),
            "disparity": jnp.full((8, 64, 96), 5.0),
            "valid": jnp.ones((8, 64, 96), bool),
        }
        step = dispnet.make_train_step(model, opt)
        p1, _, loss1 = jax.jit(step)(params, opt_state, batch)

        mesh = sharding.make_mesh(8, model_axis=2)
        sp = sharding.shard_params(mesh, params)
        sb = sharding.shard_batch(mesh, batch)
        sstep = sharding.make_sharded_train_step(mesh, step)
        with mesh:
            p8, _, loss8 = sstep(sp, opt_state, sb)
        assert float(loss1) == pytest.approx(float(loss8), rel=1e-4)
        # parameters agree after one step
        l1 = jax.tree_util.tree_leaves(p1)
        l8 = jax.tree_util.tree_leaves(p8)
        for a, b in zip(l1, l8):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5)

    def test_sharded_inference_batch_eval(self, model_and_params, rng):
        """Data-parallel disparity over a batch of frames (the multi-chip
        batch-evaluation axis)."""
        model, params = model_and_params
        mesh = sharding.make_mesh(8, model_axis=1)
        run = sharding.make_sharded_apply(
            mesh, lambda p, l, r: model.apply(p, l, r)
        )
        left = jnp.asarray(rng.uniform(0, 255, (16, 64, 96, 3)), jnp.float32)
        right = left
        sp = sharding.shard_params(mesh, params)
        with mesh:
            disp = run(sp, left, right)
        assert disp.shape == (16, 64, 96)
        single = model.apply(params, left[:2], right[:2])
        np.testing.assert_allclose(np.asarray(disp[:2]), np.asarray(single),
                                   atol=1e-4)

    @pytest.mark.slow
    def test_graft_dryrun(self):
        import __graft_entry__ as g

        g.dryrun_multichip(8)
