"""DispNet-lite: a learned stereo-disparity network — the in-framework
replacement for the reference's offline Caffe DispNet preprocessing
(`preprocessing/dispnet-flownet-docker`, consumed as PFM dumps,
Input.h:120-126). Where the reference shells out to a docker container,
this is a JAX/flax model whose output plugs into the same
disparity -> depth path (ops/depth.py), and whose training step is the
framework's multi-chip (data + tensor parallel) reference workload.

Architecture: siamese conv encoder -> correlation-free concat fusion ->
strided encoder + mirrored decoder with skip connections -> sigmoid
disparity scaled to max_disparity. Compact on purpose: the goal is a
trainable, shardable, MXU-friendly (NHWC conv, bf16-capable) model, not
SotA stereo.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class DispNetLite(nn.Module):
    features: Sequence[int] = (32, 64, 96, 128)
    max_disparity: float = 96.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, left: jnp.ndarray, right: jnp.ndarray) -> jnp.ndarray:
        """left/right: (B, H, W, C) in [0, 255]. Returns (B, H, W) disparity."""
        x = jnp.concatenate([left, right], axis=-1).astype(self.dtype) / 255.0

        skips = []
        for f in self.features:
            x = nn.Conv(f, (3, 3), strides=(2, 2), dtype=self.dtype)(x)
            x = nn.relu(x)
            x = nn.Conv(f, (3, 3), dtype=self.dtype)(x)
            x = nn.relu(x)
            skips.append(x)

        for f, skip in zip(reversed(self.features[:-1]), reversed(skips[:-1])):
            b, h, w, _ = skip.shape
            x = jax.image.resize(x, (b, h, w, x.shape[-1]), "bilinear")
            x = jnp.concatenate([x, skip], axis=-1)
            x = nn.Conv(f, (3, 3), dtype=self.dtype)(x)
            x = nn.relu(x)

        b = left.shape[0]
        h, w = left.shape[1], left.shape[2]
        x = jax.image.resize(x, (b, h, w, x.shape[-1]), "bilinear")
        x = nn.Conv(16, (3, 3), dtype=self.dtype)(x)
        x = nn.relu(x)
        disp = nn.Conv(1, (3, 3), dtype=self.dtype)(x)
        return nn.sigmoid(disp[..., 0].astype(jnp.float32)) * self.max_disparity


def create_model(max_disparity: float = 96.0, dtype=jnp.float32) -> DispNetLite:
    return DispNetLite(max_disparity=max_disparity, dtype=dtype)


def init_params(model: DispNetLite, rng, height: int, width: int,
                channels: int = 3):
    dummy = jnp.zeros((1, height, width, channels), jnp.float32)
    return model.init(rng, dummy, dummy)


def disparity_loss(model: DispNetLite, params, left, right, gt_disp,
                   valid_mask) -> jnp.ndarray:
    """Masked L1 (the standard disparity regression loss)."""
    pred = model.apply(params, left, right)
    err = jnp.abs(pred - gt_disp)
    m = valid_mask.astype(jnp.float32)
    return jnp.sum(err * m) / jnp.maximum(jnp.sum(m), 1.0)


def make_train_step(model: DispNetLite, optimizer):
    """(params, opt_state, batch) -> (params, opt_state, loss); pure and
    jittable — parallel/sharding.py wraps it with mesh shardings."""

    def train_step(params, opt_state, batch):
        def loss_fn(p):
            return disparity_loss(
                model, p, batch["left"], batch["right"],
                batch["disparity"], batch["valid"],
            )

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(
            lambda p, u: p + u, params, updates
        )
        return params, opt_state, loss

    return train_step
