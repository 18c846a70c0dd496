"""Multi-chip sharding for training and batch evaluation.

The reference is strictly single-process/single-GPU (SURVEY.md §2.3); the
only parallel axes its workloads expose are (a) batch/data parallelism
over frames or training examples and (b) tensor parallelism over model
channels for the learned-disparity model. Both are expressed here with
`jax.sharding.Mesh` + NamedSharding and plain `jit` — XLA inserts the ICI
collectives (psum for grads under DP, all-gathers for the channel-sharded
convolutions under TP).

Mesh layout: ("data", "model"). DP shards the batch axis; TP shards the
widest conv kernels' output-channel axis. On one chip both axes are 1 and
everything degenerates to the single-device program.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              model_axis: int = 1,
              backend: Optional[str] = None) -> Mesh:
    """A ("data", "model") mesh over the first n devices (of `backend`)."""
    devs = jax.devices(backend) if backend else jax.devices()
    n = n_devices or len(devs)
    assert n % model_axis == 0, "n_devices must divide by model_axis"
    arr = np.array(devs[:n]).reshape(n // model_axis, model_axis)
    return Mesh(arr, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _param_spec(path_str: str, value: jnp.ndarray) -> P:
    """Tensor-parallel layout: shard large conv kernels on their output-
    channel axis; replicate everything else."""
    if value.ndim == 4 and value.shape[-1] >= 64:
        return P(None, None, None, "model")
    if value.ndim == 1 and value.shape[0] >= 64:
        return P("model")
    return P()


def shard_params(mesh: Mesh, params) -> Any:
    """Place a flax param pytree on the mesh with the TP layout."""
    def place(path, v):
        spec = _param_spec(jax.tree_util.keystr(path), v)
        return jax.device_put(v, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


def shard_batch(mesh: Mesh, batch) -> Any:
    """Shard every array's leading (batch) axis along "data"."""
    s = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), batch)


def make_sharded_train_step(mesh: Mesh, train_step):
    """jit the pure train step with DP inputs + TP/replicated params; XLA
    derives gradient psums and activation collectives from the shardings."""

    def step(params, opt_state, batch):
        batch = jax.lax.with_sharding_constraint(
            batch, NamedSharding(mesh, P("data"))
        )
        return train_step(params, opt_state, batch)

    return jax.jit(step)


def make_sharded_apply(mesh: Mesh, apply_fn):
    """Data-parallel batched inference (e.g. disparity for many frames at
    once — the batch-evaluation axis over ICI)."""

    def run(params, left, right):
        left = jax.lax.with_sharding_constraint(
            left, NamedSharding(mesh, P("data"))
        )
        right = jax.lax.with_sharding_constraint(
            right, NamedSharding(mesh, P("data"))
        )
        return apply_fn(params, left, right)

    return jax.jit(run)
