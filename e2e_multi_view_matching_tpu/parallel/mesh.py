"""Mesh + sharding helpers.

Axes:
- "data": batch data parallelism (the reference's DDP, `train.py:349-355`).
  Batches are sharded on their leading axis; gradients all-reduce via the psum
  pjit inserts.
- "model": tensor parallelism for wide parameter matrices. Kernels whose last
  dimension divides the axis size are sharded column-wise; everything else is
  replicated. XLA inserts the all-gathers/reduce-scatters over ICI.

Multi-host: call `jax.distributed.initialize()` before `make_mesh` (the
replacement for `init_process_group(backend="nccl")`).
"""

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices=None, model_parallel=1, devices=None):
    """Create a ("data", "model") mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if n % model_parallel != 0:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    arr = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, axis_names=("data", "model"))


def replicate(tree, mesh):
    """Fully replicated sharding for a pytree."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch(batch, mesh):
    """Shard every array's leading (batch) axis over "data"."""
    def shard(x):
        spec = P("data", *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(shard, batch)


def param_sharding_spec(params, mesh, min_dim=256):
    """PartitionSpec pytree: shard wide kernel output dims over "model".

    Kernels (ndim >= 2) whose last dimension is divisible by the model-axis size
    and at least `min_dim` are split column-wise (Megatron-style column
    parallel); all other leaves are replicated. With model_parallel == 1 this
    degrades to full replication.
    """
    m = mesh.shape["model"]

    def spec(x):
        if x.ndim >= 2 and m > 1 and x.shape[-1] % m == 0 and x.shape[-1] >= min_dim:
            return P(*([None] * (x.ndim - 1)), "model")
        return P()

    return jax.tree.map(spec, params)


def shard_params(params, mesh, min_dim=256):
    """Place parameters according to `param_sharding_spec`."""
    specs = param_sharding_spec(params, mesh, min_dim)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )
