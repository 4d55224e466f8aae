"""Distributed layer: mesh construction and sharding specs.

Replaces the reference's NCCL DDP setup (`/root/reference/train.py:272-277,
349-355`; SURVEY.md section 2.7) with XLA collectives over a
`jax.sharding.Mesh`: batch data-parallel over the "data" axis (DDP gradient
all-reduce becomes an XLA psum emitted by pjit), with an optional "model" axis
sharding the wide feed-forward kernels (tensor parallel) -- a capability the
reference does not have.
"""

from e2e_multi_view_matching_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    shard_params,
    replicate,
)
