"""Subprocess entry for the multi-host training rehearsal.

Launched by tests/test_multihost.py as N coordinated processes, each with its
own slice of a virtual CPU device mesh (`--xla_force_host_platform_device_count`
set by the parent via XLA_FLAGS). Runs the REAL CLI trainer
(`cli.train.main`) for a few steps and dumps the final parameters, so the test
can assert the multi-process run reproduces the single-process one -- the
rehearsal the reference covers with its DDP launch
(`/root/reference/train.py:272-277`).

Usage: python multihost_runner.py <num_processes> <process_id> <port> \
           <data_dir> <ckpt_dir> <out_npz>
"""

import os
import sys

num_processes = int(sys.argv[1])
process_id = int(sys.argv[2])
port = sys.argv[3]
data_dir, ckpt_dir, out_npz = sys.argv[4:7]

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
if num_processes > 1:
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=num_processes,
        process_id=process_id,
    )

import numpy as np  # noqa: E402

from e2e_multi_view_matching_tpu.cli import train as train_cli  # noqa: E402

state = train_cli.main([
    "--data_dir", data_dir, "--checkpoint_dir", ckpt_dir,
    "--dataset", "scannet", "--tuple_size", "2", "--batch_size", "2",
    "--n_epochs", "2", "--max_steps", "3", "--i_train", "1",
    "--sinkhorn_iterations", "10", "--no_tensorboard",
    # first-step PRE-ADAM gradients: the parity quantity (Adam amplifies
    # reduction-order ulps on near-zero grads into sign flips)
    "--dump_first_grad", out_npz + ".grad",
])

leaves = jax.tree_util.tree_leaves(state.params)
flat = {
    f"p{i}": np.asarray(jax.device_get(leaf.addressable_data(0)))
    for i, leaf in enumerate(leaves)
}
flat["step"] = np.asarray(int(state.step))
np.savez(out_npz, **flat)
print(f"runner proc {process_id}: step={int(state.step)} saved {out_npz}",
      flush=True)
