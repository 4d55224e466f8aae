"""Checkpoint save/load with the reference's file naming and grafting semantics.

Contract (`/root/reference/helpers.py:27-61`, `train.py:124-129,370-385`):
- files `last_model.ckpt`, `{epoch:06d}_model.ckpt`, `best_model.ckpt`,
  pretrained `model.ckpt`; `model_id` None/'last'/'best'/int selects one.
- payload: epoch, model, optimizer, min_val_loss, pose_match_ratio.
- stage-1 -> stage-2 grafting: loading a checkpoint without conf_mlp weights
  into a conf_mlp model keeps the fresh conf_mlp params (strict=False load) and
  keeps the fresh optimizer slots for the new group.

Serialization is flax msgpack (`to_bytes`/`from_bytes`) -- single-file, no
directory layout requirements, works from any host in a multi-host job (only
process 0 writes).
"""

import json
import os

import jax
import numpy as np
from flax import serialization
from flax import traverse_util


def _ckpt_name(model_id, file_suffix="model"):
    if model_id is None:
        return f"{file_suffix}.ckpt"
    if isinstance(model_id, int):
        return f"{model_id:0>6}_{file_suffix}.ckpt"
    return f"{model_id}_{file_suffix}.ckpt"


def save_checkpoint(exp_dir, file_name, state, epoch, min_val_loss):
    """Serialize a TrainState (+ scalars) to `<exp_dir>/<file_name>`."""
    payload = {
        "epoch": np.asarray(epoch),
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
        "opt_state": jax.device_get(state.opt_state),
        "step": jax.device_get(state.step),
        "min_val_loss": np.asarray(min_val_loss),
        "pose_match_ratio": jax.device_get(state.pose_match_ratio),
    }
    data = serialization.to_bytes(payload)
    path = os.path.join(exp_dir, file_name)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)
    return path


def _graft(template, loaded):
    """strict=False load: use loaded leaves where paths match, keep template
    leaves (e.g. fresh conf_mlp) elsewhere; report both mismatch sets."""
    t_flat = traverse_util.flatten_dict(template, sep="/")
    l_flat = traverse_util.flatten_dict(loaded, sep="/")
    missing = [k for k in t_flat if k not in l_flat]
    unexpected = [k for k in l_flat if k not in t_flat]
    merged = {
        k: l_flat[k] if (k in l_flat and np.shape(l_flat[k]) == np.shape(t_flat[k])) else v
        for k, v in t_flat.items()
    }
    return traverse_util.unflatten_dict(merged, sep="/"), missing, unexpected


def load_checkpoint(exp_dir, state, model_id=None, file_suffix="model",
                    load_opt_state=True):
    """Load into an existing TrainState template (grafting like `load_ckpt`).

    Returns (state, epoch, min_val_loss, info dict with missing/unexpected keys).
    """
    path = os.path.join(exp_dir, _ckpt_name(model_id, file_suffix))
    with open(path, "rb") as f:
        data = f.read()
    template = {
        "epoch": np.asarray(0),
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
        "opt_state": jax.device_get(state.opt_state),
        "step": jax.device_get(state.step),
        "min_val_loss": np.asarray(1e6),
        "pose_match_ratio": jax.device_get(state.pose_match_ratio),
    }
    # Deserialize leniently: msgpack restore into a dict of raw trees first.
    raw = serialization.msgpack_restore(data)
    params, missing, unexpected = _graft(template["params"], raw.get("params", {}))
    batch_stats, _, _ = _graft(template["batch_stats"], raw.get("batch_stats", {}))
    new_state = state._replace(
        params=jax.tree.map(np.asarray, params),
        batch_stats=jax.tree.map(np.asarray, batch_stats),
        step=np.asarray(raw.get("step", 0)),
        pose_match_ratio=np.asarray(raw.get("pose_match_ratio", 0.0)),
    )
    if load_opt_state:
        try:
            opt_state = serialization.from_bytes(
                {"opt_state": template["opt_state"]},
                serialization.to_bytes({"opt_state": raw["opt_state"]}),
            )["opt_state"]
            new_state = new_state._replace(opt_state=opt_state)
        except (KeyError, ValueError):
            # optimizer-group mismatch (stage-1 ckpt into stage-2 optimizer):
            # keep the freshly initialized optimizer state, like the reference
            # appends new param groups (`helpers.py:54-59`).
            pass
    epoch = int(raw.get("epoch", 0))
    min_val_loss = float(np.asarray(raw.get("min_val_loss", 1e6)))
    return new_state, epoch, min_val_loss, {
        "missing": missing, "unexpected": unexpected,
    }


def save_config(exp_dir, cfg_dict):
    """Persist the run config as cfg.json (`train.py:290-305`)."""
    os.makedirs(exp_dir, exist_ok=True)
    with open(os.path.join(exp_dir, "cfg.json"), "w") as f:
        json.dump(cfg_dict, f, indent=4)


def load_config(exp_dir):
    with open(os.path.join(exp_dir, "cfg.json")) as f:
        return json.load(f)
