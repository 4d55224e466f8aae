"""End-to-end smoke test of the CLI training driver on synthetic data."""

import json
import os

import numpy as np
import pytest

from e2e_multi_view_matching_tpu.data.synthetic import PlaneScene, write_scannet_format


@pytest.fixture(scope="module")
def train_env(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli_data")
    ckpt = tmp_path_factory.mktemp("ckpts")
    rng = np.random.default_rng(0)
    # tests run on an 8-device virtual mesh: the global batch is
    # batch_size * 8, so provide enough tuples for at least 2 batches
    for split in ("train", "val"):
        for s in range(3):
            scene = PlaneScene(rng, n_views=8, H=96, W=128)
            write_scannet_format(
                scene, str(root), scene_name=f"{split}scene{s:04d}_00", split=split,
            )
    return str(root), str(ckpt)


def test_train_cli_smoke(train_env, monkeypatch):
    data_dir, ckpt_dir = train_env
    from e2e_multi_view_matching_tpu.cli import train as train_cli

    state = train_cli.main([
        "--data_dir", data_dir, "--checkpoint_dir", ckpt_dir,
        "--dataset", "scannet", "--tuple_size", "3", "--batch_size", "1",
        "--n_epochs", "1", "--max_steps", "2", "--i_train", "1",
        "--sinkhorn_iterations", "10",
    ])
    assert int(state.step) == 2
    # experiment dir with cfg.json and checkpoints exists ("runs" holds the
    # TensorBoard event files)
    exps = [e for e in os.listdir(ckpt_dir) if e != "runs"]
    assert len(exps) == 1
    exp_dir = os.path.join(ckpt_dir, exps[0])
    cfg = json.load(open(os.path.join(exp_dir, "cfg.json")))
    assert cfg["dataset"] == "scannet"
    assert cfg["max_keypoints"] == 400  # dataset-conditional default applied
    assert os.path.exists(os.path.join(exp_dir, "last_model.ckpt"))
    assert os.path.exists(os.path.join(exp_dir, "best_model.ckpt"))
