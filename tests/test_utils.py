"""Tests for config defaults, trackers, and logging utilities."""

import argparse

import numpy as np
import pytest

from e2e_multi_view_matching_tpu.utils.config import (
    add_generic_arguments,
    apply_dataset_defaults,
    get_exp_dir,
)
from e2e_multi_view_matching_tpu.utils.tblog import StepProfiler, TBWriter
from e2e_multi_view_matching_tpu.utils.trackers import MeanTracker, TimeTracker


def make_opt(dataset, tuple_size, pose_loss=False):
    parser = add_generic_arguments(argparse.ArgumentParser())
    opt = parser.parse_args(["--dataset", dataset, "--tuple_size", str(tuple_size)])
    opt.pose_loss = pose_loss
    return apply_dataset_defaults(opt)


class TestDatasetDefaults:
    def test_scannet(self):
        opt = make_opt("scannet", 5)
        assert (opt.max_keypoints, opt.nms_radius, opt.keypoint_threshold,
                opt.remove_borders) == (400, 4, 0.001, 12)
        assert opt.unmatch_reproj_err == 15.0
        assert (opt.gnn_layers, opt.cross_attention_layers) == (7, 3)

    def test_scannet_pairs_gnn(self):
        opt = make_opt("scannet", 2)
        assert (opt.gnn_layers, opt.cross_attention_layers) == (9, 1)

    def test_megadepth(self):
        opt = make_opt("megadepth", 2)
        assert (opt.max_keypoints, opt.nms_radius, opt.keypoint_threshold) == (
            1024, 3, 0.005)
        assert opt.unmatch_reproj_err == 10.0
        assert opt.n_samples == 200
        assert make_opt("megadepth", 5).n_samples == 100
        assert (opt.gnn_layers, opt.cross_attention_layers) == (9, 1)

    def test_pose_weights(self):
        # exact table from `train.py:218-254`
        cases = {
            ("scannet", 2): (1597.0, 270.0),
            ("scannet", 5): (726.0, 244.0),
            ("matterport", 2): (717.0, 591.0),
            ("matterport", 5): (240.0, 263.0),
            ("megadepth", 2): (710.0, 348.0),
            ("megadepth", 5): (661.0, 366.0),
        }
        for (ds, ts), (rw, tw) in cases.items():
            opt = make_opt(ds, ts, pose_loss=True)
            assert (opt.rot_weight, opt.trans_weight) == (rw, tw), (ds, ts)
            assert opt.grad_clip == 0.1

    def test_no_pose_loss_disables_clip(self):
        opt = make_opt("scannet", 5, pose_loss=False)
        assert opt.grad_clip == -1.0 and opt.rot_weight == 0.0

    def test_unknown_dataset_raises(self):
        with pytest.raises(ValueError):
            make_opt("kitti", 2)

    def test_unknown_tuple_size_pose_weights_raises(self):
        with pytest.raises(ValueError):
            make_opt("scannet", 3, pose_loss=True)


class TestTrackers:
    def test_mean_tracker_weighted(self):
        t = MeanTracker()
        t.add({"loss": 1.0}, weight=1.0)
        t.add({"loss": 3.0}, weight=3.0)
        np.testing.assert_allclose(t.get("loss"), 2.5)
        assert t.has("loss") and not t.has("acc")
        t.reset()
        assert not t.has("loss")

    def test_time_tracker(self):
        t = TimeTracker()
        t.start_batch()
        t.finish_batch()
        assert t.get_batch_time() >= 0.0
        assert t.get_iteration_time() >= 0.0


class TestTBLog:
    def test_writer_noop_when_disabled(self, tmp_path):
        w = TBWriter(str(tmp_path), "exp", enabled=False)
        w.scalars("loss", {"train": 1.0}, 0)  # must not raise or create files
        assert not (tmp_path / "runs").exists()

    def test_writer_writes_events(self, tmp_path):
        w = TBWriter(str(tmp_path), "exp", enabled=True)
        w.scalars("loss", {"train": 1.0}, 0)
        w.flush()
        assert (tmp_path / "runs" / "exp").exists()

    def test_step_profiler_inactive_without_window(self):
        p = StepProfiler(None, None, None)
        p.maybe_start(0)
        assert not p.maybe_stop(10)

    def test_exp_dir(self):
        d, cfg = get_exp_dir("/ckpts", "foo")
        assert d == "/ckpts/foo" and cfg == "/ckpts/foo/cfg.json"
