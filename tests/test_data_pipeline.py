"""Tests for the host data pipeline on a materialized synthetic ScanNet tree."""

import os

import numpy as np
import pytest

from e2e_multi_view_matching_tpu.data.sampling import create_sequential_subsets
from e2e_multi_view_matching_tpu.data.synthetic import PlaneScene, write_scannet_format
from e2e_multi_view_matching_tpu.data.tuples import MatchingTupleDataset, batch_iterator


@pytest.fixture(scope="module")
def scannet_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    rng = np.random.default_rng(0)
    scenes = []
    for s in range(2):
        scene = PlaneScene(rng, n_views=8, H=96, W=128)
        name = f"scene{s:04d}_00"
        write_scannet_format(scene, str(root), scene_name=name, split="train")
        scenes.append((name, scene))
    return str(os.path.join(root, "scannet")), scenes


class TestTupleDataset:
    def test_samples_tuples_and_loads(self, scannet_tree):
        root, scenes = scannet_tree
        ds = MatchingTupleDataset(root, split="train", tuple_size=3, n_samples=4)
        assert len(ds) > 0
        sample = ds[0]
        V = 3
        assert sample["images"].shape[0] == V
        assert sample["images"].shape[-1] == 1
        assert sample["intr"].shape == (V, 4, 4)
        assert sample["poses"].shape == (V, 4, 4)
        assert sample["depths"].shape[0] == V
        assert 0.0 <= sample["images"].min() and sample["images"].max() <= 1.0
        # depth round trip: mm png -> meters, nonzero on the plane
        assert sample["depths"].max() > 1.0

    def test_start_epoch_resamples(self, scannet_tree):
        root, _ = scannet_tree
        ds = MatchingTupleDataset(root, split="train", tuple_size=3, n_samples=4, seed=1)
        first = list(ds.sampled_tuples)
        ds.start_epoch()
        second = list(ds.sampled_tuples)
        assert first != second  # stochastic resampling

    def test_tuple_ids_are_distinct(self, scannet_tree):
        root, _ = scannet_tree
        ds = MatchingTupleDataset(root, split="train", tuple_size=4, n_samples=4)
        for scene, ids in ds.sampled_tuples:
            assert len(set(ids)) == len(ids)

    def test_fixed_tuple_csv_roundtrip(self, scannet_tree, tmp_path):
        root, _ = scannet_tree
        ds = MatchingTupleDataset(root, split="train", tuple_size=3, n_samples=4)
        path = str(tmp_path / "tuples.csv")
        ds.write_sampled_tuples(path, n=3)
        before = ds.sampled_tuples[:3]
        ds.read_sampled_tuples(path)
        assert [tuple(t[1]) for t in ds.sampled_tuples] == [tuple(t[1]) for t in before]

    def test_batch_iterator(self, scannet_tree):
        root, _ = scannet_tree
        ds = MatchingTupleDataset(root, split="train", tuple_size=3, n_samples=4)
        batches = list(batch_iterator(ds, batch_size=2, shuffle=True))
        assert len(batches) == len(ds) // 2
        b = batches[0]
        assert b["images"].shape[:2] == (2, 3)
        assert b["poses"].shape == (2, 3, 4, 4)

    def test_color_jitter_changes_images(self, scannet_tree):
        root, _ = scannet_tree
        ds_a = MatchingTupleDataset(root, split="train", tuple_size=3, n_samples=4, seed=3)
        ds_b = MatchingTupleDataset(root, split="train", tuple_size=3, n_samples=4,
                                    jitter=0.2, seed=3)
        sa = ds_a[0]
        sb = ds_b[0]
        assert sa["ids"] == sb["ids"]
        assert not np.allclose(sa["images"], sb["images"])

    def test_gt_matches_from_loaded_data(self, scannet_tree):
        """Loaded depth/pose produce GT matches for exact correspondences."""
        import jax.numpy as jnp

        from e2e_multi_view_matching_tpu.data.gt_matches import gt_matches_of_pair

        root, scenes = scannet_tree
        name, scene = scenes[0]
        ds = MatchingTupleDataset(root, split="train", tuple_size=2, n_samples=4)
        # find a tuple from scene 0
        for sc, ids in ds.sampled_tuples:
            if sc == name:
                break
        sample = ds[[i for i, t in enumerate(ds.sampled_tuples) if t[0] == name][0]]
        v0, v1 = sample["ids"]
        rng = np.random.default_rng(0)
        pix0, pix1 = scene.correspondences(v0, v1, 32, rng)
        pad = rng.uniform([10, 10], [117, 85], size=(16, 2)).astype(np.float32)
        k0 = np.concatenate([pix0, pad])[None]
        k1 = np.concatenate([pix1, pad])[None]
        gi, _ = gt_matches_of_pair(
            jnp.asarray(k0), jnp.asarray(k1),
            jnp.asarray(sample["intr"][0][None]), jnp.asarray(sample["intr"][1][None]),
            jnp.asarray((np.linalg.inv(sample["poses"][1]) @ sample["poses"][0])[None]),
            jnp.asarray(sample["depths"][0][None]), jnp.asarray(sample["depths"][1][None]),
        )
        gi = np.asarray(gi)[0]
        n = len(pix0)
        frac = np.mean(gi[0, :n] == np.arange(n))
        assert frac > 0.7, frac


@pytest.fixture(scope="module")
def matterport_tree(tmp_path_factory):
    """Matterport layout: scannet tree with per-image intrinsic/<id>.txt,
    cx offset by 0.5*id so the test can detect which file was read."""
    root = tmp_path_factory.mktemp("mpdata")
    rng = np.random.default_rng(1)
    scene = PlaneScene(rng, n_views=6, H=96, W=128)
    write_scannet_format(scene, str(root), scene_name="17DRP5sb8fy_r0",
                         split="train", dataset="matterport",
                         per_image_intr_cx_step=0.5)
    return str(os.path.join(root, "matterport")), scene


class TestMatterportLayout:
    def _check(self, ds, scene):
        sample = ds[0]
        assert sample["images"].shape == (2, 96, 128, 1)
        assert sample["intr"].shape == (2, 4, 4)
        assert sample["depths"].max() > 1.0
        cx = scene.intr[0][0, 2]
        for v, id in enumerate(sample["ids"]):
            np.testing.assert_allclose(
                sample["intr"][v][0, 2], cx + 0.5 * int(id), atol=1e-5
            )

    def test_per_image_intrinsics_python_path(self, matterport_tree):
        root, scene = matterport_tree
        ds = MatchingTupleDataset(root, split="train", tuple_size=2, n_samples=4,
                                  use_native=False)
        assert len(ds) > 0
        self._check(ds, scene)

    def test_per_image_intrinsics_native_path(self, matterport_tree):
        from e2e_multi_view_matching_tpu.data import native_loader

        if not native_loader.available():
            pytest.skip("native loader not built")
        root, scene = matterport_tree
        ds = MatchingTupleDataset(root, split="train", tuple_size=2, n_samples=4,
                                  use_native=True)
        self._check(ds, scene)

    def test_native_matches_python(self, matterport_tree):
        from e2e_multi_view_matching_tpu.data import native_loader

        if not native_loader.available():
            pytest.skip("native loader not built")
        root, _ = matterport_tree
        ds_py = MatchingTupleDataset(root, split="train", tuple_size=2,
                                     n_samples=4, use_native=False, seed=7)
        ds_nat = MatchingTupleDataset(root, split="train", tuple_size=2,
                                      n_samples=4, use_native=True, seed=7)
        a, b = ds_py[0], ds_nat[0]
        assert a["ids"] == b["ids"]
        np.testing.assert_allclose(a["intr"], b["intr"], atol=1e-5)
        np.testing.assert_allclose(a["images"], b["images"], atol=2e-2)
        np.testing.assert_allclose(a["depths"], b["depths"], atol=1e-3)


class TestSampling:
    def test_sequential_subsets_cover(self):
        subsets = create_sequential_subsets(107, 25)
        all_idx = np.concatenate(subsets)
        assert len(all_idx) == 107
        np.testing.assert_array_equal(np.sort(all_idx), np.arange(107))
        assert all(len(s) in (26, 27) for s in subsets)


def test_batch_iterator_process_sharding(scannet_tree):
    """Per-process slices of the global batch concatenate to the single-process
    batch, in order (the DistributedSampler contract, reference train.py:318)."""
    root, _ = scannet_tree
    ds = MatchingTupleDataset(root, split="train", tuple_size=2, n_samples=4)
    full = list(batch_iterator(ds, 4, shuffle=True, seed=3))
    parts = [
        list(batch_iterator(ds, 4, shuffle=True, seed=3,
                            process_index=p, process_count=2))
        for p in range(2)
    ]
    assert len(full) == len(parts[0]) == len(parts[1])
    for b, (p0, p1) in enumerate(zip(*parts)):
        assert p0["images"].shape[0] == p1["images"].shape[0] == 2
        np.testing.assert_array_equal(
            np.concatenate([p0["images"], p1["images"]]), full[b]["images"])
        np.testing.assert_array_equal(
            np.concatenate([p0["poses"], p1["poses"]]), full[b]["poses"])

    import pytest as _pytest
    with _pytest.raises(ValueError, match="not divisible"):
        next(iter(batch_iterator(ds, 4, process_count=3)))
