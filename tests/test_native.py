"""Tests for the native C++ host runtime (decode, batch loader, overlap graph)."""

import json
import os
import subprocess

import numpy as np
import pytest

from e2e_multi_view_matching_tpu.data import native_loader
from e2e_multi_view_matching_tpu.data.synthetic import PlaneScene, write_scannet_format

pytestmark = pytest.mark.skipif(
    not native_loader.available(), reason="native library not built"
)


@pytest.fixture(scope="module")
def scene_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("native_data")
    rng = np.random.default_rng(0)
    scene = PlaneScene(rng, n_views=6, H=96, W=128)
    write_scannet_format(scene, str(root), scene_name="scene0000_00", split="train")
    return os.path.join(str(root), "scannet"), scene


class TestDecode:
    def test_jpeg_gray_roundtrip(self, scene_tree):
        import cv2

        ds, scene = scene_tree
        path = os.path.join(ds, "scans", "scene0000_00", "color", "0.jpg")
        ref = cv2.imread(path, cv2.IMREAD_GRAYSCALE).astype(np.float32) / 255.0
        img = native_loader.load_gray(path, *ref.shape)
        assert img.shape == ref.shape
        # JPEG decoders may differ by a few ULP of 1/255 in flat regions
        assert np.abs(img - ref).max() < 0.05
        assert np.abs(img - ref).mean() < 0.005

    def test_depth_png_roundtrip(self, scene_tree):
        import cv2

        ds, scene = scene_tree
        path = os.path.join(ds, "scans", "scene0000_00", "depth", "0.png")
        ref = cv2.imread(path, cv2.IMREAD_UNCHANGED).astype(np.float32) / 1000.0
        d = native_loader.load_depth(path, *ref.shape)
        np.testing.assert_allclose(d, ref, atol=1e-6)

    def test_jpeg_size(self, scene_tree):
        ds, _ = scene_tree
        path = os.path.join(ds, "scans", "scene0000_00", "color", "0.jpg")
        assert native_loader.jpeg_size(path) == (96, 128)

    def test_batch_loader_threads(self, scene_tree):
        ds, _ = scene_tree
        sdir = os.path.join(ds, "scans", "scene0000_00")
        rgb = [os.path.join(sdir, "color", f"{i}.jpg") for i in range(6)]
        dep = [os.path.join(sdir, "depth", f"{i}.png") for i in range(6)]
        images, depths = native_loader.load_batch(rgb, dep, 96, 128, n_threads=4)
        assert images.shape == (6, 96, 128) and depths.shape == (6, 96, 128)
        assert images.min() >= 0 and images.max() <= 1
        assert depths.max() > 1.0  # meters on the plane
        # matches single loads
        one = native_loader.load_gray(rgb[3], 96, 128)
        np.testing.assert_allclose(images[3], one)

    def test_batch_loader_reports_failures(self, scene_tree):
        ds, _ = scene_tree
        sdir = os.path.join(ds, "scans", "scene0000_00")
        with pytest.raises(IOError):
            native_loader.load_batch(
                [os.path.join(sdir, "color", "missing.jpg")],
                [os.path.join(sdir, "depth", "0.png")], 96, 128,
            )


class TestOverlap:
    def overlap_python(self, depths, poses, intr, stride=8):
        """Reference implementation in numpy."""
        n, h, w = depths.shape
        directed = np.zeros((n, n))
        for i in range(n):
            Ki = intr[i][:3, :3]
            ys, xs = np.mgrid[0:h:stride, 0:w:stride]
            d = depths[i][ys, xs]
            valid = d > 1e-6
            pts = np.stack([xs[valid] * d[valid], ys[valid] * d[valid], d[valid]], -1)
            X_i = pts @ np.linalg.inv(Ki).T
            for j in range(n):
                if i == j:
                    continue
                T = np.linalg.inv(poses[j]) @ poses[i]
                X_j = X_i @ T[:3, :3].T + T[:3, 3]
                z = X_j[:, 2]
                front = z > 1e-6
                p = (X_j[front] @ intr[j][:3, :3].T)
                u = np.round(p[:, 0] / z[front]).astype(int)
                v = np.round(p[:, 1] / z[front]).astype(int)
                inb = (u >= 0) & (u < w) & (v >= 0) & (v < h)
                hits = 0
                uu, vv, zz = u[inb], v[inb], z[front][inb]
                dj = depths[j][vv, uu]
                ok = dj > 1e-6
                hits = np.sum(np.abs(dj[ok] - zz[ok]) / dj[ok] < 0.1)
                directed[i, j] = hits / max(valid.sum(), 1)
        return 0.5 * (directed + directed.T)

    def test_overlap_matches_python(self, scene_tree):
        ds, scene = scene_tree
        n = 6
        depths = np.stack([scene.depth_map(v) for v in range(n)])
        poses = scene.poses
        intr = scene.intr
        native = native_loader.overlap_matrix(depths, poses, intr, stride=8)
        ref = self.overlap_python(depths, poses, intr, stride=8)
        np.testing.assert_allclose(native, ref, atol=0.03)
        # overlapping views of the same plane should mostly see each other
        assert native[0, 1] > 0.2

    def test_overlap_cli_tool(self, scene_tree):
        ds, scene = scene_tree
        tool = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "native", "build", "emvm_overlap",
        )
        out = subprocess.run(
            [tool, ds, "train", "0.2", "1.0", "8"],
            capture_output=True, text=True, timeout=120,
        )
        assert out.returncode == 0, out.stderr
        js = os.path.join(ds, "overlap", "scans", "scene0000_00.json")
        with open(js) as f:
            matches = json.load(f)
        assert len(matches) == 6
        # the tuple sampler accepts this JSON directly
        from e2e_multi_view_matching_tpu.data.tuples import MatchingTupleDataset

        dataset = MatchingTupleDataset(ds, split="train", tuple_size=3, n_samples=2)
        assert len(dataset) > 0
