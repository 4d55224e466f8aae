"""Test the MegaDepth -> ScanNet-format converter on synthetic scene_info npz."""

import json
import os

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")


@pytest.fixture
def megadepth_tree(tmp_path):
    """Minimal MegaDepth layout: images + h5 depths + scene_info npz + lists."""
    import cv2

    root = tmp_path / "megadepth"
    scene = "0001"
    n = 5
    rng = np.random.default_rng(0)
    img_dir = root / "phoenix" / "S6" / "zl548" / "MegaDepth_v1" / scene / "dense0" / "imgs"
    # the converter resolves depth paths by their last 5 components relative to
    # the dataset root (the real MegaDepth layout quirk, `bundle_adjust_io`-era
    # convention carried by the reference converter)
    dep_dir = root / "MegaDepth_v1" / scene / "dense0" / "depths"
    img_dir.mkdir(parents=True)
    dep_dir.mkdir(parents=True)
    img_paths, dep_paths, intrs, poses = [], [], [], []
    H, W = 60, 80
    for i in range(n):
        name = f"im{i}.jpg"
        img = (rng.uniform(size=(H, W, 3)) * 255).astype(np.uint8)
        cv2.imwrite(str(img_dir / name), img)
        with h5py.File(dep_dir / f"im{i}.h5", "w") as hf:
            hf.create_dataset("depth", data=rng.uniform(2, 8, size=(H, W)).astype(np.float32))
        img_paths.append(f"phoenix/S6/zl548/MegaDepth_v1/{scene}/dense0/imgs/{name}")
        dep_paths.append(f"phoenix/S6/zl548/MegaDepth_v1/{scene}/dense0/depths/im{i}.h5")
        K = np.array([[70.0, 0, W / 2], [0, 70.0, H / 2], [0, 0, 1]])
        intrs.append(K)
        T = np.eye(4)
        T[0, 3] = i * 0.1
        poses.append(T)
    overlap = np.zeros((n, n))
    for i in range(n):
        for j in range(n):
            if i != j:
                overlap[i, j] = 0.5  # all pairs in range
    info_dir = root / "scene_info"
    info_dir.mkdir()
    np.savez(
        info_dir / f"{scene}.npz",
        image_paths=np.asarray(img_paths, object),
        depth_paths=np.asarray(dep_paths, object),
        intrinsics=np.asarray(intrs),
        poses=np.asarray(poses),
        overlap_matrix=overlap,
    )
    for split, scenes in (("train", [scene]), ("val", []), ("test", [])):
        with open(root / f"megadepth_{split}.txt", "w") as f:
            f.write("\n".join(scenes))
    with open(root / "megadepth_valid_list.json", "w") as f:
        json.dump([f"{scene}/im{i}.jpg" for i in range(n)], f)
    return str(root), scene, n


def test_converter_end_to_end(megadepth_tree):
    root, scene, n = megadepth_tree
    from e2e_multi_view_matching_tpu.cli import convert_megadepth

    convert_megadepth.main(["--dataset_dir", root, "--image_size", "48",
                            "--n_workers", "1"])
    out = f"{root}_48"
    sdir = os.path.join(out, "scans", scene)
    assert os.path.exists(os.path.join(sdir, "color", "0.jpg"))
    assert os.path.exists(os.path.join(sdir, "depth", "0.h5"))
    intr = np.loadtxt(os.path.join(sdir, "intrinsic", "0.txt"))
    # smaller dimension resized to 48, intrinsics rescaled accordingly
    assert abs(intr[0, 0] - 70.0 * 48 / 60) < 1e-6
    pose = np.loadtxt(os.path.join(sdir, "pose", "0.txt"))
    np.testing.assert_allclose(pose, np.eye(4), atol=1e-8)  # inv of identity-ish
    with open(os.path.join(out, "overlap", "scans", f"{scene}.json")) as f:
        matches = json.load(f)
    assert len(matches) == n
    assert all(len(v) == n - 1 for v in matches.values())
    # split lists copied
    assert os.path.exists(os.path.join(out, "megadepth_train.txt"))
    # resumable: second run skips (no error)
    convert_megadepth.main(["--dataset_dir", root, "--image_size", "48",
                            "--n_workers", "1"])
