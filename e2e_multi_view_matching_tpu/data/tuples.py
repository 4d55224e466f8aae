"""Tuple dataset: per-epoch stochastic tuple sampling + sample loading (host-side).

Behavioral contract of `MatchingDataset`
(`/root/reference/datasets/matching_dataset.py:26-233`):
- per-scene overlap JSON `{img_id: [candidate ids]}` drives a random-walk
  `make_tuple` with retries and scene exclude sets;
- `start_epoch()` resamples all tuples;
- getitem reads intrinsics (per-scene scannet / per-image megadepth+matterport),
  cam->world pose, depth, RGB -> grayscale, resizes RGB to the depth map's size
  (with intrinsic rescale), pads 1296x968 scannet frames to 972, megadepth
  square crops (random at train / center at test), shared-per-tuple color
  jitter;
- fixed test tuples round-trip through the `scene,"[id,...]"` CSV assets.

The loader returns numpy batches shaped for the jitted train step:
images (B, V, H, W, 1), intr (B, V, 4, 4), poses (B, V, 4, 4),
depths (B, V, H, W).
"""

import json
import os
import threading
import queue as queue_mod

import numpy as np

from e2e_multi_view_matching_tpu.data.scannet import (
    crop_intrinsics,
    get_scenes,
    read_depth,
    read_intrinsics,
    read_pose,
    read_rgb,
    resize_intrinsics,
)

import cv2


def _rgb_to_gray(rgb):
    """ITU-R 601 luma, matching torchvision `rgb_to_grayscale`."""
    return (
        0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
    ).astype(np.float32)


def _color_jitter_params(rng, jitter):
    """Shared-per-tuple jitter params (`matching_dataset.py:110-130`)."""
    order = rng.permutation(4)
    return {
        "order": order,
        "brightness": rng.uniform(1 - jitter, 1 + jitter),
        "contrast": rng.uniform(1 - jitter, 1 + jitter),
        "saturation": rng.uniform(1 - jitter, 1 + jitter),
        "hue": rng.uniform(-jitter, jitter),
    }


def _apply_color_jitter(rgb, p):
    """Apply brightness/contrast/saturation/hue in the sampled order.

    rgb float32 in [0, 1], (H, W, 3).
    """
    for fn_id in p["order"]:
        if fn_id == 0:
            rgb = np.clip(rgb * p["brightness"], 0, 1)
        elif fn_id == 1:
            mean = _rgb_to_gray(rgb).mean()
            rgb = np.clip((rgb - mean) * p["contrast"] + mean, 0, 1)
        elif fn_id == 2:
            gray = _rgb_to_gray(rgb)[..., None]
            rgb = np.clip((rgb - gray) * p["saturation"] + gray, 0, 1)
        elif fn_id == 3:
            hsv = cv2.cvtColor((rgb * 255).astype(np.uint8), cv2.COLOR_RGB2HSV)
            h = hsv[..., 0].astype(np.int32) + int(p["hue"] * 180)
            hsv[..., 0] = np.mod(h, 180).astype(np.uint8)
            rgb = cv2.cvtColor(hsv, cv2.COLOR_HSV2RGB).astype(np.float32) / 255.0
    return rgb


class MatchingTupleDataset:
    """Stochastically sampled view tuples from ScanNet-format data."""

    def __init__(self, data_dir, split, tuple_size, n_samples=None, jitter=None,
                 shuffle_tuple=True, preprocess_dir="overlap", seed=0,
                 use_native="auto"):
        self.data_dir = data_dir
        self.split = split
        # native C++ decode path (no color jitter support; scannet-style pngs)
        if use_native == "auto":
            from e2e_multi_view_matching_tpu.data import native_loader

            use_native = (
                native_loader.available() and jitter is None
                and "megadepth" not in data_dir
            )
        self.use_native = bool(use_native)
        self.data_split_dir = os.path.join(
            data_dir, "scans" + ("_test" if split == "test" else "")
        )
        self.scenes = get_scenes(data_dir, split)
        if "megadepth" in self.data_split_dir:
            self.scenes = [str(s).zfill(4) for s in self.scenes]
        self.tuple_size = tuple_size
        self.shuffle_tuple = shuffle_tuple
        self.n_samples = n_samples
        self.jitter = jitter
        self.exclude_set = set()
        # `self.rng` drives TUPLE SAMPLING only (start_epoch/_make_tuple): every
        # process consumes it identically, so multi-host processes agree on the
        # global tuple list. Per-item randomness (jitter, crops) uses
        # `_item_rng` instead -- deterministic in (seed, epoch, index), hence
        # identical under any process/batch layout and safe under the threaded
        # batch_iterator (a shared Generator in __getitem__ would be a data
        # race AND would diverge across processes that load disjoint slices).
        self.seed = seed
        self.epoch = 0
        self.rng = np.random.default_rng(seed)
        self.sampled_tuples = []
        self.start_epoch(make_exclude_set=True, _first=True)
        self.scenes = [s for s in self.scenes if s not in self.exclude_set]

    # -- tuple sampling ----------------------------------------------------
    def _make_tuple(self, start_key, candidates):
        """Random walk over the overlap graph (`matching_dataset.py:49-66`)."""
        n_trials = 0
        result = []
        while len(result) < self.tuple_size and n_trials < 5 * self.tuple_size:
            key = start_key
            result = []
            for _ in range(self.tuple_size):
                next_key = int(self.rng.choice(candidates[key]))
                if next_key not in result:
                    result.append(next_key)
                key = next_key
            n_trials += 1
        if len(result) < self.tuple_size:
            return None
        if self.shuffle_tuple:
            self.rng.shuffle(result)
        return result

    def start_epoch(self, make_exclude_set=False, _first=False):
        """Resample all tuples (`matching_dataset.py:68-108`; called per epoch)."""
        if not _first:
            self.epoch += 1
        tuples = []
        for scene in self.scenes:
            overlap_path = os.path.join(
                self.data_dir, "overlap",
                os.path.relpath(self.data_split_dir, self.data_dir),
                scene + ".json",
            )
            with open(overlap_path) as f:
                loaded = json.load(f)
            if len(loaded) < self.tuple_size:
                continue
            candidates = {int(k): v for k, v in loaded.items() if len(v) > 0}
            n_candidates = len(candidates)
            n_samples = (
                int(n_candidates / self.tuple_size)
                if self.n_samples is None
                else self.n_samples
            )
            n_samples = min(n_samples, n_candidates)
            keys = list(candidates.keys())
            start_images = self.rng.choice(keys, n_samples, replace=False)
            for start in start_images:
                t = self._make_tuple(int(start), candidates)
                n_trials = 0
                while t is None and (not make_exclude_set or n_trials < 3 * self.tuple_size):
                    alt = int(self.rng.choice(keys))
                    t = self._make_tuple(alt, candidates)
                    n_trials += 1
                if t is None:
                    if make_exclude_set:
                        self.exclude_set.add(scene)
                        break
                else:
                    tuples.append((scene, t))
        self.sampled_tuples = tuples
        return tuples

    def write_sampled_tuples(self, file_path, n=1500):
        """Fixed-test-tuple CSV (`matching_dataset.py:218-226`)."""
        with open(file_path, "w") as f:
            f.write("scene,ids\n")
            for scene, ids in self.sampled_tuples[:n]:
                f.write(f'{scene},"{list(ids)}"\n')

    def read_sampled_tuples(self, file_path):
        """Load the fixed test tuples CSV (`matching_dataset.py:228-233`)."""
        import csv

        tuples = []
        with open(file_path) as f:
            for row in csv.DictReader(f):
                tuples.append((row["scene"], json.loads(row["ids"])))
        self.sampled_tuples = tuples

    # -- sample loading ----------------------------------------------------
    def __len__(self):
        return len(self.sampled_tuples)

    def _item_rng(self, index):
        """Per-item Generator, deterministic in (seed, epoch, index)."""
        return np.random.default_rng((self.seed, self.epoch, index))

    def _crop_square(self, rgb, depth, intr, center, rng):
        h, w = depth.shape
        if w > h:
            left = int((w - h) / 2) if center else int(rng.integers(0, w - h + 1))
            top, bottom, right = 0, h, left + h
        else:
            top = int((h - w) / 2) if center else int(rng.integers(0, h - w + 1))
            left, right, bottom = 0, w, top + w
        intr = crop_intrinsics(intr, left, top)
        return rgb[top:bottom, left:right], depth[top:bottom, left:right], intr

    def _getitem_native(self, index):
        """Fast path: threaded C++ JPEG/PNG decode + resize (scannet layout)."""
        from e2e_multi_view_matching_tpu.data import native_loader

        scene, ids = self.sampled_tuples[index]
        per_image_intr = "matterport" in self.data_split_dir
        if not per_image_intr:
            scene_intr = read_intrinsics(self.data_split_dir, scene)
        sdir = os.path.join(self.data_split_dir, scene)
        rgb_paths = [os.path.join(sdir, "color", f"{id}.jpg") for id in ids]
        dep_paths = [os.path.join(sdir, "depth", f"{id}.png") for id in ids]
        # target size = depth-map size (the reference resizes rgb to depth)
        dh, dw = native_loader.png_size(dep_paths[0])
        images, depths = native_loader.load_batch(rgb_paths, dep_paths, dh, dw)
        intrs, poses = [], []
        for i, id in enumerate(ids):
            intr = (
                read_intrinsics(self.data_split_dir, scene, id)
                if per_image_intr else scene_intr.copy()
            ).astype(np.float32)
            if intr.shape == (3, 3):
                intr4 = np.eye(4, dtype=np.float32)
                intr4[:3, :3] = intr
                intr = intr4
            rh, rw = native_loader.jpeg_size(rgb_paths[i])
            # 1296x968 pad semantics folded into the rescale (968+4 = 972)
            if rw == 1296 and rh == 968:
                rh += 4
                intr[1, 2] += 2
            if (rh, rw) != (dh, dw):
                intr = resize_intrinsics(intr, dw / rw, dh / rh)
            intrs.append(intr)
            poses.append(read_pose(self.data_split_dir, scene, id).astype(np.float32))
        return {
            "scene": scene,
            "ids": list(ids),
            "images": images[..., None],
            "intr": np.stack(intrs),
            "poses": np.stack(poses),
            "depths": depths,
        }

    def __getitem__(self, index):
        if self.use_native:
            return self._getitem_native(index)
        scene, ids = self.sampled_tuples[index]
        is_megadepth = "megadepth" in self.data_split_dir
        per_image_intr = is_megadepth or "matterport" in self.data_split_dir
        if not per_image_intr:
            scene_intr = read_intrinsics(self.data_split_dir, scene)
        item_rng = self._item_rng(index)
        jitter_p = (
            _color_jitter_params(item_rng, self.jitter) if self.jitter else None
        )
        images, intrs, poses, depths = [], [], [], []
        for id in ids:
            intr = (
                read_intrinsics(self.data_split_dir, scene, id)
                if per_image_intr
                else scene_intr.copy()
            ).astype(np.float32)
            if intr.shape == (3, 3):
                intr4 = np.eye(4, dtype=np.float32)
                intr4[:3, :3] = intr
                intr = intr4
            pose = read_pose(self.data_split_dir, scene, id).astype(np.float32)
            rgb = read_rgb(self.data_split_dir, scene, id).astype(np.float32) / 255.0
            if is_megadepth:
                import h5py

                with h5py.File(
                    os.path.join(self.data_split_dir, scene, "depth", f"{id}.h5"), "r"
                ) as hf:
                    depth = np.asarray(hf["depth"], np.float32)
                rgb, depth, intr = self._crop_square(
                    rgb, depth, intr, center=(self.split == "test"), rng=item_rng
                )
            else:
                depth = read_depth(self.data_split_dir, scene, id)
            # large-frame scannet pad 968 -> 972 (`matching_dataset.py:192-195`)
            if rgb.shape[1] == 1296 and rgb.shape[0] == 968:
                rgb = np.pad(rgb, ((2, 2), (0, 0), (0, 0)))
                intr[1, 2] += 2
            # resize rgb to depth-map size with intrinsic rescale
            if rgb.shape[:2] != depth.shape:
                fx = depth.shape[1] / rgb.shape[1]
                fy = depth.shape[0] / rgb.shape[0]
                intr = resize_intrinsics(intr, fx, fy)
                rgb = cv2.resize(rgb, (depth.shape[1], depth.shape[0]))
            if jitter_p is not None:
                rgb = _apply_color_jitter(rgb, jitter_p)
            gray = _rgb_to_gray(rgb)
            images.append(gray[..., None])
            intrs.append(intr)
            poses.append(pose)
            depths.append(depth)
        return {
            "scene": scene,
            "ids": list(ids),
            "images": np.stack(images),
            "intr": np.stack(intrs),
            "poses": np.stack(poses),
            "depths": np.stack(depths),
        }


def batch_iterator(dataset, batch_size, shuffle=True, drop_last=True, seed=0,
                   prefetch=2, indices=None, process_index=0, process_count=1):
    """Threaded prefetching batcher producing stacked numpy batches.

    Replaces the torch DataLoader worker pool (`train.py:319-330`) on the host
    side; device transfer happens in the train loop via `shard_batch`.

    Multi-process: `batch_size` is the GLOBAL batch; every process derives the
    same shuffled index order (identical seed) and loads only its
    `batch_size / process_count` slice of each batch -- the reference's
    `DistributedSampler` role (`train.py:318`). The global device array is
    assembled in `parallel/mesh.py::shard_batch`.
    """
    if batch_size % process_count != 0:
        raise ValueError(
            f"global batch {batch_size} not divisible by {process_count} processes"
        )
    if process_count > 1 and not drop_last:
        # A short final global batch would give unequal (possibly empty)
        # per-process slices, while shard_batch derives the global shape as
        # local_rows * process_count -- inconsistent across processes and
        # fatal inside make_array_from_process_local_data. Training always
        # drops the remainder; require it explicitly in multi-process mode.
        raise ValueError("drop_last=False unsupported with process_count > 1")
    if indices is None:
        indices = np.arange(len(dataset))
    if shuffle:
        np.random.default_rng(seed).shuffle(indices)
    n = len(indices)
    n_batches = n // batch_size if drop_last else -(-n // batch_size)
    per_proc = batch_size // process_count
    lo_proc = process_index * per_proc

    def collate(idx_chunk):
        samples = [dataset[int(i)] for i in idx_chunk]
        return {
            "images": np.stack([s["images"] for s in samples]),
            "intr": np.stack([s["intr"] for s in samples]),
            "poses": np.stack([s["poses"] for s in samples]),
            "depths": np.stack([s["depths"] for s in samples]),
            "scene": [s["scene"] for s in samples],
            "ids": [s["ids"] for s in samples],
        }

    q = queue_mod.Queue(maxsize=prefetch)
    stop = object()

    def producer():
        for b in range(n_batches):
            chunk = indices[b * batch_size : (b + 1) * batch_size]
            # this process's slice of the global batch (full batch when
            # process_count == 1; multi-process always drops short batches,
            # enforced above, so every slice has exactly per_proc rows)
            chunk = chunk[lo_proc : lo_proc + per_proc] if process_count > 1 else chunk
            q.put(collate(chunk))
        q.put(stop)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is stop:
            break
        yield item
