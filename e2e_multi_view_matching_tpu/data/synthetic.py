"""Synthetic multi-view scenes with exact analytic depth (host-side numpy).

The reference has no unit-test fixtures at all (SURVEY.md section 4); its C++
tests synthesize camera rigs with known ground truth. We generalize that pattern:
a textured 3D plane observed by V perturbed cameras gives exact depth maps
(ray-plane intersection in closed form), exact poses, and exact correspondences --
the oracle for GT-match generation, pose estimation, BA, and end-to-end training
tests. Also materializes ScanNet-format directory trees for the data-pipeline and
CLI tests.
"""

import os

import numpy as np


def _rotation_from_axis_angle(w):
    theta = np.linalg.norm(w)
    if theta < 1e-12:
        return np.eye(3)
    k = w / theta
    K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    return np.eye(3) + np.sin(theta) * K + (1 - np.cos(theta)) * (K @ K)


class PlaneScene:
    """A tilted plane in world space, viewed by V cameras near the origin.

    Attributes:
        poses: (V, 4, 4) cam->world transforms (the reference's pose convention,
            `/root/reference/datasets/scannet.py:23`).
        intr: (V, 3, 3) shared pinhole intrinsics.
        H, W: image size.
    """

    def __init__(self, rng, n_views=2, H=120, W=160, f=140.0, plane_z=5.0,
                 tilt=0.15, baseline=0.5, rot_jitter=0.08):
        self.H, self.W = H, W
        self.intr = np.tile(
            np.array([[f, 0, W / 2.0], [0, f, H / 2.0], [0, 0, 1]], np.float64), (n_views, 1, 1)
        )
        # plane: n . X = c in world coords, mostly fronto-parallel
        n = np.array([tilt * rng.normal(), tilt * rng.normal(), 1.0])
        self.plane_n = n / np.linalg.norm(n)
        self.plane_c = self.plane_n @ np.array([0.0, 0.0, plane_z])
        poses = []
        for v in range(n_views):
            R = _rotation_from_axis_angle(rng.normal(size=3) * rot_jitter)
            t = rng.normal(size=3) * baseline * np.array([1.0, 1.0, 0.3])
            T = np.eye(4)
            T[:3, :3] = R
            T[:3, 3] = t
            poses.append(T)
        self.poses = np.stack(poses)  # cam -> world

    def depth_map(self, v):
        """Exact (H, W) depth of the plane in view v (0 where the ray misses)."""
        H, W = self.H, self.W
        Kinv = np.linalg.inv(self.intr[v])
        xs, ys = np.meshgrid(np.arange(W, dtype=np.float64), np.arange(H, dtype=np.float64))
        rays_cam = np.stack([xs, ys, np.ones_like(xs)], -1) @ Kinv.T  # (H, W, 3)
        R = self.poses[v][:3, :3]
        c = self.poses[v][:3, 3]
        rays_w = rays_cam @ R.T
        denom = rays_w @ self.plane_n
        num = self.plane_c - c @ self.plane_n
        depth = np.where(np.abs(denom) > 1e-9, num / np.where(np.abs(denom) > 1e-9, denom, 1.0), 0.0)
        return np.clip(depth, 0.0, None).astype(np.float32)

    def depth_at(self, v, pix):
        """Exact depth at (N, 2) float pixel coords in view v."""
        Kinv = np.linalg.inv(self.intr[v])
        rays_cam = np.concatenate([pix, np.ones((len(pix), 1))], -1) @ Kinv.T
        R = self.poses[v][:3, :3]
        c = self.poses[v][:3, 3]
        rays_w = rays_cam @ R.T
        denom = rays_w @ self.plane_n
        num = self.plane_c - c @ self.plane_n
        return np.where(np.abs(denom) > 1e-9, num / np.where(np.abs(denom) > 1e-9, denom, 1.0), 0.0)

    def unproject(self, v, pix):
        """(N, 2) pixels in view v -> (N, 3) world points on the plane."""
        d = self.depth_at(v, pix)
        Kinv = np.linalg.inv(self.intr[v])
        pts_cam = (np.concatenate([pix, np.ones((len(pix), 1))], -1) @ Kinv.T) * d[:, None]
        R = self.poses[v][:3, :3]
        c = self.poses[v][:3, 3]
        return pts_cam @ R.T + c

    def project(self, v, X):
        """(N, 3) world points -> ((N, 2) pixels, (N,) depth) in view v."""
        T_w2c = np.linalg.inv(self.poses[v])
        Xc = X @ T_w2c[:3, :3].T + T_w2c[:3, 3]
        p = Xc @ self.intr[v].T
        return p[:, :2] / p[:, 2:3], Xc[:, 2]

    def correspondences(self, v0, v1, n_pts, rng, margin=10):
        """Exact corresponding pixel pairs visible in both views."""
        pix0 = rng.uniform(
            [margin, margin], [self.W - margin, self.H - margin], size=(n_pts * 4, 2)
        )
        X = self.unproject(v0, pix0)
        pix1, d1 = self.project(v1, X)
        ok = (
            (d1 > 0.1)
            & (pix1[:, 0] > margin) & (pix1[:, 0] < self.W - margin)
            & (pix1[:, 1] > margin) & (pix1[:, 1] < self.H - margin)
        )
        pix0, pix1 = pix0[ok][:n_pts], pix1[ok][:n_pts]
        return pix0.astype(np.float32), pix1.astype(np.float32)

    def relative_pose(self, v0, v1):
        """T_0to1 = inv(pose1) @ pose0 (the reference's GT convention)."""
        return (np.linalg.inv(self.poses[v1]) @ self.poses[v0]).astype(np.float32)


class MultiPlaneScene(PlaneScene):
    """Several tilted planes at different depths: exact depth via nearest
    positive ray-plane intersection. Non-coplanar structure -- REQUIRED for any
    test exercising the eight-point solve (a single plane is a degenerate
    configuration for fundamental-matrix estimation)."""

    def __init__(self, rng, n_views=2, H=120, W=160, f=140.0,
                 plane_zs=(4.0, 6.5, 9.0), tilt=0.35, baseline=0.5,
                 rot_jitter=0.08):
        super().__init__(rng, n_views=n_views, H=H, W=W, f=f, plane_z=plane_zs[0],
                         tilt=tilt, baseline=baseline, rot_jitter=rot_jitter)
        self.plane_ns = []
        self.plane_cs = []
        for z in plane_zs:
            n = np.array([tilt * rng.normal(), tilt * rng.normal(), 1.0])
            n = n / np.linalg.norm(n)
            self.plane_ns.append(n)
            self.plane_cs.append(n @ np.array([0.0, 0.0, z]))
        self.plane_ns = np.stack(self.plane_ns)  # (P, 3)
        self.plane_cs = np.asarray(self.plane_cs)

    def _ray_depths(self, v, rays_w, cam_c):
        """(..., 3) world rays -> per-plane depths (..., P), <=0 marked inf."""
        denom = rays_w @ self.plane_ns.T  # (..., P)
        num = self.plane_cs[None] - (cam_c @ self.plane_ns.T)[None]
        d = np.where(np.abs(denom) > 1e-9, num / np.where(np.abs(denom) > 1e-9, denom, 1.0), np.inf)
        return np.where(d > 1e-6, d, np.inf)

    def depth_map(self, v):
        H, W = self.H, self.W
        Kinv = np.linalg.inv(self.intr[v])
        xs, ys = np.meshgrid(np.arange(W, dtype=np.float64), np.arange(H, dtype=np.float64))
        rays_cam = np.stack([xs, ys, np.ones_like(xs)], -1) @ Kinv.T
        R = self.poses[v][:3, :3]
        c = self.poses[v][:3, 3]
        rays_w = rays_cam @ R.T
        d = self._ray_depths(v, rays_w.reshape(-1, 3), c).min(axis=-1)
        d = np.where(np.isfinite(d), d, 0.0)
        return d.reshape(H, W).astype(np.float32)

    def _hit_plane(self, v, rays_w, cam_c):
        d = self._ray_depths(v, rays_w, cam_c)
        return d.min(axis=-1), d.argmin(axis=-1)

    def depth_at(self, v, pix):
        Kinv = np.linalg.inv(self.intr[v])
        rays_cam = np.concatenate([pix, np.ones((len(pix), 1))], -1) @ Kinv.T
        R = self.poses[v][:3, :3]
        c = self.poses[v][:3, 3]
        d, _ = self._hit_plane(v, rays_cam @ R.T, c)
        return np.where(np.isfinite(d), d, 0.0)


class SphereFieldScene(PlaneScene):
    """A field of random spheres in front of a background plane.

    Exact depth via closed-form ray-sphere intersection (nearest positive hit,
    falling back to the plane), with TRUE occlusion consistency across views --
    unlike stacked infinite planes, where the nearest plane hides all others
    and the visible structure degenerates back to (near-)coplanar. This is the
    fixture for anything exercising the eight-point solve or bundle adjustment.
    """

    def __init__(self, rng, n_views=2, H=120, W=160, f=140.0, n_spheres=40,
                 depth_range=(3.5, 9.0), radius_range=(0.25, 0.9),
                 plane_z=11.0, baseline=0.5, rot_jitter=0.08):
        super().__init__(rng, n_views=n_views, H=H, W=W, f=f, plane_z=plane_z,
                         tilt=0.15, baseline=baseline, rot_jitter=rot_jitter)
        # spheres spread across the shared viewing frustum
        zs = rng.uniform(*depth_range, size=n_spheres)
        xy_extent = zs[:, None] * 0.6  # keep inside a ~60deg frustum
        centers = np.concatenate(
            [rng.uniform(-1, 1, size=(n_spheres, 2)) * xy_extent, zs[:, None]], axis=1
        )
        self.sphere_c = centers
        self.sphere_r = rng.uniform(*radius_range, size=n_spheres)

    def _ray_depth(self, rays_w, cam_c):
        """Nearest positive hit over spheres + background plane. (N,) depths."""
        # sphere: ||o + t d - c||^2 = r^2 with unit-ish d (not normalized: t is
        # in units of the ray parameter = cam-z depth scale, consistent
        # because rays come from K^-1 pixel with z=1 in cam frame)
        oc = cam_c[None, None, :] - self.sphere_c[None, :, :]  # (1, S, 3) - broadcast N
        d = rays_w[:, None, :]  # (N, 1, 3)
        a = np.sum(d * d, axis=-1)  # (N, 1)->(N, S) via broadcast
        b = 2.0 * np.sum(d * oc, axis=-1)
        cq = np.sum(oc * oc, axis=-1) - (self.sphere_r**2)[None, :]
        disc = b * b - 4.0 * a * cq
        safe = disc > 0
        sqrt_disc = np.sqrt(np.where(safe, disc, 0.0))
        t = (-b - sqrt_disc) / (2.0 * a)
        t = np.where(safe & (t > 1e-6), t, np.inf)  # (N, S)
        t_min = t.min(axis=1)
        # background plane
        denom = rays_w @ self.plane_n
        num = self.plane_c - cam_c @ self.plane_n
        tp = np.where(np.abs(denom) > 1e-9, num / np.where(np.abs(denom) > 1e-9, denom, 1.0), np.inf)
        tp = np.where(tp > 1e-6, tp, np.inf)
        return np.minimum(t_min, tp)

    def depth_map(self, v):
        H, W = self.H, self.W
        Kinv = np.linalg.inv(self.intr[v])
        xs, ys = np.meshgrid(np.arange(W, dtype=np.float64), np.arange(H, dtype=np.float64))
        rays_cam = np.stack([xs.ravel(), ys.ravel(), np.ones(H * W)], -1) @ Kinv.T
        R = self.poses[v][:3, :3]
        c = self.poses[v][:3, 3]
        d = self._ray_depth(rays_cam @ R.T, c)
        d = np.where(np.isfinite(d), d, 0.0)
        return d.reshape(H, W).astype(np.float32)

    def depth_at(self, v, pix):
        Kinv = np.linalg.inv(self.intr[v])
        rays_cam = np.concatenate([pix, np.ones((len(pix), 1))], -1) @ Kinv.T
        R = self.poses[v][:3, :3]
        c = self.poses[v][:3, 3]
        d = self._ray_depth(rays_cam @ R.T, c)
        return np.where(np.isfinite(d), d, 0.0)

    def correspondences(self, v0, v1, n_pts, rng, margin=10):
        """Exact co-visible pixel pairs with occlusion checking both ways."""
        pix0 = rng.uniform([margin, margin], [self.W - margin, self.H - margin],
                           size=(n_pts * 6, 2))
        X = self.unproject(v0, pix0)
        pix1, d1 = self.project(v1, X)
        # occlusion check: view-1 must see the same 3D point (same depth)
        d1_surface = self.depth_at(v1, pix1)
        visible = np.abs(d1_surface - d1) < 0.05 * np.maximum(d1, 1e-6)
        ok = (
            (d1 > 0.1) & visible
            & (pix1[:, 0] > margin) & (pix1[:, 0] < self.W - margin)
            & (pix1[:, 1] > margin) & (pix1[:, 1] < self.H - margin)
        )
        return (pix0[ok][:n_pts].astype(np.float32),
                pix1[ok][:n_pts].astype(np.float32))


def fourier_texture_image(scene, v, rng=None, n_waves=24, seed=0):
    """Random-Fourier-feature texture on the scene geometry.

    Unlike a checkerboard (whose corners are locally identical, making
    descriptor matching inherently ambiguous), every world point gets a
    distinctive local appearance: img(X) = sum_i a_i sin(k_i . X + phi_i) with
    random frequencies. Keypoint descriptors then carry geometric identity --
    the property real scenes have and learned matching needs.
    """
    if rng is None:
        rng = np.random.default_rng(seed)
    if not hasattr(scene, "_texture"):
        ks = rng.normal(size=(n_waves, 3)) * rng.uniform(2.0, 9.0, size=(n_waves, 1))
        phis = rng.uniform(0, 2 * np.pi, size=n_waves)
        amps = rng.uniform(0.3, 1.0, size=n_waves)
        scene._texture = (ks, phis, amps)
    ks, phis, amps = scene._texture
    H, W = scene.H, scene.W
    Kinv = np.linalg.inv(scene.intr[v])
    xs, ys = np.meshgrid(np.arange(W, dtype=np.float64), np.arange(H, dtype=np.float64))
    pix = np.stack([xs.ravel(), ys.ravel()], -1)
    d = scene.depth_at(v, pix)
    rays_cam = np.concatenate([pix, np.ones((len(pix), 1))], -1) @ Kinv.T
    R = scene.poses[v][:3, :3]
    c = scene.poses[v][:3, 3]
    Xw = (rays_cam * d[:, None]) @ R.T + c
    val = (np.sin(Xw @ ks.T + phis[None]) * amps[None]).sum(-1)
    val = (val - val.min()) / max(val.max() - val.min(), 1e-6)
    return (0.1 + 0.8 * val).reshape(H, W).astype(np.float32)


def multiplane_image(scene, v, cells=(0.45, 0.6, 0.8)):
    """Checkerboard texture whose cell size depends on the hit plane."""
    H, W = scene.H, scene.W
    Kinv = np.linalg.inv(scene.intr[v])
    xs, ys = np.meshgrid(np.arange(W, dtype=np.float64), np.arange(H, dtype=np.float64))
    rays_cam = np.stack([xs.ravel(), ys.ravel(), np.ones(H * W)], -1) @ Kinv.T
    R = scene.poses[v][:3, :3]
    c = scene.poses[v][:3, 3]
    rays_w = rays_cam @ R.T
    d, pid = scene._hit_plane(v, rays_w, c)
    d = np.where(np.isfinite(d), d, 0.0)
    Xw = rays_w * d[:, None] + c
    cell = np.asarray(cells)[pid % len(cells)]
    u = np.floor(Xw[:, 0] / cell).astype(int)
    w = np.floor(Xw[:, 1] / cell).astype(int)
    img = ((u + w + pid) % 2).astype(np.float32) * 0.7 + 0.15
    return img.reshape(H, W)


def checkerboard_image(scene, v, cell_world=0.4):
    """Render a grayscale checkerboard texture on the plane for view v (H, W) in [0,1].

    Gives SuperPoint-like detectors real corners to find in end-to-end tests.
    """
    H, W = scene.H, scene.W
    xs, ys = np.meshgrid(np.arange(W, dtype=np.float64), np.arange(H, dtype=np.float64))
    pix = np.stack([xs.ravel(), ys.ravel()], -1)
    Xw = scene.unproject(v, pix)
    u = np.floor(Xw[:, 0] / cell_world).astype(int)
    w = np.floor(Xw[:, 1] / cell_world).astype(int)
    img = ((u + w) % 2).astype(np.float32) * 0.8 + 0.1
    return img.reshape(H, W)


def write_scannet_format(scene, root, scene_name="scene0000_00", split="train",
                         dataset="scannet", image_fn=checkerboard_image,
                         overlap_all=True, per_image_intr_cx_step=0.0):
    """Materialize a ScanNet-format directory tree for the data-pipeline tests.

    Layout consumed by `/root/reference/datasets/scannet.py:9-42` and the tuple
    sampler: `<root>/<dataset>/scans/<scene>/{intrinsic,pose,depth,color}` plus
    `<root>/<dataset>/overlap/scans/<scene>.json` and `<root>/<dataset>/*_{split}.txt`.

    A dataset name containing "matterport" switches to the Matterport layout
    (`matching_dataset.py:173-175`): identical tree, but intrinsics are stored
    per image as `intrinsic/<id>.txt` instead of one `intrinsic_color.txt`.
    `per_image_intr_cx_step` offsets cx by `step * id` in those files so tests
    can prove the loader read the per-image file rather than a shared one.
    """
    import json

    import cv2

    ds_dir = os.path.join(root, dataset)
    scans = "scans_test" if split == "test" else "scans"
    sdir = os.path.join(ds_dir, scans, scene_name)
    for sub in ("intrinsic", "pose", "depth", "color"):
        os.makedirs(os.path.join(sdir, sub), exist_ok=True)
    per_image_intr = "matterport" in dataset
    intr4 = np.eye(4)
    intr4[:3, :3] = scene.intr[0]
    if not per_image_intr:
        np.savetxt(os.path.join(sdir, "intrinsic", "intrinsic_color.txt"), intr4,
                   delimiter=" ")
    n_views = len(scene.poses)
    for v in range(n_views):
        if per_image_intr:
            vintr = intr4.copy()
            vintr[0, 2] += per_image_intr_cx_step * v
            np.savetxt(os.path.join(sdir, "intrinsic", f"{v}.txt"), vintr,
                       delimiter=" ")
        np.savetxt(os.path.join(sdir, "pose", f"{v}.txt"), scene.poses[v], delimiter=" ")
        depth_mm = (scene.depth_map(v) * 1000.0).astype(np.uint16)
        cv2.imwrite(os.path.join(sdir, "depth", f"{v}.png"), depth_mm)
        img = (image_fn(scene, v) * 255.0).astype(np.uint8)
        cv2.imwrite(os.path.join(sdir, "color", f"{v}.jpg"), cv2.cvtColor(img, cv2.COLOR_GRAY2BGR))
    with open(os.path.join(ds_dir, f"scannetv2_{split}.txt"), "a") as f:
        f.write(scene_name + "\n")
    overlap_dir = os.path.join(ds_dir, "overlap", scans)
    os.makedirs(overlap_dir, exist_ok=True)
    if overlap_all:
        cands = {str(v): [int(u) for u in range(n_views) if u != v] for v in range(n_views)}
    with open(os.path.join(overlap_dir, scene_name + ".json"), "w") as f:
        json.dump(cands, f)
    return ds_dir
