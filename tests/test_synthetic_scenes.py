"""Tests for the synthetic scene fixtures (plane / multi-plane / textures)."""

import numpy as np

from e2e_multi_view_matching_tpu.data.synthetic import (
    MultiPlaneScene,
    PlaneScene,
    SphereFieldScene,
    fourier_texture_image,
    multiplane_image,
)


class TestMultiPlaneScene:
    def test_depth_is_nearest_plane(self, rng):
        scene = MultiPlaneScene(rng, n_views=2, plane_zs=(4.0, 7.0))
        d = scene.depth_map(0)
        assert d.min() > 0.5 and d.max() < 12.0
        # the map must contain contributions from more than one plane
        assert d.max() - d.min() > 1.0

    def test_correspondences_geometrically_exact(self, rng):
        scene = MultiPlaneScene(rng, n_views=2)
        pix0, pix1 = scene.correspondences(0, 1, 24, rng)
        X = scene.unproject(0, pix0)
        p1, dpos = scene.project(1, X)
        np.testing.assert_allclose(p1, pix1, atol=1e-3)
        assert (dpos > 0).all()

    def test_depth_at_matches_depth_map(self, rng):
        scene = MultiPlaneScene(rng, n_views=1)
        pix = rng.uniform([5, 5], [scene.W - 5, scene.H - 5], size=(30, 2))
        d = scene.depth_at(0, pix)
        dm = scene.depth_map(0)
        for (x, y), dv in zip(pix, d):
            assert abs(dm[int(y), int(x)] - dv) < 0.2

    def test_multiplane_is_nearly_coplanar_hence_spheres(self, rng):
        """Documents WHY SphereFieldScene exists: infinite stacked planes
        degenerate to near-coplanar visible structure (the nearest plane
        occludes the rest)."""
        scene = MultiPlaneScene(rng, n_views=1, plane_zs=(4.0, 6.5, 9.0))
        pix = rng.uniform([5, 5], [scene.W - 5, scene.H - 5], size=(200, 2))
        X = scene.unproject(0, pix)
        centered = X - X.mean(0)
        _, s, _ = np.linalg.svd(centered, full_matrices=False)
        assert s[2] / s[0] < 0.05  # (nearly) coplanar -- the trap


class TestSphereFieldScene:
    def test_structure_is_not_coplanar(self, rng):
        scene = SphereFieldScene(rng, n_views=1)
        pix = rng.uniform([5, 5], [scene.W - 5, scene.H - 5], size=(300, 2))
        X = scene.unproject(0, pix)
        X = X[np.linalg.norm(X, axis=1) > 1e-6]
        centered = X - X.mean(0)
        _, s, _ = np.linalg.svd(centered, full_matrices=False)
        assert s[2] / s[0] > 0.05, "sphere field should be genuinely 3D"

    def test_correspondences_exact_and_occlusion_checked(self, rng):
        scene = SphereFieldScene(rng, n_views=2)
        pix0, pix1 = scene.correspondences(0, 1, 48, rng)
        assert len(pix0) > 20
        X = scene.unproject(0, pix0)
        p1, d1 = scene.project(1, X)
        np.testing.assert_allclose(p1, pix1, atol=1e-3)
        # the projected depth must equal the surface depth seen from view 1
        d_surf = scene.depth_at(1, pix1)
        np.testing.assert_allclose(d_surf, d1, rtol=0.05)

    def test_depth_map_consistency(self, rng):
        scene = SphereFieldScene(rng, n_views=1)
        dm = scene.depth_map(0)
        pix = rng.uniform([5, 5], [scene.W - 5, scene.H - 5], size=(40, 2))
        d = scene.depth_at(0, pix)
        for (x, y), dv in zip(pix, d):
            # nearest-pixel tolerance generous at sphere silhouettes
            assert abs(dm[int(y), int(x)] - dv) < 1.5

    def test_eight_point_on_gt_correspondences(self, rng):
        """The fixture must support accurate w8pt: GT correspondences alone
        should recover the pose to well under a degree."""
        import jax.numpy as jnp

        from e2e_multi_view_matching_tpu.geom.eightpoint import (
            estimate_relative_pose_w8pt,
        )
        from e2e_multi_view_matching_tpu.geom.metrics import (
            rotation_angle_error,
            translation_angle_error,
        )

        scene = SphereFieldScene(rng, n_views=2, H=192, W=256, f=260.0,
                                 baseline=0.9, rot_jitter=0.1)
        pix0, pix1 = scene.correspondences(0, 1, 64, rng, margin=12)
        assert len(pix0) >= 32
        intr = jnp.asarray(scene.intr[0].astype(np.float32))[None]
        T_pred, info = estimate_relative_pose_w8pt(
            jnp.asarray(pix0[None]), jnp.asarray(pix1[None]), intr, intr,
            jnp.ones((1, len(pix0))),
        )
        T_gt = jnp.asarray(scene.relative_pose(0, 1)[None])
        r = np.degrees(float(rotation_angle_error(T_pred, T_gt)))
        t = np.degrees(float(translation_angle_error(T_pred, T_gt)))
        assert r < 1.0 and t < 3.0, (r, t)


class TestTextures:
    def test_fourier_texture_deterministic_per_scene(self, rng):
        scene = MultiPlaneScene(rng, n_views=2)
        a = fourier_texture_image(scene, 0, rng=np.random.default_rng(1))
        b = fourier_texture_image(scene, 0, rng=np.random.default_rng(2))
        np.testing.assert_allclose(a, b)  # texture cached on the scene

    def test_fourier_texture_view_consistent(self, rng):
        """Corresponding pixels across views see (nearly) the same value."""
        scene = MultiPlaneScene(rng, n_views=2)
        img0 = fourier_texture_image(scene, 0, rng=np.random.default_rng(1))
        img1 = fourier_texture_image(scene, 1, rng=np.random.default_rng(1))
        pix0, pix1 = scene.correspondences(0, 1, 40, rng)
        v0 = img0[pix0[:, 1].astype(int), pix0[:, 0].astype(int)]
        v1 = img1[pix1[:, 1].astype(int), pix1[:, 0].astype(int)]
        # nearest-pixel lookup + texture gradient -> allow moderate tolerance
        assert np.median(np.abs(v0 - v1)) < 0.15

    def test_multiplane_image_range(self, rng):
        scene = MultiPlaneScene(rng, n_views=1)
        img = multiplane_image(scene, 0)
        assert img.shape == (scene.H, scene.W)
        assert 0.0 <= img.min() and img.max() <= 1.0
