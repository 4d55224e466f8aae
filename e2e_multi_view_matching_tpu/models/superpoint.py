"""SuperPoint keypoint detector + descriptor, TPU-native.

Architecture follows the public magicleap SuperPointPretrainedNetwork design the
reference consumes as a frozen submodule (interface contract: SURVEY.md section
2.4, call sites `/root/reference/helpers.py:83-96`, `/root/reference/train.py:335-341`):
shared VGG encoder, a 65-channel detector head (8x8 cells + dustbin), and a
256-d descriptor head sampled bilinearly at keypoint locations.

TPU-first differences from the torch original:
- NHWC layout; all convs run on the MXU.
- Static output shapes: `max_keypoints` slots per image, always. Sub-threshold
  slots are filled with random keypoint positions at zero score when
  `fill_with_random_keypoints` is on (training contract) or clamped to zero
  score otherwise; downstream code masks on `scores > 0`.
- NMS is the upstream iterative max-pool suppression (2 rounds) expressed with
  `lax` ops; top-K selection is `jax.lax.top_k` over the flattened heatmap.
"""

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class SuperPointConfig:
    """Mirrors the reference's SuperPoint config keys (`train.py:335-341`)."""

    nms_radius: int = 4
    keypoint_threshold: float = 0.001
    max_keypoints: int = 400
    remove_borders: int = 4
    fill_with_random_keypoints: bool = True
    descriptor_dim: int = 256
    # MXU compute dtype for the conv trunk ("float32" | "bfloat16"). Params
    # stay f32; heads' outputs are cast back to f32 before softmax/normalize.
    # bf16 measured 66.4 vs 84.0 ms for 40 frames 480x640 on the v5e
    # (tools/sp_profile.py); keypoint sets agree except at score ties.
    compute_dtype: str = "float32"
    # "auto": exploit the NMS separation guarantee to run top-K over 4x4-block
    # maxima (16x smaller input; identical selection for distinct scores) when
    # nms_radius >= 3 and the map is large enough. "flat": always lax.top_k
    # over the full score map.
    topk_impl: str = "auto"


class SuperPointNet(nn.Module):
    """The convolutional trunk: image (B, H, W, 1) -> (heatmap logits, descriptors).

    With `valid_size` (per-image true (h, w) of zero-padded shape-bucketed
    inputs), activations beyond each image's extent are re-zeroed after every
    conv and pool. This makes the computation inside the extent EXACTLY the
    exact-size run's: a SAME conv at the true edge taps zeros either way, and
    without the masking the pad region develops bias-driven activations that
    bleed ~a receptive field into the boundary cells. Extents floor-halve at
    each pool, mirroring the exact-size run's VALID 2x2 pooling.
    """

    descriptor_dim: int = 256
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(self, image, valid_size=None):
        c1, c2, c3, c4, c5 = 64, 64, 128, 128, 256
        dt = jnp.dtype(self.compute_dtype)
        conv = lambda ch, k, name: nn.Conv(ch, k, name=name, dtype=dt)
        relu = nn.relu

        if valid_size is not None:
            ext = [valid_size[:, 0].astype(jnp.int32),
                   valid_size[:, 1].astype(jnp.int32)]  # per-image (h, w)

        def m(x):
            if valid_size is None:
                return x
            ys = jnp.arange(x.shape[1])[None, :, None, None]
            xs = jnp.arange(x.shape[2])[None, None, :, None]
            keep = (ys < ext[0][:, None, None, None]) & (
                xs < ext[1][:, None, None, None])
            return jnp.where(keep, x, jnp.zeros((), x.dtype))

        def pool(x):
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
            if valid_size is not None:
                ext[0] = ext[0] // 2
                ext[1] = ext[1] // 2
            return m(x)

        x = m(relu(conv(c1, (3, 3), "conv1a")(image.astype(dt))))
        x = m(relu(conv(c1, (3, 3), "conv1b")(x)))
        x = pool(x)
        x = m(relu(conv(c2, (3, 3), "conv2a")(x)))
        x = m(relu(conv(c2, (3, 3), "conv2b")(x)))
        x = pool(x)
        x = m(relu(conv(c3, (3, 3), "conv3a")(x)))
        x = m(relu(conv(c3, (3, 3), "conv3b")(x)))
        x = pool(x)
        x = m(relu(conv(c4, (3, 3), "conv4a")(x)))
        x = m(relu(conv(c4, (3, 3), "conv4b")(x)))

        cPa = m(relu(conv(c5, (3, 3), "convPa")(x)))
        heat = conv(65, (1, 1), "convPb")(cPa).astype(jnp.float32)

        cDa = m(relu(conv(c5, (3, 3), "convDa")(x)))
        desc = conv(self.descriptor_dim, (1, 1), "convDb")(cDa).astype(jnp.float32)
        desc = desc / (jnp.linalg.norm(desc, axis=-1, keepdims=True) + 1e-8)
        # zero whole cells beyond the extent so bilinear taps into them
        # contribute nothing (the exact-size run's out-of-grid taps are zero)
        desc = m(desc)
        return heat, desc


def simple_nms(scores, radius, n_iters=2):
    """Iterative max-pool non-maximum suppression (upstream `simple_nms` semantics).

    Args:
        scores: (B, H, W); radius: suppression radius.
    Returns:
        (B, H, W) with non-maxima zeroed.
    """
    size = 2 * radius + 1

    def maxpool(x):
        # The 2D max filter is exactly separable: one H pass + one W pass is
        # 2*size comparisons/px instead of size^2 (identical output). Measured
        # 5 fused (size,size) reduce_windows at 29.9 ms for 40 480x640 frames
        # on the v5e (tools/sp_profile.py); separable cuts the comparison work
        # ~4.5x.
        x = jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, size, 1), (1, 1, 1), "SAME"
        )
        return jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, 1, size), (1, 1, 1), "SAME"
        )

    zeros = jnp.zeros_like(scores)
    max_mask = scores == maxpool(scores)
    for _ in range(n_iters):
        supp_mask = maxpool(max_mask.astype(scores.dtype)) > 0
        supp_scores = jnp.where(supp_mask, zeros, scores)
        new_max_mask = supp_scores == maxpool(supp_scores)
        max_mask = jnp.logical_or(max_mask, jnp.logical_and(new_max_mask, ~supp_mask))
    return jnp.where(max_mask, scores, zeros)


class SuperPoint(nn.Module):
    """Full detector: image batch -> fixed-K keypoints, scores, descriptors.

    Output contract (demuxed by the reference at `helpers.py:88-96`):
        keypoints: (B, K, 2) float xy pixels; scores: (B, K); descriptors:
        (B, K, D). Slots beyond the detected count have score 0 (and random
        positions when `fill_with_random_keypoints`).
    """

    config: SuperPointConfig = SuperPointConfig()

    @nn.compact
    def __call__(self, image, valid_size=None, *, rng=None):
        """Detect keypoints.

        Args:
            image: (B, H, W, 1) grayscale in [0, 1].
            valid_size: optional (B, 2) per-image true (h, w) extents for
                shape-bucketed batching: images padded with zeros up to a
                common bucket shape set their true extent here, and detector
                scores outside it are zeroed BEFORE NMS (so the pad region's
                uniform softmax plateau, ~1/65 per cell, can neither produce
                keypoints nor suppress genuine low-score keypoints near the
                boundary). Inside the valid extent the conv arithmetic is
                identical to an exact-size run: SAME convs pad zeros at the
                image edge exactly where the bucket padding puts real zeros.
            rng: keypoint-fill rng (else `make_rng("keypoints")`).
        """
        cfg = self.config
        B, H, W, _ = image.shape
        heat, desc_map = SuperPointNet(
            cfg.descriptor_dim, cfg.compute_dtype, name="net"
        )(image, valid_size)

        # 65-way softmax per 8x8 cell, drop dustbin, unshuffle to full resolution.
        probs = jax.nn.softmax(heat, axis=-1)[..., :64]
        Hc, Wc = probs.shape[1], probs.shape[2]
        scores = probs.reshape(B, Hc, Wc, 8, 8)
        scores = scores.transpose(0, 1, 3, 2, 4).reshape(B, Hc * 8, Wc * 8)

        if valid_size is not None:
            # detectable extent = the exact-size run's score grid,
            # floor(floor(floor(v/2)/2)/2) * 8 <= v (cells beyond it carry
            # zeroed features whose softmax is a uniform 1/65 plateau)
            vh = ((valid_size[:, 0].astype(jnp.int32) // 2 // 2 // 2) * 8
                  )[:, None, None]
            vw = ((valid_size[:, 1].astype(jnp.int32) // 2 // 2 // 2) * 8
                  )[:, None, None]
            ys_g = jnp.arange(Hc * 8, dtype=jnp.int32)[None, :, None]
            xs_g = jnp.arange(Wc * 8, dtype=jnp.int32)[None, None, :]
            scores = jnp.where((ys_g < vh) & (xs_g < vw), scores, 0.0)

        scores = simple_nms(scores, cfg.nms_radius)

        # Border removal mask (`remove_borders` config key).
        b = cfg.remove_borders
        if b > 0:
            ys = jnp.arange(Hc * 8)
            xs = jnp.arange(Wc * 8)
            border = (
                (ys[:, None] >= b)
                & (ys[:, None] < H - b)
                & (xs[None, :] >= b)
                & (xs[None, :] < W - b)
            )
            scores = scores * border[None]

        K = cfg.max_keypoints
        H8, W8 = Hc * 8, Wc * 8
        use_block_topk = (
            cfg.topk_impl == "auto"
            and cfg.nms_radius >= 3
            and H8 % 4 == 0
            and W8 % 4 == 0
            and (H8 // 4) * (W8 // 4) >= K
        )
        if use_block_topk:
            # NMS with radius r zeroes every non-maximum within Chebyshev
            # distance r, so two survivors are > r apart; with r >= 3 a 4x4
            # block (internal Chebyshev diameter 3) holds at most ONE
            # survivor. Reducing each block to its (max, argmax) shrinks the
            # top-K input 16x (e.g. 307200 -> 19200 at 480x640) with an
            # identical selection for distinct scores -- lax.top_k over the
            # full map was ~63 ms of the 40-frame detector forward on the
            # v5e (tools/sp_scan_profile.py), the single largest stage.
            # (At exact score ties the kept candidate/order can differ from
            # flat top_k; NMS itself already resolves ties arbitrarily, and
            # the reference's torch.topk tie order was never reproducible.)
            blocks = scores.reshape(B, H8 // 4, 4, W8 // 4, 4)
            blocks = blocks.transpose(0, 1, 3, 2, 4).reshape(
                B, H8 // 4, W8 // 4, 16)
            bmax = jnp.max(blocks, axis=-1)
            barg = jnp.argmax(blocks, axis=-1).astype(jnp.int32)
            top_scores, cand_idx = jax.lax.top_k(
                bmax.reshape(B, -1), K)  # over (H8/4)*(W8/4) candidates
            sub = jnp.take_along_axis(
                barg.reshape(B, -1), cand_idx, axis=1)  # (B, K) in [0, 16)
            by = cand_idx // (W8 // 4)
            bx = cand_idx % (W8 // 4)
            ys = (by * 4 + sub // 4).astype(jnp.float32)
            xs = (bx * 4 + sub % 4).astype(jnp.float32)
        else:
            flat = scores.reshape(B, -1)
            top_scores, top_idx = jax.lax.top_k(flat, K)
            ys = (top_idx // W8).astype(jnp.float32)
            xs = (top_idx % W8).astype(jnp.float32)
        kpts = jnp.stack([xs, ys], axis=-1)  # (B, K, 2) xy

        valid = top_scores > cfg.keypoint_threshold
        if cfg.fill_with_random_keypoints:
            if rng is None:
                rng = self.make_rng("keypoints")
            if valid_size is None:
                rx = jax.random.uniform(rng, (B, K), minval=float(b),
                                        maxval=float(W - 1 - b))
                rkey = jax.random.split(rng, 2)[1]
                ry = jax.random.uniform(rkey, (B, K), minval=float(b),
                                        maxval=float(H - 1 - b))
            else:
                # fill inside each image's true extent, never the pad region
                vw = valid_size[:, 1].astype(jnp.float32)[:, None]
                vh = valid_size[:, 0].astype(jnp.float32)[:, None]
                rx = b + jax.random.uniform(rng, (B, K)) * (vw - 1 - 2 * b)
                rkey = jax.random.split(rng, 2)[1]
                ry = b + jax.random.uniform(rkey, (B, K)) * (vh - 1 - 2 * b)
            rand_kpts = jnp.stack([rx, ry], axis=-1)
            kpts = jnp.where(valid[..., None], kpts, rand_kpts)
        top_scores = jnp.where(valid, top_scores, 0.0)

        valid_cells = None
        if valid_size is not None:
            valid_cells = valid_size.astype(jnp.int32) // 2 // 2 // 2
        descs = sample_descriptors(kpts, desc_map, valid_cells=valid_cells)
        return {"keypoints": kpts, "scores": top_scores, "descriptors": descs}


def sample_descriptors(kpts, desc_map, cell=8, valid_cells=None):
    """Bilinearly sample L2-normalized descriptors at keypoint pixel locations.

    Args:
        kpts: (B, K, 2) xy pixels; desc_map: (B, Hc, Wc, D) coarse descriptors.
        valid_cells: optional (B, 2) per-image true (Hc, Wc) for shape-bucketed
            inputs -- the upstream mapping normalizes by the image's OWN grid
            size, so exact-size equivalence requires the true cell counts, not
            the bucket's.
    Returns:
        (B, K, D) unit descriptors.
    """
    B, Hc, Wc, D = desc_map.shape
    if valid_cells is None:
        hc = jnp.full((B, 1), Hc, jnp.float32)
        wc = jnp.full((B, 1), Wc, jnp.float32)
    else:
        hc = valid_cells[:, 0].astype(jnp.float32)[:, None]
        wc = valid_cells[:, 1].astype(jnp.float32)[:, None]
    # Upstream sample_descriptors (magicleap superpoint.py): pixel p maps to
    # the normalized coordinate (p - cell/2 + 0.5) / (dim*cell - cell/2 - 0.5)
    # in ~[0, 1], then grid_sample(align_corners=True) reads the grid at
    # g * (dim - 1) with ZERO padding for out-of-range corner taps. This is
    # NOT the same as (p - cell/2 + 0.5)/cell with clipping; imported
    # checkpoints require the exact convention (tests/test_golden_full_model
    # TestFullSuperPointGolden).
    gx = (kpts[..., 0] - cell / 2 + 0.5) / (wc * cell - cell / 2 - 0.5) * (wc - 1)
    gy = (kpts[..., 1] - cell / 2 + 0.5) / (hc * cell - cell / 2 - 0.5) * (hc - 1)
    x0 = jnp.floor(gx).astype(jnp.int32)
    y0 = jnp.floor(gy).astype(jnp.int32)
    wx = (gx - x0)[..., None]
    wy = (gy - y0)[..., None]

    flat = desc_map.reshape(B, Hc * Wc, D)

    def gather(yi, xi):
        # (B, K) indices -> (B, K, D); out-of-range taps contribute zero.
        valid = (yi >= 0) & (yi < Hc) & (xi >= 0) & (xi < Wc)
        idx = jnp.clip(yi, 0, Hc - 1) * Wc + jnp.clip(xi, 0, Wc - 1)
        vals = jnp.take_along_axis(flat, idx[..., None], axis=1)
        return vals * valid[..., None]

    d = (
        gather(y0, x0) * (1 - wx) * (1 - wy)
        + gather(y0, x0 + 1) * wx * (1 - wy)
        + gather(y0 + 1, x0) * (1 - wx) * wy
        + gather(y0 + 1, x0 + 1) * wx * wy
    )
    return d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-12)
