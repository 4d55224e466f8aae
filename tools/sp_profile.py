"""SuperPoint per-stage TPU profile (VERDICT r2 next-round item 5).

Times the detector's sub-stages in isolation on the real chip so the 0.8%-MFU
headline can be attributed: conv trunk (f32 vs bf16), softmax+unshuffle,
iterative-maxpool NMS, flat top-K, bilinear descriptor sampling, full forward.

Run: timeout 2400 python tools/sp_profile.py [n_frames] [H] [W]
"""

import os
import sys
import time

import numpy as np

if (
    os.environ.get("PALLAS_AXON_POOL_IPS")
    and os.environ.get("PALLAS_AXON_REMOTE_COMPILE") != "1"
    and os.environ.get("_EMVM_SPP_REEXEC") != "1"
):
    env = dict(os.environ, PALLAS_AXON_REMOTE_COMPILE="1", _EMVM_SPP_REEXEC="1")
    os.execve(sys.executable, [sys.executable] + sys.argv, env)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from e2e_multi_view_matching_tpu.models.superpoint import (  # noqa: E402
    SuperPoint, SuperPointConfig, SuperPointNet, sample_descriptors, simple_nms)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 40
H = int(sys.argv[2]) if len(sys.argv) > 2 else 480
W = int(sys.argv[3]) if len(sys.argv) > 3 else 640


def fetch(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(np.asarray(leaf).ravel()[0])


def timed(label, fn, *args, n=6, flops=None):
    # Reduce every output leaf to one scalar ON DEVICE: fetching a full leaf
    # drags tens of MB through the tunnel and times the transfer, not the op.
    red = jax.jit(lambda *a: sum(
        jnp.sum(l.astype(jnp.float32)) for l in jax.tree_util.tree_leaves(fn(*a))
    ))
    red(*args)
    fetch(red(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fetch(red(*args))
        ts.append(time.perf_counter() - t0)
    ms = min(ts) * 1e3
    extra = ""
    if flops:
        extra = f"  MFU {flops / (min(ts) * 197e12) * 100:.1f}%"
    print(f"{label:34s} {ms:8.1f} ms{extra}", flush=True)
    return ms


def trunk_flops(n, h, w):
    f = 0
    ch = [(1, 64, 1), (64, 64, 1), (64, 64, 2), (64, 64, 2), (64, 128, 4),
          (128, 128, 4), (128, 128, 8), (128, 128, 8)]
    for cin, cout, s in ch:
        f += 2 * (h // s) * (w // s) * cin * cout * 9
    f += 2 * (h // 8) * (w // 8) * (128 * 256 * 9 + 256 * 65)   # detector head
    f += 2 * (h // 8) * (w // 8) * (128 * 256 * 9 + 256 * 256)  # descriptor head
    return n * f


key = jax.random.PRNGKey(0)
img = jax.random.uniform(key, (N, H, W, 1), jnp.float32)
cfg = SuperPointConfig(max_keypoints=1024)
sp = SuperPoint(cfg)
variables = sp.init(jax.random.PRNGKey(1), img[:1], rng=jax.random.PRNGKey(2))
net = SuperPointNet()
net_vars = {"params": variables["params"]["net"]}
FL = trunk_flops(N, H, W)
print(f"frames={N} {H}x{W}; analytic trunk GFLOP={FL / 1e9:.1f}", flush=True)

full = jax.jit(lambda v, im: sp.apply(v, im, rng=jax.random.PRNGKey(3)))
t_full = timed("full forward", full, variables, img, flops=FL)

trunk = jax.jit(lambda v, im: net.apply(v, im))
t_trunk = timed("conv trunk f32", trunk, net_vars, img, flops=FL)

net_bf = SuperPointNet(compute_dtype="bfloat16")
trunk_bf = jax.jit(lambda v, im: net_bf.apply(v, im))
t_trunk_bf = timed("conv trunk bf16 (f32 params)", trunk_bf, net_vars, img, flops=FL)

sp_bf = SuperPoint(SuperPointConfig(max_keypoints=1024, compute_dtype="bfloat16"))
full_bf = jax.jit(lambda v, im: sp_bf.apply(v, im, rng=jax.random.PRNGKey(3)))
t_full_bf = timed("full forward bf16", full_bf, variables, img, flops=FL)

heat, desc_map = jax.jit(lambda v, im: net.apply(v, im))(net_vars, img)
heat = jax.block_until_ready(heat)


def unshuffle(h):
    probs = jax.nn.softmax(h, axis=-1)[..., :64]
    B, Hc, Wc = probs.shape[:3]
    s = probs.reshape(B, Hc, Wc, 8, 8)
    return s.transpose(0, 1, 3, 2, 4).reshape(B, Hc * 8, Wc * 8)


t_unshuf = timed("softmax+unshuffle", jax.jit(unshuffle), heat)
scores = jax.block_until_ready(jax.jit(unshuffle)(heat))

t_nms = timed("simple_nms (9x9 x5 maxpool)", jax.jit(lambda s: simple_nms(s, 4)), scores)
nms_scores = jax.block_until_ready(jax.jit(lambda s: simple_nms(s, 4))(scores))

topk = jax.jit(lambda s: jax.lax.top_k(s.reshape(N, -1), cfg.max_keypoints))
t_topk = timed("lax.top_k (K=1024, 307k elems)", topk, nms_scores)

ts_, ti_ = jax.block_until_ready(topk(nms_scores))
kpts = jnp.stack([(ti_ % W).astype(jnp.float32), (ti_ // W).astype(jnp.float32)], -1)
t_samp = timed("sample_descriptors", jax.jit(sample_descriptors), kpts, desc_map)

print(f"\nsum of parts {t_trunk + t_unshuf + t_nms + t_topk + t_samp:.1f} ms "
      f"vs full {t_full:.1f} ms", flush=True)
