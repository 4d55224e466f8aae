"""SuperPoint cumulative-cut profile with scan-amortized dispatch.

tools/sp_profile.py timed each sub-stage as its OWN dispatch, so the tail
stages read as dispatch floor (~30 ms each). Here every cut runs as 8 scan
iterations inside ONE jit, so deltas between cumulative cuts give the real
in-context cost of each stage at the train shape (40 frames 480x640, bf16):

  cut1: conv1a+conv1b            (the two full-res 64-ch convs)
  cut2: + pool + conv2a/b        (half-res 64-ch convs)
  cut3: + pool + conv3a/b + pool + conv4a/b + heads   (full trunk)
  cut4: + softmax + unshuffle
  cut5: + NMS
  cut6: + border + top-K + coords
  full: + random fill + descriptor sampling (the whole detector)

Run: timeout 3600 python tools/sp_scan_profile.py
"""

import os
import sys
import time

import numpy as np

if (
    os.environ.get("PALLAS_AXON_POOL_IPS")
    and os.environ.get("PALLAS_AXON_REMOTE_COMPILE") != "1"
    and os.environ.get("_EMVM_SPS_REEXEC") != "1"
):
    env = dict(os.environ, PALLAS_AXON_REMOTE_COMPILE="1", _EMVM_SPS_REEXEC="1")
    os.execve(sys.executable, [sys.executable] + sys.argv, env)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from e2e_multi_view_matching_tpu.models.superpoint import (  # noqa: E402
    SuperPoint, SuperPointConfig, sample_descriptors, simple_nms)

N, H, W = 40, 480, 640
K = int(os.environ.get("EMVM_SPS_K", "400"))
DTYPE = os.environ.get("EMVM_SPS_DTYPE", "bfloat16")
ITERS = 8
key = jax.random.PRNGKey(0)
img = jax.random.uniform(key, (N, H, W, 1), jnp.float32)
cfg = SuperPointConfig(max_keypoints=K, compute_dtype=DTYPE,
                       fill_with_random_keypoints=True, remove_borders=12,
                       keypoint_threshold=1e-3)
sp = SuperPoint(cfg)
variables = sp.init({"params": jax.random.PRNGKey(1), "keypoints": key}, img[:1])
p = variables["params"]["net"]
dt = jnp.bfloat16 if DTYPE == "bfloat16" else jnp.float32


def conv(x, w, b):
    out = jax.lax.conv_general_dilated(
        x.astype(dt), w.astype(dt), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return jax.nn.relu(out + b.astype(dt))


def pool(x):
    return jax.lax.reduce_window(x, -jnp.inf if x.dtype == jnp.float32 else
                                 jnp.finfo(x.dtype).min, jax.lax.max,
                                 (1, 2, 2, 1), (1, 2, 2, 1), "VALID")


def cut(upto):
    def fn(im):
        x = conv(im, p["conv1a"]["kernel"], p["conv1a"]["bias"])
        x = conv(x, p["conv1b"]["kernel"], p["conv1b"]["bias"])
        if upto == 1:
            return x
        x = pool(x)
        x = conv(x, p["conv2a"]["kernel"], p["conv2a"]["bias"])
        x = conv(x, p["conv2b"]["kernel"], p["conv2b"]["bias"])
        if upto == 2:
            return x
        x = pool(x)
        x = conv(x, p["conv3a"]["kernel"], p["conv3a"]["bias"])
        x = conv(x, p["conv3b"]["kernel"], p["conv3b"]["bias"])
        x = pool(x)
        x = conv(x, p["conv4a"]["kernel"], p["conv4a"]["bias"])
        x = conv(x, p["conv4b"]["kernel"], p["conv4b"]["bias"])
        cPa = conv(x, p["convPa"]["kernel"], p["convPa"]["bias"])
        heat = (jax.lax.conv_general_dilated(
            cPa, p["convPb"]["kernel"].astype(dt), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
            + p["convPb"]["bias"].astype(dt)).astype(jnp.float32)
        cDa = conv(x, p["convDa"]["kernel"], p["convDa"]["bias"])
        desc = (jax.lax.conv_general_dilated(
            cDa, p["convDb"]["kernel"].astype(dt), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
            + p["convDb"]["bias"].astype(dt)).astype(jnp.float32)
        desc = desc / (jnp.linalg.norm(desc, axis=-1, keepdims=True) + 1e-8)
        if upto == 3:
            return heat, desc
        probs = jax.nn.softmax(heat, axis=-1)[..., :64]
        Hc, Wc = probs.shape[1], probs.shape[2]
        s = probs.reshape(N, Hc, Wc, 8, 8).transpose(0, 1, 3, 2, 4)
        s = s.reshape(N, Hc * 8, Wc * 8)
        if upto == 4:
            return s, desc
        s = simple_nms(s, 4)
        if upto == 5:
            return s, desc
        b = 12
        ys = jnp.arange(Hc * 8)
        xs = jnp.arange(Wc * 8)
        border = ((ys[:, None] >= b) & (ys[:, None] < H - b)
                  & (xs[None, :] >= b) & (xs[None, :] < W - b))
        s = s * border[None]
        top_scores, top_idx = jax.lax.top_k(s.reshape(N, -1), K)
        yy = (top_idx // (Wc * 8)).astype(jnp.float32)
        xx = (top_idx % (Wc * 8)).astype(jnp.float32)
        kpts = jnp.stack([xx, yy], axis=-1)
        if upto == 6:
            return kpts, top_scores, desc
        raise ValueError(upto)
    return fn


def timed_scan(fn, label):
    def body(carry, _):
        out = fn(img)
        s = jax.tree_util.tree_reduce(
            lambda a, x: a + x.reshape(-1)[0].astype(jnp.float32), out,
            jnp.zeros(()))
        return carry + s, None

    @jax.jit
    def run():
        tot, _ = jax.lax.scan(body, jnp.zeros(()), None, length=ITERS)
        return tot

    t0 = time.perf_counter()
    _ = float(np.asarray(run()))
    c = time.perf_counter() - t0
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(np.asarray(run()))
        ts.append(time.perf_counter() - t0)
    ms = min(ts) / ITERS * 1e3
    print(f"  {label:44s}: {ms:7.2f} ms  (compile {c:.0f}s)", flush=True)
    return ms


def full_fn(im):
    return sp.apply(variables, im, rngs={"keypoints": key})


print(f"{N} frames {H}x{W} K={K} {DTYPE}, scan x{ITERS} in one jit", flush=True)
t = {}
t[1] = timed_scan(cut(1), "conv1a+1b (full-res 64ch)")
t[2] = timed_scan(cut(2), "+ pool + conv2a/b (half-res 64ch)")
t[3] = timed_scan(cut(3), "+ rest of trunk + heads (full trunk)")
t[4] = timed_scan(cut(4), "+ softmax + unshuffle")
t[5] = timed_scan(cut(5), "+ NMS")
t[6] = timed_scan(cut(6), "+ border + top-K + coords")
t[7] = timed_scan(full_fn, "FULL detector (model code path)")
print("\ndeltas (in-context cost of each stage):")
names = {1: "conv1a+1b", 2: "conv2a/b", 3: "conv3/4+heads", 4: "softmax+unshuffle",
         5: "NMS", 6: "border+topk", 7: "fill+sampling(+model overhead)"}
prev = 0.0
for i in range(1, 8):
    print(f"  {names[i]:34s}: {t[i] - prev:7.2f} ms")
    prev = t[i]
