"""On-chip check + micro-bench: chunked cross-attention kernel vs masked kernel.

Validates the view-block-skipping flash kernel (`_fused_cross_attention_raw`)
against the full masked kernel and the XLA reference at the eval shape
(BH=32, S=5120, dh=64), then times all three (overhead-subtracted, n=30
dispatch loop ending in a scalar fetch).

Run: python tools/attn_kernel_bench.py
"""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from e2e_multi_view_matching_tpu.ops.attention import (
        cross_view_mask,
        multi_head_attention,
    )
    from e2e_multi_view_matching_tpu.ops import attention_pallas as ap

    B, V, K, D, heads = 8, 5, 1024, 256, 4
    S = V * K
    dh = D // heads
    scale = 1.0 / dh ** 0.5
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B * heads, S, dh)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B * heads, S, dh)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B * heads, S, dh)).astype(np.float32))

    chunked = jax.jit(lambda q, k, v: ap._fused_cross_attention_raw(
        q, k, v, scale, V, K, 256, False))
    masked = jax.jit(lambda q, k, v: ap._fused_attention_raw(
        q, k, v, scale, K, "cross", 256, False))

    mask = cross_view_mask(V, K)

    @jax.jit
    def xla(q, k, v):
        # inputs are already head-split to (B*heads, S, dh), so num_heads=1
        return multi_head_attention(q, k, v, 1, mask=mask)

    o_c = np.asarray(chunked(q, k, v))
    o_m = np.asarray(masked(q, k, v))
    err = np.max(np.abs(o_c - o_m))
    print(f"chunked vs masked kernel max |diff| = {err:.2e}", flush=True)
    # online-softmax chunk rescaling reorders the f32 summation over 4096
    # keys; ~3e-4 absolute on unit-variance outputs is rounding, not a bug
    assert err < 1e-3, err
    o_x = np.asarray(xla(q, k, v))
    print(f"chunked vs xla max |diff| = {np.max(np.abs(o_c - o_x)):.2e}",
          flush=True)

    trivial = jax.jit(lambda x: x + 1.0)
    z = jnp.zeros((8, 8))

    def timed(fn, n=30):
        # n dispatches inside one jit via lax.scan amortize the tunnel round
        # trip; the scalar-reduce fetch forces execution. Returns ms/op.
        def body(c, _):
            return c + fn(q + c * 0.0, k, v).sum(), None

        red = jax.jit(lambda q, k, v: jax.lax.scan(
            body, jnp.zeros(()), None, length=n)[0])
        float(np.asarray(red(q, k, v)))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(np.asarray(red(q, k, v)))
            ts.append(time.perf_counter() - t0)
        return min(ts) / n

    float(np.asarray(trivial(z)[0, 0]))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(np.asarray(trivial(z)[0, 0]))
        ts.append(time.perf_counter() - t0)
    overhead = min(ts)
    print(f"dispatch overhead {overhead * 1e3:.1f} ms", flush=True)

    for name, fn in (("chunked", chunked), ("masked ", masked), ("xla    ", xla)):
        # overhead is paid once per n-op dispatch; clamp so fast kernels never
        # print a negative net time
        t = max(timed(fn) - overhead / 30, 1e-9)
        fl = 2 * 2 * B * heads * S * (S - K if name == "chunked" else S) * dh
        print(f"{name}: {t * 1e3:7.2f} ms/op net  ({fl / t / 1e12:.1f} "
              f"TFLOP/s)", flush=True)


if __name__ == "__main__":
    main()
